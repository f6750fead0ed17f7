"""K (cont.): training-data curation ops beyond dedup — the checks a
100 TB pretraining pipeline runs between ingest and tokenization.

- ``text_contamination`` — benchmark-contamination audit: fraction of
  each held-out doc's distinct word 5-grams that appear anywhere in the
  training split (the standard n-gram-overlap decontamination check).
- ``text_repetition``   — intra-document repetition: duplicate 3-gram
  mass per doc (the "repetitive text" quality gate).
- ``pipe_mix_sources``  — balanced source mixture via deterministic
  content-hash sampling (downsample every source to the smallest
  source's rate) — reproducible across engines/reruns, no RNG state.
- ``text_pii_scrub``    — redaction accounting: digit-run hits in the
  raw event payloads, per event type (the PII-scrub bookkeeping pass;
  the fixtures carry no real PII, the shape is number-shaped tokens in
  a JSON payload column).

All four are linear scans + hash aggregates / bucketed joins; the only
join (contamination) keys on the shingle string itself — fan-out per
key is its document frequency in the train split, the same
hot-key-bounded shape as ``text_jaccard_neardup``'s capped variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_NGRAM = 5  # contamination shingle width (words)
_REP_N = 3  # repetition shingle width


def _word_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, lang, source, shingle) — one row per word n-gram
    position; JVM-side (sequence + transform + array_join), no UDF."""
    toks = F.split("text", " ")
    # docs shorter than one shingle yield NO rows: without the guard,
    # sequence(1, size-(n-1)) runs DESCENDING for size < n and slice()
    # then rejects start 0 (found by the degenerate-corpus sweep)
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # pre-explode repartition (house tokenizer idiom, text.py): the docs
    # fixture is one row group, so without this the shingle build runs
    # on a single task; measured 3.7 s -> ~1 s for text_boilerplate at
    # sf0.1 local[32]
    return (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id").select(
            "doc_id",
            "lang",
            "source",
            F.explode(shingles).alias("shingle"),
        )
    )


@query(
    "text_contamination",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               array_to_string(list_slice(toks, i, i + {_NGRAM - 1}), ' ')
                   AS shingle
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents) d,
             LATERAL (SELECT UNNEST(generate_series(
                          1, LEN(toks) - {_NGRAM - 1})) AS i) g
    ),
    train AS (SELECT DISTINCT shingle FROM sh WHERE source <> 'src0'),
    test AS (SELECT DISTINCT doc_id, shingle FROM sh
             WHERE source = 'src0')
    SELECT test.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN train.shingle IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN train.shingle IS NOT NULL
                          THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS contamination
    FROM test LEFT JOIN train USING (shingle)
    GROUP BY test.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: treating source 'src0' as the
    held-out set, the fraction of each held-out doc's DISTINCT word
    5-grams that occur anywhere in the training split (all other
    sources) — the decontamination check every LLM corpus runs before
    training.

    Shape: shingles are generated JVM-side, both splits reduce to
    distinct-shingle sets, and the overlap is ONE equi-join on the
    shingle string followed by a per-doc aggregate. The train side
    carries no doc payload (just the distinct shingle), so the join's
    build side is the corpus vocabulary, not the corpus. At 100 TB the
    held-out side is tiny (benchmarks), making this a broadcast of the
    TEST set against a streamed train scan."""
    t = Tables(spark, sf_dir)
    sh = _word_shingles(t.documents, _NGRAM)
    train = (
        sh.filter(F.col("source") != "src0").select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    test = (
        sh.filter(F.col("source") == "src0")
        .select("doc_id", "shingle")
        .distinct()
    )
    return (
        test.join(train, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0))
                / F.count("*").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               array_to_string(list_slice(toks, i, i + {_REP_N - 1}), ' ')
                   AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents) d,
             LATERAL (SELECT UNNEST(generate_series(
                          1, LEN(toks) - {_REP_N - 1})) AS i) g
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(DISTINCT shingle) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT shingle)
                       / CAST(COUNT(*) AS DOUBLE), 6) AS rep_ratio,
           CAST(MAX(cnt) AS BIGINT) AS max_gram_count
    FROM (SELECT doc_id, shingle,
                 COUNT(*) OVER (PARTITION BY doc_id, shingle) AS cnt
          FROM sh)
    GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition gate: per doc, the duplicated word
    3-gram mass (1 - distinct/total) and the hottest single 3-gram's
    count — the standard filter for looping/boilerplate text.

    One shingle explode, one per-(doc, shingle) count, one per-doc
    rollup — all hash aggregates keyed by doc_id (the natural partition
    key), so the whole op is map-side-combinable and linear."""
    t = Tables(spark, sf_dir)
    sh = _word_shingles(t.documents, _REP_N).select("doc_id", "shingle")
    per = sh.groupBy("doc_id", "shingle").agg(F.count("*").alias("cnt"))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.round(
            1.0 - F.count("*") / F.sum("cnt").cast("double"), 6
        ).alias("rep_ratio"),
        F.max("cnt").alias("max_gram_count"),
    )


@query(
    "pipe_mix_sources",
    oracle="""
    WITH cnt AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tgt AS (SELECT MIN(n) AS min_n FROM cnt),
    keep AS (
        SELECT d.doc_id, d.source, d.lang,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) AS bucket,
               (SELECT min_n FROM tgt) / CAST(c.n AS DOUBLE) AS rate
        FROM documents d JOIN cnt c USING (source)
    )
    SELECT source,
           COUNT(*) AS n_kept,
           COUNT(DISTINCT lang) AS n_langs
    FROM keep
    WHERE bucket < rate * 65536
    GROUP BY source
    """,
)
def pipe_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training mixture: every source downsampled to the
    smallest source's volume by a DETERMINISTIC content-hash coin
    (md5(doc_id) bucket < rate) — the re-weighting step that turns a
    crawled corpus into a training mix, reproducible bit-for-bit across
    engines, reruns, and cluster sizes (no RNG state, no sort order
    dependence; the same md5-bucket idiom as ``pipe_stratified_sample``).

    The per-source rate is a broadcast join against a tiny count
    dimension; the keep predicate is a pushdown-able scalar filter, so
    the plan is scan -> broadcast join -> filter -> aggregate with ONE
    data-sized shuffle (the final per-source rollup)."""
    t = Tables(spark, sf_dir)
    cnt = t.documents.groupBy("source").agg(F.count("*").alias("n"))
    min_n = cnt.agg(F.min("n").alias("min_n"))
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    keep = (
        t.documents.join(F.broadcast(cnt), "source")
        .join(F.broadcast(min_n))
        .withColumn("bucket", bucket)
        .withColumn("rate", F.col("min_n") / F.col("n").cast("double"))
        .filter(F.col("bucket") < F.col("rate") * 65536)
    )
    return keep.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "text_pii_scrub",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(LEN(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
               AS n_redactions,
           COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
               AS n_shapes
    FROM events
    GROUP BY event_type
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction accounting for a PII-scrub pass: per event type, how
    many digit-run tokens the scrubber would redact from the raw JSON
    payload and how many distinct payload SHAPES remain after masking
    (shape cardinality is the standard sanity metric that a scrubber
    didn't destroy schema diversity).

    Pure JVM regex (``regexp_count`` / ``regexp_replace``) inside one
    hash aggregate — no UDF, fully codegen'd, linear. The real scrubber
    would add patterns (emails, phones); the fixtures' payloads carry
    number-shaped tokens only, so the digit-run rule is the live one."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.regexp_count("props", F.lit(r"[0-9]+"))).alias("n_redactions"),
        F.countDistinct(
            F.regexp_replace("props", r"[0-9]+", "#")
        ).alias("n_shapes"),
    )


def _lsh_candidates(sig: "DataFrame") -> "DataFrame":
    """Distinct LSH candidate pairs from a minhash signature table —
    the same banding as ``text_minhash_neardup``."""
    from .text import _BAND_W, _N_MINHASH

    bands = None
    for j in range(_N_MINHASH // _BAND_W):
        b = sig.select(
            "doc_id",
            F.lit(j).alias("band"),
            F.concat(
                *[F.col(f"mh{_BAND_W * j + r}") for r in range(_BAND_W)]
            ).alias("bucket"),
        )
        bands = b if bands is None else bands.unionAll(b)
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _minhash_estimate_oracle() -> str:
    from .text import _BAND_W, _MINHASH_ORACLE_SIG, _N_MINHASH

    bands = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band, {concat} AS bucket FROM sig".format(
            j=j,
            concat=" || ".join(
                f"mh{_BAND_W * j + r}" for r in range(_BAND_W)
            ),
        )
        for j in range(_N_MINHASH // _BAND_W)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(_N_MINHASH)
    )
    return f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    sig AS (SELECT doc_id, {_MINHASH_ORACLE_SIG} FROM tok
            GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
    ),
    est AS (
        SELECT c.id_a, c.id_b,
               ({agree}) AS n_agree
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b
    ),
    sample AS (
        SELECT * FROM est
        WHERE CAST(('0x' || substr(md5(CAST(id_a AS VARCHAR) || '_' ||
                                       CAST(id_b AS VARCHAR)), 1, 4))
                   AS INTEGER) < 1311
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS both_n
        FROM sample c
        JOIN tok ta ON ta.doc_id = c.id_a
        JOIN tok tb ON tb.doc_id = c.id_b AND tb.token = ta.token
        GROUP BY c.id_a, c.id_b
    ),
    scored AS (
        SELECT s.n_agree,
               COALESCE(i.both_n, 0)
               / CAST(sa.n + sb.n - COALESCE(i.both_n, 0) AS DOUBLE)
                   AS exact_j
        FROM sample s
        LEFT JOIN inter i ON i.id_a = s.id_a AND i.id_b = s.id_b
        JOIN sizes sa ON sa.doc_id = s.id_a
        JOIN sizes sb ON sb.doc_id = s.id_b
    ),
    tot AS (SELECT n_agree, COUNT(*) AS n_candidates FROM est GROUP BY 1)
    SELECT tot.n_agree,
           ROUND(tot.n_agree / CAST({_N_MINHASH} AS DOUBLE), 6)
               AS est_jaccard,
           CAST(tot.n_candidates AS BIGINT) AS n_candidates,
           CAST(COUNT(scored.exact_j) AS BIGINT) AS n_sampled,
           ROUND(AVG(scored.exact_j), 6) AS avg_exact,
           ROUND(MIN(scored.exact_j), 6) AS min_exact,
           ROUND(MAX(scored.exact_j), 6) AS max_exact
    FROM tot LEFT JOIN scored ON scored.n_agree = tot.n_agree
    GROUP BY tot.n_agree, tot.n_candidates
    """


@query("text_minhash_estimate", oracle=_minhash_estimate_oracle)
def text_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch CALIBRATION for the MinHash path: for every possible
    signature-agreement level (0..8 of 8 components), how many LSH
    candidate pairs sit there, and — over a deterministic ~2%%
    md5-sample of pairs — the exact token Jaccard's avg/min/max at that
    level. This is the table a pipeline reads to pick its near-dup
    threshold: estimator level on one axis, ground truth beside it,
    measured with the SAME md5 signatures ``text_minhash_neardup``
    ships.

    Scale shape: the (cheap) signature compare runs over all candidate
    pairs, but the (expensive) exact token join runs ONLY over the
    hash-sampled pairs — sampling by content hash keeps the eval
    reproducible across engines, reruns, and partitionings, and the
    output is <= 9 rows regardless of corpus size."""
    from .text import _N_MINHASH, _minhash_cols

    t = Tables(spark, sf_dir)
    tok = (
        t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
    )
    sig = tok.groupBy("doc_id").agg(*_minhash_cols())
    cand = _lsh_candidates(sig)
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_N_MINHASH)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_N_MINHASH)
    )
    est = (
        cand.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", agree.alias("n_agree"))
    )
    pair_bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_",
                    F.col("id_a").cast("string"),
                    F.col("id_b").cast("string"),
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    sample = est.filter(pair_bucket < 1311)  # deterministic ~2% of pairs
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = tok.select(F.col("doc_id").alias("id_a"), "token")
    tb = tok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        sample.select("id_a", "id_b")
        .join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("both_n"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    both = F.coalesce(F.col("both_n"), F.lit(0))
    scored = (
        sample.join(inter, ["id_a", "id_b"], "left")
        .join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "n_agree",
            (
                both / (F.col("na") + F.col("nb") - both).cast("double")
            ).alias("exact_j"),
        )
    )
    tot = est.groupBy("n_agree").agg(F.count("*").alias("n_candidates"))
    stats = scored.groupBy("n_agree").agg(
        F.count("exact_j").alias("n_sampled"),
        F.round(F.avg("exact_j"), 6).alias("avg_exact"),
        F.round(F.min("exact_j"), 6).alias("min_exact"),
        F.round(F.max("exact_j"), 6).alias("max_exact"),
    )
    return (
        tot.join(stats, "n_agree", "left")
        .select(
            "n_agree",
            F.round(
                F.col("n_agree") / F.lit(float(_N_MINHASH)), 6
            ).alias("est_jaccard"),
            "n_candidates",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            "avg_exact",
            "min_exact",
            "max_exact",
        )
    )


def _semantic_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document SemDeDup drop flags ``(doc_id, dropped)`` of
    ``pipe_dedup_semantic`` — the rep-collapsed sign-LSH + cosine
    verify over distinct embeddings, shared with the funnel report
    (``extras4.pipe_dedup_funnel``) so the audited semantic decision
    is one body.  Docs without an embedding are absent (the consumer
    left-joins and treats null as kept, exactly as the registered
    query does)."""
    from ..operators.extras import _emb_lsh_pairs

    t = Tables(spark, sf_dir)
    embd = t.embeddings.select("vec_id", "embedding")
    groups = (
        embd.groupBy("embedding")
        .agg(F.min("vec_id").alias("rep"))
        .localCheckpoint()
    )
    rep_emb = groups.select(F.col("rep").alias("vec_id"), "embedding")
    dropped_reps = (
        _emb_lsh_pairs(rep_emb)
        .select(F.col("id_b").alias("rep"))
        .distinct()
        .withColumn("rep_dropped", F.lit(1))
    )
    nonzero = F.exists("embedding", lambda x: x != 0)
    vec_rep = embd.join(groups, "embedding").select(
        F.col("vec_id").alias("doc_id"),
        "rep",
        nonzero.alias("rep_nonzero"),
    )
    return vec_rep.join(F.broadcast(dropped_reps), "rep", "left").select(
        "doc_id",
        (
            ((F.col("doc_id") != F.col("rep")) & F.col("rep_nonzero"))
            | F.col("rep_dropped").isNotNull()
        ).alias("dropped"),
    )


def _dedup_semantic_oracle() -> str:
    from ..registry import ORACLES
    from . import extras  # noqa: F401  (register emb_neardup_lsh)

    return f"""
    WITH pairs AS ({ORACLES["emb_neardup_lsh"]})
    SELECT d.doc_id, d.lang, d.source,
           CASE WHEN p.id_b IS NULL THEN TRUE ELSE FALSE END AS kept
    FROM documents d
    LEFT JOIN (SELECT DISTINCT id_b FROM pairs) p
      ON p.id_b = d.doc_id
    """


@query("pipe_dedup_semantic", oracle=_dedup_semantic_oracle)
def pipe_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end at the document level: near-duplicate
    pairs from the hyperplane-LSH-bucketed embedding cosine
    (``emb_neardup_lsh``, cos >= 0.4), greedy keep-lowest-id flags
    joined back onto the document corpus — the embedding twin of the
    MinHash pipeline ``pipe_neardup_dedup``, and the standard SemDeDup
    shape: cluster/bucket in embedding space, drop all but one per
    near-dup relation.

    Composed from the registered pair builder's BODY (and the oracle
    from the registered oracle SQL), so the dedup decision evaluated
    here is exactly the shipped near-dup operator. One distinct over
    the (bucketed, sub-quadratic) pair list + one left-anti-shaped
    join against the corpus — linear beyond the pair generation.

    EXACT-GROUP REPRESENTATIVE COLLAPSE (round 7, the
    ``pipe_neardup_dedup`` cure applied in embedding space): LSH +
    cosine verify run over one representative per DISTINCT embedding
    (min vec_id).  Result-identical: identical vectors share buckets
    and have cosine 1 >= 0.4 — except the all-zero vector, whose
    cosine is NaN with everything and which therefore never pairs, so
    the within-group drop is guarded on the representative having a
    nonzero component; cross-group bucket/cosine depend only on the
    vector, so rep pairs decide all members (same interleaving-safe
    min-id argument as the text collapse).  The unchanged per-document
    oracle re-certifies the equivalence every gate run; measured
    147.6 s -> distinct-scaled on the 10x exact-clone corpus."""
    t = Tables(spark, sf_dir)
    flags = _semantic_flags(spark, sf_dir)
    return (
        t.documents.select("doc_id", "lang", "source")
        .join(F.broadcast(flags), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            (~F.coalesce("dropped", F.lit(False))).alias("kept"),
        )
    )


_LM_BOTTOM = 10  # most-improbable docs to emit


@query(
    "text_bigram_lm",
    oracle=f"""
    WITH bg AS (
        SELECT d.doc_id, substr(d.text, CAST(i.i AS INTEGER), 2) AS g
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text) - 1
    ),
    lm AS (
        SELECT g,
               CAST(ROUND(LN(COUNT(*) * 1.0
                             / (SELECT COUNT(*) FROM bg)), 9)
                    AS DECIMAL(12, 9)) AS lp
        FROM bg GROUP BY g
    ),
    scored AS (
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               SUM(lm.lp) AS slp
        FROM bg JOIN lm USING (g)
        GROUP BY bg.doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           ROUND(CAST(slp AS DOUBLE) / n_bigrams, 6) AS avg_lp
    FROM scored
    ORDER BY avg_lp ASC, doc_id LIMIT {_LM_BOTTOM}
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model quality score: train bigram
    log-probabilities on the corpus itself (one aggregate), score every
    document by its mean bigram log-prob, and surface the 10 most
    improbable documents — the self-supervised "perplexity filter" a
    pretraining pipeline runs when no external LM is available (KenLM's
    role, order 2, no smoothing needed since every scored bigram is by
    construction in the corpus).

    Determinism: each bigram's log-prob is quantized ONCE to
    DECIMAL(12,9) (a 1-ulp engine difference in LN dies at the 9th
    decimal), and per-doc sums of decimals are exact and
    order-independent — so the knife-edge bottom-10 ranking is stable
    across engines and partitionings. The scoring join keys on the
    bigram string; fan-out per key is that bigram's corpus frequency —
    at 100 TB the ~1k-row bigram LM is a broadcast dictionary, making
    the whole scorer a map-side pass over the exploded corpus (the
    explode is pre-repartitioned like the tokenizer so one fat split
    cannot serialize it)."""
    t = Tables(spark, sf_dir)
    bg = (
        t.documents.filter(F.length("text") > 1)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
        )
        .select("doc_id", F.expr("substring(text, i, 2)").alias("g"))
    )
    total = bg.agg(F.count("*").alias("tot"))
    lm = (
        bg.groupBy("g")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(total))
        .select(
            "g",
            F.round(F.log(F.col("c") / F.col("tot")), 9)
            .cast("decimal(12,9)")
            .alias("lp"),
        )
    )
    scored = (
        bg.join(F.broadcast(lm), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("slp"))
    )
    return (
        scored.select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_lp"),
        )
        .orderBy(F.asc("avg_lp"), "doc_id")
        .limit(_LM_BOTTOM)
    )


_WIN_K = 4  # winnowing k-gram length (chars)
_WIN_W = 5  # winnowing window (k-grams per window)


@query(
    "text_winnowing",
    oracle=f"""
    WITH kg AS (
        SELECT d.doc_id,
               CAST(i.i AS INTEGER) AS pos,
               CAST(('0x' || substr(md5(substr(d.text, CAST(i.i AS INTEGER),
                                               {_WIN_K})), 1, 8))
                    AS BIGINT) AS h
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text) - {_WIN_K - 1}
    ),
    wmin AS (
        SELECT doc_id, pos,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                                     AND {_WIN_W - 1} FOLLOWING) AS mh,
               COUNT(*) OVER (PARTITION BY doc_id) AS nk
        FROM kg
    ),
    sel AS (
        SELECT DISTINCT doc_id, mh
        FROM wmin WHERE pos <= nk - {_WIN_W - 1}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           MIN(mh) AS min_fp
    FROM sel GROUP BY doc_id
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, the
    MOSS algorithm): hash every char 4-gram, slide a 5-gram window, keep
    each window's minimum hash — guaranteeing any shared substring of
    length >= k+w−1 = 8 contributes a shared fingerprint, with ~2/(w+1)
    selection density. The plagiarism/near-dup fingerprinting scheme
    that MinHash doesn't give you: position-local, so it survives
    partial overlap (a copied paragraph in an otherwise-new doc).

    Hashes are md5-derived BIGINTs (engine-identical); selection keeps
    distinct minimum VALUES per doc (winnowing's set semantics), so no
    position tie-break is needed and the result is order-insensitive.
    One explode + one bounded window min + one distinct-agg — linear,
    clustered on doc_id, with the usual pre-explode repartition."""
    t = Tables(spark, sf_dir)
    kg = (
        t.documents.filter(F.length("text") >= _WIN_K)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (_WIN_K - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.conv(
                F.substring(
                    F.md5(F.expr(f"substring(text, pos, {_WIN_K})")), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    wmin = kg.select(
        "doc_id",
        "pos",
        F.min("h")
        .over(
            W.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(0, _WIN_W - 1)
        )
        .alias("mh"),
        F.count("*").over(W.partitionBy("doc_id")).alias("nk"),
    )
    sel = (
        wmin.filter(F.col("pos") <= F.col("nk") - (_WIN_W - 1))
        .select("doc_id", "mh")
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("mh").alias("min_fp"),
    )
