"""K. Text / LLM-pipeline operators (SURVEY.md §2.2-K; north-star).

The dedup/similarity machinery a 100 TB training-data pipeline needs,
expressed with the same discipline as the trajectory ops: exact dedup is a
hash aggregate; near-dup is *blocked* pair generation (never all-pairs);
MinHash-LSH is the scale path — signatures are per-doc aggregates (linear),
candidate pairs come from an equi-join on band buckets. All hashing uses
md5 so the DuckDB oracle computes identical signatures.

``documents.text`` is space-separated lowercase word soup (FIXTURES.md),
so whitespace tokenization is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vector import cosine, to_double
from ..registry import query
from ..tables import Tables

_N_MINHASH = 8  # signature length
_BAND_W = 4  # hashes per LSH band -> 2 bands; P(candidate) ~ jaccard^4

# Document-frequency cap for the raw pair-join near-dup path: a token in
# more than this many docs of its (lang, source) block is dropped before
# pairing, bounding any join key's pair fan-out at _DF_CAP^2 — the
# standard hot-token skew guard (VERDICT r1 #5). Mirrored in the oracle,
# so the capped Jaccard is the DEFINED semantics at every scale. (The
# uncapped scale path is text_minhash_neardup.)
_DF_CAP = 100

_JACCARD_PAIRS_SQL = f"""
    tok AS (
        SELECT DISTINCT d.doc_id, d.lang, d.source, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    hot AS (
        SELECT token, lang, source FROM tok
        GROUP BY token, lang, source HAVING COUNT(*) > {_DF_CAP}
    ),
    tokc AS (
        SELECT t.* FROM tok t
        ANTI JOIN hot h
          ON t.token = h.token AND t.lang = h.lang AND t.source = h.source
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS both_n
        FROM tokc a JOIN tokc b
          ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
"""


def _jaccard_capped_tokens(t: Tables) -> DataFrame:
    """Distinct (doc, lang, source, token) rows with hot tokens dropped.

    The hot list is tiny BY CONSTRUCTION (only tokens above the cap), so
    the guard is a broadcast anti-join — no extra shuffle on the skewed
    key itself."""
    tok = (
        t.documents.repartition(t.spark.sparkContext.defaultParallelism, "doc_id").select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .distinct()
    )
    hot = (
        tok.groupBy("token", "lang", "source")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _DF_CAP)
        .select("token", "lang", "source")
    )
    return tok.join(F.broadcast(hot), ["token", "lang", "source"], "left_anti")


@query(
    "text_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one hash aggregate, keep-lowest-id.
    At 100 TB this is the cheapest pass and always runs first."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query(
    "text_jaccard_neardup",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL}
    SELECT id_a, id_b,
           ROUND(both_n * 1.0 / (sa.n + sb.n - both_n), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE both_n * 1.0 / (sa.n + sb.n - both_n) >= 0.2
    """,
)
def text_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-set Jaccard >= 0.2, blocked by
    (lang, source) so pair generation is quadratic only within a block —
    the same blocking discipline as the similarity joins (§2.2-I).
    Tokens above the ``_DF_CAP`` per-block document frequency are dropped
    (broadcast anti-join) before pairing, so no single join key can
    explode quadratically with the corpus; the cap is part of the
    operator's defined semantics and mirrored in the oracle."""
    t = Tables(spark, sf_dir)
    tok = _jaccard_capped_tokens(t)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = tok.select(
        F.col("doc_id").alias("id_a"), "lang", "source", "token"
    )
    b = tok.select(
        F.col("doc_id").alias("id_b"), "lang", "source", "token"
    )
    inter = (
        a.join(b, ["token", "lang", "source"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("both_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("both_n") / (F.col("na") + F.col("nb") - F.col("both_n"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(jac >= 0.2)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _minhash_cols() -> list:
    """min(md5(token||'#i')) aggregate expressions, i in 0..N-1."""
    return [
        F.min(F.md5(F.concat(F.col("token"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(_N_MINHASH)
    ]


_MINHASH_ORACLE_SIG = ", ".join(
    f"MIN(md5(token || '#{i}')) AS mh{i}" for i in range(_N_MINHASH)
)
_MINHASH_ORACLE_BANDS = " UNION ALL ".join(
    "SELECT doc_id, {j} AS band, {concat} AS bucket FROM sig".format(
        j=j,
        concat=" || ".join(f"mh{_BAND_W * j + r}" for r in range(_BAND_W)),
    )
    for j in range(_N_MINHASH // _BAND_W)
)


@query(
    "text_minhash_neardup",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    sig AS (SELECT doc_id, {_MINHASH_ORACLE_SIG} FROM tok GROUP BY doc_id),
    bands AS ({_MINHASH_ORACLE_BANDS})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def text_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH candidate pairs — the near-dup SCALE path.

    Signature: 8 md5-based min-hashes per doc (one linear aggregate over
    distinct tokens). LSH: signatures banded 4-wide into 2 buckets;
    candidate pairs = docs colliding in any band, found by an equi-join on
    (band, bucket). Work is linear in corpus + output pairs — never
    all-pairs. md5 on both engines makes the signatures (and hence the
    candidate set) bit-identical, so even this sketch op is FULLY
    oracle-checked."""
    t = Tables(spark, sf_dir)
    # no distinct before the signature aggregate: MIN is multiplicity-
    # insensitive, so deduping tokens first would only add a shuffle
    # localCheckpoint: materialized once, read by every band join, and —
    # unlike a bare persist — nothing is left pinned in the cache after
    # the query finishes (ADVICE r1: the sig cache leaked across runs)
    sig = t.doc_tokens().groupBy("doc_id").agg(*_minhash_cols()).localCheckpoint()
    return _lsh_candidates(sig)


def _lsh_candidates(sig: DataFrame) -> DataFrame:
    """First-colliding-band LSH candidate pairs (id_a, id_b) over a
    signature table (doc_id, mh0..mhN): the band-join body of
    ``text_minhash_neardup``, shared with the rep-collapsed dedup
    pipeline (``pipelines.pipe_neardup_dedup``)."""
    n_bands = _N_MINHASH // _BAND_W

    def bucket(j: int) -> F.Column:
        return F.concat(
            *[F.col(f"mh{_BAND_W * j + r}") for r in range(_BAND_W)]
        )

    # Pair dedup WITHOUT a distinct(): a pair colliding in several bands
    # is emitted only by its FIRST colliding band (band j requires all
    # earlier buckets to differ). The union is then duplicate-free by
    # construction, the post-join shuffle disappears, and — the signature
    # table being tiny relative to the corpus — the band joins broadcast,
    # so at scale candidate pairs stream map-side straight to the sink.
    parts = []
    for j in range(n_bands):
        a = sig.select(
            F.col("doc_id").alias("id_a"),
            *[bucket(i).alias(f"ba{i}") for i in range(j + 1)],
        )
        b = sig.select(
            F.col("doc_id").alias("id_b"),
            *[bucket(i).alias(f"bb{i}") for i in range(j + 1)],
        )
        pairs = a.join(
            F.broadcast(b), F.col(f"ba{j}") == F.col(f"bb{j}")
        ).filter(F.col("id_a") < F.col("id_b"))
        for i in range(j):
            pairs = pairs.filter(F.col(f"ba{i}") != F.col(f"bb{i}"))
        parts.append(pairs.select("id_a", "id_b"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "text_tokens_topn",
    oracle="""
    SELECT t.token, COUNT(*) AS n
    FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    GROUP BY t.token
    ORDER BY n DESC, t.token
    LIMIT 20
    """,
)
def text_tokens_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-20 (explode + agg + top-k)."""
    t = Tables(spark, sf_dir)
    return (
        t.doc_tokens()
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
        SELECT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
           GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * LN((SELECT n_docs FROM n) * 1.0 / df.df) AS tfidf,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf * LN((SELECT n_docs FROM n)
                                           * 1.0 / df.df) DESC,
                                           tf.token) AS rn
        FROM tf JOIN df ON tf.token = df.token
    )
    SELECT doc_id, token AS top_term, ROUND(tfidf, 6) AS tfidf
    FROM scored WHERE rn = 1
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf: top-scoring term per document.

    tf is one grouped aggregate over the exploded token table; df
    derives FROM tf (tf has exactly one row per (doc, token), so doc
    frequency = tf's per-token row count) — Catalyst reuses tf's
    exchange for both branches, so the corpus is exploded and shuffled
    once and the countDistinct disappears. The corpus size joins in as
    a broadcast scalar; per-doc argmax is a window. All relational — no
    UDFs."""
    t = Tables(spark, sf_dir)
    tok = t.doc_tokens()
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), "token")
    return (
        tf.join(df, "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_term"),
            F.round("tfidf_raw", 6).alias("tfidf"),
        )
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           ROUND(AVG(LEN(string_split(text, ' '))), 6) AS avg_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics."""
    t = Tables(spark, sf_dir)
    return t.documents.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split("text", " "))), 6).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH feat AS (
        SELECT doc_id,
               CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               n_chars,
               LEN(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in','is','on')))
                   AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tokens,
           ROUND(n_chars * 1.0 / n_tokens, 6) AS avg_token_len,
           ROUND(n_stop * 1.0 / n_tokens, 6) AS stop_ratio,
           CASE WHEN n_tokens BETWEEN 20 AND 80
                 AND n_chars * 1.0 / n_tokens BETWEEN 3 AND 12
                THEN 1 ELSE 0 END AS quality_ok
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality features: token count, mean token length,
    stopword ratio, and a keep/drop flag — the standard cheap pre-filter
    stage of an LLM data pipeline."""
    t = Tables(spark, sf_dir)
    stop = ("the", "a", "of", "and", "to", "in", "is", "on")
    toks = F.split("text", " ")
    feat = t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.col("n_chars"),
        F.size(
            F.filter(toks, lambda x: x.isin(*stop))
        ).alias("n_stop"),
    )
    avg_len = F.col("n_chars") / F.col("n_tokens")
    return feat.select(
        "doc_id",
        "n_tokens",
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 6).alias("stop_ratio"),
        F.when(
            F.col("n_tokens").between(20, 80) & avg_len.between(3, 12), 1
        )
        .otherwise(0)
        .alias("quality_ok"),
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS INTEGER) AS bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish greedy
    <=4-char subword chunking via regexp — the cheap token-budget
    estimator for training-data accounting."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]{1,4}"), 0)).alias(
            "bpe_tokens"
        ),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               token || ' ' || LEAD(token, 1) OVER w || ' '
                     || LEAD(token, 2) OVER w AS shingle
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY LEAD(token, 2) OVER w IS NOT NULL
    )
    SELECT doc_id,
           MIN(md5(shingle)) AS fingerprint,
           COUNT(DISTINCT shingle) AS n_shingles
    FROM sh
    GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over 3-token shingles (winnowing
    k-min sketch with k=1) + distinct-shingle count. Shingles come from a
    window over the position-exploded token table."""
    t = Tables(spark, sf_dir)
    tok = t.documents.repartition(t.spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        tok.withColumn("t1", F.lead("token", 1).over(w))
        .withColumn("t2", F.lead("token", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .withColumn("shingle", F.concat_ws(" ", "token", "t1", "t2"))
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


@query(
    "mm_multimodal_join",
    oracle="""
    WITH ev AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    q AS (SELECT i, v FROM ev WHERE vec_id = 0),
    cs AS (
        SELECT ev.vec_id,
               SUM(ev.v * q.v)
               / (SQRT(SUM(ev.v * ev.v)) * SQRT(SUM(q.v * q.v))) AS c
        FROM ev JOIN q USING (i)
        GROUP BY ev.vec_id
    )
    SELECT d.doc_id, d.lang, d.n_chars, ROUND(cs.c, 6) + 0.0 AS cos_sim
    FROM documents d JOIN cs ON d.doc_id = cs.vec_id
    WHERE d.lang = 'en'
    """,
)
def mm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join: text metadata ⋈ embedding vectors (doc_id=vec_id)
    with query-vector cosine + language filter — the retrieval-style
    text+vector fusion query."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", to_double("embedding").alias("emb"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    docs = t.documents.filter(F.col("lang") == "en").select(
        "doc_id", "lang", "n_chars"
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .join(F.broadcast(q))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.round(cosine(F.col("emb"), F.col("q_emb")), 6) + 0.0).alias("cos_sim"),
        )
    )


# language-ID marker profiles: disjoint unigram sets per candidate
# language (the fixtures' vocabulary is shared across langs, so the
# classifier is a deterministic scoring harness — the operator SHAPE is
# the point: broadcast dictionary join + per-doc argmax, the same plan a
# real n-gram/stopword profile table produces at 100 TB).
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "es": ["scan", "sort", "merge"],
    "de": ["join", "group", "agg"],
    "fr": ["window", "order", "key"],
    "zh": ["hash", "stream", "batch"],
}

_LANGID_ORACLE_MARKERS = " UNION ALL ".join(
    f"SELECT '{lang}' AS cand, '{tok}' AS token"
    for lang, toks in sorted(_LANG_MARKERS.items())
    for tok in toks
)


@query(
    "text_langid",
    oracle=f"""
    WITH markers AS ({_LANGID_ORACLE_MARKERS}),
    tok AS (
        SELECT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    hits AS (
        SELECT tok.doc_id, m.cand, COUNT(*) AS n
        FROM tok JOIN markers m ON tok.token = m.token
        GROUP BY tok.doc_id, m.cand
    ),
    ranked AS (
        SELECT doc_id, cand, n,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, cand) AS rk
        FROM hits
    )
    SELECT d.doc_id, d.lang,
           COALESCE(r.cand, 'und') AS pred_lang,
           COALESCE(r.n, 0) AS score
    FROM documents d
    LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rk = 1
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by unigram-profile scoring: count marker-
    token hits per candidate language (multiplicity-weighted), predict
    the argmax with (count DESC, lang ASC) tie-break; docs with no hits
    classify as 'und'. One broadcast dictionary join + two aggregates —
    linear in the corpus, no per-row Python."""
    t = Tables(spark, sf_dir)
    markers = spark.createDataFrame(
        [
            (lang, tok)
            for lang, toks in sorted(_LANG_MARKERS.items())
            for tok in toks
        ],
        "cand string, token string",
    )
    tok = t.documents.repartition(t.spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    hits = (
        tok.join(F.broadcast(markers), "token")
        .groupBy("doc_id", "cand")
        .agg(F.count("*").alias("n"))
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("n").desc(), "cand")
    )
    best = hits.withColumn("rk", rk).filter(F.col("rk") == 1)
    return t.documents.select("doc_id", "lang").join(
        best.select("doc_id", "cand", "n"), "doc_id", "left"
    ).select(
        "doc_id",
        "lang",
        F.coalesce("cand", F.lit("und")).alias("pred_lang"),
        F.coalesce("n", F.lit(0)).alias("score"),
    )


@query(
    "text_dedup_cluster",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_SQL},
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE both_n * 1.0 / (sa.n + sb.n - both_n) >= 0.2
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.label
        FROM reach r JOIN edges e ON e.v = r.node
        WHERE r.label < e.u
    ),
    lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node)
    SELECT lab.doc_id, lab.cluster_id, c.cluster_size
    FROM lab JOIN (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM lab
        GROUP BY cluster_id
    ) c USING (cluster_id)
    """,
)
def text_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERING: connected components over the Jaccard near-dup
    pair graph — the step a real pipeline runs after pair generation
    (keep one doc per component). Iterative min-label propagation:
    every doc starts labeled with its own id; each round every node
    takes the minimum label in its closed neighborhood; fixpoint in
    O(diameter) rounds. Spark-first shape: per round one join + one
    aggregate, convergence checked with a single scalar (the same
    driver footprint as AQE); edges re-used from cache. The DuckDB
    oracle computes the same labels with a recursive CTE — an iterative
    distributed algorithm, still FULLY oracle-checked."""
    pairs = text_jaccard_neardup(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    t = Tables(spark, sf_dir)
    nodes = t.documents.select(F.col("doc_id").alias("node"))
    labels = connected_components(nodes, edges)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


# Each round's plan embeds the previous round's ~4x (labels enters the
# neighborhood join and the hop projection, and the pointer-doubling
# chase joins hop against itself), so lineage grows GEOMETRICALLY, not
# linearly — plan analysis blows up within a few unmaterialized rounds.
# Checkpoint every 2 rounds: worst-case plan is 4^2 = 16x the base,
# bounded for any graph diameter.
_CC_CHECKPOINT_EVERY = 2

#: edge-count ceiling for the driver union-find fast path.  Below it,
#: fetching the EDGE LIST (never the node table) is a bounded driver
#: transfer — 2M (u, v) int64 pairs are 32 MB on the wire and land as
#: two NumPy arrays of the same size via Arrow toPandas (collecting
#: pyspark Rows instead would pay ~10x that in Python object
#: overhead) — and a single union-find pass replaces 5+ distributed
#: label-propagation rounds whose per-round scheduling overhead
#: dominates small graphs (~7.6 s -> ~1 s for the 1.5k-node
#: trajectory cluster graph).  Above it, the iterative path runs
#: unchanged; the same cost-dispatch discipline as graph_pagerank's
#: broadcast-vs-shuffle switch.  Labels are IDENTICAL either way (min
#: node id per component), pinned by a both-branch pytest.
_CC_DRIVER_EDGE_CAP = 2_000_000


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Connected components by iterative min-label propagation: every
    node starts labeled with its own id; each round every node takes the
    minimum label in its closed neighborhood; fixpoint in O(diameter)
    rounds. Per round: one join + one aggregate, convergence checked
    with a single driver scalar (the same footprint as AQE stats).

    Every ``_CC_CHECKPOINT_EVERY`` rounds the label table is
    ``localCheckpoint()``-ed, truncating the logical plan: without this
    the lineage deepens every round and a long-diameter graph (a chain
    of near-dups) blows up plan analysis long before the data does
    (VERDICT r1 #7). ``nodes``: one column ``node``; ``edges``: columns
    ``(u, v)``, directed (pass both directions for undirected graphs).
    Returns (node, label).

    Iteration economics (the streaming state-store argument, applied to
    a loop): every round pays per-shuffle-partition scheduling overhead
    REGARDLESS of data volume, so the partition count must track the
    label-table size, not the session's scan width — a 32-wide tiny CC
    was ~10x slower than the same loop at width 1. Convergence is
    checked with one aggregate, not a join: labels only ever DECREASE,
    so the label-sum (exact DECIMAL — a bigint sum overflows at
    ~10^9 nodes x 10^12 ids) is strictly monotone and stalls exactly at
    the fixpoint."""
    spark = nodes.sparkSession
    edges = edges.persist()
    n_edges = edges.count()  # also materializes the (possibly 2x) input
    if n_edges <= _CC_DRIVER_EDGE_CAP:
        # driver union-find fast path (see _CC_DRIVER_EDGE_CAP): only
        # edge endpoints are collected; isolated nodes never leave the
        # cluster (label = own id via the left join below)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        pdf = edges.select("u", "v").toPandas()  # Arrow: 2 int64 arrays
        for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                # union by MIN so the final root is the component min
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        lab = [(x, find(x)) for x in list(parent)] + [
            (x, x) for x in set(parent.values()) - set(parent)
        ]
        edges.unpersist()
        lmap = spark.createDataFrame(lab, "node bigint, label bigint")
        return nodes.join(F.broadcast(lmap), "node", "left").select(
            "node", F.coalesce("label", F.col("node")).alias("label")
        )
    # one partition per ~2M edges, capped by the session's shuffle width
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(width, n_edges // 2_000_000 + 1))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        labels = nodes.select(
            F.col("node"), F.col("node").alias("label")
        ).persist()
        prev_sum = None
        rounds = 0
        while True:
            neigh = (
                edges.join(labels, edges.v == labels.node)
                .groupBy("u")
                .agg(F.min("label").alias("nlabel"))
            )
            hop = labels.join(
                neigh, labels.node == neigh.u, "left"
            ).select(
                "node",
                F.least(
                    "label", F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            # pointer doubling: also take the label OF the label (path
            # compression) — convergence drops from O(diameter) to
            # O(log diameter) rounds at one extra same-key join/round
            chase = hop.select(
                F.col("node").alias("label"), F.col("label").alias("ll")
            )
            new_labels = hop.join(chase, "label", "left").select(
                "node",
                F.least("label", F.coalesce("ll", F.col("label"))).alias(
                    "label"
                ),
            )
            rounds += 1
            if rounds % _CC_CHECKPOINT_EVERY == 0:
                # materializes AND truncates lineage; replaces the persist
                new_labels = new_labels.localCheckpoint()
            else:
                new_labels = new_labels.persist()
            label_sum = new_labels.agg(
                F.sum(F.col("label").cast(T.DecimalType(38, 0)))
            ).head()[0]  # one scalar per round — the convergence check
            labels.unpersist()
            labels = new_labels
            if label_sum == prev_sum:
                break
            prev_sum = label_sum
        edges.unpersist()
        out = labels.localCheckpoint()  # final materialization, no leak
        labels.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
