"""Training-data pipeline composites & physical-layout operators.

Single-purpose stages (quality scoring, dedup, token accounting,
sampling) live in ``text.py`` / ``similarity.py``; a real 100 TB corpus
run composes them. This module registers the composed pipelines as
first-class, oracle-checked queries, plus the bucketed-layout join that
is the engine's shuffle-free co-location story (SURVEY.md §4 O1-O3):

- ``pipe_clean_corpus`` — the C4-style clean: quality gate -> exact
  content dedup (keep lowest doc_id) -> per-(lang, source) document and
  token-budget accounting, one declarative plan.
- ``pipe_stratified_sample`` — deterministic per-language training-mix
  sampling by content hash (reproducible across engines and reruns,
  pushes down as an ordinary predicate — no RNG state, no driver).
- ``rel_bucketed_join`` — both fact tables written ``bucketBy`` the join
  key, then joined WITHOUT a shuffle (the plan's only Exchange is the
  final aggregate's); at 100 TB this is the difference between a
  terabyte-scale network step and none. Plan asserted in
  ``tests/test_plans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "pipe_clean_corpus",
    oracle="""
    WITH feat AS (
        SELECT doc_id, lang, source, text,
               CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               n_chars
        FROM documents
    ),
    keep AS (
        SELECT * FROM feat
        WHERE n_tokens BETWEEN 20 AND 80
          AND n_chars * 1.0 / n_tokens BETWEEN 3 AND 12
    ),
    ded AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM keep
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS ws_tokens,
           CAST(SUM(LEN(regexp_extract_all(text, '[a-z0-9]{1,4}')))
                AS BIGINT) AS bpe_tokens
    FROM ded WHERE rn = 1
    GROUP BY lang, source
    """,
)
def pipe_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-corpus cleaning pipeline as ONE declarative
    plan: heuristic quality gate (same semantics as
    ``text_quality_score``) -> exact content dedup keeping the lowest
    doc_id (same as ``text_exact_dedup``) -> per-(lang, source) doc and
    token-budget totals (whitespace + BPE-ish, same as
    ``text_token_count``).

    Every stage is JVM-side: the quality gate is a filter that pushes
    into the scan, dedup is one row_number window hash-partitioned on
    the content hash (no skew — keys are md5), accounting is a hash
    aggregate. Composing stages declaratively (rather than
    materializing between them) lets Catalyst pipeline the whole clean
    into two shuffles (dedup hash, final agg) regardless of corpus
    size."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    feat = t.documents.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        "n_chars",
    )
    avg_len = F.col("n_chars") / F.col("n_tokens")
    keep = feat.filter(
        F.col("n_tokens").between(20, 80) & avg_len.between(3, 12)
    )
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    ded = keep.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return ded.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("ws_tokens"),
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]{1,4}"), 0))
        ).alias("bpe_tokens"),
    )


@query(
    "pipe_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS INTEGER) % 100
          < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
    """,
)
def pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling: keep 20% of English docs and 50% of every
    other language, selected by doc-id content hash — the deterministic
    stratified sampler (same md5-bucket idiom as ``traj_sample_workload``,
    R17). Reproducible across engines/reruns and fully pushed down; at
    100 TB the sampler is a scan predicate, not an operator with RNG
    state."""
    t = Tables(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    return t.documents.filter(bucket % 100 < rate).select("doc_id", "lang")


@query(
    "rel_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18, 4))) AS DOUBLE), 6) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def rel_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-fact join via bucketed layout: both tables are
    written ``bucketBy(8, orderkey)`` + ``sortBy`` (the write-time
    analog of the reference's STR partitioning: co-location decided at
    layout time, SURVEY.md §4 O1), then sort-merge joined with NO
    exchange on either side — the plan's only shuffle is the final
    4-row aggregate's. At 100 TB the bucketed layout turns every
    orderkey join from a full-network shuffle into a local merge;
    ``tests/test_plans.py`` pins the exchange count.

    The query is self-contained (writes the bucketed tables from the
    sf_dir fixtures, then reads them back), so its CORRECTNESS row
    proves the round trip, not just the join."""
    t = Tables(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    sides = (
        ("orders", t.orders.select("o_orderkey", "o_orderpriority"),
         "o_orderkey"),
        ("lineitem",
         t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
         "l_orderkey"),
    )
    db_loc = spark.catalog.getDatabase("bucketed").locationUri
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for name, df, key in sides:
        # a fresh session's in-memory catalog forgets the table but its
        # location persists — drop both, then write (Hadoop FS API, so
        # the purge works on HDFS/S3 exactly as on local disk)
        spark.sql(f"DROP TABLE IF EXISTS bucketed.{name}_b")
        p = jvm.org.apache.hadoop.fs.Path(f"{db_loc}/{name}_b")
        p.getFileSystem(hconf).delete(p, True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bucketed.{name}_b")
        )
    o = spark.table("bucketed.orders_b")
    li = spark.table("bucketed.lineitem_b")
    return (
        # MERGE hint: at fixture scale the optimizer would broadcast the
        # 4-column orders side, which is exactly what a 100 TB fact-fact
        # join cannot do — pin sort-merge so the strategy (and the plan
        # test) is decided by the bucketed layout alone
        li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            # DECIMAL accumulation: a join-reordered double sum differs
            # across engines in the last ulps; per-row quantization to
            # DECIMAL(18,4) then exact decimal addition is
            # order-independent, so the hash matches everywhere
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ).cast("double"),
                6,
            ).alias("revenue"),
        )
    )


def _neardup_dropped_reps(spark: SparkSession, groups: DataFrame) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification
    over the exact-group representatives: the (rep, rep_dropped=1)
    relation of ``pipe_neardup_dedup``, shared with the funnel report
    (``extras4.pipe_dedup_funnel``) so the audited dedup decision is
    one body.

    The verify intersects INTEGER token ids: a deterministic injective
    token -> id dictionary (hash bucket * 2^40 + rank-within-bucket —
    two-phase, so no corpus-wide single-partition sort) is broadcast
    onto the token stream (the ``text_bigram_lm`` broadcast-dictionary
    discipline), and each candidate pair intersects two int arrays.
    |A∩B| and the set sizes are invariant under any injective
    relabeling, so the Jaccard >= 0.5 decision is bit-identical to the
    string form the oracle computes."""
    from .text import _lsh_candidates, _minhash_cols

    n = spark.sparkContext.defaultParallelism
    # repartition AFTER the rep -> doc_id alias: hash partitioning does
    # not survive the rename, and without it the signature aggregate
    # AQE-coalesces to ~2 partitions and the 4.8M-pair array verify
    # runs on 2 cores (measured 26 s -> 5 s; the doc_tokens discipline)
    rep_docs = groups.select(
        F.col("rep").alias("doc_id"), "text"
    ).repartition(n, "doc_id")
    rtok = rep_docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    sig = rtok.groupBy("doc_id").agg(*_minhash_cols()).localCheckpoint()
    cand = _lsh_candidates(sig)
    tok = rtok.distinct()
    bucket = F.pmod(F.xxhash64("token"), F.lit(1024)).cast("int")
    vocab = (
        tok.select("token")
        .distinct()
        .withColumn("b", bucket)
        .withColumn(
            "tid",
            F.col("b").cast("long") * F.lit(1 << 40).cast("long")
            + F.row_number().over(W.partitionBy("b").orderBy("token")),
        )
        .select("token", "tid")
    )
    lists = (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("tid")).alias("toks"),
            F.count("*").alias("n"),
        )
    )
    la = lists.select(
        F.col("doc_id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    lb = lists.select(
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    v = (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .withColumn("both_n", F.size(F.array_intersect("toks_a", "toks_b")))
    )
    jac = F.col("both_n") / (F.col("na") + F.col("nb") - F.col("both_n"))
    return (
        v.filter(jac >= 0.5)
        .select(F.col("id_b").alias("rep"))
        .distinct()
        .withColumn("rep_dropped", F.lit(1))
    )


def _neardup_oracle() -> str:
    from .text import _MINHASH_ORACLE_BANDS, _MINHASH_ORACLE_SIG

    return f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    sig AS (SELECT doc_id, {_MINHASH_ORACLE_SIG} FROM tok GROUP BY doc_id),
    bands AS ({_MINHASH_ORACLE_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS both_n
        FROM cand c
        JOIN tok ta ON ta.doc_id = c.id_a
        JOIN tok tb ON tb.doc_id = c.id_b AND tb.token = ta.token
        GROUP BY c.id_a, c.id_b
    ),
    ver AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE both_n * 1.0 / (sa.n + sb.n - both_n) >= 0.5
    )
    SELECT d.doc_id,
           CASE WHEN v.id_b IS NULL THEN 1 ELSE 0 END AS keep
    FROM documents d
    LEFT JOIN (SELECT DISTINCT id_b FROM ver) v ON d.doc_id = v.id_b
    """


@query("pipe_neardup_dedup", oracle=_neardup_oracle)
def pipe_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup dedup pipeline END-TO-END, one declarative
    plan: MinHash-LSH candidate generation (``text_minhash_neardup``'s
    first-colliding-band equi-join — linear in corpus + pairs, never
    all-pairs) -> EXACT token-Jaccard verification of only the
    candidates (sketch recall, exact precision) -> greedy keep-first
    decision: a doc is dropped iff a verified near-dup (J >= 0.5) with a
    smaller doc_id exists. Returns every doc with its keep flag.

    Verification attaches each side's SORTED TOKEN ARRAY and intersects
    in one JVM expression (`array_intersect`) — the "verify the
    shortlist" pattern with per-pair work O(|A|+|B|) and NO token
    explosion: the dup-cluster corpus yields ~4.8M candidate pairs at
    sf0.1, and the former pairs x tokens equi-join shuffled ~7e8 narrow
    rows to re-group them per pair (16 s); the array form ships each
    pair once and verifies in codegen (~3 s, 5x).  At 100 TB the token
    arrays ride the same (doc -> pairs) shuffle the candidate join
    already does, and the corpus-wide token table is never self-joined.
    md5-based signatures make even the sketch stage bit-identical
    across engines, so the WHOLE pipeline is FULLY oracle-checked (the
    md5 trick, SURVEY.md §2.2 determinism rules).

    EXACT-GROUP REPRESENTATIVE COLLAPSE (round 7): the LSH + verify
    stages run over one REPRESENTATIVE per distinct text (min doc_id),
    not over every document.  Result-identical by construction: docs
    with identical text have identical token sets, identical MinHash
    signatures (candidates in every band) and J = 1 (every text —
    including the empty one — tokenizes to >= 1 token, so J is never
    0/0), hence every non-representative is dropped by its own
    representative, and cross-group candidacy/verification depend only
    on the text, so rep-level pairs decide them for all members:
    keep(doc) = (doc == rep) AND rep not dropped at rep level.  The
    UNCHANGED per-document oracle re-certifies the equivalence on
    every gate run.  Why it matters at 100 TB: real corpora carry
    massive exact-duplicate clusters (boilerplate), and without the
    collapse in-bucket candidate pairs grow as clones² — measured
    5.3 s -> 240 s on a 10x exact-clone corpus before this change;
    with it the near-dup stages scale with DISTINCT texts (the
    RefinedWeb/Falcon exact-before-fuzzy dedup ordering).

    INT-ID VERIFY (round 12, guide §2.3 narrower types): the exact
    intersection runs over integer token ids, not token strings — a
    deterministic injective dictionary (hash-bucketed two-phase rank,
    no global sort) is broadcast onto the token stream before the
    per-doc array aggregate, so every candidate pair intersects two
    int arrays instead of two string arrays.  |A∩B|, |A|, |B| are
    bijection-invariant, so the Jaccard decision (and the oracle
    hash) is unchanged; measured 3.3 s -> 1.5 s on the 4.8M-pair
    sf0.1 verify."""
    t = Tables(spark, sf_dir)
    groups = (
        t.documents.groupBy("text")
        .agg(F.min("doc_id").alias("rep"))
        .localCheckpoint()
    )
    dropped_reps = _neardup_dropped_reps(spark, groups)
    doc_rep = (
        t.documents.select("doc_id", "text")
        .join(groups, "text")
        .select("doc_id", "rep")
    )
    return (
        doc_rep.join(dropped_reps, "rep", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") == F.col("rep"))
                & F.col("rep_dropped").isNull(),
                1,
            )
            .otherwise(0)
            .alias("keep"),
        )
    )


def _incremental_oracle() -> str:
    from .text import _MINHASH_ORACLE_BANDS, _MINHASH_ORACLE_SIG

    return f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    sig AS (SELECT doc_id, {_MINHASH_ORACLE_SIG} FROM tok GROUP BY doc_id),
    bands AS ({_MINHASH_ORACLE_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT c.id_new, c.id_old, COUNT(*) AS both_n
        FROM cand c
        JOIN tok ta ON ta.doc_id = c.id_new
        JOIN tok tb ON tb.doc_id = c.id_old AND tb.token = ta.token
        GROUP BY 1, 2
    ),
    jacs AS (
        SELECT i.id_new, i.id_old,
               ROUND(i.both_n * 1.0 / (sa.n + sb.n - i.both_n), 6) AS j
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_new
        JOIN sizes sb ON sb.doc_id = i.id_old
    ),
    best AS (
        SELECT id_new, id_old, j,
               ROW_NUMBER() OVER (PARTITION BY id_new
                                  ORDER BY j DESC, id_old) AS rk
        FROM jacs
    )
    SELECT d.doc_id, b.id_old AS dup_of, b.j AS jaccard,
           CASE WHEN b.j >= 0.5 THEN 0 ELSE 1 END AS keep
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.id_new = d.doc_id
    """


@query("pipe_incremental_dedup", oracle=_incremental_oracle)
def pipe_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup — the daily-ingest shape: a NEW batch
    (odd doc_ids) deduped against the EXISTING corpus (even doc_ids)
    without ever re-pairing the existing corpus with itself. This is
    what a production pipeline runs per increment: the corpus-side
    MinHash signatures are a persisted artifact, the new batch's
    signatures are one linear aggregate, and the band join is
    new x existing only.

    Same first-colliding-band LSH emission as ``text_minhash_neardup``
    (cross-side, so no id-ordering filter is needed — the sides are
    disjoint), exact token-Jaccard verification of the shortlist only,
    then per-new-doc best match via one window (rounded Jaccard DESC,
    id ASC — deterministic cross-engine tie-break) and a keep flag at
    J >= 0.5. Every new doc appears exactly once, match or not."""
    from .text import _BAND_W, _N_MINHASH, _minhash_cols

    t = Tables(spark, sf_dir)
    sig = (
        t.doc_tokens()
        .groupBy("doc_id")
        .agg(*_minhash_cols())
        .localCheckpoint()
    )
    new_sig = sig.filter(F.col("doc_id") % 2 == 1)
    old_sig = sig.filter(F.col("doc_id") % 2 == 0)
    n_bands = _N_MINHASH // _BAND_W

    def bucket(j: int) -> F.Column:
        return F.concat(
            *[F.col(f"mh{_BAND_W * j + r}") for r in range(_BAND_W)]
        )

    parts = []
    for j in range(n_bands):
        a = new_sig.select(
            F.col("doc_id").alias("id_new"),
            *[bucket(i).alias(f"ba{i}") for i in range(j + 1)],
        )
        b = old_sig.select(
            F.col("doc_id").alias("id_old"),
            *[bucket(i).alias(f"bb{i}") for i in range(j + 1)],
        )
        pairs = a.join(F.broadcast(b), F.col(f"ba{j}") == F.col(f"bb{j}"))
        for i in range(j):
            pairs = pairs.filter(F.col(f"ba{i}") != F.col(f"bb{i}"))
        parts.append(pairs.select("id_new", "id_old"))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    tok = t.doc_tokens().distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = tok.select(F.col("doc_id").alias("id_new"), "token")
    tb = tok.select(F.col("doc_id").alias("id_old"), "token")
    inter = (
        cand.join(ta, "id_new")
        .join(tb, ["id_old", "token"])
        .groupBy("id_new", "id_old")
        .agg(F.count("*").alias("both_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_new"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_old"), F.col("n").alias("nb"))
    jacs = (
        inter.join(sa, "id_new")
        .join(sb, "id_old")
        .select(
            "id_new",
            "id_old",
            F.round(
                F.col("both_n")
                / (F.col("na") + F.col("nb") - F.col("both_n")),
                6,
            ).alias("j"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("id_new").orderBy(F.desc("j"), "id_old")
    )
    best = jacs.withColumn("rk", rk).filter(F.col("rk") == 1)
    return (
        t.documents.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id")
        .join(best, F.col("doc_id") == F.col("id_new"), "left")
        .select(
            "doc_id",
            F.col("id_old").alias("dup_of"),
            F.col("j").alias("jaccard"),
            F.when(F.col("j") >= 0.5, 0).otherwise(1).alias("keep"),
        )
    )


def _dedup_quality_oracle() -> str:
    from .text import _JACCARD_PAIRS_SQL

    return f"""
    WITH RECURSIVE {_JACCARD_PAIRS_SQL},
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE both_n * 1.0 / (sa.n + sb.n - both_n) >= 0.2
    ),
    edges AS MATERIALIZED (
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
            FROM reach GROUP BY node),
    q AS (
        SELECT d.doc_id, COUNT(DISTINCT t.token) AS quality
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
        GROUP BY d.doc_id
    ),
    rk AS (
        SELECT lab.doc_id, lab.cluster_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
                                  ORDER BY q.quality DESC, lab.doc_id)
                 AS rk
        FROM lab JOIN q USING (doc_id)
    )
    SELECT doc_id, cluster_id, CAST(quality AS BIGINT) AS quality,
           CASE WHEN rk = 1 THEN 1 ELSE 0 END AS keep
    FROM rk
    """


@query("pipe_dedup_quality", oracle=_dedup_quality_oracle)
def pipe_dedup_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE cluster dedup — keep the BEST document of every
    near-dup cluster, not the lowest-id one (what C4/RefinedWeb
    actually do: among near-duplicates, retain the richest copy).
    Composes two registered builders: ``text_dedup_cluster``'s
    connected-component labels and a per-doc quality score, then one
    window picks each cluster's argmax.

    Quality here = DISTINCT-token count — an INTEGER, so the
    cross-engine argmax has no float-tie hazard; ties break to the
    lowest doc_id. Every doc appears once with its cluster, quality,
    and keep flag; singleton clusters trivially keep themselves."""
    from .text import text_dedup_cluster

    t = Tables(spark, sf_dir)
    labels = text_dedup_cluster(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    quality = (
        t.doc_tokens()
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("quality"))
    )
    rk = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .withColumn("rk", rk)
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            F.when(F.col("rk") == 1, 1).otherwise(0).alias("keep"),
        )
    )
