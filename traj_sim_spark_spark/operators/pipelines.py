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
