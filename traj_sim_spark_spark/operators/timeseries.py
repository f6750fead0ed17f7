"""Time-series physical patterns: the hypertable continuous-aggregate
rollup and a mergeable frequency sketch.

- ``rel_rollup_hypertable`` — the TimescaleDB/Druid continuous-
  aggregate chain re-expressed in one declarative plan: raw events
  roll to HOURLY cells, DAILY rolls up from hourly, MONTHLY from
  daily — each level aggregates the level below (never the raw scan
  again), which is exactly the hypertable maintenance contract: at
  100 TB the hourly pass is the only raw-data-sized job, and the
  coarser grains are ~1/3600th of it. Sums accumulate in DECIMAL
  (per-row quantization is exact for 2-dec values; decimal addition is
  order-independent — the cross-engine/cross-partitioning-safe
  formulation, see ``rel_agg_basic``).
- ``sketch_cms_topk`` — a Count-Min sketch (d=4 x w=256, md5-derived
  row hashes) built as a 1024-cell hash aggregate, then heavy hitters
  estimated by the classic min-over-rows rule. Unlike HLL, this sketch
  is DETERMINISTIC and engine-independent (md5 is md5 everywhere), so
  the row carries a FULL oracle: DuckDB builds the identical sketch
  and must agree bit-for-bit — sketches don't have to mean WEAK.
  Cells are additive, so partial aggregates merge map-side; the
  estimate join probes a broadcast-sized 1024-row table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_CMS_D = 4  # sketch rows (independent hashes)
_CMS_W = 256  # sketch width (buckets per row)
_CMS_TOPK = 10

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


@query(
    "rel_rollup_hypertable",
    oracle="""
    WITH hourly AS (
        SELECT CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 3600e6)
                    AS BIGINT) * 3600000000 AS bucket_us,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18, 2))) AS sv
        FROM events GROUP BY 1
    ),
    daily AS (
        SELECT CAST(FLOOR(bucket_us / 86400e6) AS BIGINT) * 86400000000
                   AS bucket_us,
               CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
        FROM hourly GROUP BY 1
    ),
    monthly AS (
        SELECT CAST(0 AS BIGINT) AS bucket_us,
               CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
        FROM daily
    )
    SELECT 'hour' AS grain, bucket_us, n,
           ROUND(CAST(sv AS DOUBLE), 6) AS sum_value FROM hourly
    UNION ALL
    SELECT 'day', bucket_us, n, ROUND(CAST(sv AS DOUBLE), 6) FROM daily
    UNION ALL
    SELECT 'all', bucket_us, n, ROUND(CAST(sv AS DOUBLE), 6) FROM monthly
    """,
)
def rel_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: hourly cells, daily cells, and the
    grand total in ONE aggregate pass over ONE raw scan, via
    ``ROLLUP(day, hour)`` — Spark's Expand emits the three grouping
    sets per input row and map-side partial aggregation collapses them
    to cells BEFORE the shuffle, so the exchanged volume is the sum of
    the three grains' cell counts, not 3x the data. (The naive
    formulation — three chained aggregates UNION'd — re-scans raw
    events per grain: Catalyst inlines DataFrame reuse, it does not
    materialize it. ROLLUP is the hypertable economics without a
    materialization layer; the plan test pins `Scan parquet == 1`.)

    DECIMAL accumulation makes every grain's sum order-independent, so
    the rollup is also REPARTITION-INVARIANT — a correctness property
    the continuous-aggregate pattern silently depends on."""
    t = Tables(spark, sf_dir)
    us = F.unix_micros("ts")
    base = t.events.select(
        F.floor(us / F.lit(86400e6)).alias("dy"),
        F.floor(us / F.lit(3600e6)).alias("hr"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    agg = base.rollup("dy", "hr").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.grouping("dy").alias("g_dy"),
        F.grouping("hr").alias("g_hr"),
    )
    grain = (
        F.when(F.col("g_hr") == 0, F.lit("hour"))
        .when(F.col("g_dy") == 0, F.lit("day"))
        .otherwise(F.lit("all"))
    )
    bucket = (
        F.when(F.col("g_hr") == 0, F.col("hr") * _HOUR_US)
        .when(F.col("g_dy") == 0, F.col("dy") * _DAY_US)
        .otherwise(F.lit(0))
        .cast("long")
    )
    return agg.select(
        grain.alias("grain"),
        bucket.alias("bucket_us"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sv").cast("double"), 6).alias("sum_value"),
    )


def _cms_bucket(j, token):
    """Row-j CMS bucket of a token: first 16 bits of md5('<j>:<token>'),
    mod the sketch width — bit-identical in any engine with md5."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", j, token)), 1, 4), 16, 10
        ).cast("int")
        % _CMS_W
    )


@query(
    "sketch_cms_topk",
    oracle=f"""
    WITH tok AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    rows_ AS (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS j),
    cms AS (
        SELECT j,
               CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token),
                                    1, 4)) AS INTEGER) % {_CMS_W} AS bucket,
               COUNT(*) AS cnt
        FROM tok CROSS JOIN rows_
        GROUP BY 1, 2
    ),
    probe AS (
        SELECT t.token, r.j,
               CAST(('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' ||
                                        t.token), 1, 4))
                    AS INTEGER) % {_CMS_W} AS bucket
        FROM (SELECT DISTINCT token FROM tok) t CROSS JOIN rows_ r
    ),
    est AS (
        SELECT probe.token, CAST(MIN(cms.cnt) AS BIGINT) AS est
        FROM probe JOIN cms USING (j, bucket)
        GROUP BY probe.token
    )
    SELECT token, est FROM est
    ORDER BY est DESC, token LIMIT {_CMS_TOPK}
    """,
)
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a Count-Min sketch: build a d=4 x w=256 counter
    grid over the token stream (one hash aggregate — cells are additive,
    so Spark's partial aggregation merges sketch fragments map-side
    exactly like a real distributed CMS), then estimate every candidate
    token as min over its d cells and keep the top-10.

    The md5-derived row hashes make the sketch deterministic across
    engines, partitionings, and reruns — which is why this sketch row
    has a FULL DuckDB oracle (the HLL row, engine-internal, stays
    WEAK). The estimate probe joins a 1024-row broadcast; the candidate
    set is the distinct vocabulary (itself a hash aggregate). At 100 TB
    the sketch build is one linear pass; CMS's overestimate-only error
    is part of the contract and identical on both sides."""
    t = Tables(spark, sf_dir)
    # pre-explode repartition (house tokenizer idiom): the docs fixture
    # is one row group; without this the tokenize + 4x md5 hashing runs
    # on a single task
    tok = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    with_j = tok.join(F.broadcast(rows))
    cms = (
        with_j.select("j", _cms_bucket(F.col("j"), F.col("token")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probe = (
        tok.distinct()
        .join(F.broadcast(rows))
        .select(
            "token",
            "j",
            _cms_bucket(F.col("j"), F.col("token")).alias("bucket"),
        )
    )
    est = (
        probe.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )
    return est.orderBy(F.desc("est"), "token").limit(_CMS_TOPK)


_QH_BINS = 256
_QH_QS = (0.5, 0.95, 0.99)


@query(
    "sketch_quantile_hist",
    oracle=f"""
    WITH stats AS (
        SELECT MIN(value) AS mn, MAX(value) AS mx, COUNT(*) AS n
        FROM events
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR((value - (SELECT mn FROM stats))
                                / ((SELECT mx FROM stats)
                                   - (SELECT mn FROM stats))
                                * {_QH_BINS}) AS BIGINT),
                     {_QH_BINS - 1}) AS bin
        FROM events
    ),
    hist AS (SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin),
    cum AS (
        SELECT bin, c,
               SUM(c) OVER (ORDER BY bin) AS cum,
               SUM(c) OVER (ORDER BY bin) - c AS cum_prev
        FROM hist
    ),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in _QH_QS)}]) AS q),
    hit AS (
        SELECT qs.q, cum.bin, cum.c, cum.cum_prev,
               ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY cum.bin)
                   AS rn
        FROM qs JOIN cum
          ON cum.cum >= qs.q * (SELECT n FROM stats)
    )
    SELECT q,
           ROUND((SELECT mn FROM stats)
                 + (bin + (q * (SELECT n FROM stats) - cum_prev) / c)
                   * (((SELECT mx FROM stats) - (SELECT mn FROM stats))
                      / {_QH_BINS}), 6) AS est
    FROM hit WHERE rn = 1
    """,
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed 256-bin equi-width histogram —
    the third deterministic sketch (after Count-Min and MinHash): bins
    are ADDITIVE counters, so the histogram merges map-side like any
    hash aggregate, and the P50/P95/P99 estimates (linear interpolation
    within the hit bin) are pure arithmetic over the 256-row grid —
    bit-reproducible in any engine, hence a FULL oracle where the
    engine-internal t-digest/GK sketches (``rel_agg_approx``'s HLL
    cousin) can only be WEAK.

    Plan: one scan -> (min, max, n) broadcast -> one 256-cell hash
    aggregate -> a 256-row window cumsum + 3-row probe. At 100 TB the
    only data-sized work is the scan and the map-side-combined
    histogram; everything after is constant-size."""
    t = Tables(spark, sf_dir)
    stats = t.events.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").alias("n"),
    )
    binned = (
        t.events.join(F.broadcast(stats))
        .select(
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _QH_BINS
                ),
                F.lit(_QH_BINS - 1),
            ).alias("bin"),
        )
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        (F.sum("c").over(wcum) - F.col("c")).alias("cum_prev"),
    )
    qs = spark.createDataFrame(
        [(q,) for q in _QH_QS], "q double"
    )
    hit = (
        qs.join(
            F.broadcast(cum.join(F.broadcast(stats))),
            F.col("cum") >= F.col("q") * F.col("n"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    est = F.col("mn") + (
        F.col("bin")
        + (F.col("q") * F.col("n") - F.col("cum_prev")) / F.col("c")
    ) * ((F.col("mx") - F.col("mn")) / _QH_BINS)
    return hit.select("q", F.round(est, 6).alias("est"))


_PROFILE_K = 10
_PROFILE_QUERY = 1


@query(
    "rel_gapfill",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18, 6)))
                          AS DOUBLE), 6) AS sv
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, MIN(dy) AS d0, MAX(dy) AS d1 FROM daily
        GROUP BY user_id
    ),
    cal AS (
        SELECT user_id, UNNEST(generate_series(d0, d1)) AS dy FROM span
    )
    SELECT cal.user_id, cal.dy,
           COALESCE(daily.n, 0) AS n_events,
           COALESCE(daily.sv, 0.0) AS sum_value
    FROM cal LEFT JOIN daily USING (user_id, dy)
    """,
)
def rel_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (the hypertable `time_bucket_gapfill`):
    every user's daily activity series zero-filled over the days
    between their first and last event — downstream window math (moving
    averages, EWMA-style decay, change detection) needs the dense grid,
    not the sparse observed rows.

    The calendar is GENERATED WHERE THE DATA LIVES: each user's span
    row explodes to its own days via ``sequence()`` — no global
    calendar table, no cross join; the left join keys on (user_id, dy),
    the same key the daily rollup already clustered on. Linear in
    user-days at any scale. Sums quantize to DECIMAL per row before
    accumulating (order-independent, see ``rel_agg_basic``)."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "user_id",
        F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
    ).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("sv"),
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("dy").alias("d0"), F.max("dy").alias("d1"))
        .select(
            "user_id", F.explode(F.sequence("d0", "d1")).alias("dy")
        )
    )
    return cal.join(daily, ["user_id", "dy"], "left").select(
        "user_id",
        "dy",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "traj_profile_knn",
    oracle=f"""
    WITH p AS (
        SELECT user_id,
               EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hr,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    nrm AS (
        SELECT user_id, SQRT(SUM(n * n)) AS nn FROM p GROUP BY user_id
    ),
    q AS (SELECT hr, n FROM p WHERE user_id = {_PROFILE_QUERY}),
    dots AS (
        SELECT p.user_id, SUM(p.n * q.n) AS dp
        FROM p JOIN q USING (hr)
        WHERE p.user_id <> {_PROFILE_QUERY}
        GROUP BY p.user_id
    )
    SELECT d.user_id,
           ROUND(d.dp / (na.nn *
                 (SELECT nn FROM nrm WHERE user_id = {_PROFILE_QUERY})),
                 6) AS cos_sim
    FROM dots d JOIN nrm na ON na.user_id = d.user_id
    ORDER BY cos_sim DESC, d.user_id
    LIMIT {_PROFILE_K}
    """,
)
def traj_profile_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-profile kNN: each user's hour-of-day activity
    histogram (24 integer bins) as a derived embedding; the 10 users
    most cosine-similar to the query user's profile — temporal
    similarity, complementing the positional Hausdorff/Fréchet family
    (two users can visit different places on the same schedule).

    Profiles are integer count vectors, so every dot product and
    squared norm is INTEGER-exact cross-engine; only the final cosine
    divides in floats (rounded at 6). The query profile is a broadcast
    <=24-row join, the scan aggregates linearly, and the top-k is a
    TakeOrdered — no per-pair work across users."""
    t = Tables(spark, sf_dir)
    p = t.events.groupBy(
        "user_id", F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    nrm = p.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("n") * F.col("n"))).alias("nn")
    )
    q = p.filter(F.col("user_id") == _PROFILE_QUERY).select(
        "hr", F.col("n").alias("qn")
    )
    qn = nrm.filter(F.col("user_id") == _PROFILE_QUERY).select(
        F.col("nn").alias("qnn")
    )
    dots = (
        p.filter(F.col("user_id") != _PROFILE_QUERY)
        .join(F.broadcast(q), "hr")
        .groupBy("user_id")
        .agg(F.sum(F.col("n") * F.col("qn")).alias("dp"))
    )
    return (
        dots.join(nrm, "user_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "user_id",
            F.round(
                F.col("dp") / (F.col("nn") * F.col("qnn")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "user_id")
        .limit(_PROFILE_K)
    )


_KMV_K = 64  # k minimum values retained by the sketch


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(token), 1, 13)) AS BIGINT) AS hv
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token
              FROM documents)
    ),
    kmin AS (
        SELECT MAX(hv) AS kv, COUNT(*) AS kn
        FROM (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K})
    ),
    exact AS (SELECT COUNT(*) AS n_exact FROM h)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST((SELECT n_exact FROM exact) AS BIGINT) AS n_exact,
           CAST(CASE WHEN (SELECT kn FROM kmin) < {_KMV_K}
                     THEN (SELECT kn FROM kmin)
                     ELSE ROUND(({_KMV_K} - 1)
                                / ((SELECT kv FROM kmin)
                                   / 4503599627370495.0))
                END AS BIGINT) AS n_estimated
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation via a KMV (k-minimum-values) sketch —
    the DETERMINISTIC alternative to HLL (``rel_agg_approx``, the
    registry's one no-oracle row): keep the k=64 smallest md5-derived
    hashes of the token vocabulary; the estimator (k−1)/max_kth_hash is
    bit-identical in any engine, so unlike HLL this cardinality sketch
    carries a FULL oracle (same argument as the Count-Min and histogram
    sketches). The row emits estimate AND exact side by side, making the
    sketch's error visible and pinned.

    Scale shape: KMV is a mergeable bounded aggregate — per partition
    keep the k smallest, merge keeps the k smallest of the union; here
    expressed as a global top-k over distinct hashes
    (TakeOrderedAndProject — no full sort). One token explode + one
    distinct hash agg is the only data-sized work."""
    t = Tables(spark, sf_dir)
    h = (
        t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .select(
            F.conv(F.substring(F.md5("token"), 1, 13), 16, 10)
            .cast("long")
            .alias("hv")
        )
        .distinct()
    )
    kth = (
        h.orderBy("hv")
        .limit(_KMV_K)
        .agg(F.max("hv").alias("kv"), F.count("*").alias("kn"))
    )
    exact = h.agg(F.count("*").alias("n_exact"))
    return (
        kth.join(F.broadcast(exact))
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("n_exact").cast("long"),
            F.when(F.col("kn") < _KMV_K, F.col("kn"))
            .otherwise(
                F.round(
                    (_KMV_K - 1) / (F.col("kv") / 4503599627370495.0)
                )
            )
            .cast("long")
            .alias("n_estimated"),
        )
    )


@query(
    "sketch_cms_merge",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ),
    rows_ AS (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS j),
    partial AS (
        SELECT source, j,
               CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token),
                                    1, 4)) AS INTEGER) % {_CMS_W} AS bucket,
               COUNT(*) AS cnt
        FROM tok CROSS JOIN rows_
        GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM partial GROUP BY j, bucket
    ),
    probe AS (
        SELECT t.token, r.j,
               CAST(('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' ||
                                        t.token), 1, 4))
                    AS INTEGER) % {_CMS_W} AS bucket
        FROM (SELECT DISTINCT token FROM tok) t CROSS JOIN rows_ r
    ),
    est AS (
        SELECT probe.token, CAST(MIN(merged.cnt) AS BIGINT) AS est
        FROM probe JOIN merged USING (j, bucket)
        GROUP BY probe.token
    )
    SELECT token, est FROM est
    ORDER BY est DESC, token LIMIT {_CMS_TOPK}
    """,
)
def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY made visible: build one Count-Min sketch PER
    SOURCE (the per-shard/per-day partial a real pipeline materializes),
    merge the per-source sketches by cell-wise addition, and answer the
    heavy-hitter top-10 from the MERGED sketch — the result is
    bit-identical to ``sketch_cms_topk``'s single global build, which is
    the algebraic property (cells are counters, addition commutes) that
    makes sketches the right 100 TB summary: partials build where the
    data lives, only 1024-cell grids move.

    The oracle performs the same two-level build, and the top-10 matches
    the single-pass row's — pinning merge == rebuild. The extra
    (source, j, bucket) aggregate is still map-side combinable; nothing
    data-sized crosses the network twice."""
    t = Tables(spark, sf_dir)
    tok = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    partial = (
        tok.join(F.broadcast(rows))
        .select(
            "source",
            "j",
            _cms_bucket(F.col("j"), F.col("token")).alias("bucket"),
        )
        .groupBy("source", "j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    merged = partial.groupBy("j", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    probe = (
        tok.select("token")
        .distinct()
        .join(F.broadcast(rows))
        .select(
            "token",
            "j",
            _cms_bucket(F.col("j"), F.col("token")).alias("bucket"),
        )
    )
    est = (
        probe.join(F.broadcast(merged), ["j", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )
    return est.orderBy(F.desc("est"), "token").limit(_CMS_TOPK)
