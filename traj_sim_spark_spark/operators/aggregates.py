"""D. Aggregations (SURVEY.md §2.2-D).

Reference analog: the only aggregations traj-sim-spark performs are
min/max/count folds inside its MBR and stats code (R4, R18); the full
grouped-aggregation surface here is new capability. Everything is a hash
aggregate with map-side partial aggregation (Catalyst emits
partial+final automatically — the distributed-combine behavior the
reference hand-codes with reduceByKey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


_Q1_BIGINT_MAX_ROWS = 50_000_000  # micro-unit long sums safe below this


def _lineitem_count(t: Tables, sf_dir: str) -> int:
    """Corpus size for the cost-based dispatch, recomputed from the
    parquet inputs on EVERY call (optimization-round rule: no
    module-level memo keyed on the data dir). The footer-metadata read
    makes that re-read ~ms instead of a Spark count job."""
    from ..tables import parquet_row_count

    return parquet_row_count(t.spark, sf_dir, "lineitem")


@query(
    "rel_agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           CASE WHEN (SELECT COUNT(*) FROM lineitem)
                     < {_Q1_BIGINT_MAX_ROWS}
           THEN ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      / 100.0, 6)
           ELSE ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2)))
                      AS DOUBLE), 6) END AS sum_base_price,
           CASE WHEN (SELECT COUNT(*) FROM lineitem)
                     < {_Q1_BIGINT_MAX_ROWS}
           THEN ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT)) / 10000.0, 6)
           ELSE ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18, 4))) AS DOUBLE), 6)
           END AS sum_disc_price,
           CASE WHEN (SELECT COUNT(*) FROM lineitem)
                     < {_Q1_BIGINT_MAX_ROWS}
           THEN ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) * 1000000) AS BIGINT))
                      / 1000000.0, 6)
           ELSE ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) AS DECIMAL(20, 6)))
                      AS DOUBLE), 6) END AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide hash aggregate.

    A double SUM over millions of rows is ACCUMULATION-ORDER-DEPENDENT
    in its last ulps — cross-engine (and cross-partitioning!) runs
    disagree at the 6th decimal of a ~1e9 total from sf0.1 upward — so
    the price sums accumulate EXACTLY. The true products have <= 6
    decimal digits (2-dec price x 2-dec rates), so per-row quantization
    is lossless; exact accumulation then COST-DISPATCHES on corpus
    size (the round-2 drift finding: DECIMAL accumulators cost ~2x the
    whole-stage-codegen long path, 0.99 s vs 0.55 s at sf0.1):

    - below ``_Q1_BIGINT_MAX_ROWS``: per-row micro-unit BIGINT
      quantization, long-sum hash agg (codegen-fast, order-free);
      the threshold guarantees no group can reach the 9.2e18 long
      ceiling (max charge < 1.1e11 micro-units/row);
    - above it: per-row DECIMAL cast, decimal addition (order-free at
      ANY scale — the 100 TB-safe branch).

    The dispatch is mirrored in the oracle as a COUNT(*) CASE, so both
    engines take the same branch at every SF. Integral l_quantity and
    the AVGs (ratios — relative error ~1e-13) stay plain doubles."""
    t = Tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    if _lineitem_count(t, sf_dir) < _Q1_BIGINT_MAX_ROWS:
        sums = [
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                )
                / 100.0,
                6,
            ).alias("sum_base_price"),
            F.round(
                F.sum(F.round(disc_price * 10000).cast("bigint")) / 10000.0,
                6,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(F.round(charge * 1000000).cast("bigint")) / 1000000.0,
                6,
            ).alias("sum_charge"),
        ]
    else:
        sums = [
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_base_price"),
            F.round(
                F.sum(disc_price.cast("decimal(18,4)")).cast("double"), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(charge.cast("decimal(20,6)")).cast("double"), 6
            ).alias("sum_charge"),
        ]
    return (
        t.lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            *sums,
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "rel_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_parts,
           COUNT(DISTINCT l_suppkey) AS nd_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) per group (expand + two-phase aggregate)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.count("*").alias("n_rows"),
    )


_AGG_KMV_K = 1024  # k minimum values retained per group (~3% stderr)


@query(
    "rel_agg_approx",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT l_returnflag,
               CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                                    1, 13)) AS BIGINT) AS hv
        FROM lineitem
    ),
    r AS (
        SELECT l_returnflag, hv,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY hv) AS rn
        FROM h
    ),
    kmin AS (
        SELECT l_returnflag, MAX(hv) AS kv, COUNT(*) AS kn
        FROM r WHERE rn <= {_AGG_KMV_K} GROUP BY 1
    ),
    exact AS (
        SELECT l_returnflag, COUNT(*) AS nd FROM h GROUP BY 1
    ),
    base AS (
        SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem
        GROUP BY 1
    )
    SELECT b.l_returnflag,
           CAST(CASE WHEN k.kn < {_AGG_KMV_K} THEN k.kn
                     ELSE ROUND(({_AGG_KMV_K} - 1)
                                / (k.kv / 4503599627370495.0))
                END AS BIGINT) AS apx_parts,
           CAST(e.nd AS BIGINT) AS nd_exact,
           CAST(b.n_rows AS BIGINT) AS n_rows
    FROM base b
    JOIN kmin k ON k.l_returnflag = b.l_returnflag
    JOIN exact e ON e.l_returnflag = b.l_returnflag
    """,
)
def rel_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct per group — the sketch path that
    replaces exact distinct at 100 TB, expressed as a PER-GROUP KMV
    (k-minimum-values) sketch instead of HLL: keep the k=1024 smallest
    md5-derived hashes of the distinct keys per group; the estimator
    (k-1)/max_kth_hash is bit-identical in any engine, so the row
    carries a FULL oracle (HLL sketch layouts differ engine-to-engine
    and can never hash-match — the round-4 verdict's last
    non-verifiable row, closed by the ``sketch_kmv_distinct``
    twin-column pattern). Emits estimate AND exact side by side so the
    sketch error is visible and pinned (pytest bounds it at 5%).

    Scale shape: the sketch input is the per-group DISTINCT hash set
    (two-phase hash aggregate, map-side partials); the k-smallest cut
    is a TWO-LEVEL TOURNAMENT — a partial k-min per (group, hv mod 64
    bucket), then the final k-min over the <= 64·k survivors — i.e.
    the mergeable-aggregate shape executed with window ranks: no
    window partition ever sorts more than ~nd(group)/64 (level 1) or
    64·k (level 2) rows, so a skewed group at 100 TB fans across 64
    tasks instead of serializing into one per-group global sort.  The
    result is identical to a single global k-min (the k smallest of a
    union of per-bucket k smallest), so the oracle runs the plain
    one-window form."""
    t = Tables(spark, sf_dir)
    h = (
        t.lineitem.select(
            "l_returnflag",
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 13),
                16,
                10,
            )
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    w1 = Window.partitionBy("l_returnflag", "bkt").orderBy("hv")
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    kmin = (
        h.withColumn("bkt", F.pmod(F.col("hv"), F.lit(64)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _AGG_KMV_K)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _AGG_KMV_K)
        .groupBy("l_returnflag")
        .agg(F.max("hv").alias("kv"), F.count("*").alias("kn"))
    )
    exact = h.groupBy("l_returnflag").agg(F.count("*").alias("nd"))
    base = t.lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows")
    )
    return (
        base.join(kmin, "l_returnflag")
        .join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.when(F.col("kn") < _AGG_KMV_K, F.col("kn"))
            .otherwise(
                F.round(
                    (_AGG_KMV_K - 1)
                    / (F.col("kv") / 4503599627370495.0)
                )
            )
            .cast("long")
            .alias("apx_parts"),
            F.col("nd").cast("long").alias("nd_exact"),
            F.col("n_rows").cast("long"),
        )
    )


@query(
    "rel_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (rollup): (flag, status), (flag), ()."""
    t = Tables(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@query(
    "rel_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2)))
                 AS DOUBLE), 6) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def rel_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set lattice (cube) over two dimensions. The price
    sum accumulates in DECIMAL — the () grouping set totals the whole
    table, exactly where double addition order shows (see
    rel_agg_basic)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            ),
            6,
        ).alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "rel_agg_having",
    oracle="""
    SELECT o_custkey,
           ROUND(SUM(o_totalprice), 6) AS spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 1500000
    """,
)
def rel_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("spend_raw"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("spend_raw") > 1500000)
        .select(
            "o_custkey",
            F.round("spend_raw", 6).alias("spend"),
            "n_orders",
        )
    )


@query(
    "traj_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_points,
           ROUND(SUM(value), 6) AS sum_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value,
           epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS start_us,
           epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS end_us
    FROM events
    GROUP BY user_id
    """,
)
def traj_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trajectory extent stats — the reference's R4 MBR aggregation:
    per-trajectory bounding box (1-D value extent) + temporal extent +
    point count, as one hash aggregate."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )


@query(
    "rel_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 6) AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.90), 6) AS p90,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) per group. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share linear-
    interpolation semantics, so even quantiles hash-match FULLY.
    (The sketch-based scale path is ``rel_agg_approx``'s HLL analog:
    ``approx_percentile`` — exact here because the oracle demands it.)"""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
    )


@query(
    "rel_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 6) AS sd_price,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq,
           ROUND(COVAR_SAMP(l_extendedprice, l_discount), 6) AS cov_pd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: sample stddev/variance,
    Pearson correlation, sample covariance — single-pass numeric
    moments (partial+final), identical definitions on both engines."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias(
            "cov_pd"
        ),
    )
