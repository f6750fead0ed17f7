"""E. Window functions + F. Sorts/limits/top-k (SURVEY.md §2.2-E/F).

Reference analog: R9's top-k candidate ranking and the per-trajectory
sequence ordering implicit in R2. Windows shuffle once on the partition
key; global top-k compiles to TakeOrderedAndProject (per-partition heap +
driver merge of k rows — no global sort), which is the shape that holds at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "rel_win_rank",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk
    FROM ranked WHERE rn <= 3
    """,
)
def rel_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number/rank (per-group top-k)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "rel_win_lag",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dt_us
    FROM events
    """,
)
def rel_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta + time delta — trajectory 'velocity' (the
    reference's consecutive-point derivative, R3 lineage)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return t.events.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        (us - F.lag(us).over(w)).alias("dt_us"),
    )


@query(
    "rel_win_moving",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) AS mov_avg
    FROM events
    """,
)
def rel_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row trailing frame."""
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return t.events.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("mov_avg"),
    )


@query(
    "rel_win_range_time",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts_s
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
                 6) AS sum_1h
    FROM (SELECT user_id, event_id, value,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s
          FROM events)
    """,
)
def rel_win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum over a trailing 1-hour RANGE frame (time-valued frame bounds,
    keyed on epoch seconds so both engines share exact frame edges)."""
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, W.currentRow)
    )
    return (
        t.events.withColumn(
            "ts_s", (F.unix_micros("ts") / F.lit(1000000)).cast("long")
        )
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 6).alias("sum_1h"),
        )
    )


@query(
    "rel_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def rel_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject
    (per-partition heaps, no full sort — R16's takeOrdered analog)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "rel_topk_pergroup",
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM ranked WHERE rn <= 5
    """,
)
def rel_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (richest 5 customers per nation)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        t.customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@query(
    "rel_win_distribution",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def rel_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: percent_rank / cume_dist / ntile(4)
    over per-priority price order (orderkey tie-break keeps ntile
    deterministic across engines)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@query(
    "rel_win_nav",
    oracle="""
    SELECT event_id, user_id,
           ROUND(FIRST_VALUE(value) OVER w, 6) AS first_v,
           ROUND(LAST_VALUE(value) OVER w, 6) AS last_v,
           ROUND(NTH_VALUE(value, 3) OVER w, 6) AS third_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def rel_win_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: first/last/nth point of each user's
    trajectory attached to every event (explicit full-partition frame —
    LAST_VALUE over the default frame is the classic footgun both
    engines share)."""
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w), 6).alias("first_v"),
        F.round(F.last("value").over(w), 6).alias("last_v"),
        F.round(F.nth_value("value", 3).over(w), 6).alias("third_v"),
    )
