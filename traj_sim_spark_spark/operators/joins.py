"""C. Joins (SURVEY.md §2.2-C).

Reference analog: the hand-rolled candidate matching of R8/R9 and the
dual-index semi-join fetch of R11 [P §4.3]. Here join strategy selection is
Catalyst's job: small dims get explicit ``broadcast()`` hints, large
equi-joins become sort-merge/shuffled-hash under AQE, the non-equi band
join keeps a broadcast-bounded side so it never degenerates to a full
cartesian shuffle, and the as-of join is expressed as an analytic over an
ordered union (one shuffle on the join key, no range explosion).

Scale posture: every join here shuffles on its equi key or broadcasts; at
100 TB the only knob that changes is bucketing the fact tables on the join
key so repeated joins skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "rel_join_broadcast",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def rel_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim equi-join with an explicit broadcast hint (no shuffle)."""
    t = Tables(spark, sf_dir)
    return t.nation.join(
        F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name", "r_name")


@query(
    "rel_join_smj",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_totalprice, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def rel_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large fact-fact equi-join: Catalyst picks sort-merge/shuffled-hash,
    AQE coalesces post-shuffle partitions. At 100 TB both sides would be
    bucketed by orderkey to make this shuffle-free."""
    t = Tables(spark, sf_dir)
    return t.orders.join(
        t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).select("o_orderkey", "l_linenumber", "o_totalprice", "l_extendedprice")


@query(
    "rel_join_multiway",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
    """,
)
def rel_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-table star join + aggregation.

    The dimension-side filter (mktsegment) is pushed below the join;
    customer is broadcast; the orders-lineitem shuffle carries only the
    semi-filtered keys (Bloom-filter join pruning applies at scale).
    """
    t = Tables(spark, sf_dir)
    c = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date")
    )


@query(
    "rel_join_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           COALESCE(o.o_totalprice, -1.0) AS total_or_flag
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
)
def rel_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate and null fill — the
    predicate must NOT filter unmatched left rows (classic outer-join
    pushdown trap, kept in the ON clause on both engines)."""
    t = Tables(spark, sf_dir)
    o = t.orders
    return (
        t.customer.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_totalprice") > 400000),
            "left",
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.coalesce("o_totalprice", F.lit(-1.0)).alias("total_or_flag"),
        )
    )


@query(
    "rel_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one large order (left-semi join; the
    reference's R11 candidate-id fetch is exactly this shape)."""
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "rel_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent orders (left-anti join)."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "rel_join_theta_band",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice,
           ROUND(a.avg_price, 6) AS avg_price
    FROM part p
    CROSS JOIN (SELECT AVG(p_retailprice) AS avg_price FROM part) a
    WHERE p.p_retailprice BETWEEN a.avg_price - 5 AND a.avg_price + 5
    """,
)
def rel_join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) band join against a 1-row aggregate side.

    The scalar side is broadcast, so the physical plan is
    BroadcastNestedLoopJoin over a single row — bounded and
    scale-safe (never a shuffled cartesian)."""
    t = Tables(spark, sf_dir)
    avg = t.part.agg(F.avg("p_retailprice").alias("avg_price"))
    return (
        t.part.join(
            F.broadcast(avg),
            (F.col("p_retailprice") >= F.col("avg_price") - 5)
            & (F.col("p_retailprice") <= F.col("avg_price") + 5),
        )
        .select(
            "p_partkey",
            "p_retailprice",
            F.round("avg_price", 6).alias("avg_price"),
        )
    )


@query(
    "rel_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_us,
           epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def rel_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest prior-or-equal
    signup of the same user.

    Spark lacks a native ASOF JOIN; expressed as an analytic over the
    ordered union — ``last(signup_ts) ignoreNulls`` over
    (user, time) — which costs exactly one shuffle on user_id and no
    range-join explosion; the oracle uses DuckDB's native ASOF JOIN,
    proving semantic equivalence of the rewrite."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("event_type").isin("purchase", "signup"))
    # signups sort before purchases at identical ts so ties count as prior
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_type").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "signup_ts",
            F.last(
                F.when(F.col("event_type") == "signup", F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("signup_ts").alias("signup_us"),
        )
    )


@query(
    "sim_band_join",
    oracle="""
    WITH a AS (SELECT event_id, value, CAST(FLOOR(value) AS BIGINT) AS cell
               FROM events WHERE event_type = 'signup'),
         b AS (SELECT event_id, value, CAST(FLOOR(value) AS BIGINT) AS cell
               FROM events WHERE event_type = 'error')
    SELECT a.cell AS cell, COUNT(*) AS n_pairs
    FROM a JOIN b
      ON b.cell BETWEEN a.cell - 1 AND a.cell + 1
     AND ABS(a.value - b.value) <= 1.0
    GROUP BY a.cell
    """,
)
def sim_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell band join — the reference's R8 prefilter as a standalone
    operator [P §4.2].

    1-D values are quantized to unit cells; candidates are generated by an
    equi-join on the cell key (right side exploded to cell-1/cell/cell+1),
    then refined with the exact band predicate — the STR-partition +
    R-tree circleRange idiom re-expressed as shuffle-on-cell-key, which is
    the form that scales: pair generation is local to a cell, never
    all-pairs."""
    t = Tables(spark, sf_dir)
    ev = t.events
    a = (
        ev.filter(F.col("event_type") == "signup")
        .select("value", F.floor("value").cast("long").alias("cell"))
        .withColumnRenamed("value", "va")
    )
    b = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("value").alias("vb"),
            F.explode(
                F.array(
                    F.floor("value").cast("long") - 1,
                    F.floor("value").cast("long"),
                    F.floor("value").cast("long") + 1,
                )
            ).alias("cell"),
        )
    )
    return (
        a.join(b, "cell")
        .filter(F.abs(F.col("va") - F.col("vb")) <= 1.0)
        .groupBy("cell")
        .agg(F.count("*").alias("n_pairs"))
    )
