"""G. Set operations (SURVEY.md §2.2-G).

Reference analog: R10 — candidate-id set union/dedup via compressed
bitmaps [P §4.2]; Spark's set operators (union/intersect/except with
hash-based dedup) plus Bloom-filter semi-join reduction subsume that
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "rel_union_all",
    oracle="""
    SELECT event_id, user_id, 'click' AS src FROM events
    WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, 'view' AS src FROM events
    WHERE event_type = 'view'
    """,
)
def rel_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two event slices (unionByName, no dedup shuffle)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("src")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("view").alias("src")
    )
    return clicks.unionByName(views)


@query(
    "rel_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both clicked and purchased (INTERSECT DISTINCT)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    return (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(ev.filter(F.col("event_type") == "purchase").select("user_id"))
    )


@query(
    "rel_except",
    oracle="""
    SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'error'
    """,
)
def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with views but no errors (EXCEPT DISTINCT via
    ``subtract`` — not ``exceptAll``, whose multiset semantics differ)."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "day")
        .subtract(ev.filter(F.col("event_type") == "error").select("user_id", "day"))
    )


@query(
    "rel_intersect_all",
    oracle="""
    SELECT user_id, CAST(FLOOR(value / 10.0) AS BIGINT) AS vbucket
    FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id, CAST(FLOOR(value / 10.0) AS BIGINT) AS vbucket
    FROM events WHERE event_type = 'view'
    """,
)
def rel_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset: each (user, bucket) kept min(m, n)
    times) — the bag-semantics half of the set-op surface;
    ``intersectAll`` plans as a count-matching aggregate join, not a
    dedup."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        "user_id",
        F.floor(F.col("value") / 10.0).alias("vbucket"),
    )
    return (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "vbucket")
        .intersectAll(
            ev.filter(F.col("event_type") == "view").select(
                "user_id", "vbucket"
            )
        )
    )


@query(
    "rel_except_all",
    oracle="""
    SELECT user_id, CAST(FLOOR(value / 10.0) AS BIGINT) AS vbucket
    FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id, CAST(FLOOR(value / 10.0) AS BIGINT) AS vbucket
    FROM events WHERE event_type = 'error'
    """,
)
def rel_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset: occurrences subtract, max(m - n, 0) copies
    survive) — completes {UNION, INTERSECT, EXCEPT} x {DISTINCT, ALL}."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        "user_id",
        F.floor(F.col("value") / 10.0).alias("vbucket"),
    )
    return (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "vbucket")
        .exceptAll(
            ev.filter(F.col("event_type") == "error").select(
                "user_id", "vbucket"
            )
        )
    )
