"""A. Scans / sources (SURVEY.md §2.2-A).

Reference analog: R1 — ``sc.textFile`` + per-main hand parsing. Here the
scan layer is columnar Parquet with Catalyst column pruning and predicate
pushdown; ``plans/explain.py`` asserts the pushdown actually reaches the
scan node (``PushedFilters`` / ``ReadSchema``), which is what makes these
queries survive a 100 TB corpus — only the referenced columns/row groups
are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "rel_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           l_returnflag
    FROM lineitem
    """,
)
def rel_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + cast: scan reads exactly 4 of 11 lineitem columns."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        "l_returnflag",
    )


@query(
    "rel_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
    """,
)
def rel_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate pushed into the Parquet scan (row-group skipping)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@query(
    "src_json_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def src_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured source: JSON property extraction from a string col."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
