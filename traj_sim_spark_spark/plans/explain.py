"""Plan-inspection helpers (SURVEY.md §4 discipline).

The 100 TB mandate is enforced structurally: tests assert that physical
plans actually contain the shapes we designed for — pushed filters,
pruned scans, broadcast joins — and never the shapes that melt at scale
(unbounded cartesian products, row-at-a-time Python evaluation in the
hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in every Parquet scan's ReadSchema (pruning check)."""
    import re

    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        )
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def cartesian_products(df: DataFrame) -> int:
    """Count of unbounded CartesianProduct nodes (broadcast NLJ is fine)."""
    return physical_plan(df).count("CartesianProduct")
