"""Sources & sinks beyond the default Parquet scan (SURVEY.md §2.2-A).

The reference ingests hand-parsed text dumps (R1); the engine's scan
layer is format-pluggable with explicit schemas (no inference in
production paths) and its sink writes partitioned Parquet — the layout
operators at 100 TB: ``partitionBy`` for partition pruning,
``sortWithinPartitions`` for row-group min-max locality (the STR-layout
analog, SURVEY.md §4 O1/O3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV ingest with an explicit schema (inference is test-only)."""
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines ingest with an explicit schema."""
    return spark.read.schema(schema).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned (optionally sorted-within-partition) Parquet sink.

    Partition columns become directory keys (static + dynamic partition
    pruning on re-read); sort columns tighten row-group min/max stats so
    range predicates skip row groups — together these reproduce the
    reference's STR-partitioned, R-tree-local layout with stock Parquet.
    """
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def try_format(spark: SparkSession, fmt: str):
    """Probe availability of an optional source format (delta/iceberg/...)
    without hard-failing — their jars are not in this image."""
    try:
        spark.read.format(fmt).load("/nonexistent-probe")
    except Exception as e:  # noqa: BLE001
        name = type(e).__name__
        if "ClassNotFound" in str(e) or "Failed to find" in str(e):
            return False, f"{fmt}: not on classpath ({name})"
        return True, f"{fmt}: loadable ({name} on bad path is expected)"
    return True, f"{fmt}: loadable"
