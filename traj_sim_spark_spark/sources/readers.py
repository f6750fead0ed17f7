"""Sources & sinks beyond the default Parquet scan (SURVEY.md §2.2-A).

The reference ingests hand-parsed text dumps (R1); the engine's scan
layer is format-pluggable with explicit schemas (no inference in
production paths) and its sink writes partitioned Parquet — the layout
operators at 100 TB: ``partitionBy`` for partition pruning,
``sortWithinPartitions`` for row-group min-max locality (the STR-layout
analog, SURVEY.md §4 O1/O3).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..registry import query
from ..tables import SCHEMAS, Tables


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


def staging_dir(sf_dir: str, kind: str) -> str:
    """Deterministic per-(sf_dir, kind) scratch dir under the system temp
    root — the same idempotent staging pattern as the stream source."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "spark_graft", kind, tag)
    os.makedirs(d, exist_ok=True)
    return d


def fixture_fingerprint(sf_dir: str, table: str = "events") -> str:
    """Cheap fingerprint of a fixture table's on-disk state (sorted file
    names + sizes + mtime_ns). Derived layouts (cell layout, manifest,
    grid layout) are stamped with this at build time; a reuse check
    compares the stamp against the live fixture so a regenerated fixture
    forces a rebuild instead of the layout silently answering stale."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    h = hashlib.md5()
    if os.path.isdir(p):
        for root, _dirs, files in sorted(os.walk(p)):
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                rel = os.path.relpath(os.path.join(root, fn), p)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    else:
        st = os.stat(p)
        h.update(f"{table}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()


_FPRINT_FILE = "_FIXTURE_FPRINT"

# fingerprint captured by the most recent layout_current() guard, per
# (path, sf_dir, table) — the PRE-build fixture state stamp_layout()
# records (see its docstring for the TOCTOU this closes)
_GUARD_FPRINT: dict[tuple[str, str, str], str] = {}


def layout_current(path: str, sf_dir: str, table: str = "events") -> bool:
    """True iff a reusable derived layout exists at ``path`` AND its
    fingerprint stamp matches the fixture files currently on disk.

    Always captures the live fingerprint (even on a False early
    return) so a following ``stamp_layout`` records the PRE-build
    fixture state."""
    fp = fixture_fingerprint(sf_dir, table)
    _GUARD_FPRINT[(path, sf_dir, table)] = fp
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    fp_file = os.path.join(path, _FPRINT_FILE)
    if not os.path.exists(fp_file):
        return False
    with open(fp_file) as f:
        return f.read().strip() == fp


def stamp_layout(
    path: str,
    sf_dir: str,
    table: str = "events",
    fingerprint: str | None = None,
) -> None:
    """Record the source-fixture fingerprint next to ``_SUCCESS``.

    The stamped value must be the fixture state from BEFORE the
    derived-layout build started: stamping a fingerprint read AFTER
    the build would mark a layout built from the OLD fixture as
    current against a fixture regenerated mid-build (TOCTOU in the
    reuse check) and the stale layout would be reused indefinitely.
    Every build site guards with ``layout_current`` immediately before
    building, so the default is that guard-time capture; an explicit
    ``fingerprint`` overrides, and only an unguarded build (no capture
    recorded) falls back to the live state."""
    if fingerprint is None:
        fingerprint = _GUARD_FPRINT.get(
            (path, sf_dir, table)
        ) or fixture_fingerprint(sf_dir, table)
    with open(os.path.join(path, _FPRINT_FILE), "w") as f:
        f.write(fingerprint)


@query(
    "src_csv_ingest",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def src_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1's csv reader as a round-trip query: write the nation dimension
    to CSV with the distributed sink, read it back through ``read_csv``
    with the explicit registry schema (no inference), return the rows.
    The oracle is the source table itself, so the hash check proves the
    csv path is byte-faithful for every column type it carries."""
    t = Tables(spark, sf_dir)
    path = os.path.join(staging_dir(sf_dir, "ingest"), "nation_csv")
    t.nation.write.mode("overwrite").option("header", True).csv(path)
    return read_csv(spark, path, SCHEMAS["nation"]).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "src_jsonl_ingest",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def src_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1's json reader as a round-trip query: documents out through the
    JSON-lines sink, back through ``read_json`` with the explicit schema;
    oracle = the source table (round-trip fidelity incl. the free-text
    column with quoting/escaping)."""
    t = Tables(spark, sf_dir)
    path = os.path.join(staging_dir(sf_dir, "ingest"), "documents_jsonl")
    t.documents.write.mode("overwrite").json(path)
    return read_json(spark, path, SCHEMAS["documents"]).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


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
