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
# ROUND-3 ROTATION (executed): mining(12) + graph(10) + extras2(13) +
# similarity_ext(8) + series(4) = 47 keys take the front, leaving 3 window
# slots for extras3 (new round-3 ops — the 2-D segment-Hausdorff searches
# register first there). These families had only judge-gate greens in
# round 2; extras2/graph also carry this round's scale fixes (copurchase
# fanout cap, pHash band dispatch, PageRank broadcast dispatch), so the
# driver re-verifies their hashes after the change.  similarity_ext's
# cross-module oracle is now LAZY (registry._LAZY_ORACLES) so importing
# it no longer drags similarity's 10 keys into the window.
#
# ROUND-4 ROTATION (do at round-4 start): text_ext(8), analytics(7),
# timeseries(7), curation(7), sim_range_search, emb_layout_ivf,
# setops tail (rel_intersect_all/rel_except_all), multimodal tail,
# plus any extras3 keys past slot 50 — still no driver row.
_MODULES = (
    "traj_sim_spark_spark.operators.mining",
    "traj_sim_spark_spark.operators.graph",
    "traj_sim_spark_spark.operators.extras2",
    "traj_sim_spark_spark.operators.similarity_ext",
    "traj_sim_spark_spark.operators.series",
    "traj_sim_spark_spark.operators.extras3",
    "traj_sim_spark_spark.operators.text_ext",
    "traj_sim_spark_spark.operators.analytics",
    "traj_sim_spark_spark.operators.timeseries",
    "traj_sim_spark_spark.operators.curation",
    "traj_sim_spark_spark.operators.trajectory",
    "traj_sim_spark_spark.operators.text",
    "traj_sim_spark_spark.streaming.streams",
    "traj_sim_spark_spark.sources.readers",
    "traj_sim_spark_spark.operators.udfs",
    "traj_sim_spark_spark.operators.multimodal",
    "traj_sim_spark_spark.operators.extras",
    "traj_sim_spark_spark.operators.scans",
    "traj_sim_spark_spark.operators.filters",
    "traj_sim_spark_spark.operators.joins",
    "traj_sim_spark_spark.operators.aggregates",
    "traj_sim_spark_spark.operators.windows",
    "traj_sim_spark_spark.operators.setops",
    "traj_sim_spark_spark.functions.scalars",
    "traj_sim_spark_spark.operators.similarity",
    "traj_sim_spark_spark.operators.trajectory_ext",
    "traj_sim_spark_spark.operators.pipelines",
    "traj_sim_spark_spark.streaming.streams_ext",
    "traj_sim_spark_spark.sources.readers_ext",
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
