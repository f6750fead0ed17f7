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

# _MODULES is just the import list now — the driver's first-50 window is
# pinned declaratively by _WINDOW_FIRST below (load_all reorders QUERIES),
# so module order no longer matters for correctness-row scheduling.
#
# ROUND-6 ROTATION: EXECUTED — see _WINDOW_FIRST below (49 FULL
# rowless keys + re-windowed rel_agg_approx). ROUND-7 plan: the 16
# remaining driver-rowless keys are all WEAK rows-only by design —
# trajectory_ext (6: traj_frechet_threshold_2d, traj_dtw_knn_2d,
# traj_dtw_threshold_2d, traj_dtw_knn_banded, traj_dtw_knn_banded_2d,
# traj_dtw_threshold_banded) and the extras6 LCSS/EDR/ERP search tiers
# (10: traj_{lcss,edr}_{threshold,knn} in 1-D and 2-D, plus
# traj_erp_threshold / traj_erp_knn) — plus any round-6 additions.
# They fit a 50-key window with ~34 slots to spare for new keys.
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
    "traj_sim_spark_spark.operators.extras5",
    # round-5 additions (queued for the round-6 window)
    "traj_sim_spark_spark.operators.extras6",
    # round-6 additions (queued for the round-7 window)
    "traj_sim_spark_spark.operators.extras7",
)

# Explicit driver-window ordering: after load_all() the first keys of
# QUERIES are exactly this list (the correctness driver samples the
# first 50 registered queries). Pinning the window HERE makes it
# independent of import side-effect order — cross-module helper imports
# register their module's keys mid-import, which repeatedly stole
# window slots under the order-by-module scheme (rounds 3-4). To rotate
# a future round's window, edit THIS list only; keys not listed keep
# their registration order after it. Unknown names are skipped, so the
# list can be staged before its keys exist.
#
# ROUND-6 WINDOW (executed this round): the 49 FULL keys that had no
# driver row through round 5 (readers_ext 11, streams_ext tail 8,
# extras3 tail 6, setops/similarity tails + udf_map_arrow 5,
# trajectory_ext FULL rows 5, the 14 FULL extras6 additions) plus
# rel_agg_approx re-windowed (its only driver row was the round-1
# rows-only record, predating the round-5 KMV FULL rewrite) = exactly
# 50. The 16 WEAK rowless keys (LCSS/EDR/ERP search tiers + the 6
# trajectory_ext WEAK rows) spill to the ROUND-7 window by design —
# their brute/recursion pytest pins carry the evidence meanwhile.
_WINDOW_FIRST: tuple[str, ...] = (
    # readers_ext (11) — all five sink_* keys had zero driver rows ever
    "src_text_ingest",
    "src_orc_ingest",
    "sink_partitioned_roundtrip",
    "src_schema_evolution",
    "sink_stream_parquet",
    "stream_layout_ingest",
    "sink_compaction",
    "src_binary_files",
    "src_python_datasource",
    "sink_versioned_snapshot",
    "src_csv_malformed",
    # streams_ext tail (8)
    "stream_traj_distance",
    "stream_cms",
    "stream_quantile_hist",
    "stream_funnel",
    "stream_anomaly",
    "stream_pack_chunks",
    "stream_ewma",
    "stream_distinct_users",
    # extras3 tail (6)
    "traj_hausdorff_segments_knn_2d_idx",
    "traj_hausdorff_segments_knn_batch_2d",
    "traj_range_window_2d_idx",
    "rel_table_stats",
    "rel_view_maintenance",
    "sink_csv_roundtrip",
    # setops / similarity tails + udf_map_arrow (5)
    "rel_intersect_all",
    "rel_except_all",
    "sim_range_search",
    "emb_layout_ivf",
    "udf_map_arrow",
    # trajectory_ext FULL rows (5)
    "traj_dtw_pair_2d",
    "traj_hausdorff_segments_knn",
    "traj_hausdorff_segments_threshold",
    "traj_hausdorff_knn_batch",
    "traj_hausdorff_knn_2d_batch",
    # extras6 FULL rows (14)
    "traj_lcss_pair",
    "traj_edr_pair",
    "traj_erp_pair",
    "traj_lcss_pair_2d",
    "traj_edr_pair_2d",
    "sim_diversify_mmr",
    "rel_gaps_islands",
    "rel_agg_filtered",
    "text_langid_confusion",
    "pipe_span_corruption",
    "emb_norm_hist",
    "rel_try_arithmetic",
    "pipe_chunk_overlap",
    "rel_grouping_id",
    # re-windowed: KMV FULL rewrite postdates its only (rows-only) row
    "rel_agg_approx",
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
    ordered = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
    for k, fn in QUERIES.items():
        if k not in ordered:
            ordered[k] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
