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
# ROUND-5 ROTATION (do at round-5 start): replace _WINDOW_FIRST with 50
# of the remaining rowless keys. After round 4 those are: extras4 (15,
# incl. sink_versioned_snapshot in readers_ext), extras5 (22:
# rel_recursive_cte, rel_regr_exact, ps_frontend, rel_join_skew_salted,
# rel_variant_json, src_xml_ingest, graph_sssp, text_setsim_prefix_join,
# rel_gdpr_delete, text_quality_logreg, rel_holt_linear,
# text_dup_ngram_coverage, rel_pit_join, pipe_doc_shuffle,
# graph_stress_betweenness, graph_temporal_reach, rel_observe,
# emb_kmeans_exact, sim_knn_pq_exact, text_dedup_cut,
# graph_clustering_coeff, emb_cov_topk, emb_cosine_hist,
# pipe_leakage_safe_split),
# udf_map_arrow,
# stream_cdc_apply,
# extras3 tail (10: traj_hausdorff_segments_knn_2d_idx,
# rel_bloom_runtime, traj_hausdorff_segments_knn_batch_2d,
# traj_range_window_2d_idx, rel_table_stats, rel_view_maintenance,
# sim_knn_batch, traj_map_match, traj_search_report, sink_csv_roundtrip),
# trajectory_ext (11), streams_ext (12, incl. stream_state_inspect,
# stream_backfill_union), readers_ext (8, incl. src_csv_malformed),
# setops tail
# (rel_intersect_all, rel_except_all), similarity tail (sim_range_search,
# emb_layout_ivf) = ~75 — pick 50 (prefer extras4/extras5/extras3 tail +
# streams_ext first), the rest (plus round-5 additions) go in round 6.
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
# ROUND-4 WINDOW (executed): 49 keys with no driver row through round 3
# + mm_binary_meta (round-2-checked; its module position makes it slot
# 45 — harmless re-check).
_WINDOW_FIRST: tuple[str, ...] = (
    "text_contamination",
    "text_repetition",
    "pipe_mix_sources",
    "text_pii_scrub",
    "text_minhash_estimate",
    "pipe_dedup_semantic",
    "text_bigram_lm",
    "text_winnowing",
    "rel_funnel",
    "rel_scd2_merge",
    "emb_kmeans",
    "rel_win_pattern",
    "emb_pca",
    "rel_retention",
    "emb_outliers",
    "rel_rollup_hypertable",
    "sketch_cms_topk",
    "sketch_quantile_hist",
    "rel_gapfill",
    "traj_profile_knn",
    "sketch_kmv_distinct",
    "sketch_cms_merge",
    "pipe_pack_chunks",
    "pipe_token_budget",
    "text_entropy",
    "rel_skyline",
    "graph_common_neighbors",
    "rel_kanonymity",
    "pipe_train_split",
    "text_simhash",
    "text_simhash_neardup",
    "text_ngram_jaccard",
    "emb_neardup_lsh",
    "rel_pivot",
    "rel_unpivot",
    "rel_agg_grouping_sets",
    "rel_subquery_scalar",
    "rel_bloom_prefilter",
    "pipe_clean_corpus",
    "pipe_stratified_sample",
    "rel_bucketed_join",
    "pipe_neardup_dedup",
    "pipe_incremental_dedup",
    "pipe_dedup_quality",
    "mm_binary_meta",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_feature_knn",
    "mm_audio_energy",
    "mm_resize",
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
