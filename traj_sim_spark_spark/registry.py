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
# ROUND-6 ROTATION (do at round-6 start): after the round-5 window below
# executes, the remaining driver-rowless keys are exactly these 41 —
# trajectory_ext (11: traj_frechet_threshold_2d, traj_dtw_knn_2d,
# traj_dtw_threshold_2d, traj_dtw_pair_2d, traj_hausdorff_segments_knn,
# traj_hausdorff_segments_threshold, traj_hausdorff_knn_batch,
# traj_hausdorff_knn_2d_batch, traj_dtw_knn_banded,
# traj_dtw_knn_banded_2d, traj_dtw_threshold_banded — 6 of them WEAK
# rows-only by design),
# readers_ext (11: src_text_ingest, src_orc_ingest,
# sink_partitioned_roundtrip, src_schema_evolution, sink_stream_parquet,
# stream_layout_ingest, sink_compaction, src_binary_files,
# src_python_datasource, sink_versioned_snapshot, src_csv_malformed),
# streams_ext tail (8: stream_traj_distance, stream_cms,
# stream_quantile_hist, stream_funnel, stream_anomaly,
# stream_pack_chunks, stream_ewma, stream_distinct_users),
# extras3 tail (6: traj_hausdorff_segments_knn_2d_idx,
# traj_hausdorff_segments_knn_batch_2d, traj_range_window_2d_idx,
# rel_table_stats, rel_view_maintenance, sink_csv_roundtrip),
# setops tail (rel_intersect_all, rel_except_all), similarity tail
# (sim_range_search, emb_layout_ivf), udf_map_arrow = 41, plus the 24
# round-5 extras6 additions (14 FULL: lcss/edr/erp pair rows in 1-D
# and 2-D, sim_diversify_mmr, rel_gaps_islands, rel_agg_filtered,
# text_langid_confusion, pipe_span_corruption, emb_norm_hist,
# rel_try_arithmetic, pipe_chunk_overlap, rel_grouping_id; 10 WEAK:
# the LCSS/EDR/ERP search tiers) = 65 for a 50-key window.  Prefer the
# FULL rows + readers_ext/streams_ext/extras3 tails first; spill the
# 10 WEAK search rows and the 6 trajectory_ext WEAK rows to round 7
# (their brute/recursion pytest pins already carry the evidence), and
# re-window rel_agg_approx (its round-1 rows-only row predates the
# round-5 KMV twin-column FULL rewrite).
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
# ROUND-5 WINDOW (executed this round): 50 keys with no driver row
# through round 4 — all of extras5 (24) + all of extras4 (18) + the 4
# riskiest extras3-tail keys + 4 streams_ext keys. The remaining 41
# rowless keys are enumerated in the ROUND-6 ROTATION comment above.
_WINDOW_FIRST: tuple[str, ...] = (
    # extras5 (24)
    "rel_recursive_cte",
    "rel_regr_exact",
    "ps_frontend",
    "rel_join_skew_salted",
    "rel_variant_json",
    "src_xml_ingest",
    "graph_sssp",
    "text_setsim_prefix_join",
    "rel_gdpr_delete",
    "text_quality_logreg",
    "rel_holt_linear",
    "text_dup_ngram_coverage",
    "rel_pit_join",
    "pipe_doc_shuffle",
    "graph_stress_betweenness",
    "graph_temporal_reach",
    "rel_observe",
    "emb_kmeans_exact",
    "sim_knn_pq_exact",
    "text_dedup_cut",
    "graph_clustering_coeff",
    "emb_cov_topk",
    "emb_cosine_hist",
    "pipe_leakage_safe_split",
    # extras4 (18)
    "sim_knn_binary",
    "sim_hybrid_rrf",
    "rel_dq_audit",
    "sketch_kmv_setops",
    "traj_zorder_layout",
    "graph_label_prop",
    "mm_header_parse",
    "rel_agg_mode_disc",
    "traj_viterbi_map_match",
    "emb_dedup_threshold_sweep",
    "text_containment_neardup",
    "pipe_dedup_funnel",
    "sim_ann_recall_matrix",
    "rel_equidepth_hist",
    "pipe_mix_temperature",
    "text_ngram_novelty",
    "rel_join_lateral",
    "rel_sql_frontend",
    # extras3 tail (4)
    "rel_bloom_runtime",
    "sim_knn_batch",
    "traj_map_match",
    "traj_search_report",
    # streams_ext (4)
    "stream_state_inspect",
    "stream_cdc_apply",
    "stream_backfill_union",
    "stream_seg_corridor",
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
