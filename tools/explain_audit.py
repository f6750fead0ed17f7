"""Physical-plan audit: dump `.explain(formatted)` for the headline
queries and scan for scale red flags, writing PLANS.md at the repo root.

Red flags checked per plan (the 100-TB discipline, SURVEY.md §4):
- CartesianProduct without a broadcast on one side (unblocked quadratic)
- BatchEvalPython (row-at-a-time Python UDF in the plan; only
  Arrow-batched ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  are allowed)
- Parquet scans selecting every column when the query projects few
  (column pruning failure, detected as ReadSchema listing >12 fields)

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402

# streaming queries run to completion inside their builder (memory sink),
# so their returned DataFrame is the materialized batch table — the
# streaming plan itself is asserted in tests/test_streaming.py instead.
AUDIT = [
    "rel_scan_filter",
    "rel_scan_project",
    "rel_agg_basic",
    "rel_agg_percentile",
    "rel_join_broadcast",
    "rel_join_smj",
    "rel_join_multiway",
    "rel_join_asof",
    "rel_join_theta_band",
    "rel_subquery_scalar",
    "rel_win_rank",
    "rel_topk_global",
    "sim_knn",
    "sim_threshold_join",
    "sim_band_join",
    "sim_knn_ivf",
    "traj_hausdorff_knn",
    "traj_hausdorff_knn_2d",
    "traj_hausdorff_threshold_2d",
    "traj_frechet_threshold",
    "traj_range_query_2d",
    "traj_sample_workload",
    "traj_segments",
    "rel_win_distribution",
    "text_exact_dedup",
    "text_minhash_neardup",
    "text_jaccard_neardup",
    "text_langid",
    "text_tfidf",
    "mm_multimodal_join",
    "pipe_clean_corpus",
    "pipe_stratified_sample",
    "pipe_neardup_dedup",
    "rel_bucketed_join",
    "sim_range_search",
    "traj_range_query_2d_pruned",
    "traj_hausdorff_segments_knn",
    "text_simhash_neardup",
    "emb_layout_ivf",
    "traj_staypoints",
    "traj_od_flows",
    "traj_comovement",
    "traj_resample",
    "traj_simplify_dp",
    "text_contamination",
    "text_repetition",
    "pipe_mix_sources",
    "text_pii_scrub",
    "rel_funnel",
    "rel_scd2_merge",
    "emb_kmeans",
    "rel_rollup_hypertable",
    "sketch_cms_topk",
    "traj_hausdorff_knn_2d_batch",
    "traj_convoy",
    "rel_win_pattern",
    "sim_knn_sq8",
    "rel_join_asof_nearest",
    "traj_heatmap_density",
    "rel_join_interval_overlap",
    "rel_intersect_all",
    "rel_except_all",
    "sink_partitioned_roundtrip",
    "sim_ann_recall",
    "text_minhash_estimate",
    # round-2 late additions (loops/eager builders audit their final plan)
    "traj_cluster_threshold",
    "sim_knn_ivfpq",
    "emb_pca",
    "emb_outliers",
    "rel_retention",
    "rel_bloom_prefilter",
    "graph_triangles",
    # round-3 curation additions
    "pipe_pack_chunks",
    "pipe_token_budget",
    "text_entropy",
    "rel_skyline",
    "graph_common_neighbors",
    "traj_knn_join",
    # round-2 continuation: series analytics + graph + LM additions
    "rel_ewma",
    "rel_autocorr",
    "rel_anomaly_mad",
    "graph_bfs_hops",
    "graph_cc",
    "text_bigram_lm",
    "traj_radius_gyration",
    "traj_mobility_entropy",
    "sim_mips",
    "rel_changepoint",
    "traj_speed_outliers",
    "text_winnowing",
    "traj_hotspot_gi",
    "sketch_kmv_distinct",
    "graph_assortativity",
    "src_schema_evolution",
    "traj_transition_matrix",
    "traj_hausdorff_threshold_2d_idx",
    "mm_audio_energy",
    "sketch_cms_merge",
    "emb_drift",
    "traj_hausdorff_knn_2d_idx",
    "text_winnowing",
    "rel_kanonymity",
    "mm_resize",
    "pipe_train_split",
    "text_boilerplate",
    "mm_phash_nn",
    "traj_grid_dbscan",
    "rel_seasonal_anomaly",
    "graph_modularity",
    "pipe_quality_prune",
    "sink_compaction",
    "sim_knn_filtered",
    "traj_segment_intersections",
    "traj_self_intersections",
    "mm_scene_cuts",
    "rel_merge_upsert",
    "sim_knn_mrl",
    "graph_copurchase",
    "traj_range_segments_2d",
    "traj_hausdorff_segments_pair_2d",
    "traj_hausdorff_segments_knn_2d",
    "traj_hausdorff_segments_threshold_2d",
]


def flags_for(plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan and "Broadcast" not in plan:
        out.append("UNBLOCKED-CARTESIAN")
    if "BatchEvalPython" in plan:
        out.append("ROW-AT-A-TIME-PYTHON-UDF")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        if m.group(1).count(",") + 1 > 12:
            out.append("WIDE-SCAN(>12 cols)")
            break
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry.load_all()
    spark = get_session("explain_audit")
    sections = []
    failures = []
    for key in AUDIT:
        df = registry.QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        fl = flags_for(plan)
        if fl:
            failures.append((key, fl))
        head = f"## {key}" + (f"  ⚠ {', '.join(fl)}" if fl else "")
        sections.append(f"{head}\n\n```\n{plan.strip()}\n```\n")
    doc = (
        "# PLANS — physical-plan audit (auto-generated)\n\n"
        f"`python tools/explain_audit.py {sf_dir}` — "
        f"{len(AUDIT)} headline plans, "
        f"{len(failures)} with red flags.\n\n"
        "Red-flag rules: no CartesianProduct without broadcast, no "
        "row-at-a-time Python UDFs (BatchEvalPython), no >12-column "
        "Parquet scans. See tools/explain_audit.py.\n\n" + "\n".join(sections)
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write(doc)
    for key, fl in failures:
        print(f"FLAG {key}: {', '.join(fl)}")
    print(f"== {len(AUDIT)} plans audited, {len(failures)} flagged ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
