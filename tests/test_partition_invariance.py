"""Results must be independent of the physical partitioning.

At 100 TB the same query runs with thousands of shuffle partitions; on
a laptop, with a handful. Any operator whose OUTPUT depends on
``spark.sql.shuffle.partitions`` (hash-order leakage through a window,
a non-deterministic tie-break, a first()/collect_list without an
explicit sort) is broken at scale even if its sf0.01 oracle passes.
This suite re-runs representative hash-order-sensitive queries under
different partition counts and requires bit-identical sorted results.
"""

from __future__ import annotations

import pytest

from traj_sim_spark_spark import registry

registry.load_all()

# one per order-sensitivity class: window tie-break, top-k ties,
# union-of-joins, collect_list assembly, DP-kernel two-phase
KEYS = [
    "rel_topk_pergroup",
    "rel_topk_global",
    "text_minhash_neardup",
    "traj_assemble",
    "traj_hausdorff_knn",
    "traj_frechet_knn",
    "traj_dtw_knn_2d",
    "traj_hausdorff_segments_knn",
    "pipe_clean_corpus",
    "emb_layout_ivf",
    "text_simhash_neardup",
    # curation additions: window-cumsum packing (hash-order-exposed if
    # the order key were non-total), top-k-per-user join ranking
    "pipe_pack_chunks",
    "pipe_token_budget",
    "traj_knn_join",
    # series/graph additions: knife-edge bottom-k ranking over decimal
    # sums; iterative min-label propagation; exact grouped percentiles
    "text_bigram_lm",
    "graph_cc",
    "rel_anomaly_mad",
    # dual-index search (driver-scalar bounds + top-k ties), KMV top-k
    # hash selection, Gi* knife-edge top-20
    "traj_hausdorff_knn_2d_idx",
    "sketch_kmv_distinct",
    "traj_hotspot_gi",
    # extras2 additions: row_number NN tie-break over an LSH bucket
    # join; CC min-label over the dense-cell graph
    "mm_phash_nn",
    "traj_grid_dbscan",
    # round-3 additions: the segment search tier (top-k over exact
    # doubles + integer coverage counts), both index paths, the
    # runtime-bloom materialized join, the dispatched Q1 sums
    "traj_hausdorff_segments_knn_2d",
    "traj_hausdorff_segments_threshold_2d",
    "traj_hausdorff_segments_knn_2d_idx",
    "rel_bloom_runtime",
    "rel_agg_basic",
    "graph_copurchase",
    "traj_hausdorff_segments_knn_batch_2d",
    "traj_map_match",
    "sim_knn_batch",
    "traj_range_window_2d_idx",
    "rel_view_maintenance",
    # round-4 additions: integer-Hamming shortlist + float rerank,
    # dual-shortlist RRF fusion, KMV min-hash top-k set algebra
    "sim_knn_binary",
    "sim_hybrid_rrf",
    "sketch_kmv_setops",
    "graph_label_prop",
    "traj_zorder_layout",
    "rel_agg_mode_disc",
    "traj_viterbi_map_match",
    "emb_dedup_threshold_sweep",
    "text_containment_neardup",
    "rel_equidepth_hist",
    "src_python_datasource",
    "pipe_mix_temperature",
    "text_ngram_novelty",
    "rel_join_lateral",
    "rel_sql_frontend",
    # extras5 additions: recursive-CTE fold (per-chain total order),
    # integer-moment regression (decimal Σy² accumulator), salted-join
    # reducer spread, iterative Bellman-Ford min tableau
    "rel_recursive_cte",
    "rel_regr_exact",
    "rel_join_skew_salted",
    "graph_sssp",
    # prefix-filter join (global df rank + quantized argmax), logreg
    # margins (integer-div features)
    "text_setsim_prefix_join",
    "text_quality_logreg",
    # Holt coefficients (integer linear form), dup-span interval union
    # (LEAD over per-doc starts)
    "rel_holt_linear",
    "text_dup_ngram_coverage",
    # two-phase global rank (range partitions + offsets) must be
    # partitioning-invariant by construction; PIT validity intervals
    "pipe_doc_shuffle",
    "rel_pit_join",
    # multi-source BFS sigma sums + pair-combine joins
    "graph_stress_betweenness",
    # earliest-arrival min-relaxation rounds
    "graph_temporal_reach",
    # integer Lloyd rounds (argmin + shifted means)
    "emb_kmeans_exact",
    # round-9 FULL promotions: 4-round integer Lloyd + exact WCSS;
    # integer covariance + pinned-DAG power iteration
    "emb_kmeans",
    "emb_pca",
    # per-subspace integer Lloyd + ADC sum
    "sim_knn_pq_exact",
    # round-8 FULL promotions: integer Lloyd on raw / coarse-residual
    # subvectors (argmin + shifted means + integer coarse assignment)
    "sim_knn_pq",
    "sim_knn_ivfpq",
    # round-8 adds: median-split tree + ordered integer rerank;
    # LCM-scaled minimax over a self-join (min/max integer folds);
    # greedy graph navigation (integer per-hop argmin over collected
    # frontiers); synchronous Louvain gain argmax window
    "emb_rp_tree_knn",
    "rel_isotonic_fit",
    "sim_knn_graph_greedy",
    "graph_louvain_move",
    # exact conformal order statistic + integer coverage compares
    "rel_conformal_bounds",
    # md5-multiplicity replicate means ranked by quantized BIGINT keys
    "rel_bootstrap_ci",
    # at-risk cumsum + quantized-ln product curve; decimal rank sums
    "rel_survival_km",
    "rel_lorenz_gini",
    # exact order-statistic clamps (rank windows must not leak order)
    "rel_winsorized_mean",
    # ordered survivor re-join (md5 of reconstructed string)
    "text_dedup_cut",
    # round-9 adds: two-step gram-ownership argmin + gaps-islands
    # window; global top-N window ordered (count DESC, token);
    # ordered kept-text rebuild (md5); wedge-sum top-N window
    "text_substring_dedup",
    "text_corpus_drift",
    "text_substring_dedup_apply",
    "graph_adamic_adar",
    # IGNORE-NULLS as-of frame per user (total order us, event_id);
    # 4-cell conditional moment aggregate
    "rel_attribution_touch",
    "rel_did",
    # round-9 continuation (extras11): integer-walk top-N TakeOrdered;
    # skeleton-cluster top-N (count DESC, tpl string tie-break);
    # exact histogram-cut quintile scores; LAG transition pairs
    "graph_katz",
    "text_template_detect",
    "rel_rfm_segments",
    "rel_markov_transitions",
    # quantize-once centroids + integer argmin + decimal s-sums
    "emb_silhouette",
    # triangle/degree ratios; DECIMAL covariance ranking with tie-break;
    # Arrow byte-scan
    "graph_clustering_coeff",
    "emb_cov_topk",
    "udf_map_arrow",
    # sign-aware squared bin decisions over a cross join
    "emb_cosine_hist",
    # round-5: integer DP pair measures, greedy MMR selection chain,
    # md5-seeded span union, top-k with rational sort keys
    "traj_lcss_pair",
    "traj_edr_pair",
    "traj_erp_pair",
    "sim_diversify_mmr",
    "pipe_span_corruption",
    "traj_lcss_knn",
    "traj_edr_knn",
    "traj_lcss_threshold",
    "traj_edr_threshold",
    "rel_gaps_islands",
    # round-6: plane-ERP (isqrt integer costs) pair + search tier
    "traj_erp_pair_2d",
    "traj_erp_threshold_2d",
    "traj_erp_knn_2d",
    # round-6: iterative BPE merge chain (argmax per round) + top-k
    "pipe_bpe_train",
    "text_bpe_encode",
    # round-7: BPE-count window packing, integer-HITS top-k ties,
    # ROW_NUMBER median selection, top-20 rational-ratio ranking,
    # skyline windows over distinct integer pairs
    "pipe_pack_bpe",
    "graph_hits",
    "rel_theil_sen",
    "text_idf_novelty",
    "sim_pareto_knn",
    # rank/supremum statistics: doubled-average-rank tie groups and the
    # cross-multiplied CDF max must not leak hash order
    "rel_mann_whitney",
    "rel_ks_test",
    # round-10 additions: the batch two-phase kNN rows (per-qid rank
    # windows + broadcast tau; order-sensitive via top-k ties) and the
    # streaming ingest ledger (commutative by design — pinned anyway)
    "traj_erp_knn_batch",
    "traj_lcss_knn_batch",
    "traj_dtw_knn_batch",
    "traj_edr_knn_batch",
    "stream_ingest_dedup",
]


def _run_sorted(spark, key, sf_dir):
    df = registry.QUERIES[key](spark, sf_dir)
    return sorted(
        tuple(row) for row in df.collect()
    )


@pytest.mark.parametrize("key", KEYS)
def test_partition_count_invariance(spark, sf_dir, key):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _run_sorted(spark, key, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _run_sorted(spark, key, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
