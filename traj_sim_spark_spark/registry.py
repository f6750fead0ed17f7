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
# ROUND-8 ROTATION: EXECUTED — see _WINDOW_FIRST below.  The round-7
# rotation's "rowless" filter counted stale rounds-1/2 err:"no_oracle"
# rows as coverage, so 5 FULL-promoted DP search tiers never got a
# hash-green driver row (cumulative coverage after r07 = 321/330, not
# the 330/330 the r07 comment claimed).  Round 8 pins those 5 at the
# window front, then the round-8 additions.  "Rowless" now means "no
# CORRECTNESS_r*.json row with hash_match==true" — both here and in
# tests/test_oracle.py's driver-scale tier.  load_all() additionally
# sorts oracle-less (WEAK) keys PAST the fall-through region so no
# window slot can ever land on a guaranteed err:"no_oracle" row.
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
    # round-7 additions (windowed this round via _WINDOW_FIRST)
    "traj_sim_spark_spark.operators.extras8",
    # round-8 additions (windowed this round via _WINDOW_FIRST)
    "traj_sim_spark_spark.operators.extras9",
    # round-9 additions (windowed this round via _WINDOW_FIRST)
    "traj_sim_spark_spark.operators.extras10",
    # round-9 continuation additions (windowed via _WINDOW_FIRST)
    "traj_sim_spark_spark.operators.extras11",
    # round-10 additions (windowed via _WINDOW_FIRST)
    "traj_sim_spark_spark.operators.extras12",
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
# ROUND-9 WINDOW (cumulative coverage is COMPLETE as of r08 — every
# oracle-bearing key has a hash-green row): spend the 50 slots on
# (a) the 2 round-9 FULL promotions (emb_kmeans/emb_pca — the only
# keys with NO hash row ever, previously WEAK-by-design), (b) the 7
# keys whose display expressions were rewritten this round (numeric
# edge-case guards + CAST-literal-AS-DOUBLE — value-identical, local
# dual-scale gates re-passed, but the mover protocol re-windows every
# key rewritten since its last green row), (c) staged round-9
# additions (unknown names are skipped until they land), and (d) the
# oldest-evidence keys — the 47 whose only hash-green row dates to
# round 1 (pre-list-layer-oracle, pre-AQE-tuning engine states) — as
# many as fit.  Leftover slots fall through to registration order
# restricted to ORACLE-BEARING keys.
#
# ROUND-10 ROTATION PLAN (compute fresh from the raw CORRECTNESS
# JSONs — don't trust this list if windows changed): after the r09
# run lands, 57 keys still carry only rounds-1/2 evidence: the 13
# r01-only keys that missed this window (rel_scalar_string/date/math/
# array/map_json, sim_pair_distance sim_knn sim_threshold_join
# sim_topk_join sim_dedup_exact
# sim_knn_ivf sim_centroid sim_knn_ivf_centroid) plus the 44 r02-only
# keys (src_csv/jsonl, the traj_ hausdorff/assemble/range tier,
# text_ classics, stream_ basics, udf_/udtf_).  That pool fits the
# round-10 + round-11 windows with room for round-10 additions.
# ROUND-10 WINDOW (evidence-freshness burn-down — the r09 verdict's
# top item): after r09, every key has a hash-green row but 77 keys'
# NEWEST row dates to rounds 1-2 (33 r01-only + 44 r02, recomputed
# fresh from the raw CORRECTNESS JSONs this round).  Slots:
# (a) the 3 round-10 additions (never checked — new keys outrank
#     re-certs), (b) the 4 keys rewritten since their last green row
#     (emb_silhouette single-arg-ROUND display recipe,
#     stream_markov_transitions keep-max tail guard, and the two
#     de-stubbed multimodal rows now running real PGM/WAV codecs —
#     value-identical by design, triple-scale gates re-passed, but the
#     mover protocol re-windows every rewritten key), (c) ALL 33
#     r01-only keys, (d) the first 10 r02 keys alphabetically.  The
# remaining 34 r02-evidence keys (text_* classics, the traj_
# hausdorff/assemble/range tier, udf_/udtf_, traj_dtw_pair,
# traj_frechet_pair_2d, traj_sample_workload, traj_session_batch)
# plus the 3 never-checked round-10-continuation adds
# (traj_dtw_knn_batch, traj_frechet_knn_batch, traj_edr_knn_batch —
# they fall through PAST this window by design) plus the 4 keys
# rewritten AFTER this window froze (mm_frame_sample, mm_feature_knn,
# mm_resize, mm_phash_nn — flipped to genuine-PGM payloads through
# the real P5 parse; value-identical, triple-scale re-gated) are the
# round-11 rotation: 3 new + 4 rewrites + 34 re-certs = 41 < 50.
_WINDOW_FIRST: tuple[str, ...] = (
    # (a) round-10 additions, never driver-hash-checked
    "traj_erp_knn_batch",
    "traj_lcss_knn_batch",
    "stream_ingest_dedup",
    # (b) round-10 rewrites since last green row
    "emb_silhouette",
    "stream_markov_transitions",
    "mm_decode_features",
    "mm_audio_energy",
    # (c) the 33 keys whose only hash-green row dates to round 1
    "rel_agg_basic",
    "rel_agg_distinct",
    "rel_agg_rollup",
    "rel_agg_cube",
    "rel_agg_having",
    "rel_agg_percentile",
    "rel_agg_stats",
    "rel_win_rank",
    "rel_win_lag",
    "rel_win_moving",
    "rel_win_range_time",
    "rel_win_distribution",
    "rel_win_nav",
    "rel_topk_global",
    "rel_topk_pergroup",
    "rel_union_all",
    "rel_intersect",
    "rel_except",
    "rel_scalar_string",
    "rel_scalar_date",
    "rel_scalar_math",
    "rel_scalar_array",
    "rel_scalar_map_json",
    "sim_band_join",
    "sim_centroid",
    "sim_dedup_exact",
    "sim_knn",
    "sim_knn_ivf",
    "sim_knn_ivf_centroid",
    "sim_pair_distance",
    "sim_threshold_join",
    "sim_topk_join",
    "traj_stats",
    # (d) oldest r02-evidence keys, alphabetical — first 10 of 44
    "mm_multimodal_join",
    "src_csv_ingest",
    "src_jsonl_ingest",
    "stream_dedup",
    "stream_session",
    "stream_sliding",
    "stream_stateful",
    "stream_static_join",
    "stream_stream_join",
    "stream_topk_complete",
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
    # Fall-through: oracle-bearing keys first (registration order) so no
    # driver-window slot is wasted on a guaranteed err:"no_oracle" row;
    # WEAK (oracle-less) keys sort past them permanently.
    for k, fn in QUERIES.items():
        if k not in ordered and k in ORACLES:
            ordered[k] = fn
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
