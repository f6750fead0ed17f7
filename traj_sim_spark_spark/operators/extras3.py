"""Round-3 operators.

Centerpiece: the 2-D segment-geometry SEARCH tier — the reference's
flagship query family (DFT, Xie/Li/Phillips PVLDB 2017 §4-5): kNN and
threshold search under the segment-based Hausdorff distance in the
plane, composed from round 2's building blocks (the eps-cell range
probe and the integer point-to-segment kernel in extras2.py) and
completed here with BOTH dual-index variants, the batched workload,
nearest-segment map-matching and the composed search report —
{pair, range, kNN, threshold} x {scan, index, batch} at
point-to-SEGMENT fidelity (SURVEY §2.1 R6/R15).

Also home to the round-3 relational/engine additions: the exercised
runtime Bloom-filter join, ANALYZE-style table statistics, signed-delta
incremental view maintenance, the batched vector kNN, the 2-D
(day x band) partition-grid range query, and the CSV sink roundtrip.

Exactness discipline (house rules): the plane is micro-quantized
(x = micro-days by integer div, y = micro-value), the threshold search
decides membership ENTIRELY in integer/DECIMAL(38,0) arithmetic (no
float anywhere), and the kNN's d² values are either exact 128-bit
integers converted once to double or an exact-integer square divided by
an exact-integer length — both engines convert the SAME integers with
the same IEEE rounding, so min/max/top-k lattices are bit-identical
(the argument proven by ``traj_hausdorff_segments_pair_2d``'s hash
match).  sqrt + /1e6 + ROUND(,6) is the single display step.

Registered FIRST in ``registry._MODULES``'s round-3 window tail so the
new ops get driver correctness rows.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_SK_Q = 1  # query trajectory
_SK_TAU_U = 25_000_000  # threshold tau: 25.0 value-units in micro-units
_SK_K = 10
_SK_C = 3  # candidate over-fetch factor (c*k), as in [P §5]

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------------------
# shared geometry: micro-quantized points / segments and the exact
# point-to-segment kernel (same arithmetic as extras2's pair/range rows)
# ---------------------------------------------------------------------------

_SQL_PTS = """
    WITH t0 AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0 FROM events
    ),
    p AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) - (SELECT t0 FROM t0))
                   // 86400 AS x,
               CAST(ROUND(value * 1e6) AS BIGINT) AS y,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events
    ),
    s AS (
        SELECT * FROM (
            SELECT user_id, seq, x AS x1, y AS y1,
                   LEAD(x) OVER (PARTITION BY user_id ORDER BY seq) AS x2,
                   LEAD(y) OVER (PARTITION BY user_id ORDER BY seq) AS y2
            FROM p
        ) WHERE x2 IS NOT NULL
    )
"""

# DuckDB exact point(a.x,a.y)-to-segment(b.*) squared distance (double) —
# identical expression order to extras2's pair oracle.
_SQL_D2 = """
    CASE WHEN CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
              + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1) = 0
           OR (b.x2-b.x1)*(a.x-b.x1) + (b.y2-b.y1)*(a.y-b.y1) <= 0
      THEN CAST(CAST((a.x-b.x1) AS HUGEINT)*(a.x-b.x1)
                + CAST((a.y-b.y1) AS HUGEINT)*(a.y-b.y1) AS DOUBLE)
      WHEN (b.x2-b.x1)*(a.x-b.x1) + (b.y2-b.y1)*(a.y-b.y1)
           >= CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
              + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1)
      THEN CAST(CAST((a.x-b.x2) AS HUGEINT)*(a.x-b.x2)
                + CAST((a.y-b.y2) AS HUGEINT)*(a.y-b.y2) AS DOUBLE)
      ELSE CAST(CAST((b.x2-b.x1) AS HUGEINT)*(a.y-b.y1)
                - CAST((b.y2-b.y1) AS HUGEINT)*(a.x-b.x1) AS DOUBLE)
           * CAST(CAST((b.x2-b.x1) AS HUGEINT)*(a.y-b.y1)
                  - CAST((b.y2-b.y1) AS HUGEINT)*(a.x-b.x1) AS DOUBLE)
           / CAST(CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
                  + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1) AS DOUBLE)
      END
"""

# DuckDB integer membership: point within tau of segment (no float).
_SQL_WITHIN = f"""
    CASE WHEN CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
              + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1) = 0
           OR (b.x2-b.x1)*(a.x-b.x1) + (b.y2-b.y1)*(a.y-b.y1) <= 0
      THEN CAST((a.x-b.x1) AS HUGEINT)*(a.x-b.x1)
           + CAST((a.y-b.y1) AS HUGEINT)*(a.y-b.y1)
           <= {_SK_TAU_U} * CAST({_SK_TAU_U} AS HUGEINT)
      WHEN (b.x2-b.x1)*(a.x-b.x1) + (b.y2-b.y1)*(a.y-b.y1)
           >= CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
              + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1)
      THEN CAST((a.x-b.x2) AS HUGEINT)*(a.x-b.x2)
           + CAST((a.y-b.y2) AS HUGEINT)*(a.y-b.y2)
           <= {_SK_TAU_U} * CAST({_SK_TAU_U} AS HUGEINT)
      ELSE (CAST((b.x2-b.x1) AS HUGEINT)*(a.y-b.y1)
            - CAST((b.y2-b.y1) AS HUGEINT)*(a.x-b.x1))
           * (CAST((b.x2-b.x1) AS HUGEINT)*(a.y-b.y1)
              - CAST((b.y2-b.y1) AS HUGEINT)*(a.x-b.x1))
           <= ({_SK_TAU_U} * CAST({_SK_TAU_U} AS HUGEINT))
              * (CAST((b.x2-b.x1) AS HUGEINT)*(b.x2-b.x1)
                 + CAST((b.y2-b.y1) AS HUGEINT)*(b.y2-b.y1))
      END
"""


def _pts_int(t: Tables) -> DataFrame:
    """(user_id, seq, x, y) on the micro-quantized (day, value) plane —
    the segment family's shared coordinate contract (extras2 pair/range
    rows use the identical expressions)."""
    ev = t.events
    t0 = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    return (
        t.user_points()
        .join(F.broadcast(t0))
        .select(
            "user_id",
            "seq",
            F.expr("(unix_micros(ts) - t0) div 86400").alias("x"),
            F.round(F.col("value") * 1e6).cast("bigint").alias("y"),
        )
    )


def _segs_int(p: DataFrame) -> DataFrame:
    """(user_id, seq, x1, y1, x2, y2): consecutive-sample segments."""
    w = W.partitionBy("user_id").orderBy("seq")
    return (
        p.select(
            "user_id",
            "seq",
            F.col("x").alias("x1"),
            F.col("y").alias("y1"),
            F.lead("x").over(w).alias("x2"),
            F.lead("y").over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
    )


def _seg_cases(
    px: Column, py: Column
) -> tuple[Column, Column, Column, Column, Column, Column]:
    """The exact kernel's building blocks for point (px,py) against the
    segment columns (x1,y1,x2,y2) of the current row: (ab2, dotp, ap2,
    bp2, crs) as BIGINT plus the degenerate/endpoint case selector —
    shared by the d² (kNN) and within-tau (threshold) forms.

    Every product fits int64 with >100x margin on the micro-quantized
    plane (|x| <= 3e7 micro-days, |y| <= ~6e8 micro-value => largest
    term |Δy·Δy| ~ 3.2e17 vs the 9.2e18 ceiling; ANSI mode would raise
    on a violation rather than wrap). Only crs² and tau²·ab2 need
    128-bit — ``_seg_within`` widens exactly those to DECIMAL(38,0);
    the d² form squares crs in DOUBLE (the single float step, identical
    on both engines), so the kNN kernel never touches decimal — the
    decimal→bigint move cut the sf0.1 single-pass kNN by ~2x."""
    x1, y1, x2, y2 = F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    ab2 = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)
    dotp = (x2 - x1) * (px - x1) + (y2 - y1) * (py - y1)
    ap2 = (px - x1) * (px - x1) + (py - y1) * (py - y1)
    bp2 = (px - x2) * (px - x2) + (py - y2) * (py - y2)
    crs = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    at_a = (ab2 == 0) | (dotp <= 0)
    return ab2, dotp, ap2, bp2, crs, at_a


def _seg_d2(px: Column, py: Column) -> Column:
    """Exact squared point-to-segment distance as DOUBLE (identical
    operation order to the pair row / the DuckDB ``_SQL_D2``)."""
    ab2, dotp, ap2, bp2, crs, at_a = _seg_cases(px, py)
    return (
        F.when(at_a, ap2.cast("double"))
        .when(dotp >= ab2, bp2.cast("double"))
        .otherwise(crs.cast("double") * crs.cast("double") / ab2.cast("double"))
    )


def _seg_within(px: Column, py: Column, tau_u: int) -> Column:
    """Integer-exact membership: point within tau of the segment.

    The interior case needs 128-bit arithmetic (crs² vs tau²·ab2), but
    Java BigDecimal multiplies are ~20x an int64/double op and this
    predicate runs per (point, segment) pair in the broadcast joins —
    so a DOUBLE prefilter decides the far-from-the-boundary pairs
    first (round 12, guide §1.2 per-task work).  Exactness: int64 →
    double conversion and one multiply are each exactly rounded (rel
    err ≤ 2⁻⁵³ per step, ≤ ~5e-16 end to end), so comparisons with a
    1e-9 relative guard band can never misclassify; only pairs inside
    the band — within float noise of the exact boundary — fall through
    to the DECIMAL(38,0) compare, which remains the decision of
    record.  Same decision on every pair as the pure-decimal form by
    construction."""
    ab2, dotp, ap2, bp2, crs, at_a = _seg_cases(px, py)
    t2 = tau_u * tau_u
    crsf = crs.cast("double")
    lhs = crsf * crsf
    rhs = F.lit(float(t2)) * ab2.cast("double")
    exact = crs.cast(_DEC) * crs <= F.lit(t2).cast(_DEC) * ab2
    interior = (
        F.when(lhs <= rhs * F.lit(1.0 - 1e-9), F.lit(True))
        .when(lhs > rhs * F.lit(1.0 + 1e-9), F.lit(False))
        .otherwise(exact)
    )
    return (
        F.when(at_a, ap2 <= t2)
        .when(dotp >= ab2, bp2 <= t2)
        .otherwise(interior)
    )


# ---------------------------------------------------------------------------
# traj_hausdorff_segments_threshold_2d
# ---------------------------------------------------------------------------


@query(
    "traj_hausdorff_segments_threshold_2d",
    oracle=f"""
    {_SQL_PTS},
    qp AS (SELECT x, y, seq FROM p WHERE user_id = {_SK_Q}),
    qs AS (SELECT * FROM s WHERE user_id = {_SK_Q}),
    cov AS (
        SELECT b.user_id, CAST(COUNT(DISTINCT a.seq) AS BIGINT) AS n_cov
        FROM qp a JOIN s b ON b.user_id <> {_SK_Q} AND ({_SQL_WITHIN})
        GROUP BY 1
    ),
    bad AS (
        SELECT DISTINCT a.user_id FROM p a
        WHERE a.user_id <> {_SK_Q}
          AND NOT EXISTS (SELECT 1 FROM qs b WHERE {_SQL_WITHIN})
    )
    SELECT cov.user_id FROM cov
    WHERE cov.n_cov = (SELECT COUNT(*) FROM qp)
      AND cov.user_id NOT IN (SELECT user_id FROM bad)
    """,
)
def traj_hausdorff_segments_threshold_2d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Threshold SEARCH under the 2-D segment-based Hausdorff distance
    [P §4.4]: every trajectory U with H_seg(Q, U) <= tau, where each
    point of Q must lie within tau of U's PATH (its segments, not its
    samples) and vice versa.

    The search never materializes a distance: H_seg <= tau iff every
    point of one side has SOME segment of the other side within tau, so
    membership is decided per (point, segment) by the integer-exact
    kernel (projection cases by cross-multiplied dot products, interior
    by crs^2 <= tau^2 * |AB|^2 in DECIMAL(38,0)) — no float anywhere,
    the discipline that makes the oracle hash-match at every SF.

    Plan shape (the 100 TB story): both directions are BROADCAST joins
    of the bounded query trajectory (66 points / 65 segments) against
    the corpus — direction 1 probes corpus segments with Q's points,
    direction 2 anti-joins corpus points against Q's segments; the
    predicate is pushed into the join condition so non-matches never
    materialize, work is O(|corpus| * |Q|) with zero shuffle beyond the
    two per-user aggregations, and direction 2 runs only on direction
    1's survivors (semi-join pushdown).  Cites reference semantics
    SURVEY §2.1 R6/R15.
    """
    t = Tables(spark, sf_dir)
    return _segthr_core(_pts_int(t))


def _segthr_core(p: DataFrame) -> DataFrame:
    """The threshold search engine over an integer point table
    (user_id, seq, x, y) — shared by the full-scan row and the
    dual-index row (which feeds it a manifest-pruned, partition-pruned
    subset that is provably complete for every possible answer)."""
    qp, qs, n_q = _q_side(p)
    segs = _segs_int(p.where(F.col("user_id") != _SK_Q))
    cov = (
        segs.join(
            F.broadcast(qp),
            _seg_within(F.col("qx"), F.col("qy"), _SK_TAU_U),
        )
        .select("user_id", "qseq")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_cov"))
        .filter(F.col("n_cov") == n_q)
        .select("user_id")
    )
    pts = p.where(F.col("user_id") != _SK_Q).join(
        F.broadcast(cov), "user_id", "left_semi"
    )
    uncovered = pts.join(
        F.broadcast(qs),
        _seg_within(F.col("x"), F.col("y"), _SK_TAU_U),
        "left_anti",
    ).select("user_id").distinct()
    return cov.join(uncovered, "user_id", "left_anti")


# ---------------------------------------------------------------------------
# traj_hausdorff_segments_knn_2d
# ---------------------------------------------------------------------------


def _q_side(p: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """(query points, query segments, n_q), materialized ONCE: the
    query trajectory is bounded (~66 rows), but left lazy its subtree
    (scan + seq window) would be re-derived for every consumer — a
    PLANS.md sweep showed the threshold plan re-scanning the corpus 3x
    for the q side alone.  localCheckpoint collapses that to one pass;
    the count is then free."""
    q = p.where(F.col("user_id") == _SK_Q).localCheckpoint()
    qp = q.select(
        F.col("seq").alias("qseq"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    qs = _segs_int(q).select("x1", "y1", "x2", "y2")
    return qp, qs, q.count()


def _hseg_per_user(t: Tables, ids: DataFrame | None = None) -> DataFrame:
    """Per-user squared segment-Hausdorff to the query trajectory over
    the full scan (see ``_hseg_per_user_from``)."""
    return _hseg_per_user_from(_pts_int(t), ids)


def _hseg_per_user_from(
    p: DataFrame, ids: DataFrame | None = None
) -> DataFrame:
    """Per-user squared segment-Hausdorff to the query trajectory:
    (user_id, h2) with h2 = max of both directed max-min d² (double,
    micro² units), from an integer point table (full scan or the
    partition-pruned layout).  ``ids`` restricts the exact work to
    candidate users (semi-join pushed below the distance joins) so a
    prune can gate it.  Users with fewer than 2 points have no segments
    and are excluded (no path to measure against — mirrored by the
    oracle's inner join)."""
    qp, qs, _ = _q_side(p)
    pts = p.where(F.col("user_id") != _SK_Q)
    if ids is not None:
        pts = pts.join(F.broadcast(ids.select("user_id")), "user_id",
                       "left_semi")
    segs = _segs_int(pts)
    h1 = (
        segs.join(F.broadcast(qp))
        .select(
            "user_id", "qseq",
            _seg_d2(F.col("qx"), F.col("qy")).alias("d2"),
        )
        .groupBy("user_id", "qseq")
        .agg(F.min("d2").alias("nd"))
        .groupBy("user_id")
        .agg(F.max("nd").alias("h1"))
    )
    h2 = (
        pts.join(F.broadcast(qs))
        .select(
            "user_id", "seq",
            _seg_d2(F.col("x"), F.col("y")).alias("d2"),
        )
        .groupBy("user_id", "seq")
        .agg(F.min("d2").alias("nd"))
        .groupBy("user_id")
        .agg(F.max("nd").alias("h2d"))
    )
    return h1.join(h2, "user_id").select(
        "user_id", F.greatest("h1", "h2d").alias("h2")
    )


_BIG = 1 << 62


def _hseg_lb(t: Tables) -> DataFrame:
    """Per-user INTEGER lower bound of the 2-D segment-Hausdorff to the
    query user, by one sort-merge window pass on the y (micro-value)
    axis — no pair join.

    Projection bound: d_2D(point, seg) >= dist_y(p_y, yspan(seg)), so
    the 1-D SEGMENT Hausdorff on y lower-bounds the 2-D one.  On a
    polyline the interval endpoints ARE the sample values, so the 1-D
    segment distance equals the 1-D point distance ZEROED when the
    marker falls inside some other-side interval — computed by merging,
    per user, both sides' point-markers and interval open/close events
    into one y-sorted stream: flanking other-side markers give the
    point distance (the ``_hausdorff_lb`` trick, trajectory.py), a
    running open-interval counter decides coverage.  All integer.
    O((E + U*|Q|) log) work, one shuffle on user_id."""
    p = _pts_int(t)
    qp = p.where(F.col("user_id") == _SK_Q)
    pts = p.where(F.col("user_id") != _SK_Q)
    users = pts.select("user_id").distinct()

    def events_of(src: DataFrame, side: int, per_user: bool) -> DataFrame:
        """marker + interval open/close rows for one side's points.
        kind: 0=open, 1=marker, 2=close; delta tracks open intervals."""
        w = W.partitionBy("user_id").orderBy("seq")
        lo = F.least(F.col("y"), F.lead("y").over(w))
        hi = F.greatest(F.col("y"), F.lead("y").over(w))
        base = src.select(
            "user_id", "seq", "y", lo.alias("lo"), hi.alias("hi")
        )
        marker = base.select(
            "user_id", F.col("y").alias("pos"),
            F.lit(1).alias("kind"), F.lit(side).alias("side"),
            F.lit(0).alias("delta"),
        )
        opens = base.filter(F.col("lo").isNotNull()).select(
            "user_id", F.col("lo").alias("pos"),
            F.lit(0).alias("kind"), F.lit(side).alias("side"),
            F.lit(1).alias("delta"),
        )
        closes = base.filter(F.col("hi").isNotNull()).select(
            "user_id", F.col("hi").alias("pos"),
            F.lit(2).alias("kind"), F.lit(side).alias("side"),
            F.lit(-1).alias("delta"),
        )
        out = marker.unionByName(opens).unionByName(closes)
        if not per_user:
            # replicate the (bounded) query-side rows into every
            # corpus user's partition
            out = users.join(F.broadcast(out.drop("user_id")))
        return out

    stream = events_of(pts, 0, True).unionByName(events_of(qp, 1, False))
    # order: opens before markers before closes at equal y, so a marker
    # exactly on an interval boundary counts as covered (distance 0 —
    # consistent with the flanking-point distance, which is also 0
    # there); side is a final determinism tiebreak.
    w_ord = W.partitionBy("user_id").orderBy("pos", "kind", "side")
    w_prev = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_next = w_ord.rowsBetween(W.currentRow, W.unboundedFollowing)
    # frame aggregates see frame rows, not the current row, so compute
    # per-side running state and select by the current row's side
    open_1 = F.sum(
        F.when(F.col("side") == 1, F.col("delta")).otherwise(0)
    ).over(w_prev)
    open_0 = F.sum(
        F.when(F.col("side") == 0, F.col("delta")).otherwise(0)
    ).over(w_prev)

    def marker_pos(side: int) -> Column:
        return F.when(
            (F.col("kind") == 1) & (F.col("side") == side), F.col("pos")
        )

    prev_m0 = F.last(marker_pos(0), True).over(w_prev)
    next_m0 = F.first(marker_pos(0), True).over(w_next)
    prev_m1 = F.last(marker_pos(1), True).over(w_prev)
    next_m1 = F.first(marker_pos(1), True).over(w_next)
    covered = F.when(F.col("side") == 0, open_1 > 0).otherwise(open_0 > 0)
    flank = F.when(
        F.col("side") == 0,
        F.least(
            F.coalesce(F.col("pos") - prev_m1, F.lit(_BIG)),
            F.coalesce(next_m1 - F.col("pos"), F.lit(_BIG)),
        ),
    ).otherwise(
        F.least(
            F.coalesce(F.col("pos") - prev_m0, F.lit(_BIG)),
            F.coalesce(next_m0 - F.col("pos"), F.lit(_BIG)),
        )
    )
    d = F.when(covered, F.lit(0)).otherwise(flank)
    markers = stream.withColumn("d", d).filter(F.col("kind") == 1)
    return markers.groupBy("user_id").agg(
        F.greatest(
            F.max(F.when(F.col("side") == 1, F.col("d"))),
            F.max(F.when(F.col("side") == 0, F.col("d"))),
        ).alias("lb")
    )


@query(
    "traj_hausdorff_segments_knn_2d",
    oracle=f"""
    {_SQL_PTS},
    qp AS (SELECT x, y, seq FROM p WHERE user_id = {_SK_Q}),
    qs AS (SELECT * FROM s WHERE user_id = {_SK_Q}),
    d1 AS (
        SELECT b.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM qp a JOIN s b ON b.user_id <> {_SK_Q} GROUP BY 1, 2
    ),
    h1 AS (SELECT user_id, MAX(nd) AS h FROM d1 GROUP BY 1),
    d2 AS (
        SELECT a.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM (SELECT * FROM p WHERE user_id <> {_SK_Q}) a
        JOIN qs b ON TRUE GROUP BY 1, 2
    ),
    h2 AS (SELECT user_id, MAX(nd) AS h FROM d2 GROUP BY 1)
    SELECT h1.user_id,
           ROUND(SQRT(GREATEST(h1.h, h2.h)) / 1e6, 6) AS hseg_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    ORDER BY GREATEST(h1.h, h2.h), h1.user_id
    LIMIT {_SK_K}
    """,
)
def traj_hausdorff_segments_knn_2d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """kNN SEARCH under the 2-D segment-based Hausdorff distance — the
    reference's flagship query at full fidelity [P §5]: the k corpus
    trajectories whose PATHS (segments, not samples) are closest to the
    query trajectory under H_seg = max of both directed max-min
    point-to-segment distances.

    Two-phase with a cost-based dispatch (the house pattern,
    trajectory.py ``traj_hausdorff_knn_2d``):

    - below ``SPARK_GRAFT_SEGKNN2D_PRUNE_MIN_EVENTS`` (default 10M)
      events, the single-pass engine: both directions as broadcast
      joins of the bounded query side, grouped minima, top-k — one scan,
      no prune overhead. The BIGINT kernel streams at codegen speed, so
      this branch measured 3.7 s vs the pruned branch's 19.6 s even at
      a 20x clone (2M events): the lb's union+sort window pass costs
      more than the exact arithmetic it avoids until the corpus (or
      |Q|) is far larger — hence the high cutoff;
    - above it: (1) an INTEGER 1-D lower bound per user from one
      sort-merge window pass on the y axis (``_hseg_lb`` — interval
      coverage zeroes the point-flank distance, so it soundly bounds
      the SEGMENT distance, which the point-based lb does not); the
      best c*k candidates get exact H_seg and their k-th value sets
      tau_k; (2) survivors with lb² <= tau_k get the exact engine;
      union, global top-k.  One scalar (tau_k) crosses to the driver.

    Exactness: d² doubles are produced from exact integers in identical
    operation order on both engines (pair-row argument), so the top-k
    set and the 6-decimal display hash-match.  Both branches pinned
    equal in pytest (single == pruned == DuckDB brute force)."""
    t = Tables(spark, sf_dir)
    cutoff = int(
        os.environ.get("SPARK_GRAFT_SEGKNN2D_PRUNE_MIN_EVENTS", "10000000")
    )
    from .trajectory import _events_count

    if _events_count(t, sf_dir) < cutoff:
        return _segknn_single(t)
    return _segknn_pruned(t)


def _segknn_out(h: DataFrame) -> DataFrame:
    return (
        h.orderBy("h2", "user_id")
        .limit(_SK_K)
        .select(
            "user_id",
            F.round(F.sqrt("h2") / 1e6, 6).alias("hseg_2d"),
        )
    )


def _segknn_single(t: Tables) -> DataFrame:
    return _segknn_out(_hseg_per_user(t))


def _segknn_pruned(t: Tables) -> DataFrame:
    lb = _hseg_lb(t).persist()
    cand_ids = (
        lb.orderBy("lb", "user_id").limit(_SK_C * _SK_K).select("user_id")
    )
    first = _hseg_per_user(t, ids=cand_ids).persist()
    n_first = first.count()
    tau_row = first.orderBy("h2").limit(_SK_K).agg(
        F.max("h2").alias("tau")
    ).head()
    tau = tau_row[0] if tau_row else None
    if tau is None:  # no corpus user besides the query user
        out = _segknn_out(first).localCheckpoint()
        first.unpersist()
        lb.unpersist()
        return out
    if n_first < _SK_K:
        # fewer than k candidates had exact values (e.g. single-point
        # users in the shortlist): tau would UNDER-estimate the k-th
        # distance and the prune would be lossy — refine everything.
        rest_ids = (
            lb.select("user_id")
            .join(F.broadcast(cand_ids), "user_id", "left_anti")
        )
    else:
        # lb <= tau_k cut in EXACT integer arithmetic: lb is BIGINT
        # micro-units (up to ~1.2e9, so lb^2 ~1.4e18 > 2^53 would round
        # in double and could prune a true candidate at an ulp
        # boundary).  tau is a driver scalar already, so derive the
        # integer radius isqrt(ceil(tau)) + 1 once: lb^2 <= tau implies
        # lb <= isqrt(ceil(tau)) + 1, making the cut conservative and
        # partitioning/engine-independent (house integer-membership
        # rule; over-includes at most one lb value, refined exactly).
        lb_cap = math.isqrt(int(math.ceil(tau))) + 1
        rest_ids = (
            lb.filter(F.col("lb") <= F.lit(lb_cap))
            .select("user_id")
            .join(F.broadcast(cand_ids), "user_id", "left_anti")
        )
    rest = _hseg_per_user(t, ids=rest_ids)
    out = _segknn_out(first.unionByName(rest)).localCheckpoint()
    first.unpersist()
    lb.unpersist()
    return out


# ---------------------------------------------------------------------------
# traj_hausdorff_segments_threshold_2d_idx — the dual-index read path
# ---------------------------------------------------------------------------

# micro-quantization pad: y = ROUND(value*1e6) can move a point by up to
# 0.5e-6 value units, so the manifest/cell band is widened by a full
# micro-unit to stay a NECESSARY condition for the integer predicate
_SK_PAD = 1e-6


@query(
    "traj_hausdorff_segments_threshold_2d_idx",
    oracle=f"""
    {_SQL_PTS},
    qp AS (SELECT x, y, seq FROM p WHERE user_id = {_SK_Q}),
    qs AS (SELECT * FROM s WHERE user_id = {_SK_Q}),
    cov AS (
        SELECT b.user_id, CAST(COUNT(DISTINCT a.seq) AS BIGINT) AS n_cov
        FROM qp a JOIN s b ON b.user_id <> {_SK_Q} AND ({_SQL_WITHIN})
        GROUP BY 1
    ),
    bad AS (
        SELECT DISTINCT a.user_id FROM p a
        WHERE a.user_id <> {_SK_Q}
          AND NOT EXISTS (SELECT 1 FROM qs b WHERE {_SQL_WITHIN})
    )
    SELECT cov.user_id FROM cov
    WHERE cov.n_cov = (SELECT COUNT(*) FROM qp)
      AND cov.user_id NOT IN (SELECT user_id FROM bad)
    """,
)
def traj_hausdorff_segments_threshold_2d_idx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The segment-Hausdorff threshold search answered from the
    PERSISTENT dual index — the reference's architecture [P §4] applied
    to its own flagship metric: (a) the GLOBAL index (per-user manifest:
    point count, value MBR, corpus t0) prunes candidate users, (b) the
    LOCAL data (cell-partitioned, value-sorted Parquet layout) is read
    with static PartitionFilters so only the query's value band is
    scanned, (c) the same integer-exact search engine
    (``_segthr_core``) refines.

    Prune chain, each step a NECESSARY condition for H_seg <= tau:
    1. manifest: d(point, path) >= |Δvalue| to the path's value span,
       and Q's path spans exactly [q_vmin, q_vmax], so any U point
       outside [q_vmin - tau, q_vmax + tau] puts h(U→Q) > tau — keep
       only users whose value MBR fits the band (padded one micro-unit
       for the y-quantization);
    2. the same band snapped to layout cells selects the partition
       directories — candidates' and the query's points all lie inside,
       so the pruned scan is COMPLETE for every survivor;
    3. the exact integer engine on the pruned scan.
    Same oracle as the full-scan row (``.._threshold_2d``): the hash
    proves the indexed path returns the identical answer while reading
    only the band's directories — at 100 TB the difference between a
    manifest lookup + a few partitions and a corpus scan."""
    import math

    from .trajectory import (
        _write_cell_layout,
        _write_user_manifest,
        _LAYOUT_CELL,
    )

    man_path = _write_user_manifest(spark, sf_dir)
    lay_path = _write_cell_layout(spark, sf_dir)
    man = spark.read.parquet(man_path)
    qrow = man.filter(F.col("user_id") == _SK_Q).head()
    tau = _SK_TAU_U / 1e6
    qlo = qrow["vmin"] - tau - _SK_PAD
    qhi = qrow["vmax"] + tau + _SK_PAD
    lo_cell = math.floor(qlo / _LAYOUT_CELL)
    hi_cell = math.floor(qhi / _LAYOUT_CELL)
    cands = man.filter(
        (F.col("user_id") == _SK_Q)
        | ((F.col("vmin") >= qlo) & (F.col("vmax") <= qhi))
    ).select("user_id")
    ev = spark.read.parquet(lay_path).filter(
        (F.col("cell") >= lo_cell) & (F.col("cell") <= hi_cell)
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.join(F.broadcast(cands), "user_id", "left_semi")
        .select(
            "user_id",
            F.row_number().over(w).alias("seq"),
            F.expr(
                f"(unix_micros(ts) - {int(qrow['t0'])}) div 86400"
            ).alias("x"),
            F.round(F.col("value") * 1e6).cast("bigint").alias("y"),
        )
    )
    return _segthr_core(p)


# ---------------------------------------------------------------------------
# traj_hausdorff_segments_knn_2d_idx — kNN from the global index
# ---------------------------------------------------------------------------


@query(
    "traj_hausdorff_segments_knn_2d_idx",
    oracle=f"""
    {_SQL_PTS},
    qp AS (SELECT x, y, seq FROM p WHERE user_id = {_SK_Q}),
    qs AS (SELECT * FROM s WHERE user_id = {_SK_Q}),
    d1 AS (
        SELECT b.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM qp a JOIN s b ON b.user_id <> {_SK_Q} GROUP BY 1, 2
    ),
    h1 AS (SELECT user_id, MAX(nd) AS h FROM d1 GROUP BY 1),
    d2 AS (
        SELECT a.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM (SELECT * FROM p WHERE user_id <> {_SK_Q}) a
        JOIN qs b ON TRUE GROUP BY 1, 2
    ),
    h2 AS (SELECT user_id, MAX(nd) AS h FROM d2 GROUP BY 1)
    SELECT h1.user_id,
           ROUND(SQRT(GREATEST(h1.h, h2.h)) / 1e6, 6) AS hseg_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    ORDER BY GREATEST(h1.h, h2.h), h1.user_id
    LIMIT {_SK_K}
    """,
)
def traj_hausdorff_segments_knn_2d_idx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Segment-Hausdorff kNN answered from the GLOBAL INDEX — the
    reference's actual kNN algorithm shape [P §5.2]: rank candidates by
    an index-only lower bound, refine the best c·k exactly, close the
    radius with tau_k, and refine only the survivors.

    The lower bound reads NO event data: for user MBRs [uvmin, uvmax]
    and query span [qvmin, qvmax] (one manifest scan),
    lb(U) = max(|uvmin − qvmin|, |uvmax − qvmax|) — the extreme point of
    either side is at least that far (value-axis projection) from the
    other side's entire path. Exact refinement reads the cell layout
    restricted by PartitionFilters to the band spanning the candidate
    MBRs ∪ Q (complete for every candidate), through the shared
    ``_hseg_per_user_from`` engine. The prune compares in value units
    padded one micro-unit for the y quantization — conservative, so
    lossless; pytest pins idx == single-pass == brute force.

    Same oracle as the full-scan kNN: the hash proves the indexed path
    identical. At 100 TB phase 1 is a manifest scan (bytes per
    trajectory, not per point) and phase 2 reads only the value bands
    the shortlist occupies."""
    import math

    from .trajectory import (
        _write_cell_layout,
        _write_user_manifest,
        _LAYOUT_CELL,
    )

    man_path = _write_user_manifest(spark, sf_dir)
    lay_path = _write_cell_layout(spark, sf_dir)
    man = spark.read.parquet(man_path)
    qrow = man.filter(F.col("user_id") == _SK_Q).head()
    t0 = int(qrow["t0"])
    lb = (
        man.filter(F.col("user_id") != _SK_Q)
        .select(
            "user_id",
            "vmin",
            "vmax",
            F.greatest(
                F.abs(F.col("vmin") - F.lit(qrow["vmin"])),
                F.abs(F.col("vmax") - F.lit(qrow["vmax"])),
            ).alias("lb"),
        )
        .persist()
    )

    def exact_for(ids: DataFrame) -> DataFrame:
        """Exact H_seg for the id set, from the partition-pruned layout
        band covering the ids' MBRs and the query span."""
        band = ids.join(lb, "user_id").agg(
            F.min("vmin").alias("lo"), F.max("vmax").alias("hi")
        ).head()
        if band["lo"] is None:
            lo, hi = qrow["vmin"], qrow["vmax"]
        else:
            lo = min(band["lo"], qrow["vmin"])
            hi = max(band["hi"], qrow["vmax"])
        lo_cell = math.floor(lo / _LAYOUT_CELL)
        hi_cell = math.floor(hi / _LAYOUT_CELL)
        ev = spark.read.parquet(lay_path).filter(
            (F.col("cell") >= lo_cell) & (F.col("cell") <= hi_cell)
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        p = ev.select(
            "user_id",
            F.row_number().over(w).alias("seq"),
            F.expr(f"(unix_micros(ts) - {t0}) div 86400").alias("x"),
            F.round(F.col("value") * 1e6).cast("bigint").alias("y"),
        )
        return _hseg_per_user_from(p, ids=ids)

    cand_ids = lb.orderBy("lb", "user_id").limit(_SK_C * _SK_K).select(
        "user_id"
    )
    first = exact_for(cand_ids).persist()
    n_first = first.count()
    tau_row = first.orderBy("h2").limit(_SK_K).agg(
        F.max("h2").alias("tau")
    ).head()
    tau = tau_row[0] if tau_row else None
    if tau is None:
        out = _segknn_out(first).localCheckpoint()
        first.unpersist()
        lb.unpersist()
        return out
    if n_first < _SK_K:
        rest_ids = lb.select("user_id").join(
            F.broadcast(cand_ids), "user_id", "left_anti"
        )
    else:
        # lb is in raw value units; tau in micro² — compare in units
        # with the quantization pad so the cut stays conservative
        tau_units = math.sqrt(tau) / 1e6 + _SK_PAD
        rest_ids = (
            lb.filter(F.col("lb") <= tau_units)
            .select("user_id")
            .join(F.broadcast(cand_ids), "user_id", "left_anti")
        )
    rest = exact_for(rest_ids)
    out = _segknn_out(first.unionByName(rest)).localCheckpoint()
    first.unpersist()
    lb.unpersist()
    return out


# ---------------------------------------------------------------------------
# rel_bloom_runtime — Spark's runtime Bloom-filter join, exercised
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    # the feature's gate is sized for clusters (application side >10GB);
    # at fixture scale we drop that floor to 0 and disable broadcast so
    # the shuffle join actually materializes — the injected plan is the
    # SAME one a 100 TB run gets for free with default thresholds
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join under test: selective orders slice filtering the
    lineitem fact — the classic star-schema shape where a runtime Bloom
    filter pushed into the fact scan skips non-qualifying row groups
    before the shuffle."""
    t = Tables(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    li = t.lineitem.select("l_orderkey", "l_quantity")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


class _bloom_confs:
    """Save/set/restore the session confs that force the runtime Bloom
    filter at fixture scale (single-session contract, same pattern as
    the shuffle-width loops)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = {}
        for k, v in _BLOOM_CONFS.items():
            try:
                self.old[k] = self.spark.conf.get(k)
            except Exception:
                self.old[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


@query(
    "rel_bloom_runtime",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def rel_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's RUNTIME BLOOM-FILTER JOIN, actually exercised (the
    round-2 'unshowable at fixture scale' gap): the optimizer builds a
    bloom_filter_agg over the selective orders slice and injects
    might_contain(xxhash64(l_orderkey)) into the lineitem SCAN, so fact
    rows failing the filter die before the shuffle — semi-join
    reduction without a broadcast, the 100 TB star-join workhorse.

    The feature's gate is sized for clusters (application side > 10 GB
    scan), so the builder pins the session confs that let the same
    injected plan materialize at fixture scale (dropped floor, no
    broadcast), executes the join INSIDE that conf window
    (localCheckpoint — the returned DataFrame is the materialized
    result, ~1 row), and restores the session. The oracle is the plain
    join: the Bloom filter is sound (no false negatives at the join —
    might_contain only skips rows that cannot match), so the result is
    bit-identical; the injected bloom_filter_agg/might_contain pair is
    pinned in tests/test_plans.py. Integer sum — no float anywhere."""
    with _bloom_confs(spark):
        out = _bloom_join(spark, sf_dir).localCheckpoint()
    return out


# ---------------------------------------------------------------------------
# traj_hausdorff_segments_knn_batch_2d — the batched workload shape
# ---------------------------------------------------------------------------

_SKB_QIDS = (1, 2, 3)


@query(
    "traj_hausdorff_segments_knn_batch_2d",
    oracle=f"""
    {_SQL_PTS},
    qp AS (SELECT user_id AS qid, seq, x, y FROM p
           WHERE user_id IN {_SKB_QIDS}),
    qs AS (SELECT user_id AS qid, x1, y1, x2, y2 FROM s
           WHERE user_id IN {_SKB_QIDS}),
    d1 AS (
        SELECT a.qid, b.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM qp a JOIN s b ON b.user_id <> a.qid
        GROUP BY 1, 2, 3
    ),
    h1 AS (SELECT qid, user_id, MAX(nd) AS h FROM d1 GROUP BY 1, 2),
    d2 AS (
        SELECT b.qid, a.user_id, a.seq, MIN({_SQL_D2}) AS nd
        FROM p a JOIN qs b ON a.user_id <> b.qid
        GROUP BY 1, 2, 3
    ),
    h2 AS (SELECT qid, user_id, MAX(nd) AS h FROM d2 GROUP BY 1, 2)
    SELECT h1.qid, h1.user_id,
           ROUND(SQRT(GREATEST(h1.h, h2.h)) / 1e6, 6) AS hseg_2d
    FROM h1 JOIN h2 ON h1.qid = h2.qid AND h1.user_id = h2.user_id
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY h1.qid
        ORDER BY GREATEST(h1.h, h2.h), h1.user_id) <= {_SK_K}
    """,
)
def traj_hausdorff_segments_knn_batch_2d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's BENCHMARK WORKLOAD shape (R17) at the flagship
    metric: a batch of query trajectories answered in ONE shared pass —
    top-10 segment-Hausdorff neighbors per query.

    The single-query engine gains a qid dimension: the (tiny) batch of
    query point/segment sets broadcasts ONCE, the corpus streams ONCE,
    and both directed maxima for every (query, user) cell come out of
    the same two grouped aggregations. In-flight volume is
    E x Σ|Q_i| — nq times the single probe, against nq full corpus
    scans for nq separate runs; per-query top-k is a rank window, not a
    global sort. Exactness inherits the single-query argument (BIGINT
    kernel, identical-op-order doubles, (h², user) tie order)."""
    t = Tables(spark, sf_dir)
    p = _pts_int(t)
    q = p.where(F.col("user_id").isin(*_SKB_QIDS)).localCheckpoint()
    qp = q.select(
        F.col("user_id").alias("qid"),
        F.col("seq").alias("qseq"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    qs = _segs_int(q).select(
        F.col("user_id").alias("qid"), "x1", "y1", "x2", "y2"
    )
    segs = _segs_int(p)
    h1 = (
        segs.join(F.broadcast(qp), F.col("user_id") != F.col("qid"))
        .select(
            "qid", "user_id", "qseq",
            _seg_d2(F.col("qx"), F.col("qy")).alias("d2"),
        )
        .groupBy("qid", "user_id", "qseq")
        .agg(F.min("d2").alias("nd"))
        .groupBy("qid", "user_id")
        .agg(F.max("nd").alias("h1"))
    )
    h2 = (
        p.join(F.broadcast(qs), F.col("user_id") != F.col("qid"))
        .select(
            "qid", "user_id", "seq",
            _seg_d2(F.col("x"), F.col("y")).alias("d2"),
        )
        .groupBy("qid", "user_id", "seq")
        .agg(F.min("d2").alias("nd"))
        .groupBy("qid", "user_id")
        .agg(F.max("nd").alias("h2d"))
    )
    h = F.greatest("h1", "h2d")
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(h, "user_id")
    )
    return (
        h1.join(h2, ["qid", "user_id"])
        .withColumn("rn", rn)
        .where(F.col("rn") <= _SK_K)
        .select(
            "qid",
            "user_id",
            F.round(F.sqrt(h) / 1e6, 6).alias("hseg_2d"),
        )
    )


# ---------------------------------------------------------------------------
# traj_range_window_2d_idx — 2-D grid layout, both axes pruned
# ---------------------------------------------------------------------------

_GW_EPS = 2.0  # (day, value)-plane radius, as traj_range_query_2d
_GW_D_LO = 10.0  # probe time window: relative days [10, 13)
_GW_D_HI = 13.0


def _grid_layout_path(sf_dir: str) -> str:
    from ..sources.readers import staging_dir

    return os.path.join(staging_dir(sf_dir, "grid_layout"), "events")


def _write_grid_layout(spark: SparkSession, sf_dir: str) -> str:
    """Events as a TWO-dimensional partition grid — (epoch-day, value
    band) directories, value-sorted within — the reference's 2-D STR
    leaf layout [P §4.2] where the existing ``_write_cell_layout``
    partitions the value axis only. Day keys are ABSOLUTE epoch days
    (no t0 dependence, so the layout is incrementally appendable: a new
    day of data is a new directory, never a rewrite)."""
    from ..sources.readers import (
        layout_current,
        stamp_layout,
        write_partitioned,
    )
    from .trajectory import _LAYOUT_CELL

    path = _grid_layout_path(sf_dir)
    if layout_current(path, sf_dir):
        return path
    t = Tables(spark, sf_dir)
    write_partitioned(
        t.events.withColumn(
            "dcell", F.expr("unix_micros(ts) div 86400000000")
        ).withColumn(
            "vcell", F.floor(F.col("value") / F.lit(_LAYOUT_CELL))
        ),
        path,
        ["dcell", "vcell"],
        sort_cols=["value"],
    )
    stamp_layout(path, sf_dir)
    return path


@query(
    "traj_range_window_2d_idx",
    oracle=f"""
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
    q AS (SELECT x AS qx, y AS qy FROM pts
          WHERE user_id = 1 AND x >= {_GW_D_LO} AND x < {_GW_D_HI})
    SELECT p.user_id, p.x, p.y, ROUND(MIN(
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy))
           ), 6) AS min_dist
    FROM pts p CROSS JOIN q
    WHERE p.user_id <> 1
    GROUP BY p.user_id, p.x, p.y
    HAVING MIN(SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)))
           <= {_GW_EPS}
    """,
)
def traj_range_window_2d_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED circleRange from a TWO-dimensional partition grid: all
    points of other users within eps of the query trajectory's RECENT
    window (relative days [10, 13)) — the monitoring probe ("who came
    near the route in the last N days"), answered with BOTH axes
    pruned at the directory level.

    The layout partitions on (absolute epoch-day, value band); the
    probe window ±eps snaps to day directories and the probe's value
    span ±eps to band directories, so Catalyst's PartitionFilters cut
    the scan to a time-window × value-band RECTANGLE of the grid — the
    reference's 2-D global-index pruning [P §4.2] made persistent,
    where ``traj_range_query_2d_pruned`` prunes the value axis only.
    Lossless: an answer is within eps (Euclidean) of a probe point, so
    its day is within the padded window and its value within the padded
    band. Day keys are absolute, so ingest appends new directories
    without rewriting (the ``stream_layout_ingest`` compatibility
    property). Exact refine = the shared ``_range_core`` engine."""
    import math

    from .trajectory import _LAYOUT_CELL, _range_core

    t = Tables(spark, sf_dir)
    path = _write_grid_layout(spark, sf_dir)
    t0 = t.events.agg(F.min(F.unix_micros("ts"))).head()[0]
    band = (
        t.events.filter(
            (F.col("user_id") == 1)
            & (F.unix_micros("ts") >= t0 + int(_GW_D_LO * 86400000000))
            & (F.unix_micros("ts") < t0 + int(_GW_D_HI * 86400000000))
        )
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .head()
    )
    day0 = t0 // 86400000000
    d_lo = int(day0 + math.floor(_GW_D_LO - _GW_EPS))
    d_hi = int(day0 + math.floor(_GW_D_HI + _GW_EPS) + 1)
    if band is None or band["lo"] is None:
        # no probe points in the window: the answer is empty — keep the
        # same plan shape with an empty partition range (reads nothing)
        v_lo, v_hi = 0, -1
    else:
        v_lo = math.floor((band["lo"] - _GW_EPS) / _LAYOUT_CELL)
        v_hi = math.floor((band["hi"] + _GW_EPS) / _LAYOUT_CELL)
    ev = spark.read.parquet(path).filter(
        (F.col("dcell") >= d_lo)
        & (F.col("dcell") <= d_hi)
        & (F.col("vcell") >= v_lo)
        & (F.col("vcell") <= v_hi)
    )
    pts = ev.select(
        "user_id",
        ((F.unix_micros("ts") - F.lit(t0)) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    q_window = (F.col("x") >= _GW_D_LO) & (F.col("x") < _GW_D_HI)
    pts = pts.filter((F.col("user_id") != 1) | q_window)
    return _range_core(pts, _GW_EPS)


# ---------------------------------------------------------------------------
# rel_table_stats — ANALYZE TABLE as a first-class query
# ---------------------------------------------------------------------------

_TS_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_orderkey",
            "l_suppkey")


@query(
    "rel_table_stats",
    oracle="SELECT * FROM (" + " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS col_min,
               ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS col_max
        FROM lineitem
        """
        for c in _TS_COLS
    ) + ")",
)
def rel_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE as a registered query: per-column row/null/distinct
    counts and min/max over the fact table — the statistics a cost-based
    optimizer (and every capacity plan) feeds on. The reference's
    engine carries per-partition MBR statistics [P §4.1]; this is the
    relational generalization, and the same job a lakehouse runs as
    ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS.

    ONE corpus pass: all 5 columns' aggregates ride one hash aggregate
    (no shuffle per column — Spark computes the distinct counts as
    expand+aggregate internally), then the wide row unpivots to the
    long (col, stats) form driver-side free. Exact COUNT(DISTINCT)
    (not approx — the oracle must hash-match); min/max displayed at 6
    decimals, values exact."""
    t = Tables(spark, sf_dir)
    aggs = []
    for c in _TS_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    wide = t.lineitem.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__dist, {c}__min, {c}__max"
        for c in _TS_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_TS_COLS)}, {stack_expr}) AS "
            "(col, n_rows, n_null, n_distinct, col_min, col_max)"
        )
    )


# ---------------------------------------------------------------------------
# rel_view_maintenance — signed-delta incremental view maintenance
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "1997-01-01"


@query(
    "rel_view_maintenance",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0,
                 6) AS total_spend
    FROM orders
    WHERE NOT (o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
               AND o_orderstatus = 'F')
    GROUP BY o_custkey
    HAVING COUNT(*) > 0
    """,
)
def rel_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE by signed deltas — the algebra
    behind every materialized-aggregate refresh: a per-customer
    (order count, spend) view built over the pre-cutoff base is
    MAINTAINED, not recomputed, when a change batch arrives —
    insertions (orders from the cutoff on) carry weight +1,
    retractions (pre-cutoff 'F' orders being cancelled) carry −1; the
    delta aggregates once and FULL-OUTER-merges into the view with
    coalesced additive columns, groups whose count reaches zero drop
    out.

    The oracle recomputes the final view directly from the would-be
    table state — the hash proves maintenance == recomputation, which
    is the entire point of IVM. At 100 TB the base view never rescans:
    refresh cost is O(|delta| + |touched groups|), and on a base
    bucketed by the group key the merge join co-locates. Spend in
    integer cents (exact, order-free); one display divide."""
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")
    base = t.orders.filter(F.col("o_orderdate") < cutoff)
    view0 = base.groupBy("o_custkey").agg(
        F.count("*").alias("n"), F.sum(cents).alias("c")
    )
    inserts = t.orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_custkey", F.lit(1).alias("w"), cents.alias("cts")
    )
    retracts = base.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", F.lit(-1).alias("w"), cents.alias("cts")
    )
    delta = (
        inserts.unionByName(retracts)
        .groupBy("o_custkey")
        .agg(
            F.sum("w").alias("dn"),
            F.sum(F.col("w") * F.col("cts")).alias("dc"),
        )
    )
    merged = view0.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("c", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
            "c_total"
        ),
    )
    return merged.filter(F.col("n_orders") > 0).select(
        "o_custkey",
        "n_orders",
        F.round(F.col("c_total") / 100.0, 6).alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# sim_knn_batch — batched vector-query workload
# ---------------------------------------------------------------------------

_SKV_QIDS = (0, 1, 2)
_SKV_K = 10


@query(
    "sim_knn_batch",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, i, v FROM ev
          WHERE vec_id IN {_SKV_QIDS}),
    scored AS (
        SELECT q.q_id, e.vec_id,
               SUM(e.v * q.v)
               / (SQRT(SUM(e.v * e.v)) * SQRT(SUM(q.v * q.v))) AS cs
        FROM ev e JOIN q ON e.i = q.i AND e.vec_id <> q.q_id
        GROUP BY 1, 2
    )
    SELECT q_id, vec_id, ROUND(cs, 6) + 0.0 AS cos_sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cs DESC, vec_id) <= {_SKV_K}
    """,
)
def sim_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN-benchmark WORKLOAD shape for vectors (the embedding twin
    of ``traj_hausdorff_segments_knn_batch_2d``): a batch of query
    vectors answered in ONE corpus pass — the query rows broadcast with
    a q_id dimension, every (corpus, query) cosine from one JVM-side
    fold, per-query top-k by rank window. At 100 TB an nq-query batch
    costs one corpus stream instead of nq; this is how recall/latency
    sweeps and bulk retrieval (RAG indexing joins) actually run."""
    from pyspark.sql import Window as W

    from ..functions.vector import cosine
    from .similarity import _emb

    t = Tables(spark, sf_dir)
    emb = _emb(t)
    qs = emb.filter(F.col("vec_id").isin(*_SKV_QIDS)).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(qs), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("emb"), F.col("q_emb")).alias("cos_raw"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), "vec_id")
    )
    return (
        scored.withColumn("rn", rn)
        .where(F.col("rn") <= _SKV_K)
        .select(
            "q_id", "vec_id", (F.round("cos_raw", 6) + 0.0).alias("cos_sim")
        )
    )


# ---------------------------------------------------------------------------
# traj_map_match — nearest-segment assignment to the reference route
# ---------------------------------------------------------------------------

_MM_TAU_U = 25_000_000  # match radius (micro-units), as the threshold tier


@query(
    "traj_map_match",
    oracle=f"""
    {_SQL_PTS},
    qs AS (SELECT * FROM s WHERE user_id = {_SK_Q}),
    nearest AS (
        SELECT a.user_id, a.seq, b.seq AS qseg, {_SQL_D2} AS d2
        FROM (SELECT * FROM p WHERE user_id <> {_SK_Q}) a
        JOIN qs b ON TRUE
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY a.user_id, a.seq
            ORDER BY {_SQL_D2}, b.seq) = 1
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) FILTER (
               d2 <= CAST({_MM_TAU_U} AS DOUBLE) * {_MM_TAU_U}
           ) AS BIGINT) AS n_matched,
           ROUND(COUNT(*) FILTER (
               d2 <= CAST({_MM_TAU_U} AS DOUBLE) * {_MM_TAU_U}
           ) * 1.0 / COUNT(*), 6) AS match_frac,
           CAST(MIN(qseg) FILTER (
               d2 <= CAST({_MM_TAU_U} AS DOUBLE) * {_MM_TAU_U}
           ) AS BIGINT) AS first_seg
    FROM nearest
    GROUP BY user_id
    """,
)
def traj_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-MATCHING summary against the reference route: every point of
    every other trajectory snaps to its nearest SEGMENT of the query
    path (argmin of the exact point-to-segment d², segment-seq
    tie-break), and the per-user summary reports how much of the
    trajectory rides the route — point count, within-tau matched count
    and fraction, and the first (lowest-seq) matched route segment.
    The simplified (HMM-free) nearest-segment form is the workhorse
    first stage of every GPS map-matcher; the full Viterbi layer is a
    reweighting of exactly these candidate assignments.

    Shape: the route's ~65 segments broadcast; each corpus point
    produces 65 candidate rows JVM-side, one row_number argmin per
    point (window on the natural (user, seq) key), one per-user hash
    agg. Linear in corpus points; no shuffle beyond the window and
    agg, both on user-keyed partitions. d² doubles are engine-identical
    (pair-row argument), counts integer-exact, one display divide."""
    t = Tables(spark, sf_dir)
    p = _pts_int(t)
    q = p.where(F.col("user_id") == _SK_Q).localCheckpoint()
    qs = _segs_int(q).select(
        F.col("seq").alias("qseg"), "x1", "y1", "x2", "y2"
    )
    pts = p.where(F.col("user_id") != _SK_Q)
    cand = pts.join(F.broadcast(qs)).select(
        "user_id",
        "seq",
        "qseg",
        _seg_d2(F.col("x"), F.col("y")).alias("d2"),
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "seq").orderBy("d2", "qseg")
    )
    nearest = cand.withColumn("rn", rn).where(F.col("rn") == 1)
    t2 = F.lit(float(_MM_TAU_U)) * _MM_TAU_U
    matched = F.col("d2") <= t2
    return nearest.groupBy("user_id").agg(
        F.count("*").alias("n_points"),
        F.count(F.when(matched, 1)).alias("n_matched"),
        F.round(
            F.count(F.when(matched, 1)) * 1.0 / F.count("*"), 6
        ).alias("match_frac"),
        F.min(F.when(matched, F.col("qseg"))).alias("first_seg"),
    )


# ---------------------------------------------------------------------------
# traj_search_report — the flagship surface composed into one row
# ---------------------------------------------------------------------------


def _search_report_oracle() -> str:
    # lazy (resolved after load_all): composed from the registered
    # oracles of the three segment-search tiers
    from ..registry import ORACLES

    knn = ORACLES["traj_hausdorff_segments_knn_2d"]
    thr = ORACLES["traj_hausdorff_segments_threshold_2d"]
    rng = ORACLES["traj_range_segments_2d"]
    return f"""
    SELECT (SELECT ROUND(MAX(hseg_2d), 6) FROM ({knn}) k) AS knn_radius,
           (SELECT COUNT(*) FROM ({thr}) t) AS n_within_tau,
           (SELECT COUNT(*) FROM ({rng}) r) AS n_range_segments
    """


@query("traj_search_report", oracle=_search_report_oracle)
def traj_search_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query user's similarity DASHBOARD in one row — the three
    segment-geometry search tiers composed from their REGISTERED
    builders (and the oracle from their registered oracle SQL, so the
    evaluated plans are the shipped plans, the ``sim_ann_recall``
    discipline): the kNN radius (k-th segment-Hausdorff distance), the
    population within tau, and the eps-range segment count. This is
    the summary a monitoring job materializes per query entity; cost =
    the three underlying searches, each already scale-shaped."""
    from ..registry import QUERIES

    knn = (
        QUERIES["traj_hausdorff_segments_knn_2d"](spark, sf_dir)
        .agg(F.round(F.max("hseg_2d"), 6).alias("knn_radius"))
    )
    thr = (
        QUERIES["traj_hausdorff_segments_threshold_2d"](spark, sf_dir)
        .agg(F.count("*").alias("n_within_tau"))
    )
    rng = (
        QUERIES["traj_range_segments_2d"](spark, sf_dir)
        .agg(F.count("*").alias("n_range_segments"))
    )
    return knn.join(F.broadcast(thr)).join(F.broadcast(rng))


# ---------------------------------------------------------------------------
# sink_csv_roundtrip — the CSV write surface under oracle check
# ---------------------------------------------------------------------------


@query(
    "sink_csv_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV WRITE surface under oracle check (the parquet sinks'
    ``sink_partitioned_roundtrip`` discipline, for the interchange
    format every export still speaks): a projected lineitem slice is
    written as headered CSV (prices pre-quantized to integer CENTS so
    the text round-trip is exact — float→decimal-text→float is the
    classic CSV corruption vector, integers never lose), read back
    with an explicit schema (no inferSchema scan), and aggregated; the
    oracle aggregates the source table, so the hash proves
    write → parse → aggregate lossless."""
    import shutil

    from ..sources.readers import staging_dir

    t = Tables(spark, sf_dir)
    out = os.path.join(staging_dir(sf_dir, "csv_sink"), "lineitem")
    shutil.rmtree(out, ignore_errors=True)
    (
        t.lineitem.select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out)
    )
    back = (
        spark.read.schema("l_returnflag string, l_linestatus string, "
                          "cents bigint")
        .option("header", "true")
        .csv(out)
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("cents").alias("cents")
    )
