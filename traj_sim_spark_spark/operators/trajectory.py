"""J. Trajectory operators (SURVEY.md §2.2-J) — the reference's core.

traj-sim-spark's entire query surface is threshold/kNN similarity search
over trajectories (R8/R9) with Hausdorff / discrete Fréchet / DTW kernels
(R12-R14), over a segment-decomposed, spatially partitioned index
[P §3-§5]. Re-expression here, per SURVEY.md §4:

- assembly (R2) and segmentation (R3) are window/collect_list queries;
- Hausdorff is **order-insensitive**, so both the pair kernel and the kNN
  search are pure SQL (join + groupBy min + max) — fully oracle-checked;
- Fréchet/DTW are order-sensitive DP kernels → ``applyInPandas`` over
  candidate pairs (WEAK rows: rows-only driver check, property-tested in
  pytest against naive NumPy references);
- the two-phase prune-then-refine idiom (R15) appears in the Fréchet kNN:
  a cheap SQL Hausdorff lower bound gates the expensive DP kernel, since
  Fréchet >= Hausdorff on every pair [P §5.1].

Trajectories derive from events: traj_id=user_id, order=(ts, event_id),
coordinate=value (1-D) — FIXTURES.md.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import kernels
from ..registry import query
from . import dp_list_sql as _DL
from ..sources.readers import staging_dir, write_partitioned
from ..tables import Tables

_QUERY_USER = 1  # the fixtures' query trajectory (exists at every sf)


@query(
    "traj_assemble",
    oracle="""
    SELECT user_id, COUNT(*) AS n_points,
           string_agg(format('{:.2f}', value), ','
                      ORDER BY ts, event_id) AS vals
    FROM events
    GROUP BY user_id
    """,
)
def traj_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: per-user ordered point sequence (trajectory assembly).

    The assembled array is the engine's analog of the reference's
    ``RDD[(traj_id, Array[Point])]`` store; for the oracle the sequence is
    fingerprinted as a comma-joined fixed-format string (values are exact
    2-decimal doubles) so ordering is hash-checked cross-engine."""
    t = Tables(spark, sf_dir)
    pts = t.user_points()
    return (
        pts.groupBy("user_id")
        .agg(
            F.count("*").alias("n_points"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seq", "value"))
                    ),
                    lambda s: F.format_string("%.2f", s.value),
                ),
            ).alias("vals"),
        )
    )


@query(
    "traj_segments",
    oracle="""
    WITH pts AS (
        SELECT user_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events
    )
    SELECT user_id, CAST(seq AS INTEGER) AS seq, value AS v0,
           LEAD(value) OVER w AS v1,
           LEAD(ts_us) OVER w - ts_us AS dt_us
    FROM pts
    WINDOW w AS (PARTITION BY user_id ORDER BY seq)
    QUALIFY LEAD(value) OVER w IS NOT NULL
    """,
)
def traj_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: segment decomposition — consecutive point pairs via lead().

    The reference flatMaps each trajectory into (LineSegment, TrajMeta)
    [P §4.1]; here a single window pass emits (user, seq, v0, v1, dt) with
    one shuffle on user_id and no array materialization."""
    t = Tables(spark, sf_dir)
    pts = t.user_points().withColumn("ts_us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("seq")
    return (
        pts.select(
            "user_id",
            "seq",
            F.col("value").alias("v0"),
            F.lead("value").over(w).alias("v1"),
            (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
        )
        .filter(F.col("v1").isNotNull())
    )


# ---------------------------------------------------------------------------
# Hausdorff — order-insensitive, hence pure SQL (the R12 "flagship trick")
# ---------------------------------------------------------------------------

_HAUSDORFF_PAIR_ORACLE = """
    WITH a AS (SELECT DISTINCT value FROM events WHERE user_id = 1),
         b AS (SELECT DISTINCT value FROM events WHERE user_id = 2),
    dab AS (SELECT a.value av, MIN(ABS(a.value - b.value)) md
            FROM a CROSS JOIN b GROUP BY a.value),
    dba AS (SELECT b.value bv, MIN(ABS(a.value - b.value)) md
            FROM a CROSS JOIN b GROUP BY b.value)
    SELECT ROUND((SELECT MAX(md) FROM dab), 6) AS h_ab,
           ROUND((SELECT MAX(md) FROM dba), 6) AS h_ba,
           ROUND(GREATEST((SELECT MAX(md) FROM dab),
                          (SELECT MAX(md) FROM dba)), 6) AS hausdorff
"""


@query("traj_hausdorff_pair", oracle=_HAUSDORFF_PAIR_ORACLE)
def traj_hausdorff_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12 between users 1 and 2, entirely in SQL.

    H(A,B)=max(h(A,B),h(B,A)), h(A,B)=max_a min_b |a-b| — a join +
    two-level aggregation, because Hausdorff treats trajectories as point
    SETS. Duplicate coordinates are collapsed first (distances are
    invariant under multiplicity)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    a = ev.filter(F.col("user_id") == 1).select("value").distinct()
    b = (
        ev.filter(F.col("user_id") == 2)
        .select(F.col("value").alias("bv"))
        .distinct()
    )
    d = a.crossJoin(F.broadcast(b)).select(
        "value", "bv", F.abs(F.col("value") - F.col("bv")).alias("d")
    )
    h_ab = d.groupBy("value").agg(F.min("d").alias("md")).agg(
        F.max("md").alias("h_ab")
    )
    h_ba = d.groupBy("bv").agg(F.min("d").alias("md")).agg(
        F.max("md").alias("h_ba")
    )
    return h_ab.crossJoin(h_ba).select(
        F.round("h_ab", 6).alias("h_ab"),
        F.round("h_ba", 6).alias("h_ba"),
        F.round(F.greatest("h_ab", "h_ba"), 6).alias("hausdorff"),
    )


@query(
    "traj_hausdorff_knn",
    oracle="""
    WITH q AS (SELECT DISTINCT value AS qv FROM events WHERE user_id = 1),
    pairs AS (
        SELECT e.user_id, q.qv, e.value AS ev_val,
               ABS(q.qv - e.value) AS d
        FROM events e CROSS JOIN q
        WHERE e.user_id <> 1
    ),
    dqu AS (SELECT user_id, MAX(md) AS h1 FROM (
                SELECT user_id, qv, MIN(d) AS md FROM pairs
                GROUP BY user_id, qv)
            GROUP BY user_id),
    duq AS (SELECT user_id, MAX(md) AS h2 FROM (
                SELECT user_id, ev_val, MIN(d) AS md FROM pairs
                GROUP BY user_id, ev_val)
            GROUP BY user_id)
    SELECT dqu.user_id,
           ROUND(GREATEST(h1, h2), 6) AS hausdorff
    FROM dqu JOIN duq ON dqu.user_id = duq.user_id
    ORDER BY GREATEST(h1, h2), dqu.user_id
    LIMIT 10
    """,
)
def traj_hausdorff_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 under Hausdorff: the 10 users most similar to the query user,
    exact, as ONE declarative query.

    The reference's driver-orchestrated global-prune -> local R-tree kNN ->
    c*k refine loop [P §5] collapses into: broadcast the query point set,
    one pass over the events table computing both directed distances via
    two grouped minima, and a TakeOrderedAndProject top-k. No driver
    round-trips, no collect; scales with the events table."""
    t = Tables(spark, sf_dir)
    return (
        _hausdorff_lb(t, _QUERY_USER)
        .orderBy("lb", "user_id")
        .limit(10)
        .select("user_id", F.round("lb", 6).alias("hausdorff"))
    )


# ---------------------------------------------------------------------------
# Fréchet / DTW — order-sensitive DP kernels via applyInPandas (WEAK rows)
# ---------------------------------------------------------------------------


def _paired_series(
    t: Tables, query_user: int, ids: DataFrame | None = None
) -> DataFrame:
    """Candidate (user, query) series pairs: assembled value arrays joined
    against the broadcast query array (reference: dual-store fetch, R11).

    ``ids`` (a user_id DataFrame) pushes the candidate filter BELOW the
    assembly: the semi-join runs on raw point rows, so the collect_list
    shuffle moves only candidate trajectories — the reference's
    PartitionPruningRDD fetch [P §4.3] as predicate pushdown. The query
    user's own series is always assembled."""
    # one hash aggregate, no window (round 13, guide §2.4): seq was
    # only the sort key and it ranks by (ts, event_id) — the in-array
    # sort on the same total key gives the identical order without the
    # user_points partition-sort pass
    pts = t.events.select("user_id", "ts", "event_id", "value")
    if ids is not None:
        pts = pts.join(
            F.broadcast(ids.select("user_id")), "user_id", "left_semi"
        ).unionByName(pts.filter(F.col("user_id") == query_user))
    traj = pts.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("pts")
    ).select(
        "user_id", F.col("pts.value").alias("vals")
    )
    q = (
        traj.filter(F.col("user_id") == query_user)
        .select(F.col("vals").alias("q_vals"))
    )
    return traj.filter(F.col("user_id") != query_user).join(F.broadcast(q))


def _haus_directed_np(sa, sq):
    """max over x in sa of min |x - y| over y in sq (both sorted numpy
    float64) — binary search against the flanking neighbors, the same
    subtraction/min/max chain (hence the same IEEE doubles) the old
    marker-window form evaluated."""
    import numpy as np

    idx = np.searchsorted(sq, sa)
    lo = np.where(idx > 0, sa - sq[np.maximum(idx - 1, 0)], np.inf)
    hi = np.where(
        idx < len(sq), sq[np.minimum(idx, len(sq) - 1)] - sa, np.inf
    )
    return float(np.max(np.minimum(lo, hi)))


def _hausdorff_lb(t: Tables, query_user: int, ends: bool = False) -> DataFrame:
    """Per-user Hausdorff distance to the query user — ONE hash
    aggregate + ONE Arrow pass (guide §2.4/§4.2).

    In 1-D, nearest-neighbor distance is a sorted-order problem: sort
    each user's values once and each point's nearest query point is a
    flanking neighbor by binary search (and vice versa for the reverse
    direction).  Hausdorff is set-based, so the per-user arrays come
    from an UNORDERED collect_list — a single hash aggregate over
    events with map-side partial combal, no window sort, no marker
    union (the previous form union'd broadcast query markers into
    every user's stream and paid two corpus-sized window sorts).  This
    is the engine's replacement for the reference's per-partition
    R-tree lookups [P §4.2] — same locality, zero index structures,
    one shuffle on user_id.  (Also a valid Fréchet lower bound:
    Fréchet >= Hausdorff [P §5.1].)

    With ``ends`` the same aggregate also carries the (ts, event_id)-
    ordered first/last values and the bound becomes
    max(Hausdorff, |endpoint deltas|) — ``_frechet_lb``'s tightening,
    fused so the Fréchet/DTW consumers pay no second aggregate."""
    import numpy as np
    import pandas as pd

    ev = t.events
    aggs = [F.collect_list("value").alias("vs")]
    if ends:
        aggs += [
            F.expr("min_by(value, struct(ts, event_id))").alias("v_first"),
            F.expr("max_by(value, struct(ts, event_id))").alias("v_last"),
        ]
    per_user = ev.groupBy("user_id").agg(*aggs)
    q = per_user.filter(F.col("user_id") == query_user).select(
        F.col("vs").alias("qvs"),
        *(
            [
                F.col("v_first").alias("q_first"),
                F.col("v_last").alias("q_last"),
            ]
            if ends
            else []
        ),
    )
    paired = (
        per_user.filter(F.col("user_id") != query_user)
        .crossJoin(F.broadcast(q))
    )

    def lbf(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.vs, dtype=np.float64)
                sq = np.sort(np.asarray(row.qvs, dtype=np.float64))
                sa = np.sort(a)
                lb = max(
                    _haus_directed_np(sa, sq), _haus_directed_np(sq, sa)
                )
                if ends:
                    lb = max(
                        lb,
                        abs(row.v_first - row.q_first),
                        abs(row.v_last - row.q_last),
                    )
                out.append((row.user_id, lb))
            yield pd.DataFrame(out, columns=["user_id", "lb"])

    return paired.mapInPandas(lbf, schema="user_id bigint, lb double")


_KNN_K = 10
_KNN_C = 3  # candidate over-fetch factor (c*k), as in [P §5]


def _frechet_lb(t: Tables, query_user: int) -> DataFrame:
    """Per-user Fréchet LOWER BOUND: max(Hausdorff, endpoint distances).

    Every Fréchet coupling matches first-with-first and last-with-last
    points [P §2], so |a_1-q_1| and |a_n-q_m| are free lower bounds —
    and for drifting 1-D series they prune far harder than Hausdorff
    (which is near-zero whenever value RANGES overlap, order ignored).

    Endpoints come straight off the raw events as min_by/max_by inside
    ``_hausdorff_lb``'s single hash aggregate (round 12: fused — the
    bound is one aggregate + one Arrow pass, no separate ends join)."""
    return _hausdorff_lb(t, query_user, ends=True)


def _series_1d(row) -> tuple[np.ndarray, np.ndarray]:
    """Extract (candidate, query) 1-D value series from a paired row."""
    return (
        np.asarray(row.vals, dtype=np.float64),
        np.asarray(row.q_vals, dtype=np.float64),
    )


def _series_2d(row) -> tuple[np.ndarray, np.ndarray]:
    """Extract (candidate, query) (n,2) coordinate arrays from a paired
    row (``_paired_series_2d`` columns xs/ys/qxs/qys)."""
    return (
        np.column_stack(
            (np.asarray(row.xs), np.asarray(row.ys))
        ).astype(np.float64),
        np.column_stack(
            (np.asarray(row.qxs), np.asarray(row.qys))
        ).astype(np.float64),
    )


def _dp_refine(kernel, extract, out_col: str, tau=None):
    """mapInPandas kernel stage: exact DP distance per (user, query)
    series pair; with ``tau``, each DP early-abandons once it provably
    exceeds tau (reference O10), returning a lower bound > tau.

    ``kernel`` is ``kernels.frechet`` / ``kernels.dtw``; ``extract`` maps
    a paired row to its (candidate, query) arrays (1-D or 2-D)."""

    def refine(batches):  # no shuffle — rows are already one-per-user
        for pdf in batches:
            out = [
                (row.user_id, round(kernel(*extract(row), tau=tau), 6))
                for row in pdf.itertuples()
            ]
            yield pd.DataFrame(out, columns=["user_id", out_col])

    return refine


def _dp_knn(lb: DataFrame, paired, kernel, extract, out_col: str) -> DataFrame:
    """Generic EXACT two-phase kNN over an order-sensitive DP kernel —
    the reference's prune-then-refine loop [P §5] as one harness shared
    by every {Fréchet, DTW} x {1-D, 2-D} search:

    1. ``lb`` is a per-user SQL LOWER bound of the kernel distance;
    2. the c*k best-bounded candidates get the exact kernel; their k-th
       exact distance tau_k bounds the kNN radius from above;
    3. every remaining user with lb <= tau_k is refined with
       tau-early-abandon (lb > tau_k cannot enter the top k);
    4. union, global top-k.

    ``paired`` maps a candidate-id DataFrame to (candidate, query) series
    pairs with the semi-join pushed below assembly. Only the scalar tau_k
    crosses to the driver (same footprint as an AQE stats exchange)."""
    schema = f"user_id bigint, {out_col} double"
    lb = lb.persist()  # both refine phases read it (reference O8 analog)
    cand_ids = lb.orderBy("lb", "user_id").limit(_KNN_C * _KNN_K)
    first = (
        paired(cand_ids)
        .mapInPandas(_dp_refine(kernel, extract, out_col), schema=schema)
        .persist()
    )
    tau_k = (
        first.orderBy(out_col)
        .limit(_KNN_K)
        .agg(F.max(out_col).alias("tau"))
        .head()[0]  # one scalar to the driver — the tau_k bound
    )
    if tau_k is None:  # corpus has no user besides the query user
        out = first.orderBy(out_col, "user_id").limit(_KNN_K).localCheckpoint()
        first.unpersist()
        lb.unpersist()
        return out
    # tau_k is the 6-dp ROUNDED k-th distance: a candidate whose true
    # distance lies in (tau_k, tau_k + 5e-7] rounds TO tau_k and can
    # beat the incumbent on the user_id tie-break, so the gate admits
    # the tie band; the refine pad below still guarantees abandoned
    # rows round strictly above tau_k.
    rest_ids = lb.filter(F.col("lb") <= tau_k + 1e-6).join(
        F.broadcast(cand_ids.select("user_id")), "user_id", "left_anti"
    )
    rest = paired(rest_ids).mapInPandas(
        # tau pad: an early-abandoned DP returns a bound > tau; pad by
        # 1e-6 so 6-decimal rounding can never pull one back to tau_k
        _dp_refine(kernel, extract, out_col, tau=tau_k + 1e-6),
        schema=schema,
    )
    out = (
        first.unionByName(rest)
        .orderBy(out_col, "user_id")
        .limit(_KNN_K)
        .localCheckpoint()  # materialize k rows so both caches can drop
    )
    first.unpersist()
    lb.unpersist()
    return out


def _dp_threshold(
    lb: DataFrame, paired, kernel, extract, out_col: str, tau: float
) -> DataFrame:
    """Generic EXACT threshold search over a DP kernel — fully
    declarative (no driver round-trip, unlike the kNN's tau_k exchange):
    the SQL lower bound gates the kernel (lb > tau cannot qualify
    [P §5.1]), each surviving DP early-abandons at tau, and a final
    filter keeps true qualifiers."""
    cand_ids = lb.filter(F.col("lb") <= tau)
    return (
        paired(cand_ids)
        .mapInPandas(
            _dp_refine(kernel, extract, out_col, tau=tau + 1e-6),
            schema=f"user_id bigint, {out_col} double",
        )
        .filter(F.col(out_col) <= tau)
    )




def _dp_search_oracle(
    combine: str,
    final: str,
    dist: str = "ABS(av.v - bv.v)",
    coords: str = "value",
    cols: str = "v",
    cell_filter: str = "TRUE",
) -> str:
    """Multi-user antidiagonal recursion: EVERY candidate user's DP grid
    against the query user advances in lockstep (rows keyed by user) —
    the brute-force DP search truth as ONE recursive CTE.

    ``dist``/``coords``/``cols`` parameterize the per-cell metric: the
    1-D default is |av.v - bv.v| over ``value``; the 2-D form passes the
    (time-in-days, value) projection and the Euclidean SQRT — the same
    float DAG as the engine's NumPy kernel, so the 2-D WEAK search rows
    get the same cross-engine evidence as the 1-D ones.  ``cell_filter``
    restricts the admissible DP cells (may reference av.i, bv.j and
    peru.n) — the Sakoe-Chiba band form of the banded-DTW row.

    NOT registered as the driver oracle: DuckDB materializes every
    layer of every user's grid ROW-PER-CELL, measured 37 s at sf0.01 /
    245 s at sf0.1.  Since round 7 the driver oracles for all 23
    search tiers are the LIST-LAYER form instead
    (``operators/dp_list_sql.py`` — one list per antidiagonal, ~60x
    faster, FULL rows); this row-per-cell variant stays as the
    INDEPENDENT pytest cross-check at sf0.001
    (tests/test_twophase.py) — a third implementation of the same
    recursion, structurally unlike both the kernel and the list-layer
    oracle, which is exactly what makes it a useful pin."""
    return f"""
    WITH RECURSIVE
    bv(j, {cols}) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id), {coords}
        FROM events WHERE user_id = 1
    ),
    av(u, i, {cols}) AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id), {coords}
        FROM events WHERE user_id <> 1
    ),
    peru AS (SELECT u, MAX(i) AS n FROM av GROUP BY u),
    mdim AS (SELECT MAX(j) AS m FROM bv),
    dp(u, k, i, val, age) AS (
        SELECT av.u, 2, 1, {dist}, 0
        FROM av JOIN bv ON av.i = 1 AND bv.j = 1
        UNION ALL
        (
          WITH cur AS (SELECT * FROM dp),
          kk AS (SELECT MAX(k) AS k FROM cur),
          cells AS (
              SELECT (SELECT k FROM kk) + 1 AS k, av.u, av.i,
                     {dist} AS d
              FROM av JOIN bv ON bv.j = (SELECT k FROM kk) + 1 - av.i
              JOIN peru ON peru.u = av.u
              WHERE {cell_filter}
          ),
          newcells AS (
              SELECT cells.u, cells.k, cells.i,
                     {combine} AS val, 0 AS age
              FROM cells JOIN cur
                ON cur.u = cells.u
               AND ((cur.age = 0 AND cur.i IN (cells.i - 1, cells.i))
                    OR (cur.age = 1 AND cur.i = cells.i - 1))
              GROUP BY cells.k, cells.u, cells.i, cells.d
          ),
          carry AS (
              SELECT u, k + 1, i, val, 1 FROM cur WHERE age = 0
          )
          SELECT u, k, i, val, age FROM newcells
          UNION ALL
          SELECT * FROM carry
          WHERE (SELECT k FROM kk)
                < (SELECT MAX(n) FROM peru) + (SELECT m FROM mdim)
        )
    ),
    finals AS (
        SELECT dp.u AS user_id, dp.val
        FROM dp JOIN peru ON peru.u = dp.u
        WHERE dp.age = 0 AND dp.i = peru.n
          AND dp.k = peru.n + (SELECT m FROM mdim)
    )
    {final}
    """

@query(
    "traj_frechet_knn",
    oracle=lambda: _DL.float_knn_sql(False, "frechet", _KNN_K, frechet=True),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
def traj_frechet_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9/R13: k users nearest the query user under discrete Fréchet —
    EXACT, via the reference's two-phase prune-then-refine [P §5]:

    1. cheap SQL Hausdorff lower bound per user (Fréchet >= Hausdorff);
    2. refine the c*k best-bounded candidates with the DP kernel; the
       k-th refined distance becomes the cutoff tau_k;
    3. refine every remaining user whose bound <= tau_k (any user with
       lb > tau_k has Fréchet >= lb > tau_k and cannot enter the top k);
    4. merge and take the global top k.

    The reference runs this as a driver-orchestrated loop; here phases 2/3
    are one filtered ``applyInPandas`` each, and only the scalar tau_k
    crosses to the driver (the same footprint as an AQE stats exchange).
    Bound: ``_frechet_lb`` (Hausdorff + endpoints); phase 3 additionally
    early-abandons each DP once it provably exceeds tau_k (O10).
    """
    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        kernels.frechet,
        _series_1d,
        "frechet",
    )


_FRECHET_TAU = 85.0


@query(
    "traj_frechet_threshold",
    oracle=lambda: _DL.float_threshold_sql(
        False, "frechet", _FRECHET_TAU, frechet=True
    ),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
def traj_frechet_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 under discrete Fréchet: all users within tau=85.0 of the query
    user — EXACT, fully declarative (no driver round-trip at all, unlike
    the kNN's tau_k exchange): SQL lower bound gates the DP kernel
    (Fréchet >= bound, so lb > tau cannot qualify [P §5.1]); each
    surviving DP early-abandons at tau; a final filter keeps true
    qualifiers. This completes the reference's query matrix —
    {threshold, kNN} x {Hausdorff, Fréchet} [P §4-§5]."""
    t = Tables(spark, sf_dir)
    return _dp_threshold(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        kernels.frechet,
        _series_1d,
        "frechet",
        _FRECHET_TAU,
    )


def _dp_layers_sql(name: str, combine: str, cost: str) -> str:
    """One recursive-CTE DP over series CTEs ``av(i, …)`` / ``bv(j, …)``:
    antidiagonal layer k carries layer k−1 along (tagged ``age``) so the
    recursion sees both predecessor layers; cell (i,j) = ``cost`` ⊕
    min(W, N, NW) with ⊕ = ``+`` for DTW and ``max`` for Fréchet — the
    IDENTICAL float expression DAG as the NumPy kernel, so values agree
    bit-for-bit. ``cost`` may reference av.* / bv.*."""
    layers = """
    {name}(k, i, val, age) AS (
        SELECT 2, 1, (SELECT {cost} FROM av, bv
                      WHERE av.i = 1 AND bv.j = 1), 0
        UNION ALL
        (
          WITH cur AS (SELECT * FROM {name}),
          kk AS (SELECT MAX(k) AS k FROM cur),
          cells AS (
              SELECT (SELECT k FROM kk) + 1 AS k, av.i AS i,
                     {cost} AS d
              FROM av JOIN bv ON bv.j = (SELECT k FROM kk) + 1 - av.i
          ),
          newcells AS (
              SELECT cells.k, cells.i,
                     {combine} AS val, 0 AS age
              FROM cells JOIN cur
                ON (cur.age = 0 AND cur.i IN (cells.i - 1, cells.i))
                OR (cur.age = 1 AND cur.i = cells.i - 1)
              GROUP BY cells.k, cells.i, cells.d
          ),
          carry AS (
              SELECT k + 1 AS k, i, val, 1 AS age FROM cur WHERE age = 0
          )
          SELECT k, i, val, age FROM newcells
          UNION ALL
          SELECT k, i, val, age FROM carry
          WHERE (SELECT k FROM kk)
                < (SELECT MAX(i) FROM av) + (SELECT MAX(j) FROM bv)
        )
    )"""
    return layers.format(name=name, combine=combine, cost=cost)


def _dp_pair_oracle() -> str:
    """FULL oracle for the 1-D (user 1, user 2) DP pair row: DTW and
    discrete Fréchet via ``_dp_layers_sql`` recursions, Hausdorff as
    grouped minima."""
    dtw = _dp_layers_sql("dtw_dp", "cells.d + MIN(cur.val)",
                         "ABS(av.v - bv.v)")
    fre = _dp_layers_sql("fre_dp", "GREATEST(cells.d, MIN(cur.val))",
                         "ABS(av.v - bv.v)")
    return f"""
    WITH RECURSIVE
    av(i, v) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id), value
        FROM events WHERE user_id = 2
    ),
    bv(j, v) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id), value
        FROM events WHERE user_id = 1
    ),
    {dtw},
    {fre},
    h1 AS (SELECT MAX(md) AS h FROM (
               SELECT av.i, MIN(ABS(av.v - bv.v)) AS md
               FROM av CROSS JOIN bv GROUP BY av.i)),
    h2 AS (SELECT MAX(md) AS h FROM (
               SELECT bv.j, MIN(ABS(av.v - bv.v)) AS md
               FROM av CROSS JOIN bv GROUP BY bv.j))
    SELECT CAST(2 AS BIGINT) AS user_id,
           ROUND((SELECT val FROM dtw_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM av)
                          + (SELECT MAX(j) FROM bv)
                    AND i = (SELECT MAX(i) FROM av)), 6) AS dtw,
           ROUND((SELECT val FROM fre_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM av)
                          + (SELECT MAX(j) FROM bv)
                    AND i = (SELECT MAX(i) FROM av)), 6) AS frechet,
           ROUND(GREATEST((SELECT h FROM h1), (SELECT h FROM h2)), 6)
               AS hausdorff
    """


@query("traj_dtw_pair", oracle=_dp_pair_oracle())
def traj_dtw_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: DTW alignment cost between users 1 and 2 (applyInPandas).

    FULL oracle despite the order-sensitive DP: the DuckDB side runs
    the SAME antidiagonal recursion as a recursive CTE (see
    ``_dp_pair_oracle``) — the one family that was declared
    not-SQL-expressible turns out to be expressible after all, for the
    PAIR shape (the kNN/threshold rows stay WEAK: a recursive CTE per
    candidate user would be an oracle-side cost explosion, and those
    rows are already pinned by brute-force equality in pytest)."""
    t = Tables(spark, sf_dir)
    paired = _paired_series(t, _QUERY_USER).filter(F.col("user_id") == 2)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = np.asarray(row["vals"], dtype=np.float64)
            b = np.asarray(row["q_vals"], dtype=np.float64)
            out.append(
                (
                    row["user_id"],
                    round(kernels.dtw(a, b), 6),
                    round(kernels.frechet(a, b), 6),
                    round(kernels.hausdorff(a, b), 6),
                )
            )
        return pd.DataFrame(
            out, columns=["user_id", "dtw", "frechet", "hausdorff"]
        )

    return paired.groupBy("user_id").applyInPandas(
        per_user,
        schema="user_id bigint, dtw double, frechet double, hausdorff double",
    )


@query(
    "traj_session_batch",
    oracle="""
    WITH pts AS (
        SELECT user_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0
                  END AS new_sess
        FROM pts
    ),
    sessions AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts_us
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           ROUND(SUM(value), 6) AS sum_value
    FROM sessions
    GROUP BY user_id, sess_id
    """,
)
def traj_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap rule) — gaps-and-islands in batch; the
    batch oracle for streaming ``session_window`` (§2.2-L)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pts = (
        t.events.select("user_id", "value", "ts", "event_id")
        .withColumn("ts_us", F.unix_micros("ts"))
        .withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") >= 1800000000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(wc))
    )
    return pts.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@query(
    "traj_hausdorff_threshold",
    oracle="""
    WITH q AS (SELECT DISTINCT value AS qv FROM events WHERE user_id = 1),
    pairs AS (
        SELECT e.user_id, q.qv, e.value AS ev_val, ABS(q.qv - e.value) AS d
        FROM events e CROSS JOIN q
        WHERE e.user_id <> 1
    ),
    dqu AS (SELECT user_id, MAX(md) AS h1 FROM (
                SELECT user_id, qv, MIN(d) AS md FROM pairs
                GROUP BY user_id, qv) GROUP BY user_id),
    duq AS (SELECT user_id, MAX(md) AS h2 FROM (
                SELECT user_id, ev_val, MIN(d) AS md FROM pairs
                GROUP BY user_id, ev_val) GROUP BY user_id)
    SELECT dqu.user_id, ROUND(GREATEST(h1, h2), 6) AS hausdorff
    FROM dqu JOIN duq ON dqu.user_id = duq.user_id
    WHERE GREATEST(h1, h2) <= 30.0
    """,
)
def traj_hausdorff_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 proper: THRESHOLD similarity search — all users within
    Hausdorff distance tau=30.0 of the query user [P §4].

    Same sort-merge distance engine as the kNN; the reference's
    global-prune -> circleRange -> refine pipeline is one declarative
    query with a final filter. (The oracle states the naive pair-join
    definition; the engine computes it by sort-merge — the equivalence
    IS the correctness claim.)"""
    t = Tables(spark, sf_dir)
    return (
        _hausdorff_lb(t, _QUERY_USER)
        .filter(F.col("lb") <= 30.0)
        .select("user_id", F.round("lb", 6).alias("hausdorff"))
    )


@query(
    "traj_hausdorff_pair_2d",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP))
                - (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) FROM events))
               / 86400000000.0 AS x,
               value AS y
        FROM events WHERE user_id IN (1, 2)
    ),
    a AS (SELECT DISTINCT x, y FROM pts WHERE user_id = 1),
    b AS (SELECT DISTINCT x, y FROM pts WHERE user_id = 2),
    dab AS (SELECT a.x, a.y,
                   MIN(SQRT((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))) AS md
            FROM a CROSS JOIN b GROUP BY a.x, a.y),
    dba AS (SELECT b.x, b.y,
                   MIN(SQRT((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))) AS md
            FROM a CROSS JOIN b GROUP BY b.x, b.y)
    SELECT ROUND(GREATEST((SELECT MAX(md) FROM dab),
                          (SELECT MAX(md) FROM dba)), 6) AS hausdorff_2d
    """,
)
def traj_hausdorff_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12 in TWO dimensions — the reference's actual GPS setting.

    Points are (time-in-days, value): Euclidean point-set Hausdorff via
    join + two grouped minima, exactly the 1-D flagship trick with the
    distance expression swapped (FIXTURES.md 2-D derivation). At corpus
    scale the pair join gains a grid-cell equi-join prefilter
    (sim_band_join's pattern in 2 keys)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    t0 = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = (
        ev.filter(F.col("user_id").isin(1, 2))
        .join(F.broadcast(t0))
        .select(
            "user_id",
            ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
            F.col("value").alias("y"),
        )
        .distinct()
    )
    a = pts.filter(F.col("user_id") == 1).select("x", "y")
    b = pts.filter(F.col("user_id") == 2).select(
        F.col("x").alias("bx"), F.col("y").alias("by")
    )
    d = a.crossJoin(F.broadcast(b)).withColumn(
        "d",
        F.sqrt(
            (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
            + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
        ),
    )
    h_ab = d.groupBy("x", "y").agg(F.min("d").alias("md")).agg(
        F.max("md").alias("h_ab")
    )
    h_ba = d.groupBy("bx", "by").agg(F.min("d").alias("md")).agg(
        F.max("md").alias("h_ba")
    )
    return h_ab.crossJoin(h_ba).select(
        F.round(F.greatest("h_ab", "h_ba"), 6).alias("hausdorff_2d")
    )


def _pts_2d(t: Tables) -> DataFrame:
    """Events projected to the (time-in-days, value) plane."""
    ev = t.events
    t0 = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    return ev.join(F.broadcast(t0)).select(
        "user_id",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )


def _grid_prune_2d(t: Tables, query_user: int, eps: float) -> DataFrame:
    """Lossless spatial prune for 2-D Hausdorff search: user_ids that can
    still have H <= eps — the reference's R-tree global prune [P §4.2] as
    an eps-grid cell equi-join (traj_range_query_2d's neighborhood trick
    turned into a candidate gate, VERDICT r1 #1).

    Each user's points collapse to DISTINCT eps-cells first, so the join
    is cells x query-cells, never points x points. A user is pruned when
    either necessary condition fails:

    - some point-cell of the user matches NO query point's 3x3 cell
      neighborhood -> that point's NN distance to Q exceeds eps -> the
      directed h(U->Q) > eps;
    - some query point's 3x3 neighborhood contains NO cell of the user
      -> that query point's NN distance to U exceeds eps -> h(Q->U) > eps.

    Both only ever prune users whose true Hausdorff provably exceeds eps
    (cell adjacency is necessary for a within-eps neighbor), so the
    surviving set always contains every true answer."""
    pts = _pts_2d(t)
    cell = lambda c: F.floor(F.col(c) / F.lit(eps))  # noqa: E731
    p_cells = (
        pts.filter(F.col("user_id") != query_user)
        .select("user_id", cell("x").alias("cx"), cell("y").alias("cy"))
        .distinct()
    )
    qn = (
        pts.filter(F.col("user_id") == query_user)
        .select("x", "y")
        .distinct()  # duplicate query points have identical NN distances
        .select(
            F.struct("x", "y").alias("qi"),
            cell("x").alias("qcx"),
            cell("y").alias("qcy"),
        )
        .withColumn(
            "dxy",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(-1, 1), dx ->"
                    " transform(sequence(-1, 1), dy -> struct(dx, dy))))"
                )
            ),
        )
        .select(
            "qi",
            (F.col("qcx") + F.col("dxy.dx")).alias("cx"),
            (F.col("qcy") + F.col("dxy.dy")).alias("cy"),
        )
    )
    n_q = qn.select("qi").distinct().count()
    # condition (a): every user point-cell touches some query neighborhood
    bad_a = (
        p_cells.join(
            F.broadcast(qn.select("cx", "cy").distinct()), ["cx", "cy"], "left_anti"
        )
        .select("user_id")
        .distinct()
    )
    # condition (b): every query point's neighborhood touches the user
    cov = (
        p_cells.join(F.broadcast(qn), ["cx", "cy"])
        .select("user_id", "qi")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_cov"))
    )
    return (
        cov.filter(F.col("n_cov") == n_q)
        .join(bad_a, "user_id", "left_anti")
        .select("user_id")
    )


# Per-user point-count bound for the collect_list-fed Arrow kernels: a
# heavy-tailed user at scale fails loudly here instead of inflating
# executor memory quadratically (the matrix is additionally slabbed, so
# this guards the collected arrays themselves, not the lattice).
_HAUS_2D_MAX_PTS = 1 << 25


def _hausdorff_2d_per_user(
    t: Tables, query_user: int, ids: DataFrame | None = None
) -> DataFrame:
    """Per-user directed 2-D Hausdorff maxima (h1, h2) to the query user
    in the (time-in-days, value) plane — shared engine of the 2-D kNN
    and threshold searches (and `_frechet_lb_2d`). ``ids`` restricts
    the probe to candidate users (semi-join pushed below the work), so
    a spatial prune can gate the exact O(|U|x|Q|) distances.

    Round 12 (guide §2.4/§4.2): ONE unordered collect_list hash
    aggregate + ONE Arrow pass, replacing a point-level broadcast join
    (|corpus points| x |Q| rows) through TWO grouped-minima aggregation
    chains. The kernel evaluates the identical subtract/multiply/add/
    sqrt IEEE sequence on the identical doubles, and min/max are
    order-insensitive over the same multisets (duplicate points
    collapse under max-of-minima exactly as the old GROUP BYs did), so
    (h1, h2) are bit-equal to the join form's."""
    import numpy as np
    import pandas as pd

    pts = _pts_2d(t)
    per_user = pts.groupBy("user_id").agg(
        F.collect_list("x").alias("xs"), F.collect_list("y").alias("ys")
    )
    q = per_user.filter(F.col("user_id") == query_user).select(
        F.col("xs").alias("qxs"), F.col("ys").alias("qys")
    )
    probe = per_user.filter(F.col("user_id") != query_user)
    if ids is not None:
        probe = probe.join(
            F.broadcast(ids.select("user_id")), "user_id", "left_semi"
        )
    # fan out: AQE coalesces the small per-user aggregate to 1-2
    # partitions, which would run the kernel on 1-2 cores (the
    # `_lcss_refine` single-file-fixture discipline)
    paired = probe.crossJoin(F.broadcast(q)).repartition(
        t.spark.sparkContext.defaultParallelism
    )

    # bound captured at build time so it ships by value inside the
    # pickled closure (and tests can patch the module global)
    max_pts = _HAUS_2D_MAX_PTS

    def hk(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                ax = np.asarray(row.xs, dtype=np.float64)
                ay = np.asarray(row.ys, dtype=np.float64)
                qx = np.asarray(row.qxs, dtype=np.float64)
                qy = np.asarray(row.qys, dtype=np.float64)
                # loud failure for a pathological user instead of an
                # executor OOM at scale (segment-kernel discipline)
                if max(ax.size, qx.size) > max_pts:
                    raise ValueError(
                        "per-user point count exceeds the 2-D Hausdorff "
                        f"kernel bound ({max_pts})"
                    )
                # h1: per query point (column) nearest-probe distance,
                # maximized; h2: per probe point (row) nearest-query
                # distance, maximized — the two directed maxima.
                # Slab the probe axis so the dense (slab x nq) matrix
                # stays ~2M cells regardless of points-per-user; min
                # and max are exactly associative, so folding running
                # column-minima / per-row maxima across slabs yields
                # bit-identical (h1, h2) to the one-shot matrix.
                nq = qx.size
                slab = max(1, 2_000_000 // max(nq, 1))
                col_min = np.full(nq, np.inf)
                h2 = -np.inf
                for s in range(0, ax.size, slab):
                    e = s + slab
                    dx = ax[s:e, None] - qx[None, :]
                    dy = ay[s:e, None] - qy[None, :]
                    d = np.sqrt(dx * dx + dy * dy)
                    np.minimum(col_min, d.min(axis=0), out=col_min)
                    h2 = max(h2, float(d.min(axis=1).max()))
                out.append(
                    (row.user_id, float(col_min.max()), h2)
                )
            yield pd.DataFrame(out, columns=["user_id", "h1", "h2"])

    return paired.mapInPandas(
        hk, schema="user_id bigint, h1 double, h2 double"
    )


@query(
    "traj_hausdorff_knn_2d",
    oracle="""
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
    q AS (SELECT x AS qx, y AS qy FROM pts WHERE user_id = 1),
    d AS (
        SELECT p.user_id, p.x, p.y, q.qx, q.qy,
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)) AS d
        FROM pts p CROSS JOIN q
        WHERE p.user_id <> 1
    ),
    h1 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, qx, qy, MIN(d) AS md FROM d
               GROUP BY user_id, qx, qy)
           GROUP BY user_id),
    h2 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, x, y, MIN(d) AS md FROM d
               GROUP BY user_id, x, y)
           GROUP BY user_id)
    SELECT h1.user_id,
           ROUND(GREATEST(h1.h, h2.h), 6) AS hausdorff_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    ORDER BY GREATEST(h1.h, h2.h), h1.user_id
    LIMIT 10
    """,
)
def traj_hausdorff_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 in TWO dimensions — kNN under Euclidean point-set Hausdorff in
    the (time-in-days, value) plane, the reference's actual GPS query
    shape [P §5], exact, as one declarative query.

    Two-phase with a SPATIAL GLOBAL PRUNE — the reference's
    global-index -> local-R-tree kNN shape [P §5.2], not a corpus scan:

    1. the 1-D sort-merge Hausdorff on the VALUE axis (``_hausdorff_lb``,
       one window pass, no pair join) is a true LOWER bound of the 2-D
       distance (point distance >= |dy|); the best-bounded c*k users get
       EXACT 2-D Hausdorff, and their k-th exact distance tau bounds the
       final kNN radius from above. (A centroid-distance proxy was 4x
       looser here: tau 55 vs 13 at sf0.1 — the lb actually tracks the
       metric.)
    2. phase-2 survivors must pass BOTH lossless gates: lb <= tau AND
       ``_grid_prune_2d(eps=tau)``'s cell-pattern conditions;
    3. the exact grouped-minima engine runs only on survivors not
       already refined in phase 1; union, global top-k.

    Only tau crosses to the driver (one scalar, the same footprint as
    the Fréchet kNN's tau_k). At 100x corpus the exact join touches
    O(survivors), not O(users).

    STRATEGY CHOICE (cost-based, like the reference only consulting its
    global index above partition scale): the two-phase plan pays ~3
    fixed scan+shuffle passes; below ``_KNN2D_PRUNE_MIN_EVENTS`` events
    the single-pass grouped-minima engine is strictly faster (measured:
    1.5s vs 4.5s at sf0.1), so the dispatcher takes it and the pruned
    plan engages exactly when the probe volume can amortize it. Both
    branches are exact (pytest pins single-pass == pruned == brute
    force); the env knob exists so tests can force the pruned branch."""
    t = Tables(spark, sf_dir)
    cutoff = int(
        os.environ.get("SPARK_GRAFT_KNN2D_PRUNE_MIN_EVENTS", "200000")
    )
    if _events_count(t, sf_dir) < cutoff:
        return _hausdorff_knn_2d_single(t)
    return _hausdorff_knn_2d_pruned(t)


def _events_count(t: Tables, sf_dir: str) -> int:
    """Corpus size for the cost-based dispatch, recomputed from the
    parquet inputs on EVERY call (optimization-round rule: no
    module-level memo keyed on the data dir). The footer-metadata read
    makes that re-read ~ms instead of a Spark count job."""
    from ..tables import parquet_row_count

    return parquet_row_count(t.spark, sf_dir, "events")


def _hausdorff_knn_2d_single(t: Tables) -> DataFrame:
    """Single-pass exact engine: one broadcast probe join, both directed
    maxima as grouped minima, TakeOrderedAndProject top-k — optimal when
    the whole probe fits one pass."""
    h = F.greatest("h1", "h2")
    return (
        _hausdorff_2d_per_user(t, 1)
        .orderBy(h, "user_id")
        .limit(10)
        .select("user_id", F.round(h, 6).alias("hausdorff_2d"))
    )


def _hausdorff_knn_2d_pruned(t: Tables) -> DataFrame:
    """The lb-gated, grid-pruned two-phase exact engine (docstring of
    ``traj_hausdorff_knn_2d``, steps 1-3)."""
    h = F.greatest("h1", "h2")
    lb = _hausdorff_lb(t, 1).persist()  # 1-D y-axis lower bound, all users
    cand_ids = lb.orderBy("lb", "user_id").limit(_KNN_C * _KNN_K).select(
        "user_id"
    )
    first = (
        _hausdorff_2d_per_user(t, 1, ids=cand_ids)
        .select("user_id", h.alias("hd"))
        .persist()
    )
    tau = (
        first.orderBy("hd")
        .limit(_KNN_K)
        .agg(F.max("hd").alias("tau"))
        .head()[0]
    )
    if tau is None:  # corpus has no user besides the query user
        out = first.select(
            "user_id", F.round("hd", 6).alias("hausdorff_2d")
        ).localCheckpoint()
        first.unpersist()
        lb.unpersist()
        return out
    # tau == 0.0 happens when >= k users duplicate the query trajectory
    # exactly (a 20x-cloned scale probe found this): the eps-grid would
    # divide by zero. A positive floor keeps the prune lossless — a
    # LARGER eps only admits more candidates — and the lb <= tau filter
    # still does the tight cut.
    eps_prune = tau if tau > 0 else 1e-9
    rest_ids = (
        lb.filter(F.col("lb") <= tau)
        .select("user_id")
        .join(_grid_prune_2d(t, 1, eps=eps_prune), "user_id", "left_semi")
        .join(F.broadcast(cand_ids), "user_id", "left_anti")
    )
    rest = _hausdorff_2d_per_user(t, 1, ids=rest_ids).select(
        "user_id", h.alias("hd")
    )
    out = (
        first.unionByName(rest)
        .orderBy("hd", "user_id")
        .limit(10)
        .select("user_id", F.round("hd", 6).alias("hausdorff_2d"))
        .localCheckpoint()  # materialize (k rows) so the caches can drop
    )
    first.unpersist()
    lb.unpersist()
    return out


@query(
    "traj_hausdorff_threshold_2d",
    oracle="""
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
    q AS (SELECT x AS qx, y AS qy FROM pts WHERE user_id = 1),
    d AS (
        SELECT p.user_id, p.x, p.y, q.qx, q.qy,
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)) AS d
        FROM pts p CROSS JOIN q
        WHERE p.user_id <> 1
    ),
    h1 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, qx, qy, MIN(d) AS md FROM d
               GROUP BY user_id, qx, qy)
           GROUP BY user_id),
    h2 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, x, y, MIN(d) AS md FROM d
               GROUP BY user_id, x, y)
           GROUP BY user_id)
    SELECT h1.user_id,
           ROUND(GREATEST(h1.h, h2.h), 6) AS hausdorff_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    WHERE GREATEST(h1.h, h2.h) <= 32.0
    """,
)
def traj_hausdorff_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 in TWO dimensions: all users within Euclidean point-set
    Hausdorff tau=32.0 of the query user in the GPS plane — the
    reference's threshold search in its native setting [P §4].

    ``_grid_prune_2d(eps=tau)`` runs first (the R-tree circleRange
    global prune [P §4.2] as a lossless cell equi-join on DISTINCT
    eps-cells), so the exact grouped-minima engine only ever probes
    users whose cell pattern admits H <= tau; a final exact filter
    keeps true qualifiers. Fully declarative — no driver scalar at
    all, and at 100x corpus the O(|U|x|Q|) distance join touches only
    survivors."""
    t = Tables(spark, sf_dir)
    h = F.greatest("h1", "h2")
    survivors = _grid_prune_2d(t, 1, eps=32.0)
    return (
        _hausdorff_2d_per_user(t, 1, ids=survivors)
        .filter(h <= 32.0)
        .select("user_id", F.round(h, 6).alias("hausdorff_2d"))
    )


@query(
    "traj_dtw_knn",
    oracle=lambda: _DL.float_knn_sql(False, "dtw", _KNN_K),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
def traj_dtw_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 under DTW: k users with the cheapest warping alignment to the
    query user — EXACT, same two-phase harness as the Fréchet kNN.

    The Fréchet lower bound is ALSO a DTW lower bound: DTW and discrete
    Fréchet range over the same monotone couplings, and a sum of
    non-negative distances dominates its maximum, so
    DTW >= Fréchet >= max(Hausdorff, endpoint distances) on every pair.
    Phase 3's DP early-abandons at tau_k (valid for the sum recurrence:
    partial path sums only grow)."""
    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        kernels.dtw,
        _series_1d,
        "dtw",
    )


_DTW_TAU = 1500.0


@query(
    "traj_dtw_threshold",
    oracle=lambda: _DL.float_threshold_sql(False, "dtw", _DTW_TAU),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
def traj_dtw_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 under DTW: all users whose warping alignment cost to the query
    user is <= tau=1500.0 — the last empty cell of the
    {threshold, kNN} x {Hausdorff, Fréchet, DTW} query matrix.

    Same fully-declarative harness as ``traj_frechet_threshold``: the
    SQL lower bound gates the kernel (DTW >= Fréchet >= max(Hausdorff,
    endpoints), since DTW sums what Fréchet maxes over the same monotone
    couplings), each surviving DP early-abandons at tau (valid for the
    sum recurrence: partial path sums only grow), and a final filter
    keeps true qualifiers. No driver round-trip."""
    t = Tables(spark, sf_dir)
    return _dp_threshold(
        _frechet_lb(t, _QUERY_USER),
        lambda ids: _paired_series(t, _QUERY_USER, ids=ids),
        kernels.dtw,
        _series_1d,
        "dtw",
        _DTW_TAU,
    )


_SEGMENT_HAUSDORFF_ORACLE = """
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
        FROM events WHERE user_id IN (1, 2)
    ),
    segs AS (
        SELECT user_id, x AS ax, y AS ay,
               LEAD(x) OVER w AS bx, LEAD(y) OVER w AS by
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY seq)
        QUALIFY LEAD(x) OVER w IS NOT NULL
    ),
    cand AS (
        SELECT p.user_id AS pu, p.x, p.y, s.ax, s.ay, s.bx, s.by,
               (s.bx-s.ax)*(s.bx-s.ax)+(s.by-s.ay)*(s.by-s.ay) AS len2,
               (p.x-s.ax)*(s.bx-s.ax)+(p.y-s.ay)*(s.by-s.ay) AS dot
        FROM pts p JOIN segs s ON p.user_id <> s.user_id
    ),
    proj AS (
        SELECT pu, x, y, ax, ay, bx, by,
               CASE WHEN len2 = 0 THEN 0
                    ELSE GREATEST(0, LEAST(1, dot / len2)) END AS t
        FROM cand
    ),
    pd AS (
        SELECT pu, x, y,
               MIN(SQRT(POW(x-(ax+t*(bx-ax)), 2)
                      + POW(y-(ay+t*(by-ay)), 2))) AS md
        FROM proj
        GROUP BY pu, x, y
    )
    SELECT ROUND(MAX(CASE WHEN pu = 1 THEN md END), 6) AS h_q_to_segs,
           ROUND(MAX(CASE WHEN pu = 2 THEN md END), 6) AS h_u_to_segs,
           ROUND(GREATEST(MAX(CASE WHEN pu = 1 THEN md END),
                          MAX(CASE WHEN pu = 2 THEN md END)), 6)
               AS seg_hausdorff
    FROM pd
"""


@query("traj_hausdorff_segments", oracle=_SEGMENT_HAUSDORFF_ORACLE)
def traj_hausdorff_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6/R15 fidelity: SEGMENT-Hausdorff between users 1 and 2 in the
    (time-in-days, value) plane — each point measures its distance to the
    other trajectory's nearest LINE SEGMENT (clamped Euclidean
    projection), not its nearest sample point.

    The reference indexes LineSegments and prunes with point-to-segment
    minDist [P §4.1]; for sparsely-sampled trajectories the segment
    distance is the faithful geometry (a point midway between two
    distant samples is ON the trajectory, distance ~0, where point-set
    Hausdorff reports half the gap). Segments come from one lead()
    window over the ordered points (traj_segments' engine in 2-D); the
    directed maxima are the familiar grouped min/max over the
    point x segment join; all closed-form — FULL oracle."""
    t = Tables(spark, sf_dir)
    pts = (
        t.user_points()
        .join(F.broadcast(t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))))
        .filter(F.col("user_id").isin(1, 2))
        .select(
            "user_id",
            "seq",
            ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
            F.col("value").alias("y"),
        )
    )
    w = W.partitionBy("user_id").orderBy("seq")
    segs = (
        pts.select(
            F.col("user_id").alias("su"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.lead("x").over(w).alias("bx"),
            F.lead("y").over(w).alias("by"),
        )
        .filter(F.col("bx").isNotNull())
    )
    cand = pts.join(
        F.broadcast(segs), F.col("user_id") != F.col("su")
    )
    len2 = (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax")) + (
        F.col("by") - F.col("ay")
    ) * (F.col("by") - F.col("ay"))
    dot = (F.col("x") - F.col("ax")) * (F.col("bx") - F.col("ax")) + (
        F.col("y") - F.col("ay")
    ) * (F.col("by") - F.col("ay"))
    tt = F.when(len2 == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), dot / len2))
    )
    proj = cand.withColumn("t", tt)
    d = F.sqrt(
        F.pow(F.col("x") - (F.col("ax") + F.col("t") * (F.col("bx") - F.col("ax"))), 2)
        + F.pow(F.col("y") - (F.col("ay") + F.col("t") * (F.col("by") - F.col("ay"))), 2)
    )
    pd_min = (
        proj.withColumn("d", d)
        .groupBy("user_id", "x", "y")
        .agg(F.min("d").alias("md"))
    )
    agg = pd_min.agg(
        F.max(F.when(F.col("user_id") == 1, F.col("md"))).alias("h1"),
        F.max(F.when(F.col("user_id") == 2, F.col("md"))).alias("h2"),
    )
    return agg.select(
        F.round("h1", 6).alias("h_q_to_segs"),
        F.round("h2", 6).alias("h_u_to_segs"),
        F.round(F.greatest("h1", "h2"), 6).alias("seg_hausdorff"),
    )


_RANGE_EPS = 2.0

_RANGE_ORACLE = """
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
    q AS (SELECT x AS qx, y AS qy FROM pts WHERE user_id = 1)
    SELECT p.user_id, p.x, p.y, ROUND(MIN(
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy))
           ), 6) AS min_dist
    FROM pts p CROSS JOIN q
    WHERE p.user_id <> 1
    GROUP BY p.user_id, p.x, p.y
    HAVING MIN(SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy))) <= 2.0
"""


def _range_core(pts: DataFrame, eps: float) -> DataFrame:
    """circleRange engine over a (user_id, x, y) point table: eps-grid
    cell keys, broadcast query points expanded to their 3x3 cell
    neighborhood, cell-key equi-join, exact distance refine."""
    cell = lambda c: F.floor(F.col(c) / eps)  # noqa: E731
    p = pts.filter(F.col("user_id") != 1).withColumn(
        "cx", cell("x")
    ).withColumn("cy", cell("y"))
    q = (
        pts.filter(F.col("user_id") == 1)
        .select(F.col("x").alias("qx"), F.col("y").alias("qy"))
        .withColumn("dxy", F.explode(F.expr(
            "flatten(transform(sequence(-1, 1), dx ->"
            " transform(sequence(-1, 1), dy -> struct(dx, dy))))"
        )))
        .select(
            "qx",
            "qy",
            (F.floor(F.col("qx") / eps) + F.col("dxy.dx")).alias("cx"),
            (F.floor(F.col("qy") / eps) + F.col("dxy.dy")).alias("cy"),
        )
    )
    d = F.sqrt(
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
    )
    return (
        p.join(F.broadcast(q), ["cx", "cy"])
        .withColumn("d", d)
        .groupBy("user_id", "x", "y")
        .agg(F.min("d").alias("md"))
        .filter(F.col("md") <= eps)
        .select("user_id", "x", "y", F.round("md", 6).alias("min_dist"))
    )


@query("traj_range_query_2d", oracle=_RANGE_ORACLE)
def traj_range_query_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6's ``circleRange`` probe as a declarative query: every point of
    every other trajectory within Euclidean eps=2.0 of ANY query-
    trajectory point, in the (time-in-days, value) plane.

    The reference answers this with per-partition R-trees [P §4.2]; here
    an eps-sized grid assigns each point a cell key, the (broadcast)
    query points expand to their 3x3 cell neighborhood, and a cell-key
    equi-join yields exactly the candidates an R-tree range probe would
    visit — any point within eps of a query point lies in an adjacent
    cell, so the prefilter is lossless. The exact distance filter
    refines. The reported min_dist equals the global minimum whenever it
    passes the filter (a q point within eps IS in the neighborhood), so
    the naive-predicate oracle hash-matches."""
    t = Tables(spark, sf_dir)
    return _range_core(_pts_2d(t), _RANGE_EPS)


_LAYOUT_CELL = 50.0  # value-axis partition grid step for the cell layout


def _layout_path(sf_dir: str) -> str:
    return os.path.join(staging_dir(sf_dir, "layout"), "events_by_cell")


def _write_cell_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as cell-partitioned, value-sorted Parquet —
    the engine's persistent STR-layout analog (SURVEY.md §4 O1/O3):
    partition dirs give Catalyst static partition pruning (the driver-
    side global index over partition MBRs [P §4.2]), the within-
    partition sort tightens row-group min/max so residual range
    predicates skip row groups (the local R-tree).

    Idempotent ensure: reused only while the fixture fingerprint stamp
    matches the live fixture files (a regenerated fixture under the same
    sf_dir forces a rebuild — ADVICE round 3)."""
    from ..sources.readers import layout_current, stamp_layout

    path = _layout_path(sf_dir)
    if layout_current(path, sf_dir):
        return path
    t = Tables(spark, sf_dir)
    write_partitioned(
        t.events.withColumn(
            "cell", F.floor(F.col("value") / F.lit(_LAYOUT_CELL))
        ),
        path,
        ["cell"],
        sort_cols=["value"],
    )
    stamp_layout(path, sf_dir)
    return path


@query(
    "traj_layout_cells",
    oracle=f"""
    SELECT CAST(FLOOR(value / {_LAYOUT_CELL}) AS BIGINT) AS cell,
           COUNT(*) AS n_points,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def traj_layout_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spatial WRITE path as a registered query: rewrite events into
    the cell-partitioned layout, then read the layout BACK and summarize
    per cell. The oracle aggregates the source table, so a green hash
    proves the layout holds exactly the corpus, keyed by the right
    cells — the sink itself is under oracle check, not just the read."""
    path = _write_cell_layout(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("cell").cast("bigint").alias("cell"))
        .agg(
            F.count("*").alias("n_points"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query("traj_range_query_2d_pruned", oracle=_RANGE_ORACLE)
def traj_range_query_2d_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """traj_range_query_2d answered FROM the cell-partitioned layout:
    the value-band of the query trajectory (±eps) selects the cell
    directories that can possibly hold an answer, the scan shows
    PartitionFilters (tests/test_plans.py pins this), and only those
    partitions are read — the reference's global-index partition pruning
    [P §4.2] made persistent. Identical result (same oracle hash): a
    point within eps of a query point lies within the value band, so
    the partition cut is lossless. The band bounds are one tiny driver
    aggregate over the query trajectory (same footprint as the kNNs'
    tau_k scalar)."""
    t = Tables(spark, sf_dir)
    path = _write_cell_layout(spark, sf_dir)
    band = (
        t.events.filter(F.col("user_id") == 1)
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .head()
    )
    lo_cell = math.floor((band["lo"] - _RANGE_EPS) / _LAYOUT_CELL)
    hi_cell = math.floor((band["hi"] + _RANGE_EPS) / _LAYOUT_CELL)
    ev = spark.read.parquet(path).filter(
        (F.col("cell") >= lo_cell) & (F.col("cell") <= hi_cell)
    )
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = ev.join(F.broadcast(t0)).select(
        "user_id",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    return _range_core(pts, _RANGE_EPS)




def _dp_pair_2d_oracle() -> str:
    """FULL oracle for the 2-D DP pair row: the same antidiagonal
    recursion with the Euclidean local cost in the (time-in-days,
    value) plane; Hausdorff as grouped minima."""
    fre = _dp_layers_sql(
        "fre_dp", "GREATEST(cells.d, MIN(cur.val))", "SQRT((av.x - bv.x) * (av.x - bv.x) + (av.y - bv.y) * (av.y - bv.y))"
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
    {fre},
    h1 AS (SELECT MAX(md) AS h FROM (
               SELECT av.i, MIN(SQRT((av.x - bv.x) * (av.x - bv.x) + (av.y - bv.y) * (av.y - bv.y))) AS md
               FROM av CROSS JOIN bv GROUP BY av.i)),
    h2 AS (SELECT MAX(md) AS h FROM (
               SELECT bv.j, MIN(SQRT((av.x - bv.x) * (av.x - bv.x) + (av.y - bv.y) * (av.y - bv.y))) AS md
               FROM av CROSS JOIN bv GROUP BY bv.j))
    SELECT CAST(2 AS BIGINT) AS user_id,
           ROUND((SELECT val FROM fre_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM av)
                          + (SELECT MAX(j) FROM bv)
                    AND i = (SELECT MAX(i) FROM av)), 6) AS frechet_2d,
           ROUND(GREATEST((SELECT h FROM h1), (SELECT h FROM h2)), 6)
               AS hausdorff_2d
    """

@query("traj_frechet_pair_2d", oracle=_dp_pair_2d_oracle())
def traj_frechet_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 in TWO dimensions: discrete Fréchet between users 1 and 2 in
    the (time-in-days, value) plane — the paper's native GPS setting
    [P §2]. The DP recurrence is dimension-blind; only the local metric
    changes (row-wise Euclidean on (n,2) arrays, kernels.pairwise_dist),
    so the same antidiagonal-vectorized kernel serves both."""
    t = Tables(spark, sf_dir)
    ev = t.user_points()
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = ev.join(F.broadcast(t0)).select(
        "user_id",
        "seq",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    traj = (
        pts.filter(F.col("user_id").isin(1, 2))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "x", "y"))
            ).alias("p")
        )
        .select(
            "user_id",
            F.col("p.x").alias("xs"),
            F.col("p.y").alias("ys"),
        )
    )
    a = traj.filter(F.col("user_id") == 2)
    q = traj.filter(F.col("user_id") == 1).select(
        F.col("xs").alias("qxs"), F.col("ys").alias("qys")
    )
    paired = a.join(F.broadcast(q))

    def per_pair(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                p = np.column_stack(
                    (np.asarray(row.xs), np.asarray(row.ys))
                ).astype(np.float64)
                qq = np.column_stack(
                    (np.asarray(row.qxs), np.asarray(row.qys))
                ).astype(np.float64)
                out.append(
                    (
                        row.user_id,
                        round(kernels.frechet(p, qq), 6),
                        round(kernels.hausdorff(p, qq), 6),
                    )
                )
            yield pd.DataFrame(
                out, columns=["user_id", "frechet_2d", "hausdorff_2d"]
            )

    return paired.mapInPandas(
        per_pair, schema="user_id bigint, frechet_2d double, hausdorff_2d double"
    )


@query(
    "traj_sample_workload",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_points,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
               AS INTEGER) % 10 = 0
    GROUP BY user_id
    """,
)
def traj_sample_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: query-workload sampling — ~10% of trajectories, selected by
    content hash rather than RNG: md5(user_id) is identical on every
    engine and every rerun, so the sample is reproducible (the property
    ``takeSample(seed)`` only gives within one engine) and pushes down
    as an ordinary predicate — no sampling operator state, no driver
    collect [P-analog: TrajSampling main, R17]."""
    t = Tables(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        t.events.filter(bucket % 10 == 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


def _paired_series_2d(
    t: Tables, query_user: int, ids: DataFrame | None = None
) -> DataFrame:
    """2-D analog of ``_paired_series``: per-user (xs, ys) coordinate
    arrays in the (time-in-days, value) plane, joined to the broadcast
    query arrays; ``ids`` pushes the candidate filter below assembly."""
    # one hash aggregate, no window — see _paired_series
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = t.events.join(F.broadcast(t0)).select(
        "user_id",
        "ts",
        "event_id",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    if ids is not None:
        pts = pts.join(
            F.broadcast(ids.select("user_id")), "user_id", "left_semi"
        ).unionByName(pts.filter(F.col("user_id") == query_user))
    traj = (
        pts.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "x", "y"))
            ).alias("p")
        )
        .select(
            "user_id", F.col("p.x").alias("xs"), F.col("p.y").alias("ys")
        )
    )
    q = traj.filter(F.col("user_id") == query_user).select(
        F.col("xs").alias("qxs"), F.col("ys").alias("qys")
    )
    return traj.filter(F.col("user_id") != query_user).join(F.broadcast(q))


def _frechet_lb_2d(t: Tables, query_user: int) -> DataFrame:
    """Per-user 2-D Fréchet lower bound: max(2-D Hausdorff, Euclidean
    endpoint distances) — the same dominance chain as 1-D
    (Fréchet >= Hausdorff; the coupling pins both endpoint pairs).

    Endpoints by min_by/max_by over the raw (ts, event_id) ordering key —
    a hash aggregate over events, no row_number sort (as in
    ``_frechet_lb``)."""
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = t.events.join(F.broadcast(t0)).select(
        "user_id",
        "ts",
        "event_id",
        ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    ends = pts.groupBy("user_id").agg(
        F.expr("min_by(struct(x, y), struct(ts, event_id))").alias("p0"),
        F.expr("max_by(struct(x, y), struct(ts, event_id))").alias("p1"),
    )
    q_ends = ends.filter(F.col("user_id") == query_user).select(
        F.col("p0").alias("q0"), F.col("p1").alias("q1")
    )
    dist = lambda a, b: F.sqrt(  # noqa: E731
        (F.col(f"{a}.x") - F.col(f"{b}.x"))
        * (F.col(f"{a}.x") - F.col(f"{b}.x"))
        + (F.col(f"{a}.y") - F.col(f"{b}.y"))
        * (F.col(f"{a}.y") - F.col(f"{b}.y"))
    )
    return (
        _hausdorff_2d_per_user(t, query_user)
        .join(ends, "user_id")
        .crossJoin(F.broadcast(q_ends))
        .select(
            "user_id",
            F.greatest(
                F.greatest("h1", "h2"), dist("p0", "q0"), dist("p1", "q1")
            ).alias("lb"),
        )
    )


@query(
    "traj_frechet_knn_2d",
    oracle=lambda: _DL.float_knn_sql(True, "frechet_2d", _KNN_K, frechet=True),
)  # FULL since round 7: list-layer DP oracle (dp_list_sql)
def traj_frechet_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9/R13 in TWO dimensions — the DFT paper's flagship query: k
    trajectories nearest the query under discrete Fréchet in the
    (time-in-days, value) plane, EXACT [P §5]. Identical two-phase
    harness to the 1-D kNN (SQL 2-D lower bound -> c*k refine -> tau_k
    sweep with DP early-abandon); only the local metric and the lb SQL
    change — the engine's claim that the 1-D design IS the GPS design,
    made executable."""
    t = Tables(spark, sf_dir)
    return _dp_knn(
        _frechet_lb_2d(t, _QUERY_USER),
        lambda ids: _paired_series_2d(t, _QUERY_USER, ids=ids),
        kernels.frechet,
        _series_2d,
        "frechet_2d",
    )


_IDX_TAU = 32.0  # threshold for the dual-index search (== threshold_2d)


def _manifest_path(sf_dir: str) -> str:
    return os.path.join(staging_dir(sf_dir, "layout"), "user_manifest")


def _write_user_manifest(spark: SparkSession, sf_dir: str) -> str:
    """The GLOBAL index beside the cell layout: one row per user with
    its point count, value MBR, and the corpus t0 — the engine's
    TrajMeta + partition-MBR table (SURVEY.md §1.1 dual store / [P
    §4.1]). Tiny (one row per trajectory), rebuilt only when the layout
    is."""
    from ..sources.readers import layout_current, stamp_layout

    path = _manifest_path(sf_dir)
    if layout_current(path, sf_dir):
        return path
    t = Tables(spark, sf_dir)
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    man = (
        t.events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_points"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .join(F.broadcast(t0))
    )
    man.coalesce(1).write.mode("overwrite").parquet(path)
    stamp_layout(path, sf_dir)
    return path


@query(
    "traj_hausdorff_threshold_2d_idx",
    oracle="""
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
    q AS (SELECT x AS qx, y AS qy FROM pts WHERE user_id = 1),
    d AS (
        SELECT p.user_id, p.x, p.y, q.qx, q.qy,
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)) AS d
        FROM pts p CROSS JOIN q
        WHERE p.user_id <> 1
    ),
    h1 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, qx, qy, MIN(d) AS md FROM d
               GROUP BY user_id, qx, qy)
           GROUP BY user_id),
    h2 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, x, y, MIN(d) AS md FROM d
               GROUP BY user_id, x, y)
           GROUP BY user_id)
    SELECT h1.user_id,
           ROUND(GREATEST(h1.h, h2.h), 6) AS hausdorff_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    WHERE GREATEST(h1.h, h2.h) <= 32.0
    """,
)
def traj_hausdorff_threshold_2d_idx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's DUAL-INDEX architecture end-to-end, persistent:
    threshold search answered from (a) the GLOBAL index — the per-user
    manifest (point count, value MBR, corpus t0), the TrajMeta +
    partition-MBR table [P §4.1] — and (b) the LOCAL data — the
    cell-partitioned, value-sorted Parquet layout, read with
    PartitionFilters so only the query's value band is scanned.

    Prune chain, each step lossless for H <= tau:
    1. manifest → candidate users whose value MBR fits inside
       [q_lo − tau, q_hi + tau] (any point outside that band is > tau
       from EVERY query point, since d >= |Δvalue| — so h(U→Q) > tau);
    2. the same band, snapped to cells, selects the partition
       directories to read — candidates' points all lie inside, so the
       pruned scan is complete for them;
    3. exact grouped-minima Hausdorff over candidates only, final
       H <= tau filter.
    At 100 TB steps 1-2 read a trajectory-count-sized manifest plus the
    band's directories — the full corpus is never scanned; the same
    oracle as the unindexed `traj_hausdorff_threshold_2d` proves the
    result identical. The band bounds are one manifest row fetched at
    plan time (the tau_k-scalar footprint)."""
    man_path = _write_user_manifest(spark, sf_dir)
    lay_path = _write_cell_layout(spark, sf_dir)
    man = spark.read.parquet(man_path)
    qrow = man.filter(F.col("user_id") == 1).head()
    qlo, qhi = qrow["vmin"] - _IDX_TAU, qrow["vmax"] + _IDX_TAU
    lo_cell = math.floor(qlo / _LAYOUT_CELL)
    hi_cell = math.floor(qhi / _LAYOUT_CELL)
    cands = man.filter(
        (F.col("user_id") != 1)
        & (F.col("vmin") >= qlo)
        & (F.col("vmax") <= qhi)
    ).select("user_id")
    ev = spark.read.parquet(lay_path).filter(
        (F.col("cell") >= lo_cell) & (F.col("cell") <= hi_cell)
    )
    pts = ev.select(
        "user_id",
        ((F.unix_micros("ts") - F.lit(qrow["t0"])) / 86400000000.0).alias(
            "x"
        ),
        F.col("value").alias("y"),
    )
    q = pts.filter(F.col("user_id") == 1).select(
        F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    probe = pts.join(F.broadcast(cands), "user_id", "left_semi")
    d = probe.join(F.broadcast(q)).withColumn(
        "d",
        F.sqrt(
            (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
            + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
        ),
    )
    h1 = (
        d.groupBy("user_id", "qx", "qy")
        .agg(F.min("d").alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("h1"))
    )
    h2 = (
        d.groupBy("user_id", "x", "y")
        .agg(F.min("d").alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("h2"))
    )
    h = F.greatest("h1", "h2")
    return (
        h1.join(h2, "user_id")
        .filter(h <= _IDX_TAU)
        .select("user_id", F.round(h, 6).alias("hausdorff_2d"))
    )


_IDX_K = 10


def _idx_hausdorff_exact(
    spark: SparkSession, lay_path: str, t0_us: int,
    lo_cell: int, hi_cell: int, cand: DataFrame,
) -> DataFrame:
    """Exact symmetric Hausdorff of candidate users to user 1, computed
    from the cell layout restricted to [lo_cell, hi_cell] — the LOCAL
    refinement half of the dual index (grouped-minima engine over a
    partition-pruned scan)."""
    ev = spark.read.parquet(lay_path).filter(
        (F.col("cell") >= lo_cell) & (F.col("cell") <= hi_cell)
    )
    pts = ev.select(
        "user_id",
        ((F.unix_micros("ts") - F.lit(t0_us)) / 86400000000.0).alias("x"),
        F.col("value").alias("y"),
    )
    q = pts.filter(F.col("user_id") == 1).select(
        F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    probe = pts.join(F.broadcast(cand), "user_id", "left_semi")
    d = probe.join(F.broadcast(q)).withColumn(
        "d",
        F.sqrt(
            (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
            + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
        ),
    )
    h1 = (
        d.groupBy("user_id", "qx", "qy")
        .agg(F.min("d").alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("h1"))
    )
    h2 = (
        d.groupBy("user_id", "x", "y")
        .agg(F.min("d").alias("md"))
        .groupBy("user_id")
        .agg(F.max("md").alias("h2"))
    )
    return h1.join(h2, "user_id").select(
        "user_id", F.greatest("h1", "h2").alias("h")
    )


@query(
    "traj_hausdorff_knn_2d_idx",
    oracle="""
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
    q AS (SELECT x AS qx, y AS qy FROM pts WHERE user_id = 1),
    d AS (
        SELECT p.user_id, p.x, p.y, q.qx, q.qy,
               SQRT((p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy)) AS d
        FROM pts p CROSS JOIN q
        WHERE p.user_id <> 1
    ),
    h1 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, qx, qy, MIN(d) AS md FROM d
               GROUP BY user_id, qx, qy)
           GROUP BY user_id),
    h2 AS (SELECT user_id, MAX(md) AS h FROM (
               SELECT user_id, x, y, MIN(d) AS md FROM d
               GROUP BY user_id, x, y)
           GROUP BY user_id)
    SELECT h1.user_id,
           ROUND(GREATEST(h1.h, h2.h), 6) AS hausdorff_2d
    FROM h1 JOIN h2 ON h1.user_id = h2.user_id
    ORDER BY GREATEST(h1.h, h2.h), h1.user_id
    LIMIT 10
    """,
)
def traj_hausdorff_knn_2d_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN over the PERSISTENT dual index — the paper's kNN algorithm
    shape [P §4.3] on the manifest + cell layout:

    1. SEED: the k manifest rows whose value-MBR midpoint is closest to
       the query's (global-index-only, trajectory-count-sized);
    2. BOUND: exact Hausdorff of the seeds (partition-pruned read of
       the seeds' own band) — their max is tau_k, an upper bound on the
       true kth distance;
    3. PRUNE: manifest users whose MBR fits inside the query band
       ±tau_k (any user violating it has H > tau_k — the same lossless
       argument as the threshold row);
    4. REFINE: exact Hausdorff over survivors from the tau_k-band
       partition-pruned scan; top-k by (H, user_id).
    The corpus is never fully scanned: steps 1/3 read the manifest,
    steps 2/4 read only band directories. The driver holds exactly the
    reference's global-index working set (a handful of manifest rows +
    one tau_k scalar). Oracle identical to the unindexed
    ``traj_hausdorff_knn_2d``."""
    man_path = _write_user_manifest(spark, sf_dir)
    lay_path = _write_cell_layout(spark, sf_dir)
    man = spark.read.parquet(man_path)
    qrow = man.filter(F.col("user_id") == 1).head()
    t0_us = qrow["t0"]
    mid_q = (qrow["vmin"] + qrow["vmax"]) / 2.0
    seeds = (
        man.filter(F.col("user_id") != 1)
        .withColumn(
            "gap", F.abs((F.col("vmin") + F.col("vmax")) / 2.0 - mid_q)
        )
        .orderBy("gap", "user_id")
        .limit(_IDX_K)
        .select("user_id", "vmin", "vmax")
        .collect()
    )
    lo3 = min([qrow["vmin"]] + [r["vmin"] for r in seeds])
    hi3 = max([qrow["vmax"]] + [r["vmax"] for r in seeds])
    seed_ids = spark.createDataFrame(
        [(r["user_id"],) for r in seeds], "user_id bigint"
    )
    tau_k = (
        _idx_hausdorff_exact(
            spark,
            lay_path,
            t0_us,
            math.floor(lo3 / _LAYOUT_CELL),
            math.floor(hi3 / _LAYOUT_CELL),
            seed_ids,
        )
        .agg(F.max("h"))
        .head()[0]
    )
    if tau_k is None:  # corpus has no user besides the query user
        return spark.createDataFrame(
            [], "user_id bigint, hausdorff_2d double"
        )
    qlo, qhi = qrow["vmin"] - tau_k, qrow["vmax"] + tau_k
    cands = man.filter(
        (F.col("user_id") != 1)
        & (F.col("vmin") >= qlo)
        & (F.col("vmax") <= qhi)
    ).select("user_id")
    h = _idx_hausdorff_exact(
        spark,
        lay_path,
        t0_us,
        math.floor(qlo / _LAYOUT_CELL),
        math.floor(qhi / _LAYOUT_CELL),
        cands,
    )
    return (
        h.orderBy("h", "user_id")
        .limit(_IDX_K)
        .select("user_id", F.round("h", 6).alias("hausdorff_2d"))
    )
