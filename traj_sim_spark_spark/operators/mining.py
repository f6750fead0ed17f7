"""Trajectory-mining operators: the analyses a traj-sim-spark user runs
AFTER similarity search (SURVEY.md §2.1 R16-R18 context — workload
characterization over the same point corpus).

The reference's surface ends at distance queries; a production
deployment of it (fleet telemetry, GPS corpora) invariably pairs them
with the classic mining suite: stay-point detection, origin-destination
flows, co-movement (flock/convoy primitive), uniform-grid resampling,
and polyline simplification. Each is re-expressed declaratively:

- stay-points  = gaps-and-islands over a lag window (zero joins);
- OD flows     = two rank windows + one equi-join on (user, day);
- co-movement  = bucketed self-equi-join on the time bucket — never
  all-pairs: the day bucket bounds the join fan-out exactly like the
  eps-grid cell join in ``traj_range_query_2d``;
- resampling   = per-segment ``sequence()`` explode — linear, no join,
  grid points are generated WHERE the data lives;
- simplification = Douglas-Peucker per user via ``applyInPandas``
  (order-sensitive recursion — the one WEAK row here; kernel
  property-tested in ``tests/test_mining.py``).

All scale shapes are linear or bucket-bounded; nothing is quadratic in
users or events.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import kernels
from ..registry import query
from ..tables import Tables

_STAY_EPS = 10.0  # max |value| drift within a stay island
_CO_EPS = 1.0  # co-movement value proximity
_CO_MIN_DAYS = 3  # min shared days to call a pair co-moving
_OD_CELL = 50.0  # value-grid cell for OD endpoints
_GRID_US = 21_600_000_000  # 6 h resample grid
_DP_TOL = 40.0  # Douglas-Peucker tolerance in the (days, value) plane


@query(
    "traj_staypoints",
    oracle="""
    WITH p AS (
        SELECT user_id, value, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN ABS(value - LAG(value) OVER w) <= 10.0
                    THEN 0 ELSE 1 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                       AS BIGINT) AS island
        FROM p
    )
    SELECT user_id, island, COUNT(*) AS n_pts,
           MIN(us) AS start_us, MAX(us) AS end_us,
           ROUND(SUM(value), 6) AS sum_value
    FROM i GROUP BY user_id, island HAVING COUNT(*) >= 2
    """,
)
def traj_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive points whose
    value drifts <= eps=10 step-to-step (the 1-D analog of the classic
    GPS stay-point: consecutive fixes within a radius).

    Gaps-and-islands: one lag window marks island breaks, a running sum
    numbers islands, one hash aggregate summarizes them — two window
    sorts and one shuffle total, linear in events at any scale (the
    window key is user_id, the corpus's natural partition key)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = (
        t.events.select("user_id", "value", "event_id", "ts")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn(
            "brk",
            F.when(
                F.abs(F.col("value") - F.lag("value").over(w)) <= _STAY_EPS, 0
            ).otherwise(1),
        )
        .withColumn("island", F.sum("brk").over(wc))
    )
    return (
        p.groupBy("user_id", "island")
        .agg(
            F.count("*").alias("n_pts"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .filter(F.col("n_pts") >= 2)
    )


@query(
    "traj_od_flows",
    oracle="""
    WITH r AS (
        SELECT user_id, value, event_id, ts,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy
        FROM events
    ),
    rr AS (
        SELECT user_id, dy, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, dy
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, dy
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM r
    )
    SELECT CAST(FLOOR(o.value / 50.0) AS BIGINT) AS o_cell,
           CAST(FLOOR(d.value / 50.0) AS BIGINT) AS d_cell,
           COUNT(*) AS n_flows,
           COUNT(DISTINCT o.user_id) AS n_users
    FROM (SELECT * FROM rr WHERE rn_a = 1) o
    JOIN (SELECT * FROM rr WHERE rn_d = 1) d
      USING (user_id, dy)
    GROUP BY 1, 2
    """,
)
def traj_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination matrix: for every (user, day), the day's first
    and last fix snapped to a 50-unit value cell; flows aggregated over
    all user-days.

    Both endpoint ranks come from the SAME (user_id, dy) window sort —
    Catalyst evaluates the asc and desc rank in one Window node — then
    a self-equi-join on the (user, day) key (bounded: exactly one row
    per side per key) and a 100-cell hash aggregate. At 100 TB the
    window sort is the only data-sized shuffle."""
    t = Tables(spark, sf_dir)
    r = t.events.select(
        "user_id",
        "value",
        "event_id",
        "ts",
        F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
    )
    wkey = W.partitionBy("user_id", "dy")
    rr = r.select(
        "user_id",
        "dy",
        "value",
        F.row_number().over(wkey.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(wkey.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_d"),
    )
    o = rr.filter(F.col("rn_a") == 1).select("user_id", "dy", "value")
    d = rr.filter(F.col("rn_d") == 1).select(
        "user_id", "dy", F.col("value").alias("d_value")
    )
    return (
        o.join(d, ["user_id", "dy"])
        .groupBy(
            F.floor(F.col("value") / _OD_CELL).alias("o_cell"),
            F.floor(F.col("d_value") / _OD_CELL).alias("d_cell"),
        )
        .agg(
            F.count("*").alias("n_flows"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "traj_comovement",
    oracle="""
    WITH b AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               MIN(value) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT a.user_id AS user_a, c.user_id AS user_b,
           COUNT(*) AS n_days
    FROM b a JOIN b c
      ON a.dy = c.dy AND a.user_id < c.user_id
     AND ABS(a.v - c.v) <= 1.0
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
)
def traj_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-movement pairs (the flock/convoy primitive): user pairs whose
    daily MIN(value) fixes landed within eps=1.0 of each other on >= 3
    distinct days.

    The representative per (user, day) is MIN — order-insensitive and
    bit-identical across engines (an AVG would expose summation-order
    ulps at the eps boundary). Pairing is an equi-join on the DAY
    bucket, so fan-out per join key is the number of users active that
    day — never all-pairs across the corpus. Inside the bucket the join
    key additionally carries an eps-sized VALUE CELL (one side probes
    its 3 neighbor cells, so every qualifying pair is matched in
    exactly one cell): fan-out per physical join key is users-per-
    (day, cell), not users-per-day — the eps-grid trick from
    ``traj_range_query_2d`` applied to the social dimension. A
    dense-city day cannot quadratically explode one key."""
    t = Tables(spark, sf_dir)
    b = (
        t.events.groupBy(
            "user_id",
            F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
        )
        .agg(F.min("value").alias("v"))
        .withColumn("cell", F.floor(F.col("v") / _CO_EPS))
    )
    probe = b.withColumn(
        "cell", F.explode(F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1))
    )
    a, c = probe.alias("a"), b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.dy") == F.col("c.dy"))
            & (F.col("a.cell") == F.col("c.cell"))
            & (F.col("a.user_id") < F.col("c.user_id"))
            & (F.abs(F.col("a.v") - F.col("c.v")) <= _CO_EPS),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"),
            F.col("c.user_id").alias("user_b"),
        )
        .agg(F.count("*").alias("n_days"))
        .filter(F.col("n_days") >= _CO_MIN_DAYS)
    )


@query(
    "traj_resample",
    oracle="""
    WITH p AS (
        SELECT user_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS nus,
               LEAD(value) OVER w AS nv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
        SELECT user_id, us, nus, value, nv,
               CAST(CEIL(us / 21600e6) AS BIGINT) AS g_lo,
               CAST(FLOOR((nus - 1) / 21600e6) AS BIGINT) AS g_hi
        FROM p WHERE nus IS NOT NULL AND nus > us
    )
    SELECT user_id, g * 21600000000 AS grid_us,
           ROUND(value + (nv - value) * (g * 21600e6 - us) / (nus - us),
                 6) AS v
    FROM seg, LATERAL (
        SELECT UNNEST(generate_series(g_lo, g_hi)) AS g
    ) gs
    WHERE g_lo <= g_hi
    """,
)
def traj_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-grid resampling: linear interpolation of every user's
    series onto a 6-hour grid — the preprocessing step the DP kernels
    (Fréchet/DTW) want when sampling rates differ across users [P §2].

    Segment-local generation: each consecutive-point segment emits
    exactly the grid instants it spans (half-open [us, nus) so a grid
    point on a shared boundary is emitted once), via ``sequence()`` +
    explode — grid points are born distributed on the partition that
    holds the segment; no join against a generated calendar table, no
    driver involvement. One window sort, then map-side math."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        t.events.select("user_id", "value", "event_id", "ts")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("nus", F.lead(F.unix_micros("ts")).over(w))
        .withColumn("nv", F.lead("value").over(w))
        .filter(F.col("nus").isNotNull() & (F.col("nus") > F.col("us")))
    )
    seg = p.select(
        "user_id",
        "us",
        "nus",
        "value",
        "nv",
        F.ceil(F.col("us") / F.lit(21600e6)).alias("g_lo"),
        F.floor((F.col("nus") - 1) / F.lit(21600e6)).alias("g_hi"),
    ).filter(F.col("g_lo") <= F.col("g_hi"))
    g = F.explode(F.sequence("g_lo", "g_hi")).alias("g")
    return seg.select("user_id", "us", "nus", "value", "nv", g).select(
        "user_id",
        (F.col("g") * _GRID_US).alias("grid_us"),
        F.round(
            F.col("value")
            + (F.col("nv") - F.col("value"))
            * (F.col("g") * F.lit(21600e6) - F.col("us"))
            / (F.col("nus") - F.col("us")),
            6,
        ).alias("v"),
    )


@query("traj_simplify_dp")  # WEAK: recursive split order, not SQL
def traj_simplify_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker polyline simplification per user in the
    (time-in-days, value) plane, tolerance 40.0 — the standard
    pre-index compaction for trajectory corpora (fewer points, bounded
    geometric error, so every distance oracle downstream gets cheaper).

    Per-user recursion is order-sensitive (split at the farthest point,
    recurse on both halves) — a WEAK row, run as one ``applyInPandas``
    over user groups with the NumPy kernel in
    ``functions/kernels.py``; properties (endpoints kept, every dropped
    point within tol of the kept polyline) pinned in
    ``tests/test_mining.py``. Scale shape: trajectories are grouped by
    user_id (the natural partition key); the kernel is O(n^2) worst
    case per user but linear-ish in practice, and never leaves the
    executor."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = (
        t.events.join(F.broadcast(t0))
        .select(
            "user_id",
            ((F.unix_micros("ts") - F.col("t0")) / 86400000000.0).alias("x"),
            F.col("value").alias("y"),
            F.row_number().over(w).alias("idx"),
        )
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx").reset_index(drop=True)
        keep = kernels.douglas_peucker(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(), _DP_TOL
        )
        out = pdf.loc[keep, ["user_id", "idx"]].copy()
        out["y"] = pdf.loc[keep, "y"].round(6)
        return out

    return pts.groupBy("user_id").applyInPandas(
        per_user, "user_id long, idx int, y double"
    )


@query(
    "traj_convoy",
    oracle="""
    WITH b AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               MIN(value) AS v
        FROM events GROUP BY 1, 2
    ),
    pd AS (
        SELECT a.user_id AS user_a, c.user_id AS user_b, a.dy
        FROM b a JOIN b c
          ON a.dy = c.dy AND a.user_id < c.user_id
         AND ABS(a.v - c.v) <= 1.0
    ),
    runs AS (
        SELECT user_a, user_b,
               dy - ROW_NUMBER() OVER (PARTITION BY user_a, user_b
                                       ORDER BY dy) AS island
        FROM pd
    )
    SELECT user_a, user_b,
           CAST(MAX(run_len) AS BIGINT) AS max_run,
           CAST(SUM(run_len) AS BIGINT) AS n_days
    FROM (SELECT user_a, user_b, island, COUNT(*) AS run_len
          FROM runs GROUP BY 1, 2, 3)
    GROUP BY user_a, user_b
    HAVING MAX(run_len) >= 3
    """,
)
def traj_convoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convoy detection proper: pairs co-located (daily MIN fix within
    eps=1.0) on >= 3 CONSECUTIVE days — ``traj_comovement`` counts
    shared days, a convoy requires an unbroken run, the defining
    distinction in the flock/convoy literature.

    Composes the banded (day, eps-cell) pair join with a second
    gaps-and-islands pass: `dy - row_number()` is constant exactly on
    consecutive-day runs, so run lengths fall out of one more window +
    aggregate over the (already small) pair-day stream. No new scale
    surface beyond the co-movement join itself."""
    t = Tables(spark, sf_dir)
    b = (
        t.events.groupBy(
            "user_id",
            F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
        )
        .agg(F.min("value").alias("v"))
        .withColumn("cell", F.floor(F.col("v") / _CO_EPS))
    )
    probe = b.withColumn(
        "cell",
        F.explode(
            F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1)
        ),
    )
    a, c = probe.alias("a"), b.alias("c")
    pd_ = a.join(
        c,
        (F.col("a.dy") == F.col("c.dy"))
        & (F.col("a.cell") == F.col("c.cell"))
        & (F.col("a.user_id") < F.col("c.user_id"))
        & (F.abs(F.col("a.v") - F.col("c.v")) <= _CO_EPS),
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("c.user_id").alias("user_b"),
        F.col("a.dy").alias("dy"),
    )
    w = W.partitionBy("user_a", "user_b").orderBy("dy")
    runs = pd_.withColumn(
        "island", F.col("dy") - F.row_number().over(w)
    )
    run_len = runs.groupBy("user_a", "user_b", "island").agg(
        F.count("*").alias("run_len")
    )
    return (
        run_len.groupBy("user_a", "user_b")
        .agg(
            F.max("run_len").alias("max_run"),
            F.sum("run_len").alias("n_days"),
        )
        .filter(F.col("max_run") >= 3)
    )
