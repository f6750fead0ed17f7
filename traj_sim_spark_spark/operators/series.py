"""Per-entity time-series analytics over the dense daily grid.

These rows extend the ``rel_gapfill`` calendar-densification primitive
with the three series operators a monitoring/feature pipeline runs right
after densifying: exponential smoothing, autocorrelation, and robust
(MAD) anomaly detection. All three share one engineering idea — the
daily value is quantized ONCE to integer micro-units (``BIGINT``), and
every downstream statistic is either exact integer/DECIMAL arithmetic or
a final single float expression over exact integers, so the results are
bit-reproducible across engines, partitionings and reruns (the same
fixed-point discipline as ``graph_pagerank`` / ``rel_agg_basic``).

- ``rel_ewma`` — 16-day exponentially weighted moving average with
  half-life weights 2^-(j+1). Powers of two make every weighted term an
  exact integer: term = si * 2^(15-j) <= ~3e15 < 2^53, so the BIGINT
  numerator is also exactly representable as a double on both engines.
  The window join is linear (each grid day explodes to the <=16 future
  days it contributes to — an equi-join, never a band scan).
- ``rel_autocorr`` — per-user lag-1 Pearson autocorrelation of the
  daily series. The five sufficient statistics (n, Sx, Sy, Sxx, Syy,
  Sxy) accumulate in DECIMAL(38,0) — order-independent — and only the
  final correlation divides in floats.
- ``rel_anomaly_mad`` — robust outlier days per user: |x - median| >
  3 * MAD. Exact interpolating percentiles over INTEGERS make the
  median and MAD quarter-integer-exact in both engines ((a+b)/2 of
  values < 2^52 is exact IEEE), so even the strict > comparison is
  deterministic — no epsilon needed.
- ``rel_changepoint`` — the split day maximizing the CUSUM-scaled mean
  shift, from one window pass of exact BIGINT prefix sums and a
  row_number argmax with an earliest-day tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

#: EWMA window length (days). 16 keeps si * 2^15 * 16 < 2^53 so the
#: integer numerator round-trips exactly through double on any engine.
_EWMA_W = 16

_MAD_K = 3  # anomaly threshold: |x - med| > K * MAD


def _daily_grid(t: Tables) -> DataFrame:
    """Dense (user_id, dy, si) daily grid: per-user daily value sums in
    integer micro-units, zero-filled over each user's [first, last] day
    (the ``rel_gapfill`` densification, kept in fixed point).

    The daily sum accumulates in DECIMAL(18,6) (order-independent), then
    scales to BIGINT micro-units — exact because the decimal already has
    6-digit scale. Calendar days are generated where the data lives
    (per-user ``sequence``), never via a global calendar cross join.
    """
    daily = t.events.groupBy(
        "user_id",
        F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("si")
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("dy").alias("d0"), F.max("dy").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("dy"))
    )
    return cal.join(daily, ["user_id", "dy"], "left").select(
        "user_id", "dy", F.coalesce("si", F.lit(0)).alias("si")
    )


_GRID_SQL = """
    daily AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               CAST(SUM(CAST(value AS DECIMAL(18, 6))) * 1000000
                    AS BIGINT) AS si
        FROM events GROUP BY 1, 2
    ),
    cal AS (
        SELECT user_id, UNNEST(generate_series(d0, d1)) AS dy
        FROM (SELECT user_id, MIN(dy) AS d0, MAX(dy) AS d1
              FROM daily GROUP BY user_id)
    ),
    grid AS (
        SELECT cal.user_id, cal.dy, COALESCE(daily.si, 0) AS si
        FROM cal LEFT JOIN daily USING (user_id, dy)
    )
"""


@query(
    "rel_ewma",
    oracle=f"""
    WITH {_GRID_SQL},
    contrib AS (
        SELECT g.user_id, g.dy + j.j AS dy,
               g.si * CAST(2 AS BIGINT) ** ({_EWMA_W - 1} - j.j) AS term
        FROM grid g
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_EWMA_W - 1}))
                    AS j) j
    ),
    win AS (
        SELECT c.user_id, c.dy,
               CAST(SUM(c.term) AS BIGINT) AS num, COUNT(*) AS k
        FROM contrib c JOIN grid t
          ON t.user_id = c.user_id AND t.dy = c.dy
        GROUP BY 1, 2
    )
    SELECT user_id, dy,
           ROUND(CAST(num AS DOUBLE)
                 / (2 ** {_EWMA_W} - 2 ** ({_EWMA_W} - CAST(k AS INTEGER)))
                 / 1e6, 6) AS ewma
    FROM win
    """,
)
def rel_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-day EWMA of each user's daily value series over the dense
    calendar grid, with half-life weights w_j = 2^-(j+1) (j = days ago),
    renormalized near the series start where fewer than 16 days exist.

    Power-of-two weights are the whole trick: each weighted term
    ``si * 2^(15-j)`` is EXACT BIGINT arithmetic, the <=16-term window
    sum stays below 2^53 (double-exact), and the denominator
    ``2^16 - 2^(16-K)`` is exact — so the EWMA, the canonical
    accumulation-order-sensitive statistic, becomes bit-reproducible
    across engines and partitionings. The window is materialized as a
    LINEAR explode (each grid day emits its <=16 future contributions)
    feeding a plain equi-join on (user_id, day) — per-key fan-out is the
    window length, never a per-user quadratic band scan; at 100 TB this
    is one shuffle clustered on the same (user, day) key the daily
    rollup already produced."""
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    contrib = grid.select(
        "user_id",
        "dy",
        "si",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_W - 1))).alias("j"),
    ).select(
        "user_id",
        (F.col("dy") + F.col("j")).alias("dy"),
        (
            F.col("si")
            * F.expr(f"shiftleft(cast(1 as bigint), {_EWMA_W - 1} - j)")
        ).alias("term"),
    )
    win = (
        contrib.join(grid.select("user_id", "dy"), ["user_id", "dy"])
        .groupBy("user_id", "dy")
        .agg(F.sum("term").alias("num"), F.count("*").alias("k"))
    )
    denom = F.expr(
        f"shiftleft(cast(1 as bigint), {_EWMA_W}) "
        f"- shiftleft(cast(1 as bigint), {_EWMA_W} - cast(k as int))"
    )
    return win.select(
        "user_id",
        "dy",
        F.round(F.col("num") / denom / 1e6, 6).alias("ewma"),
    )


@query(
    "rel_autocorr",
    oracle=f"""
    WITH {_GRID_SQL},
    pairs AS (
        SELECT user_id, si AS y,
               LAG(si) OVER (PARTITION BY user_id ORDER BY dy) AS x
        FROM grid
    ),
    s AS (
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(x) AS DECIMAL(38, 0)) AS sx,
               CAST(SUM(y) AS DECIMAL(38, 0)) AS sy,
               SUM(CAST(x AS DECIMAL(18, 0)) * CAST(x AS DECIMAL(18, 0)))
                   AS sxx,
               SUM(CAST(y AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
                   AS syy,
               SUM(CAST(x AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
                   AS sxy
        FROM pairs WHERE x IS NOT NULL
        GROUP BY user_id HAVING COUNT(*) >= 3
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                                            * CAST(sy AS DOUBLE))
                 / (SQRT(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) ** 2)
                    * SQRT(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) ** 2)), 6) + 0.0 AS acf1
    FROM s
    WHERE n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ** 2 > 0
      AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) ** 2 > 0
    """,
)
def rel_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Pearson autocorrelation of each user's dense daily series —
    the day-over-day persistence feature (burstiness vs momentum) a
    forecasting pipeline computes right after gap-filling.

    The five sufficient statistics accumulate EXACTLY: x, y are BIGINT
    micro-units, their products are DECIMAL(18,0)x(18,0) -> (37,0) and
    sums DECIMAL(38,0) — order-independent, so the groupBy is
    repartition-invariant and cross-engine-identical. Only the final
    one-row-per-user correlation formula runs in floats, over identical
    exact inputs — identical IEEE results. Zero-variance users (constant
    series) are excluded on both sides rather than emitting NULL/NaN
    divergently. One scan, one window pass, one hash aggregate — linear
    at any scale."""
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    w = W.partitionBy("user_id").orderBy("dy")
    pairs = grid.select(
        "user_id",
        F.col("si").alias("y"),
        F.lag("si").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    s = (
        pairs.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("sx"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            F.sum(d18("x") * d18("x")).alias("sxx"),
            F.sum(d18("y") * d18("y")).alias("syy"),
            F.sum(d18("x") * d18("y")).alias("sxy"),
        )
        .filter(F.col("n") >= 3)
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    var_x = F.col("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    var_y = F.col("n") * dbl("syy") - dbl("sy") * dbl("sy")
    acf = (F.col("n") * dbl("sxy") - dbl("sx") * dbl("sy")) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return (
        s.filter((var_x > 0) & (var_y > 0))
        .select(
            "user_id",
            F.col("n").alias("n_pairs"),
            # + 0.0 collapses IEEE negative zero (a correlation that
            # rounds to zero must render identically on both engines)
            (F.round(acf, 6) + 0.0).alias("acf1"),
        )
    )


@query(
    "rel_anomaly_mad",
    oracle=f"""
    WITH {_GRID_SQL},
    med AS (
        SELECT user_id, quantile_cont(si, 0.5) AS med
        FROM grid GROUP BY user_id
    ),
    dev AS (
        SELECT g.user_id, g.si, m.med, ABS(g.si - m.med) AS dev
        FROM grid g JOIN med m USING (user_id)
    ),
    mad AS (
        SELECT user_id, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           COUNT(*) AS n_days,
           ROUND(ANY_VALUE(d.med) / 1e6, 6) AS med_value,
           ROUND(ANY_VALUE(m.mad) / 1e6, 6) AS mad_value,
           CAST(SUM(CASE WHEN d.dev > {_MAD_K} * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM dev d JOIN mad m USING (user_id)
    GROUP BY d.user_id
    """,
)
def rel_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly days: count of days where the daily value
    deviates from the user's median by more than 3 median-absolute-
    deviations — the outlier gate that, unlike z-scores, a single spike
    cannot poison (the spike inflates the stddev but not the MAD).

    Exactness argument: the series values are BIGINT micro-units, and
    both engines compute the exact interpolating percentile, whose only
    arithmetic at q=0.5 is (a+b)/2 over integers < 2^52 — IEEE-exact —
    so median, deviations (half-integers), MAD (quarter-integers), and
    even the STRICT ``dev > 3*MAD`` comparison are deterministic with no
    epsilon. Two grouped percentile passes + one counting aggregate, all
    clustered on user_id — one shuffle key end-to-end; at 100 TB the
    exact per-user percentile is a per-key sort of that user's days,
    which is exactly what the reference's per-trajectory kernels already
    assume fits a task."""
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    med = grid.groupBy("user_id").agg(
        F.expr("percentile(si, 0.5)").alias("med")
    )
    dev = grid.join(med, "user_id").select(
        "user_id",
        "med",
        F.abs(F.col("si") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.first("med") / 1e6, 6).alias("med_value"),
            F.round(F.first("mad") / 1e6, 6).alias("mad_value"),
            F.sum(
                F.when(F.col("dev") > _MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
        )
    )


_CP_MIN_SPAN = 8  # minimum grid days for a changepoint to be meaningful


@query(
    "rel_changepoint",
    oracle=f"""
    WITH {_GRID_SQL},
    cum AS (
        SELECT user_id, dy,
               SUM(si) OVER (PARTITION BY user_id ORDER BY dy) AS cl,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dy)
                   AS nl,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               SUM(si) OVER (PARTITION BY user_id) AS tot
        FROM grid
    ),
    stat AS (
        SELECT user_id, dy, nl, n,
               cl * 1.0 / nl AS mean_l,
               (tot - cl) * 1.0 / (n - nl) AS mean_r,
               ABS(cl * 1.0 / nl - (tot - cl) * 1.0 / (n - nl))
                   * SQRT(nl * (n - nl) * 1.0 / n) AS z
        FROM cum
        WHERE n >= {_CP_MIN_SPAN} AND nl < n
    ),
    best AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY z DESC, dy ASC) AS rk
        FROM stat
    )
    SELECT user_id, dy AS split_dy,
           ROUND(z / 1e6, 6) AS shift_stat,
           ROUND(mean_l / 1e6, 6) AS mean_before,
           ROUND(mean_r / 1e6, 6) AS mean_after
    FROM best WHERE rk = 1
    """,
)
def rel_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single changepoint detection per user: the split day of the dense
    daily series maximizing the scaled mean shift
    |mean_L − mean_R|·sqrt(nL·nR/n) — the CUSUM-equivalent statistic a
    monitoring pipeline uses to date a regime change (deploys, habit
    changes, sensor drift).

    One window pass builds per-day prefix sums (exact BIGINT — the
    dense grid's integer micro-units again), every candidate split's
    statistic is ONE float expression over exact integers (identical
    IEEE result in any engine), and the argmax is a row_number with the
    earliest-day tie-break, so even equal-statistic plateaus resolve
    deterministically. Cost: one sort per user (the window) + one
    window-ranked reduction — linear in user-days, no self-join over
    splits, clustered on user_id end-to-end."""
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    w = W.partitionBy("user_id").orderBy("dy")
    wall = W.partitionBy("user_id")
    cum = grid.select(
        "user_id",
        "dy",
        F.sum("si").over(w).alias("cl"),
        F.row_number().over(w).alias("nl"),
        F.count("*").over(wall).alias("n"),
        F.sum("si").over(wall).alias("tot"),
    )
    mean_l = F.col("cl") * 1.0 / F.col("nl")
    mean_r = (F.col("tot") - F.col("cl")) * 1.0 / (F.col("n") - F.col("nl"))
    z = F.abs(mean_l - mean_r) * F.sqrt(
        F.col("nl") * (F.col("n") - F.col("nl")) * 1.0 / F.col("n")
    )
    stat = cum.filter(
        (F.col("n") >= _CP_MIN_SPAN) & (F.col("nl") < F.col("n"))
    ).select(
        "user_id",
        "dy",
        mean_l.alias("mean_l"),
        mean_r.alias("mean_r"),
        z.alias("z"),
    )
    wr = W.partitionBy("user_id").orderBy(F.desc("z"), F.asc("dy"))
    return (
        stat.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("dy").alias("split_dy"),
            F.round(F.col("z") / 1e6, 6).alias("shift_stat"),
            F.round(F.col("mean_l") / 1e6, 6).alias("mean_before"),
            F.round(F.col("mean_r") / 1e6, 6).alias("mean_after"),
        )
    )
