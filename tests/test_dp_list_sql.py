"""Independent pin for the list-layer DP oracles (dp_list_sql).

The driver gate proves Spark == DuckDB on the fixtures; this suite
proves the DuckDB LIST-LAYER recursion == the NumPy kernels on RANDOM
series (seeded), with no Spark in the loop — so a bug that shifted
BOTH engine and oracle the same way on the corpus would still be
caught here, and the antidiagonal list layout is pinned against the
kernels' exact cell semantics (boundaries, bands, prefix-sum edges)
across many shapes, including n=1/m=1 and strongly unequal lengths.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from traj_sim_spark_spark.functions import kernels
from traj_sim_spark_spark.operators import dp_list_sql as D

EPS = 10.0
E2 = 10_000_000**2
DELTA = 8


def _con(rng: np.random.Generator, n_users: int = 6) -> duckdb.DuckDBPyConnection:
    """An in-memory events table: user 1 is the query, users 2.. are
    candidates, lengths vary (including 1 and badly mismatched)."""
    lens = {1: int(rng.integers(1, 40))}
    for u in range(2, n_users + 2):
        lens[u] = int(rng.integers(1, 40))
    rows = []
    eid = 0
    for u, ln in lens.items():
        for i in range(ln):
            rows.append(
                (eid, u, i * 86_400_000_000, float(rng.uniform(-120, 120)))
            )
            eid += 1
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
        " ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, make_timestamp(?), ?)",
        rows,
    )
    return con


def _series(con) -> dict[int, np.ndarray]:
    rows = con.execute(
        "SELECT user_id, list(value ORDER BY ts, event_id)"
        " FROM events GROUP BY user_id"
    ).fetchall()
    return {u: np.asarray(v, dtype=np.float64) for u, v in rows}


def _xy(con) -> dict[int, np.ndarray]:
    rows = con.execute(
        "SELECT user_id, list(epoch_us(ts) ORDER BY ts, event_id),"
        " list(value ORDER BY ts, event_id)"
        " FROM events GROUP BY user_id"
    ).fetchall()
    t0 = min(min(t) for _, t, _ in rows)
    return {
        u: np.stack(
            [
                (np.asarray(t, dtype=np.int64) - t0) / 86400000000.0,
                np.asarray(v, dtype=np.float64),
            ],
            axis=1,
        )
        for u, t, v in rows
    }


def _run(con, series, cols, init, comb, sent, lo="", hi=""):
    sql = (
        D.layer_dp(series, cols, init, comb, sent, lo, hi)
        + "\nSELECT user_id, val FROM fin"
    )
    return dict(con.execute(sql).fetchall())


@pytest.mark.parametrize("seed", range(5))
def test_lcss_edr_erp_1d(seed):
    rng = np.random.default_rng(1000 + seed)
    con = _con(rng)
    vals = _series(con)
    q = vals[1]
    qq = np.round(q * 1e6).astype(np.int64)

    got = _run(
        con,
        D.series_1d(),
        ("avs",),
        f"CASE WHEN ABS(avs[1] - q.qvs[1]) <= {EPS}"
        " THEN CAST(1 AS BIGINT) ELSE 0 END",
        D.lcss_combine(
            f"ABS(avs[y] - q.qvs[k - y + 2]) <= {EPS}"
            f" AND ABS(2 * (y - 1) - k) <= {DELTA}"
        ),
        D.SENT_LCSS,
    )
    for u, a in vals.items():
        if u == 1:
            continue
        assert got[u] == kernels.lcss(a, q, EPS, DELTA), f"lcss u={u}"

    got = _run(
        con,
        D.series_1d(),
        ("avs",),
        f"CASE WHEN {D.D1_INIT} <= {EPS}"
        " THEN CAST(0 AS BIGINT) ELSE 1 END",
        D.edr_combine(f"ABS(avs[y] - q.qvs[k - y + 2]) <= {EPS}"),
        D.SENT_EDR,
    )
    for u, a in vals.items():
        if u == 1:
            continue
        assert got[u] == kernels.edr(a, q, EPS), f"edr u={u}"

    got = _run(
        con,
        D.series_1d_erp(),
        ("avs", "acs", "aps"),
        "LEAST(ABS(avs[1] - q.qvs[1]), acs[1] + q.qcs[1])",
        D.erp_combine("ABS(avs[y] - q.qvs[k - y + 2])"),
        D.SENT_ERP,
    )
    for u, a in vals.items():
        if u == 1:
            continue
        aq = np.round(a * 1e6).astype(np.int64)
        assert got[u] == kernels.erp(aq, qq), f"erp u={u}"


@pytest.mark.parametrize("seed", range(5))
def test_dtw_frechet_banded_float(seed):
    rng = np.random.default_rng(2000 + seed)
    con = _con(rng)
    vals = _series(con)
    xy = _xy(con)
    q1, q2 = vals[1], xy[1]

    got = _run(
        con, D.series_1d(), ("avs",), D.D1_INIT,
        D.dtw_combine(D.D1_CELL), D.SENT_INF,
    )
    for u, a in vals.items():
        if u == 1:
            continue
        assert got[u] == kernels.dtw(a, q1), f"dtw u={u}"

    got = _run(
        con, D.series_2d(), ("ax", "ay"), D.D2_INIT,
        D.frechet_combine(D.D2_CELL), D.SENT_INF,
    )
    for u in xy:
        if u == 1:
            continue
        assert got[u] == kernels.frechet(xy[u], q2), f"fre2 u={u}"

    lo, hi = D.band_clamps(DELTA)
    got = _run(
        con, D.series_1d(), ("avs",), D.D1_INIT,
        D.dtw_combine(D.D1_CELL), D.SENT_INF, lo, hi,
    )
    for u, a in vals.items():
        if u == 1:
            continue
        assert got[u] == kernels.dtw_banded(a, q1, DELTA), f"band u={u}"


@pytest.mark.parametrize("seed", range(3))
def test_int2d_and_erp2d(seed):
    rng = np.random.default_rng(3000 + seed)
    con = _con(rng)
    xy = _xy(con)
    xyq = {
        u: np.round(v * 1e6).astype(np.int64) for u, v in xy.items()
    }
    qq = xyq[1]

    got = _run(
        con,
        D.series_2d_micro(),
        ("ax", "ay"),
        f"CASE WHEN {D.D2Q_INIT} <= {E2}"
        " THEN CAST(1 AS BIGINT) ELSE 0 END",
        D.lcss_combine(f"{D.D2Q_CELL} <= {E2}"),
        D.SENT_LCSS,
    )
    for u in xyq:
        if u == 1:
            continue
        assert got[u] == kernels.lcss_int2d(xyq[u], qq, E2)

    got = _run(
        con,
        D.series_2d_erp(),
        ("ax", "ay", "acs", "aps"),
        f"LEAST({D.sql_isqrt_bound(D.D2Q_INIT)}, acs[1] + q.qcs[1])",
        D.erp_combine(D.sql_isqrt_bound(D.D2Q_CELL)),
        D.SENT_ERP,
    )
    for u in xyq:
        if u == 1:
            continue
        assert got[u] == kernels.erp_int2d(xyq[u], qq)
