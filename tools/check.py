"""Local replica of the driver's correctness gate.

Runs every registered query at a given sf dir on Spark AND its DuckDB
oracle, then compares row count, sorted column names, and an
order-insensitive value comparison (rows sorted after stringifying with
float normalization). Queries without an oracle get a rows-only check.

Usage:  python tools/check.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402
from traj_sim_spark_spark.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 1e-7 noise the same way on both engines
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry.load_all()
    spark = get_session("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for key, fn in sorted(registry.QUERIES.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        oracle = registry.ORACLES.get(key)
        if oracle is None:
            print(f"weak {key}: rows={len(sdf)} cols={sorted(sdf.columns)} "
                  f"({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = _normalize(sdf)
        dcols, drows = _normalize(ddf)
        sdt = {c: sdf[c].dtype.kind + str(sdf[c].dtype.itemsize) for c in sdf.columns}
        ddt = {c: ddf[c].dtype.kind + str(ddf[c].dtype.itemsize) for c in ddf.columns}
        if scols == dcols and sdt != ddt:
            diff_t = {c: (sdt[c], ddt[c]) for c in scols if sdt[c] != ddt[c]}
            print(f"note {key}: dtype mismatch (values may still hash-match): {diff_t}")
        if scols != dcols:
            print(f"FAIL {key}: columns spark={scols} duckdb={dcols}")
            n_fail += 1
        elif len(srows) != len(drows):
            print(f"FAIL {key}: rowcount spark={len(srows)} duckdb={len(drows)}")
            n_fail += 1
        elif srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {key}: values differ, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {key}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
