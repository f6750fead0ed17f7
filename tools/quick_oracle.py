"""Ad-hoc single-query oracle check: python tools/quick_oracle.py key [sf_dir].

Same normalization as tests/test_oracle.py; for fast iteration on one
query without the full pytest sweep.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402
from traj_sim_spark_spark.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def main() -> int:
    keys = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    registry.load_all()
    spark = get_session()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rc = 0
    for key in keys:
        sdf = registry.QUERIES[key](spark, sf_dir).toPandas()
        oracle = registry.ORACLES.get(key)
        if oracle is None:
            print(f"{key}: WEAK ({len(sdf)} rows)")
            continue
        ddf = con.execute(oracle).fetchdf()
        scols, srows = _normalize(sdf)
        dcols, drows = _normalize(ddf)
        if scols != dcols:
            print(f"{key}: FAIL cols {scols} vs {dcols}")
            rc = 1
        elif len(srows) != len(drows):
            print(f"{key}: FAIL rows {len(srows)} vs {len(drows)}")
            rc = 1
        elif srows != drows:
            diff = [
                (a, b) for a, b in zip(srows, drows) if a != b
            ][:3]
            print(f"{key}: FAIL values; first diffs: {diff}")
            rc = 1
        else:
            print(f"{key}: OK ({len(srows)} rows)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
