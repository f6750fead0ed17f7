"""Oracle parity for every registered query at sf0.001 (fast tier).

Mirrors the driver's correctness gate (SURVEY.md §5.2-1): row count +
sorted column names + order-insensitive normalized values against DuckDB.
The driver runs the same comparison at sf0.01; tools/check.py runs it
ad hoc at any sf.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from traj_sim_spark_spark import registry
from traj_sim_spark_spark.tables import TABLE_NAMES

from conftest import SF_TEST

registry.load_all()


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


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_TEST}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", sorted(registry.QUERIES))
def test_query_matches_oracle(key, spark, sf_dir, oracle_con):
    sdf = registry.QUERIES[key](spark, sf_dir).toPandas()
    oracle = registry.ORACLES.get(key)
    if oracle is None:
        # WEAK row: structural check only
        assert len(sdf) >= 0 and len(sdf.columns) > 0
        return
    ddf = oracle_con.execute(oracle).fetchdf()
    scols, srows = _normalize(sdf)
    dcols, drows = _normalize(ddf)
    assert scols == dcols, f"{key}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{key}: rowcount {len(srows)} vs {len(drows)}"
    assert srows == drows, f"{key}: value mismatch"
