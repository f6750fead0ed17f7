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


# ---------------------------------------------------------------------------
# Driver-scale tier for keys the driver has never checked
# ---------------------------------------------------------------------------
#
# The correctness driver samples a 50-key window per round, so some keys
# wait rounds for a hard external row. Until each key's row lands, this
# tier runs the SAME comparison at the driver's own scale (sf0.01 — the
# fast tier above runs sf0.001): the set is derived from the recorded
# CORRECTNESS_r*.json files, so it shrinks automatically as the window
# rotates and disappears once every key has driver evidence.

import glob as _glob
import json as _json
import os as _os

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
# "Driver-seen" means a row with hash_match==true — a stale err row
# (e.g. the rounds-1/2 no_oracle rows) is NOT coverage.  For WEAK keys
# (no oracle registered) the driver can only ever record rows_match, so
# any non-err row counts for those.
_DRIVER_GREEN: set[str] = set()
_DRIVER_ROWS_OK: set[str] = set()
for _p in sorted(_glob.glob(_os.path.join(_REPO, "CORRECTNESS_r*.json"))):
    try:
        with open(_p) as _f:
            for _k, _v in _json.load(_f).items():
                if isinstance(_v, dict):
                    if _v.get("hash_match") is True:
                        _DRIVER_GREEN.add(_k)
                    if _v.get("spark_rows") is not None and not _v.get(
                        "err"
                    ) == "spark_error":
                        _DRIVER_ROWS_OK.add(_k)
    except (OSError, ValueError):
        pass

ROWLESS_KEYS = sorted(
    k
    for k in registry.QUERIES
    if (
        k not in _DRIVER_GREEN
        if k in registry.ORACLES
        else k not in _DRIVER_ROWS_OK
    )
)
SF_DRIVER = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con_driver_scale():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DRIVER}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", ROWLESS_KEYS)
def test_rowless_key_matches_oracle_at_driver_scale(
    key, spark, oracle_con_driver_scale
):
    sdf = registry.QUERIES[key](spark, SF_DRIVER).toPandas()
    oracle = registry.ORACLES.get(key)
    if oracle is None:
        assert len(sdf) >= 0 and len(sdf.columns) > 0
        return
    ddf = oracle_con_driver_scale.execute(oracle).fetchdf()
    scols, srows = _normalize(sdf)
    dcols, drows = _normalize(ddf)
    assert scols == dcols, f"{key}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{key}: rowcount {len(srows)} vs {len(drows)}"
    )
    assert srows == drows, f"{key}: value mismatch"
