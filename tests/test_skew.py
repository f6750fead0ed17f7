"""Adversarial skew: the bucketed pair-join builders on a HOT-KEY corpus.

The fixtures are benign; these tests feed the registered builders a
synthetic corpus engineered to concentrate one join bucket (one day,
one eps-cell, hundreds of users' points) and assert (a) completion and
(b) exact DuckDB agreement on the same file — evidence that the
bucket-bounds-the-blowup designs stay CORRECT under the skew they were
designed to survive, not just on friendly data.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from traj_sim_spark_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """events.parquet where day 0 holds 150 users all within one
    eps-cell (every pair qualifies — the worst legal bucket), repeated
    over 3 days so the >=3-shared-days comovement gate passes."""
    d = tmp_path_factory.mktemp("skew")
    rows = []
    eid = 0
    for day in range(3):
        for u in range(150):
            for k in range(3):  # several points per user-day
                rows.append(
                    (
                        eid,
                        pd.Timestamp("2024-01-01")
                        + pd.Timedelta(days=day, minutes=u * 3 + k),
                        u,
                        "view",
                        100.0 + (u % 7) * 0.1,  # one 1.0-eps cell
                        "{}",
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(key: str, skew_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{skew_dir}/events.parquet')"
    )
    return con.execute(registry.ORACLES[key]).fetchdf()


def _norm(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(str(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


@pytest.mark.parametrize(
    "key", ["traj_comovement", "rel_join_interval_overlap", "traj_convoy"]
)
def test_bucketed_join_survives_hot_bucket(spark, skew_dir, key):
    got = registry.QUERIES[key](spark, skew_dir).toPandas()
    want = _oracle(key, skew_dir)
    assert len(got) == len(want), (key, len(got), len(want))
    assert _norm(got) == _norm(want), key
    # the hot bucket really was hot: comovement must have found the
    # quadratic pair set (150 users pairwise co-located)
    if key == "traj_comovement":
        assert len(got) == 150 * 149 // 2
