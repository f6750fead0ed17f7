"""Oracle-independent invariants for the round-10 additions.

The batch-workload rows must agree with their single-query twins on the
shared query user (qid=1 answers the identical question as
``traj_erp_knn`` / ``traj_lcss_knn``: candidates = every user <> 1,
same kernel, same tie order), and the streaming ingest ledger must
agree with a batch first-principles recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from traj_sim_spark_spark.operators.extras6 import (
    traj_erp_knn,
    traj_lcss_knn,
)
from traj_sim_spark_spark.operators.extras12 import (
    traj_erp_knn_batch,
    traj_lcss_knn_batch,
)
from traj_sim_spark_spark.streaming.streams_ext import stream_ingest_dedup
from traj_sim_spark_spark.tables import Tables


def test_erp_batch_qid1_equals_single_query(spark, sf_dir):
    batch = {
        (r["user_id"], r["erp_micro"])
        for r in traj_erp_knn_batch(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["erp_micro"])
        for r in traj_erp_knn(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_lcss_batch_qid1_equals_single_query(spark, sf_dir):
    batch = {
        (r["user_id"], r["lcss_len"])
        for r in traj_lcss_knn_batch(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["lcss_len"])
        for r in traj_lcss_knn(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_erp_batch_all_queries_covered(spark, sf_dir):
    rows = traj_erp_knn_batch(spark, sf_dir).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == {1, 2, 3}
    for qid, rs in by_qid.items():
        assert len(rs) == 10
        # a query user is never its own candidate, but other query
        # users ARE candidates (the workload semantics of the
        # hausdorff batch row)
        assert all(r["user_id"] != qid for r in rs)


def test_ingest_dedup_ledger_matches_batch(spark, sf_dir):
    ledger = {
        (r["content_hash"], r["keeper_doc_id"], r["n_copies"])
        for r in stream_ingest_dedup(spark, sf_dir).collect()
    }
    t = Tables(spark, sf_dir)
    batch = {
        (r["h"], r["k"], r["n"])
        for r in t.documents.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("k"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert ledger == batch and len(ledger) > 0


def test_dtw_batch_qid1_equals_single_query(spark, sf_dir):
    from traj_sim_spark_spark.operators.extras12 import traj_dtw_knn_batch
    from traj_sim_spark_spark.operators.trajectory import traj_dtw_knn

    batch = {
        (r["user_id"], r["dtw"])
        for r in traj_dtw_knn_batch(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["dtw"])
        for r in traj_dtw_knn(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_frechet_batch_qid1_equals_single_query(spark, sf_dir):
    from traj_sim_spark_spark.operators.extras12 import (
        traj_frechet_knn_batch,
    )
    from traj_sim_spark_spark.operators.trajectory import traj_frechet_knn

    batch = {
        (r["user_id"], r["frechet"])
        for r in traj_frechet_knn_batch(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["frechet"])
        for r in traj_frechet_knn(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0


def test_edr_batch_qid1_equals_single_query(spark, sf_dir):
    from traj_sim_spark_spark.operators.extras6 import traj_edr_knn
    from traj_sim_spark_spark.operators.extras12 import traj_edr_knn_batch

    batch = {
        (r["user_id"], r["edr"])
        for r in traj_edr_knn_batch(spark, sf_dir)
        .filter(F.col("qid") == 1)
        .collect()
    }
    single = {
        (r["user_id"], r["edr"])
        for r in traj_edr_knn(spark, sf_dir).collect()
    }
    assert batch == single and len(batch) > 0
