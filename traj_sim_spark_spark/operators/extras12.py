"""Round-10 additions: batch-workload search rows for the metric/edit
trajectory measures.

The reference's benchmark harness samples a WORKLOAD of query
trajectories and answers them in one run (SURVEY §2.1 R17 -> R9);
``traj_hausdorff_knn_batch`` re-expressed that shape for Hausdorff.
These rows extend it to the two measures whose kernels are DP grids —
ERP (metric, lossless norm bound) and banded LCSS (edit-similarity,
envelope bound) — with the whole batch sharing ONE corpus scan, ONE
series assembly, and ONE Arrow kernel pass, instead of one run per
query.  Unlike the single-query rows (``traj_erp_knn``,
``traj_lcss_knn``), nothing crosses to the driver: the tau_k gate is a
broadcast JOIN against a 3-row per-query tau table, not a collected
scalar — the fully-declarative form of the two-phase search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from . import dp_list_sql as _DL
from .extras6 import (
    _LCSS_DELTA,
    _SEARCH_EPS,
    _SEARCH_K,
    _TAU_CK,
)

#: the sampled query-trajectory workload (mirrors traj_hausdorff_knn_batch)
_BATCH_QIDS = (1, 2, 3)


def _micro_arrays(t: Tables) -> DataFrame:
    """One assembly for the whole workload: per user the micro-quantized
    value series (engine (ts, event_id) order via ``seq``) and its L1
    norm — the ERP gap-cost total, which doubles as the lossless
    triangle bound |L1(a) - L1(q)| <= ERP(a, q) (Chen & Ng)."""
    arr = (
        t.user_points()
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "value"))
            ).alias("p")
        )
        .select(
            "user_id",
            F.expr(
                "transform(p.value,"
                " x -> CAST(ROUND(x * 1e6) AS BIGINT))"
            ).alias("a"),
        )
    )
    return arr.withColumn(
        "nrm",
        F.expr("aggregate(a, CAST(0 AS BIGINT), (s, x) -> s + ABS(x))"),
    )


def _float_arrays(t: Tables) -> DataFrame:
    """Per-user raw float series (LCSS matches on |a_i - q_j| <= eps in
    value units, so no quantization is needed — the kernel decision is
    a float comparison with identical semantics on both engines)."""
    return (
        t.user_points()
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "value"))
            ).alias("p")
        )
        .select("user_id", F.col("p.value").alias("a"))
    )


def _erp_batch_refine(pairs: DataFrame, arr: DataFrame, qarr: DataFrame) -> DataFrame:
    """Exact integer-ERP kernel over (qid, user_id) pairs: candidate
    arrays joined in, query arrays broadcast (3 rows), one Arrow pass
    for the whole workload."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    paired = (
        pairs.join(arr.select("user_id", "a"), "user_id")
        .join(F.broadcast(qarr.select("qid", "qa")), "qid")
        .repartition(
            pairs.sparkSession.sparkContext.defaultParallelism
        )  # AQE coalesces the tiny assembly shuffle; fan the DP out
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.a, dtype=np.int64)
                b = np.asarray(row.qa, dtype=np.int64)
                e = kernels.erp(a, b)
                out.append((row.qid, row.user_id, e, round(e / 1e6, 6)))
            yield pd.DataFrame(
                out, columns=["qid", "user_id", "erp_micro", "erp"]
            )

    return paired.mapInPandas(
        refine,
        schema="qid bigint, user_id bigint, erp_micro bigint, erp double",
    )


def _erp_batch_oracle() -> str:
    # one parameterized list-layer DP per query id (the traj_erp_knn
    # oracle with series_1d_erp(query_user=qid)), UNION ALL'd with the
    # qid tag — deliberately UNFILTERED by the Spark side's bounds so
    # every gate run re-certifies that the two-phase prune loses nothing
    sel = (
        "\nSELECT user_id, CAST(val AS BIGINT) AS erp_micro,"
        "\n       ROUND(val / 1e6, 6) AS erp\nFROM fin"
    )
    parts = []
    for qid in _BATCH_QIDS:
        prefix = _DL.layer_dp(
            _DL.series_1d_erp(qid),
            ("avs", "acs", "aps"),
            "LEAST(ABS(avs[1] - q.qvs[1]), acs[1] + q.qcs[1])",
            _DL.erp_combine("ABS(avs[y] - q.qvs[k - y + 2])"),
            _DL.SENT_ERP,
        )
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, * FROM ({prefix}{sel}"
            f"\nORDER BY val, user_id LIMIT {_SEARCH_K})"
        )
    return "\nUNION ALL\n".join(parts)


@query("traj_erp_knn_batch", oracle=_erp_batch_oracle)
def traj_erp_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH ERP kNN — the reference's workload shape (R17 -> R9) on
    the metric measure: top-10 neighbors by ERP for EVERY query in the
    sampled workload (users 1, 2, 3), answered in one shared run.

    Two-phase per query, fully declarative (no driver round-trip,
    unlike single-query ``traj_erp_knn`` whose tau_k is a collected
    scalar): (1) refine the 30 best L1-norm-bounded candidates per
    query; (2) tau_k = each query's 10th exact distance, computed as a
    3-row aggregate and BROADCAST-JOINED back to gate the remaining
    candidates — any (q, a) with |L1(a) - L1(q)| > tau_k(q) has
    ERP >= bound > tau_k and cannot enter that query's top-10
    (lossless, Chen & Ng); (3) survivors refine, union, per-query rank
    window.  All decisions are integer (micro units).

    Scale shape: ONE series assembly and ONE L1-norm pass serve the
    whole workload (the amortization that makes a 100-query batch
    ~100x cheaper than 100 runs at 100 TB); query arrays ship
    broadcast; the per-query top-k is a rank window, never a global
    sort.  The oracle runs the UNFILTERED list-layer DP per query, so
    every gate re-certifies the prune end-to-end."""
    t = Tables(spark, sf_dir)
    arr = _micro_arrays(t).localCheckpoint()  # consumed by 3+ branches
    qarr = (
        arr.filter(F.col("user_id").isin(*_BATCH_QIDS))
        .select(
            F.col("user_id").alias("qid"),
            F.col("a").alias("qa"),
            F.col("nrm").alias("qn"),
        )
    )
    lb = (
        arr.select("user_id", "nrm")
        .join(F.broadcast(qarr.select("qid", "qn")))
        .filter(F.col("user_id") != F.col("qid"))
        .select(
            "qid",
            "user_id",
            F.abs(F.col("nrm") - F.col("qn")).alias("lb"),
        )
        .localCheckpoint()  # consumed by phase 1 and phase 2
    )
    w_lb = Window.partitionBy("qid").orderBy("lb", "user_id")
    pairs1 = (
        lb.withColumn("rn", F.row_number().over(w_lb))
        .filter(F.col("rn") <= _TAU_CK)
        .select("qid", "user_id")
    )
    first = _erp_batch_refine(pairs1, arr, qarr).localCheckpoint()
    w_e = Window.partitionBy("qid").orderBy("erp_micro", "user_id")
    taus = (
        first.withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= _SEARCH_K)
        .groupBy("qid")
        .agg(F.max("erp_micro").alias("tau"))
    )
    pairs2 = (
        lb.join(F.broadcast(taus), "qid")
        .filter(F.col("lb") <= F.col("tau"))
        .join(pairs1, ["qid", "user_id"], "left_anti")
        .select("qid", "user_id")
    )
    rest = _erp_batch_refine(pairs2, arr, qarr)
    allr = first.select("qid", "user_id", "erp_micro", "erp").unionByName(
        rest.select("qid", "user_id", "erp_micro", "erp")
    )
    return (
        allr.withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= _SEARCH_K)
        .select("qid", "user_id", "erp_micro", "erp")
    )


def _lcss_batch_oracle() -> str:
    # parameterized banded-LCSS list-layer DP per query id (the
    # traj_lcss_knn oracle with series_1d(query_user=qid))
    sel = (
        "\nSELECT user_id, CAST(val AS BIGINT) AS lcss_len,"
        "\n       ROUND(CAST(val AS DOUBLE) / LEAST(n, m), 6)"
        " AS lcss_sim\nFROM fin"
    )
    parts = []
    for qid in _BATCH_QIDS:
        prefix = _DL.layer_dp(
            _DL.series_1d(qid),
            ("avs",),
            f"CASE WHEN ABS(avs[1] - q.qvs[1]) <= {_SEARCH_EPS}"
            " THEN CAST(1 AS BIGINT) ELSE 0 END",
            _DL.lcss_combine(
                f"ABS(avs[y] - q.qvs[k - y + 2]) <= {_SEARCH_EPS}"
                f" AND ABS(2 * (y - 1) - k) <= {_LCSS_DELTA}"
            ),
            _DL.SENT_LCSS,
        )
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, * FROM ({prefix}{sel}"
            "\nORDER BY CAST(val AS DOUBLE) / LEAST(n, m) DESC, user_id"
            f"\nLIMIT {_SEARCH_K})"
        )
    return "\nUNION ALL\n".join(parts)


@query("traj_lcss_knn_batch", oracle=_lcss_batch_oracle)
def traj_lcss_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH banded-LCSS kNN — the workload shape on the
    edit-similarity measure: top-10 most-similar users per sampled
    query (users 1, 2, 3), LCSS_{d,e} with d=8, e=10 (the Vlachos
    time-window form shared with ``traj_lcss_knn``).

    Refine-all by design: the envelope upper bound is measured
    non-discriminative in this dense-eps regime (documented in
    ``extras6._lcss_candidates``; the single-query kNN's phase 2
    refines nearly everything anyway), so the batch row spends its
    savings where they are real — ONE assembly and ONE Arrow kernel
    pass for the whole workload, |workload| x |corpus| DP cells but
    only ONE corpus scan.  In a sparse-eps regime the per-query
    envelope gate composes exactly like ``traj_erp_knn_batch``'s
    broadcast tau join.  Ranking divides the exact integer pair
    (lcss_len, min_len) once; ties break on user_id — identical
    expression text on both engines."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    t = Tables(spark, sf_dir)
    arr = _float_arrays(t).localCheckpoint()  # pairs + query side
    qarr = arr.filter(F.col("user_id").isin(*_BATCH_QIDS)).select(
        F.col("user_id").alias("qid"), F.col("a").alias("qa")
    )
    paired = (
        arr.join(F.broadcast(qarr))
        .filter(F.col("user_id") != F.col("qid"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.a, dtype=np.float64)
                b = np.asarray(row.qa, dtype=np.float64)
                ln = kernels.lcss(a, b, _SEARCH_EPS, _LCSS_DELTA)
                ml = min(len(a), len(b))
                out.append(
                    (row.qid, row.user_id, ln, ml, round(ln / ml, 6))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "qid", "user_id", "lcss_len", "min_len", "lcss_sim"
                ],
            )

    res = paired.mapInPandas(
        refine,
        schema="qid bigint, user_id bigint, lcss_len bigint,"
        " min_len bigint, lcss_sim double",
    )
    # rank on the UNROUNDED exact-integer ratio (identical expression
    # text to the oracle's ORDER BY), not the 6-dp display
    w = Window.partitionBy("qid").orderBy(
        (F.col("lcss_len") / F.col("min_len")).desc(), "user_id"
    )
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SEARCH_K)
        .select("qid", "user_id", "lcss_len", "lcss_sim")
    )
