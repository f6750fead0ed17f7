"""Pin the WEAK row in operators/analytics.py: ``emb_kmeans`` must
reproduce a straightforward NumPy Lloyd's implementation (same init =
k lowest vec_ids, same iteration count, argmin ties to the lowest
cluster id) on the real fixture corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from traj_sim_spark_spark.operators.analytics import (
    _KMEANS_ITERS,
    _KMEANS_K,
    emb_kmeans,
)

SF = "/root/testdata/sf0.001"


def _numpy_lloyd(vecs: np.ndarray, ids: np.ndarray):
    """Integer micro-unit Lloyd (the round-9 FULL promotion contract):
    quantize once, integer argmin (ties -> lowest cluster id), exact
    shifted integer means, final assignment vs the round-4 centroids."""
    from traj_sim_spark_spark.operators.analytics import _KM_C

    order = np.argsort(ids)
    vecs, ids = vecs[order], ids[order]
    q = np.round(vecs * 1e6).astype(np.int64)
    cent = q[ids < _KMEANS_K][np.argsort(ids[ids < _KMEANS_K])].copy()
    for _ in range(_KMEANS_ITERS):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin ties -> lowest cluster id
        for c in range(_KMEANS_K):
            members = q[assign == c]
            if len(members):
                cent[c] = (
                    members.sum(axis=0) + len(members) * _KM_C
                ) // len(members) - _KM_C
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    best = d2[np.arange(len(q)), assign]
    return assign, best


def test_emb_kmeans_matches_numpy_lloyd(spark):
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    assign, best = _numpy_lloyd(vecs, ids)
    exp_counts = np.bincount(assign, minlength=_KMEANS_K)
    exp_wcss = np.array(
        [round(float(best[assign == c].sum()) / 1e12, 4)
         for c in range(_KMEANS_K)]
    )

    got = {
        r["cl"]: (r["n_vectors"], r["wcss"])
        for r in emb_kmeans(spark, SF).collect()
    }
    for c in range(_KMEANS_K):
        n, w = got.get(c, (0, 0.0))
        assert n == exp_counts[c], f"cluster {c}: {n} != {exp_counts[c]}"
        assert abs(w - exp_wcss[c]) <= 1e-9, (c, w, exp_wcss[c])


def test_sim_knn_pq_matches_numpy_reference(spark):
    """sim_knn_pq (promoted FULL, round 8) must reproduce a NumPy
    INTEGER PQ: micro-quantize, same deterministic codebook init (16
    lowest vec_ids), 2 integer Lloyd iterations (argmin ties -> lowest
    cid, shifted integer means), ADC scoring, ranking by the exact
    integer sum, display = sum/1e12 rounded to 6."""
    from traj_sim_spark_spark.operators.extras5 import _KMX_C
    from traj_sim_spark_spark.operators.similarity_ext import (
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _PQ_TOPK,
        sim_knn_pq,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    vecs, ids = vecs[order], ids[order]
    q = np.round(vecs * 1e6).astype(np.int64)

    adc = np.zeros(len(q), dtype=np.int64)
    for m in range(_PQ_M):
        sub = q[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
        cent = sub[ids < _PQ_K][np.argsort(ids[ids < _PQ_K])].copy()
        for _ in range(_PQ_ITERS):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(_PQ_K):
                members = sub[assign == c]
                if len(members):
                    cent[c] = (
                        members.sum(axis=0) + len(members) * _KMX_C
                    ) // len(members) - _KMX_C
        d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)
        adc += d2[ids == 0][0][codes]
    mask = ids != 0
    cand = sorted(zip(adc[mask], ids[mask]))[:_PQ_TOPK]
    exp = {int(v): round(float(a) / 1e12, 6) for a, v in cand}

    got = {
        r["vec_id"]: r["adc_d2"]
        for r in sim_knn_pq(spark, SF).collect()
    }
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for v, d in exp.items():
        assert abs(got[v] - d) <= 1e-9, (v, got[v], d)


def test_sim_knn_ivfpq_matches_numpy_reference(spark):
    """sim_knn_ivfpq (promoted FULL, round 8) must reproduce a NumPy
    INTEGER IVFPQ: micro-quantize, per-label coarse centroids as
    shifted integer means, integer argmin cell assignment (ties ->
    lowest label), PQ codebooks trained on integer RESIDUALS with the
    same rules as the flat PQ, nprobe=2 probe by integer coarse
    distance, per-cell ADC tables from the query's integer cell
    residual, ranking by the exact integer sum."""
    from traj_sim_spark_spark.operators.extras5 import _KMX_C
    from traj_sim_spark_spark.operators.similarity_ext import (
        _IVFPQ_NPROBE,
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _PQ_TOPK,
        sim_knn_ivfpq,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.asarray(tbl.column("label").to_pylist(), dtype=np.int64)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    vecs, ids, labels = vecs[order], ids[order], labels[order]
    q = np.round(vecs * 1e6).astype(np.int64)

    # coarse: per-label shifted integer means, argmin (ties -> low label)
    clabels = np.sort(np.unique(labels))
    coarse = np.stack(
        [
            (q[labels == c].sum(axis=0) + (labels == c).sum() * _KMX_C)
            // (labels == c).sum()
            - _KMX_C
            for c in clabels
        ]
    )
    cd2 = ((q[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    cassign = clabels[cd2.argmin(axis=1)]
    resid = q - coarse[np.searchsorted(clabels, cassign)]

    # probe: the query's nprobe nearest cells by (cd2, clabel)
    qi = int(np.where(ids == 0)[0][0])
    probed = [int(c) for _, c in sorted(zip(cd2[qi], clabels))[:_IVFPQ_NPROBE]]

    adc = np.zeros(len(q), dtype=np.int64)
    for m in range(_PQ_M):
        sub = resid[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
        cent = sub[ids < _PQ_K][np.argsort(ids[ids < _PQ_K])].copy()
        for _ in range(_PQ_ITERS):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(_PQ_K):
                members = sub[assign == c]
                if len(members):
                    cent[c] = (
                        members.sum(axis=0) + len(members) * _KMX_C
                    ) // len(members) - _KMX_C
        d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)
        for cell in probed:
            qres = q[qi] - coarse[np.searchsorted(clabels, cell)]
            qsub = qres[m * _PQ_SUB : (m + 1) * _PQ_SUB]
            table = ((cent - qsub) ** 2).sum(axis=1)
            in_cell = cassign == cell
            adc[in_cell] += table[codes[in_cell]]

    mask = np.isin(cassign, probed) & (ids != 0)
    cand = sorted(zip(adc[mask], ids[mask]))[:_PQ_TOPK]
    exp = {int(v): round(float(a) / 1e12, 6) for a, v in cand}

    got = {
        r["vec_id"]: r["adc_d2"] for r in sim_knn_ivfpq(spark, SF).collect()
    }
    assert set(got) == set(exp), (sorted(got.items()), sorted(exp.items()))
    for v, d in exp.items():
        assert abs(got[v] - d) <= 1e-9, (v, got[v], d)


def test_emb_pca_matches_numpy_reference(spark):
    """emb_pca (promoted FULL, round 9) must reproduce an INDEPENDENT
    NumPy PCA implementing the same quantized contract: 1e-4-quantized
    coordinates, exact integer mean (shifted floor div), integer
    covariance numerators, power iteration (all-0.125 init, fixed
    count, first-nonzero sign fix), one deflation.  NumPy's BLAS
    matvecs fold in a different order than the engine's pinned
    seed-first DAG, so the pin is tolerance-based — it catches
    algorithmic drift, while exactness is the oracle's job."""
    from traj_sim_spark_spark.operators.analytics import (
        _KM_C,
        _PCA_DIM,
        _PCA_POWER_ITERS,
        _PCA_Q,
        emb_pca,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    n = len(ids)
    q = np.floor(np.abs(vecs) * _PCA_Q + 0.5).astype(np.int64) * np.where(
        vecs < 0, -1, 1
    )  # ROUND half away from zero, SQL semantics
    mu = (q.sum(axis=0) + n * _KM_C) // n - _KM_C
    cv = q - mu
    cov = (cv.T @ cv).astype(np.float64)

    def top(mat):
        v = np.full(_PCA_DIM, 0.125)
        for _ in range(_PCA_POWER_ITERS):
            w = mat @ v
            v = w / np.linalg.norm(w)
        if v[np.flatnonzero(v)[0]] < 0:
            v = -v
        return v

    e1 = top(cov)
    lam = float(e1 @ cov @ e1)
    e2 = top(cov - lam * np.outer(e1, e1))
    exp = {
        int(i): (
            round(float(c @ e1) / _PCA_Q, 6),
            round(float(c @ e2) / _PCA_Q, 6),
        )
        for i, c in zip(ids, cv)
    }

    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in emb_pca(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v][0] - exp[v][0]) <= 1e-4, (v, got[v], exp[v])
        assert abs(got[v][1] - exp[v][1]) <= 1e-4, (v, got[v], exp[v])


def test_kmeans_exact_matches_integer_lloyd(spark):
    """emb_kmeans_exact == a NumPy integer Lloyd with the identical
    quantize/argmin/shifted-mean rules."""
    import numpy as np
    import pyarrow.parquet as pq

    from traj_sim_spark_spark.operators.extras5 import (
        _KMX_C,
        _KMX_ITERS,
        _KMX_K,
        emb_kmeans_exact,
    )

    tb = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tb["vec_id"])
    vecs = np.stack([np.asarray(x) for x in tb["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    q = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
    cent = q[ids < _KMX_K][np.argsort(ids[ids < _KMX_K])].copy()
    assign = None
    for _ in range(_KMX_ITERS):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest cluster id
        for c in range(_KMX_K):
            m = q[assign == c]
            if len(m):
                cent[c] = (m.sum(axis=0) + len(m) * _KMX_C) // len(
                    m
                ) - _KMX_C
    expected = {
        c: (
            int((assign == c).sum()),
            int(cent[c][0]),
            int(np.abs(cent[c]).sum()),
        )
        for c in range(_KMX_K)
        if (assign == c).sum() > 0
    }
    got = {
        r["cluster_id"]: (r["n_members"], r["c0_micro"], r["l1_micro"])
        for r in emb_kmeans_exact(spark, SF).collect()
    }
    assert got == expected


def test_pq_exact_matches_integer_numpy_pq(spark):
    """sim_knn_pq_exact == a NumPy integer PQ (train/encode/ADC) with
    the identical quantize/argmin/shifted-mean/tie rules."""
    import numpy as np
    import pyarrow.parquet as pq

    from traj_sim_spark_spark.operators.extras5 import (
        _KMX_C,
        _PQX_ITERS,
        _PQX_K,
        _PQX_M,
        _PQX_SUB,
        _PQX_TOPK,
        sim_knn_pq_exact,
    )

    tb = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tb["vec_id"])
    vecs = np.stack([np.asarray(x) for x in tb["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    q = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
    adc = np.zeros(len(ids), dtype=np.int64)
    for m in range(_PQX_M):
        sub = q[:, m * _PQX_SUB : (m + 1) * _PQX_SUB]
        cent = sub[ids < _PQX_K][np.argsort(ids[ids < _PQX_K])].copy()
        for _ in range(_PQX_ITERS):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for cc in range(_PQX_K):
                mem = sub[assign == cc]
                if len(mem):
                    cent[cc] = (
                        mem.sum(axis=0) + len(mem) * _KMX_C
                    ) // len(mem) - _KMX_C
        d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)
        qd2 = d2[ids == 0][0]  # query's ADC table for this subspace
        adc += qd2[codes]
    mask = ids != 0
    orderk = sorted(zip(adc[mask], ids[mask]))[:_PQX_TOPK]
    expected = [(int(v), int(a)) for a, v in orderk]
    got = [
        (r["vec_id"], r["adc_d2"])
        for r in sim_knn_pq_exact(spark, SF).collect()
    ]
    assert got == expected


def test_cosine_hist_sampling_rate_sql_matches_python_isqrt():
    """emb_cosine_hist's vertex-sample rate R = ceil_isqrt(S) is
    computed in Python (math.isqrt) on the Spark side but in SQL
    (float-sqrt candidate, +-1 integer correction) inside the DuckDB
    oracle — the two must agree for every reachable S, else the
    sampled branch diverges engine-to-engine."""
    import math

    import duckdb

    svals = list(range(1, 2000)) + [
        10**4, 10**4 + 1, 10**6 - 1, 10**6, 10**6 + 1,
        (10**6 + 7) ** 2 - 1, (10**6 + 7) ** 2, (10**6 + 7) ** 2 + 1,
        10**12 + 39,
    ]
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT s,
               CASE WHEN (c - 1) * (c - 1) >= s THEN c - 1
                    WHEN c * c >= s THEN c
                    ELSE c + 1 END AS r
        FROM (SELECT CAST(x AS BIGINT) AS s,
                     CAST(SQRT(CAST(x AS DOUBLE)) AS BIGINT) AS c
              FROM (SELECT UNNEST(?) AS x))
        ORDER BY s
        """,
        [svals],
    ).fetchall()
    for s, r_sql in rows:
        r_py = 1 if s == 1 else math.isqrt(s - 1) + 1
        assert r_sql == r_py, (s, r_sql, r_py)
        assert r_sql * r_sql >= s > (r_sql - 1) * (r_sql - 1)


def test_cosine_hist_unit_rate_filter_is_identity(spark):
    """R = 1 must mean the sampled branch is byte-identical to
    all-pairs: the md5 % 1 = 0 predicate keeps every vector (pinned
    on the real fixture ids), so skipping the filter (the shipped
    fast path) is a pure-plan optimization."""
    from pyspark.sql import functions as F

    from traj_sim_spark_spark.tables import Tables

    t = Tables(spark, SF)
    total = t.embeddings.count()
    kept = (
        t.embeddings.filter(
            F.expr(
                "CAST(conv(substring(md5(CAST(vec_id AS STRING)),"
                " 1, 6), 16, 10) AS INT) % 1 = 0"
            )
        ).count()
    )
    assert kept == total
