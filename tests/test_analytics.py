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
    order = np.argsort(ids)
    vecs, ids = vecs[order], ids[order]
    cent = vecs[ids < _KMEANS_K][np.argsort(ids[ids < _KMEANS_K])].copy()
    for _ in range(_KMEANS_ITERS):
        d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin ties -> lowest cluster id
        for c in range(_KMEANS_K):
            members = vecs[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    best = d2[np.arange(len(vecs)), assign]
    return assign, best


def test_emb_kmeans_matches_numpy_lloyd(spark):
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    assign, best = _numpy_lloyd(vecs, ids)
    exp_counts = np.bincount(assign, minlength=_KMEANS_K)
    exp_wcss = np.array(
        [best[assign == c].sum() for c in range(_KMEANS_K)]
    )

    got = {
        r["cl"]: (r["n_vectors"], r["wcss"])
        for r in emb_kmeans(spark, SF).collect()
    }
    for c in range(_KMEANS_K):
        n, w = got.get(c, (0, 0.0))
        assert n == exp_counts[c], f"cluster {c}: {n} != {exp_counts[c]}"
        assert abs(w - exp_wcss[c]) <= max(1e-6 * exp_wcss[c], 1e-4)
