"""Dedup-clustering hardening tests (VERDICT r1 #5/#7).

- connected_components must survive a LONG-diameter graph: min-label
  propagation needs O(diameter) rounds, and without periodic
  localCheckpoint the logical plan would deepen every round until
  analysis itself blows up. A chain graph is the worst case.
- text_jaccard_neardup's document-frequency cap must actually bound the
  hot-token pair explosion: a token shared by every document may not
  produce quadratic candidate pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traj_sim_spark_spark.operators import text as text_ops
from traj_sim_spark_spark.tables import Tables


def test_connected_components_chain_graph(spark):
    # chain 0-1-2-...-15: diameter 15 forces several checkpoint rounds;
    # without lineage truncation this graph OOMs the driver (plan size
    # grows ~3x per round)
    n = 16
    assert n - 1 > text_ops._CC_CHECKPOINT_EVERY
    nodes = spark.range(n).select(F.col("id").alias("node"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = text_ops.connected_components(nodes, edges)
    rows = {r["node"]: r["label"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(n)}


def test_connected_components_two_components(spark):
    nodes = spark.range(6).select(F.col("id").alias("node"))
    pairs = [(0, 1), (1, 2), (3, 4)]  # {0,1,2}, {3,4}, {5}
    fwd = spark.createDataFrame(pairs, "u long, v long")
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = text_ops.connected_components(nodes, edges)
    rows = {r["node"]: r["label"] for r in labels.collect()}
    assert rows == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


@pytest.fixture(scope="module")
def hot_token_docs(spark, tmp_path_factory):
    """300 docs all sharing one 'hot' token (df=300 > _DF_CAP=100), each
    with one unique token. Uncapped, every pair has Jaccard 1/3 >= 0.2 ->
    ~45k pairs; capped, the hot token is dropped and no pair survives."""
    path = str(tmp_path_factory.mktemp("docs") / "sf")
    n = 300
    assert n > text_ops._DF_CAP
    rows = [(i, f"hot w{i}", "en", "web", len(f"hot w{i}")) for i in range(n)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_df_cap_bounds_hot_token_pairs(spark, hot_token_docs):
    out = text_ops.text_jaccard_neardup(spark, hot_token_docs)
    assert out.count() == 0  # uncapped this would be n*(n-1)/2 = 44850

    t = Tables(spark, hot_token_docs)
    capped = text_ops._jaccard_capped_tokens(t)
    toks = {r["token"] for r in capped.select("token").distinct().collect()}
    assert "hot" not in toks
    assert len(toks) == 300  # every unique token kept


def test_prefix_join_equals_brute_force(spark, sf_dir):
    """Prefix-filter losslessness (the PPJoin theorem): the pruned
    candidate generation in text_setsim_prefix_join must yield EXACTLY
    the pairs a brute-force all-pairs Jaccard >= 0.7 scan yields —
    compared here at sf0.001 on the per-doc summary contract
    (n_matches + integer-quantized argmax with id tie-break)."""
    import duckdb

    from traj_sim_spark_spark.operators.extras5 import (
        text_setsim_prefix_join,
    )

    out = {
        (r["id_a"]): (r["n_matches"], r["best_id_b"], r["best_jaccard"])
        for r in text_setsim_prefix_join(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    brute = con.execute(
        """
        WITH tok AS (
            SELECT DISTINCT d.doc_id, t.token
            FROM documents d,
                 UNNEST(string_split(d.text, ' ')) AS t(token)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS both_n
            FROM tok a JOIN tok b
              ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        hits AS (
            SELECT id_a, id_b, both_n,
                   sa.n + sb.n - both_n AS un
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE 10 * both_n >= 7 * (sa.n + sb.n - both_n)
        ),
        best AS (
            SELECT id_a, id_b, both_n, un,
                   ROW_NUMBER() OVER (
                       PARTITION BY id_a
                       ORDER BY (both_n * 1000000000) // un DESC, id_b
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY id_a) AS n_matches
            FROM hits
        )
        SELECT id_a, n_matches, id_b,
               ROUND(both_n * 1.0 / un, 6)
        FROM best WHERE rk = 1
        """
    ).fetchall()
    brute_map = {r[0]: (r[1], r[2], r[3]) for r in brute}
    assert out == brute_map
    assert len(out) > 0


def test_cc_driver_and_distributed_branches_agree(spark, sf_dir):
    """The union-find fast path and the iterative min-label loop must
    label identically (min node id per component) on the real dedup
    graph — both branches forced via the dispatch cap."""
    from traj_sim_spark_spark.operators import text as text_mod
    from traj_sim_spark_spark.operators.text import text_dedup_cluster

    cap = text_mod._CC_DRIVER_EDGE_CAP
    try:
        text_mod._CC_DRIVER_EDGE_CAP = 2_000_000  # force driver
        fast = {
            (r["doc_id"], r["cluster_id"], r["cluster_size"])
            for r in text_dedup_cluster(spark, sf_dir).collect()
        }
        text_mod._CC_DRIVER_EDGE_CAP = -1  # force distributed
        slow = {
            (r["doc_id"], r["cluster_id"], r["cluster_size"])
            for r in text_dedup_cluster(spark, sf_dir).collect()
        }
    finally:
        text_mod._CC_DRIVER_EDGE_CAP = cap
    assert fast == slow
    assert len(fast) > 0


def test_leakage_safe_split_never_straddles_clusters(spark, sf_dir):
    """The defining property: every near-dup cluster lands entirely in
    ONE split, and the doc-hash baseline (pipe_train_split's scheme)
    would NOT guarantee that on this corpus (the row exists for a
    reason)."""
    from traj_sim_spark_spark.operators.extras5 import (
        pipe_leakage_safe_split,
    )

    rows = pipe_leakage_safe_split(spark, sf_dir).collect()
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}
    # a real multi-doc cluster exists, so the guarantee is non-vacuous
    from collections import Counter

    sizes = Counter(r["cluster_id"] for r in rows)
    assert max(sizes.values()) >= 2
