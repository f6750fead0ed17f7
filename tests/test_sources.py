"""Source/sink smoke tests + approx-aggregate tolerance (SURVEY.md §2.2-A/D)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from traj_sim_spark_spark import registry
from traj_sim_spark_spark.sources.readers import try_format, write_partitioned
from traj_sim_spark_spark.tables import Tables

registry.load_all()


def test_partitioned_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cust_by_nation")
    t = Tables(spark, sf_dir)
    write_partitioned(
        t.customer, out, partition_cols=["c_nationkey"], sort_cols=["c_custkey"]
    )
    # layout: one directory per partition key -> partition pruning on re-read
    assert any(d.startswith("c_nationkey=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == t.customer.count()
    pruned = back.filter(F.col("c_nationkey") == 3)
    assert pruned.count() == t.customer.filter(F.col("c_nationkey") == 3).count()


def test_optional_formats_probe_gracefully(spark):
    ok, msg = try_format(spark, "delta")
    assert isinstance(ok, bool) and "delta" in msg


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    """The KMV estimate must sit within 5% of the row's own exact twin
    column, and that twin must equal an independent countDistinct."""
    t = Tables(spark, sf_dir)
    exact = {
        r["l_returnflag"]: r["nd"]
        for r in t.lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    rows = registry.QUERIES["rel_agg_approx"](spark, sf_dir).collect()
    for r in rows:
        flag = r["l_returnflag"]
        assert r["nd_exact"] == exact[flag], (flag, r["nd_exact"])
        err = abs(r["apx_parts"] - exact[flag]) / exact[flag]
        assert err <= 0.05, (flag, r["apx_parts"], exact[flag])


def test_compaction_collapses_per_band_files(spark, sf_dir):
    """sink_compaction must leave exactly ONE data file per band
    directory (vs the fragmented stage's many) with identical content."""
    from traj_sim_spark_spark.sources.readers import staging_dir

    registry.QUERIES["sink_compaction"](spark, sf_dir).count()
    root = staging_dir(sf_dir, "compaction")

    def files_per_band(path):
        out = {}
        for d in os.listdir(path):
            if d.startswith("band="):
                out[d] = len(
                    [
                        f
                        for f in os.listdir(os.path.join(path, d))
                        if f.endswith(".parquet")
                    ]
                )
        return out

    frag = files_per_band(os.path.join(root, "frag"))
    comp = files_per_band(os.path.join(root, "compact"))
    assert set(frag) == set(comp) and len(comp) > 0
    assert all(n == 1 for n in comp.values()), comp
    assert any(n > 1 for n in frag.values()), frag
    # content identical either side
    a = spark.read.parquet(os.path.join(root, "frag"))
    b = spark.read.parquet(os.path.join(root, "compact"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
