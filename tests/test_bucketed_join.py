"""Bucketed co-located joins: the at-rest layout that removes the
shuffle from fact-fact joins (SCALE.md §Joins). Writing both sides
bucketed by the join key into the warehouse lets Spark plan a
SortMergeJoin with NO Exchange on either side — at 100 TB that is the
difference between joining in place and moving both tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from daxos_spark.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = load_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    # force the co-located path: disable broadcast + AQE's one-side
    # shuffle preference so the bucket layout is what the planner uses
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        j = orders.join(lineitem, "o_orderkey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # no Exchange below the join: both sides read pre-bucketed
        assert "Exchange" not in join_part, join_part
        assert j.count() > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    t = load_tables(spark, SF_DIR)
    want = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .count()
    )
    got = orders.join(lineitem, "o_orderkey").count()
    assert got == want
