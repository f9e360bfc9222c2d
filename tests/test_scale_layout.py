"""Scale-layout evidence: partition pruning, bucketed joins, SQL text.

These pin the at-scale storage patterns the engine relies on at 100 TB:
hive-style partition columns prune entire directories at planning time,
bucketed tables co-locate join keys so the join runs with NO exchange,
and the registered-views SQL interface matches duckdb on shared-dialect
text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from daxos_spark.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _plan(df, mode="formatted"):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_partition_pruning(spark, tmp_path):
    o = load_tables(spark, SF_DIR)["orders"]
    path = str(tmp_path / "orders_by_year")
    o.withColumn("o_year", F.year("o_orderdate")).write.partitionBy("o_year").parquet(path)

    part = spark.read.parquet(path)
    q = part.filter(F.col("o_year") == 1997).agg(F.count(F.lit(1)))
    plan = _plan(q)
    # the year filter must prune PARTITIONS (directory-level), not rows
    assert "PartitionFilters" in plan
    assert any(
        "o_year" in line and "1997" in line
        for line in plan.splitlines()
        if "PartitionFilters" in line
    ), plan
    want = o.filter(F.year("o_orderdate") == 1997).count()
    assert q.collect()[0][0] == want


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = load_tables(spark, SF_DIR)
    n_buckets = 4
    # external tables (explicit path): warehouse.dir is a static conf
    t["orders"].write.bucketBy(n_buckets, "o_custkey").sortBy("o_custkey").option(
        "path", str(tmp_path / "b_orders")
    ).mode("overwrite").saveAsTable("b_orders")
    t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_name").write.bucketBy(
        n_buckets, "o_custkey"
    ).sortBy("o_custkey").option("path", str(tmp_path / "b_cust")).mode(
        "overwrite"
    ).saveAsTable("b_cust")

    # disable broadcast so the join would normally shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = _plan(j, "simple")
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = t["orders"].join(
        t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_name"), "o_custkey"
    ).count()
    assert n == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_sql_text_interface_matches_duckdb(spark):
    """register_views + spark.sql on dialect-shared SQL text == duckdb."""
    import duckdb

    from daxos_spark.catalog import register_views

    register_views(spark, SF_DIR)
    sql = """
    SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS min_key
    FROM orders WHERE o_totalprice > 100000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """
    got = [(r["o_orderstatus"], r["n"], r["min_key"]) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Idempotent backfill: dynamic partitionOverwriteMode replaces ONLY
    the partitions present in the incoming batch — the restatement
    pattern a 100 TB partitioned gold table depends on (static mode
    would truncate every other year on each backfill)."""
    o = load_tables(spark, SF_DIR)["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_gold")
    o.write.partitionBy("o_year").parquet(path)
    before = (
        spark.read.parquet(path).groupBy("o_year").count().collect()
    )
    counts0 = {r["o_year"]: r["count"] for r in before}
    assert len(counts0) > 2

    # restate ONE year with a filtered (smaller) batch
    target = sorted(counts0)[0]
    restatement = (
        o.filter(F.col("o_year") == target)
        .filter(F.col("o_orderpriority") == "1-URGENT")
    )
    n_restated = restatement.count()
    assert 0 < n_restated < counts0[target]
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        restatement.write.mode("overwrite").partitionBy("o_year").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    after = {
        r["o_year"]: r["count"]
        for r in spark.read.parquet(path).groupBy("o_year").count().collect()
    }
    assert after[target] == n_restated  # restated partition replaced
    for y, n in counts0.items():  # every other partition untouched
        if y != target:
            assert after[y] == n
