"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001.
queries()      — every implemented query/operator (SURVEY.md §2 +
                 beyond-parity training-data-pipeline ops).
oracle_sql()   — duckdb-equivalent SQL per query; omitted only for the
                 genuinely non-SQL-expressible ML queries (rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from daxos_spark.plans import get_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full star-schema join rollup at sf0.001."""
    from daxos_spark.plans.relational import q05_region_revenue

    return q05_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in sorted(get_specs().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(get_specs().items())
        if spec.oracle is not None
    }
