"""SparkSession construction with scale-aware defaults.

The reference hand-tunes worker/chunk sizing (daxos/distribute.py:8-87,
read.py:113-124); here the equivalents are Spark confs. Tests run on
local[N]; production would run the same confs on a real cluster — the
settings below (AQE, skew-join handling, partition sizing, Arrow) are
chosen for the 100 TB case, not just the local one.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the driver's harness: local[$SPARK_GRAFT_CPUS].
_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "daxos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes (these matter at 100 TB, and are no-ops locally):
      - AQE on: runtime coalescing of post-shuffle partitions, skew-join
        splitting, and dynamic join-strategy switching replace the
        reference's hand-rolled partition→worker maps
        (reference crossvalidate.py:21-53).
      - ``maxPartitionBytes`` 128m: parquet scan granularity; at 100 TB
        this yields ~800k input splits, which AQE coalesces post-shuffle.
      - Arrow enabled: every pandas-UDF boundary is Arrow-batched.
      - Session timezone pinned to UTC so timestamp semantics are
        reproducible across engines (duckdb oracle parity).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _DEFAULT_CPUS))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{_DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
