"""SparkSession factory.

Scale posture: these settings are what we'd ship on a 1000-executor cluster;
``local[*]`` only changes the master. AQE is on so runtime statistics re-plan
shuffles (coalesce partitions, skew-join split, dynamic broadcast switch);
session timezone is pinned UTC to reproduce the reference's UTC RFC3339
timestamps (/root/reference/main.go:102) and keep DuckDB oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data-ingestor-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At 100 TB, shuffle partitions would be sized to ~128-256 MB per task
    (tens of thousands of partitions); AQE coalesces small ones at runtime,
    so over-provisioning the static number is the safe direction.
    """
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
        # read as long (ns since epoch) and convert in io.table (µs floor,
        # matching DuckDB's read of the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # extra_conf only applies to the FIRST session in a process (getOrCreate
    # reuses an existing one) — used by tools/scale_probe.py to re-enable
    # the UI REST API for task-time skew measurements.
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
