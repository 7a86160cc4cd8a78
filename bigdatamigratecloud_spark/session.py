"""SparkSession factory tuned for the test harness (local[N]) while keeping
every setting cluster-safe: nothing here assumes a single JVM except the
defaults for shuffle partitioning, which a real deployment would override.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "bigdatamigratecloud_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    AQE is on so runtime stats re-plan joins/partitions (skew-join, small
    partition coalescing) — the Spark-native analogue of the reference's
    size-based execution strategy (inline vs background session,
    Codeunit 60000:482-493).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as long, catalog.load_table converts to µs
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
