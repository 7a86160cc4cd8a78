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
    # Fault host backing in parallel BEFORE the JVM starts (demand-paged
    # VM memory is ~6 s/GB serial, ~0.6 s/GB parallel — see warmup.py),
    # then have the JVM pre-touch its whole heap at startup.  Together
    # these remove multi-second mid-query page-fault stalls.
    from .warmup import ensure_host_memory_warm

    ensure_host_memory_warm()
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    # Python workers (foreachPartition/mapInPandas closures) must be able
    # to import this package even when the driver launched from elsewhere:
    # propagate the repo root via PYTHONPATH (local mode inherits the
    # driver env; a real cluster would ship a wheel via --py-files).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    if repo_root not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{prev}" if prev else repo_root
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
        .config("spark.driver.memory", driver_mem)
        # fixed, fully pre-touched heap: every heap page is faulted at
        # startup (a few seconds against warmed backing) instead of
        # stalling queries when the heap lazily grows.
        # ReservedCodeCacheSize: the JDK default (240 MB) fills after a
        # few hundred distinct whole-stage-codegen plans (a long bench /
        # oracle-sweep session), at which point HotSpot DISABLES the JIT
        # ("CodeHeap 'non-profiled nmethods' is full") and everything
        # after runs interpreted at ~10x cost — measured 300 s vs 33 s
        # on the minhash->CC pipeline.  1 GB holds the full 250-entry
        # sweep; long-lived cluster executors want the same setting.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch "
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as long, catalog.load_table converts to µs
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
