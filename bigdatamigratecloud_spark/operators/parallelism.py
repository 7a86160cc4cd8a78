"""Parallelism guard shared by the CPU-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Repartition up to the session's core count when the input arrives
    in fewer partitions.  The shingle/hash/vector operators do heavy
    per-row CPU work (n-gram explosion, k hash functions per shingle,
    vector normalization); a small corpus file that fits one scan
    partition would otherwise pin ALL of that work to one core —
    measured 3-8× end-to-end on the sf0.1 corpus pipelines.  One tiny
    shuffle of the narrow input buys full-width execution; at real scale
    inputs arrive in many partitions and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
