"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

Not in the reference (its SQL Server target co-locates via clustered
indexes implicitly); this is the Spark-native answer to the 100 TB
question "the fact-to-fact join shuffles both sides every query — how do
we stop paying that?": write both tables bucketed by the join key ONCE,
and every subsequent equi-join on that key reads co-located buckets with
ZERO exchanges (asserted in test_plan_regressions).

Bucketing notes at scale:
- bucket count is a layout-time commitment: pick ~(table size / 128 MB)
  rounded to a power of two, same count on both sides of the join;
- `sortBy` the join key inside buckets so the sort-merge join also skips
  its per-task sort (SortMergeJoin over pre-sorted bucket files);
- buckets survive in the metastore; a real deployment refreshes them
  incrementally (new data appended to matching buckets) rather than
  rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    Pre-repartitioning on the bucket key leaves exactly ONE file per
    bucket — multiple files per bucket would force the downstream
    sort-merge join to re-sort (still shuffle-free, but the per-task sort
    is avoidable).  Pass ``path`` to root the table outside the default
    warehouse dir."""
    dist = df.repartition(n_buckets, *bucket_cols)
    writer = dist.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst sees the
    matching hash-bucket layout on both scans and plans the join with no
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
