"""merge_upsert: update + insert + multi-PK semantics, and the plan
property that makes it scale (delta PK probe broadcast, base not
shuffled)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.upsert import merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_updates_and_inserts(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, s string, v double"
    )
    delta = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id int, s string, v double"
    )
    out = merge_upsert(base, delta, ["id"])
    assert _rows(out) == {
        (1, "a", 10.0),   # untouched
        (2, "B", 200.0),  # updated
        (3, "c", 30.0),   # untouched
        (4, "d", 40.0),   # inserted
    }


def test_merge_composite_pk_and_dup_delta(spark):
    base = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "a int, b int, s string")
    # duplicate PKs inside the delta must not multiply base deletions
    delta = spark.createDataFrame([(1, 1, "X"), (1, 1, "X")], "a int, b int, s string")
    out = merge_upsert(base, delta, ["a", "b"])
    assert _rows(out) == {(1, 1, "X"), (1, 1, "X"), (1, 2, "y")}


def test_merge_plan_broadcasts_delta_probe(spark, sf_dir):
    from bigdatamigratecloud_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    delta = o.where(F.col("o_orderkey") % 100 == 0)
    plan = merge_upsert(o, delta, ["o_orderkey"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # base side must not shuffle for the probe


def test_apply_to_target_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """MERGE via dynamic partition overwrite: the delta touches one
    partition; every other partition's files must survive byte-identical
    (no full base rewrite — the plain-parquet stand-in for Delta MERGE)."""
    import os

    from bigdatamigratecloud_spark.operators.upsert import apply_to_target

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, part string, v long",
    )
    apply_to_target(base, path, mode="overwrite", partition_by=["part"])

    def files_with_mtime(part):
        d = os.path.join(path, f"part={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_b, before_c = files_with_mtime("b"), files_with_mtime("c")

    delta = spark.createDataFrame(
        [(2, "a", 99), (5, "a", 50)], "id long, part string, v long"
    )
    apply_to_target(delta, path, mode="upsert", pk_cols=["id"], partition_by=["part"])

    got = {(r.id, r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a", 10), (2, "a", 99), (5, "a", 50), (3, "b", 30), (4, "c", 40)}
    # untouched partitions: same files, same mtimes — never rewritten
    assert files_with_mtime("b") == before_b
    assert files_with_mtime("c") == before_c


def test_apply_to_target_upsert_missing_target_is_fresh_load(spark, tmp_path):
    from bigdatamigratecloud_spark.operators.upsert import apply_to_target

    path = str(tmp_path / "fresh")
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    apply_to_target(df, path, mode="upsert", pk_cols=["id"])
    assert {(r.id, r.v) for r in spark.read.parquet(path).collect()} == {(1, 10)}
