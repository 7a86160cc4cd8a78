"""ACID table format: snapshots, time travel, COW merge pruning,
optimistic concurrency, vacuum.

Reference semantics: the apply codeunit commits a package import as one
transaction and re-import replaces matching-PK rows (Codeunit
60000:440-451); readers never observe a half-applied table.  These
tests pin the transactional layer that plain parquet lacks.
"""

import os

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.sources.acid_table import AcidTable, ConcurrentWriteError


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_create_snapshot_roundtrip(spark, orders, tmp_path):
    t = AcidTable.create(spark, str(tmp_path / "t"), orders, key_cols=["o_orderkey"])
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert set(snap.columns) == set(orders.columns)
    assert t.latest_version() == 0


def test_merge_time_travel_and_isolation(spark, orders, tmp_path):
    t = AcidTable.create(spark, str(tmp_path / "t"), orders, key_cols=["o_orderkey"])
    v0_sum = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    delta = orders.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t.merge(delta, ["o_orderkey"])
    # time travel: v0 unchanged, v1 merged
    assert t.snapshot(0).count() == orders.count()
    assert abs(float(t.snapshot(0).agg(F.sum("o_totalprice")).collect()[0][0]) - float(v0_sum)) < 1e-6
    v1 = t.snapshot(1)
    assert v1.count() == orders.count()  # replace, no inserts here
    expected = float(v0_sum) + float(
        delta.agg(F.sum(F.col("o_totalprice") / 2)).collect()[0][0]
    )
    assert abs(float(v1.agg(F.sum("o_totalprice")).collect()[0][0]) - expected) < 1e-4
    # merged PK rows carry the delta's values
    got = v1.where("o_orderkey % 100 = 0").count()
    assert got == delta.count()


def test_merge_inserts_unmatched(spark, tmp_path):
    base = spark.range(0, 100).withColumn("v", F.col("id") * 10)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    delta = spark.range(90, 110).withColumn("v", F.lit(-1).cast("bigint"))
    t.merge(delta, ["id"])
    snap = t.snapshot()
    assert snap.count() == 110
    assert snap.where("v = -1").count() == 20


def test_merge_prunes_untouched_files(spark, tmp_path):
    # 8 files with disjoint id ranges; a delta hitting one range must
    # carry the other files forward by reference (identical paths)
    base = spark.range(0, 8000).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    m0 = t._read_manifest(0)
    assert len(m0["files"]) == 8
    delta = spark.range(0, 50).withColumn("v", F.lit(1))
    t.merge(delta, ["id"])
    m1 = t._read_manifest(1)
    carried = {e["path"] for e in m0["files"]} & {e["path"] for e in m1["files"]}
    # at least 6 of 8 range-files untouched (delta covers ids 0-49)
    assert len(carried) >= 6
    snap = t.snapshot()
    assert snap.count() == 8000
    assert snap.where("v = 1").count() == 50


def test_append_and_history(spark, tmp_path):
    base = spark.range(0, 100).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.append(spark.range(100, 150).withColumn("v", F.lit(0)))
    assert t.snapshot().count() == 150
    hist = t.history()
    assert [h["operation"] for h in hist] == ["create", "append"]
    assert hist[-1]["num_rows"] == 150


def test_delete_cow(spark, tmp_path):
    base = spark.range(0, 4000).repartitionByRange(4, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    m0 = t._read_manifest(0)
    t.delete("id < 10")
    m1 = t._read_manifest(1)
    carried = {e["path"] for e in m0["files"]} & {e["path"] for e in m1["files"]}
    assert len(carried) >= 3  # only the file holding ids 0-9 rewritten
    assert t.snapshot().count() == 3990
    assert t.snapshot().where("id < 10").count() == 0


def test_concurrent_commit_conflict(spark, tmp_path):
    base = spark.range(0, 10).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    # simulate a racing writer publishing version 1 first
    m = t._read_manifest(0)
    t._publish({**m, "version": 1, "operation": "append"})
    with pytest.raises(ConcurrentWriteError):
        t._publish({**m, "version": 1, "operation": "merge"})
    # append auto-rebases onto the new head instead of failing
    v = t.append(spark.range(10, 20).withColumn("v", F.lit(0)))
    assert v == 2
    # the racing "append" republished v0's files, so head is 10 + 10 new
    assert t.snapshot().count() == 20


def test_vacuum_drops_unreferenced(spark, tmp_path):
    base = spark.range(0, 100).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.overwrite(spark.range(0, 50).withColumn("v", F.lit(1)))
    t.overwrite(spark.range(0, 25).withColumn("v", F.lit(2)))
    deleted = t.vacuum(keep_last=2)
    assert deleted  # v0's files are gone
    assert t.snapshot(2).count() == 25
    assert t.snapshot(1).count() == 50  # within horizon
    with pytest.raises(FileNotFoundError):
        t._read_manifest(0)


def test_reader_never_sees_torn_state(spark, tmp_path):
    """A snapshot resolved BEFORE a merge still reads the old files."""
    base = spark.range(0, 1000).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    old = t.snapshot()  # resolves v0's file list now
    t.merge(spark.range(0, 1000).withColumn("v", F.lit(1)), ["id"])
    assert old.where("v = 1").count() == 0  # immutable files: unaffected
    assert t.snapshot().where("v = 1").count() == 1000
