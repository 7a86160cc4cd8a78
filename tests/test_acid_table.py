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
    e0 = t.entries(0)
    assert len(e0) == 8
    delta = spark.range(0, 50).withColumn("v", F.lit(1))
    t.merge(delta, ["id"])
    carried = {e["path"] for e in e0} & {e["path"] for e in t.entries(1)}
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
    e0 = t.entries(0)
    t.delete("id < 10")
    carried = {e["path"] for e in e0} & {e["path"] for e in t.entries(1)}
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
    # files were written seconds ago: the default in-flight-writer
    # retention window must protect them
    assert t.vacuum(keep_last=2) == []
    deleted = t.vacuum(keep_last=2, retain_seconds=0.0)
    assert deleted  # v0's files are gone
    assert t.snapshot(2).count() == 25
    assert t.snapshot(1).count() == 50  # within horizon
    with pytest.raises(FileNotFoundError):
        t._read_manifest(0)
    # history() survives the pruned log (no version-0 manifest left)
    assert [h["version"] for h in t.history()] == [1, 2]


def test_reader_never_sees_torn_state(spark, tmp_path):
    """A snapshot resolved BEFORE a merge still reads the old files."""
    base = spark.range(0, 1000).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    old = t.snapshot()  # resolves v0's file list now
    t.merge(spark.range(0, 1000).withColumn("v", F.lit(1)), ["id"])
    assert old.where("v = 1").count() == 0  # immutable files: unaffected
    assert t.snapshot().where("v = 1").count() == 1000


def _zorder_orders(orders):
    """Z-key with data-derived normalization bounds — the stats pass a
    real OPTIMIZE ZORDER does first, so both dimensions use their full
    bit range regardless of fixture scale."""
    from bigdatamigratecloud_spark.operators.layout import zorder_key

    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
    )
    b = orders.agg(
        F.min("o_custkey").alias("c0"),
        F.max("o_custkey").alias("c1"),
        F.min(days).alias("d0"),
        F.max(days).alias("d1"),
    ).first()
    key = zorder_key(
        [(F.col("o_custkey"), b["c0"], b["c1"]), (days, b["d0"], b["d1"])], bits=16
    )
    return orders.withColumn("zkey", key)


def test_zorder_scan_prunes_both_dimensions(spark, orders, tmp_path):
    """Write orders twice — linearly sorted by o_custkey, and Z-ordered on
    (o_custkey, order day) — into 16-file AcidTables with stats on both
    columns.  A hyper-rectangle predicate (custkey range AND date range)
    must (a) return exactly the same rows as a full-scan filter on both
    layouts, (b) prune files on BOTH dimensions under the Z layout, and
    (c) show the linear layout failing to prune on the non-leading
    column alone — the reason Z-ordering exists."""
    import datetime

    lo_d, hi_d = datetime.date(1997, 1, 1), datetime.date(1997, 12, 31)
    n_cust = orders.agg(F.max("o_custkey")).first()[0]
    cust_rect = (int(n_cust * 0.4), int(n_cust * 0.6))

    zdf = (
        _zorder_orders(orders)
        .repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )
    lin = (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
    )
    tz = AcidTable.create(
        spark, str(tmp_path / "z"), zdf, key_cols=["o_custkey", "o_orderdate"]
    )
    tl = AcidTable.create(
        spark, str(tmp_path / "lin"), lin, key_cols=["o_custkey", "o_orderdate"]
    )

    ranges = {
        "o_custkey": cust_rect,
        "o_orderdate": (
            datetime.datetime.combine(lo_d, datetime.time()),
            datetime.datetime.combine(hi_d, datetime.time(23, 59, 59)),
        ),
    }
    expect = (
        orders.filter(
            (F.col("o_custkey") >= cust_rect[0])
            & (F.col("o_custkey") <= cust_rect[1])
            & (F.col("o_orderdate") >= F.lit(ranges["o_orderdate"][0]))
            & (F.col("o_orderdate") <= F.lit(ranges["o_orderdate"][1]))
        )
        .select("o_orderkey")
        .collect()
    )
    expect_keys = sorted(r["o_orderkey"] for r in expect)
    assert expect_keys, "rectangle unexpectedly empty"

    zdf_out, zinfo = tz.scan(ranges)
    lin_out, lininfo = tl.scan(ranges)
    assert sorted(r["o_orderkey"] for r in zdf_out.select("o_orderkey").collect()) == expect_keys
    assert sorted(r["o_orderkey"] for r in lin_out.select("o_orderkey").collect()) == expect_keys

    # Z layout skips files on the combined rectangle
    assert zinfo["files_total"] == 16
    assert zinfo["files_read"] < zinfo["files_total"] / 2, zinfo

    # the non-leading column ALONE: linear layout reads everything,
    # Z layout still prunes
    date_only = {"o_orderdate": ranges["o_orderdate"]}
    _, lin_date = tl.scan(date_only)
    _, z_date = tz.scan(date_only)
    assert lin_date["files_read"] == lin_date["files_total"], lin_date
    assert z_date["files_read"] < z_date["files_total"], z_date

    # empty rectangle: zero files opened, empty result, schema preserved
    none_df, none_info = tz.scan({"o_custkey": (10**9, 2 * 10**9)})
    assert none_info["files_read"] == 0
    assert none_df.count() == 0
    assert set(none_df.columns) == set(orders.columns)


def test_change_feed_semantics_and_pruning(spark, tmp_path):
    """changes(): the logical row diff between snapshots — inserts after
    an append, update pre/post pairs + inserts after a merge, deletes
    after a COW delete; empty for identical versions; COW rewrite noise
    (unchanged rows in rewritten files) excluded.  Pruning: the diff job
    must not OPEN files carried unchanged between the two manifests
    (asserted on inputFiles)."""
    base = spark.range(0, 1000).withColumn("v", F.col("id") * 10)
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.repartitionByRange(8, "id").sortWithinPartitions("id"),
        key_cols=["id"],
    )
    # v1: append 100 new ids
    t.append(spark.range(1000, 1100).withColumn("v", F.lit(-1).cast("bigint")))
    c01 = t.changes(0, 1)
    rows = c01.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r["id"] for r in rows) == list(range(1000, 1100))
    # append adds files, carries ALL of v0: none of v0's files opened
    v0_files = {os.path.basename(p) for p in t.snapshot(0).inputFiles()}
    assert not ({os.path.basename(p) for p in c01.inputFiles()} & v0_files)

    # v2: merge touching a narrow key range — updates + one insert
    delta = (
        spark.range(10, 20)
        .withColumn("v", F.lit(777).cast("bigint"))
        .unionByName(
            spark.createDataFrame([(5000, 1)], "id: long, v: long")
        )
    )
    t.merge(delta, ["id"])
    c12 = t.changes(1, 2)
    by_type = {}
    for r in c12.collect():
        by_type.setdefault(r["_change_type"], []).append(r)
    assert sorted(r["id"] for r in by_type["insert"]) == [5000]
    assert sorted(r["id"] for r in by_type["update_preimage"]) == list(range(10, 20))
    assert sorted(r["id"] for r in by_type["update_postimage"]) == list(range(10, 20))
    assert all(r["v"] == r["id"] * 10 for r in by_type["update_preimage"])
    assert all(r["v"] == 777 for r in by_type["update_postimage"])
    assert "delete" not in by_type
    # COW rewrite noise: the rewritten file held ~125 rows, only 10 changed
    assert c12.count() == 1 + 10 + 10
    # pruning: files carried UNCHANGED (same path AND same deletion
    # vector) from v1 to v2 are not opened; a carried file whose vector
    # changed is churn and MUST be read
    import json as _json

    e1 = {e["path"]: _json.dumps(e.get("dv")) for e in t.entries(1)}
    e2 = {e["path"]: _json.dumps(e.get("dv")) for e in t.entries(2)}
    carried = {
        os.path.basename(p) for p in e1 if p in e2 and e1[p] == e2[p]
    }
    assert carried, "merge should carry most files untouched"
    assert not ({os.path.basename(p) for p in c12.inputFiles()} & carried)

    # v3: delete a slice
    t.delete("id >= 100 AND id < 110")
    c23 = t.changes(2, 3)
    drows = c23.collect()
    assert {r["_change_type"] for r in drows} == {"delete"}
    assert sorted(r["id"] for r in drows) == list(range(100, 110))

    # identical versions -> empty, schema intact
    same = t.changes(3, 3)
    assert same.count() == 0
    assert same.columns == ["id", "v", "_change_type"]

    # full span: composition of all three commits
    c03 = t.changes(0, 3)
    got = {(r["id"], r["_change_type"]) for r in c03.collect()}
    assert (5000, "insert") in got
    assert (105, "delete") in got
    assert (15, "update_preimage") in got and (15, "update_postimage") in got
    assert (1005, "insert") in got


def test_compact_small_files(spark, tmp_path):
    """Many narrow appends leave many small files; compact() rewrites the
    snapshot into the target file count as one atomic commit with data
    and stats preserved, and the pre-compact version still time-travels
    until vacuum."""
    base = spark.range(0, 200).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base.coalesce(1), key_cols=["id"])
    for i in range(6):
        t.append(
            spark.range(200 + i * 50, 250 + i * 50).withColumn("v", F.col("id") * 2).coalesce(1)
        )
    pre_version = t.latest_version()
    pre_files = len(t.entries(pre_version))
    assert pre_files >= 7
    total = t.snapshot().count()

    v = t.compact(target_files=2)
    m = t._read_manifest(v)
    assert m["operation"] == "optimize"
    ents = t.entries(v)
    assert len(ents) == 2
    assert t.snapshot().count() == total
    assert t.snapshot().agg(F.sum("v")).first()[0] == base.unionByName(
        spark.range(200, 500).withColumn("v", F.col("id") * 2)
    ).agg(F.sum("v")).first()[0]
    # range-partitioned on the key: per-file id ranges are disjoint,
    # so merge pruning still works after compaction
    ranges = sorted((e["stats"]["id"]["min"], e["stats"]["id"]["max"]) for e in ents)
    assert ranges[0][1] < ranges[1][0]
    # time travel to the pre-compact version still reads the old files
    assert t.snapshot(pre_version).count() == total
    # changes across a pure compaction: the logical diff is empty
    assert t.changes(pre_version, v).count() == 0


def test_optimize_zorder_enables_multi_dim_pruning(spark, orders, tmp_path):
    """OPTIMIZE ZORDER BY (o_custkey, o_orderdate): after the rewrite, a
    hyper-rectangle scan prunes files on BOTH columns (stats are
    collected for the z columns automatically), and the data survives
    byte-identical."""
    import datetime

    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        orders.repartition(16),
        key_cols=["o_orderkey"],
    )
    total = t.snapshot().count()
    v = t.optimize_zorder(["o_custkey", "o_orderdate"], target_files=16)
    m = t._read_manifest(v)
    assert m["operation"] == "optimize-zorder"
    assert t.snapshot().count() == total
    # every file now carries stats on both z columns
    assert all(
        "o_custkey" in e["stats"] and "o_orderdate" in e["stats"] for e in t.entries(v)
    )

    n_cust = orders.agg(F.max("o_custkey")).first()[0]
    ranges = {
        "o_custkey": (int(n_cust * 0.4), int(n_cust * 0.6)),
        "o_orderdate": (
            datetime.datetime(1997, 1, 1),
            datetime.datetime(1997, 12, 31, 23, 59, 59),
        ),
    }
    out, info = t.scan(ranges)
    assert info["files_read"] < info["files_total"], info
    expect = orders.filter(
        (F.col("o_custkey") >= ranges["o_custkey"][0])
        & (F.col("o_custkey") <= ranges["o_custkey"][1])
        & (F.col("o_orderdate") >= F.lit(ranges["o_orderdate"][0]))
        & (F.col("o_orderdate") <= F.lit(ranges["o_orderdate"][1]))
    ).count()
    assert out.count() == expect


def test_incremental_rollup_equals_recompute_and_drops_empty_groups(spark, tmp_path):
    """refresh_rollup: folding the change feed into the stored rollup is
    bit-equal to recomputing the GROUP BY from the new snapshot (decimal
    arithmetic, no float drift), and a group whose last row is deleted
    disappears from the rollup like it would from a fresh GROUP BY."""
    from bigdatamigratecloud_spark.operators.incremental import refresh_rollup

    base_df = spark.createDataFrame(
        [(i, "g%d" % (i % 4), float(i)) for i in range(1, 101)]
        + [(500, "solo", 42.0)],
        "id: long, grp: string, val: double",
    )
    base = AcidTable.create(spark, str(tmp_path / "base"), base_df, key_cols=["id"])
    rollup = AcidTable.create(
        spark,
        str(tmp_path / "roll"),
        base_df.groupBy("grp").agg(
            F.sum(F.col("val").cast("decimal(18,6)")).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        ),
        key_cols=["grp"],
    )
    # commit 1: reprice a slice + insert a new group; commit 2: kill 'solo'
    upd = base_df.filter("id % 10 = 0").withColumn("val", F.col("val") * 3)
    ins = spark.createDataFrame([(600, "new", 1.5)], base_df.schema)
    base.merge(upd.unionByName(ins), ["id"])
    base.delete("grp = 'solo'")

    refresh_rollup(rollup, base.changes(0, 2), ["grp"], "val")

    got = {
        r["grp"]: (r["cnt"], float(r["total"]))
        for r in rollup.snapshot().collect()
    }
    want = {
        r["grp"]: (r["cnt"], float(r["total"]))
        for r in base.snapshot()
        .groupBy("grp")
        .agg(
            F.sum(F.col("val").cast("decimal(18,6)")).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert got == want
    assert "solo" not in got
    assert got["new"] == (1, 1.5)


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """Three-valued logic: a row where the delete predicate evaluates to
    NULL matches neither the predicate nor its bare negation — it must
    survive the COW rewrite, not be silently dropped."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3)], "id: long, x: int"
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), df.coalesce(1), key_cols=["id"])
    t.delete("x > 5")
    kept = sorted(r["id"] for r in t.snapshot().collect())
    assert kept == [2, 3]  # id=2 (x NULL) kept, id=1 deleted


def test_merge_rejects_duplicate_pk_delta(spark, tmp_path):
    base = spark.range(0, 10).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    dup = spark.createDataFrame([(1, 7), (1, 8)], "id: long, v: int")
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(dup, ["id"])


def test_mutators_on_missing_table_raise_cleanly(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "nope"))
    df = spark.range(0, 3).withColumn("v", F.lit(0))
    for call in (
        lambda: t.overwrite(df),
        lambda: t.merge(df, ["id"]),
        lambda: t.delete("id = 1"),
        lambda: t.compact(1),
        lambda: t.changes(0, 0),
    ):
        with pytest.raises(FileNotFoundError):
            call()


def test_optimize_zorder_empty_snapshot_raises(spark, tmp_path):
    base = spark.range(0, 5).withColumn("v", F.col("id").cast("int"))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.delete("id >= 0")
    with pytest.raises(ValueError, match="empty"):
        t.optimize_zorder(["v"], target_files=2)


def test_zorder_key_wide_range_no_overflow(spark):
    """Ranges wider than ~1.4e14 (microsecond-epoch timestamps spanning
    years) overflow a 64-bit multiply; the decimal/HUGEINT path must
    produce in-range, monotone cells — and the SQL twin must agree
    bit-for-bit."""
    import duckdb

    from bigdatamigratecloud_spark.operators.layout import zorder_key, zorder_key_sql

    lo, hi = 0, 10 * 365 * 86400 * 1_000_000  # 10 years of micros ≈ 3.15e14
    vals = [0, hi // 4, hi // 2, hi - 1, hi]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id: long, us: long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key([(F.col("us"), lo, hi)], bits=16).alias("z")
        ).collect()
    }
    assert all(0 <= z < (1 << 16) for z in got.values()), got
    ordered = [got[i] for i in range(len(vals))]
    assert ordered == sorted(ordered) and ordered[0] == 0 and ordered[-1] == (1 << 16) - 1

    sql = zorder_key_sql([("us", lo, hi)], bits=16)
    con = duckdb.connect()
    for i, v in enumerate(vals):
        (zd,) = con.execute(f"SELECT {sql.replace('us', str(v))}").fetchone()
        assert zd == got[i], (v, zd, got[i])


def test_add_columns_metadata_only_evolution(spark, tmp_path):
    """add_columns: O(1) metadata commit — no data file rewritten, old
    files NULL-backfill through the widened schema, time travel shows
    the old schema, and a subsequent merge can write the new column."""
    base = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    files_before = {e["path"] for e in t.entries(0)}

    v = t.add_columns({"score": "double", "tag": "string"})
    m = t._read_manifest(v)
    assert m["operation"] == "add-columns"
    assert {e["path"] for e in t.entries(v)} == files_before  # nothing rewritten

    snap = t.snapshot()
    assert snap.columns == ["id", "v", "score", "tag"]
    assert snap.where("score IS NOT NULL OR tag IS NOT NULL").count() == 0
    assert snap.count() == 100
    # time travel: v0 still has the narrow schema
    assert t.snapshot(0).columns == ["id", "v"]

    # duplicate add rejected
    with pytest.raises(ValueError, match="already exists"):
        t.add_columns({"v": "long"})

    # the new column is writable through a normal merge
    delta = spark.createDataFrame([(5, 10, 0.9, "good")], "id: long, v: long, score: double, tag: string")
    t.merge(delta, ["id"])
    got = t.snapshot().where("id = 5").first()
    assert got["score"] == 0.9 and got["tag"] == "good"
    assert t.snapshot().where("score IS NULL").count() == 99


def test_rename_column_metadata_only(spark, tmp_path):
    """rename_column: O(1) metadata commit — files untouched, old files
    resolve through the stable physical name, time travel keeps the old
    name, and the table stays writable (append + merge) after the
    rename, including on a renamed KEY column."""
    base = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    files_before = {e["path"] for e in t.entries(0)}

    v = t.rename_column("v", "value")
    m = t._read_manifest(v)
    assert m["operation"] == "rename-column"
    assert {e["path"] for e in t.entries(v)} == files_before  # nothing rewritten

    snap = t.snapshot()
    assert snap.columns == ["id", "value"]
    assert snap.where("value = id * 2").count() == 100  # old files resolve
    assert t.snapshot(0).columns == ["id", "v"]  # time travel: old name

    with pytest.raises(ValueError, match="does not exist"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "value")

    # writable after rename: merge uses the NEW name; rewritten files
    # store the physical (original) name so both generations coexist
    t.merge(spark.createDataFrame([(5, 999)], "id: long, value: long"), ["id"])
    assert t.snapshot().where("id = 5").first()["value"] == 999
    assert t.snapshot().where("value = id * 2").count() == 99

    # rename a KEY column: key_cols follows, merge pruning still works
    v2 = t.rename_column("id", "pk")
    assert t._read_manifest(v2)["key_cols"] == ["pk"]
    t.merge(spark.createDataFrame([(7, 777)], "pk: long, value: long"), ["pk"])
    got = {r["pk"]: r["value"] for r in t.snapshot().where("pk IN (5, 7)").collect()}
    assert got == {5: 999, 7: 777}
    # stats-pruned scan on the renamed key still prunes + answers right
    df, info = t.scan({"pk": (7, 7)})
    assert [r["pk"] for r in df.collect()] == [7]


def test_drop_column_and_safe_readd(spark, tmp_path):
    """drop_column: metadata-only; the dropped values disappear from
    reads but survive in time travel; re-adding the same logical name
    gets a FRESH physical column, so the old values do NOT resurrect."""
    base = spark.range(0, 50).withColumn("v", F.col("id") * 2).withColumn(
        "tag", F.concat(F.lit("t"), F.col("id"))
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    files_before = {e["path"] for e in t.entries(0)}

    v = t.drop_column("tag")
    assert {e["path"] for e in t.entries(v)} == files_before
    assert t.snapshot().columns == ["id", "v"]
    assert t.snapshot(0).columns == ["id", "v", "tag"]  # time travel
    assert t.snapshot(0).where("tag = 't3'").count() == 1

    with pytest.raises(ValueError, match="key column"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="does not exist"):
        t.drop_column("tag")

    # re-add the same logical name: fresh physical name, all NULL —
    # the 50 old 't<n>' values must NOT come back
    t.add_columns({"tag": "string"})
    snap = t.snapshot()
    assert snap.columns == ["id", "v", "tag"]
    assert snap.where("tag IS NOT NULL").count() == 0
    # and it is independently writable
    t.merge(spark.createDataFrame([(3, 6, "fresh")], "id: long, v: long, tag: string"), ["id"])
    assert t.snapshot().where("tag IS NOT NULL").count() == 1


def test_rename_add_reject_case_insensitive_collisions(spark, tmp_path):
    """Spark resolves column names case-insensitively by default, so a
    table holding both `v` and `V` is ambiguous everywhere — rename and
    add_columns must reject the collision; a pure case-change rename of
    the SAME column stays legal."""
    t = AcidTable.create(
        spark, str(tmp_path / "t"),
        spark.range(0, 10).withColumn("v", F.col("id") * 2),
        key_cols=["id"],
    )
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "ID")
    with pytest.raises(ValueError, match="already exists"):
        t.add_columns({"V": "long"})
    t.rename_column("v", "V")  # case-change of itself is fine
    assert t.snapshot().columns == ["id", "V"]
    assert t.snapshot().where("V = id * 2").count() == 10


def test_clone_preserves_column_mapping(spark, tmp_path):
    """A shallow clone of a renamed table must resolve the source's
    files through the copied logical->physical mapping."""
    t = AcidTable.create(
        spark, str(tmp_path / "src"),
        spark.range(0, 20).withColumn("v", F.col("id") * 3),
        key_cols=["id"],
    )
    t.rename_column("v", "value")
    clone = t.clone_to(str(tmp_path / "fork"))
    snap = clone.snapshot()
    assert snap.columns == ["id", "value"]
    assert snap.where("value = id * 3").count() == 20
    # and the clone can keep evolving independently
    clone.rename_column("value", "metric")
    assert clone.snapshot().columns == ["id", "metric"]
    assert t.snapshot().columns == ["id", "value"]  # source untouched


def test_rename_keeps_parquet_pushdown(spark, tmp_path):
    """The logical->physical projection _read_data adds must stay
    transparent to Catalyst: a filter on the RENAMED column must reach
    the parquet scan as a pushed filter on the PHYSICAL name."""
    t = AcidTable.create(
        spark, str(tmp_path / "t"),
        spark.range(0, 1000).withColumn("v", F.col("id") * 2),
        key_cols=["id"],
    )
    t.rename_column("v", "value")
    df = t.snapshot().where(F.col("value") > 100).select("id", "value")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[1][:120] if "PushedFilters:" in plan else ""
    assert "GreaterThan(v,100)" in pushed, plan[:800]
    assert df.count() == 949


def test_rename_then_changes_feed(spark, tmp_path):
    """changes() across a rename commit: both sides of the diff read
    through the from-version's logical names via the shared physical
    mapping."""
    base = spark.range(0, 20).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.rename_column("v", "value")
    t.merge(spark.createDataFrame([(3, 333), (99, 990)], "id: long, value: long"), ["id"])
    feed = t.changes(1)  # from the post-rename version
    got = {(r["id"], r["_change_type"]): r["value"] for r in feed.collect()}
    assert got[(99, "insert")] == 990
    assert got[(3, "update_preimage")] == 6
    assert got[(3, "update_postimage")] == 333


def test_change_feed_spans_schema_evolution(spark, tmp_path):
    """changes() across an add_columns commit: pre-evolution files
    NULL-backfill through the from-version schema, and a merge whose
    delta lacks the late column NULL-fills it (uniformly, regardless of
    file-pruning luck)."""
    base = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.add_columns({"score": "double"})
    # delta in the ORIGINAL shape (no score column)
    t.merge(spark.createDataFrame([(5, -1)], "id: long, v: long"), ["id"])
    feed = t.changes(1, 2).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert [r["id"] for r in by_type["update_preimage"]] == [5]
    assert by_type["update_preimage"][0]["score"] is None
    assert by_type["update_postimage"][0]["v"] == -1
    assert by_type["update_postimage"][0]["score"] is None
    # diff from BEFORE the evolution also works (old schema, no score)
    pre = t.changes(0, 2)
    assert "score" not in pre.columns
    assert pre.where("_change_type = 'update_postimage'").first()["v"] == -1


def test_scan_prune_mixed_date_granularity_is_sound(spark, tmp_path):
    """Prune bounds are normalized to the column's stats granularity:
    a datetime bound on a DATE column ('1997-01-01T00:00:00' vs stat
    '1997-01-01') must not lexically out-compare the stat and prune a
    file whose rows equal the bound at midnight; symmetrically a DATE
    bound on a TIMESTAMP column must not prune a file whose min is
    exactly midnight of that date."""
    import datetime

    from pyspark.sql.types import StructType

    # ---- date column, datetime bound
    days = spark.sql(
        "SELECT id, date_add(DATE'1997-01-01', CAST(id AS INT)) AS d "
        "FROM range(0, 200)"
    ).repartitionByRange(4, "d")
    t = AcidTable.create(spark, str(tmp_path / "dt"), days, key_cols=["d"])
    lo = datetime.datetime(1997, 1, 1, 0, 0, 0)  # midnight of the min date
    df, info = t.scan({"d": (lo, None)})
    assert df.count() == 200  # every row >= midnight of day 0
    assert info["files_read"] == info["files_total"]  # nothing pruned
    # upper datetime bound at midnight of the LAST date keeps that file
    hi = datetime.datetime(1997, 7, 19, 0, 0, 0)  # == date of id 199
    df2, info2 = t.scan({"d": (None, hi)})
    assert df2.count() == 200

    # ---- timestamp column, date bound
    ts = spark.sql(
        "SELECT id, timestampadd(HOUR, CAST(id AS INT) * 12, "
        "TIMESTAMP'1997-01-01 00:00:00') AS ts FROM range(0, 200)"
    ).repartitionByRange(4, "ts")
    t2 = AcidTable.create(spark, str(tmp_path / "tt"), ts, key_cols=["ts"])
    hi_d = datetime.date(1997, 1, 1)  # only id 0 (midnight) and id 1 (noon)... noon > midnight
    df3, _ = t2.scan({"ts": (None, hi_d)})
    # rows <= 1997-01-01T00:00:00: exactly the id-0 midnight row
    assert df3.count() == 1
    lo_d = datetime.date(1997, 1, 1)
    df4, info4 = t2.scan({"ts": (lo_d, None)})
    assert df4.count() == 200
    assert info4["files_read"] == info4["files_total"]


def test_checkpoint_written_and_resolution_uses_it(spark, tmp_path):
    """Every checkpoint_interval commits the resolved file set compacts
    into a parquet checkpoint; resolution reads checkpoint + bounded
    tail (manifests record only the commit's own actions, so the log
    entry for an append is O(append), never O(table))."""
    import os as _os

    base = spark.range(0, 40).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=5)
    for i in range(7):
        t.append(spark.range(100 + i * 10, 110 + i * 10).withColumn("v", F.lit(0)).coalesce(1))
    assert t.latest_version() == 7
    assert t._checkpoint_versions() == [5]
    # snapshot resolves through the checkpoint + 2-manifest tail
    assert t.snapshot().count() == 40 + 70
    assert t.snapshot(4).count() == 40 + 40  # pre-checkpoint time travel
    # an append's manifest carries only ITS file, not the table's list
    m7 = t._read_manifest(7)
    assert "files" not in m7 and len(m7["add"]) == 1 and m7["remove"] == []
    # checkpoint dir is real parquet with one row per live file at v5
    ck = spark.read.parquet(t._checkpoint_dir(5))
    assert ck.count() == len(t.entries(5))


def test_vacuum_past_checkpoint_keeps_resolution_sound(spark, tmp_path):
    """vacuum writes a checkpoint at the new horizon before pruning
    manifests, so every retained version still resolves even when the
    earliest retained manifest is a plain (non-reset) append."""
    base = spark.range(0, 30).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=100)
    for i in range(4):
        t.append(spark.range(100 + i * 10, 110 + i * 10).withColumn("v", F.lit(0)).coalesce(1))
    # horizon = 3: manifests 0-2 pruned; v3 is an APPEND (not a reset)
    t.vacuum(keep_last=2, retain_seconds=0.0)
    assert t._versions_on_disk() == [3, 4]
    assert 3 in t._checkpoint_versions()
    assert t.snapshot(3).count() == 30 + 30
    assert t.snapshot(4).count() == 30 + 40
    hist = t.history()
    assert [h["version"] for h in hist] == [3, 4]
    assert hist[-1]["num_rows"] == 70


def test_merge_adaptive_recompute_on_uniform_delta(spark, tmp_path):
    """A delta whose keys spread over every file's range defeats COW
    pruning; merge must detect it (touched/total > recompute_frac) and
    switch to a range-partitioned full recompute committed as a reset —
    same logical result, clean layout."""
    base = spark.range(0, 8000).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    # every 100th key: hits all 8 range files
    uniform = spark.range(0, 8000, 100).withColumn("v", F.lit(1))
    v = t.merge(uniform, ["id"])
    m = t._read_manifest(v)
    assert m["operation"] == "merge-recompute"
    assert m.get("reset") is True
    snap = t.snapshot()
    assert snap.count() == 8000
    assert snap.where("v = 1").count() == 80
    # layout stayed range-partitioned: per-file id ranges disjoint
    ents = sorted(t.entries(v), key=lambda e: e["stats"]["id"]["min"])
    for a, b in zip(ents, ents[1:]):
        assert a["stats"]["id"]["max"] < b["stats"]["id"]["min"]
    # narrow delta on the SAME table takes the COW path again
    v2 = t.merge(spark.range(0, 50).withColumn("v", F.lit(2)), ["id"])
    assert t._read_manifest(v2)["operation"] == "merge"
    assert t.snapshot().where("v = 2").count() == 50


def test_idempotent_txn_skips_replayed_batch(spark, tmp_path):
    """A mutator called with txn=(app, batch) commits once; replaying
    the same or an older batch is a no-op returning the current head —
    the exactly-once contract for a restarted streaming writer."""
    base = spark.range(0, 10).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    d1 = spark.range(10, 20).withColumn("v", F.lit(1))
    v1 = t.append(d1, txn=("app1", 0))
    assert v1 == 1 and t.last_txn("app1") == 0
    # replay batch 0: no new commit, no duplicate rows
    assert t.append(d1, txn=("app1", 0)) == 1
    assert t.latest_version() == 1
    assert t.snapshot().count() == 20
    # batch 1 commits; replaying batch 0 after it is still a no-op
    v2 = t.merge(spark.range(10, 15).withColumn("v", F.lit(9)), ["id"], txn=("app1", 1))
    assert v2 == 2 and t.last_txn("app1") == 1
    assert t.merge(d1, ["id"], txn=("app1", 0)) == 2
    assert t.latest_version() == 2
    # a different app's txn counter is independent
    assert t.last_txn("other") is None
    v3 = t.overwrite(spark.range(0, 5).withColumn("v", F.lit(7)), txn=("other", 3))
    assert v3 == 3 and t.last_txn("other") == 3 and t.last_txn("app1") == 1


def test_restore_metadata_only_rollback(spark, tmp_path):
    """restore(v): one metadata commit re-publishing an old version's
    exact file set — no data I/O, old history intact, and a vacuum
    after the restore keeps the restored files live."""
    import glob

    base = spark.range(0, 500).withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.merge(spark.range(0, 100).withColumn("v", F.lit(1)), ["id"])
    t.delete("id >= 400")
    assert t.snapshot().count() == 400

    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "*" / "*.parquet")))
    v = t.restore(0)
    # metadata-only: not a single new data file
    assert len(glob.glob(str(tmp_path / "t" / "data" / "*" / "*.parquet"))) == n_files_before
    m = t._read_manifest(v)
    assert m["operation"] == "restore" and m.get("reset") is True
    snap = t.snapshot()
    assert snap.count() == 500
    assert snap.where("v = 1").count() == 0  # rolled back
    assert {e["path"] for e in t.entries(v)} == {e["path"] for e in t.entries(0)}
    # intermediate history still time-travels
    assert t.snapshot(2).count() == 400
    # vacuum keeping only the restore head must keep v0's files readable
    t.vacuum(keep_last=1, retain_seconds=0.0)
    assert t.snapshot().count() == 500


def test_entries_frame_large_remove_set_uses_antijoin(spark, tmp_path, monkeypatch):
    """A manifest whose remove list exceeds the isin threshold must
    resolve through the anti-join path with identical results."""
    from bigdatamigratecloud_spark.sources import acid_table as at_mod

    base = spark.range(0, 800).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    # COW merge touching several files -> a multi-path remove list
    t.merge(spark.range(0, 500, 7).withColumn("v", F.lit(1)), ["id"], recompute_frac=1.1)
    want = sorted(e["path"] for e in t.entries(1))
    monkeypatch.setattr(at_mod, "_ISIN_MAX", 1)  # force the anti-join branch
    got = sorted(r["path"] for r in t._entries_frame(1).select("path").collect())
    assert got == want
    assert t.snapshot().count() == 800


def test_checkpoint_hint_never_moves_backwards(spark, tmp_path):
    """A vacuum-horizon checkpoint older than an existing interval
    checkpoint must not rewind the _last_checkpoint hint (readers trust
    the hint without searching for later checkpoints)."""
    import json
    import os as _os

    base = spark.range(0, 20).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=5)
    for i in range(6):
        t.append(spark.range(100 + i, 101 + i).withColumn("v", F.lit(0)).coalesce(1))
    assert 5 in t._checkpoint_versions()
    hint = _os.path.join(t._log_dir, "_last_checkpoint.json")
    with open(hint) as f:
        assert json.load(f)["version"] == 5
    # horizon 3 < 5: vacuum writes checkpoint 3 but must keep hint at 5
    t.vacuum(keep_last=4, retain_seconds=0.0)
    assert 3 in t._checkpoint_versions()
    with open(hint) as f:
        assert json.load(f)["version"] == 5
    assert t.snapshot().count() == 26


def test_concurrent_appenders_stress(spark, tmp_path):
    """8 driver threads x 4 appends race on one table: optimistic
    concurrency must serialize them losslessly — every row lands exactly
    once, versions are a contiguous range, and the interval checkpoints
    written mid-race stay consistent with the JSON log."""
    from concurrent.futures import ThreadPoolExecutor

    base = spark.range(0, 10).withColumn("v", F.lit(-1))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=5)

    def worker(k: int) -> None:
        w = AcidTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
        for j in range(4):
            lo = 1000 + k * 1000 + j * 100
            w.append(
                spark.range(lo, lo + 25).withColumn("v", F.lit(k)).coalesce(1),
                max_retries=200,
            )

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(worker, range(8)))

    assert t.latest_version() == 32  # create + 8*4 appends, no holes
    snap = t.snapshot()
    assert snap.count() == 10 + 8 * 4 * 25
    # every worker's every batch fully present (no lost update under races)
    per_worker = {r["v"]: r["n"] for r in snap.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert per_worker.pop(-1) == 10
    assert per_worker == {k: 100 for k in range(8)}
    # mid-race checkpoints must equal a PURE JSON-log replay (entries()
    # would resolve through the checkpoint itself — circular)
    assert len(t._checkpoint_versions()) >= 1
    for cv in t._checkpoint_versions():
        ck_paths = {r["path"] for r in spark.read.parquet(t._checkpoint_dir(cv)).collect()}
        state: dict = {}
        for v in range(cv + 1):
            state = t._apply_manifest(state, t._read_manifest(v))
        assert ck_paths == set(state)


def test_latest_version_hint_probe_matches_listing(spark, tmp_path):
    """latest_version's forward probe from the checkpoint hint must
    agree with the directory listing at every log shape: before any
    checkpoint, across the checkpoint, and after a vacuum prunes the
    log below the hint."""
    import os as _os

    base = spark.range(0, 10).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=5)

    def listing_max():
        names = _os.listdir(t._log_dir)
        return max(int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit())

    for i in range(8):
        t.append(spark.range(100 + i, 101 + i).withColumn("v", F.lit(0)).coalesce(1))
        assert t.latest_version() == listing_max() == i + 1
    # hint sits at 5; probe walks the 3-manifest tail
    assert t._hint_version() == 5
    # vacuum prunes below horizon; hint moves to the horizon checkpoint
    t.vacuum(keep_last=2, retain_seconds=0.0)
    assert t.latest_version() == listing_max() == 8
    assert t.snapshot().count() == 18


def test_apply_cdc_replicates_source(spark, tmp_path):
    """apply_cdc consumes changes(v0, head) in ONE commit and makes the
    replica row-identical to the source head: inserts land, updates
    replace, deletes remove; preimages are ignored.  A replayed
    (app, batch) txn is a no-op."""
    base = spark.range(0, 400).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartitionByRange(4, "id")
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["id"])
    rep = AcidTable.create(
        spark, str(tmp_path / "rep"), src.snapshot(0), key_cols=["id"]
    )
    src.merge(
        spark.range(0, 40).select(F.col("id"), F.lit(99).alias("v")).unionByName(
            spark.range(1000, 1010).select(F.col("id"), F.lit(5).alias("v"))
        ),
        ["id"],
    )
    src.delete("id >= 200 AND id < 220")
    feed = src.changes(0, 2)
    v = rep.apply_cdc(feed, txn=("replicator", 2))
    assert rep._read_manifest(v)["operation"] == "apply_cdc"
    a = {tuple(r) for r in src.snapshot().collect()}
    b = {tuple(r) for r in rep.snapshot().collect()}
    assert a == b and len(a) > 0
    # replay: no new commit, contents unchanged
    assert rep.apply_cdc(feed, txn=("replicator", 2)) == v
    assert rep.latest_version() == v
    assert {tuple(r) for r in rep.snapshot().collect()} == a


def test_apply_cdc_prunes_and_recomputes_like_merge(spark, tmp_path):
    """Narrow feeds take the merge-on-read path — only the hit range
    file gets a deletion vector, zero data files rewritten; a uniform
    feed flips to the reset recompute."""
    base = spark.range(0, 8000).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    src = AcidTable.create(spark, str(tmp_path / "s"), base, key_cols=["id"])
    rep = AcidTable.create(spark, str(tmp_path / "r"), base, key_cols=["id"])
    src.merge(spark.range(0, 50).withColumn("v", F.lit(1)), ["id"])
    v = rep.apply_cdc(src.changes(0, 1))
    m = rep._read_manifest(v)
    assert m["operation"] == "apply_cdc"
    # narrow: 50 of 1000 rows in one range file -> vectored, not rewritten
    assert m["remove"] == [] and 0 < len(m["dv"]) < 8
    src.merge(spark.range(0, 8000, 10).withColumn("v", F.lit(2)), ["id"])
    v2 = rep.apply_cdc(src.changes(1, src.latest_version()))
    assert rep._read_manifest(v2)["operation"] == "apply_cdc-recompute"
    assert {tuple(r) for r in rep.snapshot().collect()} == {
        tuple(r) for r in src.snapshot().collect()
    }


def test_shallow_clone_metadata_only_and_independent(spark, tmp_path):
    """clone_to: zero data copied (no data/ dir in the clone until it
    writes), reads identical to the source snapshot, and mutations on
    either side never affect the other."""
    base = spark.range(0, 2000).repartitionByRange(4, "id").withColumn("v", F.lit(0))
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["id"])
    clone = src.clone_to(str(tmp_path / "clone"))
    m = clone._read_manifest(0)
    assert m["operation"] == "clone" and m["source_version"] == 0
    assert not os.path.isdir(str(tmp_path / "clone" / "data"))  # metadata-only
    assert clone.snapshot().count() == 2000
    # clone mutates: COW rewrite lands under the clone, source untouched
    clone.merge(spark.range(0, 10).withColumn("v", F.lit(1)), ["id"])
    assert clone.snapshot().where("v = 1").count() == 10
    assert src.snapshot().where("v = 1").count() == 0
    # source mutates: clone still reads its pinned version-0 file set
    src.merge(spark.range(50, 60).withColumn("v", F.lit(2)), ["id"])
    assert clone.snapshot().where("v = 2").count() == 0
    with pytest.raises(FileExistsError):
        src.clone_to(str(tmp_path / "clone"))


def test_shallow_clone_delete_hits_source_referenced_files(spark, tmp_path):
    """delete() on a clone must rewrite rows living in ABSOLUTE-path
    (source-owned) files — the suffix-matching pitfall — and must
    rewrite them under the clone without unlinking the source file."""
    base = spark.range(0, 1000).repartitionByRange(4, "id").withColumn("v", F.lit(0))
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["id"])
    clone = src.clone_to(str(tmp_path / "clone"))
    clone.delete("id % 10 = 7")
    assert clone.snapshot().where("id % 10 = 7").count() == 0
    assert clone.snapshot().count() == 900
    assert src.snapshot().count() == 1000  # source rows AND files intact
    # clone vacuum never reaches outside its own root
    clone.vacuum(keep_last=1, retain_seconds=0.0)
    assert src.snapshot().count() == 1000
    # compact localizes: every entry now lives under the clone's root
    clone.compact(target_files=2)
    ents = clone.entries(clone.latest_version())
    assert all(not os.path.isabs(e["path"]) for e in ents)
    assert clone.snapshot().count() == 900


def test_merge_rebases_over_disjoint_concurrent_append(spark, tmp_path):
    """A merge losing the publish race to a concurrent APPEND whose file
    ranges hold none of the delta's keys must rebase and commit on the
    new head (Delta-style logical conflict detection) — both writers'
    effects land."""
    base = spark.range(0, 8000).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    racer = AcidTable(spark, str(tmp_path / "t"))
    orig_commit = t._commit
    fired = {}

    def racing_commit(manifest):
        if manifest.get("operation") == "merge" and not fired:
            fired["x"] = True
            racer.append(spark.range(100000, 100500).withColumn("v", F.lit(9)))
        return orig_commit(manifest)

    t._commit = racing_commit
    v = t.merge(spark.range(0, 50).withColumn("v", F.lit(1)), ["id"])
    assert v == 2  # append took version 1; merge rebased onto it
    assert t._read_manifest(1)["operation"] == "append"
    assert t._read_manifest(2)["operation"] == "merge"
    snap = t.snapshot()
    assert snap.where("v = 9").count() == 500  # append survived
    assert snap.where("v = 1").count() == 50  # merge applied
    assert snap.count() == 8500


def test_merge_aborts_on_overlapping_concurrent_append(spark, tmp_path):
    """If the racing append's file ranges CAN contain a delta key, the
    rebase would duplicate PKs — the merge must abort instead."""
    base = spark.range(0, 8000).repartitionByRange(8, "id").withColumn("v", F.lit(0))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    racer = AcidTable(spark, str(tmp_path / "t"))
    orig_commit = t._commit
    fired = {}

    def racing_commit(manifest):
        if manifest.get("operation") == "merge" and not fired:
            fired["x"] = True
            racer.append(spark.range(40, 60).withColumn("v", F.lit(9)))
        return orig_commit(manifest)

    t._commit = racing_commit
    with pytest.raises(ConcurrentWriteError):
        t.merge(spark.range(0, 50).withColumn("v", F.lit(1)), ["id"])
    # the append's commit is intact; no torn merge state
    assert t.latest_version() == 1
    assert t.snapshot().where("v = 9").count() == 20


def test_mixed_appenders_and_merger_stress(spark, tmp_path):
    """Appender threads race a merger on one table: merges rebase over
    the key-disjoint appends instead of aborting, and every writer's
    effect lands exactly once with a contiguous version chain."""
    from concurrent.futures import ThreadPoolExecutor

    base = spark.range(0, 400).repartitionByRange(4, "id").withColumn("v", F.lit(-1))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])

    def appender(k: int) -> None:
        w = AcidTable(spark, str(tmp_path / "t"))
        for j in range(2):
            lo = 10_000 + k * 1000 + j * 100
            w.append(
                spark.range(lo, lo + 25).withColumn("v", F.lit(100 + k)).coalesce(1),
                max_retries=200,
            )

    def merger() -> None:
        w = AcidTable(spark, str(tmp_path / "t"))
        for j in range(3):
            delta = spark.range(j * 50, j * 50 + 50).withColumn("v", F.lit(j)).coalesce(1)
            for _ in range(50):  # retry aborted merges; rebase handles races
                try:
                    w.merge(delta, ["id"])
                    break
                except ConcurrentWriteError:
                    continue
            else:
                raise AssertionError("merge never landed")

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(appender, k) for k in range(3)] + [ex.submit(merger)]
        for f in futs:
            f.result()

    assert t.latest_version() == 3 * 2 + 3  # contiguous: 6 appends + 3 merges
    snap = t.snapshot()
    assert snap.count() == 400 + 3 * 2 * 25
    per = {r["v"]: r["n"] for r in snap.groupBy("v").agg(F.count("*").alias("n")).collect()}
    for k in range(3):
        assert per[100 + k] == 50  # appends all present
    assert per[0] == 50 and per[1] == 50 and per[2] == 50  # merges applied


def test_snapshot_distributed_read_matches_driver_list(spark, tmp_path, monkeypatch):
    """Past DISTRIBUTED_READ_THRESHOLD files, snapshot() must stop
    building the Python-side path list (py4j-shipping 10^6 strings is
    the driver bottleneck Delta's checkpoint file-index exists to
    avoid) and switch to the glob + entries-frame semi-join — with
    IDENTICAL rows, including after deletes that leave removed files on
    disk (the glob matches them; the semi-join must drop them)."""
    base = spark.range(0, 200).withColumn("v", F.col("id") * 2)
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartition(8), key_cols=["id"]
    )
    # COW delete rewrites files; the originals stay on disk until vacuum
    t.delete("id >= 150")
    expected = sorted((r["id"], r["v"]) for r in t.snapshot().collect())

    calls = {"n": 0}
    orig = AcidTable._paths

    def counting_paths(self, version):
        calls["n"] += 1
        return orig(self, version)

    monkeypatch.setattr(AcidTable, "_paths", counting_paths)
    monkeypatch.setattr(AcidTable, "DISTRIBUTED_READ_THRESHOLD", 2)
    got = sorted((r["id"], r["v"]) for r in t.snapshot().collect())
    assert got == expected
    # the distributed path never materialized the list in Python
    assert calls["n"] == 0
    # and time travel through the distributed path still works
    got_v0 = sorted((r["id"], r["v"]) for r in t.snapshot(0).collect())
    assert got_v0 == [(i, i * 2) for i in range(200)]
    assert calls["n"] == 0


def test_snapshot_distributed_read_multi_root_clone(spark, tmp_path, monkeypatch):
    """A shallow clone references ABSOLUTE paths outside its own root;
    above the threshold the snapshot must extract the distinct SOURCE
    ROOTS distributed, glob each, and semi-join on the absolute path —
    never building the Python path list (round-7: the last driver-side
    fallback closed).  Covers a MIXED snapshot too: clone + local COW
    rewrites = external AND relative entries in one version."""
    base = spark.range(0, 50).withColumn("v", F.col("id") + 1)
    src = AcidTable.create(
        spark, str(tmp_path / "src"), base.repartition(4), key_cols=["id"]
    )
    clone = src.clone_to(str(tmp_path / "clone"))
    # a local delete gives the clone its OWN files next to source refs
    clone.delete("id >= 40")

    calls = {"n": 0}
    orig = AcidTable._paths

    def counting_paths(self, version):
        calls["n"] += 1
        return orig(self, version)

    monkeypatch.setattr(AcidTable, "_paths", counting_paths)
    monkeypatch.setattr(AcidTable, "DISTRIBUTED_READ_THRESHOLD", 1)
    got = sorted(r["id"] for r in clone.snapshot().collect())
    assert got == list(range(40))
    assert calls["n"] == 0, "clone snapshot must not build a driver path list"
    # clone-of-a-clone: two external roots in one snapshot
    clone2 = clone.clone_to(str(tmp_path / "clone2"))
    got2 = sorted(r["id"] for r in clone2.snapshot().collect())
    assert got2 == list(range(40))
    assert calls["n"] == 0
    # time travel on the clone (pre-delete version) stays distributed
    got_v0 = sorted(r["id"] for r in clone.snapshot(0).collect())
    assert got_v0 == list(range(50))
    assert calls["n"] == 0


def test_snapshot_missing_clone_source_fails_loudly(spark, tmp_path, monkeypatch):
    """ADVICE r7: when a clone-source root's data dir has vanished
    (source vacuumed/moved), the distributed glob path must NOT
    silently drop that root's rows — it falls back to the explicit
    path read, which surfaces the missing files as an error, matching
    the sub-threshold behavior."""
    import shutil

    base = spark.range(0, 30).withColumn("v", F.col("id"))
    src = AcidTable.create(
        spark, str(tmp_path / "src"), base.repartition(2), key_cols=["id"]
    )
    # metadata-only clone: every entry is an absolute ref into src
    clone = src.clone_to(str(tmp_path / "clone"))
    shutil.rmtree(str(tmp_path / "src" / "data"))
    monkeypatch.setattr(AcidTable, "DISTRIBUTED_READ_THRESHOLD", 1)
    with pytest.raises(Exception):
        clone.snapshot().collect()
    # and a healthy multi-root clone on the same threshold still reads
    src2 = AcidTable.create(
        spark, str(tmp_path / "src2"), base.repartition(2), key_cols=["id"]
    )
    clone2 = src2.clone_to(str(tmp_path / "clone2"))
    assert clone2.snapshot().count() == 30


def test_restore_and_clone_are_checkpoint_backed(spark, tmp_path):
    """Restore/clone commits must not inline O(files) add-lists in the
    JSON manifest (the last driver-side materialization at 10^6 files):
    the file set lands as an owned checkpoint parquet via a distributed
    write, and the manifest only claims it."""
    import json as _json
    import os as _os

    base = spark.range(0, 60).withColumn("v", F.col("id"))
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartition(5), key_cols=["id"]
    )
    t.delete("id >= 40")
    rv = t.restore(0)
    with open(t._manifest_path(rv)) as f:
        m = _json.load(f)
    assert m["add"] == [] and m.get("checkpoint_owner")
    # the staged file set lives at the OWNER-UNIQUE dir, so two writers
    # racing for the same version can never clobber each other
    d = t._checkpoint_dir(rv, m["checkpoint_owner"])
    assert _os.path.exists(_os.path.join(d, "_SUCCESS"))
    with open(_os.path.join(d, "_OWNER")) as f:
        assert f.read().strip() == m["checkpoint_owner"]
    assert t._checkpoint_path(rv) == d
    assert sorted(r["id"] for r in t.snapshot().collect()) == list(range(60))
    # history and time travel still resolve through the owned commit
    assert [h["num_rows"] for h in t.history()] == [60, 40, 60]
    assert t.snapshot(1).count() == 40

    clone = t.clone_to(str(tmp_path / "c"))
    with open(clone._manifest_path(0)) as f:
        cm = _json.load(f)
    assert cm["add"] == [] and cm.get("checkpoint_owner")
    assert sorted(r["id"] for r in clone.snapshot().collect()) == list(range(60))
    # further commits on top of the owned base fold correctly
    clone.delete("id < 10")
    assert sorted(r["id"] for r in clone.snapshot().collect()) == list(range(10, 60))


def test_orphan_owned_checkpoint_never_poisons_resolution(spark, tmp_path):
    """A crash between checkpoint-write and publish leaves a checkpoint
    dir with an _OWNER marker and no matching manifest claim.  A later
    commit at that version must resolve from the LOG, not the orphan."""
    import os as _os

    base = spark.range(0, 20).withColumn("v", F.col("id"))
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["id"]
    )
    # simulate the crashed restore: owned checkpoint for version 1 with
    # stale content (version 0's fuller file set), no manifest yet
    t._write_owned_checkpoint(1, t._entries_frame(0), "deadbeef")
    # another writer commits version 1 normally (a delete)
    t.delete("id >= 10")
    assert t.latest_version() == 1
    # the orphan must be ignored: version 1 is the delete, not the orphan
    assert sorted(r["id"] for r in t.snapshot(1).collect()) == list(range(10))
    assert _os.path.exists(
        _os.path.join(t._checkpoint_dir(1, "deadbeef"), "_OWNER")
    )
    # the orphan staging dir is never trusted as a resolution base
    assert t._checkpoint_path(1) is None


def test_concurrent_restore_loser_cannot_clobber_winner(spark, tmp_path):
    """Two restores racing for the same new version (to DIFFERENT source
    versions): the loser's staged file set and its failure cleanup must
    never touch the winner's committed file set.  Regression test for
    the shared <v>.checkpoint staging path, where the loser's overwrite
    could silently swap the winner's entries (or its cleanup rmtree the
    dir the winner's manifest depends on)."""
    base = spark.range(0, 30).withColumn("v", F.col("id"))
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["id"]
    )
    t.delete("id >= 20")  # v1: 20 rows
    t.delete("id >= 10")  # v2: 10 rows
    head = t.latest_version()
    new_v = head + 1

    # loser stages FIRST (restore to v1), as its interleaving would
    import uuid as _uuid

    loser_owner = _uuid.uuid4().hex
    t._write_owned_checkpoint(new_v, t._entries_frame(1), loser_owner)

    # winner completes a full restore to v0 and wins the publish race
    rv = t.restore(0)
    assert rv == new_v
    assert sorted(r["id"] for r in t.snapshot().collect()) == list(range(30))

    # loser now loses the publish and runs its cleanup path
    with pytest.raises(ConcurrentWriteError):
        t._publish(
            {
                "version": new_v,
                "operation": "restore",
                "schema": t._read_manifest(1)["schema"],
                "key_cols": t._read_manifest(1)["key_cols"],
                "reset": True,
                "add": [],
                "checkpoint_owner": loser_owner,
                "txns": {},
            }
        )
    import shutil as _shutil

    _shutil.rmtree(t._checkpoint_dir(new_v, loser_owner), ignore_errors=True)

    # the winner's committed version still resolves to v0's 30 rows —
    # neither the loser's staged overwrite nor its cleanup touched it
    assert sorted(r["id"] for r in t.snapshot(new_v).collect()) == list(range(30))
    assert sorted(r["id"] for r in t.snapshot().collect()) == list(range(30))


def test_clone_loser_cleanup_spares_winner(spark, tmp_path):
    """A clone that loses the version-0 publish race must not rmtree the
    winning clone's committed checkpoint (regression: the old handler
    deleted dest's shared checkpoint dir unconditionally)."""
    base = spark.range(0, 25).withColumn("v", F.col("id"))
    src = AcidTable.create(
        spark, str(tmp_path / "src"), base.coalesce(2), key_cols=["id"]
    )
    dest_root = str(tmp_path / "clone")
    winner = src.clone_to(dest_root)
    assert sorted(r["id"] for r in winner.snapshot().collect()) == list(range(25))
    # second clone to the same dest loses cleanly...
    with pytest.raises(FileExistsError):
        src.clone_to(dest_root)
    # ...and the winner's committed file set is intact afterwards
    reopened = AcidTable(spark, dest_root)
    assert sorted(r["id"] for r in reopened.snapshot().collect()) == list(range(25))


# ------------------------------------------------- convert-in-place


def test_import_existing_in_place_metadata_only(spark, tmp_path):
    """CONVERT-in-place: adopting a plain parquet dir moves/rewrites NO
    data file (paths + mtimes identical), the snapshot equals the plain
    read, and the log lands beside the adopted files."""
    import glob
    import os

    root = str(tmp_path / "plain")
    base = spark.range(0, 500).withColumn("v", F.col("id") * 2)
    base.repartition(4).write.parquet(root)
    before = sorted(glob.glob(root + "/*.parquet"))
    mtimes = {p: os.path.getmtime(p) for p in before}
    t = AcidTable.import_existing(spark, root, key_cols=["id"])
    after = sorted(glob.glob(root + "/*.parquet"))
    assert after == before and all(os.path.getmtime(p) == mtimes[p] for p in after)
    assert os.path.isdir(os.path.join(root, "_log"))
    assert {tuple(r) for r in t.snapshot().collect()} == {
        tuple(r) for r in base.collect()
    }
    # re-converting an existing table refuses
    with pytest.raises(FileExistsError):
        AcidTable.import_existing(spark, root, key_cols=["id"])


def test_import_existing_stats_prune_and_scan(spark, tmp_path):
    """Adopted per-file min/max stats drive scan() skipping exactly like
    create()-written stats: a range-partitioned source prunes to a
    strict subset of files."""
    root = str(tmp_path / "ranged")
    base = spark.range(0, 10_000).withColumn("v", F.col("id") % 97)
    base.repartitionByRange(8, "id").write.parquet(root)
    t = AcidTable.import_existing(spark, root, key_cols=["id"])
    df, info = t.scan({"id": (100, 200)})
    assert info["files_total"] == 8 and info["files_read"] < 8
    assert sorted(r["id"] for r in df.collect()) == list(range(100, 201))


def test_import_existing_merge_time_travel_vacuum(spark, tmp_path):
    """Post-convert lifecycle: COW merge rewrites land under the table's
    own root and drop adopted references (never unlinking the adopted
    files), version 0 stays time-travelable, and vacuum only ever
    deletes under <root>/data/."""
    import glob
    import os

    root = str(tmp_path / "life")
    base = spark.range(0, 300).withColumn("v", F.col("id"))
    base.repartition(3).write.parquet(root)
    adopted = sorted(glob.glob(root + "/*.parquet"))
    t = AcidTable.import_existing(spark, root, key_cols=["id"])
    delta = spark.range(0, 300, 10).withColumn("v", F.col("id") * 100)
    t.merge(spark.createDataFrame(delta.collect(), delta.schema), ["id"])
    got = {r["id"]: r["v"] for r in t.snapshot().collect()}
    assert got[20] == 2000 and got[21] == 21 and len(got) == 300
    assert all(os.path.exists(p) for p in adopted)
    # v0 unchanged
    assert {tuple(r) for r in t.snapshot(0).collect()} == {
        tuple(r) for r in base.collect()
    }
    # vacuum with keep_last=1 drops v0 resolution but NEVER the adopted
    # files themselves (they live outside <root>/data/)
    deleted = t.vacuum(keep_last=1, retain_seconds=0.0)
    assert all(os.path.exists(p) for p in adopted)
    assert all(d.startswith("data/") for d in deleted)
    got = {r["id"]: r["v"] for r in t.snapshot().collect()}
    assert got[20] == 2000 and len(got) == 300


def test_import_existing_external_source_and_timestamp_stats(spark, tmp_path):
    """Adopting a dir OTHER than the table root (clone-style), with
    timestamp key stats rendered in the exact isoformat create() uses
    (microseconds omitted when zero) so mixed create/convert tables
    compare stats consistently."""
    import json

    src = str(tmp_path / "src")
    df = spark.sql(
        "SELECT id, timestamp'2024-01-02 03:04:05' + make_interval(0,0,0,0,0,0,id) AS ts,"
        " timestamp'2024-01-02 03:04:05.123456' AS ts_us FROM range(0, 10)"
    )
    df.coalesce(1).write.parquet(src)
    t = AcidTable.import_existing(
        spark, str(tmp_path / "tbl"), source_dir=src, key_cols=["ts", "ts_us"]
    )
    (ent,) = t.entries()
    assert ent["path"].startswith("/") and ent["rows"] == 10
    assert ent["stats"]["ts"]["min"] == "2024-01-02T03:04:05"
    assert ent["stats"]["ts"]["max"] == "2024-01-02T03:04:14"
    assert ent["stats"]["ts_us"]["min"] == "2024-01-02T03:04:05.123456"
    assert {tuple(r) for r in t.snapshot().collect()} == {
        tuple(r) for r in df.collect()
    }


def test_import_existing_no_key_cols(spark, tmp_path):
    """No key_cols: stats degrade to '{}' (scan reads everything,
    conservatively) but the table is fully functional."""
    root = str(tmp_path / "nokeys")
    spark.range(0, 50).write.parquet(root)
    t = AcidTable.import_existing(spark, root)
    (e,) = [x for x in t.entries()][:1] or [None]
    assert all(x["stats"] == {} for x in t.entries())
    assert t.snapshot().count() == 50


def test_import_existing_hive_partitioned_adopts_natively(spark, tmp_path):
    """Round 11: a hive-partitioned source adopts WITHOUT rewriting —
    partition values re-derive from file paths on every read (the
    column is absent from the files), snapshot equals the plain read,
    and the per-file min=max partition stats give scan() hive-style
    partition pruning."""
    src = str(tmp_path / "part_src")
    base = spark.range(0, 400).select(
        "id", (F.col("id") % 4).cast("int").alias("p"), (F.col("id") * 3).alias("v")
    )
    base.write.partitionBy("p").parquet(src)
    t = AcidTable.import_existing(
        spark, str(tmp_path / "part_tbl"), source_dir=src, key_cols=["id"]
    )
    assert {tuple(r) for r in t.snapshot().select("id", "p", "v").collect()} == {
        tuple(r) for r in base.collect()
    }
    df, info = t.scan({"p": (2, 2)})
    assert info["files_read"] < info["files_total"] and df.count() == 100
    # post-adopt lifecycle: COW merge (new files carry p physically and
    # win the coalesce), rename of the partition column, compact
    t.merge(
        spark.createDataFrame([(8, 1, 999), (401, 0, 1000)], "id long, p int, v long"),
        ["id"],
    )
    got = {r["id"]: (r["p"], r["v"]) for r in t.snapshot().collect()}
    assert got[8] == (1, 999) and got[401] == (0, 1000) and got[9] == (1, 27)
    t.rename_column("p", "bucket")
    df, info = t.scan({"bucket": (2, 2)})
    assert info["files_read"] < info["files_total"]
    t.compact(target_files=2)
    got = {r["id"]: r["bucket"] for r in t.snapshot().collect()}
    assert got[10] == 2 and len(got) == 401


def test_import_existing_partitioned_specials(spark, tmp_path):
    """Round 11: multi-level partitions with hostile values — spaces
    (URI-encoded by input_file_name), literal '%' (hive-escaped on
    disk, then URI re-encoded), literal '+' (must NOT decode to a
    space), NULL (__HIVE_DEFAULT_PARTITION__), a date-typed partition
    column, and a `col=val` directory ABOVE the adopted root that must
    never masquerade as a partition."""
    import os

    src = str(tmp_path / "p2")
    b2 = spark.createDataFrame(
        [(1, "us east", "x+y", 10), (2, "eu%zone", None, 20), (3, "us east", "x+y", 30)],
        "id long, region string, sub string, v long",
    )
    b2.write.partitionBy("region", "sub").parquet(src)
    t2 = AcidTable.import_existing(
        spark, str(tmp_path / "t2"), source_dir=src, key_cols=["id"]
    )
    rows = {r["id"]: (r["region"], r["sub"]) for r in t2.snapshot().collect()}
    assert rows == {1: ("us east", "x+y"), 2: ("eu%zone", None), 3: ("us east", "x+y")}
    # date-typed partition column prunes through string-ISO stats
    src3 = str(tmp_path / "p3")
    b3 = spark.sql(
        "SELECT id, DATE'2024-03-01' + CAST(id % 3 AS INT) AS d FROM range(0, 30)"
    )
    b3.write.partitionBy("d").parquet(src3)
    t3 = AcidTable.import_existing(
        spark, str(tmp_path / "t3"), source_dir=src3, key_cols=["id"]
    )
    assert {tuple(r) for r in t3.snapshot().collect()} == {
        tuple(r) for r in b3.collect()
    }
    df3, info3 = t3.scan({"d": ("2024-03-02", "2024-03-02")})
    assert info3["files_read"] < info3["files_total"] and df3.count() == 10
    # shadow safety: adopt a source nested under a col=val parent dir
    shadow = str(tmp_path / "v=99")
    os.makedirs(shadow)
    src4 = os.path.join(shadow, "inner")
    spark.range(0, 10).select(
        "id", (F.col("id") % 2).cast("int").alias("v")
    ).write.partitionBy("v").parquet(src4)
    t4 = AcidTable.import_existing(
        spark, str(tmp_path / "t4"), source_dir=src4, key_cols=["id"]
    )
    assert sorted({r["v"] for r in t4.snapshot().collect()}) == [0, 1]


def test_import_existing_percent_encoded_filenames(spark, tmp_path):
    """input_file_name returns a percent-encoded file URI; the adopted
    path must decode back to the real filesystem path (spaces, %)."""
    import glob
    import os
    import shutil as _shutil

    src = str(tmp_path / "space_src")
    os.makedirs(src)
    spark.range(0, 10).coalesce(1).write.parquet(src + "/stage")
    (f,) = glob.glob(src + "/stage/*.parquet")
    os.rename(f, src + "/part with space %41.parquet")
    _shutil.rmtree(src + "/stage")
    t = AcidTable.import_existing(
        spark, str(tmp_path / "space_tbl"), source_dir=src, key_cols=["id"]
    )
    (e,) = t.entries()
    assert e["path"].endswith("/part with space %41.parquet")
    assert sorted(r["id"] for r in t.snapshot().collect()) == list(range(10))


def test_rename_to_just_dropped_name_never_resurrects(spark, tmp_path):
    """Round-11 sweep (judge task 3): drop `v`, rename `w` -> `v` — the
    new logical `v` must resolve to w's physical column, never the
    dropped v's stale values, including across a checkpoint boundary
    and under time travel."""
    base = spark.range(0, 20).select(
        "id", (F.col("id") * 10).alias("v"), (F.col("id") * 100).alias("w")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base, key_cols=["id"], checkpoint_interval=2
    )
    t.drop_column("v")
    t.rename_column("w", "v")
    rows = {r["id"]: r["v"] for r in t.snapshot().collect()}
    assert rows[3] == 300 and len(rows) == 20
    # force an interval checkpoint past the rename, then re-read
    t.append(spark.createDataFrame([(99, 9900)], "id long, v long"))
    t.append(spark.createDataFrame([(98, 9800)], "id long, v long"))
    rows = {r["id"]: r["v"] for r in t.snapshot().collect()}
    assert rows[3] == 300 and rows[99] == 9900
    old = {r["id"]: (r["v"], r["w"]) for r in t.snapshot(0).collect()}
    assert old[3] == (30, 300)


def test_merge_on_renamed_primary_key(spark, tmp_path):
    """Round-11 sweep (judge task 3): MERGE keyed on a RENAMED PK —
    key_cols follow the rename, stats stay keyed by the physical name,
    and the COW prune still routes the delta to the right files."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(0, 50).select("id", (F.col("id") % 7).alias("x")),
        key_cols=["id"],
    )
    t.rename_column("id", "pk")
    t.merge(
        spark.createDataFrame([(5, 700), (200, 701)], "pk long, x long"), ["pk"]
    )
    got = {r["pk"]: r["x"] for r in t.snapshot().collect()}
    assert got[5] == 700 and got[200] == 701 and got[6] == 6 and len(got) == 51


def test_clone_of_converted_and_renamed_table(spark, tmp_path):
    """Round-11 sweep (judge task 3): clone a CONVERTED table after a
    rename — the clone resolves adopted absolute-path files through the
    mapping and evolves independently."""
    src = str(tmp_path / "plain")
    spark.range(0, 30).select("id", (F.col("id") * 2).alias("y")).repartition(
        2
    ).write.parquet(src)
    t = AcidTable.import_existing(spark, src, key_cols=["id"])
    t.rename_column("y", "z")
    cl = t.clone_to(str(tmp_path / "fork"))
    got = {r["id"]: r["z"] for r in cl.snapshot().collect()}
    assert got[7] == 14 and len(got) == 30
    cl.merge(spark.createDataFrame([(7, 777)], "id long, z long"), ["id"])
    assert {r["id"]: r["z"] for r in cl.snapshot().collect()}[7] == 777
    assert {r["id"]: r["z"] for r in t.snapshot().collect()}[7] == 14


# ------------------------------------------------- overwrite_where


def test_overwrite_where_replaces_slice_atomically(spark, tmp_path):
    """replaceWhere: exactly the matching rows swap for the new frame
    in ONE commit; untouched files carry forward; NULL-predicate rows
    are kept (three-valued logic); time travel shows the old slice."""
    base = spark.range(0, 100).select(
        "id", (F.col("id") % 5).alias("day"), (F.col("id") * 2).alias("v")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartition(4), key_cols=["id"]
    )
    repl = spark.range(200, 210).select(
        "id", F.lit(3).cast("long").alias("day"), F.lit(-1).cast("long").alias("v")
    )
    v = t.overwrite_where(repl, "day = 3")
    got = t.snapshot()
    assert got.where("day = 3").count() == 10
    assert sorted(r["id"] for r in got.where("day = 3").collect()) == list(
        range(200, 210)
    )
    # non-matching rows untouched (80 originals with day != 3)
    assert got.where("day <> 3").count() == 80
    assert got.count() == 90
    # time travel to the pre-backfill version
    assert t.snapshot(v - 1).where("day = 3").count() == 20
    # one commit: history shows a single overwrite-where operation
    ops = [h["operation"] for h in t.history()]
    assert ops.count("overwrite-where") == 1


def test_overwrite_where_validates_replacement_rows(spark, tmp_path):
    """A replacement row OUTSIDE the predicate is refused loudly (it
    would survive alongside the rows it was meant to replace), and the
    txn guard makes replayed batches no-ops."""
    base = spark.range(0, 50).select("id", (F.col("id") % 5).alias("day"))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    stray = spark.createDataFrame([(500, 4)], "id long, day long")
    with pytest.raises(ValueError, match="outside the predicate"):
        t.overwrite_where(stray, "day = 3")
    repl = spark.createDataFrame([(500, 3)], "id long, day long")
    v1 = t.overwrite_where(repl, "day = 3", txn=("backfill", 7))
    # replay of the same batch: no-op, version unchanged
    v2 = t.overwrite_where(repl, "day = 3", txn=("backfill", 7))
    assert v2 == v1
    assert t.snapshot().where("day = 3").count() == 1


def test_overwrite_where_null_predicate_rows_kept(spark, tmp_path):
    """Rows where the predicate is NULL match neither the removal nor
    its negation — they must survive the rewrite."""
    base = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, tag string"
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), base.coalesce(1), key_cols=["id"])
    t.overwrite_where(
        spark.createDataFrame([(10, "a")], "id long, tag string"), "tag = 'a'"
    )
    got = {(r["id"], r["tag"]) for r in t.snapshot().collect()}
    assert got == {(10, "a"), (2, None), (3, "b")}


def test_write_time_schema_enforcement(spark, tmp_path):
    """Round 11: a delta whose columns or types diverge from the table
    schema is refused AT WRITE TIME — previously it wrote parquet that
    only failed at read time with a physical-type mismatch (found by
    the round-11 partitioned-adopt probe)."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(0, 20).select("id", (F.col("id") % 3).cast("int").alias("p")),
        key_cols=["id"],
    )
    with pytest.raises(ValueError, match="table int vs write bigint"):
        t.append(spark.createDataFrame([(99, 1)], "id long, p long"))
    # a missing KEY column still hard-fails (it drives stats/pruning)
    with pytest.raises(ValueError, match="missing columns"):
        t.append(spark.createDataFrame([(1,)], "p int"))
    with pytest.raises(ValueError, match="unexpected columns"):
        t.overwrite_where(
            spark.createDataFrame([(99, 1, "x")], "id long, p int, q string"),
            "p = 1",
        )
    # conforming writes still land (column order is irrelevant)
    t.append(
        spark.createDataFrame([(99, 1)], "id long, p int").select("p", "id")
    )
    assert t.snapshot().count() == 21


def test_write_null_fills_missing_nullable_nonkey_columns(spark, tmp_path):
    """Delta parity (round 12, ADVICE): a frame missing a nullable
    non-key column NULL-fills it instead of hard-failing — after
    add_columns(), existing append/merge pipelines that don't yet emit
    the new column keep working."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(0, 10).select("id", (F.col("id") % 3).cast("int").alias("p")),
        key_cols=["id"],
    )
    t.add_columns({"score": "double"})
    # append/merge in the PRE-evolution shape: score NULL-fills
    t.append(spark.createDataFrame([(100, 1)], "id long, p int"))
    t.merge(spark.createDataFrame([(0, 9)], "id long, p int"), ["id"])
    snap = t.snapshot()
    assert snap.count() == 11
    assert snap.where("score IS NOT NULL").count() == 0
    assert snap.where("id = 0").first()["p"] == 9


# ------------------------------------------------- CHECK constraints


def test_check_constraint_enforced_on_every_write_path(spark, tmp_path):
    """CHECK constraints (round 11): existing-row validation on add,
    write-time refusal on append/merge/overwrite/overwrite_where/
    apply_cdc (violation = expression FALSE or NULL, Delta semantics),
    and the all-clear path stays cheap (one combined limit-1 job)."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(1, 21).select("id", (F.col("id") * 10).alias("v")),
        key_cols=["id"],
    )
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_check_constraint("v_big", "v > 100")
    t.add_check_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint("v_pos", "v >= 0")
    ok = spark.createDataFrame([(100, 1)], "id long, v long")
    bad = spark.createDataFrame([(101, -5)], "id long, v long")
    null_v = spark.createDataFrame([(102, None)], "id long, v long")
    with pytest.raises(ValueError, match="v_pos"):
        t.append(bad)
    with pytest.raises(ValueError, match="v_pos"):
        t.append(null_v)  # NULL is a violation, like Delta
    with pytest.raises(ValueError, match="v_pos"):
        t.merge(bad, ["id"])
    with pytest.raises(ValueError, match="v_pos"):
        t.overwrite(bad)
    with pytest.raises(ValueError, match="v_pos"):
        t.overwrite_where(
            spark.createDataFrame([(5, -1)], "id long, v long"), "id = 5"
        )
    feed = spark.createDataFrame(
        [(101, -5, "insert")], "id long, v long, _change_type string"
    )
    with pytest.raises(ValueError, match="v_pos"):
        t.apply_cdc(feed, ["id"])
    t.append(ok)
    assert t.snapshot().count() == 21
    t.drop_check_constraint("v_pos")
    t.append(bad)  # allowed once dropped
    assert t.snapshot().where("v < 0").count() == 1


def test_check_constraint_survives_every_operation(spark, tmp_path):
    """Constraints are table PROPERTIES: they carry through schema
    evolution, compaction, z-order, delete, restore, and copy with a
    clone — inherited at the single _publish choke point so no commit
    can silently drop them."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(1, 51).select("id", (F.col("id") * 10).alias("v"),
                                  (F.col("id") % 3).alias("x")),
        key_cols=["id"],
    )
    t.add_check_constraint("v_pos", "v > 0")
    t.append(spark.createDataFrame([(100, 1, 0)], "id long, v long, x long"))
    t.merge(spark.createDataFrame([(5, 999, 1)], "id long, v long, x long"), ["id"])
    t.delete("id = 7")
    t.add_columns({"extra": "string"})
    t.rename_column("x", "bucket")
    t.drop_column("extra")
    t.compact(target_files=2)
    t.optimize_zorder(["id", "v"], target_files=2)
    t.restore(t.latest_version() - 1)
    assert t.check_constraints() == {"v_pos": "v > 0"}
    bad = spark.createDataFrame([(200, -1, 0)], "id long, v long, bucket long")
    with pytest.raises(ValueError, match="v_pos"):
        t.append(bad)
    cl = t.clone_to(str(tmp_path / "fork"))
    assert cl.check_constraints() == {"v_pos": "v > 0"}
    with pytest.raises(ValueError, match="v_pos"):
        cl.append(bad)


def test_import_existing_partition_value_roundtrip_property(spark, tmp_path):
    """Seeded property test: hostile partition values (hive-escaped
    specials like '/', ':', '=', '#', spaces, '%', '+', unicode) must
    round-trip the dir-name-encode -> URI-encode -> two-layer decode
    chain exactly — the adopted snapshot equals the plain read."""
    import random

    rng = random.Random(1111)
    alpha = "ab /:%=+#?*.é"
    vals = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 6))).strip()
         for _ in range(12)} - {""}
    )
    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, vals[i % len(vals)], i * 7) for i in range(60)],
        "id long, part string, v long",
    )
    base.write.partitionBy("part").parquet(src)
    # Spark itself must read its own layout back identically (sanity:
    # the values survive hive escaping at all)
    plain = {tuple(r) for r in spark.read.parquet(src).select("id", "part", "v").collect()}
    t = AcidTable.import_existing(
        spark, str(tmp_path / "tbl"), source_dir=src, key_cols=["id"]
    )
    adopted = {tuple(r) for r in t.snapshot().select("id", "part", "v").collect()}
    assert adopted == plain
    assert {r[1] for r in adopted} == {r[1] for r in
                                       ((i, vals[i % len(vals)]) for i in range(60))}


def test_append_race_revalidates_concurrently_added_constraint(spark, tmp_path):
    """Round 12 (ADVICE): an append that loses its publish race to an
    add-constraint commit must re-enforce the NEW constraint set before
    rebasing — otherwise the constraint is inherited into the manifest
    while the appended rows were never validated against it."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(1, 11).select("id", (F.col("id") * 10).alias("v")),
        key_cols=["id"],
    )
    orig_commit = AcidTable._commit
    raced = {"done": False}

    def racing_commit(self, manifest):
        # first publish attempt of the append: a concurrent writer adds
        # a CHECK constraint first, so the append loses and must rebase
        if manifest.get("operation") == "append" and not raced["done"]:
            raced["done"] = True
            other = AcidTable(spark, self.root)
            other.add_check_constraint("v_pos", "v > 0")
        return orig_commit(self, manifest)

    bad = spark.createDataFrame([(100, -5)], "id long, v long")
    try:
        AcidTable._commit = racing_commit
        with pytest.raises(ValueError, match="v_pos"):
            t.append(bad)
    finally:
        AcidTable._commit = orig_commit
    # the violating rows never landed; a clean append after still works
    assert t.snapshot().where("v <= 0").count() == 0
    raced["done"] = True
    t.append(spark.createDataFrame([(101, 5)], "id long, v long"))
    assert t.snapshot().count() == 11


def test_restore_restores_target_versions_constraints(spark, tmp_path):
    """Round 12 (ADVICE): RESTORE restores METADATA with the data — the
    restored version's constraint set, not the current head's.  A
    constraint added after the target version must not survive a
    restore past it (its add-time validation never saw these rows)."""
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(1, 11).select("id", (F.col("id") - 5).alias("v")),
        key_cols=["id"],
    )  # v0 contains v <= 0 rows
    t.delete("v <= 0")  # v1: only positive v remain
    t.add_check_constraint("v_pos", "v > 0")  # v2: validated against v1
    # restoring to v0 brings back rows that VIOLATE v_pos; the restored
    # commit must therefore carry v0's (empty) constraint set
    t.restore(0)
    assert t.check_constraints() == {}
    assert t.snapshot().count() == 10
    # and restoring to a post-constraint version brings the constraint back
    t.restore(2)
    assert t.check_constraints() == {"v_pos": "v > 0"}


# ------------------------------------------------- deletion vectors


def test_deletion_vector_point_delete_adds_no_data_file(spark, tmp_path):
    """Round 12 headline: a 10-row delete from a large file writes NO
    data file — only a position-vector sidecar — and the entry's
    live-row count drops; reads mask the rows exactly."""
    base = spark.range(0, 10_000).withColumn("v", F.col("id") * 2).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    data_files_before = {e["path"] for e in t.entries(0)}
    t.delete("id >= 100 AND id < 110")
    m = t._read_manifest(1)
    assert m["add"] == [] and m["remove"] == []  # zero data churn
    assert len(m["dv"]) == 1
    e = t.entries(1)[0]
    assert e["path"] in data_files_before  # same physical file
    assert e["rows"] == 9_990 and e["dv"]["deleted"] == 10
    assert os.path.isdir(os.path.join(str(tmp_path / "t"), e["dv"]["path"]))
    snap = t.snapshot()
    assert snap.count() == 9_990
    assert snap.where("id >= 100 AND id < 110").count() == 0
    # time travel still sees the pre-delete rows
    assert t.snapshot(0).count() == 10_000


def test_deletion_vectors_stack_cumulatively(spark, tmp_path):
    """A second point delete on an already-vectored file REPLACES the
    vector with a cumulative one (old positions carried forward), so a
    single anti-join against current vectors is exact; history()'s row
    accounting tracks the live count."""
    base = spark.range(0, 1_000).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.delete("id < 10")
    t.delete("id >= 990")  # second vector on the same file
    e = t.entries(2)[0]
    assert e["rows"] == 980 and e["dv"]["deleted"] == 20
    got = t.snapshot()
    assert got.count() == 980
    assert got.where("id < 10 OR id >= 990").count() == 0
    assert [h["num_rows"] for h in t.history()] == [1000, 990, 980]
    # each version reads through ITS vector
    assert t.snapshot(1).count() == 990
    assert t.snapshot(1).where("id < 10").count() == 0
    assert t.snapshot(1).where("id >= 990").count() == 10


def test_merge_on_read_delete_then_merge_oracle_shape(spark, tmp_path):
    """MERGE below the dv threshold masks the replaced rows and lands
    the delta as new files — no base file rewritten — and the merged
    snapshot equals the logical upsert."""
    base = spark.range(0, 4_000).withColumn("v", F.lit(0)).repartitionByRange(4, "id")
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    files0 = {e["path"] for e in t.entries(0)}
    delta = spark.range(500, 520).withColumn("v", F.lit(7))
    t.merge(delta, ["id"])
    m = t._read_manifest(1)
    assert m["remove"] == [] and len(m["dv"]) == 1  # masked, not rewritten
    assert files0 <= {e["path"] for e in t.entries(1)}  # all carried
    snap = t.snapshot()
    assert snap.count() == 4_000
    assert snap.where("v = 7").count() == 20
    assert {r["id"] for r in snap.where("v = 7").collect()} == set(range(500, 520))


def test_compact_materializes_vectors_away(spark, tmp_path):
    """OPTIMIZE erases every deletion vector: the compacted snapshot
    has no dv refs, equals the masked read, and vacuum then drops the
    orphaned vector sidecar dirs."""
    base = spark.range(0, 2_000).withColumn("v", F.lit(0)).coalesce(2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.delete("id % 100 = 3")  # 20 rows over 2 files -> vectors
    assert any(e.get("dv") for e in t.entries(1))
    t.compact(target_files=2)
    ents = t.entries(2)
    assert all(not e.get("dv") for e in ents)
    assert t.snapshot().count() == 1_980
    # vacuum past the vectored version drops the now-unreferenced dv dir
    deleted_dirs = os.listdir(os.path.join(str(tmp_path / "t"), "dv"))
    assert deleted_dirs  # the sidecar existed
    t.vacuum(keep_last=1, retain_seconds=0.0)
    left = os.path.join(str(tmp_path / "t"), "dv")
    assert not os.path.isdir(left) or os.listdir(left) == []
    assert t.snapshot().count() == 1_980


def test_deletion_vector_fully_deleted_file_drops(spark, tmp_path):
    """A delete matching EVERY live row of a file is a pure remove
    action — no vector, no rewrite."""
    a = spark.range(0, 100).withColumn("v", F.lit(0)).coalesce(1)
    b = spark.range(100, 1200).withColumn("v", F.lit(0)).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), a, key_cols=["id"])
    t.append(b)
    t.delete("id < 100")
    m = t._read_manifest(2)
    assert len(m["remove"]) == 1 and m["add"] == [] and m["dv"] == []
    assert t.snapshot().count() == 1_100


def test_deletion_vectors_on_shallow_clone_leave_source_intact(spark, tmp_path):
    """A point delete on a clone vectors the SOURCE-owned file via a
    clone-local sidecar; the source never changes, and compact
    localizes the clone fully."""
    base = spark.range(0, 1_000).withColumn("v", F.lit(0)).coalesce(1)
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["id"])
    clone = src.clone_to(str(tmp_path / "clone"))
    clone.delete("id % 100 = 7")
    e = clone.entries(1)[0]
    assert os.path.isabs(e["path"])  # still the source's data file
    assert e["dv"] and not os.path.isabs(e["dv"]["path"])  # clone-local vector
    assert clone.snapshot().count() == 990
    assert src.snapshot().count() == 1_000
    # a clone OF the vectored clone inherits the vector by absolute ref
    c2 = clone.clone_to(str(tmp_path / "clone2"))
    assert c2.snapshot().count() == 990
    clone.compact(target_files=1)
    assert all(not e.get("dv") for e in clone.entries())
    assert clone.snapshot().count() == 990


def test_changes_exact_across_deletion_vectors(spark, tmp_path):
    """The CDF stays the exact logical diff when the churn is a vector
    change on a carried file (delete) and a mask+insert (merge)."""
    base = spark.range(0, 1_000).withColumn("v", F.col("id") * 10).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.delete("id >= 10 AND id < 15")  # v1: vector
    c01 = t.changes(0, 1).collect()
    assert {r["_change_type"] for r in c01} == {"delete"}
    assert sorted(r["id"] for r in c01) == [10, 11, 12, 13, 14]
    t.merge(spark.range(20, 25).withColumn("v", F.lit(-1)), ["id"])  # v2: mask+insert
    c12 = t.changes(1, 2).collect()
    by = {}
    for r in c12:
        by.setdefault(r["_change_type"], []).append(r["id"])
    assert sorted(by["update_preimage"]) == [20, 21, 22, 23, 24]
    assert sorted(by["update_postimage"]) == [20, 21, 22, 23, 24]
    assert "insert" not in by and "delete" not in by
    # full span composes
    c02 = {(r["id"], r["_change_type"]) for r in t.changes(0, 2).collect()}
    assert (12, "delete") in c02 and (22, "update_postimage") in c02


# ------------------------------------------------- bloom file stats


def test_bloom_file_stats_prune_point_lookups(spark, tmp_path):
    """Round 12: on hash-scattered keys min/max prunes nothing; after
    compute_bloom_stats a point lookup reads at most the files that
    can contain the probed values (no false negatives ever), new files
    are conservatively read, and the property + sidecar survive
    unrelated commits and vacuum."""
    base = (
        spark.range(0, 16_000)
        .withColumn("k", F.md5(F.col("id").cast("string")))
        .repartition(8, "k")
        .select("k", "id", (F.col("id") * 2).alias("v"))
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["k"])
    probe = [r["k"] for r in t.snapshot().where("id in (3, 777, 9000)").collect()]
    _, info0 = t.point_lookup("k", probe)
    assert info0["files_read"] == info0["files_total"] == 8  # min/max useless
    t.compute_bloom_stats(["k"], m_bits=61_440, k=5)
    df, info = t.point_lookup("k", probe)
    assert info["files_read"] <= len(probe) < info["files_total"]
    assert sorted(r["id"] for r in df.collect()) == [3, 777, 9000]
    # a value not in the table: near-total prune, zero rows
    _, miss = t.point_lookup("k", ["definitely-not-a-key"])
    assert miss["files_read"] <= 1
    # the property carries through unrelated commits (publish choke
    # point) and new files are conservatively read
    t.append(spark.createDataFrame([("zzz", 99_999, 0)], "k string, id long, v long"))
    got, info2 = t.point_lookup("k", ["zzz"])
    assert got.count() == 1 and info2["files_read"] == 1
    # exact-lookup equivalence on a mixed present/missing probe set
    mixed = probe + ["zzz", "nope"]
    df3, _ = t.point_lookup("k", mixed)
    want = {tuple(r) for r in t.snapshot().where(F.col("k").isin(mixed)).collect()}
    assert {tuple(r) for r in df3.collect()} == want


def test_bloom_stats_replaced_and_vacuumed(spark, tmp_path):
    """Rebuilding bloom stats replaces the property; vacuum drops the
    orphaned sidecar dir but keeps the referenced one."""
    base = (
        spark.range(0, 2_000)
        .withColumn("k", F.md5(F.col("id").cast("string")))
        .repartition(4, "k")
        .select("k", "id")
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["k"])
    t.compute_bloom_stats(["k"])
    d1 = t._read_manifest(t.latest_version())["bloom"]["dir"]
    t.compute_bloom_stats(["k"])  # rebuild -> new sidecar
    d2 = t._read_manifest(t.latest_version())["bloom"]["dir"]
    assert d1 != d2
    # burn history so only the new property remains, then vacuum
    t.compact(target_files=2)
    t.compact(target_files=2)
    t.compact(target_files=2)
    t.vacuum(keep_last=2, retain_seconds=0.0)
    root = str(tmp_path / "t")
    assert not os.path.isdir(os.path.join(root, d1))
    assert os.path.isdir(os.path.join(root, d2))
    # lookups still work (stale-but-sound after the compactions)
    probe = [r["k"] for r in t.snapshot().where("id = 42").collect()]
    df, _ = t.point_lookup("k", probe)
    assert df.count() == 1


# --------------------------------------- type widening / schema evolution


def test_widen_column_metadata_only(spark, tmp_path):
    """Round 12: int->long (and float->double) widening is ONE metadata
    commit — no file rewritten; old int32 pages read through the wide
    schema, a wide delta then merges cleanly, and time travel keeps the
    narrow type.  Lossy/cross-family changes are refused."""
    base = spark.range(0, 1_000).select(
        "id",
        (F.col("id") % 100).cast("int").alias("cents"),
        (F.col("id") / 7).cast("float").alias("ratio"),
    )
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    files0 = {e["path"] for e in t.entries(0)}
    t.widen_column("cents", "bigint")
    t.widen_column("ratio", "double")
    m = t._read_manifest(2)
    assert m["add"] == [] and m["remove"] == []  # metadata-only
    assert {e["path"] for e in t.entries(2)} == files0
    snap = t.snapshot()
    assert dict(snap.dtypes)["cents"] == "bigint"
    assert dict(snap.dtypes)["ratio"] == "double"
    assert snap.where("cents = 42").count() == 10
    # a delta that NEEDS the width merges (values beyond int range)
    t.merge(
        spark.createDataFrame(
            [(5, 10_000_000_000, 0.5), (2000, -1, 0.25)],
            "id long, cents bigint, ratio double",
        ),
        ["id"],
    )
    got = {r["id"]: r["cents"] for r in t.snapshot().where("id in (5, 2000)").collect()}
    assert got == {5: 10_000_000_000, 2000: -1}
    # time travel: version 0 still reads the narrow types
    assert dict(t.snapshot(0).dtypes)["cents"] == "int"
    # refusals: narrowing, cross-family, unknown column
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("cents", "int")
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("ratio", "string")
    with pytest.raises(ValueError, match="does not exist"):
        t.widen_column("nope", "bigint")


def test_merge_and_append_schema_evolution(spark, tmp_path):
    """schema_evolution=True auto-adds extra source columns in the same
    commit (NULL-backfilled in old files, fresh physical names); off by
    default extras still fail loudly; stats pruning and the change feed
    keep working across the evolution."""
    base = spark.range(0, 2_000).withColumn("v", F.lit(0).cast("long"))
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartitionByRange(4, "id"), key_cols=["id"]
    )
    extra = spark.createDataFrame([(5, 1, "hot"), (9000, 2, "new")],
                                  "id long, v long, tag string")
    with pytest.raises(ValueError, match="unexpected columns"):
        t.merge(extra, ["id"])
    t.merge(extra, ["id"], schema_evolution=True)
    snap = t.snapshot()
    assert "tag" in snap.columns
    assert snap.where("tag IS NOT NULL").count() == 2
    assert snap.count() == 2_001
    # old files never rewrote: dv/MOR merge carried them
    assert {e["path"] for e in t.entries(0)} <= {e["path"] for e in t.entries(1)}
    # append evolution too, and the pre-evolution writer keeps working
    # (nullable non-key NULL-fill from the ADVICE fix composes)
    t.append(spark.createDataFrame([(10_000, 3, "x", 1.5)],
                                   "id long, v long, tag string, score double"),
             schema_evolution=True)
    t.append(spark.createDataFrame([(10_001, 4)], "id long, v long"))
    snap = t.snapshot()
    assert dict(snap.dtypes)["score"] == "double"
    assert snap.where("id = 10001").first()["score"] is None
    # time travel shows the pre-evolution schema
    assert "tag" not in t.snapshot(0).columns
    # change feed across the evolution boundary stays exact
    feed = t.changes(1, t.latest_version())
    assert {r["id"] for r in feed.where("_change_type = 'insert'").collect()} == {
        10_000, 10_001,
    }


def test_dropped_then_evolved_same_name_never_resurrects(spark, tmp_path):
    """Evolution assigns fresh physical names: re-adding a previously
    dropped column name via merge evolution reads NULL from old files,
    never the dropped column's stale values."""
    base = spark.range(0, 100).withColumn("tag", F.lit("stale"))
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    t.drop_column("tag")
    t.merge(
        spark.createDataFrame([(5, "fresh")], "id long, tag string"),
        ["id"],
        schema_evolution=True,
    )
    vals = {r["tag"] for r in t.snapshot().collect()}
    assert vals == {None, "fresh"}


def test_incremental_optimize_touches_only_new_files(spark, tmp_path):
    """Round 12: compact(incremental=True) clusters only files added
    after the last-optimize watermark — the already-compacted bulk is
    neither read nor rewritten, the logical snapshot is unchanged, and
    stats pruning holds on the fresh slice."""
    base = spark.range(0, 8_000).withColumn("v", F.lit(0).cast("long"))
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartitionByRange(4, "id"), key_cols=["id"]
    )
    t.compact(target_files=4)  # v1: sets the watermark
    bulk = {e["path"] for e in t.entries(1)}
    # churn: three small appends land after the watermark
    for i in range(3):
        t.append(
            spark.range(10_000 + i * 10, 10_010 + i * 10)
            .withColumn("v", F.lit(1).cast("long"))
            .coalesce(1)
        )
    before = {tuple(r) for r in t.snapshot().collect()}
    v = t.compact(target_files=1, incremental=True)
    m = t._read_manifest(v)
    assert m["operation"] == "optimize-incremental"
    # only the three appended files were removed; the bulk carried
    assert len(m["remove"]) == 3 and not (set(m["remove"]) & bulk)
    assert bulk <= {e["path"] for e in t.entries(v)}
    # logical diff empty
    assert {tuple(r) for r in t.snapshot().collect()} == before
    # the compaction read ONLY the fresh files (inputFiles proxy: the
    # rewritten slice's row count equals the appends)
    fresh_rows = sum(e["rows"] for e in t.entries(v) if e["path"] not in bulk)
    assert fresh_rows == 30
    # an immediate second incremental pass is a no-op commit-wise
    assert t.compact(target_files=1, incremental=True) == v
    # stats pruning on the compacted slice still works
    _, info = t.scan({"id": (10_000, 10_029)})
    assert info["files_read"] == 1
    # with no watermark (fresh table), incremental falls back to full
    t2 = AcidTable.create(
        spark, str(tmp_path / "t2"), spark.range(0, 100).withColumn("v", F.lit(0)),
        key_cols=["id"],
    )
    v2 = t2.compact(target_files=1, incremental=True)
    assert t2._read_manifest(v2)["operation"] == "optimize"


def test_incremental_optimize_rebases_over_concurrent_append(spark, tmp_path):
    """OPTIMIZE never blocks ingest: an incremental compaction losing
    its publish race to a pure append rebases and lands; the append's
    rows survive (uncompacted until the next pass)."""
    base = spark.range(0, 1_000).withColumn("v", F.lit(0).cast("long"))
    t = AcidTable.create(spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["id"])
    t.compact(target_files=2)  # watermark
    t.append(spark.range(5_000, 5_020).withColumn("v", F.lit(1).cast("long")).coalesce(1))
    orig_commit = AcidTable._commit
    raced = {"done": False}

    def racing_commit(self, manifest):
        if manifest.get("operation") == "optimize-incremental" and not raced["done"]:
            raced["done"] = True
            AcidTable(spark, self.root).append(
                spark.range(6_000, 6_010).withColumn("v", F.lit(2).cast("long")).coalesce(1)
            )
        return orig_commit(self, manifest)

    try:
        AcidTable._commit = racing_commit
        v = t.compact(target_files=1, incremental=True)
    finally:
        AcidTable._commit = orig_commit
    assert t._read_manifest(v)["operation"] == "optimize-incremental"
    snap = t.snapshot()
    assert snap.count() == 1_030  # base + both appends, nothing lost
    assert snap.where("v = 2").count() == 10
    # and a DELETE racing the next incremental pass aborts it
    t.append(spark.range(7_000, 7_005).withColumn("v", F.lit(3).cast("long")).coalesce(1))
    raced2 = {"done": False}

    def deleting_commit(self, manifest):
        if manifest.get("operation") == "optimize-incremental" and not raced2["done"]:
            raced2["done"] = True
            AcidTable(spark, self.root).delete("id = 7001")
        return orig_commit(self, manifest)

    try:
        AcidTable._commit = deleting_commit
        with pytest.raises(ConcurrentWriteError):
            t.compact(target_files=1, incremental=True)
    finally:
        AcidTable._commit = orig_commit
    assert t.snapshot().where("id = 7001").count() == 0


def test_in_commit_timestamps_monotone_and_resolvable(spark, tmp_path):
    """Every commit carries a monotone in-commit timestamp; version_at
    resolves instants with Delta timestampAsOf semantics (latest
    version at-or-before; before-first is an error, future is head)."""
    import time

    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(10).withColumn("v", F.col("id")),
        key_cols=["id"],
    )
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))
    t.delete("id < 3")
    ts = [h["timestamp"] for h in t.history()]
    assert ts == sorted(ts) and len(set(ts)) == 3
    for v in range(3):
        assert t.version_at(t.commit_timestamp(v)) == v
        assert t.version_at(t.commit_timestamp(v) + 1e-4) == v
    assert t.version_at(time.time() + 3600) == 2
    with pytest.raises(ValueError, match="predates"):
        t.version_at(ts[0] - 1.0)
    with pytest.raises(ValueError, match="not both"):
        t.snapshot(version=1, timestamp=ts[1])
    # restore is its own commit with its own (later) instant
    rv = t.restore(timestamp=ts[1])
    assert t.commit_timestamp(rv) > ts[2]


def test_timestamp_selectors_match_version_selectors(spark, tmp_path):
    """snapshot/changes by timestamp are exactly their by-version
    twins, including datetime and ISO-string selector forms."""
    import datetime

    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(100).withColumn("v", F.lit(0).cast("long")),
        key_cols=["id"],
    )
    t.append(spark.range(100, 150).withColumn("v", F.lit(1).cast("long")))
    t.delete("id % 10 = 0")
    ts1 = t.commit_timestamp(1)
    by_ts = t.snapshot(timestamp=ts1)
    by_v = t.snapshot(1)
    assert by_ts.exceptAll(by_v).count() == 0
    assert by_v.exceptAll(by_ts).count() == 0
    feed_ts = t.changes(from_timestamp=ts1, to_timestamp=t.commit_timestamp(2))
    feed_v = t.changes(1, 2)
    key = lambda r: (r["id"], r["_change_type"])  # noqa: E731
    assert sorted(feed_ts.collect(), key=key) == sorted(feed_v.collect(), key=key)
    # datetime and ISO-string forms resolve identically to the float
    # (fromtimestamp FLOORS to µs, which can land just before the
    # stamp — round UP to the next µs so the instant is at-or-after)
    import math

    dt = datetime.datetime.fromtimestamp(math.ceil(ts1 * 1e6) / 1e6)
    assert t.version_at(dt) == 1
    assert t.version_at(dt.isoformat()) == 1
    with pytest.raises(TypeError):
        t.version_at(object())


def test_commit_timestamp_mtime_fallback_for_legacy_manifests(spark, tmp_path):
    """A pre-round-12 manifest without the timestamp field degrades to
    file mtime, and version_at stays monotone via its running max."""
    import json

    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(10).withColumn("v", F.col("id")),
        key_cols=["id"],
    )
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))
    p = t._manifest_path(0)
    m = json.load(open(p))
    stamped = m.pop("timestamp")
    json.dump(m, open(p + ".tmp", "w"))
    os.replace(p + ".tmp", p)
    fb = t.commit_timestamp(0)
    assert fb == os.path.getmtime(p) and fb != stamped
    # mtime (now) is AFTER v1's in-commit stamp: the running max keeps
    # resolution sound — v1 still resolves at its own instant
    assert t.version_at(t.commit_timestamp(1) + 3600) == 1


def test_generated_columns_compute_validate_and_prune(spark, tmp_path):
    """GENERATED ALWAYS AS: absent column computes on every write
    path, a contradictory supplied value hard-fails, the map is a
    carried table property, and a source-column range prunes via the
    DERIVED generated-column interval (no source stats exist)."""
    import datetime

    base = (
        spark.range(1_000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "ts",
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(hours=F.col("k"))),
        )
    )
    with pytest.raises(ValueError, match="already exist"):
        AcidTable.create(
            spark,
            str(tmp_path / "bad"),
            base.withColumn("d", F.lit(None).cast("date")),
            key_cols=["k"],
            generated={"d": "CAST(ts AS DATE)"},
        )
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.repartitionByRange(8, "ts"),
        key_cols=["k"],
        generated={"d": "CAST(ts AS DATE)"},
    )
    assert "d" in t.snapshot().columns
    assert t.snapshot().where("d IS NULL").count() == 0
    # scan on ts only: key stats are k, so any pruning is via derived d
    out, info = t.scan({"ts": ("2024-01-10 00:00:00", "2024-01-12 23:00:00")})
    assert info["files_read"] < info["files_total"]
    assert out.count() == base.where(
        (F.col("ts") >= "2024-01-10 00:00:00") & (F.col("ts") <= "2024-01-12 23:00:00")
    ).count()
    # append computes; merge computes (both COW and recompute paths)
    t.append(
        spark.createDataFrame(
            [(5_000, datetime.datetime(2024, 6, 1, 8, 0))], "k long, ts timestamp"
        )
    )
    assert str(t.snapshot().where("k = 5000").first()["d"]) == "2024-06-01"
    t.merge(
        spark.createDataFrame(
            [(5_001, datetime.datetime(2024, 6, 2, 8, 0))], "k long, ts timestamp"
        ),
        ["k"],
        recompute_frac=1.0,
    )
    assert str(t.snapshot().where("k = 5001").first()["d"]) == "2024-06-02"
    # a supplied value contradicting the expression is rejected
    with pytest.raises(ValueError, match="generated-column mismatch"):
        t.append(
            spark.createDataFrame(
                [(5_002, datetime.datetime(2024, 6, 3, 8, 0), datetime.date(1999, 1, 1))],
                "k long, ts timestamp, d date",
            )
        )
    # a supplied value AGREEING with the expression is accepted
    t.append(
        spark.createDataFrame(
            [(5_003, datetime.datetime(2024, 6, 4, 8, 0), datetime.date(2024, 6, 4))],
            "k long, ts timestamp, d date",
        )
    )
    # property carries through delete + compact, and compact keeps
    # generated stats so pruning survives the rewrite
    t.delete("k = 5000")
    t.compact(target_files=4)
    assert t._read_manifest(t.latest_version()).get("generated") == {
        "d": "CAST(ts AS DATE)"
    }
    _, info2 = t.scan({"ts": ("2024-01-10 00:00:00", "2024-01-12 23:00:00")})
    assert info2["files_read"] < info2["files_total"]


def test_generated_columns_monotone_whitelist(spark, tmp_path):
    """Only provably-monotone expressions derive pruning bounds:
    month() is not monotone across years and must NOT derive (scan
    falls back to reading every file — conservative, never wrong)."""
    from bigdatamigratecloud_spark.sources.acid_table import _monotone_source

    assert _monotone_source("CAST(ts AS DATE)") == "ts"
    assert _monotone_source("to_date( ts )") == "ts"
    assert _monotone_source("date_trunc('month', ts)") == "ts"
    assert _monotone_source("YEAR(ts)") == "ts"
    assert _monotone_source("month(ts)") is None
    assert _monotone_source("day(ts)") is None
    assert _monotone_source("CAST(ts AS STRING)") is None
    base = spark.range(100).withColumnRenamed("id", "k").withColumn(
        "ts", (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(days=F.col("k")))
    )
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.repartitionByRange(4, "ts"),
        key_cols=["k"],
        generated={"m": "month(ts)"},
    )
    out, info = t.scan({"ts": ("2024-02-01 00:00:00", "2024-02-10 00:00:00")})
    # month() derives nothing: every file read, result still exact
    assert info["files_read"] == info["files_total"]
    assert out.count() == 10


def test_reader_features_latch_and_gate(spark, tmp_path):
    """Reader-required features (Delta readerFeatures): derived at the
    publish choke point from what the commit contains, latched across
    every later commit (restore included), copied by clones, and an
    UNKNOWN feature makes every read refuse loudly instead of
    returning wrong results."""
    import json

    base = spark.range(200).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["k"]
    )
    assert "features" not in t._read_manifest(0)
    t.delete("k = 7")  # masked via deletion vector
    assert t._read_manifest(t.latest_version()).get("features") == [
        "deletion-vectors"
    ]
    t.rename_column("v", "val")
    feats = t._read_manifest(t.latest_version())["features"]
    assert feats == ["column-mapping", "deletion-vectors"]
    # latched: a plain append (no dv, mapping already in schema) keeps both
    t.append(spark.range(500, 510).withColumnRenamed("id", "k").withColumn(
        "val", F.col("k") * 2
    ))
    assert t._read_manifest(t.latest_version())["features"] == feats
    # restore to pre-feature version 0 still carries the latch
    t.restore(0)
    assert t._read_manifest(t.latest_version())["features"] == feats
    # clones copy the source's features (their v0 references the
    # source checkpoint where the structures live)
    c = t.clone_to(str(tmp_path / "c"))
    assert c._read_manifest(0)["features"] == feats
    # unknown future feature -> fail-closed on every read path
    head = t.latest_version()
    p = t._manifest_path(head)
    m = json.load(open(p))
    m["features"] = feats + ["future-row-tracking"]
    json.dump(m, open(p + ".tmp", "w"))
    os.replace(p + ".tmp", p)
    t2 = AcidTable(spark, str(tmp_path / "t"))
    with pytest.raises(RuntimeError, match="future-row-tracking"):
        t2.snapshot()
    with pytest.raises(RuntimeError, match="refusing to read"):
        t2.history()


def test_reader_features_partition_from_path(spark, tmp_path):
    """A hive-partition adoption advertises partition-from-path: a
    reader that can't re-derive values from paths must not open it."""
    src = str(tmp_path / "lake")
    spark.range(100).withColumnRenamed("id", "k").withColumn(
        "part", (F.col("k") % 3).cast("string")
    ).write.partitionBy("part").parquet(src)
    t = AcidTable.import_existing(spark, src, key_cols=["k"])
    assert "partition-from-path" in t._read_manifest(0)["features"]


def test_identity_columns_allocation_and_guards(spark, tmp_path):
    """Identity allocation: dense 1..n by order key at create, append
    continues from the latched mark, explicit supply and duplicate
    order keys are rejected, restore never re-issues rolled-back ids,
    and a racing allocation aborts as a metadata conflict."""
    base = spark.range(100).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 3
    )
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.repartition(4),
        key_cols=["k"],
        identity={"rid": "k"},
    )
    rows = {r["k"]: r["rid"] for r in t.snapshot().collect()}
    assert sorted(rows.values()) == list(range(1, 101))
    assert rows[0] == 1 and rows[99] == 100
    t.append(
        spark.range(200, 250)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k"))
        .repartition(3)
    )
    rows = {r["k"]: r["rid"] for r in t.snapshot().collect()}
    assert rows[200] == 101 and rows[249] == 150
    with pytest.raises(ValueError, match="allocated by the table"):
        t.append(
            spark.createDataFrame([(300, 0, 999)], "k long, v long, rid long")
        )
    with pytest.raises(ValueError, match="unique within the batch"):
        t.append(
            spark.createDataFrame([(301, 0), (301, 1)], "k long, v long")
        )
    with pytest.raises(ValueError, match="already exist"):
        AcidTable.create(
            spark,
            str(tmp_path / "bad"),
            base.withColumn("rid", F.lit(0).cast("long")),
            key_cols=["k"],
            identity={"rid": "k"},
        )
    # restore latches the mark
    t.restore(0)
    t.append(
        spark.range(500, 510)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k"))
        .coalesce(1)
    )
    got = sorted(r["rid"] for r in t.snapshot().where("k >= 500").collect())
    assert got == list(range(151, 161))
    # racing allocation -> metadata conflict, never duplicate ids
    orig_commit = AcidTable._commit
    raced = {"done": False}

    def racing_commit(self, manifest):
        if manifest.get("operation") == "append" and not raced["done"]:
            raced["done"] = True
            AcidTable(spark, self.root).append(
                spark.range(900, 905)
                .withColumnRenamed("id", "k")
                .withColumn("v", F.col("k"))
                .coalesce(1)
            )
        return orig_commit(self, manifest)

    try:
        AcidTable._commit = racing_commit
        with pytest.raises(ConcurrentWriteError, match="identity allocation"):
            t.append(
                spark.range(950, 955)
                .withColumnRenamed("id", "k")
                .withColumn("v", F.col("k"))
                .coalesce(1)
            )
    finally:
        AcidTable._commit = orig_commit
    ids = [r["rid"] for r in t.snapshot().collect()]
    assert len(ids) == len(set(ids))


def test_incremental_zorder_clusters_only_fresh_files(spark, tmp_path):
    """optimize_zorder(incremental=True): after a full z-order sets the
    watermark, later appends re-cluster in O(churn) — pre-watermark
    files carry byte-identical, the remove set is exactly the fresh
    files, the logical snapshot is unchanged, and hyper-rectangle
    pruning works on the freshly clustered slice too."""
    base = (
        spark.range(2_000)
        .withColumnRenamed("id", "k")
        .withColumn("x", (F.col("k") * 37) % 1000)
        .withColumn("y", (F.col("k") * 91) % 1000)
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartition(4), key_cols=["k"]
    )
    t.optimize_zorder(["x", "y"], target_files=8)  # watermark
    bulk = {e["path"] for e in t.entries(t.latest_version())}
    # immediate incremental pass: nothing fresh -> no-op, same head
    head = t.latest_version()
    assert t.optimize_zorder(["x", "y"], target_files=4, incremental=True) == head
    churn = (
        spark.range(10_000, 10_600)
        .withColumnRenamed("id", "k")
        .withColumn("x", (F.col("k") * 37) % 1000)
        .withColumn("y", (F.col("k") * 91) % 1000)
    )
    t.append(churn.repartition(6))
    before = sorted((r["k"], r["x"], r["y"]) for r in t.snapshot().collect())
    v = t.optimize_zorder(["x", "y"], target_files=2, incremental=True)
    mv = t._read_manifest(v)
    assert mv["operation"] == "optimize-zorder-incremental"
    assert not (set(mv["remove"]) & bulk), "bulk files must not be touched"
    assert bulk <= {e["path"] for e in t.entries(v)}
    after = sorted((r["k"], r["x"], r["y"]) for r in t.snapshot().collect())
    assert after == before
    # the fresh slice is clustered: a tight (x, y) box reads fewer
    # than all files
    _, info = t.scan({"x": (0, 120), "y": (0, 120)})
    assert info["files_read"] < info["files_total"]


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """vacuum(dry_run=True) returns exactly what the real vacuum then
    deletes, with zero side effects: no file removed, no manifest
    pruned, no checkpoint written, and time travel still works."""
    base = spark.range(100).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["k"]
    )
    t.overwrite(base.withColumn("v", F.col("k") * 2).coalesce(2))
    t.overwrite(base.withColumn("v", F.col("k") * 3).coalesce(2))
    manifests_before = t._versions_on_disk()
    candidates = t.vacuum(keep_last=1, retain_seconds=0.0, dry_run=True)
    assert candidates, "two overwritten versions must yield candidates"
    # zero side effects: all files still present, log untouched,
    # pre-horizon time travel still resolves
    for rel in candidates:
        assert os.path.exists(os.path.join(str(tmp_path / "t"), rel))
    assert t._versions_on_disk() == manifests_before
    assert t.snapshot(0).count() == 100
    # the real vacuum deletes exactly the reported set
    deleted = t.vacuum(keep_last=1, retain_seconds=0.0)
    assert sorted(deleted) == candidates
    for rel in candidates:
        assert not os.path.exists(os.path.join(str(tmp_path / "t"), rel))


def test_detail_reports_operational_state(spark, tmp_path):
    """detail() is the DESCRIBE DETAIL surface: counts from metadata
    (no data scan), every table property, and sane instants."""
    base = spark.range(60).withColumnRenamed("id", "k").withColumn(
        "ts",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(hours=F.col("k"))),
    )
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.coalesce(3),
        key_cols=["k"],
        generated={"d": "CAST(ts AS DATE)"},
    )
    t.add_check_constraint("k_nonneg", "k >= 0")
    t.delete("k = 5")  # deletion vector -> feature + row count drop
    d = t.detail()
    assert d["version"] == t.latest_version()
    assert d["num_rows"] == 59
    assert d["num_files"] == 3
    assert d["key_cols"] == ["k"]
    assert d["constraints"] == {"k_nonneg": "k >= 0"}
    assert d["generated"] == {"d": "CAST(ts AS DATE)"}
    assert d["features"] == ["deletion-vectors"]
    assert d["created_at"] <= d["last_modified"]
    assert d["bloom"] is None and d["last_optimize"] is None


def test_identity_survives_overwrite_and_clone(spark, tmp_path):
    """Round-12 review fixes: overwrite on an identity table allocates
    fresh ids from the latched mark (never drops the column from the
    schema), and a clone carries the identity property so its appends
    keep allocating."""
    base = spark.range(50).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k")
    )
    t = AcidTable.create(
        spark,
        str(tmp_path / "t"),
        base.coalesce(2),
        key_cols=["k"],
        identity={"rid": "k"},
    )
    with pytest.raises(ValueError, match="allocated by the table"):
        t.overwrite(base.withColumn("rid", F.lit(1).cast("long")))
    t.overwrite(
        spark.range(200, 220).withColumnRenamed("id", "k").withColumn(
            "v", F.col("k")
        ).coalesce(1)
    )
    got = sorted(r["rid"] for r in t.snapshot().collect())
    assert got == list(range(51, 71))  # continues past the create's 1..50
    # appends after the overwrite keep working (schema kept rid)
    t.append(
        spark.range(300, 305).withColumnRenamed("id", "k").withColumn(
            "v", F.col("k")
        ).coalesce(1)
    )
    assert sorted(
        r["rid"] for r in t.snapshot().where("k >= 300").collect()
    ) == list(range(71, 76))
    c = t.clone_to(str(tmp_path / "c"))
    assert c._read_manifest(0).get("identity", {}).get("rid", {}).get("hwm") == 75
    c.append(
        spark.range(400, 403).withColumnRenamed("id", "k").withColumn(
            "v", F.col("k")
        ).coalesce(1)
    )
    ids = [r["rid"] for r in c.snapshot().collect()]
    assert len(ids) == len(set(ids))
    assert sorted(r["rid"] for r in c.snapshot().where("k >= 400").collect()) == [
        76,
        77,
        78,
    ]


def test_incremental_zorder_skips_unclusterable_churn(spark, tmp_path):
    """An all-NULL z-column churn batch must not crash the maintenance
    job: the incremental pass leaves it for later; only the FULL pass
    on a truly unusable snapshot raises."""
    base = spark.range(200).withColumnRenamed("id", "k").withColumn(
        "x", (F.col("k") * 7 % 100).cast("long")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["k"]
    )
    t.optimize_zorder(["x"], target_files=4)
    head = t.latest_version()
    t.append(
        spark.range(900, 910)
        .withColumnRenamed("id", "k")
        .withColumn("x", F.lit(None).cast("long"))
        .coalesce(1)
    )
    v = t.optimize_zorder(["x"], target_files=2, incremental=True)
    assert v == t.latest_version() and v == head + 1  # append only, no crash
    assert t.snapshot().count() == 210
    allnull = spark.range(5).withColumnRenamed("id", "k").withColumn(
        "x", F.lit(None).cast("long")
    )
    t2 = AcidTable.create(spark, str(tmp_path / "t2"), allnull, key_cols=["k"])
    with pytest.raises(ValueError, match="no usable bounds"):
        t2.optimize_zorder(["x"], target_files=1)


def test_compact_by_target_rows_per_file(spark, tmp_path):
    """compact(target_rows_per_file=...) derives the file count from
    the LIVE row count (manifest metadata for the full pass; the fresh
    slice's count for incremental) — the size-based operational knob."""
    base = spark.range(1_000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.repartition(10), key_cols=["k"]
    )
    t.delete("k >= 900")  # live rows: 900
    v = t.compact(target_rows_per_file=300)
    assert len(t.entries(v)) == 3  # ceil(900/300)
    assert t.snapshot().count() == 900
    # incremental: sized by the churn only
    t.append(
        spark.range(5_000, 5_250)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k"))
        .repartition(5)
    )
    v2 = t.compact(target_rows_per_file=100, incremental=True)
    m = t._read_manifest(v2)
    assert m["operation"] == "optimize-incremental"
    assert len(m["add"]) == 3  # ceil(250/100) fresh files only
    with pytest.raises(ValueError, match="exactly one"):
        t.compact()
    with pytest.raises(ValueError, match="exactly one"):
        t.compact(target_files=2, target_rows_per_file=10)
    with pytest.raises(ValueError, match=">= 1"):
        t.compact(target_rows_per_file=0)


def test_identity_assignment_plan_has_no_global_window(spark, tmp_path):
    """The identity allocation inherits global_running_sum's scale
    shape IN CONTEXT: the assigned frame's physical plan contains no
    unpartitioned window over batch-sized data (the naive
    row_number() OVER (ORDER BY ...) would)."""
    from tests.test_corpus_ops import _window_partition_counts

    base = spark.range(500).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k")
    )
    t = AcidTable.create(
        spark, str(tmp_path / "t"), base.coalesce(2), key_cols=["k"]
    )
    ident = {"rid": {"order_by": "k", "hwm": 0}}
    assigned, counts = t._assign_identity(base.repartition(4), ident)
    assert counts == {"rid": 500}
    parts = _window_partition_counts(assigned)
    assert parts and parts.count(0) == 0
