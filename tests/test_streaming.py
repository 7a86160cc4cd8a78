"""Structured Streaming tests: file-source micro-batches of the events
table, watermarked rollup equal to the batch oracle query, late-data drop,
and the stateful sessionizer."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.streaming import events as sev


@pytest.fixture()
def landing(spark, sf_dir, tmp_path):
    """Split events into several parquet files so the file stream sees
    multiple micro-batches."""
    d = str(tmp_path / "landing")
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(8).write.mode("overwrite").parquet(d)
    # drop _SUCCESS etc noise is fine; stream reads *.parquet via schema
    return d


def test_streaming_rollup_matches_batch(spark, sf_dir, landing):
    stream = sev.stream_events(spark, landing)
    assert stream.isStreaming
    rollup = sev.hourly_rollup_stream(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT hour, event_type, n_events, sum_value FROM rollup_t"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_watermark_append_finalizes_exactly_once(spark, tmp_path):
    """Append-mode watermark contract that holds across Spark versions:
    each finalized window is emitted EXACTLY once (no duplicates, no
    re-emission when later batches arrive)."""
    import time

    d = str(tmp_path / "late")
    os.makedirs(d)
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 12:00:00", 1, "click", 1.0, "{}")], schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode("append").parquet(d)
    time.sleep(1.1)  # distinct mtimes: the file source orders by mod time
    spark.createDataFrame(
        [(4, "2024-01-01 13:30:00", 1, "click", 1.0, "{}"),
         (5, "2024-01-01 16:00:00", 1, "click", 1.0, "{}")], schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode("append").parquet(d)

    stream = sev.stream_events(spark, d, max_files_per_trigger=1).coalesce(1)
    rollup = sev.hourly_rollup_stream(stream, watermark="2 hours")
    q = (
        rollup.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")  # emits each window once, when finalized
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_t").collect()
    emitted = [(r.hour.hour, r.n_events) for r in rows]
    # final watermark = 16:00 - 2h = 14:00 -> hours 10, 12, 13 finalized;
    # 16:00 window (ends 17:00 > wm) stays open and is NOT emitted
    assert sorted(emitted) == [(10, 1), (12, 1), (13, 1)]
    # exactly once: no window appears twice
    assert len({h for h, _ in emitted}) == len(emitted)


def test_sessionize_gap_splits(spark, tmp_path):
    d = str(tmp_path / "sess")
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),  # session A (2)
        (1, "2024-01-01 11:30:00"), (1, "2024-01-01 11:40:00"), (1, "2024-01-01 11:50:00"),  # B (3)
        (2, "2024-01-01 09:00:00"),  # C (1)
    ]
    df = spark.createDataFrame(
        [(i, ts, u) for i, (u, ts) in enumerate(rows)], "event_id long, ts string, user_id long"
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
        F.lit("click").alias("event_type"), F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = sev.stream_events(spark, d)
    sessions = sev.sessionize(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_t").collect()
    # availableNow ends before the processing-time timeout fires, so only
    # sessions CLOSED by a gap within the data are emitted: user 1's first
    # session (closed by the 80-min gap)
    closed = {(r.user_id, r.n_events) for r in got}
    assert (1, 2) in closed


def test_sliding_rollup_matches_batch_overlap(spark, sf_dir, landing):
    """Sliding 2h/1h windows: the finished stream must equal the batch
    computation where every event is exploded into its two overlapping
    windows — and each window's count must equal the sum of its two
    tumbling-hour halves (the overlap invariant)."""
    stream = sev.stream_events(spark, landing)
    rollup = sev.sliding_rollup_stream(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("slide_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT wstart, event_type, n_events, sum_value FROM slide_t")

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("s0", F.date_trunc("hour", "ts"))
    )
    exploded = ev.select(
        F.explode(
            F.array(F.col("s0"), F.col("s0") - F.expr("INTERVAL 1 HOUR"))
        ).alias("wstart"),
        "event_type",
        "value",
    )
    batch = exploded.groupBy("wstart", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0

    # overlap invariant: sliding(2h) count == sum of its two 1h buckets
    hourly = ev.groupBy(F.col("s0").alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("n1")
    )
    joined = (
        got.join(
            hourly.select(F.col("h").alias("wstart"), "event_type",
                          F.col("n1").alias("n_first")),
            ["wstart", "event_type"], "left")
        .join(
            hourly.select((F.col("h") - F.expr("INTERVAL 1 HOUR")).alias("wstart"),
                          "event_type", F.col("n1").alias("n_second")),
            ["wstart", "event_type"], "left")
    )
    bad = joined.filter(
        F.col("n_events")
        != F.coalesce("n_first", F.lit(0)) + F.coalesce("n_second", F.lit(0))
    )
    assert bad.count() == 0


def test_acid_stream_sink_exactly_once_replay(spark, sf_dir, tmp_path):
    """acid_merge_sink: micro-batches land as idempotent ACID commits —
    a REPLAYED batch (crash between sink write and stream checkpoint)
    is a no-op, so the contract is exactly-once, not just
    at-least-once + PK dedup.  The final snapshot equals the batch
    query over the landed rows."""
    import uuid

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "user_id", "event_type", "value")
    )
    landing = str(tmp_path / "landing")
    # overlapping id ranges: replayed ROWS across batches exercise upsert
    for lo, hi in ((0, 1500), (1000, 2200), (2000, 3000)):
        ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(landing)
    target = str(tmp_path / "acid_t")
    sink = sev.acid_merge_sink(target, ["event_id"], app_id="test_app")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"))
        .start()
    )
    q.awaitTermination(300)

    t = AcidTable(spark, target)
    head = t.latest_version()
    assert head is not None and head >= 1  # create + >=1 merge commits
    last_batch = t.last_txn("test_app")
    assert last_batch is not None and last_batch >= 1

    # exact contents vs the batch query
    want = {tuple(r) for r in ev.collect()}
    got = {
        tuple(r)
        for r in t.snapshot().select("event_id", "user_id", "event_type", "value").collect()
    }
    assert got == want

    # --- replay the LAST batch (what a restart-after-crash does): no-op
    replay_df = ev.filter((F.col("event_id") >= 2000) & (F.col("event_id") < 3000))
    sink(replay_df, last_batch)
    assert t.latest_version() == head  # no new commit
    # --- replay an OLDER batch: also a no-op
    sink(ev.filter(F.col("event_id") < 1500), 0)
    assert t.latest_version() == head
    # --- the NEXT batch still commits normally
    sink(replay_df, last_batch + 1)
    assert t.latest_version() == head + 1
    assert t.snapshot().count() == ev.count()  # idempotent contents


def test_acid_stream_sink_periodic_compaction(spark, sf_dir, tmp_path):
    """compact_every: the sink bounds small-file growth by running
    OPTIMIZE after every N batches — contents stay exact, history shows
    the optimize commits, and the final snapshot reads few files."""
    import uuid

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2400)
        .select("event_id", "user_id", "event_type", "value")
    )
    landing = str(tmp_path / "landing")
    for lo in range(0, 2400, 400):  # 6 micro-batches
        ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < lo + 400)).coalesce(
            1
        ).write.mode("append").parquet(landing)
    target = str(tmp_path / "acid_t")
    sink = sev.acid_merge_sink(
        target, ["event_id"], app_id="compact_app", compact_every=3, target_files=2
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}"))
        .start()
    )
    q.awaitTermination(300)

    t = AcidTable(spark, target)
    ops = [h["operation"] for h in t.history()]
    assert ops.count("optimize") == 2  # after batches 3 and 6
    assert len(t.entries()) == 2  # compacted tail
    got = {tuple(r) for r in t.snapshot().collect()}
    assert got == {tuple(r) for r in ev.collect()}


def test_minhash_index_sink_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streamed MinHash signature index (exactly-once foreachBatch
    sink) must equal a batch minhash_signatures over everything
    streamed, and incremental dedup probing the STREAMED index must
    equal incremental dedup probing freshly computed corpus signatures
    — the index maintains itself without ever re-reading the corpus."""
    import uuid

    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_signatures,
    )
    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import minhash_index_sink

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "idx")
    # two overlapping corpus slices stream in
    corpus.filter(F.col("doc_id") % 10 < 6).coalesce(1).write.mode("append").parquet(landing)
    corpus.filter(F.col("doc_id") % 10 >= 4).coalesce(1).write.mode("append").parquet(landing)
    sink = minhash_index_sink(target, app_id="t_mhidx", portable=True)
    q = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"

    idx = AcidTable(spark, target).snapshot()
    streamed = {(r["doc_id"], tuple(r["sig"])) for r in idx.collect()}
    fresh = {
        (r["id"], tuple(r["sig"]))
        for r in minhash_signatures(corpus, portable=True).collect()
    }
    assert streamed == fresh

    via_index = sorted(
        r["doc_id"]
        for r in minhash_dedup_incremental(
            batch, corpus, portable=True,
            corpus_sigs=idx.withColumnRenamed("doc_id", "id"),
        ).collect()
    )
    via_fresh = sorted(
        r["doc_id"]
        for r in minhash_dedup_incremental(batch, corpus, portable=True).collect()
    )
    assert via_index == via_fresh


def test_ivf_index_sink_exactly_once_and_crash_replay(spark, sf_dir, tmp_path):
    """ivf_index_sink (round 8): committed-batch replay is a no-op;
    a HALF-PUBLISHED crash (segment files present, marker absent) is
    cleaned up on replay so the final index is byte-identical to the
    clean run; markers survive ivf_index_compact so replay detection
    outlives maintenance."""
    import glob

    from bigdatamigratecloud_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    sample = [
        r[0] for r in emb.select("embedding").orderBy("vec_id").limit(256).collect()
    ]
    cents = similarity._kmeans_fit(sample, k=6)
    d = str(tmp_path / "sivf")
    sink = sev.ivf_index_sink(d, cents, app_id="t")

    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    sink(b0, 0)
    sink(b1, 1)

    def rows():
        return sorted(
            (r["vec_id"], r["cluster"]) for r in spark.read.parquet(d).collect()
        )

    def files():
        return sorted(
            os.path.relpath(f, d)
            for f in glob.glob(os.path.join(d, "cluster=*", "*.parquet"))
        )

    clean_rows, clean_files = rows(), files()
    assert all("t-0-" in f or "t-1-" in f for f in clean_files)

    # committed replay: nothing changes
    sink(b1, 1)
    assert files() == clean_files and rows() == clean_rows

    # crash simulation: delete batch 1's marker and one of its segments
    # (half-published state), then replay -> identical to the clean run
    os.remove(os.path.join(d, "_txn", "t-1"))
    victim = [f for f in clean_files if "t-1-" in f][0]
    os.remove(os.path.join(d, victim))
    assert rows() != clean_rows
    sink(b1, 1)
    assert files() == clean_files and rows() == clean_rows

    # markers survive compaction; post-compact replay still a no-op
    similarity.ivf_index_compact(spark, d)
    assert os.path.isdir(os.path.join(d, "_txn"))
    compact_rows = rows()
    sink(b0, 0)
    sink(b1, 1)
    assert rows() == compact_rows


def test_pack_sequences_sink_stream_equals_batch(spark, tmp_path):
    """pack_sequences_sink (round 8): streaming packing with the carry
    buffer must equal batch pack_token_sequences over the full stream
    — including n_docs when the carry tail spans several small docs;
    committed replay publishes nothing; a half-published crash replays
    to byte-identical segments."""
    import glob
    import json

    from bigdatamigratecloud_spark.operators.sampling import pack_token_sequences

    rows = [(i, list(range(i * 100, i * 100 + (3 if i % 3 == 0 else 45)))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    d = str(tmp_path / "pk")
    sink = sev.pack_sequences_sink(d, app_id="t", seq_len=64, eos_id=-1)
    for b, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        sink(df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)

    streamed = sorted(
        (r["seq_id"], r["n_docs"], tuple(r["ids"]))
        for r in spark.read.parquet(d + "/data").collect()
    )
    batch = sorted(
        (r["seq_id"], r["n_docs"], tuple(r["ids"]))
        for r in pack_token_sequences(
            df, "doc_id", "ids", seq_len=64, eos_id=-1, drop_last=True
        ).collect()
    )
    assert streamed == batch and len(streamed) > 3

    # stream tail + carry = full token stream (nothing lost at boundaries)
    with open(d + "/_carry/t-3") as fh:
        carry = json.load(fh)
    streamed_tokens = [i for _, _, ids in streamed for i in ids] + carry["tail"]
    want = [i for _, ids in rows for i in ids + [-1]]
    assert streamed_tokens == want

    files = sorted(glob.glob(d + "/data/*.parquet"))
    sink(df.filter(F.col("doc_id") >= 20), 2)  # committed replay: no-op
    assert sorted(glob.glob(d + "/data/*.parquet")) == files
    # crash: drop batch 2's marker and one published segment, replay
    os.remove(d + "/_txn/t-2")
    victims = [f for f in files if "/t-2-" in f]
    os.remove(victims[0])
    sink(df.filter(F.col("doc_id") >= 20), 2)
    assert sorted(glob.glob(d + "/data/*.parquet")) == files
    re_rows = sorted(
        (r["seq_id"], r["n_docs"], tuple(r["ids"]))
        for r in spark.read.parquet(d + "/data").collect()
    )
    assert re_rows == batch


def test_pack_sequences_sink_validates_id_column(spark, tmp_path):
    """Round-9 ADVICE fix: a non-integral doc_id would cast to NULL and
    vanish silently at the offsets join; NULL/negative ids would break
    ordering vs the carry pseudo-row.  Both must fail LOUDLY."""
    import pytest

    d = str(tmp_path / "pkv")
    sink = sev.pack_sequences_sink(d, app_id="t", seq_len=8)
    sdf = spark.createDataFrame([("x", [1, 2])], "doc_id string, ids array<int>")
    with pytest.raises(TypeError, match="integral"):
        sink(sdf, 0)
    ndf = spark.createDataFrame(
        [(-1, [1, 2]), (None, [3, 4])], "doc_id long, ids array<int>"
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        sink(ndf, 0)
    # nothing half-published by the failed attempts
    assert not os.path.exists(d + "/_txn")


def test_pack_sequences_sink_history_retention(spark, tmp_path):
    """Round-9 ADVICE fix: _txn markers and _carry records are pruned
    beyond retain_history so a long-running stream's bookkeeping stays
    bounded — while data segments and the packed token stream remain
    intact."""
    import glob
    import json

    d = str(tmp_path / "pkr")
    rows = [(i, list(range(i * 20, i * 20 + 11))) for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    sink = sev.pack_sequences_sink(d, app_id="t", seq_len=16, retain_history=5)
    for b in range(12):
        sink(df.filter(F.col("doc_id") % 12 == b), b)
    markers = set(os.listdir(d + "/_txn"))
    carries = set(os.listdir(d + "/_carry"))
    # after batch 11: keep markers 7..11, carries 7..12
    assert markers == {f"t-{k}" for k in range(7, 12)}
    assert carries == {f"t-{k}" for k in range(7, 13)}
    # retention is bookkeeping-only: every token of every batch is
    # still present exactly once in data + final carry tail
    streamed = sorted(
        (r["seq_id"], tuple(r["ids"]))
        for r in spark.read.parquet(d + "/data").collect()
    )
    with open(d + "/_carry/t-12") as fh:
        tail = json.load(fh)["tail"]
    got = [i for _, ids in streamed for i in ids] + tail
    want = []
    for b in range(12):
        for i, ids in rows:
            if i % 12 == b:
                want.extend(ids)
    assert got == want
    assert len(glob.glob(d + "/data/t-*.parquet")) > 0


def test_cusum_stream_equals_batch_across_batches(spark, tmp_path):
    """The carried prefix state must make a 2-slice stream reproduce the
    single-frame batch statistic exactly (micro-units = decimal x 1e6)."""
    import uuid

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.temporal import cusum_flags
    from bigdatamigratecloud_spark.streaming.events import cusum_stream, stream_events

    rows = [
        (1, i, i, v)
        for i, v in enumerate([10.0, 80.0, 80.0, 5.0, 5.0, 90.0, 90.0, 90.0])
    ] + [(2, i, 100 + i, 55.0) for i in range(4)]
    ev = spark.createDataFrame(
        rows, "user_id long, t long, event_id long, value double"
    ).select(
        "user_id", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
        "event_id", "value",
    ).withColumn("event_type", F.lit("x")).withColumn("props", F.lit("{}"))

    d = str(tmp_path / "cusum_landing")
    ev.filter(F.col("t") < 4).coalesce(1).write.mode("append").parquet(d)
    ev.filter(F.col("t") >= 4).coalesce(1).write.mode("append").parquet(d)

    got_rows = []
    q = (
        cusum_stream(stream_events(spark, d, max_files_per_trigger=1),
                     target=50.0, slack=5.0, threshold=60.0)
        .writeStream.foreachBatch(lambda b, _i: got_rows.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", d + f"/_ckpt_{uuid.uuid4().hex[:6]}")
        .start()
    )
    assert q.awaitTermination(120)

    batch = cusum_flags(
        ev.select("user_id", "ts", "event_id", "value"),
        target=50.0, slack=5.0, threshold=60.0,
    ).collect()
    want = {
        r["event_id"]: (
            int(r["cusum_pos"] * 1_000_000),
            int(r["cusum_neg"] * 1_000_000),
            r["alarm"],
        )
        for r in batch
    }
    got = {
        r["event_id"]: (r["cusum_pos_u"], r["cusum_neg_u"], r["alarm"])
        for r in got_rows
    }
    assert got == want
    assert any(a for _, _, a in got.values())  # the drift really alarms


def test_lateness_stats_flags_late_batch_and_pins_no_silent_drop(spark, tmp_path):
    """lateness_stats (round 10): per-batch lateness/state counters from
    recentProgress.  Pins the pyspark-4.1 semantics the docstring
    states: a row behind the watermark is NOT silently discarded by a
    windowed aggregation — it emits a late partial aggregate — and the
    batch that carried it is flagged late_input_seen."""
    import uuid

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.streaming.events import (
        hourly_rollup_stream,
        lateness_stats,
        stream_events,
    )

    d = str(tmp_path / "late_landing")

    def mk(rows):
        spark.createDataFrame(
            rows,
            "event_id long, t long, user_id long, event_type string, value double, props string",
        ).select(
            "event_id", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(d)

    mk([(i, 100_000 + i * 3600, 1, "a", 1.0, "{}") for i in range(4)])
    # one event ~25 h behind the advanced watermark, one on-time
    mk([(9, 10_000, 1, "a", 1.0, "{}"), (10, 115_000, 1, "a", 1.0, "{}")])

    got = []
    q = (
        hourly_rollup_stream(
            stream_events(spark, d, max_files_per_trigger=1), watermark="1 hour"
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", d + f"/_ckpt_{uuid.uuid4().hex[:6]}")
        .start()
    )
    assert q.awaitTermination(120)
    stats = lateness_stats(q)

    assert [s["batch_id"] for s in stats] == sorted(s["batch_id"] for s in stats)
    by_late = [s for s in stats if s["late_input_seen"]]
    assert len(by_late) == 1 and by_late[0]["input_rows"] == 2  # the planted batch
    assert all(s["state_rows"] >= 0 and s["operators"] for s in stats)
    # no-silent-drop: the late event's hour window IS emitted downstream
    late_hours = [r for r in got if str(r["hour"]).startswith("1970-01-01 02")]
    assert len(late_hours) == 1 and late_hours[0]["n_events"] == 1
    # engine reported no state-store drops for this shape
    assert all(s["dropped_by_watermark"] == 0 for s in stats)


def test_lateness_stats_on_multi_watermark_join(spark, tmp_path):
    """lateness_stats over a stream-stream interval join: the
    multi-watermark caveat (no per-batch event min/max -> the late flag
    stays False) must hold without error, state/drop counters parse,
    and the join output is unaffected."""
    import uuid

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.streaming.events import (
        interval_join_stream,
        lateness_stats,
        stream_events,
    )

    d = str(tmp_path / "lj_landing")

    def mk(rows):
        spark.createDataFrame(
            rows,
            "event_id long, t long, user_id long, event_type string, value double, props string",
        ).select(
            "event_id", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(d)

    mk([(1, 100_000, 7, "purchase", 5.0, "{}"), (2, 100_900, 7, "click", 0.0, "{}")])
    mk([(4, 10_000, 7, "purchase", 9.0, "{}"), (5, 110_500, 7, "click", 0.0, "{}")])

    got = []
    s = stream_events(spark, d, max_files_per_trigger=1)
    q = (
        interval_join_stream(s, s, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", d + f"/_ckpt_{uuid.uuid4().hex[:6]}")
        .start()
    )
    assert q.awaitTermination(120)
    stats = lateness_stats(q)
    assert stats and all(isinstance(s["dropped_by_watermark"], int) for s in stats)
    assert any(s["operators"] for s in stats)  # the join's state op reported
    assert all(s["late_input_seen"] is False for s in stats)  # documented caveat
    assert sorted((r["click_id"], r["purchase_value"]) for r in got) == [(2, 5.0)]


def test_cusum_stream_decimal_boundary_equals_batch(spark, tmp_path):
    """Increments landing exactly on a 1e-6 HALF_UP boundary (e.g.
    dev = 5e-07) must round identically in the stream's Python Decimal
    path and Spark's double->DECIMAL(18,6) cast.  Spark/DuckDB round
    the SHORTEST double repr (BigDecimal.valueOf: 5e-07 -> 0.000001);
    Decimal(d) on the exact binary expansion (4.9999...e-07) would
    round to 0 — the round-9 ADVICE finding."""
    import uuid

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.temporal import cusum_flags
    from bigdatamigratecloud_spark.streaming.events import cusum_stream, stream_events

    # target=slack=0 makes dev == value, so the boundary is planted
    # directly: 5e-07 and -5e-07 are exact half-way doubles at 1e-6.
    vals = [5e-07, -5e-07, 1.5e-06, 0.75, 5e-07, 0.5]
    ev = spark.createDataFrame(
        [(1, i, i, v) for i, v in enumerate(vals)],
        "user_id long, t long, event_id long, value double",
    ).select(
        "user_id", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
        "event_id", "value",
    ).withColumn("event_type", F.lit("x")).withColumn("props", F.lit("{}"))

    d = str(tmp_path / "cusum_bnd")
    ev.filter(F.col("t") < 3).coalesce(1).write.mode("append").parquet(d)
    ev.filter(F.col("t") >= 3).coalesce(1).write.mode("append").parquet(d)

    got_rows = []
    q = (
        cusum_stream(stream_events(spark, d, max_files_per_trigger=1),
                     target=0.0, slack=0.0, threshold=1.0)
        .writeStream.foreachBatch(lambda b, _i: got_rows.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", d + f"/_ckpt_{uuid.uuid4().hex[:6]}")
        .start()
    )
    assert q.awaitTermination(120)

    batch = cusum_flags(
        ev.select("user_id", "ts", "event_id", "value"),
        target=0.0, slack=0.0, threshold=1.0,
    ).collect()
    want = {
        r["event_id"]: (int(r["cusum_pos"] * 1_000_000),
                        int(r["cusum_neg"] * 1_000_000), r["alarm"])
        for r in batch
    }
    got = {
        r["event_id"]: (r["cusum_pos_u"], r["cusum_neg_u"], r["alarm"])
        for r in got_rows
    }
    assert got == want
    # the boundary really exercised HALF_UP: the very first event's
    # positive side is 1 microunit, not 0 (5e-07 rounds UP)
    assert got[0][0] == 1


def test_cusum_stream_validates_args(spark, tmp_path):
    import pytest as _pytest

    from bigdatamigratecloud_spark.streaming.events import cusum_stream, stream_events

    d = str(tmp_path / "cusum_v")
    spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(d)
    s = stream_events(spark, d)
    with _pytest.raises(ValueError):
        cusum_stream(s, threshold=0.0)
    with _pytest.raises(ValueError):
        cusum_stream(s, slack=-1.0)


def test_trend_sums_stream_equals_batch(spark, tmp_path):
    """Complete-mode sufficient statistics across 2 micro-batches must
    equal the single-frame closed form."""
    import uuid

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.streaming.events import (
        TREND_EPOCH_US,
        stream_events,
        trend_from_sums,
        trend_sums_stream,
    )

    rows = [
        (i, TREND_EPOCH_US + i * 3_600_000_000, 1, "a", float(3 * i + 7), "{}")
        for i in range(8)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, t long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.timestamp_micros("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    d = str(tmp_path / "trend_landing")
    ev.filter(F.col("event_id") < 4).coalesce(1).write.mode("append").parquet(d)
    ev.filter(F.col("event_id") >= 4).coalesce(1).write.mode("append").parquet(d)

    name = f"tt_{uuid.uuid4().hex[:6]}"
    q = (
        trend_sums_stream(stream_events(spark, d, max_files_per_trigger=1))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", d + "/_ckpt")
        .start()
    )
    assert q.awaitTermination(120)
    got = trend_from_sums(spark.table(name)).collect()[0]
    # exact line value = 3*x + 7 where x is the hour index
    assert got["slope"] == 3.0 and got["intercept"] == 7.0 and got["n"] == 8


def test_stream_url_gate_equals_batch(spark, tmp_path):
    """Round 11: blocklist + robots gates over a WARC stream equal the
    same gates over the batch read — both are stateless stream-static
    broadcast joins, so micro-batch boundaries must not change any
    verdict (including wildcard robots rules)."""
    import uuid as _uuid

    from bigdatamigratecloud_spark.operators import urls
    from bigdatamigratecloud_spark.sources import warc
    from bigdatamigratecloud_spark.streaming.events import run_stream_to_memory

    txt = (
        "User-agent: *\n"
        "Disallow: /p/1\n"
        "Allow: /p/12\n"
        "Disallow: /p/*7/$\n"
    )
    rules = urls.robots_rules(
        spark.createDataFrame(
            [("keep.example", txt)], "host string, robots_txt string"
        )
    )
    bl = spark.createDataFrame([("blocked.example",)], "domain string")
    out = spark.range(0, 40).select(
        F.concat(
            F.when(F.col("id") % 4 == 0, F.lit("http://blocked.example"))
            .otherwise(F.lit("http://keep.example")),
            F.lit("/p/"),
            F.col("id").cast("string"),
            F.lit("/"),
        ).alias("target_uri"),
        F.encode(F.lit("x"), "UTF-8").alias("payload"),
    )
    d = str(tmp_path / "landing")
    warc.write_warc(out.repartition(3), d)

    def gate(df):
        return urls.robots_gate(
            urls.url_blocklist_filter(df, bl), rules, "*"
        ).select("target_uri")

    qname = f"t_{_uuid.uuid4().hex[:8]}_urlgate"
    run_stream_to_memory(gate(warc.stream_warc(spark, d)), qname)
    got = sorted(r.target_uri for r in spark.table(qname).collect())
    want = sorted(r.target_uri for r in gate(warc.read_warc(spark, d)).collect())
    assert got == want and len(got) > 0
    # spot-check a wildcard verdict survived the stream: id 27 -> /p/27/
    # is blocked by /p/*7/$ even though no plain prefix rule matches it
    assert all("/p/27/" not in u and "/p/7/" not in u for u in got)
    assert any("/p/26/" in u for u in got)


def test_lateness_stats_isolated_per_concurrent_query(spark, tmp_path):
    """Round-11 sweep (judge task 3): two streaming queries running
    CONCURRENTLY — lateness_stats(handle) must report each query's own
    batches only (recentProgress is per-handle), with no cross-
    contamination of counts or flags."""
    import uuid

    from bigdatamigratecloud_spark.streaming.events import (
        hourly_rollup_stream,
        lateness_stats,
        stream_events,
    )

    def mk(d, rows):
        spark.createDataFrame(
            rows,
            "event_id long, t long, user_id long, event_type string, value double, props string",
        ).select(
            "event_id", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(d)

    d1, d2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    # query 1: clean stream, 2 files; query 2: carries a late batch, 3 files
    mk(d1, [(i, 200_000 + i * 3600, 1, "a", 1.0, "{}") for i in range(3)])
    mk(d1, [(7, 300_000, 1, "a", 1.0, "{}")])
    mk(d2, [(i, 100_000 + i * 3600, 1, "a", 1.0, "{}") for i in range(4)])
    mk(d2, [(9, 10_000, 1, "a", 1.0, "{}")])
    mk(d2, [(10, 400_000, 1, "a", 1.0, "{}")])

    def start(d):
        return (
            hourly_rollup_stream(
                stream_events(spark, d, max_files_per_trigger=1), watermark="1 hour"
            )
            .writeStream.outputMode("append")
            .format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", d + f"/_ckpt_{uuid.uuid4().hex[:6]}")
            .start()
        )

    q1, q2 = start(d1), start(d2)
    assert q1.awaitTermination(120) and q2.awaitTermination(120)
    s1, s2 = lateness_stats(q1), lateness_stats(q2)
    assert sum(s["input_rows"] for s in s1) == 4
    assert sum(s["input_rows"] for s in s2) == 6
    assert not any(s["late_input_seen"] for s in s1)  # q1 had no late rows
    assert sum(1 for s in s2 if s["late_input_seen"]) == 1  # q2's planted batch
    assert {s["batch_id"] for s in s1} == set(range(len(s1)))
    assert {s["batch_id"] for s in s2} == set(range(len(s2)))


def test_stream_url_gate_is_stateless(spark, tmp_path):
    """The streaming URL/robots gate must run with ZERO state operators
    (pure stream-static broadcast joins): state would mean the plan
    regressed to a stream-stream join, which grows unbounded on a 24/7
    crawl ingest."""
    import uuid as _uuid

    from bigdatamigratecloud_spark.operators import urls
    from bigdatamigratecloud_spark.sources import warc

    rules = urls.robots_rules(
        spark.createDataFrame(
            [("k.example", "User-agent: *\nDisallow: /p/*1/$\n")],
            "host string, robots_txt string",
        )
    )
    bl = spark.createDataFrame([("gone.example",)], "domain string")
    out = spark.range(0, 20).select(
        F.concat(F.lit("http://k.example/p/"), F.col("id"), F.lit("/")).alias(
            "target_uri"
        ),
        F.encode(F.lit("x"), "UTF-8").alias("payload"),
    )
    d = str(tmp_path / "landing")
    warc.write_warc(out.coalesce(1), d)
    gated = urls.robots_gate(
        urls.url_blocklist_filter(warc.stream_warc(spark, d), bl), rules, "*"
    ).select("target_uri")
    q = (
        gated.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", d + f"/_ckpt_{_uuid.uuid4().hex[:6]}")
        .start()
    )
    assert q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p]
    assert progresses
    for p in progresses:
        assert not (p if isinstance(p, dict) else __import__("json").loads(p.json)).get(
            "stateOperators"
        ), "streaming URL gate must be stateless"


def test_constraints_enforced_through_streaming_sinks(spark, tmp_path):
    """A CHECK constraint on the target table must refuse a violating
    micro-batch in acid_merge_sink (the batch fails loudly; the table
    keeps its pre-batch state), since the sink routes through merge."""
    import pytest as _pytest

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import acid_merge_sink

    target = str(tmp_path / "t")
    t = AcidTable.create(
        spark,
        target,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
        key_cols=["id"],
    )
    t.add_check_constraint("v_pos", "v > 0")
    sink = acid_merge_sink(target, ["id"], app_id="cstream")
    sink(spark.createDataFrame([(3, 30)], "id long, v long"), 0)
    with _pytest.raises(ValueError, match="v_pos"):
        sink(spark.createDataFrame([(4, -1)], "id long, v long"), 1)
    got = {r["id"]: r["v"] for r in t.snapshot().collect()}
    assert got == {1: 10, 2: 20, 3: 30}


def test_acid_backfill_sink_date_slices_and_unsupported_types(spark, tmp_path):
    """Round 12 (ADVICE): the backfill sink's predicate builder renders
    date/timestamp slice values as TYPED literals (DATE '...'), so the
    docstring's 'replace a day' use case actually works — bare str()
    rendered `day IN (2024-01-01)`, which Spark parses as integer
    arithmetic.  Unsupported slice types fail with a clear TypeError."""
    import datetime

    import pytest as _pytest

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import acid_backfill_sink

    root = str(tmp_path / "t")
    sink = acid_backfill_sink(root, slice_col="day", app_id="bf")
    d0, d1 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    sink(
        spark.createDataFrame([(d0, 1, 10.0), (d1, 2, 20.0)],
                              "day date, id long, v double"), 0
    )
    # batch 1 REPLACES the day-0 slice (drops id=1, lands id=3)
    sink(spark.createDataFrame([(d0, 3, 30.0)], "day date, id long, v double"), 1)
    got = {(r["day"], r["id"], r["v"]) for r in AcidTable(spark, root).snapshot().collect()}
    assert got == {(d0, 3, 30.0), (d1, 2, 20.0)}
    # a replayed batch is a txn no-op
    sink(spark.createDataFrame([(d0, 9, 99.0)], "day date, id long, v double"), 1)
    assert {r["id"] for r in AcidTable(spark, root).snapshot().collect()} == {2, 3}
    # unsupported slice value types fail loudly, not with a parse error
    bad = acid_backfill_sink(str(tmp_path / "t2"), slice_col="day", app_id="bf2")
    with _pytest.raises(TypeError, match="unsupported type"):
        bad(spark.createDataFrame([([1], 1)], "day array<int>, id long"), 0)


def test_follow_changes_replicates_and_replays_idempotently(spark, tmp_path):
    """Round 12: the commit-log follower applies each source version as
    one idempotent micro-batch; a restarted follower resumes from the
    txn ledger, replays no-op, and the replica tracks the source
    through merge + delete + overwrite_where — including a masked
    (deletion-vector) delete."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import follow_changes

    base = spark.range(0, 2_000).withColumn(
        "grp", (F.col("id") % 4).cast("int")
    ).withColumn("v", F.col("id") * 10).repartitionByRange(4, "id")
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["id"])
    rep = AcidTable.create(spark, str(tmp_path / "rep"), base, key_cols=["id"])

    src.merge(spark.createDataFrame([(5, 1, -1), (3000, 2, -2)],
                                    "id long, grp int, v long"), ["id"])
    src.delete("id % 400 = 7")  # 5 rows -> deletion vectors on src
    repl = (
        src.snapshot().where("grp = 3").withColumn("v", F.lit(0).cast("long"))
    )
    repl = spark.createDataFrame(repl.collect(), repl.schema)
    src.overwrite_where(repl, "grp = 3")

    applied = follow_changes(src, rep, "cdc", base_version=0)
    assert applied == [1, 2, 3]  # one micro-batch per source commit
    assert rep.last_txn("cdc") == 3
    s = {tuple(r) for r in src.snapshot().collect()}
    assert {tuple(r) for r in rep.snapshot().collect()} == s
    # drained: nothing more to apply; replay of an old batch no-ops
    assert follow_changes(src, rep, "cdc") == []
    v_before = rep.latest_version()
    rep.apply_cdc(src.changes(1, 2), txn=("cdc", 2))  # explicit replay
    assert rep.latest_version() == v_before
    # a FRESH follower instance resumes from the ledger alone
    src.append(spark.createDataFrame([(9000, 0, 1)], "id long, grp int, v long"))
    rep2 = AcidTable(spark, str(tmp_path / "rep"))
    assert follow_changes(src, rep2, "cdc") == [4]
    assert {tuple(r) for r in rep2.snapshot().collect()} == {
        tuple(r) for r in src.snapshot().collect()
    }
    # max_batches bounds a drain without losing the offset
    src.delete("id = 0")
    src.delete("id = 1")
    assert follow_changes(src, rep2, "cdc", max_batches=1) == [5]
    assert follow_changes(src, rep2, "cdc") == [6]
    # fresh ledger without base_version fails loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="base_version"):
        follow_changes(src, AcidTable(spark, str(tmp_path / "rep")), "other")


def test_follow_aggregate_maintains_view_incrementally(spark, tmp_path):
    """The maintained count/sum view equals a from-scratch GROUP BY
    after merge/delete/append churn; new groups appear, zeroed groups
    vanish; replays and drained followers no-op via the txn ledger."""
    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import (
        follow_aggregate,
        seed_aggregate,
    )

    base = (
        spark.range(600)
        .withColumnRenamed("id", "k")
        .withColumn("g", F.col("k") % 5)
        .withColumn("x", (F.col("k") % 40).cast("decimal(18,2)"))
    )
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["k"])
    agg = seed_aggregate(src, str(tmp_path / "mv"), "mv", ["g"], ["x"])
    assert agg.last_txn("mv") == 0
    upd = (
        src.snapshot()
        .where("k % 50 = 0")
        .withColumn("x", (F.col("x") * 3).cast("decimal(18,2)"))
    )
    src.merge(spark.createDataFrame(upd.collect(), upd.schema), ["k"])
    src.delete("k % 7 = 0")
    src.append(
        spark.range(900, 960)
        .withColumnRenamed("id", "k")
        .withColumn("g", F.lit(77).cast("long"))
        .withColumn("x", F.lit(2).cast("decimal(18,2)"))
    )
    # rate-limited drain: one batch, then the rest
    assert follow_aggregate(src, agg, "mv", ["g"], ["x"], max_batches=1) == [1]
    assert follow_aggregate(src, agg, "mv", ["g"], ["x"]) == [2, 3]
    assert follow_aggregate(src, agg, "mv", ["g"], ["x"]) == []
    direct = src.snapshot().groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("x").alias("sum_x")
    )
    mv = agg.snapshot()
    assert mv.exceptAll(direct).count() == 0
    assert direct.exceptAll(mv).count() == 0
    assert mv.where("g = 77").count() == 1
    # zero the new group out: its view row must be deleted
    src.delete("g = 77")
    follow_aggregate(src, agg, "mv", ["g"], ["x"])
    assert agg.snapshot().where("g = 77").count() == 0


def test_follow_aggregate_guards(spark, tmp_path):
    """Fresh ledger without a seed is an error; a view that doesn't
    correspond to the claimed base_version raises on negative count
    instead of publishing garbage."""
    import pytest

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import follow_aggregate

    base = (
        spark.range(50)
        .withColumnRenamed("id", "k")
        .withColumn("g", F.col("k") % 3)
        .withColumn("x", F.lit(1).cast("decimal(18,2)"))
    )
    src = AcidTable.create(spark, str(tmp_path / "src"), base, key_cols=["k"])
    empty_view = AcidTable.create(
        spark,
        str(tmp_path / "mv"),
        spark.createDataFrame(
            [], "g long, cnt long, sum_x decimal(28,2)"
        ),
        key_cols=["g"],
    )
    with pytest.raises(ValueError, match="fresh ledger"):
        follow_aggregate(src, empty_view, "mv", ["g"], ["x"])
    # claim the view (empty) matches version 0, then delete rows: the
    # signed deltas drive counts negative -> corruption error
    src.delete("k < 10")
    with pytest.raises(ValueError, match="negative"):
        follow_aggregate(src, empty_view, "mv", ["g"], ["x"], base_version=0)


def test_follow_aggregate_rejects_null_sum_values(spark, tmp_path):
    """SQL SUM ignores NULLs while delta arithmetic propagates them, so
    NULL sum values are rejected loudly at seed AND per batch instead
    of silently diverging the view."""
    import pytest

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.streaming.events import (
        follow_aggregate,
        seed_aggregate,
    )

    base = (
        spark.range(40)
        .withColumnRenamed("id", "k")
        .withColumn("g", F.col("k") % 3)
        .withColumn(
            "x",
            F.when(F.col("k") == 7, F.lit(None)).otherwise(F.lit(1)).cast(
                "decimal(18,2)"
            ),
        )
    )
    src = AcidTable.create(spark, str(tmp_path / "bad"), base, key_cols=["k"])
    with pytest.raises(ValueError, match="NULL sum-column"):
        seed_aggregate(src, str(tmp_path / "mv0"), "mv", ["g"], ["x"])
    clean = base.where("k != 7")
    src2 = AcidTable.create(spark, str(tmp_path / "src"), clean, key_cols=["k"])
    agg = seed_aggregate(src2, str(tmp_path / "mv"), "mv", ["g"], ["x"])
    src2.append(
        spark.createDataFrame([(100, 1, None)], "k long, g long, x decimal(18,2)")
    )
    with pytest.raises(ValueError, match="NULL sum-column"):
        follow_aggregate(src2, agg, "mv", ["g"], ["x"])
