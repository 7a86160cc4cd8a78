"""Fixture-type regression gate (round-3 verdict item 3): every temporal
operator must ANALYZE and RUN against the REAL driver fixtures, whatever
timestamp physical type they carry.

Round 3 broke precisely here: the fixtures' `events.ts` changed from
parquet TIMESTAMP(NANOS) (read as bigint under nanosAsLong, converted in
load_table) to `timestamp[us]` with isAdjustedToUTC=false (read as
TIMESTAMP_NTZ in Spark 4), and `unix_micros` rejects NTZ — while the unit
tests kept passing on createDataFrame synthetics (TIMESTAMP_LTZ).  These
tests pin the operators to the fixture files themselves, so the next
fixture regeneration cannot silently break the driver path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
)


def test_events_ts_loads_as_timestamp_type(spark, sf_dir):
    """load_table must hand downstream code a *timestamp* ts column —
    TIMESTAMP or TIMESTAMP_NTZ, never raw bigint nanos — regardless of
    which parquet physical type the fixture generation used."""
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    assert isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)), ts_type
    # and the session tz is pinned so NTZ->TIMESTAMP casts at epoch call
    # sites are instant-preserving (catalog._ensure_utc_session)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_temporal_ops_analyze_and_run_on_real_fixture(spark, sf_dir):
    """sessionize / range_join / asof_join on the actual events.parquet:
    analysis must succeed (the round-3 failure was an AnalysisException)
    and a small execution must produce sane values."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    sess = sessionize(ev, gap_us=1_800_000_000)
    _ = sess.schema  # forces analysis
    one_user = sess.orderBy("user_id", "ts", "event_id").limit(50).collect()
    assert len(one_user) == 50
    assert all(r["session_no"] >= 1 for r in one_user)

    rj = range_join(ev, ev, on="user_id", lower_us=0, upper_us=3_600_000_000)
    _ = rj.schema
    sample = rj.limit(20).collect()
    assert sample  # fixtures guarantee same-user events within the hour
    assert all(0 < r["delta_us"] <= 3_600_000_000 for r in sample)

    aj = asof_join(
        ev.limit(100),
        ev.select("user_id", "ts", F.col("event_id").alias("eid")),
        on="user_id",
        right_cols=["eid"],
        tolerance_us=3_600_000_000,  # exercises the epoch-diff tolerance path
    )
    _ = aj.schema
    assert aj.count() == 100  # left-outer: every left row exactly once


def test_sessionize_epoch_matches_python_reference(spark, sf_dir):
    """Value-level pin against an engine-independent reference: recompute
    sessions for the busiest user in plain Python over the collected naive
    timestamps and compare.  Catches any timezone-shift bug in the
    NTZ->TIMESTAMP epoch path (a tz offset would move gap boundaries)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()[0]
    rows = (
        sessionize(ev.filter(F.col("user_id") == uid), gap_us=1_800_000_000)
        .orderBy("ts", "event_id")
        .collect()
    )
    # python reference over the same naive datetimes
    want, sess, prev = [], 0, None
    for r in rows:
        t = r["ts"]
        assert isinstance(t, dt.datetime)
        if prev is None or (t - prev) > dt.timedelta(minutes=30):
            sess += 1
        want.append(sess)
        prev = t
    got = [r["session_no"] for r in rows]
    assert got == want
