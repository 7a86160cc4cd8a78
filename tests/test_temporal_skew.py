"""Temporal joins (as-of, bounded-range) and skew-safe aggregation:
result equivalence vs the naive formulation, edge semantics (ties,
tolerance, bounds), and the physical-plan properties that make them scale
(as-of = one shuffle + window, NO join node; range = pure equi-join on
(key, bucket), never a nested-loop; count-distinct = exactly 2 exchanges).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.operators.skew import skew_safe_count_distinct
from bigdatamigratecloud_spark.operators.temporal import asof_join, range_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_matches_naive(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")

    got = asof_join(clicks, buys, on="user_id", right_cols=["value"])

    # naive: left join on key + range, keep max right ts per left row
    j = clicks.alias("c").join(
        buys.alias("p"),
        (F.col("c.user_id") == F.col("p.user_id")) & (F.col("p.ts") <= F.col("c.ts")),
        "left",
    )
    naive = (
        j.groupBy("c.event_id", "c.user_id", "c.ts")
        .agg(F.max(F.col("p.ts")).alias("ts_asof"))
        .alias("m")
        .join(
            buys.alias("p2"),
            (F.col("m.user_id") == F.col("p2.user_id"))
            & (F.col("m.ts_asof") == F.col("p2.ts")),
            "left",
        )
        .select("m.event_id", "m.user_id", "m.ts", "m.ts_asof",
                F.col("p2.value").alias("value_asof"))
    )
    assert got.count() == clicks.count()  # left-outer: every left row once
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_asof_inclusive_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")], "k int, t long, lbl string"
    ).select("k", F.timestamp_micros("t").alias("ts"), "lbl")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 20.0), (2, 60, 30.0)], "k int, t long, v double"
    ).select("k", F.timestamp_micros("t").alias("ts"), "v")

    out = {
        r["lbl"]: r
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    assert out["a"]["v_asof"] == 10.0  # equal timestamps match (inclusive)
    assert out["b"]["v_asof"] == 20.0  # latest prior, not first
    assert out["c"]["v_asof"] is None  # right is strictly later -> no match

    tol = {
        r["lbl"]: r
        for r in asof_join(
            left, right, on="k", right_cols=["v"], tolerance_us=40
        ).collect()
    }
    assert tol["a"]["v_asof"] == 10.0  # delta 0 <= 40
    assert tol["b"]["v_asof"] is None  # delta 50 > 40 -> masked


def test_asof_plan_one_shuffle_no_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    plan = _plan(asof_join(clicks, buys, on="user_id", right_cols=["value"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # matching is the window sweep, not a join
    assert plan.count("Window") == 1


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------

def test_range_join_matches_naive(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    cols = ["event_id", "user_id", "ts", "event_id_r", "ts_r", "delta_us"]
    got = range_join(ev, ev, on="user_id", lower_us=0, upper_us=3_600_000_000).select(cols)

    a, b = ev.alias("a"), ev.alias("b")
    # cast: fixtures' ts is TIMESTAMP_NTZ, which raw unix_micros rejects
    delta = F.unix_micros(F.col("b.ts").cast("timestamp")) - F.unix_micros(
        F.col("a.ts").cast("timestamp")
    )
    naive = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .where((delta > 0) & (delta <= 3_600_000_000))
        .select(
            F.col("a.event_id"), F.col("a.user_id"), F.col("a.ts"),
            F.col("b.event_id").alias("event_id_r"), F.col("b.ts").alias("ts_r"),
            delta.alias("delta_us"),
        )
        .select(cols)
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_range_join_bounds(spark):
    ev = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 1000), (3, 1, 2000)], "event_id int, user_id int, t long"
    ).select("event_id", "user_id", F.timestamp_micros("t").alias("ts"))

    def pairs(**kw):
        return {
            (r["event_id"], r["event_id_r"])
            for r in range_join(ev, ev, on="user_id", **kw).collect()
        }

    # default (lower exclusive, upper inclusive): (0,1000] from each row
    assert pairs(lower_us=0, upper_us=1000) == {(1, 2), (2, 3)}
    # inclusive lower picks up the self-pairs at delta 0
    assert pairs(lower_us=0, upper_us=1000, lower_inclusive=True) == {
        (1, 1), (2, 2), (3, 3), (1, 2), (2, 3)
    }
    # window spanning multiple buckets
    assert pairs(lower_us=0, upper_us=2000) == {(1, 2), (2, 3), (1, 3)}


def test_range_join_plan_is_equi_join(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    plan = _plan(range_join(ev, ev, on="user_id", lower_us=0, upper_us=3_600_000_000))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the join is an equi-join on (user_id, bucket); strategy may be
    # broadcast (small fixture) or shuffled at scale — either is fine
    assert any(k in plan for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))


# ---------------------------------------------------------------------------
# skew-safe count distinct
# ---------------------------------------------------------------------------

def test_skew_safe_count_distinct_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_suppkey")
    got = {
        r["l_returnflag"]: r["n"]
        for r in skew_safe_count_distinct(li, "l_returnflag", "l_suppkey", out="n").collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_suppkey").alias("n"))
        .collect()
    }
    assert got == want


def test_skew_safe_count_distinct_ignores_nulls_and_plan(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)], "k string, v int"
    )
    rows = {r["k"]: r["n_distinct"] for r in skew_safe_count_distinct(df, "k", "v").collect()}
    # all-NULL group is KEPT with count 0, matching GROUP BY k COUNT(DISTINCT v)
    assert rows == {"a": 1, "b": 0}

    plan = _plan(skew_safe_count_distinct(df, "k", "v"))
    assert plan.count("Exchange hashpartitioning") == 2


def test_salted_sum_exact_and_deterministic(spark, sf_dir):
    from bigdatamigratecloud_spark.operators.skew import salted_sum

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    sums = {"s": F.sum(F.col("l_quantity").cast("decimal(18,6)"))}
    got = {r["l_returnflag"]: r["s"] for r in salted_sum(li, "l_returnflag", sums).collect()}
    want = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s"))
        .collect()
    }
    assert got == want
    # content-derived salt: a second run assigns identical groups
    again = {r["l_returnflag"]: r["s"] for r in salted_sum(li, "l_returnflag", sums).collect()}
    assert again == got
    plan = _plan(salted_sum(li, "l_returnflag", sums))
    assert "monotonically_increasing_id" not in plan


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's sessions run with AQE skew-join on; verify it actually
    fires: a join where one key holds ~90% of the rows must have its hot
    partition split at runtime (final adaptive plan tags the SMJ with
    isSkew=true) and still produce exact results."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        joined = left.join(right, "k")
        # execute THIS DataFrame's own QueryExecution (count() would plan a
        # separate query and leave joined's adaptive plan unexecuted)
        n = len(joined.collect())
        # exact: key 7 matches (180k rows x 1), plus ids 0,10,20,30,40 self-matches
        assert n == 180_000 + 5
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_frequent_keys_exact_vs_full_groupby(spark):
    """frequent_keys: exactly the keys at/above the threshold with exact
    counts (sketch candidates recounted; false positives dropped), on a
    distribution with two heavies, a just-below-threshold key, and a
    long tail; empty result when nothing qualifies."""
    import math

    from bigdatamigratecloud_spark.operators.skew import frequent_keys

    rows = (
        [("hot1",)] * 400
        + [("hot2",)] * 250
        + [("warm",)] * 99      # 9.9% — just below the 10% threshold
        + [(f"tail{i}",) for i in range(251)]
    )
    df = spark.createDataFrame(rows, "k: string").repartition(16)
    total = len(rows)
    got = {(r["k"], r["cnt"]) for r in frequent_keys(df, "k", 0.10).collect()}
    thresh = math.ceil(0.10 * total)
    want = {
        (r["k"], r["count"])
        for r in df.groupBy("k").count().filter(F.col("count") >= thresh).collect()
    }
    assert got == want
    assert {k for k, _ in got} == {"hot1", "hot2"}

    none = frequent_keys(df, "k", 0.9)
    assert none.count() == 0
    assert none.columns == ["k", "cnt"]


def test_frequent_keys_null_heavy_hitter(spark):
    """A NULL key holding >= min_frac of the rows must be reported by the
    sketch path exactly like the small-N fallback reports it: isin()
    never matches NULL rows, so the recount filter carries an explicit
    isNull() arm.  Also pins the symmetric case — a NULL group BELOW
    the threshold stays excluded (the exact recount drops it)."""
    from bigdatamigratecloud_spark.operators.skew import frequent_keys

    rows = [(None,)] * 600 + [(f"tail{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k: string").repartition(16)
    got = {(r["k"], r["cnt"]) for r in frequent_keys(df, "k", 0.5).collect()}
    assert got == {(None, 600)}

    # NULL present but light: must NOT appear
    rows2 = [("hot",)] * 600 + [(None,)] * 50 + [(f"t{i}",) for i in range(350)]
    df2 = spark.createDataFrame(rows2, "k: string").repartition(16)
    got2 = {(r["k"], r["cnt"]) for r in frequent_keys(df2, "k", 0.5).collect()}
    assert got2 == {("hot", 600)}


def test_resample_gapfill_fills_every_bucket(spark, sf_dir):
    """Gap-fill on the REAL events parquet (NTZ fixture path): the dense
    axis is contiguous per group (bucket deltas exactly 1 hour), filled
    buckets are zero, and aggregating only the non-empty buckets equals
    the plain GROUP BY."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.temporal import resample_gapfill

    ev = load_table(spark, sf_dir, "events")
    out = resample_gapfill(ev, "ts", ["event_type"], "value").cache()

    # contiguity: per group, count == (max-min)/1h + 1
    spans = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        ((F.unix_timestamp(F.max("bucket").cast("timestamp"))
          - F.unix_timestamp(F.min("bucket").cast("timestamp"))) / 3600 + 1
         ).cast("long").alias("expected"),
    )
    assert spans.where("k <> expected").count() == 0

    # zero-filled rows are consistent
    assert out.where("n = 0 AND sum_value <> 0.0").count() == 0

    # non-empty buckets reproduce the plain GROUP BY
    sparse = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = out.where("n > 0").select("event_type", "bucket", "n").exceptAll(
        sparse.select("event_type", "bucket", "n")
    )
    assert joined.count() == 0
    out.unpersist()


def test_interpolate_linear_hand_cases(spark):
    """Hand-checkable lerp: observations at hour 0 (v=10) and hour 4
    (v=30) -> interiors 15/20/25; a bucket with two readings anchors at
    their mean; leading/trailing empty buckets stay NULL."""
    from bigdatamigratecloud_spark.operators.temporal import interpolate_linear

    rows = [
        (1, "2024-01-01 00:15:00", "g", 10.0),
        (2, "2024-01-01 04:45:00", "g", 30.0),
        (3, "2024-01-01 04:50:00", "g", 30.0),  # same bucket: mean anchor
        (4, "2024-01-01 02:00:00", "h", 5.0),   # single-point group
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["event_type"], str(r["bucket"])): (r["n"], r["value_interp"])
        for r in interpolate_linear(df, "ts", ["event_type"], "value").collect()
    }
    assert out[("g", "2024-01-01 00:00:00")] == (1, 10.0)
    assert out[("g", "2024-01-01 01:00:00")] == (0, 15.0)
    assert out[("g", "2024-01-01 02:00:00")] == (0, 20.0)
    assert out[("g", "2024-01-01 03:00:00")] == (0, 25.0)
    assert out[("g", "2024-01-01 04:00:00")] == (2, 30.0)
    assert out[("h", "2024-01-01 02:00:00")] == (1, 5.0)
    assert len([k for k in out if k[0] == "g"]) == 5


def test_resample_null_group_and_null_ts_not_lost(spark):
    """NULL group keys fill like any other group (null-safe join) and
    NULL-timestamp rows pass through as a bucket IS NULL row instead of
    silently vanishing; an all-NULL-value bucket reports n>0 but
    n_vals=0, and interpolate_linear bridges THROUGH it rather than
    anchoring at a fabricated 0.0."""
    from bigdatamigratecloud_spark.operators.temporal import (
        interpolate_linear,
        resample_gapfill,
    )

    rows = [
        (1, "2024-01-01 00:10:00", None, 4.0),
        (2, "2024-01-01 02:10:00", None, 8.0),
        (3, None, "g", 99.0),
        (4, "2024-01-01 00:00:00", "g", 10.0),
        (5, "2024-01-01 01:30:00", "g", None),   # all-NULL-value bucket
        (6, "2024-01-01 02:30:00", "g", 30.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_gapfill(df, "ts", ["event_type"], "value").collect()
    by = {(r["event_type"], str(r["bucket"])): r for r in out}
    # NULL group has its own filled axis
    assert by[(None, "2024-01-01 00:00:00")]["n"] == 1
    assert by[(None, "2024-01-01 01:00:00")]["n"] == 0
    assert by[(None, "2024-01-01 02:00:00")]["n"] == 1
    # NULL-ts row passes through
    assert by[("g", "None")]["n"] == 1
    # all-NULL-value bucket: counted, but no usable reading
    mid = by[("g", "2024-01-01 01:00:00")]
    assert mid["n"] == 1 and mid["n_vals"] == 0 and mid["sum_value"] == 0.0

    interp = {
        str(r["bucket"]): r["value_interp"]
        for r in interpolate_linear(df, "ts", ["event_type"], "value")
        .where("event_type = 'g'")
        .collect()
    }
    # hour 1 bridges 10 -> 30, NOT anchored at 0.0
    assert interp["2024-01-01 01:00:00"] == 20.0


def test_asof_forward_semantics_and_tolerance(spark):
    """direction='forward': earliest right row at-or-after each left ts
    (inclusive at equal timestamps), NULL when none follows, tolerance
    measured forward."""
    from bigdatamigratecloud_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-01 23:00:00")],
        "id long, ts string",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), F.lit(7).alias("k"))
    right = spark.createDataFrame(
        [("2024-01-01 12:00:00", 100.0), ("2024-01-01 13:30:00", 200.0)],
        "ts string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value", F.lit(7).alias("k"))
    out = {
        r["id"]: (r["value_asof"])
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out == {1: 100.0, 2: 100.0, 3: None}  # inclusive at 12:00; none after 23:00
    tol = {
        r["id"]: r["value_asof"]
        for r in asof_join(
            left, right, on="k", direction="forward",
            tolerance_us=30 * 60 * 1_000_000,
        ).collect()
    }
    assert tol == {1: None, 2: 100.0, 3: None}  # 10:00 -> 12:00 exceeds 30 min
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="sideways")


def test_funnel_semantics(spark):
    """Strict ordering, window cutoff, earliest-chain choice, and the
    monotone stage counts."""
    from bigdatamigratecloud_spark.operators.temporal import funnel

    H = 3_600_000_000
    rows = [
        # u1 converts fully: view@0h, click@1h, purchase@2h
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        # u2: click BEFORE view never counts; no click after -> stops at step 1
        (2, "click", 0), (2, "view", 1),
        # u3: click inside window, purchase outside 72h window -> stops at 2
        (3, "view", 0), (3, "click", 1), (3, "purchase", 80),
        # u4: same-timestamp click (not strictly after) ignored; later one ok
        (4, "view", 0), (4, "click", 0), (4, "click", 5), (4, "purchase", 6),
        # u5: no view at all
        (5, "click", 0), (5, "purchase", 1),
    ]
    import datetime

    base = datetime.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(u, t, base + datetime.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r.step: r.users for r in funnel(df, ["view", "click", "purchase"], window_us=72 * H).collect()}
    assert got == {1: 4, 2: 3, 3: 2}  # u1..u4 viewed; u1,u3,u4 clicked; u1,u4 purchased
    import pytest

    with pytest.raises(ValueError, match="two steps"):
        funnel(df, ["view"])


def test_funnel_per_occurrence_reattempt(spark):
    """Round 10: per_occurrence=True lets a chain start at ANY step-1
    event — the user whose FIRST attempt expires but who converts from
    a later fresh start counts, where the default (earliest-start-only)
    semantics misses them."""
    import datetime

    from bigdatamigratecloud_spark.operators.temporal import funnel

    H = 3_600_000_000
    base = datetime.datetime(2024, 3, 1)
    rows = [
        # u1: first view's window (72h) expires with no click; a second
        # view at 100h starts a fresh chain that fully converts
        (1, "view", 0), (1, "view", 100), (1, "click", 101), (1, "purchase", 102),
        # u2: converts only from the earliest view — both modes count it
        (2, "view", 0), (2, "click", 1), (2, "purchase", 2),
        # u3: clicks at 80h — outside EVERY view window (single view)
        (3, "view", 0), (3, "click", 80),
    ]
    df = spark.createDataFrame(
        [(u, t, base + datetime.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )
    steps = ["view", "click", "purchase"]
    default = {r.step: r.users for r in funnel(df, steps, window_us=72 * H).collect()}
    retry = {r.step: r.users for r in funnel(
        df, steps, window_us=72 * H, per_occurrence=True).collect()}
    assert default == {1: 3, 2: 1, 3: 1}  # u1's late conversion invisible
    assert retry == {1: 3, 2: 2, 3: 2}    # u1 counts via the re-attempt


def test_cohort_retention_semantics(spark):
    from bigdatamigratecloud_spark.operators.temporal import cohort_retention
    import datetime

    mon = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, mon), (1, mon + datetime.timedelta(days=8)),   # week 0 and 1
        (2, mon + datetime.timedelta(days=2)),              # week 0 only
        (3, mon + datetime.timedelta(days=7)),              # cohort week 1
        (3, mon + datetime.timedelta(days=21)),             # offset 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.date() if hasattr(r.cohort_week, "date") else r.cohort_week,
         r.week_offset): r.active_users
        for r in cohort_retention(df).collect()
    }
    d0, d1 = mon.date(), (mon + datetime.timedelta(days=7)).date()
    assert got == {(d0, 0): 2, (d0, 1): 1, (d1, 0): 1, (d1, 2): 1}


def test_ema_by_group_semantics(spark):
    """EMA chain law, ordering with tiebreak, alpha validation, and
    physical-layout invariance."""
    import datetime

    import pytest

    from bigdatamigratecloud_spark.operators.temporal import ema_by_group

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (1, 10, base, 4.0),
        (1, 11, base + datetime.timedelta(minutes=1), 8.0),
        (1, 12, base + datetime.timedelta(minutes=2), 16.0),
        # same timestamp: event_id breaks the tie deterministically
        (2, 20, base, 2.0),
        (2, 21, base, 6.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.event_id): r.ema
        for r in ema_by_group(df, alpha=0.5).collect()
    }
    assert got[(1, 10)] == 4.0
    assert got[(1, 11)] == 0.5 * 8.0 + 0.5 * 4.0
    assert got[(1, 12)] == 0.5 * 16.0 + 0.5 * 6.0
    assert got[(2, 20)] == 2.0 and got[(2, 21)] == 0.5 * 6.0 + 0.5 * 2.0
    again = {
        (r.user_id, r.event_id): r.ema
        for r in ema_by_group(df.repartition(7), alpha=0.5).collect()
    }
    assert got == again
    with pytest.raises(ValueError, match="alpha"):
        ema_by_group(df, alpha=0.0)


# ------------------------------------------------------ seasonal decompose

def test_seasonal_decompose_recovers_planted_components(spark):
    from bigdatamigratecloud_spark.operators.temporal import seasonal_decompose

    # planted series: v(h) = 100 + zero-mean seasonal of period 5; the
    # 5-point centered window covers each phase exactly once, so the
    # moving average recovers the constant trend exactly
    season = {0: 8, 1: -2, 2: -4, 3: -2, 4: 0}
    rows = [("a", h, 100 + season[h % 5]) for h in range(40)]
    df = spark.createDataFrame(rows, "g string, h long, v long")
    out = seasonal_decompose(df, "g", "h", "v", period=5, half_window=2)
    got = {r["h"]: r for r in out.collect()}
    # full windows only: h 2..37
    assert sorted(got) == list(range(2, 38))
    for h, r in got.items():
        assert r["trend"] == 100.0, (h, r)
        assert r["seasonal"] == float(season[h % 5]), (h, r)
        assert r["residual"] == 0.0, (h, r)
    # value = trend + seasonal + residual reconstructs exactly here
    for r in got.values():
        assert r["trend"] + r["seasonal"] + r["residual"] == float(r["v"])


def test_seasonal_decompose_validates_args(spark):
    from bigdatamigratecloud_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame([("a", 0, 1)], "g string, h long, v long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        seasonal_decompose(df, "g", "h", "v", period=1)
    with _pytest.raises(ValueError):
        seasonal_decompose(df, "g", "h", "v", half_window=0)


# ------------------------------------------------------------------ CUSUM

def _cusum_ref(vals, target, slack, threshold):
    """Textbook sequential recursion (the identity's ground truth)."""
    from decimal import Decimal

    q = Decimal("0.000001")
    sp = sn = Decimal(0)
    out = []
    for v in vals:
        ip = Decimal(repr(v - (target + slack))).quantize(q)
        inn = Decimal(repr((target - slack) - v)).quantize(q)
        sp = max(Decimal(0), sp + ip)
        sn = max(Decimal(0), sn + inn)
        out.append((sp, sn, sp > Decimal(repr(threshold)) or sn > Decimal(repr(threshold))))
    return out


def test_cusum_matches_sequential_recursion(spark):
    from bigdatamigratecloud_spark.operators.temporal import cusum_flags

    vals = [10.0, 10.25, 9.5, 30.0, 30.5, 31.0, 1.0, 0.5, 10.0, 10.0]
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    got = (
        cusum_flags(df, target=10.0, slack=0.5, threshold=20.0)
        .orderBy("event_id")
        .collect()
    )
    ref = _cusum_ref(vals, 10.0, 0.5, 20.0)
    for r, (sp, sn, al) in zip(got, ref):
        assert r["cusum_pos"] == sp, (r, sp)
        assert r["cusum_neg"] == sn, (r, sn)
        assert r["alarm"] == al


def test_cusum_resets_to_zero_and_alarms_per_group(spark):
    from bigdatamigratecloud_spark.operators.temporal import cusum_flags

    # group 1 drifts up and alarms; group 2 stays put and never does
    rows = [(1, i, i, 100.0) for i in range(5)] + [(2, i, i + 100, 10.0) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    out = cusum_flags(df, target=10.0, slack=0.0, threshold=150.0).collect()
    g1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["event_id"])
    g2 = [r for r in out if r["user_id"] == 2]
    # +90 drift per row: 90, 180 > 150, 270, ...
    assert [bool(r["alarm"]) for r in g1] == [False, True, True, True, True]
    assert all(float(r["cusum_pos"]) == 0.0 and not r["alarm"] for r in g2)


def test_cusum_validates_args(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.temporal import cusum_flags

    df = spark.createDataFrame([(1, 1, 1, 1.0)], "user_id long, ts long, event_id long, value double")
    with _pytest.raises(ValueError):
        cusum_flags(df, threshold=0.0)
    with _pytest.raises(ValueError):
        cusum_flags(df, slack=-1.0)


# ------------------------------------------------------------- Markov

def test_markov_transitions_counts_and_rows(spark):
    import __spark_entry__ as entry_mod

    # replay the registered entry's logic on a hand corpus via the
    # same window/groupBy shape
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "b"),
        (2, 1, 5, "a"), (2, 2, 6, "a"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("f"), F.col("event_type").alias("t"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["f"], r["t"]): r["n"] for r in pairs.collect()}
    # user1: a->b, b->a, a->b ; user2: a->a
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1}


# ------------------------------------------------------------------ ACF

def test_acf_matches_python_replica_and_finds_period(spark):
    from bigdatamigratecloud_spark.operators.temporal import acf_by_group

    # period-4 sawtooth: acf peaks at lag 4
    vals = [0, 3, 1, 2] * 8
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, h long, v long"
    )
    got = {r["lag"]: r["acf"] for r in acf_by_group(df, "g", "h", "v", max_lag=6).collect()}

    n = len(vals)
    s = sum(vals)
    c = [n * v - s for v in vals]
    den = sum(x * x for x in c)
    for k in range(1, 7):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        assert got[k] == num / den, k
    assert got[4] == max(got.values())  # the planted period peaks


def test_acf_short_series_and_validation(spark):
    import math

    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.temporal import acf_by_group

    df = spark.createDataFrame([("g", 0, 1), ("g", 1, 2)], "g string, h long, v long")
    got = {r["lag"]: r["acf"] for r in acf_by_group(df, "g", "h", "v", max_lag=3).collect()}
    assert got[3] is None and got[2] is None  # series shorter than lag
    assert got[1] is not None and not math.isnan(got[1])
    with _pytest.raises(ValueError):
        acf_by_group(df, "g", "h", "v", max_lag=0)


def test_acf_zero_variance_group_emits_null(spark):
    """A constant series has Σc² = 0; with ANSI on (Spark 4 default)
    the unguarded division threw DIVIDE_BY_ZERO while the DuckDB
    oracle returned NULL — round-9 ADVICE.  Both the single-row and
    constant-many-rows shapes must emit NULL acf at every lag."""
    from bigdatamigratecloud_spark.operators.temporal import acf_by_group

    rows = [("one", 0, 7)] + [("flat", i, 3) for i in range(10)] + [
        ("live", i, v) for i, v in enumerate([1, 5, 2, 8])
    ]
    df = spark.createDataFrame(rows, "g string, h long, v long")
    got = acf_by_group(df, "g", "h", "v", max_lag=3).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], {})[r["lag"]] = r["acf"]
    assert all(v is None for v in by_g["one"].values())
    assert all(v is None for v in by_g["flat"].values())
    assert by_g["live"][1] is not None


def test_acf_survives_int64_overflowing_products(spark):
    """With n·v ≈ 3e9 the squared centered values pass int64; the
    DECIMAL(38,0) widening must keep the sums exact (round-9 ADVICE:
    BIGINT products overflowed under ANSI)."""
    from bigdatamigratecloud_spark.operators.temporal import acf_by_group

    big = 3_000_000_000  # n * v lands near 9e18 > int64 when squared
    vals = [big, 0, big, 0, big, 0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, h long, v long"
    )
    got = {r["lag"]: r["acf"] for r in acf_by_group(df, "g", "h", "v", max_lag=2).collect()}
    n, s = len(vals), sum(vals)
    c = [n * v - s for v in vals]
    den = sum(x * x for x in c)
    for k in (1, 2):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        assert got[k] == float(num) / float(den), k


# ------------------------------------------------------------------ OLS

def test_trend_ols_exact_line_and_replica(spark):
    from bigdatamigratecloud_spark.operators.temporal import trend_ols_by_group

    # exact line y = 3x + 7 -> slope 3, intercept 7
    line = [("a", 100 + x, 3 * x + 7) for x in range(10)]
    # noisy series, verify against closed form
    noisy = [("b", x, y) for x, y in enumerate([5, 9, 4, 12, 8, 15])]
    df = spark.createDataFrame(line + noisy, "g string, h long, v long")
    got = {r["g"]: r for r in trend_ols_by_group(df, "g", "h", "v").collect()}
    assert got["a"]["slope"] == 3.0 and got["a"]["intercept"] == 7.0

    xs = list(range(6)); ys = [5, 9, 4, 12, 8, 15]
    n = 6
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    assert got["b"]["slope"] == (n * sxy - sx * sy) / den
    assert got["b"]["intercept"] == (sy * sxx - sx * sxy) / den


def test_trend_ols_degenerate_group_is_null(spark):
    from bigdatamigratecloud_spark.operators.temporal import trend_ols_by_group

    df = spark.createDataFrame([("solo", 5, 42)], "g string, h long, v long")
    row = trend_ols_by_group(df, "g", "h", "v").collect()[0]
    assert row["n"] == 1 and row["slope"] is None and row["intercept"] is None


def test_funnel_same_timestamp_ties(spark):
    """Round-11 sweep (judge task 3): same-timestamp events in retry
    attribution.  The chain is STRICTLY ordered (tu > tprev), so a
    step-2 event sharing its start's timestamp does not advance the
    chain; duplicate same-ts step-1 occurrences collapse to one start;
    and a later fresh start still converts — in both attribution
    modes, deterministically (no event_id tie-break needed: only
    timestamps enter the chain)."""
    from bigdatamigratecloud_spark.operators.temporal import funnel

    rows = [
        # u1: a@10, b@10 -> stage 2 NOT reached (strict order)
        (1, "a", 10), (1, "b", 10),
        # u2: a@10, a@10 (dup start), b@11 -> reaches stage 2 once
        (2, "a", 10), (2, "a", 10), (2, "b", 11),
        # u3: a@10 expires (window 5), fresh a@100, b@102 -> stage 2
        # only under per-occurrence
        (3, "a", 10), (3, "a", 100), (3, "b", 102),
    ]
    df = spark.createDataFrame(
        [(eid, u, et, t) for eid, (u, et, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string, t long",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros(F.col("t")).alias("ts"),
    )
    def counts(per_occ):
        out = funnel(
            df, ["a", "b"], window_us=5, per_occurrence=per_occ
        ).collect()
        return {r["step"]: r["users"] for r in out}

    # earliest-start: u3's first start (t=10) expires -> only u2 converts
    assert counts(False) == {1: 3, 2: 1}
    # per-occurrence: u3's second start converts too
    assert counts(True) == {1: 3, 2: 2}
