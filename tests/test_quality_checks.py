"""Deequ-style expectation suite (round 9): one-pass metric law,
per-rule semantics incl. null keys and empty frames, unknown-rule
raise."""

import pytest

from bigdatamigratecloud_spark.operators.quality_checks import check_suite


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "A", 5.0, "ok-1"),
        (2, "B", -3.0, "ok-2"),
        (2, "C", 7.0, "bad"),     # duplicate id
        (None, "A", 2.0, "ok-3"),  # null id
        (4, "Z", None, None),      # out-of-set category, nulls
    ]
    return spark.createDataFrame(rows, "id long, cat string, x double, tag string")


def test_rule_semantics(spark, frame):
    got = {
        r.rule_id: r
        for r in check_suite(
            frame,
            [
                {"type": "not_null", "col": "id"},
                {"type": "unique", "cols": ["id"]},
                {"type": "min_ge", "col": "x", "value": 0.0},
                {"type": "max_le", "col": "x", "value": 10.0},
                {"type": "accepted_values", "col": "cat", "values": ["A", "B", "C"]},
                {"type": "matches_regex", "col": "tag", "pattern": "^ok-"},
                {"type": "row_count_between", "min": 5, "max": 5},
            ],
        ).collect()
    }
    assert (got[0].metric, got[0].passed) == (1.0, False)   # one null id
    assert (got[1].metric, got[1].passed) == (1.0, False)   # 5 rows, 4 distinct keys
    assert (got[2].metric, got[2].passed) == (-3.0, False)  # min below bound
    assert (got[3].metric, got[3].passed) == (7.0, True)
    assert (got[4].metric, got[4].passed) == (1.0, False)   # 'Z'
    assert (got[5].metric, got[5].passed) == (1.0, False)   # 'bad'
    assert (got[6].metric, got[6].passed) == (5.0, True)


def test_empty_frame_and_bad_rule(spark, frame):
    empty = frame.limit(0)
    got = {
        r.rule: r
        for r in check_suite(
            empty,
            [
                {"type": "min_ge", "col": "x", "value": 0.0},
                {"type": "not_null", "col": "id"},
                {"type": "row_count_between", "min": 1, "max": 10},
            ],
        ).collect()
    }
    assert got["min_ge"].metric is None and got["min_ge"].passed is False
    assert got["not_null"].passed is True
    assert got["row_count_between"].passed is False
    with pytest.raises(ValueError, match="unknown rule"):
        check_suite(frame, [{"type": "positive"}])
    with pytest.raises(ValueError, match="at least one"):
        check_suite(frame, [])


def test_single_job(spark, frame):
    """All rules compile into one aggregate: the plan has exactly one
    Aggregate chain, not one per rule (count_distinct rewrites add an
    expand, never per-rule scans)."""
    from pyspark.sql import functions as F

    agg = frame.agg(
        F.count(F.when(F.col("id").isNull(), 1)),
        F.count(F.lit(1)) - F.count_distinct(F.struct("id")),
        F.min("x"),
        F.max("x"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


# ---------------------------------------------------------------- profiler

def test_profile_frame_metrics_and_single_scan(spark):
    from bigdatamigratecloud_spark.operators.quality_checks import profile_frame

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (None, "a")],
        "k long, s string",
    )
    got = {r["column_name"]: r for r in profile_frame(df).collect()}
    assert got["k"]["n_rows"] == 4 and got["s"]["n_rows"] == 4
    assert got["k"]["n_nulls"] == 1 and got["s"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 2 and got["s"]["n_distinct"] == 2
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "2")
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    # one aggregation over one scan: no join anywhere in the plan
    plan = profile_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_profile_frame_guards(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.quality_checks import profile_frame

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        profile_frame(df, [])
    with _pytest.raises(ValueError):
        profile_frame(df, ["nope"])
    with _pytest.raises(ValueError):
        profile_frame(df, ["k'"])
