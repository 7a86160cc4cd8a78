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
