"""NAV filter grammar: operator forms and the quoting rules (quoted
literals protect the structural characters | & .. — a filter for the
literal value 'R&D' must not compile to two AND'd equality atoms)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.navfilter import nav_filter


@pytest.fixture(scope="module")
def names(spark):
    rows = [(i, v) for i, v in enumerate(
        ["R&D", "A|B", "A..B", "A", "B", "C", "BUILDING", "building", "", None]
    )]
    return spark.createDataFrame(rows, "id int, v string")


def _vals(df, expr):
    return {r.v for r in df.filter(nav_filter("v", expr)).collect()}


def test_plain_forms(names):
    assert _vals(names, "A|B") == {"A", "B"}
    # range is LEXICAL: 'A..B' and 'A|B' both sort between 'A' and 'B'
    assert _vals(names, "A..B") == {"A", "B", "A..B", "A|B"}
    assert _vals(names, "<>A&<>B") >= {"C", "BUILDING"}
    assert _vals(names, "@building") == {"BUILDING", "building"}
    assert _vals(names, "''") == {"", None}


def test_quoted_literal_with_ampersand(names):
    # 'R&D' is ONE value, not (v == 'R') AND (v == 'D')
    assert _vals(names, "'R&D'") == {"R&D"}


def test_quoted_literal_with_pipe_and_range(names):
    assert _vals(names, "'A|B'") == {"A|B"}
    assert _vals(names, "'A..B'") == {"A..B"}
    # and mixing quoted + structural still works
    assert _vals(names, "'A|B'|C") == {"A|B", "C"}
    assert _vals(names, "'R&D'|'A..B'") == {"R&D", "A..B"}


def test_quoted_range_bounds(names):
    # bounds must be compared unquoted: 'B' is inside 'A'..'C' (without
    # the unquote, apostrophe sorts before letters and drops B entirely)
    assert "B" in _vals(names, "'A'..'C'")
    assert _vals(names, "'A'..'C'") == _vals(names, "A..C")


def test_quoted_relop_value(names):
    assert _vals(names, "<>'R&D'&<>''") == {"A|B", "A..B", "A", "B", "C", "BUILDING", "building"}


def test_numeric_ranges(spark):
    df = spark.range(0, 100).select(F.col("id").cast("int").alias("v"))
    got = {r.v for r in df.filter(nav_filter("v", "10..12|97..")).collect()}
    assert got == {10, 11, 12, 97, 98, 99}
