"""Unit tests for the scalar function library (SURVEY §5 item 3): name
sanitization rule table, A1-ref math, sheet-name clamp, DateFormula
evaluation, XSD mapping, toposort."""

from __future__ import annotations

import datetime as dt

import pytest

from bigdatamigratecloud_spark.functions import scalars as S
from bigdatamigratecloud_spark.plans.toposort import toposort_tables


# GetElementName rule table (Codeunit 60000:925-939)
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Customer", "Customer"),
        ("No.", "No"),                      # '.' -> space -> stripped
        ("Bill-to Name", "Bill_toName"),     # '-' -> '_', spaces deleted last
        ("Amount (LCY)", "AmountLCY"),       # parens -> space -> deleted
        ("2nd Field", "_2ndField"),          # bad start char -> '_' prefix
        ("What?", "What"),                   # '?' deleted
        ("a<b>c", "abc"),
        ("100%", "_100"),
        ("", "_"),
    ],
)
def test_sanitize_xml_name(raw, expected):
    assert S.sanitize_xml_name(raw) == expected


def test_a1_math_roundtrip():
    # Codeunit 60001:720-737
    for i in [1, 2, 26, 27, 28, 52, 53, 702, 703, 16384]:
        assert S.a1_col_index(S.a1_col_letters(i)) == i
    assert S.a1_col_letters(1) == "A"
    assert S.a1_col_letters(27) == "AA"
    assert S.parse_a1("B7") == (7, 2)
    assert S.parse_a1_range("A3:E6") == ((3, 1), (6, 5))
    assert S.parse_a1_range("C2") == ((2, 3), (2, 3))
    with pytest.raises(ValueError):
        S.a1_col_index("A1")
    with pytest.raises(ValueError):
        S.parse_a1("7B")


def test_sheet_name_clamp():
    # Codeunit 60001:758-767: 31-char cap, invalid chars stripped
    assert S.clamp_sheet_name("Short") == "Short"
    assert S.clamp_sheet_name("Inva[l]id:Na*me?/\\") == "InvalidName"
    long = "A Very Long Configuration Table Name Indeed"
    out = S.clamp_sheet_name(long, table_id=27)
    assert len(out) <= 31 and out.startswith("27 ")


@pytest.mark.parametrize(
    "formula,base,expected",
    [
        ("<1M>", dt.date(2024, 1, 15), dt.date(2024, 2, 15)),
        ("<-1W>", dt.date(2024, 1, 15), dt.date(2024, 1, 8)),
        ("<CM>", dt.date(2024, 2, 10), dt.date(2024, 2, 29)),   # leap month end
        ("<1M+CM>", dt.date(2024, 1, 15), dt.date(2024, 2, 29)),
        ("<2D>", dt.date(2024, 12, 30), dt.date(2025, 1, 1)),
        ("<1Y>", dt.date(2024, 2, 29), dt.date(2025, 2, 28)),   # leap clamp
        ("<CQ>", dt.date(2024, 5, 5), dt.date(2024, 6, 30)),
        ("<CY>", dt.date(2024, 5, 5), dt.date(2024, 12, 31)),
        ("<3M>", dt.date(2024, 1, 31), dt.date(2024, 4, 30)),   # month-end clamp
        ("", dt.date(2024, 1, 1), dt.date(2024, 1, 1)),
    ],
)
def test_dateformula(formula, base, expected):
    assert S.eval_dateformula(formula, base) == expected


def test_dateformula_bad_input():
    with pytest.raises(ValueError):
        S.eval_dateformula("<1X>", dt.date(2024, 1, 1))


def test_xsd_mapping():
    # GetXSDType (Codeunit 60000:1030-1051)
    assert S.xsd_type("bigint") == "xsd:integer"
    assert S.xsd_type("timestamp") == "xsd:dateTime"
    assert S.xsd_type("boolean") == "xsd:boolean"
    assert S.xsd_type("string") == "xsd:string"
    assert S.xsd_type("decimal(38,6)") == "xsd:string"


def test_toposort_cycle_detection():
    with pytest.raises(ValueError, match="cycle"):
        toposort_tables(["a", "b"], [("a", "b"), ("b", "a")])


def test_toposort_priority_tiebreak():
    out = toposort_tables(["z", "a", "m"], [], priority={"z": 0, "a": 1, "m": 2})
    assert out == ["z", "a", "m"]


def test_filename_stamp_shape():
    s = S.filename_stamp(dt.datetime(2024, 3, 5, 7, 9, 11))
    assert s == "05_03_24_07_09_11"


def test_dateformula_expr_matches_python_eval(spark):
    """The Catalyst-compiled DateFormula must agree with the reference
    Python evaluator on a grid of formulas x dates (month ends, leap
    days, year/quarter boundaries)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.functions.scalars import (
        dateformula_expr,
        eval_dateformula,
    )

    dates = [dt.date(2023, 12, 15) + dt.timedelta(days=i * 13) for i in range(40)]
    dates += [dt.date(2024, 1, 31), dt.date(2024, 2, 29), dt.date(2023, 2, 28),
              dt.date(2024, 12, 31), dt.date(2024, 3, 31)]
    formulas = ["<1M>", "<CM>", "<-1W>", "<1M+CM>", "<CQ>", "<CY>", "<2D>",
                "<-3M>", "<1Q>", "<3WD>", "<-1Y>", "<CW>", "<1Y+CQ>", "<-2Q+CM>"]

    df = spark.createDataFrame([(d,) for d in dates], "d date")
    out = df.select(
        "d", *[dateformula_expr(f, F.col("d")).alias(f"f{i}") for i, f in enumerate(formulas)]
    ).collect()
    for row in out:
        for i, f in enumerate(formulas):
            want = eval_dateformula(f, row["d"])
            assert row[f"f{i}"] == want, (f, row["d"], row[f"f{i}"], want)


def test_locale_date_pattern_lcid_and_primary_fallback():
    # exact LCID overrides
    assert S.locale_date_pattern(1033) == "M/d/yyyy"     # en-US
    assert S.locale_date_pattern(2057) == "dd/MM/yyyy"   # en-GB
    # ANY LCID of a known primary language resolves via the low 10 bits
    assert S.locale_date_pattern(3082) == "dd/MM/yyyy"   # es-ES (modern sort)
    assert S.locale_date_pattern(11274) == "dd/MM/yyyy"  # es-AR
    assert S.locale_date_pattern(1041) == "yyyy/MM/dd"   # ja-JP
    assert S.locale_date_pattern(2052) == "yyyy/M/d"     # zh-CN
    assert S.locale_date_pattern(4108) == "dd/MM/yyyy"   # fr-CH via primary French
    # truly unknown language -> ISO-8601 (XML-mode rendering)
    assert S.locale_date_pattern(0x3FF) == "yyyy-MM-dd"


def test_localized_date_renders(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit("2024-03-07").cast("date").alias("d"))
    row = df.select(
        S.localized_date(F.col("d"), 1033).alias("us"),
        S.localized_date(F.col("d"), 1049).alias("ru"),
        S.localized_date(F.col("d"), 11274).alias("es_ar"),
        S.localized_date(F.col("d"), 999999).alias("unknown"),
    ).collect()[0]
    assert row.us == "3/7/2024"
    assert row.ru == "07.03.2024"
    assert row.es_ar == "07/03/2024"
    assert row.unknown == "2024-03-07"


def test_dateformula_wd_digit_after_unit():
    """NAV's canonical weekday form puts the digit AFTER the unit:
    <WD4> = the coming Thursday (previously raised ValueError; only the
    nonstandard digit-first '4WD' parsed)."""
    import datetime as dt

    from bigdatamigratecloud_spark.functions.scalars import eval_dateformula

    fri = dt.date(2026, 8, 14)  # a Friday
    assert eval_dateformula("<WD4>", fri) == dt.date(2026, 8, 20)  # next Thu
    assert eval_dateformula("<WD5>", fri) == dt.date(2026, 8, 21)  # next Fri, not today
    assert eval_dateformula("<WD4>", fri) == eval_dateformula("<4WD>", fri)
    assert eval_dateformula("<CM+WD1>", fri) == dt.date(2026, 9, 7)


def test_dateformula_expr_wd_digit_matches_eval(spark):
    import datetime as dt

    from bigdatamigratecloud_spark.functions.scalars import (
        dateformula_expr,
        eval_dateformula,
    )

    base = dt.date(2026, 8, 14)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(base,)], "d date")
    (row,) = df.select(dateformula_expr("<WD3>", F.col("d")).alias("r")).collect()
    assert row.r == eval_dateformula("<WD3>", base)


def test_sanitize_xml_name_col_matches_driver_for_ascii(spark):
    """The column variant must agree with the driver variant on ASCII
    names (it previously kept invalid NameChars like '*' and prefixed
    valid non-ASCII starts)."""
    from bigdatamigratecloud_spark.functions.scalars import (
        sanitize_xml_name,
        sanitize_xml_name_col,
    )

    from pyspark.sql import functions as F

    cases = ["a*b", "No.", "3field", "field name", "a&b", "x=y!z",
             "-lead", "", "Field_1", "a.b-c", "?que", "x:y"]
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    got = {
        r.v: r.s
        for r in df.select("v", sanitize_xml_name_col(F.col("v")).alias("s")).collect()
    }
    for c in cases:
        assert got[c] == sanitize_xml_name(c), c
