"""Melt -> pivot must be a fixed point (SURVEY §5 item 2): the reference's
core contract is that export -> import -> apply reproduces the table
(Codeunit 60000:706-798 melt; 60000:527 apply/pivot)."""

from __future__ import annotations

import pytest

from bigdatamigratecloud_spark.catalog import PRIMARY_KEYS, load_table
from bigdatamigratecloud_spark.operators.staging import melt_to_staging, pivot_from_staging


@pytest.mark.parametrize("table", ["region", "nation", "customer", "orders", "lineitem"])
def test_melt_pivot_roundtrip(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    pk = PRIMARY_KEYS[table] if table != "lineitem" else None
    staged = melt_to_staging(df, table, key_cols=pk)
    back = pivot_from_staging(staged, df.schema)

    assert back.count() == df.count()
    # exact set equality both directions
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


def test_melt_shape(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    staged = melt_to_staging(df, "region", key_cols=("r_regionkey",))
    n_fields = len(df.columns)
    assert staged.count() == df.count() * n_fields
    assert set(staged.columns) == {
        "package_code",
        "table_name",
        "record_no",
        "field_name",
        "value",
        "error",
    }


def test_pivot_group_key_order_is_semantics_free(spark):
    """Round-13 guard: pivot_from_staging groups by (record_no,
    package_code, table_name) — reordered for SortAggregate comparison
    cost — which must produce exactly the rows the reference grouping
    (package_code, table_name, record_no) did, including duplicate-cell
    max() resolution."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging

    staging = spark.createDataFrame(
        [
            ("PKG", "t", 1, "a", "x", None),
            ("PKG", "t", 1, "b", "7", None),
            # duplicate (record, field) cell: max() keeps 'z'
            ("PKG", "t", 2, "a", "y", None),
            ("PKG", "t", 2, "a", "z", None),
            ("PKG", "t", 2, "b", None, None),
        ],
        "package_code STRING, table_name STRING, record_no LONG, "
        "field_name STRING, value STRING, error STRING",
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.LongType())]
    )
    rows = {
        tuple(r) for r in pivot_from_staging(staging, schema).collect()
    }
    assert rows == {("x", 7), ("z", None)}
