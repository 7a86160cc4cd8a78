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
