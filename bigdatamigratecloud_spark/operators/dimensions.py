"""Dimension handling (J1/J2, SURVEY §2.3): the reference's analytical
key-value tags attached to records.

Reference model (GetDimValueFromTable, Codeunit 60000:894-922; tables 480
Dimension Set Entry / 352 Default Dimension):
- a record carries an integer `Dimension Set ID`; (set_id, dim_code) ->
  value code via Dim Set Entry;
- when the record has no set (or the set lacks the code), the DEFAULT
  dimension for (table, master no., dim_code) applies (XML:912-921);
- Excel export flattens selected dimensions to extra columns
  ("Dimensions as Columns", XML:119-138, 225-226).

Spark design: both lookup tables are dimension-sized -> broadcast left
joins; flattening N dim codes is N independent broadcast joins (no
shuffle of the fact side at any scale); the map rendering is
map_from_arrays over the same joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical schemas
DIM_SET_ENTRY_COLS = ("dim_set_id", "dim_code", "dim_value_code")  # ≈ table 480
DEFAULT_DIM_COLS = ("table_name", "master_no", "dim_code", "dim_value_code")  # ≈ table 352


def dim_value_with_fallback(
    fact: DataFrame,
    dim_set_entries: DataFrame,
    default_dims: DataFrame,
    dim_code: str,
    table_name: str,
    master_no_col: str = "master_no",
    set_id_col: str = "dim_set_id",
    out_col: str | None = None,
) -> DataFrame:
    """Resolve one dimension code per fact row: dim-set entry first, then
    the (table, master no.) default — exactly GetDimValueFromTable."""
    out_col = out_col or dim_code.lower()
    from_set = (
        dim_set_entries.filter(F.col("dim_code") == dim_code)
        .select(F.col("dim_set_id").alias("__sid"), F.col("dim_value_code").alias("__v_set"))
    )
    from_default = (
        default_dims.filter((F.col("dim_code") == dim_code) & (F.col("table_name") == table_name))
        .select(F.col("master_no").alias("__mno"), F.col("dim_value_code").alias("__v_def"))
    )
    out = (
        fact.join(F.broadcast(from_set), fact[set_id_col] == F.col("__sid"), "left")
        .join(F.broadcast(from_default), fact[master_no_col] == F.col("__mno"), "left")
        .withColumn(out_col, F.coalesce(F.col("__v_set"), F.col("__v_def")))
        .drop("__sid", "__v_set", "__mno", "__v_def")
    )
    return out


def dims_as_columns(
    fact: DataFrame,
    dim_set_entries: DataFrame,
    default_dims: DataFrame,
    dim_codes: list[str],
    table_name: str,
    set_id_col: str = "dim_set_id",
    master_no_col: str = "master_no",
) -> DataFrame:
    """Flatten several dimension codes to columns (Excel-mode
    'Dimensions as Columns', XML:119-138): N broadcast left joins."""
    out = fact
    for code in dim_codes:
        out = dim_value_with_fallback(
            out, dim_set_entries, default_dims, code, table_name,
            set_id_col=set_id_col, master_no_col=master_no_col,
        )
    return out


def dims_as_map(
    fact: DataFrame,
    dim_set_entries: DataFrame,
    set_id_col: str = "dim_set_id",
    out_col: str = "dims",
) -> DataFrame:
    """Render a record's full dimension set as a MapType column (the
    engine-native representation; SURVEY §1.1 maps Dimensions to
    MapType(string, string))."""
    sets = dim_set_entries.groupBy("dim_set_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("dim_code", "dim_value_code"))
        ).alias(out_col)
    )
    return fact.join(
        F.broadcast(sets), fact[set_id_col] == sets["dim_set_id"], "left"
    ).drop(sets["dim_set_id"])
