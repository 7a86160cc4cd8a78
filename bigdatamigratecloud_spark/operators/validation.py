"""Per-cell error-tolerant validation.

Reference semantics (Codeunit 60000:774-785): each staged cell is parsed
into its target type with `ConfigValidateMgt.EvaluateValue`; a failure is
RECORDED as error text on the staging row (`FieldError`) and the pipeline
continues — errors never abort the import.  Unknown tables likewise become
error records, not exceptions (Codeunit 60000:543-547).

Spark design: `try_cast`-style parse keeps the raw value, an `error`
column carries the failure message, and `quarantine`/`valid` split the
staging stream.  All JVM-side expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def parse_error_expr(value: Column, data_type: str, field_name: Column | str) -> Column:
    """NULL when `value` parses as `data_type`, else an error message
    mirroring the reference's FieldError text shape."""
    if isinstance(field_name, str):
        field_name = F.lit(field_name)
    dt = data_type.lower()
    if dt in _NUMERIC or dt.startswith("decimal"):
        ok = value.try_cast(dt).isNotNull()
    elif dt == "boolean":
        ok = value.isin("0", "1", "true", "false", "TRUE", "FALSE") | value.try_cast("boolean").isNotNull()
    elif dt in ("date",):
        ok = value.try_cast("date").isNotNull()
    elif dt in ("timestamp", "timestamp_ntz"):
        # same lenient domain as deserialize_cell's try_cast FALLBACK:
        # a value passing here is guaranteed to land non-NULL at pivot
        ok = value.try_cast(dt).isNotNull()
    else:
        ok = F.lit(True)  # strings/binary always evaluate
    return F.when(value.isNull() | ok, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("could not evaluate '"), value, F.lit("' into field "), field_name)
    )


def validate_staging(staging: DataFrame, schema: T.StructType, max_len: int | None = None) -> DataFrame:
    """Populate the `error` column of a long staging DataFrame.

    `max_len` mirrors the Text[250] staging-cell cap (Codeunit 60000:1218):
    when set, over-long values are flagged rather than silently truncated.
    """
    type_map = F.map_from_arrays(
        F.array(*[F.lit(f.name) for f in schema.fields]),
        F.array(*[F.lit(f.dataType.simpleString()) for f in schema.fields]),
    )
    df = staging.withColumn("__dt", type_map[F.col("field_name")])

    err = F.lit(None).cast("string")
    # chain per-type checks: a field's declared type picks its branch
    for dt in sorted({f.dataType.simpleString() for f in schema.fields}):
        branch_err = parse_error_expr(F.col("value"), dt, F.col("field_name"))
        err = F.when(F.col("__dt") == dt, branch_err).otherwise(err)
    unknown = F.concat(F.lit("field "), F.col("field_name"), F.lit(" does not exist in the target table"))
    err = F.when(F.col("__dt").isNull(), unknown).otherwise(err)
    if max_len is not None:
        too_long = F.concat(F.lit("value exceeds staging capacity of "), F.lit(str(max_len)), F.lit(" chars"))
        err = F.when(F.length("value") > max_len, too_long).otherwise(err)

    return df.withColumn("error", err).drop("__dt")


def split_quarantine(staging: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — the error side-channel the reference surfaces
    in the RapidStart UI (SURVEY §5) becomes an explicit DataFrame."""
    return staging.filter(F.col("error").isNull()), staging.filter(F.col("error").isNotNull())


def suppress_small_groups(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    sum_col: str,
    other_keys: dict[str, object],
    n_col: str = "n",
    sum_out: str = "total",
) -> DataFrame:
    """k-anonymity small-cell suppression for released aggregates: cells
    with fewer than ``k`` members are withheld and rolled into ONE
    'suppressed' bucket (keyed by ``other_keys``) so grand totals still
    reconcile — the census small-cell rule, and the aggregate-level
    sibling of the reference's zero-FK blanking (P4: hide values that
    would leak through a report).

    COMPLEMENTARY suppression closes the differencing hole: a bucket
    holding a single cell publishes that cell's exact n/total under a
    different label, and a bucket whose member count is still < k is
    itself a small group — in either case the smallest kept cell is
    ALSO withheld into the bucket (deterministic victim: lexicographic
    min of (n, *group_cols)), so every released bucket mixes >= 2 cells
    and >= k members whenever a kept cell exists to mix in.  Residual
    caveat, by construction: when NO cell reaches k the release is the
    bucket alone, which discloses only the domain total.

    Scale: ONE aggregation over the data (decimal sums, map-side
    partials); the trigger and victim are 1-row aggregates of the
    groups-sized frame, broadcast into the k-filter — never a second
    pass over the input and no unpartitioned window."""
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(n_col),
        F.sum(F.col(sum_col).cast("decimal(18,6)")).alias("__s"),
    )
    kept_pre = g.where(F.col(n_col) >= k)
    small = g.where(F.col(n_col) < k)
    trig = small.agg(
        (
            (F.count(F.lit(1)) > 0)
            & (
                (F.count(F.lit(1)) == 1)
                | (F.coalesce(F.sum(n_col), F.lit(0)) < k)
            )
        ).alias("__trig")
    )
    victim = kept_pre.agg(
        F.min(F.struct(F.col(n_col), *[F.col(c) for c in group_cols])).alias(
            "__victim"
        )
    )
    decide = trig.crossJoin(victim)  # 1 row
    cell = F.struct(F.col(n_col), *[F.col(c) for c in group_cols])
    is_victim = F.col("__trig") & cell.eqNullSafe(F.col("__victim"))
    marked = kept_pre.crossJoin(F.broadcast(decide))
    kept = marked.where(~is_victim).select(
        *group_cols, n_col, F.col("__s").cast("double").alias(sum_out)
    )
    bucket_src = small.select(*group_cols, n_col, "__s").unionByName(
        marked.where(is_victim).select(*group_cols, n_col, "__s")
    )
    suppressed = bucket_src.agg(
        *[
            F.lit(v).cast(dict(g.dtypes)[c]).alias(c)
            for c, v in other_keys.items()
        ],
        F.sum(n_col).cast("long").alias(n_col),
        F.sum("__s").cast("double").alias(sum_out),
    ).where(F.col(n_col).isNotNull())  # emit the bucket only if non-empty
    return kept.unionByName(suppressed)
