"""Declarative data-quality expectations (round 9, §2.8 validation
family, frame-level): the Deequ/Great-Expectations-style check suite a
pipeline runs on every landed table — completeness, uniqueness, value
ranges, accepted values, regex conformance, row-count bounds.

Scale design: ALL metrics for a suite compile into ONE aggregation
over ONE scan of the table (each rule contributes aggregate
expressions to the same ``agg`` — never one job per rule), then the
single metrics row explodes into per-rule verdict rows driver-side
(bounded by the number of rules, not the data).  Uniqueness uses
count vs count_distinct over the same shuffle-free partial-agg path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = (
    "not_null", "unique", "min_ge", "max_le", "accepted_values",
    "matches_regex", "row_count_between",
)


def check_suite(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` in ONE aggregation pass; returns one row per
    rule: (rule_id int, rule string, column string, metric double,
    threshold double, passed boolean).

    Rule shapes (``metric`` semantics in parens):

    - ``{"type": "not_null", "col": c}`` — null count (0 passes)
    - ``{"type": "unique", "cols": [c, ...]}`` — duplicate row count
      over the key (0 passes); NULL-bearing keys count like values
      (null-safe struct equality)
    - ``{"type": "min_ge", "col": c, "value": v}`` — observed min
    - ``{"type": "max_le", "col": c, "value": v}`` — observed max
    - ``{"type": "accepted_values", "col": c, "values": [...]}`` —
      count of non-null values OUTSIDE the set (0 passes)
    - ``{"type": "matches_regex", "col": c, "pattern": p}`` — count of
      non-null values NOT matching (0 passes)
    - ``{"type": "row_count_between", "min": a, "max": b}`` — row count
    """
    aggs = []
    meta = []  # (rule_id, rule, column, threshold, pass_fn(metric))
    for i, r in enumerate(rules):
        t = r.get("type")  # .get: a missing key hits the ValueError below
        # with the supported list instead of a bare KeyError
        name = f"__m{i}"
        if t == "not_null":
            aggs.append(
                F.count(F.when(F.col(r["col"]).isNull(), 1)).alias(name)
            )
            meta.append((i, t, r["col"], 0.0, lambda m: m == 0))
        elif t == "unique":
            key = F.struct(*[F.col(c) for c in r["cols"]])
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(key)).alias(name)
            )
            meta.append((i, t, ",".join(r["cols"]), 0.0, lambda m: m == 0))
        elif t == "min_ge":
            aggs.append(F.min(F.col(r["col"]).cast("double")).alias(name))
            v = float(r["value"])
            meta.append((i, t, r["col"], v, lambda m, v=v: m is not None and m >= v))
        elif t == "max_le":
            aggs.append(F.max(F.col(r["col"]).cast("double")).alias(name))
            v = float(r["value"])
            meta.append((i, t, r["col"], v, lambda m, v=v: m is not None and m <= v))
        elif t == "accepted_values":
            c = F.col(r["col"])
            aggs.append(
                F.count(
                    F.when(c.isNotNull() & ~c.isin(*r["values"]), 1)
                ).alias(name)
            )
            meta.append((i, t, r["col"], 0.0, lambda m: m == 0))
        elif t == "matches_regex":
            c = F.col(r["col"])
            aggs.append(
                F.count(
                    F.when(c.isNotNull() & ~c.rlike(r["pattern"]), 1)
                ).alias(name)
            )
            meta.append((i, t, r["col"], 0.0, lambda m: m == 0))
        elif t == "row_count_between":
            aggs.append(F.count(F.lit(1)).alias(name))
            lo, hi = float(r["min"]), float(r["max"])
            meta.append(
                (i, t, "", hi, lambda m, lo=lo, hi=hi: lo <= m <= hi)
            )
        else:
            raise ValueError(
                f"unknown rule type {t!r}; supported: {_SUPPORTED}"
            )
    if not aggs:
        raise ValueError("check_suite needs at least one rule")
    row = df.agg(*aggs).collect()[0]  # ONE job, one row, |rules| columns
    out = []
    for (i, t, col, thr, ok), name in zip(meta, [f"__m{j}" for j in range(len(meta))]):
        m = row[name]
        mv = None if m is None else float(m)
        out.append((i, t, col, mv, thr, bool(ok(mv if mv is not None else None))))
    return df.sparkSession.createDataFrame(
        out,
        "rule_id int, rule string, column string, metric double, "
        "threshold double, passed boolean",
    )


def profile_frame(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Single-scan column PROFILER (the discovery half of the
    expectations workflow — Deequ's ColumnProfiler shape): for every
    requested column, (n_rows, n_nulls, exact n_distinct, min, max) —
    the stats a pipeline uses to WRITE its check_suite rules.

    Scale design: every column's metrics compile into ONE aggregation
    over ONE scan (the check_suite discipline); the multi-column exact
    count_distinct rides Spark's expand-based partial aggregation —
    one pass over the data, map-side partials, never one job per
    column.  The single metrics row unpivots to per-column rows with
    ``stack`` IN-ENGINE (no driver collect), bounded by the column
    count.  min/max surface as strings so heterogeneous columns share
    one schema; exact distinct counts on ultra-high-cardinality
    columns are the expensive knob — swap in approx_count_distinct
    upstream if a 2% error is acceptable at 100 TB.
    """
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("profile_frame needs at least one column")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
        if "'" in c or "`" in c:
            raise ValueError(f"unsupported column name {c!r}")
    aggs = [F.count(F.lit(1)).alias("__nr")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn{i}"),
            F.count_distinct(F.col(c)).alias(f"__nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx{i}"),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __nn{i}, __nd{i}, __mn{i}, __mx{i}" for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__nr AS n_rows",
        f"stack({len(cols)}, {parts}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
