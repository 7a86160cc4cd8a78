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
        t = r["type"]
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
