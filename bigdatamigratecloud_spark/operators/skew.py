"""Skew-safe aggregation: salted two-phase exact COUNT(DISTINCT) and sums.

Not in the reference (its only aggregates are record counts, SURVEY §2.4
A1-A3) — this is a scale op for the 100 TB target.  The problem: a plain
``GROUP BY k, COUNT(DISTINCT v)`` on a low-cardinality / skewed ``k``
funnels every distinct (k, v) pair of the hottest key through ONE reducer
partition.  At 100 TB a single hot key (think ``lang='en'`` over a web
corpus) is a straggler that AQE cannot split because the dedup must see
all values of the key together.

The fix is two-phase: dedup on the FULL (k, v) pair first — hash
partitioning on the pair is the perfect salt, spreading the hot key's
values over every reducer — then count per key, which is sum-decomposable
so the map-side partial aggregation reduces each partition to |k| tiny
rows before the (trivial) final shuffle:

  phase 1: distinct over (k, v)    -- shuffle keyed by the pair, no hot key
  phase 2: groupBy(k).count()      -- partial counts map-side, tiny shuffle

Exactly 2 exchanges, every stage bounded by |distinct pairs|/n_partitions.
(A plain COUNT(DISTINCT) plans 3 exchanges and its per-key final dedup
cannot be split by AQE.)  ``salted_sum`` below keeps an explicit-salt
variant for aggregates where the grouping itself is the skew and no
distinct column is available to spread on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_safe_count_distinct(
    df: DataFrame,
    keys: list[str] | str,
    value: str,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-spread by partitioning on
    the (key, value) pair.  NULL values are not counted (SQL semantics)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # NULL values stay through the pair-distinct (collapsing to one
    # (key, NULL) row per key) and are then skipped by count(value) —
    # this keeps a key whose values are ALL NULL in the output with
    # count 0, exactly like SQL GROUP BY k COUNT(DISTINCT v), without
    # adding a third exchange to restore empty groups.
    pairs = df.select(*keys, value).distinct()
    return pairs.groupBy(*keys).agg(F.count(value).cast("long").alias(out))


def salted_sum(
    df: DataFrame,
    keys: list[str] | str,
    sums: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Exact per-key sums with an explicit salt stage, for pipelines where
    map-side partial aggregation is defeated (e.g. immediately after a
    wide shuffle that clustered the hot key).  ``sums`` maps output name
    -> column expression; each must be a sum-decomposable aggregate."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # Salt derived from row CONTENT, not monotonically_increasing_id():
    # a nondeterministic salt re-assigns rows to different (key, salt)
    # groups when a failed task replays, double-counting or dropping rows
    # exactly in the fault-recovery scenario this op exists for.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in sums]
    )


def frequent_keys(
    df: DataFrame,
    key_col: str,
    min_frac: float,
    out_cnt: str = "cnt",
) -> DataFrame:
    """EXACT heavy hitters: every key holding >= ``min_frac`` of the rows,
    with its exact count — by sketch-then-verify, never a full-key
    shuffle.

    Pass 1 runs Spark's Karp-frequent-items sketch (`stat.freqItems`):
    one scan, driver state bounded by 1/min_frac items, and the
    guarantee that matters — a SUPERSET of the true heavies (false
    positives possible, false NEGATIVES impossible).  Pass 2 recounts
    only the candidate keys through a pushed-down `isin` filter and
    drops the false positives against the exact ceil(frac·N) threshold,
    so the aggregation shuffle carries at most 1/min_frac keys.

    Why it exists at 100 TB: groupBy-all-keys makes the shuffle carry
    every distinct key (trillions, under a long-tail web distribution)
    to answer a question about the top dozen; this is also the hot-key
    DIAGNOSIS step that picks salting candidates for the ops above."""
    import math

    total = df.count()
    if total == 0:
        return (
            df.select(F.col(key_col), F.lit(0).cast("long").alias(out_cnt)).limit(0)
        )
    threshold = math.ceil(min_frac * total)
    # the Karp sketch only guarantees survival for keys with count
    # STRICTLY GREATER than support*N — a key holding exactly the
    # threshold count is a possible false negative at support=min_frac.
    # Run the sketch strictly below the threshold fraction; if that
    # undershoots freqItems' 1e-4 support floor, the sketch cannot give
    # the no-false-negative guarantee at all, so fall back to the plain
    # exact aggregation (correctness over the shuffle saving).
    support_needed = (threshold - 1) / total
    if support_needed < 1e-4:
        return (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias(out_cnt))
            .filter(F.col(out_cnt) >= threshold)
        )
    support = min(0.99, support_needed)
    items = list(df.stat.freqItems([key_col], support=support).first()[0])
    # NULL is a countable key under GROUP BY (the fallback path reports
    # it), but `isin(items)` never matches NULL rows — and whether the
    # sketch surfaces a None candidate at all is an implementation
    # detail.  Recount the NULL group unconditionally: it adds one group
    # to the bounded recount, and the exact >= threshold filter drops it
    # when it is not actually heavy, so the guarantee stays symmetric
    # with the small-N fallback.
    non_null = [i for i in items if i is not None]
    pred = F.col(key_col).isNull()
    if non_null:
        pred = F.col(key_col).isin(non_null) | pred
    return (
        df.filter(pred)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(out_cnt))
        .filter(F.col(out_cnt) >= threshold)
    )
