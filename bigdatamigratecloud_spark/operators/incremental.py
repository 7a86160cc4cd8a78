"""Incremental view maintenance off the ACID change feed.

The reference re-applies whole packages (delete-before-load /
overwrite, Codeunit 60000:440-451); at 100 TB a downstream rollup
cannot be recomputed from scratch every time a narrow delta lands.
SUM/COUNT aggregates are self-maintainable from a row-level change
feed alone: each feed row contributes its value with a sign
(+ for insert/update_postimage, − for delete/update_preimage), the
signed contributions aggregate per group — a shuffle over the CHANGED
rows only, never the base table — and the per-group deltas MERGE into
the stored rollup (AcidTable's COW merge prunes untouched rollup
files).  Exactness: contributions and stored sums are DECIMAL, so
"old + delta" is bit-equal to a full recompute — the incremental path
is not an approximation.

Groups whose row count reaches zero are removed, keeping the rollup
identical to a fresh GROUP BY (which never emits empty groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.acid_table import AcidTable


def signed_contributions(
    feed: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sum_col: str = "total",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Per-group (Δsum, Δcount) from a change feed (the output of
    :meth:`AcidTable.changes`): one aggregation over the feed, which is
    sized by what the commits touched, not by the base table."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return feed.groupBy(*group_cols).agg(
        F.sum(sign.cast("decimal(18,6)") * F.col(value_col).cast("decimal(18,6)")).alias(
            sum_col
        ),
        F.sum(sign.cast("long")).alias(cnt_col),
    )


def refresh_rollup(
    rollup: AcidTable,
    feed: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sum_col: str = "total",
    cnt_col: str = "cnt",
) -> int:
    """Fold a change feed into a stored SUM/COUNT rollup table.

    The delta frame (changed groups × 2 numbers) joins against the
    current rollup on the group key to pick up prior values (a keyed
    join — both sides shuffle at most once on the group key; the rollup
    side is groups-sized, never base-table-sized), then MERGEs on the
    group key (COW file pruning applies).  Emptied groups are detected
    from the delta-sized merged frame BEFORE committing — never by
    rescanning the stored rollup — and deleted so the table stays
    identical to a from-scratch GROUP BY.  Returns the new version."""
    deltas = signed_contributions(feed, group_cols, value_col, sum_col, cnt_col)
    keys = list(group_cols)
    current = rollup.snapshot().select(
        *keys,
        F.col(sum_col).alias("__old_sum"),
        F.col(cnt_col).alias("__old_cnt"),
    )
    merged = (
        deltas.join(current, keys, "left")
        .select(
            *keys,
            (
                F.coalesce(F.col("__old_sum"), F.lit(0).cast("decimal(18,6)"))
                + F.col(sum_col)
            )
            .cast("decimal(18,6)")
            .alias(sum_col),
            (F.coalesce(F.col("__old_cnt"), F.lit(0)) + F.col(cnt_col))
            .cast("long")
            .alias(cnt_col),
        )
        .localCheckpoint(eager=True)  # the feed diff is expensive; evaluate once
    )
    rollup.merge(merged, keys)
    v = rollup.latest_version()
    emptied = merged.where(F.col(cnt_col) == 0).limit(1).count()
    if emptied:
        v = rollup.delete(f"{cnt_col} = 0")
    return v
