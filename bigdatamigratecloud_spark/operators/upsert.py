"""PK dedup, overwrite/upsert, FK checks and Create Missing Codes.

Reference semantics:
- primary-key fields are flagged in the package manifest
  (Codeunit 60000:681-686); apply replaces matching-PK rows;
- `Delete Recs Before Processing` wipes the target first
  (Codeunit 60000:93-97) — overwrite mode;
- `Create Missing Codes` auto-inserts missing FK parent codes during
  validation instead of erroring (Codeunit 60000:112-113, 690-692);
  without it a missing relation is a TableRelation field error
  (Codeunit 60000:17).

Scale notes: FK violation checks are left_anti joins (shuffle on the FK,
broadcast when the parent is dimension-sized); upsert is anti-join +
union — on a real lakehouse this becomes Delta/Iceberg MERGE, which the
writer interface leaves pluggable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_by_pk(df: DataFrame, pk_cols: Sequence[str], order_col: str | None = None) -> DataFrame:
    """Keep one row per PK (A7).  With `order_col`, keep the row with the
    smallest order value (deterministic); else an arbitrary row
    (`dropDuplicates` — cheaper: partial aggregation map-side)."""
    if order_col is None:
        return df.dropDuplicates(list(pk_cols))
    from pyspark.sql import Window

    w = Window.partitionBy(*pk_cols).orderBy(F.col(order_col).asc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def fk_violations(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, broadcast_parent: bool = True
) -> DataFrame:
    """Child rows whose FK has no parent (J5 check): left_anti join."""
    p = parent.select(parent_col).dropDuplicates([parent_col])
    if broadcast_parent:
        p = F.broadcast(p)
    return child.join(p, child[child_col] == p[parent_col], "left_anti")


def fk_violation_counts_fused(
    child: DataFrame, fks: Sequence[tuple[str, DataFrame, str]], child_name: str
) -> DataFrame:
    """Violation counts for ALL of a child table's FK relations in ONE pass
    (J5 sweep).  Instead of one left_anti + count per relation (which scans
    the child once per FK — lineitem has 3), left-join every broadcast
    parent key set onto a single child scan and count unmatched keys with
    conditional aggregation; then unpivot the one result row to
    (relation, violations) rows.  At 100 TB this is the difference between
    one fact-table scan and |FK| scans."""
    probe = child
    markers: list[tuple[str, str]] = []  # (relation, marker_col)
    for i, (child_col, parent, parent_col) in enumerate(fks):
        # the parent key column doubles as the match marker (NULL after
        # the left join = no parent): no extra lit(1) column, and the
        # marker name depends only on the FK INDEX — two children
        # probing the same parent (nation under both customer and
        # supplier) build byte-identical key subtrees, which Spark's
        # ReuseExchange then broadcasts ONCE across the union instead
        # of once per child.  NULL parent keys never equi-match, so
        # their presence in the key set changes nothing (same as the
        # old marker form).
        marker = f"__pk_{i}"
        while marker in child.columns:
            marker = "_" + marker
        keys = parent.select(F.col(parent_col).alias(marker)).dropDuplicates([marker])
        probe = probe.join(
            F.broadcast(keys), F.col(child_col) == F.col(marker), "left"
        )
        markers.append((f"{child_name}.{child_col}", marker))
    counted = probe.agg(
        *[
            F.count(F.when(F.col(marker).isNull(), F.lit(1))).alias(marker)
            for _, marker in markers
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(rel).alias("relation"), F.col(marker).alias("violations"))
            for rel, marker in markers
        ]
    )
    return counted.select(F.explode(pairs).alias("kv")).select("kv.relation", "kv.violations")


def fk_violation_counts_graph(
    children: Sequence[tuple[str, DataFrame, Sequence[tuple[str, DataFrame, str]]]],
) -> DataFrame:
    """Violation counts for a WHOLE FK graph in one aggregation
    (round-13 j5 shape).  :func:`fk_violation_counts_fused` already
    fuses a single child's relations into one scan; a multi-child sweep
    then still paid one global-aggregate exchange + final stage PER
    CHILD plus a 5-branch union of aggregates (~96 plan nodes, ~20 AQE
    stage jobs on the sf0.1 bench — the 0.3 s Catalyst-analysis
    constant documented since round 4).  Here every child's probe rows
    are projected onto one shared marker schema (its own relations as
    0/1 hits, every other relation NULL) and unioned BEFORE the
    aggregate, so the whole graph pays ONE partial+final count pass —
    same scans, same broadcast joins, one exchange instead of five, and
    a plan roughly half the size.

    ``children``: (child_name, child_df, fks) triples, fks as in
    :func:`fk_violation_counts_fused`.  Parent key sets are deduped by
    DataFrame object identity, so a parent passed as the SAME object
    for several relations (nation under both customer and supplier) is
    projected/deduped/broadcast once and exchange-reuse applies.

    Count semantics are exactly the fused form's: a child row counts as
    a violation of relation i iff its FK finds no (deduped) parent key
    — NULL FKs violate, duplicate parent keys don't multiply.
    """
    markers: list[tuple[str, str]] = []  # (relation, marker col) in child order
    key_frames: dict[tuple[int, str], tuple[str, DataFrame]] = {}
    # (joined child, [(marker, key col)] for its relations)
    probes: list[tuple[DataFrame, list[tuple[str, str]]]] = []
    idx = 0
    for child_name, child, fks in children:
        probe = child
        own: list[tuple[str, str]] = []
        used_key_cols: set[str] = set()
        for child_col, parent, parent_col in fks:
            marker = f"__pk_{idx}"
            cache_key = (id(parent), parent_col)
            if cache_key in key_frames:
                key_col, keys = key_frames[cache_key]
            else:
                key_col = f"__k_{len(key_frames)}"
                while key_col in child.columns:
                    key_col = "_" + key_col
                keys = parent.select(F.col(parent_col).alias(key_col)).dropDuplicates(
                    [key_col]
                )
                key_frames[cache_key] = (key_col, keys)
            if key_col in used_key_cols:
                # same child declares two relations to one parent key set:
                # a second join on the same column name would be ambiguous —
                # fall back to a fresh aliased copy (no exchange reuse)
                key_col = f"__k_{len(key_frames)}_{idx}"
                keys = parent.select(F.col(parent_col).alias(key_col)).dropDuplicates(
                    [key_col]
                )
            used_key_cols.add(key_col)
            probe = probe.join(
                F.broadcast(keys), F.col(child_col) == F.col(key_col), "left"
            )
            markers.append((f"{child_name}.{child_col}", marker))
            own.append((marker, key_col))
            idx += 1
        probes.append((probe, own))
    all_markers = [m for _, m in markers]
    slices = []
    for probe, own in probes:
        own_by_marker = dict(own)
        slices.append(
            probe.select(
                *[
                    (
                        F.when(F.col(own_by_marker[m]).isNull(), F.lit(0)).otherwise(
                            F.lit(1)
                        )
                        if m in own_by_marker
                        else F.lit(None).cast("int")
                    ).alias(m)
                    for m in all_markers
                ]
            )
        )
    unioned = slices[0]
    for s in slices[1:]:
        unioned = unioned.unionByName(s)
    counted = unioned.agg(
        *[
            # rows of OTHER children carry NULL for this marker and are
            # ignored by the equality; 0 = this child's row with no parent
            F.count(F.when(F.col(m) == 0, F.lit(1))).alias(m)
            for m in all_markers
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(rel).alias("relation"), F.col(m).alias("violations"))
            for rel, m in markers
        ]
    )
    return counted.select(F.explode(pairs).alias("kv")).select("kv.relation", "kv.violations")


def create_missing_codes(
    parent: DataFrame, parent_col: str, child: DataFrame, child_col: str, defaults: dict | None = None
) -> DataFrame:
    """Upsert missing FK parents (J5 action): distinct child keys not in
    parent become new parent rows with NULL/default attributes."""
    missing = (
        child.select(F.col(child_col).alias(parent_col))
        .dropDuplicates([parent_col])
        .join(F.broadcast(parent.select(parent_col)), parent_col, "left_anti")
    )
    defaults = defaults or {}
    new_rows = missing.select(
        *[
            F.col(parent_col).cast(dict(parent.dtypes)[c]).alias(c)
            if c == parent_col
            else F.lit(defaults.get(c)).cast(dict(parent.dtypes)[c]).alias(c)
            for c in parent.columns
        ]
    )
    return parent.unionByName(new_rows)


def merge_upsert(
    base: DataFrame, delta: DataFrame, pk_cols: Sequence[str]
) -> DataFrame:
    """PK merge as a pure DataFrame op (the reference's re-import
    semantics, Codeunit 60000:440-451, done as MERGE instead of
    delete-before-load): delta rows replace matching-PK base rows,
    unmatched delta rows insert.  The anti-join probes only the delta's
    PK projection — for the typical small-delta case Catalyst/AQE
    broadcasts it, so the 100 TB base never shuffles."""
    keys = list(pk_cols)
    keep = base.join(
        delta.select(*keys).dropDuplicates(keys), keys, "left_anti"
    )
    return keep.unionByName(delta)


def apply_to_target(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    pk_cols: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Apply-to-target sink (S13).  overwrite ≈ Delete Recs Before
    Processing; 'upsert' reads existing, anti-joins on PK, unions, rewrites
    (MERGE stand-in for plain parquet)."""
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "upsert":
        if not pk_cols:
            raise ValueError("upsert requires pk_cols")
        from pyspark.errors import AnalysisException

        spark = df.sparkSession
        try:
            existing = spark.read.parquet(path)
            target_exists = True
        except AnalysisException as e:
            # only a missing target is a fresh-load; any other read
            # failure (corrupt footer, permission) must surface
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            target_exists = False
        if not target_exists:
            writer.mode("overwrite").parquet(path)
            return
        keys = list(pk_cols)
        delta_keys = df.select(*keys).dropDuplicates(keys)
        if partition_by:
            # Scale path: MERGE via dynamic partition overwrite — rewrite
            # ONLY the partitions the delta touches (the plain-parquet
            # stand-in for Delta/Iceberg MERGE).  The untouched bulk of a
            # 100 TB table is never read or written.
            parts = list(partition_by)
            touched = df.select(*parts).dropDuplicates(parts)
            affected = existing.join(F.broadcast(touched), parts, "left_semi")
            # delta_keys deliberately NOT force-broadcast: a backfill delta
            # can be huge; AQE picks broadcast when it is actually small
            merged = affected.join(delta_keys, keys, "left_anti").unionByName(df)
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                # localCheckpoint cuts the lineage back to the files being
                # overwritten (reading and dynamically overwriting the same
                # partitions in one job is not safe on plain parquet)
                merged.localCheckpoint().write.partitionBy(*parts).mode(
                    "overwrite"
                ).parquet(path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            return
        # Unpartitioned plain parquet cannot overwrite in place while being
        # read: stage to a tmp dir, then swap.  (Delta/Iceberg MERGE is the
        # production answer; the writer interface keeps it pluggable.)
        keep = existing.join(delta_keys, keys, "left_anti")
        merged = keep.unionByName(df)
        tmp = path + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return
    writer.mode(mode).parquet(path)
