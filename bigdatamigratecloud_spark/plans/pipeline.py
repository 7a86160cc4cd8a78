"""Migration pipeline orchestration — the reference's import lifecycle
(ImportPackageXMLDocument, Codeunit 60000:419-530) as a Spark job graph:

    package file -> staging (per table) -> validate -> [quarantine]
       -> pivot -> FK handling (create-missing-codes / violation report)
       -> apply (write parquet), tables in dependency order,
       independent tables in parallel driver threads with a barrier
       before the next dependency rank (WaitForAllToFinish, XML:521-522).

The reference's background-session fan-out (XML:482-493) maps to Spark's
own executor parallelism *within* a table plus driver-thread concurrency
*across* independent tables (Spark's scheduler interleaves their stages).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import FOREIGN_KEYS, PRIMARY_KEYS
from ..operators.staging import pivot_from_staging
from ..operators.upsert import (
    apply_to_target,
    create_missing_codes,
    fk_violation_counts_fused,
)
from ..operators.validation import split_quarantine, validate_staging
from .spec import PackageSpec
from .toposort import toposort_tables


@dataclass
class TableResult:
    table_name: str
    rows_applied: int
    rows_quarantined: int
    fk_violations: int
    target_path: str
    # create-missing-codes requests discovered while applying this table:
    # [(parent_table, parent_col, child_keys DataFrame)] — resolved by the
    # orchestrator AFTER the rank barrier (single-threaded), so concurrent
    # same-rank children can't race on a shared parent, and the new parent
    # rows are persisted back to the parent's parquet (XML:112-113 inserts
    # into the real target table, not a transient frame)
    missing_code_requests: list = field(default_factory=list)


@dataclass
class MigrationReport:
    package_code: str
    order: list[list[str]] = field(default_factory=list)  # dependency ranks
    tables: dict[str, TableResult] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)  # table -> error record (XML:543-547)


def dependency_ranks(tables: list[str], priority: dict[str, int] | None = None) -> list[list[str]]:
    """Kahn ranks over the catalog FK graph: tables in the same rank have
    no dependency between them and can run concurrently; a barrier sits
    between ranks (X2)."""
    edges = []
    tset = set(tables)
    for child, fks in FOREIGN_KEYS.items():
        if child not in tset:
            continue
        for _, parent, _ in fks:
            if parent in tset:
                edges.append((parent, child))
    ordered = toposort_tables(tables, edges, priority)
    # assign ranks: a table's rank = 1 + max(rank of parents in set)
    rank: dict[str, int] = {}
    for t in ordered:
        parents = [p for (p, c) in edges if c == t]
        rank[t] = 1 + max((rank[p] for p in parents), default=-1)
    out: list[list[str]] = []
    for t in ordered:
        while len(out) <= rank[t]:
            out.append([])
        out[rank[t]].append(t)
    return out


def apply_staged_table(
    spark: SparkSession,
    staging: DataFrame,
    schema: T.StructType,
    table_name: str,
    target_dir: str,
    spec: PackageSpec | None = None,
    parents: dict[str, DataFrame] | None = None,
    skip_validation: bool = False,
    acid: bool = False,
) -> TableResult:
    """Validate -> quarantine split -> pivot -> FK pass -> write.
    Mirrors ApplyConfigTables (XML:527) + validation (XML:774-785).

    ``acid=True`` lands the table as an :class:`AcidTable` instead of
    plain parquet: first import creates version 0, a RE-import REPLACES
    the table contents as one atomic commit — the same X5
    delete-before-processing contents the plain-parquet path produces
    (a row removed from a re-imported package is removed from the
    target), but readers of the previous version are never torn, which
    is the isolation the reference inherits from SQL Server and plain
    parquet overwrite cannot give.  Incremental upsert-only loads (keep
    rows absent from the delta) are :meth:`AcidTable.merge`, outside
    the package-re-import path."""
    ts = None
    if spec is not None:
        try:
            ts = spec.table(table_name)
        except KeyError:
            ts = None
    if skip_validation or (ts is not None and ts.skip_validation):  # X6, XML:83-87
        valid, quar = staging, staging.limit(0)
    else:
        validated = validate_staging(staging, schema, max_len=None)
        valid, quar = split_quarantine(validated)
    wide = pivot_from_staging(valid, schema)

    # persist the pivot: the FK sweep, the target write, and the row count
    # would otherwise each recompute validate+pivot from the staging scan
    wide = wide.persist()
    try:
        n_viol = 0
        parents = parents or {}
        mc_requests: list = []
        probe_fks: list = []
        for child_col, parent_table, parent_col in FOREIGN_KEYS.get(table_name, []):
            if parent_table not in parents:
                continue
            cmc = False
            if ts is not None:
                cmc = any(
                    f.field_name == child_col and f.create_missing_codes for f in ts.fields
                )
            if cmc:
                # J5 action (XML:112-113, 690-692): record the request; the
                # orchestrator resolves it after the rank barrier so the
                # parent update is race-free and persisted
                mc_requests.append((parent_table, parent_col, wide.select(child_col)))
            else:
                probe_fks.append((child_col, parents[parent_table], parent_col))
        if probe_fks:
            # ONE child scan probes every parent key set (fused J5 sweep)
            counts = fk_violation_counts_fused(wide, probe_fks, table_name).collect()
            n_viol = int(sum(r["violations"] for r in counts))

        path = os.path.join(target_dir, table_name)
        pk = list(PRIMARY_KEYS.get(table_name, ())) or None
        if acid:
            from ..sources.acid_table import AcidTable

            t = AcidTable(spark, path)
            if t.latest_version() is None:
                AcidTable.create(spark, path, wide, key_cols=pk or [])
            else:
                body = wide
                if pk:
                    from ..operators.upsert import dedup_by_pk

                    # catalog PKs are not guaranteed unique in the wild
                    # (the driver's lineitem!), so apply the reference's
                    # replace-matching-rows rule within the package:
                    # last-write-wins (A7 dedup first)
                    body = dedup_by_pk(wide, pk)
                # atomic REPLACE, not MERGE: X5 parity with the plain
                # path — rows absent from the re-imported package must
                # not survive in the target
                t.overwrite(body)
            n_rows = AcidTable(spark, path).snapshot().count()
        else:
            mode = "overwrite"  # X5: Delete Recs Before Processing parity
            apply_to_target(wide, path, mode=mode, pk_cols=pk)
            n_rows = spark.read.parquet(path).count()
        n_quar = quar.count()
        return TableResult(table_name, n_rows, n_quar, n_viol, path, mc_requests)
    finally:
        wide.unpersist()


def run_import(
    spark: SparkSession,
    package_path: str,
    target_dir: str,
    schemas: dict[str, T.StructType],
    spec: PackageSpec | None = None,
    expected_package_code: str | None = None,
    max_workers: int = 4,
    reporter=None,
    acid: bool = False,
) -> MigrationReport:
    """Full §3.1: package -> staging -> per-rank parallel apply with
    barriers.  Unknown tables become error records, not exceptions
    (TableObjectExists guard, XML:543-547, 1095-1100).  `reporter` (a
    plans.progress.ProgressReporter or duck-typed equivalent) observes
    per-table milestones — X3, the ConfigProgressBar analogue."""
    from ..sources.xml_package import import_package_to_staging

    header, staged = import_package_to_staging(spark, package_path, expected_package_code)
    report = MigrationReport(package_code=header.package_code)

    known = {t: s for t, s in staged.items() if t in schemas}
    for t in staged:
        if t not in schemas:
            report.errors[t] = f"table {t!r} does not exist in the target catalog"

    if reporter is not None:
        reporter.on_package_start(header.package_code, len(known))
    ranks = dependency_ranks(list(known))
    report.order = ranks
    applied: dict[str, DataFrame] = {}
    for rank_no, rank_tables in enumerate(ranks):
        def run_one(t: str) -> TableResult | None:
            if reporter is not None:
                reporter.on_table_start(t, rank_no)
            try:
                res = apply_staged_table(
                    spark, known[t], schemas[t], t, target_dir, spec,
                    parents=applied, acid=acid,
                )
            except Exception as e:  # noqa: BLE001
                # one failing table becomes an error RECORD, not an aborted
                # import (XML:543-547) — siblings and later ranks continue
                report.errors[t] = f"apply failed: {e}"
                return None
            if reporter is not None:
                reporter.on_table_finish(t, res.rows_applied)
            return res

        with ThreadPoolExecutor(max_workers=max_workers) as ex:  # X1 fan-out
            results = [r for r in ex.map(run_one, rank_tables) if r is not None]
        # barrier (X2): rank fully applied before children start
        for r in results:
            report.tables[r.table_name] = r
            if acid:
                from ..sources.acid_table import AcidTable

                applied[r.table_name] = AcidTable(spark, r.target_path).snapshot()
            else:
                applied[r.table_name] = spark.read.parquet(r.target_path)
        # resolve create-missing-codes AFTER the barrier, single-threaded:
        # two same-rank children adding codes to the same parent chain
        # sequentially instead of racing, and the new parent rows are
        # PERSISTED back to the parent's parquet + report (the reference
        # inserts into the real target table, XML:112-113, 690-692)
        touched_parents: set[str] = set()
        for r in results:
            for parent_table, parent_col, child_keys in r.missing_code_requests:
                if parent_table not in applied:
                    continue
                applied[parent_table] = create_missing_codes(
                    applied[parent_table],
                    parent_col,
                    child_keys,
                    child_keys.columns[0],  # the single projected child FK col
                )
                touched_parents.add(parent_table)
        for pt in touched_parents:
            prev = report.tables.get(pt)
            if prev is None:
                continue  # parent not part of this import run
            # lineage of the updated frame reads the file being overwritten
            updated = applied[pt].localCheckpoint()
            if acid:
                from ..sources.acid_table import AcidTable

                t = AcidTable(spark, prev.target_path)
                t.overwrite(updated)
                applied[pt] = t.snapshot()
            else:
                updated.write.mode("overwrite").parquet(prev.target_path)
                applied[pt] = spark.read.parquet(prev.target_path)
            prev.rows_applied = applied[pt].count()
    if reporter is not None:
        reporter.on_package_finish()
    return report
