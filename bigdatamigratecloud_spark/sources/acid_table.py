"""ACID versioned parquet table: snapshots, atomic commits, COW merge.

The reference applies packages to its target tables transactionally —
the whole import either commits or rolls back (apply codeunit wraps the
record loop in one write transaction, Codeunit 60000:440-451), and a
re-import replaces matching-PK rows without readers ever observing a
half-applied state.  Plain ``df.write.parquet`` cannot give that on a
shared path: overwrite deletes before it writes, and a concurrent
reader sees a torn directory.  This module supplies the missing
transactional layer as a minimal Delta/Iceberg-style log, pure stdlib +
PySpark:

Layout::

    <root>/_log/00000000000.json     # manifest for version 0
    <root>/_log/00000000001.json     # version 1, ...
    <root>/data/<commit-uuid>/part-*.parquet   # immutable data files

A manifest lists the *exact* data files making up that snapshot (with
row counts and per-file min/max stats for the table's key columns), so:

- **Atomic commit / isolation**: readers resolve the latest manifest,
  then read only the files it names.  Data files are immutable and a
  manifest is published with ``os.link`` (put-if-absent on POSIX) — a
  reader sees the old version or the new one, never a mix.
- **Optimistic concurrency**: two writers racing to publish the same
  version — the second ``os.link`` fails with ``FileExistsError`` and
  surfaces as :class:`ConcurrentWriteError`.  Appends rebase and retry
  (they commute); merges/overwrites do not auto-rebase.
- **Time travel**: ``snapshot(version=N)`` reads any retained manifest.
- **Copy-on-write MERGE with file pruning**: ``merge`` rewrites ONLY
  the data files whose key [min,max] range can contain a delta key;
  every other file is carried forward by reference.  On a 100 TB table
  with a narrow delta this touches a handful of files instead of
  rewriting (or even reading) the table.  The probe is one aggregation
  over the delta against the broadcast file-range list — the base is
  not scanned at all.
- **Vacuum**: deletes data files no retained manifest references.

What is deliberately NOT here: cross-table transactions, a catalog
service, and manifest checkpointing/compaction (at millions of commits
the JSON log itself needs compaction — Delta's checkpoint files); the
log format keeps that evolution open.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first."""


class AcidTable:
    """Handle on a versioned table rooted at a local/DBFS-style path."""

    _STATS_TYPES = {
        "tinyint",
        "smallint",
        "int",
        "bigint",
        "float",
        "double",
        "string",
        "date",
        "timestamp",
        "timestamp_ntz",
    }

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._log_dir = os.path.join(root, "_log")

    # ---------------------------------------------------------------- log

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:011d}.json")

    def latest_version(self) -> int | None:
        """Highest committed version, or None for a nonexistent table."""
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return None
        versions = [int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()]
        return max(versions) if versions else None

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _head(self) -> int:
        """Latest version, or a clean FileNotFoundError for a
        nonexistent table (so every mutator fails the same way the read
        paths do, not with a confusing NoneType format error)."""
        head = self.latest_version()
        if head is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return head

    def _versions_on_disk(self) -> list[int]:
        """Ascending list of manifest versions actually present (after a
        vacuum the log no longer starts at 0)."""
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
        )

    def _publish(self, manifest: dict) -> int:
        """Atomically publish a manifest as the next version.

        ``os.link(tmp, final)`` is an atomic put-if-absent: if another
        writer already published this version the link fails and the
        caller decides whether the operation rebases (append) or aborts
        (merge/overwrite).
        """
        os.makedirs(self._log_dir, exist_ok=True)
        version = manifest["version"]
        tmp = os.path.join(self._log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as e:
            raise ConcurrentWriteError(
                f"version {version} was committed by another writer"
            ) from e
        finally:
            os.unlink(tmp)
        return version

    # --------------------------------------------------------------- data

    def _write_data_files(self, df: DataFrame, stats_cols: Sequence[str]) -> list[dict]:
        """Write df as immutable files under a fresh commit dir; return
        file entries ``{path, rows, stats:{col:{min,max}}}``.

        Stats come from ONE scan of the newly written files grouped by
        ``input_file_name`` — the delta-sized data just written, never
        the table.
        """
        commit_dir = f"data/{uuid.uuid4().hex}"
        out = os.path.join(self.root, commit_dir)
        df.write.mode("errorifexists").parquet(out)
        written = self.spark.read.parquet(out)
        typed = dict(written.dtypes)
        cols = [c for c in stats_cols if typed.get(c) in self._STATS_TYPES]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        rows = (
            written.groupBy(F.input_file_name().alias("__file"))
            .agg(*aggs)
            .collect()  # one row per data file — bounded by file count, not data
        )
        entries = []
        for r in rows:
            # input_file_name is a file: URI; keep paths log-relative so the
            # table directory is relocatable
            rel = os.path.join(commit_dir, os.path.basename(r["__file"]))
            stats = {
                c: {"min": _json_scalar(r[f"__min_{c}"]), "max": _json_scalar(r[f"__max_{c}"])}
                for c in cols
            }
            entries.append({"path": rel, "rows": r["__rows"], "stats": stats})
        return sorted(entries, key=lambda e: e["path"])

    def _files_df(self, version: int | None = None) -> list[str]:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self._read_manifest(v)
        return [os.path.join(self.root, e["path"]) for e in m["files"]]

    # ---------------------------------------------------------------- api

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        key_cols: Sequence[str] = (),
    ) -> "AcidTable":
        """Create version 0 from df.  ``key_cols`` drive per-file stats
        (and therefore merge-time file pruning)."""
        t = cls(spark, root)
        files = t._write_data_files(df, key_cols)
        t._publish(
            {
                "version": 0,
                "operation": "create",
                "schema": df.schema.jsonValue(),
                "key_cols": list(key_cols),
                "files": files,
            }
        )
        return t

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest).  Reads exactly
        the manifest's files — a concurrent commit cannot tear it.  A
        version whose commits deleted every row has an empty file list;
        that is a valid (empty) table, not a read error."""
        from pyspark.sql.types import StructType

        v = self.latest_version() if version is None else version
        files = self._files_df(v)
        schema = StructType.fromJson(self._read_manifest(v)["schema"])
        if not files:
            return self.spark.createDataFrame([], schema)
        # read through the MANIFEST schema, not the files': after an
        # add-columns commit the old (unrewritten) files lack the new
        # columns, and the explicit schema makes the parquet reader
        # NULL-backfill them
        return self.spark.read.schema(schema).parquet(*files)

    def scan(
        self,
        ranges: dict[str, tuple],
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Stats-pruned snapshot read: open ONLY the data files whose
        per-file [min,max] on every ``ranges`` column intersects the
        requested interval, then re-apply the exact predicate to the
        surviving rows (pruning is conservative — a file without stats
        on a column is always read).

        ``ranges`` maps column -> (lo, hi); either bound may be None
        (open).  Returns (DataFrame, info) where info reports
        ``files_total`` / ``files_read`` — the data-skipping ratio a
        Z-order layout exists to maximize.  The prune is a driver-side
        sweep of the manifest (bounded by file count, like merge's);
        file I/O is where the savings land: a hyper-rectangle predicate
        over a Z-ordered 100 TB table opens a handful of files, while
        the same predicate on a linearly-sorted layout reads everything
        for any non-leading column."""
        from pyspark.sql.types import StructType as _ST

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self._read_manifest(v)
        # normalize each predicate bound to the COLUMN's granularity
        # before the ISO-string compare: a datetime bound on a date
        # column ('1997-01-01T00:00:00' vs file stat '1997-01-01') is
        # lexically larger than a stat it chronologically equals, which
        # would prune a file whose rows match the bound at midnight
        col_types = {
            f.name: f.dataType.simpleString() for f in _ST.fromJson(m["schema"]).fields
        }
        bounds = {
            col: (
                _prune_bound(lo, col_types.get(col)),
                _prune_bound(hi, col_types.get(col)),
            )
            for col, (lo, hi) in ranges.items()
        }
        kept = []
        for e in m["files"]:
            hit = True
            for col, (lo, hi) in bounds.items():
                s = e["stats"].get(col)
                if s is None or s["min"] is None:
                    continue  # no stats: cannot exclude
                smin, smax = _range_scalar(s["min"]), _range_scalar(s["max"])
                if lo is not None and smax < lo:
                    hit = False
                    break
                if hi is not None and smin > hi:
                    hit = False
                    break
            if hit:
                kept.append(e["path"])
        info = {"files_total": len(m["files"]), "files_read": len(kept), "version": v}
        if not kept:
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame([], StructType.fromJson(m["schema"])), info
        from pyspark.sql.types import StructType

        df = self.spark.read.schema(StructType.fromJson(m["schema"])).parquet(
            *[os.path.join(self.root, p) for p in kept]
        )
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df, info

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        pk_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """Row-level change feed between two snapshots (the Delta CDF /
        Iceberg changelog read): every logical difference as a row
        tagged ``_change_type`` in {insert, update_preimage,
        update_postimage, delete}.

        File-pruned: a data file carried unchanged between the two
        manifests CANNOT contribute a change, so only files dropped
        since ``from_version`` (old side) and files added by
        ``to_version`` (new side) are read — on a 100 TB table a narrow
        merge yields a diff job over the touched files, not the table.
        COW merge/delete guarantee the prune is sound: any row they
        touch lives in a rewritten (= not carried) file.  Rows rewritten
        with identical values (COW copies sharing a file with real
        changes) are filtered out by a null-safe whole-row compare, so
        the feed is the LOGICAL diff.  Assumes ``pk_cols`` (default:
        the table's ``key_cols``) are unique per snapshot."""
        head = self._head()
        to_v = head if to_version is None else to_version
        mo = self._read_manifest(from_version)
        mn = self._read_manifest(to_v)
        keys = list(pk_cols) if pk_cols else list(mo["key_cols"])
        if not keys:
            raise ValueError("changes() needs pk_cols (table has no key_cols)")
        from pyspark.sql.types import StringType, StructType

        schema = StructType.fromJson(mo["schema"])
        # StructType.add mutates in place — build the tagged schema from
        # a fresh parse so `schema` keeps the table's own columns
        out_schema = StructType.fromJson(mo["schema"]).add("_change_type", StringType())
        old_paths = {e["path"] for e in mo["files"]}
        new_paths = {e["path"] for e in mn["files"]}
        removed = sorted(old_paths - new_paths)
        added = sorted(new_paths - old_paths)
        if not removed and not added:
            return self.spark.createDataFrame([], out_schema)
        cols = [f.name for f in schema.fields]
        nonkey = [c for c in cols if c not in keys]

        def _side(paths: list[str]) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], schema)
            # read through the from-version's schema: files predating an
            # add-columns commit NULL-backfill, files written after it
            # project down — the diff always compares the same columns
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.root, p) for p in paths]
            ).select(*cols)

        # key-only tables: compare a constant marker (a key either exists
        # in a snapshot or not — no update states are possible)
        payload = [F.col(c) for c in nonkey] or [F.lit(True).alias("__present")]
        o = _side(removed).select(
            *[F.col(k) for k in keys], F.struct(*payload).alias("__o")
        )
        n = _side(added).select(
            *[F.col(k) for k in keys], F.struct(*payload).alias("__n")
        )
        j = o.join(n, keys, "full_outer")

        def _emit(side: str, tag: str):
            return [
                *[F.col(k) for k in keys],
                *[F.col(f"{side}.{c}").alias(c) for c in nonkey],
                F.lit(tag).alias("_change_type"),
            ]

        inserts = j.filter(F.col("__o").isNull()).select(*_emit("__n", "insert"))
        deletes = j.filter(F.col("__n").isNull()).select(*_emit("__o", "delete"))
        both = j.filter(
            F.col("__o").isNotNull()
            & F.col("__n").isNotNull()
            & ~F.col("__o").eqNullSafe(F.col("__n"))
        )
        pre = both.select(*_emit("__o", "update_preimage"))
        post = both.select(*_emit("__n", "update_postimage"))
        return (
            inserts.unionByName(deletes)
            .unionByName(pre)
            .unionByName(post)
            .select(*cols, "_change_type")
        )

    def history(self) -> list[dict]:
        """Commit log, oldest RETAINED first: version/operation/file and
        row counts.  After a vacuum the log no longer starts at version
        0, so this walks the manifests actually on disk."""
        out = []
        for v in self._versions_on_disk():
            m = self._read_manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "num_files": len(m["files"]),
                    "num_rows": sum(e["rows"] for e in m["files"]),
                }
            )
        return out

    def append(self, df: DataFrame, max_retries: int = 10) -> int:
        """Append-only commit.  Commutes with concurrent appends, so a
        lost race rebases on the new head and retries."""
        base = self.latest_version()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        key_cols = self._read_manifest(base)["key_cols"]
        new_files = self._write_data_files(df, key_cols)
        for _ in range(max_retries):
            head = self.latest_version()
            m = self._read_manifest(head)
            try:
                return self._publish(
                    {
                        "version": head + 1,
                        "operation": "append",
                        "schema": m["schema"],
                        "key_cols": m["key_cols"],
                        "files": m["files"] + new_files,
                    }
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(f"append lost {max_retries} straight races")

    def overwrite(self, df: DataFrame) -> int:
        head = self._head()
        m = self._read_manifest(head)
        files = self._write_data_files(df, m["key_cols"])
        return self._publish(
            {
                "version": head + 1,
                "operation": "overwrite",
                "schema": df.schema.jsonValue(),
                "key_cols": m["key_cols"],
                "files": files,
            }
        )

    def merge(self, delta: DataFrame, pk_cols: Sequence[str]) -> int:
        """Copy-on-write MERGE: delta rows replace matching-PK rows,
        unmatched delta rows insert.

        File pruning: a data file must be rewritten only if its stats
        range on ``pk_cols[0]`` can contain some delta key.  The probe
        broadcasts the (small, driver-resident) file-range list against
        the delta and asks, per file, "does any delta key fall in
        [min,max]?" — one delta aggregation, zero base-table I/O for
        skipped files.  Files without stats are conservatively rewritten.
        """
        head = self._head()
        m = self._read_manifest(head)
        keys = list(pk_cols)
        probe_col = keys[0]
        # a delta with duplicate PK rows would write ALL copies (the
        # anti-join removes the base row once, the union appends the
        # raw delta), silently breaking the PK-uniqueness invariant
        # changes() relies on — fail loudly like Delta's MERGE does
        dup = (
            delta.groupBy(*keys).count().where("count > 1").limit(1).count()
        )
        if dup:
            raise ValueError(
                f"merge delta contains duplicate rows for pk {keys}; "
                "dedupe the delta (e.g. keep latest) before merging"
            )

        ranged, unranged = [], []
        for e in m["files"]:
            s = e["stats"].get(probe_col)
            if s is not None and s["min"] is not None:
                ranged.append(e)
            else:
                unranged.append(e)
        touched_paths: set[str] = set()
        if ranged:
            ranges = self.spark.createDataFrame(
                [(e["path"], e["stats"][probe_col]["min"], e["stats"][probe_col]["max"]) for e in ranged],
                ["__path", "__min", "__max"],
            )
            key_type = dict(delta.dtypes)[probe_col]
            hits = (
                delta.select(F.col(probe_col).alias("__k"))
                .join(
                    F.broadcast(
                        ranges.select(
                            "__path",
                            F.col("__min").cast(key_type).alias("__min"),
                            F.col("__max").cast(key_type).alias("__max"),
                        )
                    ),
                    (F.col("__k") >= F.col("__min")) & (F.col("__k") <= F.col("__max")),
                    "inner",
                )
                .select("__path")
                .distinct()
                .collect()
            )
            touched_paths = {r["__path"] for r in hits}
        rewrite = [e for e in ranged if e["path"] in touched_paths] + unranged
        carry = [e for e in ranged if e["path"] not in touched_paths]

        delta_keys = delta.select(*keys).dropDuplicates(keys)
        if rewrite:
            from pyspark.sql.types import StructType

            # manifest schema, not file schema: files predating an
            # add-columns commit NULL-backfill the late columns
            affected = self.spark.read.schema(
                StructType.fromJson(m["schema"])
            ).parquet(*[os.path.join(self.root, e["path"]) for e in rewrite])
            # allowMissingColumns: after an add-columns evolution a delta
            # carrying the pre-evolution shape NULL-fills the late columns
            # (Delta MERGE full-row-replace semantics) — without it the
            # same merge would fail or succeed depending on whether file
            # pruning happened to rewrite anything
            merged = affected.join(delta_keys, keys, "left_anti").unionByName(
                delta, allowMissingColumns=True
            )
        else:
            merged = delta
        new_files = self._write_data_files(merged, m["key_cols"])
        return self._publish(
            {
                "version": head + 1,
                "operation": "merge",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "files": carry + new_files,
            }
        )

    def delete(self, predicate: str) -> int:
        """COW delete: files are first FILTERED to those containing any
        matching row (one pruned scan flags files via input_file_name);
        only those are rewritten without the matching rows."""
        head = self._head()
        m = self._read_manifest(head)
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        by_rel = {e["path"]: e for e in m["files"]}
        if by_rel:
            hit_rows = (
                self.spark.read.schema(schema).parquet(
                    *[os.path.join(self.root, rel) for rel in by_rel]
                )
                .where(predicate)
                .select(F.input_file_name().alias("__file"))
                .distinct()
                .collect()
            )
        else:
            hit_rows = []
        # input_file_name returns file: URIs; manifest paths are
        # log-relative data/<commit>/<file> — match on that suffix
        hit = {"/".join(r["__file"].split("/")[-3:]) for r in hit_rows}
        rewrite = [
            os.path.join(self.root, rel) for rel in by_rel if rel in hit
        ]
        carry = [e for rel, e in by_rel.items() if rel not in hit]
        new_files = []
        if rewrite:
            # IS NOT TRUE, not NOT(...): under three-valued logic a row
            # where the predicate evaluates to NULL matches neither the
            # delete nor its bare negation — it must be KEPT, not
            # silently dropped from the rewrite
            kept = self.spark.read.schema(schema).parquet(*rewrite).where(
                f"({predicate}) IS NOT TRUE"
            )
            new_files = self._write_data_files(kept, m["key_cols"])
        return self._publish(
            {
                "version": head + 1,
                "operation": "delete",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "files": carry + new_files,
            }
        )

    def add_columns(self, new_cols: dict[str, str]) -> int:
        """Schema evolution: add nullable columns as a METADATA-ONLY
        commit — no data file is rewritten (the reference's analogue is
        obsolete-field reconcile in reverse: late-added fields NULL-
        backfill, Codeunit 60000:800-814 drops removed ones).  Readers
        of the new version see the old files through the widened
        schema with NULLs for the new columns; time travel to older
        versions still shows the old schema.  ``new_cols`` maps column
        name -> Spark type DDL string (e.g. ``{"score": "double"}``).

        At 100 TB this is the difference between an O(1) log append and
        rewriting the table to add a column."""
        from pyspark.sql.types import StructType, _parse_datatype_string

        head = self._head()
        m = self._read_manifest(head)
        schema = StructType.fromJson(m["schema"])
        existing = {f.name for f in schema.fields}
        for name, ddl in new_cols.items():
            if name in existing:
                raise ValueError(f"column {name!r} already exists")
            schema = schema.add(name, _parse_datatype_string(ddl), True)
        return self._publish(
            {
                "version": head + 1,
                "operation": "add-columns",
                "schema": schema.jsonValue(),
                "key_cols": m["key_cols"],
                "files": m["files"],
            }
        )

    def compact(self, target_files: int) -> int:
        """OPTIMIZE: rewrite the current snapshot into ``target_files``
        range-partitioned files (ranged on the first key column so the
        per-file min/max stats stay tight and merge/scan pruning keeps
        working).  Pure metadata swap for readers: the new manifest is
        one atomic commit, time travel to the pre-compact version still
        resolves the old files until vacuum.

        The small-files problem is THE operational cost at 100 TB — a
        streaming MERGE sink or many narrow deltas leave thousands of
        KB-sized files whose open/footer overhead dominates scans;
        periodic compaction restores scan bandwidth without blocking
        readers or writers (an optimistic-concurrency conflict on the
        version simply retries the compaction later)."""
        head = self._head()
        m = self._read_manifest(head)
        snap = self.snapshot(head)
        key_cols = m["key_cols"]
        if key_cols:
            snap = snap.repartitionByRange(target_files, key_cols[0]).sortWithinPartitions(
                key_cols[0]
            )
        else:
            snap = snap.repartition(target_files)
        files = self._write_data_files(snap, key_cols)
        return self._publish(
            {
                "version": head + 1,
                "operation": "optimize",
                "schema": m["schema"],
                "key_cols": key_cols,
                "files": files,
            }
        )

    def optimize_zorder(
        self,
        zcols: Sequence[str],
        target_files: int,
        bits: int = 16,
    ) -> int:
        """OPTIMIZE ZORDER BY: rewrite the snapshot clustered on the
        Morton interleave of ``zcols`` (integer/date/timestamp columns),
        so per-file min/max stats become tight on EVERY listed column
        and ``scan`` prunes hyper-rectangle predicates (see
        operators/layout.py).  Normalization bounds come from one
        min/max aggregation over the snapshot — the stats pass a real
        OPTIMIZE does first.  One range shuffle, same cost as any global
        sort; the key is dropped before write.

        Measured trade-off (BASELINE.md round-4b probe): clustering on
        non-PK columns scrambles each file's PK range, so MERGE-on-PK
        file pruning stops skipping files on a z-ordered table.  Rule
        of thumb: z-order the read-optimized copy; keep tables that
        receive narrow PK deltas range-partitioned on the PK
        (``compact``), and expect ``changes``/COW pruning to degrade to
        full rewrites when a delta's keys spread uniformly over the key
        space — recompute beats incremental there."""
        from ..operators.layout import zorder_key

        head = self._head()
        m = self._read_manifest(head)
        snap = self.snapshot(head)
        typed = dict(snap.dtypes)

        def _as_long(c: str):
            t = typed[c]
            if t in ("date", "timestamp", "timestamp_ntz"):
                return F.datediff(F.col(c).cast("date"), F.to_date(F.lit("1970-01-01")))
            return F.col(c).cast("long")

        aggs = []
        for c in zcols:
            aggs += [F.min(_as_long(c)).alias(f"__lo_{c}"), F.max(_as_long(c)).alias(f"__hi_{c}")]
        b = snap.agg(*aggs).first()
        if any(b[f"__lo_{c}"] is None for c in zcols):
            raise ValueError(
                "optimize_zorder on an empty snapshot (or all-NULL z column): "
                "nothing to cluster"
            )
        specs = []
        for c in zcols:
            lo, hi = b[f"__lo_{c}"], b[f"__hi_{c}"]
            if hi == lo:
                hi = lo + 1  # constant column: degenerate but valid range
            specs.append((_as_long(c), int(lo), int(hi)))
        clustered = (
            snap.withColumn("__zkey", zorder_key(specs, bits=bits))
            .repartitionByRange(target_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
        # stats must cover the z columns too, or scan() cannot prune on them
        stats_cols = list(dict.fromkeys([*m["key_cols"], *zcols]))
        files = self._write_data_files(clustered, stats_cols)
        return self._publish(
            {
                "version": head + 1,
                "operation": "optimize-zorder",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "files": files,
            }
        )

    def vacuum(self, keep_last: int = 2, retain_seconds: float = 3600.0) -> list[str]:
        """Drop data files referenced by NO retained manifest (the last
        ``keep_last`` versions) and prune older manifests.  Returns the
        deleted file paths.  Irreversible: time travel past the horizon
        stops working, which is the point.

        ``retain_seconds`` is the in-flight-writer guard (Delta's VACUUM
        retention window): a concurrent commit writes its data files
        BEFORE publishing its manifest, so files younger than the window
        are never deleted even though no manifest references them yet —
        without it, a vacuum racing an append deletes the files the
        about-to-publish manifest points at.  Lower it only when no
        other writer can be active."""
        import time

        head = self.latest_version()
        if head is None:
            return []
        horizon = max(0, head - keep_last + 1)
        live: set[str] = set()
        for v in self._versions_on_disk():
            if v >= horizon:
                live |= {e["path"] for e in self._read_manifest(v)["files"]}
        now = time.time()
        deleted = []
        data_root = os.path.join(self.root, "data")
        for commit_dir in os.listdir(data_root) if os.path.isdir(data_root) else []:
            full_dir = os.path.join(data_root, commit_dir)
            for name in os.listdir(full_dir):
                rel = os.path.join("data", commit_dir, name)
                full = os.path.join(full_dir, name)
                if not name.endswith(".parquet") or rel in live:
                    continue
                try:
                    age = now - os.path.getmtime(full)
                except FileNotFoundError:
                    continue
                if age < retain_seconds:
                    continue  # possibly an unpublished concurrent commit
                os.unlink(full)
                deleted.append(rel)
            if not any(n.endswith(".parquet") for n in os.listdir(full_dir)):
                shutil.rmtree(full_dir, ignore_errors=True)
        for v in self._versions_on_disk():
            if v < horizon:
                try:
                    os.unlink(self._manifest_path(v))
                except FileNotFoundError:
                    pass
        return sorted(deleted)


def _prune_bound(v, col_type: str | None):
    """Normalize a scan() predicate bound to the granularity its column's
    manifest stats use, so the conservative-prune string compare stays
    sound across date/datetime mixes:

    - date column + datetime bound -> truncate the bound to the date.
      Sound for both directions: all rows <= smax < date(lo) implies
      every row (compared at midnight) < lo; and date rows > date(hi)
      are, at midnight, > hi.
    - timestamp column + date bound -> extend to 'T00:00:00' (how Spark
      itself coerces a date literal against a timestamp column), so a
      file whose min is exactly midnight is not pruned against an
      equal date upper bound.

    String columns are left alone — for them the full lexical compare IS
    the predicate semantics."""
    import re

    s = _range_scalar(v)
    if not isinstance(s, str) or col_type is None:
        return s
    if col_type == "date" and re.match(r"^\d{4}-\d{2}-\d{2}[T ]", s):
        return s[:10]
    if col_type in ("timestamp", "timestamp_ntz") and re.fullmatch(
        r"\d{4}-\d{2}-\d{2}", s
    ):
        return s + "T00:00:00"
    return s


def _range_scalar(v):
    """Coerce a stats/predicate value to a comparable form: dates and
    datetimes to their ISO string (how the manifest stores them — ISO
    order == chronological order); everything else as-is."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _json_scalar(v):
    """Stats values must survive a JSON round-trip (dates → ISO strings;
    the reader casts back through the column's Spark type)."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v
