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

    <root>/_log/00000000000.json        # actions for version 0
    <root>/_log/00000000001.json        # version 1, ...
    <root>/_log/00000000010.checkpoint/ # parquet: resolved file set @ v10
    <root>/_log/_last_checkpoint.json   # hint {"version": 10}
    <root>/data/<commit-uuid>/part-*.parquet   # immutable data files

Each manifest records the commit's ACTIONS — ``add`` (file entries with
row counts and per-file min/max stats for the key columns) and
``remove`` (paths), or ``reset`` for full-replace commits — so a
commit's log record is sized by what the commit TOUCHED, never by the
table.  Every ``checkpoint_interval`` commits the resolved file set is
compacted into a parquet checkpoint; readers resolve a snapshot from
the nearest checkpoint (or reset) plus the bounded manifest tail, and
the pruning paths (``scan`` stats-skipping, ``merge`` file probing,
``changes`` diffing) run as Spark jobs over that entries frame,
collecting only survivors/hits — at 10^6 files the driver never
materializes the full stats list to decide what to read.

- **Atomic commit / isolation**: readers resolve the latest manifest,
  then read only the files it names.  Data files are immutable and a
  manifest is published with ``os.link`` (put-if-absent on POSIX) — a
  reader sees the old version or the new one, never a mix.
- **Optimistic concurrency**: two writers racing to publish the same
  version — the second ``os.link`` fails with ``FileExistsError`` and
  surfaces as :class:`ConcurrentWriteError`.  Appends rebase and retry
  (they commute); merges/overwrites do not auto-rebase.
- **Idempotent writer transactions**: a mutator called with
  ``txn=(app_id, batch_id)`` records the pair in the manifest (carried
  forward cumulatively); replaying the same or an older batch for that
  app is a NO-OP returning the current head — the exactly-once
  contract a restarted streaming query needs (Delta's ``txn`` action).
- **Time travel**: ``snapshot(version=N)`` reads any retained version.
- **Copy-on-write MERGE with file pruning**: ``merge`` rewrites ONLY
  the data files whose key [min,max] range can contain a delta key;
  every other file is carried forward implicitly (the commit records
  just the touched files).  When the delta's key spread would touch
  most files anyway — where COW pruning buys nothing and its
  fragmented rewrite loses to one clean pass (measured, BASELINE.md
  round-4b) — merge switches automatically to a range-partitioned full
  recompute.
- **Vacuum**: deletes data files no retained version references (a
  checkpoint is written at the new horizon first, so resolution never
  needs the pruned manifests).
- **Merge-on-read DELETION VECTORS** (round 12, the Delta/Iceberg v2
  position-delete model): a DELETE/MERGE whose matches in a file fall
  below ``dv_frac`` of its live rows does NOT rewrite the file —
  it writes the deleted ROW POSITIONS to a parquet sidecar under
  ``<root>/dv/<commit-uuid>/`` (columns ``path, pos``) and records a
  ``dv`` manifest action updating the entry's vector reference and
  live-row count.  Reads anti-join ``_metadata.row_index`` against the
  referenced vectors; at 100 TB a 10-row GDPR point delete from a 1 GB
  file costs a KB-sized sidecar, not a 1 GB rewrite.  Vectors are
  CUMULATIVE-REPLACEMENT: a file has at most ONE current vector, and a
  new vector always contains every previously deleted position for
  that file — which makes anti-joining the UNION of all currently
  referenced vector dirs exact (an older dir still referenced by some
  other file can only contribute a subset of this file's current
  positions).  ``compact``/``optimize_zorder``/recompute materialize
  vectors away (reset commits); ``changes`` treats a (path, dv)
  identity change as churn so the CDF stays the exact logical diff.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ENTRY_DDL = "path string, rows long, stats string, dv string"
_ISIN_MAX = 1000  # remove-sets beyond this become an anti-join, not a literal
_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


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

    def __init__(self, spark: SparkSession, root: str, checkpoint_interval: int = 10):
        self.spark = spark
        self.root = root
        self._log_dir = os.path.join(root, "_log")
        self.checkpoint_interval = checkpoint_interval

    # ---------------------------------------------------------------- log

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:011d}.json")

    def _checkpoint_dir(self, version: int, owner: str | None = None) -> str:
        """Checkpoint dir for a version.  Interval checkpoints live at
        ``<v>.checkpoint``; checkpoint-BACKED commits (restore/clone)
        stage their file set at the owner-unique ``<v>.checkpoint.<owner>``
        so two concurrent writers racing for the same version can never
        overwrite (or clean up) each other's staged file set — the loser's
        dir is garbage by construction, the winner's is named in its
        manifest."""
        base = os.path.join(self._log_dir, f"{version:011d}.checkpoint")
        return f"{base}.{owner}" if owner else base

    def _hint_version(self) -> int | None:
        # TypeError included: valid-JSON-but-wrong-shape hints (null,
        # list, {"version": null}) must degrade to the listing fallback,
        # not crash every read path — the hint is only an optimization
        try:
            with open(os.path.join(self._log_dir, "_last_checkpoint.json")) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, KeyError, ValueError, TypeError, json.JSONDecodeError):
            return None

    def latest_version(self) -> int | None:
        """Highest committed version, or None for a nonexistent table.

        Fast path: versions are contiguous from any retained manifest,
        so probe FORWARD from the checkpoint hint — O(commits since the
        last checkpoint), not an O(total versions) directory listing
        (the same listing cost Delta bounds with _last_checkpoint).
        Falls back to the listing when there is no usable hint."""
        hint = self._hint_version()
        if hint is not None and os.path.exists(self._manifest_path(hint)):
            v = hint
            while os.path.exists(self._manifest_path(v + 1)):
                v += 1
            # a concurrent vacuum prunes manifests in ascending order, so
            # the walk can land on a version deleted under it (v gone by
            # the time v+1 reads as missing); the HEAD manifest is never
            # pruned, so re-checking v and falling back to the listing
            # restores the old always-true-head guarantee
            if os.path.exists(self._manifest_path(v)):
                return v
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return None
        versions = [int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()]
        return max(versions) if versions else None

    #: READER-REQUIRED table features this engine build understands
    #: (Delta's readerFeatures protocol): a feature lands in the
    #: manifest when first used and LATCHES (never auto-drops, even
    #: across restore — Delta semantics), and a reader that doesn't
    #: know one of a table's features must refuse to read rather than
    #: silently misread (ignoring deletion vectors resurrects deleted
    #: rows; ignoring column mapping reads the wrong columns; ignoring
    #: path-partition derivation returns NULL partition values).
    #: Writer-optional metadata (bloom sidecars, generated maps,
    #: optimize watermarks) is deliberately NOT gated: a reader that
    #: ignores it is merely slower, never wrong.
    SUPPORTED_READER_FEATURES = frozenset(
        {"deletion-vectors", "column-mapping", "partition-from-path"}
    )

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            m = json.load(f)
        unknown = set(m.get("features") or ()) - self.SUPPORTED_READER_FEATURES
        if unknown:
            raise RuntimeError(
                f"table at {self.root} requires reader features "
                f"{sorted(unknown)} this engine build does not support — "
                "refusing to read rather than return wrong results; "
                "upgrade the engine to open this table"
            )
        return m

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

    @staticmethod
    def _dir_owner(d: str) -> str | None:
        try:
            with open(os.path.join(d, "_OWNER")) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def _checkpoint_path(self, version: int) -> str | None:
        """The trusted checkpoint dir for ``version``, or None.

        Interval checkpoints are trusted when complete (``_SUCCESS``)
        and unowned.  A checkpoint-BACKED commit's file set is trusted
        only at a dir whose ``_OWNER`` matches the manifest's
        ``checkpoint_owner`` — preferring the owner-unique staged path,
        falling back to the legacy shared path for pre-existing tables.
        An orphan left by a crash (or a raced loser) between
        checkpoint-write and publish is never trusted as a resolution
        base for someone else's commit at that version."""
        try:
            m = self._read_manifest(version)
        except FileNotFoundError:
            return None
        owner = m.get("checkpoint_owner")
        if owner:
            for d in (
                self._checkpoint_dir(version, owner),
                self._checkpoint_dir(version),  # legacy shared layout
            ):
                if (
                    os.path.exists(os.path.join(d, "_SUCCESS"))
                    and self._dir_owner(d) == owner
                ):
                    return d
            return None
        d = self._checkpoint_dir(version)
        if os.path.exists(os.path.join(d, "_SUCCESS")) and self._dir_owner(d) is None:
            return d
        return None

    def _checkpoint_valid(self, version: int) -> bool:
        return self._checkpoint_path(version) is not None

    def _trusted_checkpoint_dir(self, version: int) -> str:
        """The validated checkpoint dir for a version that MUST have one
        (a resolution base, or a checkpoint-backed restore/clone
        commit).  Raises a clear corruption error instead of silently
        reading an incomplete or foreign-owned dir."""
        d = self._checkpoint_path(version)
        if d is None:
            raise RuntimeError(
                f"checkpoint for version {version} at {self.root} is missing, "
                "incomplete (_SUCCESS), or owned by a different writer than "
                "the committed manifest claims — table metadata is corrupt "
                "or a concurrent writer's staging dir was tampered with"
            )
        return d

    def _checkpoint_versions(self) -> list[int]:
        """Ascending versions with a COMPLETE, trusted checkpoint on
        disk (see :meth:`_checkpoint_valid`; the ``_last_checkpoint``
        hint is only an optimization)."""
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return []
        cands: set[int] = set()
        for n in names:
            m = re.match(r"^(\d+)\.checkpoint(\.[0-9a-f]+)?$", n)
            if m:
                cands.add(int(m.group(1)))
        return sorted(v for v in cands if self._checkpoint_valid(v))

    def _checkpoint_at_or_before(self, version: int) -> int | None:
        hv = self._hint_version()
        if hv is not None and hv <= version and self._checkpoint_valid(hv):
            return hv
        below = [v for v in self._checkpoint_versions() if v <= version]
        return max(below) if below else None

    def _publish(self, manifest: dict) -> int:
        """Atomically publish a manifest as the next version.

        ``os.link(tmp, final)`` is an atomic put-if-absent: if another
        writer already published this version the link fails and the
        caller decides whether the operation rebases (append) or aborts
        (merge/overwrite).
        """
        os.makedirs(self._log_dir, exist_ok=True)
        version = manifest["version"]
        # CHECK constraints are table PROPERTIES (round 11): they carry
        # forward through every commit unless the commit sets them
        # explicitly (add/drop constraint).  Inheriting here — the one
        # choke point every commit passes through — means no operation
        # (merge, restore, compact, schema evolution, ...) can silently
        # drop them.  The parent manifest is the current head, which is
        # never vacuum-pruned.
        parent: dict = {}
        if version > 0:
            try:
                parent = self._read_manifest(version - 1)
            except FileNotFoundError:
                parent = {}
            if "constraints" not in manifest and parent.get("constraints"):
                manifest["constraints"] = parent["constraints"]
            # generated-column map (round 12) is a table property with
            # the same carry-forward contract
            if "generated" not in manifest and parent.get("generated"):
                manifest["generated"] = parent["generated"]
            # identity allocation state (round 12): carried so the
            # high-water mark LATCHES across every commit — including
            # restore, so rolling back never re-issues the rolled-back
            # rows' ids (Delta identity semantics)
            if "identity" not in manifest and parent.get("identity"):
                manifest["identity"] = parent["identity"]
            # bloom file-stats property (round 12) inherits the same way;
            # staleness is sound — files the sidecar doesn't cover are
            # conservatively read by point_lookup
            if "bloom" not in manifest and parent.get("bloom"):
                manifest["bloom"] = parent["bloom"]
            # incremental-OPTIMIZE watermark (round 12): the version of
            # the last compaction, so `compact(incremental=True)` only
            # touches files added after it
            if "last_optimize" not in manifest and parent.get("last_optimize"):
                manifest["last_optimize"] = parent["last_optimize"]
        # IN-COMMIT TIMESTAMP (Delta 3.x in-commit timestamps): stamped
        # at publish time and clamped to be strictly greater than the
        # parent's, so the version->timestamp map is monotone even under
        # clock skew between writers.  Always overwritten here — a
        # rebased retry or a restore gets ITS OWN commit time, never the
        # timestamp of the manifest it was derived from.  Pre-existing
        # tables without the field fall back to manifest-file mtime in
        # commit_timestamp().
        # reader-feature derivation (round 12): features are computed
        # from what the commit actually CONTAINS at this one choke
        # point — no write path can introduce a gated structure without
        # advertising it — unioned with the parent's set (latched).
        feats = set(parent.get("features") or ()) | set(
            manifest.get("features") or ()
        )
        if manifest.get("dv"):
            feats.add("deletion-vectors")
        for fld in (manifest.get("schema") or {}).get("fields", ()):
            md = fld.get("metadata") or {}
            pn = md.get("physical_name")
            if pn and pn != fld.get("name"):
                feats.add("column-mapping")
            if md.get("partition_from_path"):
                feats.add("partition-from-path")
        if feats:
            manifest["features"] = sorted(feats)
        pts = parent.get("timestamp")
        if pts is None and version > 0:
            try:
                pts = os.path.getmtime(self._manifest_path(version - 1))
            except OSError:
                pts = None
        now = time.time()
        manifest["timestamp"] = now if pts is None else max(now, float(pts) + 1e-3)
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

    def _commit(self, manifest: dict) -> int:
        """Publish, then best-effort checkpoint on the interval.  A
        failed/raced checkpoint never fails the commit — the JSON log
        alone is always sufficient for correctness."""
        v = self._publish(manifest)
        ci = self.checkpoint_interval
        if ci and ci > 0 and v > 0 and v % ci == 0:
            try:
                self._write_checkpoint(v)
            except Exception:  # noqa: BLE001 — checkpoint is an optimization
                pass
        return v

    def _write_checkpoint(self, version: int) -> None:
        """Compact the resolved file set at ``version`` into a parquet
        checkpoint (built FROM the previous checkpoint + tail, so the
        write itself is a bounded job, not a full log replay)."""
        ent = self._entries_frame(version)
        out = self._checkpoint_dir(version)
        ent.write.mode("overwrite").parquet(out)
        self._advance_hint(version)

    def _advance_hint(self, version: int) -> None:
        hint = os.path.join(self._log_dir, "_last_checkpoint.json")
        # never move the hint BACKWARDS: a vacuum-horizon checkpoint can
        # be older than an existing interval checkpoint, and readers
        # trust the hint without searching for later ones
        try:
            with open(hint) as f:
                if int(json.load(f)["version"]) >= version:
                    return
        except (FileNotFoundError, KeyError, ValueError, json.JSONDecodeError):
            pass
        tmp = hint + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, hint)

    def _write_owned_checkpoint(self, version: int, ent: DataFrame, owner: str) -> None:
        """Pre-publish write of a checkpoint-backed commit's file set:
        the entries frame lands as the checkpoint parquet at the
        OWNER-UNIQUE dir ``<version>.checkpoint.<owner>`` (a DISTRIBUTED
        write — the paths never materialize in the Python driver) plus
        an ``_OWNER`` marker tying it to the manifest about to be
        published.  The owner-unique path means two writers racing for
        the same version can never clobber each other's staged file set;
        until the manifest exists and names this owner,
        :meth:`_checkpoint_valid` rejects the dir, so a crash here
        leaves harmless garbage, never a wrong resolution base.  The
        hint is advanced only AFTER a successful publish."""
        out = self._checkpoint_dir(version, owner)
        ent.write.mode("overwrite").parquet(out)
        with open(os.path.join(out, "_OWNER"), "w") as f:
            f.write(owner)

    # --------------------------------------------------------- resolution

    def _resolve_walk(self, version: int) -> tuple[int | None, list[dict]]:
        """Find the resolution base for ``version``: the nearest
        checkpoint at/below it, else the nearest full-replace (reset)
        manifest.  Returns (checkpoint_version_or_None, tail) where
        ``tail`` is the ascending list of manifests to replay after the
        base (the reset manifest itself included when it is the base).
        The walk is bounded by ``checkpoint_interval`` commits once the
        table has any checkpoint."""
        ckpt_v = self._checkpoint_at_or_before(version)
        tail: list[dict] = []
        u = version
        while u >= 0:
            if ckpt_v is not None and u == ckpt_v:
                return ckpt_v, tail
            m = self._read_manifest(u)
            tail.insert(0, m)
            if m.get("reset") or "files" in m:  # "files": legacy full-list form
                return None, tail
            u -= 1
        return None, tail  # unreachable for well-formed logs (v0 is a reset)

    @staticmethod
    def _manifest_adds(m: dict) -> list[dict]:
        return list(m.get("add") or m.get("files") or [])

    # ------------------------------------------------- column mapping

    @staticmethod
    def _physical_name(field) -> str:
        """The field's stable STORAGE name (Delta/Iceberg column-mapping
        pattern): parquet files always carry physical names, so rename
        and drop are metadata-only commits — the logical->physical map
        lives in the manifest schema's per-field metadata.  Fields
        without the key (every pre-mapping table, and every column
        present at create()) store under their logical name."""
        return (field.metadata or {}).get("physical_name", field.name)

    @classmethod
    def _physical_schema(cls, schema):
        """``schema`` with each top-level field renamed to its physical
        name — the shape the parquet files actually have."""
        from pyspark.sql.types import StructField, StructType

        return StructType(
            [
                StructField(cls._physical_name(f), f.dataType, f.nullable, f.metadata)
                for f in schema.fields
            ]
        )

    def _read_data(
        self, schema, sources: Sequence[str], with_meta: bool = False
    ) -> DataFrame:
        """Read data files through a version's PHYSICAL schema, then
        project back to that version's logical names.  Files predating
        an add-columns commit NULL-backfill (a late column's physical
        name never appears in them); columns dropped at this version
        are simply absent from ``schema``, so the scan prunes them.
        When no field is renamed this is exactly the plain schema read
        (no extra projection node).

        ``with_meta`` appends two ROW-IDENTITY columns from the parquet
        reader's hidden ``_metadata`` struct: ``__file`` (the file's
        normalized absolute path — scheme stripped, percent-decoded)
        and ``__pos`` (the row's index WITHIN its file, stable across
        reads and unaffected by predicate pushdown).  (path, pos) is
        the identity deletion vectors anti-join on — the same identity
        Delta's position deletes use.

        PARTITION-from-path fields (hive-partitioned sources adopted by
        :meth:`import_existing`, marked ``partition_from_path`` in the
        field metadata): the value lives in the file's directory name
        (``col=val``), not in the file, so the schema read NULL-fills
        it — each such column coalesces the physical column (present in
        files this table wrote itself, e.g. post-merge rewrites) with
        the value parsed from ``input_file_name`` (a narrow per-row
        expression, no join).  Hive percent-escaping is decoded and
        ``__HIVE_DEFAULT_PARTITION__`` maps to NULL."""
        import re as _re

        phys = self._physical_schema(schema)
        df = self.spark.read.schema(phys).parquet(*sources)
        if with_meta:
            # capture _metadata at the scan — later projections drop it
            df = df.select(
                "*",
                _percent_decode(
                    F.regexp_replace(
                        F.col("_metadata.file_path"),
                        r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+",
                        "/",
                    )
                ).alias("__file"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        part_fields = [
            f
            for f in schema.fields
            if (f.metadata or {}).get("partition_from_path")
        ]
        if part_fields:
            fname = _percent_decode(F.input_file_name())
            for f in part_fields:
                p = self._physical_name(f)
                # DEEPEST occurrence (F.get is NULL-safe on empty): a
                # same-named `col=val` dir above the adopted root can
                # never shadow the real partition dir
                arr = F.regexp_extract_all(
                    fname, F.lit("/" + _re.escape(p) + "=([^/]*)/"), F.lit(1)
                )
                raw = F.get(arr, F.size(arr) - 1)
                val = (
                    F.when(
                        raw.isNull()
                        | (raw == "")
                        | (raw == "__HIVE_DEFAULT_PARTITION__"),
                        F.lit(None),
                    )
                    .otherwise(_percent_decode(raw))
                    .cast(f.dataType)
                )
                df = df.withColumn(p, F.coalesce(F.col(f"`{p}`"), val))
        pairs = [(self._physical_name(f), f.name) for f in schema.fields]
        if all(p == n for p, n in pairs):
            return df
        meta = [F.col("__file"), F.col("__pos")] if with_meta else []
        return df.select(*[F.col(f"`{p}`").alias(n) for p, n in pairs], *meta)

    def _dv_frame(self, dv_dirs: Sequence[str]) -> DataFrame:
        """Deleted-row identities ``(__file, __pos)`` across deletion-
        vector sidecar dirs (absolute paths).  Each dir's RELATIVE file
        paths anchor at that dir's OWN table root (``dirname(dirname)``
        of the ``dv/<uuid>`` dir), so vectors inherited through a
        shallow clone resolve against the source's files, not the
        clone's root."""
        frames = []
        for d in sorted(set(dv_dirs)):
            r = os.path.dirname(os.path.dirname(d))
            frames.append(
                self.spark.read.parquet(d).select(
                    F.when(F.col("path").startswith("/"), F.col("path"))
                    .otherwise(F.concat(F.lit(r + "/"), F.col("path")))
                    .alias("__file"),
                    F.col("pos").alias("__pos"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def _abs_path(self, p: str) -> str:
        return p if p.startswith("/") else os.path.join(os.path.abspath(self.root), p)

    def _read_entries_data(
        self, schema, entries: Sequence[dict], keep_meta: bool = False
    ) -> DataFrame:
        """Read resolved file ENTRIES (not bare paths) through a
        version's schema, anti-applying each file's deletion vector —
        THE one read path every snapshot/scan/rewrite consumer must use
        once a table can carry vectors (a bare ``_read_data`` would
        resurrect deleted rows).  Files without a vector read plain (no
        metadata columns, no join — the common case stays the old
        plan); files WITH one read with (``__file``, ``__pos``) row
        identity and left-anti join the union of their referenced
        vector dirs.  Anti-joining the UNION is exact because vectors
        are cumulative-replacement (see the module docstring).

        ``keep_meta`` keeps ``__file``/``__pos`` on the output for
        callers that need row identity downstream (the DV writers)."""
        plain = [e for e in entries if not e.get("dv")]
        dvd = [e for e in entries if e.get("dv")]
        parts = []
        if plain:
            parts.append(
                self._read_data(
                    schema,
                    [self._abs_path(e["path"]) for e in plain],
                    with_meta=keep_meta,
                )
            )
        if dvd:
            df = self._read_data(
                schema, [self._abs_path(e["path"]) for e in dvd], with_meta=True
            )
            dvf = self._dv_frame([self._abs_path(e["dv"]["path"]) for e in dvd])
            df = df.join(dvf, ["__file", "__pos"], "left_anti")
            if not keep_meta:
                df = df.drop("__file", "__pos")
            parts.append(df)
        if not parts:
            empty = self.spark.createDataFrame([], schema)
            if keep_meta:
                empty = empty.select(
                    "*",
                    F.lit(None).cast("string").alias("__file"),
                    F.lit(None).cast("long").alias("__pos"),
                )
            return empty
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _ckpt_frame(self, ckpt_dir: str) -> DataFrame:
        """A checkpoint's entries as the CURRENT 4-column shape —
        checkpoints written before deletion vectors existed lack the
        ``dv`` column and normalize to NULL (no vector)."""
        df = self.spark.read.parquet(ckpt_dir)
        if "dv" not in df.columns:
            df = df.withColumn("dv", F.lit(None).cast("string"))
        return df.select("path", "rows", "stats", "dv")

    @staticmethod
    def _entry_of_row(r) -> dict:
        e = {
            "path": r["path"],
            "rows": r["rows"],
            "stats": json.loads(r["stats"]) if r["stats"] else {},
        }
        if r["dv"]:
            e["dv"] = json.loads(r["dv"])
        return e

    def _read_checkpoint_entries(self, version: int) -> list[dict]:
        """Driver-side materialization of one checkpoint's entries
        (bounded by file count — the maintenance/inspection cost class,
        same as :meth:`entries`)."""
        return [
            self._entry_of_row(r)
            for r in self._ckpt_frame(
                self._trusted_checkpoint_dir(version)
            ).collect()
        ]

    def _apply_manifest(self, by_path: dict[str, dict], m: dict) -> dict[str, dict]:
        """Fold one manifest's actions (reset -> remove -> add) into a
        path -> entry dict — THE single definition of log-replay
        semantics for the driver-side paths (entries/history/vacuum).
        ``_entries_frame``/``_paths`` keep specialized DataFrame/
        column-pruned folds; any change to manifest semantics must
        update those two alongside this helper.

        A manifest carrying ``checkpoint_owner`` is a checkpoint-backed
        commit (restore/clone at scale): its file set lives in the
        checkpoint parquet at its own version, not inline in the JSON —
        replace the state with that checkpoint's entries.

        A ``dv`` action updates an EXISTING entry in place (new
        deletion-vector reference + new live-row count) without
        touching its data file — the merge-on-read analogue of Delta's
        add-with-deletionVector re-add."""
        if m.get("checkpoint_owner"):
            return {e["path"]: e for e in self._read_checkpoint_entries(m["version"])}
        if m.get("reset") or "files" in m:
            by_path = {}
        for p in m.get("remove") or []:
            by_path.pop(p, None)
        for e in self._manifest_adds(m):
            by_path[e["path"]] = e
        for d in m.get("dv") or []:
            prev = by_path.get(d["path"])
            if prev is not None:
                by_path[d["path"]] = {**prev, "rows": d["rows"], "dv": d["dv"]}
        return by_path

    def entries(self, version: int | None = None) -> list[dict]:
        """Resolved file entries ``{path, rows, stats}`` for a version —
        the driver-side materialization (bounded by file count).  Read
        paths that only PRUNE use :meth:`_entries_frame` instead and
        never pull the full list; this accessor exists for snapshot
        assembly, maintenance (history/vacuum), and inspection."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        ckpt_v, tail = self._resolve_walk(v)
        by_path: dict[str, dict] = {}
        if ckpt_v is not None:
            for r in self._ckpt_frame(self._trusted_checkpoint_dir(ckpt_v)).collect():
                by_path[r["path"]] = self._entry_of_row(r)
        for m in tail:
            by_path = self._apply_manifest(by_path, m)
        return sorted(by_path.values(), key=lambda e: e["path"])

    def _entries_frame(self, version: int) -> DataFrame:
        """The resolved file set as a DataFrame ``(path, rows, stats)``
        (stats = JSON string): checkpoint parquet (distributed read)
        minus the tail's removes plus the tail's adds — both bounded by
        the churn of at most ``checkpoint_interval`` commits, never by
        table size."""
        ckpt_v, tail = self._resolve_walk(version)
        if ckpt_v is not None:
            base = self._ckpt_frame(self._trusted_checkpoint_dir(ckpt_v))
        else:
            base = self.spark.createDataFrame([], _ENTRY_DDL)
        removes: set[str] = set()
        adds: dict[str, tuple] = {}
        dvups: dict[str, tuple] = {}  # path -> (rows, dv_json) for BASE entries
        for m in tail:
            if m.get("checkpoint_owner"):
                # checkpoint-backed commit: the file set IS that
                # version's checkpoint parquet (distributed read)
                base = self._ckpt_frame(self._trusted_checkpoint_dir(m["version"]))
                removes, adds, dvups = set(), {}, {}
                continue
            if m.get("reset") or "files" in m:
                base = self.spark.createDataFrame([], _ENTRY_DDL)
                removes, adds, dvups = set(), {}, {}
            for p in m.get("remove") or []:
                # ordering matters: a path added earlier in the TAIL and
                # removed now dies; one removed from the BASE and
                # re-added later must survive (the dv-era fold fixes the
                # old all-removes-collapse that silently assumed paths
                # are never re-added)
                if p in adds:
                    adds.pop(p)
                else:
                    removes.add(p)
                dvups.pop(p, None)
            for e in self._manifest_adds(m):
                adds[e["path"]] = (
                    e["path"],
                    e["rows"],
                    json.dumps(e.get("stats") or {}),
                    json.dumps(e["dv"]) if e.get("dv") else None,
                )
            for d in m.get("dv") or []:
                p = d["path"]
                if p in adds:
                    a = adds[p]
                    adds[p] = (a[0], d["rows"], a[2], json.dumps(d["dv"]))
                else:
                    dvups[p] = (d["rows"], json.dumps(d["dv"]))
        out = base
        if removes:
            rm = sorted(removes)
            if len(rm) <= _ISIN_MAX:
                out = out.where(~F.col("path").isin(rm))
            else:
                # a near-threshold COW merge can remove O(files) paths in
                # one manifest — as an expression literal that bloats the
                # plan, so large remove sets apply as an anti-join instead
                rem = self.spark.createDataFrame([(p,) for p in rm], "path string")
                out = out.join(rem, "path", "left_anti")
        if dvups:
            up = self.spark.createDataFrame(
                [(p, r, dv) for p, (r, dv) in dvups.items()],
                "path string, __urows long, __udv string",
            )
            out = out.join(up, "path", "left").select(
                "path",
                F.coalesce("__urows", "rows").alias("rows"),
                "stats",
                F.when(F.col("__urows").isNotNull(), F.col("__udv"))
                .otherwise(F.col("dv"))
                .alias("dv"),
            )
        if adds:
            out = out.unionByName(
                self.spark.createDataFrame(list(adds.values()), _ENTRY_DDL)
            )
        return out

    def _paths(self, version: int) -> list[str]:
        """Absolute data-file paths of a version (path column only — the
        parquet reader API needs the concrete list on the driver)."""
        ckpt_v, tail = self._resolve_walk(version)
        paths: set[str] = set()
        if ckpt_v is not None:
            paths = {
                r["path"]
                for r in self.spark.read.parquet(self._trusted_checkpoint_dir(ckpt_v))
                .select("path")
                .collect()
            }
        for m in tail:
            if m.get("checkpoint_owner"):
                paths = {
                    r["path"]
                    for r in self.spark.read.parquet(
                        self._trusted_checkpoint_dir(m["version"])
                    )
                    .select("path")
                    .collect()
                }
                continue
            if m.get("reset") or "files" in m:
                paths = set()
            paths -= set(m.get("remove") or [])
            paths |= {e["path"] for e in self._manifest_adds(m)}
        return [os.path.join(self.root, p) for p in sorted(paths)]

    # --------------------------------------------------------------- data

    def _apply_generated(self, df: DataFrame, gen: dict | None) -> DataFrame:
        """GENERATED COLUMNS (Delta semantics) at the write boundary:
        a generated column ABSENT from the frame is computed from its
        expression; one PRESENT is validated against it (one combined
        limit-1 probe over the delta — a writer supplying values that
        contradict the generation expression would poison every
        downstream derived-predicate prune, so it hard-fails)."""
        if not gen:
            return df
        mismatch = None
        for c, expr in gen.items():
            if c not in df.columns:
                df = df.withColumn(c, F.expr(expr))
            else:
                bad = ~F.col(c).eqNullSafe(F.expr(expr))
                mismatch = bad if mismatch is None else (mismatch | bad)
        if mismatch is not None and df.where(mismatch).limit(1).count():
            raise ValueError(
                "generated-column mismatch: supplied values contradict the "
                f"generation expressions {sorted(gen)} — drop the column(s) "
                "from the write and let the table compute them"
            )
        return df

    def _assign_identity(
        self, df: DataFrame, ident: dict
    ) -> tuple[DataFrame, dict]:
        """IDENTITY allocation for one insert batch: each identity
        column gets ``hwm + 1 .. hwm + n`` DENSELY, ordered by its
        declared ``order_by`` column — which must be integral,
        non-negative, and unique within the batch, making the
        assignment DETERMINISTIC (same batch, same ids — replayable by
        an external engine as ``row_number() OVER (ORDER BY ...)``).

        Scale shape: the rank is the hierarchical distributed prefix
        sum (:func:`~..operators.sampling.global_running_sum`) — no
        single-partition window over anything that grows with the
        batch.  Returns (df with ids, {col: batch_row_count})."""
        from ..operators.sampling import global_running_sum

        counts: dict[str, int] = {}
        n = None
        for c, spec in ident.items():
            ob = spec["order_by"]
            if ob not in df.columns:
                raise ValueError(
                    f"identity column {c!r}: order_by column {ob!r} missing"
                )
            dup = df.groupBy(ob).count().where("count > 1").limit(1).count()
            if dup:
                raise ValueError(
                    f"identity column {c!r}: order_by column {ob!r} must be "
                    "unique within the batch (ties would make the "
                    "assignment nondeterministic)"
                )
            if n is None:
                n = df.count()
            ranked = global_running_sum(
                df.withColumn("__one", F.lit(1)), ob, "__one", out="__idrank"
            )
            df = ranked.withColumn(
                c, (F.col("__idrank") + F.lit(int(spec["hwm"]) + 1)).cast("long")
            ).drop("__one", "__idrank")
            counts[c] = int(n)
        return df, counts

    def _write_data_files(
        self,
        df: DataFrame,
        stats_cols: Sequence[str],
        schema=None,
        generated=None,
        validate_generated: bool = True,
    ) -> list[dict]:
        """Write df as immutable files under a fresh commit dir; return
        file entries ``{path, rows, stats:{col:{min,max}}}``.

        ``schema`` (the version's logical schema, when the caller has a
        manifest) routes the write through column mapping: columns are
        renamed logical->physical before writing and stats are keyed by
        PHYSICAL name, so file layout and stats keys stay stable across
        renames.  ``None`` (create/overwrite, which define a fresh
        schema from the df itself) writes the df's own names.

        Stats come from ONE scan of the newly written files grouped by
        ``input_file_name`` — the delta-sized data just written, never
        the table (the collect is one row per file in THIS commit).

        Write-time SCHEMA ENFORCEMENT (round 11): when the caller has a
        manifest schema, the frame must carry exactly its logical
        columns with exactly its types — a divergent delta (``p long``
        against a table's ``p int``) would otherwise write parquet that
        only fails AT READ TIME with a physical-type mismatch, possibly
        much later and for an unrelated reader.  Nullability is not
        compared (parquet files don't constrain it here).

        ``generated`` (the manifest's generated-column map, when the
        table has one) computes/validates those columns FIRST — before
        enforcement, so a frame legitimately missing them never trips
        the null-fill — and always joins ``stats_cols``, so every
        commit's files (including compaction rewrites) carry the
        per-file [min,max] that derived-predicate pruning reads.
        """
        if generated:
            if validate_generated:
                df = self._apply_generated(df, generated)
            else:
                # TABLE-SOURCED rows (maintenance rewrites, merge unions
                # whose delta was validated at entry): the values were
                # validated when they first entered the table, so skip
                # the mismatch probe — a full-frame scan at 100 TB —
                # and only compute a column a rewrite frame may lack
                for c, expr in generated.items():
                    if c not in df.columns:
                        df = df.withColumn(c, F.expr(expr))
            stats_cols = list(stats_cols) + [
                c for c in generated if c not in stats_cols
            ]
        if schema is not None:
            # Delta parity: a frame MISSING a nullable non-key column
            # NULL-fills it (after add_columns, existing pipelines that
            # don't yet emit the new column keep working).  Missing KEY
            # columns (they drive stats/pruning and PK semantics) and
            # missing non-nullable columns still hard-fail below.
            fillable = [
                f
                for f in schema.fields
                if f.name not in df.columns
                and f.nullable
                and f.name not in set(stats_cols)
            ]
            if fillable:
                df = df.withColumns(
                    {f.name: F.lit(None).cast(f.dataType) for f in fillable}
                )
            want = {f.name: f.dataType.simpleString() for f in schema.fields}
            got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            missing = sorted(set(want) - set(got))
            extra = sorted(set(got) - set(want))
            if missing or extra:
                raise ValueError(
                    f"write schema mismatch: missing columns {missing}, "
                    f"unexpected columns {extra} (table schema: {sorted(want)})"
                )
            wrong = sorted(
                f"{n}: table {want[n]} vs write {got[n]}"
                for n in want
                if want[n] != got[n]
            )
            if wrong:
                raise ValueError(
                    "write schema mismatch — these columns would write "
                    "parquet that fails at read time: " + "; ".join(wrong)
                )
        if schema is not None:
            mapping = {f.name: self._physical_name(f) for f in schema.fields}
            renames = {n: p for n, p in mapping.items() if n != p and n in df.columns}
            if renames:
                df = df.withColumnsRenamed(renames)
            stats_cols = [mapping.get(c, c) for c in stats_cols]
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
            .collect()  # one row per data file just written — commit-sized
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

    # ----------------------------------------------------------- txn gate

    def last_txn(self, app_id: str) -> int | None:
        """Highest batch id committed for ``app_id``, or None.  Reads the
        HEAD manifest only — txns are carried forward cumulatively, so
        no log walk is needed."""
        head = self.latest_version()
        if head is None:
            return None
        t = self._read_manifest(head).get("txns") or {}
        v = t.get(str(app_id))
        return None if v is None else int(v)

    @staticmethod
    def _merged_txns(head_manifest: dict, txn: tuple[str, int] | None) -> dict:
        txns = dict(head_manifest.get("txns") or {})
        if txn is not None:
            txns[str(txn[0])] = int(txn[1])
        return txns

    def _txn_already_applied(self, head_manifest: dict, txn) -> bool:
        if txn is None:
            return False
        prev = (head_manifest.get("txns") or {}).get(str(txn[0]))
        return prev is not None and int(prev) >= int(txn[1])

    # ---------------------------------------------------------------- api

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        key_cols: Sequence[str] = (),
        checkpoint_interval: int = 10,
        txn: tuple[str, int] | None = None,
        generated: dict | None = None,
        identity: dict | None = None,
    ) -> "AcidTable":
        """Create version 0 from df.  ``key_cols`` drive per-file stats
        (and therefore merge-time file pruning).  ``txn`` records an
        idempotent writer transaction for the creating batch, so a
        streaming sink whose FIRST batch creates the table is replay-
        safe like every later batch.

        ``generated`` maps column -> SQL expression (Delta GENERATED
        ALWAYS AS): the column is computed from the expression on THIS
        and every later write (or validated, if the writer supplies
        it), materialized physically, given per-file stats, and — for
        whitelisted monotone expressions like ``CAST(ts AS DATE)`` —
        used by :meth:`scan` to DERIVE a pruning predicate from a
        range on the source column (Delta's generated-column partition
        pruning).

        ``identity`` maps column -> ``order_by`` column (Delta
        GENERATED BY DEFAULT AS IDENTITY, made DETERMINISTIC): on this
        create and on every :meth:`append`, the column is allocated
        ``hwm+1..hwm+n`` densely, ordered by the (integral,
        non-negative, batch-unique) order column via the hierarchical
        distributed prefix sum.  The high-water mark is a latched
        table property — restore never re-issues rolled-back ids, and
        an append racing another allocation aborts with a metadata
        conflict instead of issuing duplicates.  MERGE/apply_cdc
        upserts carry explicit identity values at the caller's
        responsibility (the BY DEFAULT semantic)."""
        t = cls(spark, root, checkpoint_interval=checkpoint_interval)
        ident_prop = None
        if identity:
            overlap = sorted(set(identity) & set(df.columns))
            if overlap:
                raise ValueError(
                    f"identity columns {overlap} already exist in the create "
                    "frame — they are allocated by the table"
                )
            ident_prop = {
                c: {"order_by": ob, "hwm": 0} for c, ob in identity.items()
            }
            df, counts = t._assign_identity(df, ident_prop)
            for c in ident_prop:
                ident_prop[c]["hwm"] = counts[c]
        if generated:
            overlap = sorted(set(generated) & set(df.columns))
            if overlap:
                raise ValueError(
                    f"generated columns {overlap} already exist in the "
                    "create frame — supply either the expression or the "
                    "data, not both"
                )
            df = t._apply_generated(df, generated)
        # generated columns were just computed (supply is rejected
        # above) — skip _write_data_files' re-validation probe, a
        # second full-frame scan at 100 TB, but keep them in the
        # stats set for derived pruning
        stats_cols = list(key_cols) + [
            c for c in (generated or {}) if c not in key_cols
        ]
        files = t._write_data_files(df, stats_cols)
        manifest = {
            "version": 0,
            "operation": "create",
            "schema": df.schema.jsonValue(),
            "key_cols": list(key_cols),
            "reset": True,
            "add": files,
            "txns": {} if txn is None else {str(txn[0]): int(txn[1])},
        }
        if generated:
            manifest["generated"] = dict(generated)
        if ident_prop:
            manifest["identity"] = ident_prop
        t._commit(manifest)
        return t

    @classmethod
    def import_existing(
        cls,
        spark: SparkSession,
        root: str,
        source_dir: str | None = None,
        key_cols: Sequence[str] = (),
        checkpoint_interval: int = 10,
    ) -> "AcidTable":
        """CONVERT-in-place (Delta's ``CONVERT TO DELTA``): adopt an
        existing parquet directory as version 0 WITHOUT moving, copying,
        or rewriting any data file — the first operation a real
        migration at scale performs.  ``source_dir`` defaults to
        ``root`` itself (true in-place convert: the log lands at
        ``<dir>/_log`` beside the adopted files); pass a different dir
        to adopt files that live elsewhere (clone-style).

        Metadata-only and DISTRIBUTED end to end: one Spark job scans
        the source once, aggregates per-file row counts and min/max
        stats for ``key_cols`` grouped by ``input_file_name()``, and
        writes the resulting entries frame directly as the version-0
        CHECKPOINT parquet (the clone_to machinery) — the file list
        never materializes in the Python driver, so a 10^6-file table
        converts with an O(1) driver footprint and zero data bytes
        copied.  Adopted files are referenced by ABSOLUTE path (the
        clone convention): vacuum never deletes them (it only prunes
        under ``<root>/data/``), COW merge/delete rewrites land under
        this table's own root and simply drop the adopted references,
        and time travel to version 0 keeps working until the caller
        removes the source files themselves.

        Stats land in the same JSON shape ``create()`` writes
        ({col: {min,max}}, dates/timestamps as ISO strings) so
        :meth:`scan` stats-pruning and :meth:`merge` file probing work
        on the adopted table immediately.

        Hive-PARTITIONED sources adopt natively (round 11): the
        partition columns Spark inferred from ``col=val`` directory
        names are marked ``partition_from_path`` in the manifest schema
        — reads re-derive each value from the file path per row (see
        :meth:`_read_data`; files this table writes itself afterwards
        carry the column physically and win the coalesce) — and every
        partition column gets min=max per-file stats in the same pass,
        so :meth:`scan` gives hive-style PARTITION PRUNING on the
        adopted layout for free."""
        import re as _re

        t = cls(spark, root, checkpoint_interval=checkpoint_interval)
        if t.latest_version() is not None:
            raise FileExistsError(f"table already exists at {root}")
        src_abs = os.path.abspath(source_dir if source_dir is not None else root)
        df = spark.read.parquet(src_abs)
        typed = dict(df.dtypes)
        # hive partition detection: ONE file path (a limit-1 job — every
        # leaf of a valid hive layout shares the same partition dirs,
        # Spark's own discovery already errored otherwise), parsed
        # RELATIVE to the source root so `col=val` dirs ABOVE it can
        # never masquerade as partitions
        one = df.select(F.input_file_name().alias("p")).limit(1).first()
        one_path = _percent_decode_py(one["p"]) if one is not None else ""
        rel = one_path[len(src_abs):] if one_path.startswith(src_abs) else one_path
        # segment split, not a regex scan: adjacent partition dirs SHARE
        # their '/' delimiter, so non-overlapping regex matches would
        # miss every other nesting level (/region=../sub=../ -> region)
        part_names = [
            s.split("=", 1)[0]
            for s in rel.split("/")[:-1]  # drop the filename
            if "=" in s and not s.startswith("=")
        ]
        unknown = [p for p in part_names if p not in typed]
        if unknown:
            raise ValueError(
                f"import_existing: path partition dirs {unknown} do not "
                "match any column Spark inferred — inconsistent layout"
            )
        cols = [
            c
            for c in dict.fromkeys([*key_cols, *part_names])
            if typed.get(c) in cls._STATS_TYPES
        ]
        aggs = [F.count(F.lit(1)).alias("rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        # input_file_name is a file: URI (percent-encoded); decode back
        # to the absolute filesystem path the read paths expect
        grouped = df.groupBy(
            _percent_decode(
                F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
            ).alias("path")
        ).agg(*aggs)
        if cols:
            stats = F.to_json(
                F.struct(
                    *[
                        F.struct(
                            _iso_stat(F.col(f"__min_{c}"), typed[c]).alias("min"),
                            _iso_stat(F.col(f"__max_{c}"), typed[c]).alias("max"),
                        ).alias(c)
                        for c in cols
                    ]
                )
            )
        else:
            stats = F.lit("{}")
        ent = grouped.select(
            "path", "rows", stats.alias("stats"), F.lit(None).cast("string").alias("dv")
        )
        owner = uuid.uuid4().hex
        t._write_owned_checkpoint(0, ent, owner)
        from pyspark.sql.types import StructField, StructType

        fields = []
        for f in df.schema.fields:
            if f.name in part_names:
                md = dict(f.metadata or {})
                md["partition_from_path"] = True
                fields.append(StructField(f.name, f.dataType, f.nullable, md))
            else:
                fields.append(f)
        try:
            t._publish(
                {
                    "version": 0,
                    "operation": "convert",
                    "source": src_abs,
                    "schema": StructType(fields).jsonValue(),
                    "key_cols": list(key_cols),
                    "partition_cols": part_names,
                    "reset": True,
                    "add": [],
                    "checkpoint_owner": owner,
                    "txns": {},
                }
            )
        except ConcurrentWriteError as e:
            # owner-unique staging dir: only ever removes OUR staged set
            shutil.rmtree(t._checkpoint_dir(0, owner), ignore_errors=True)
            raise FileExistsError(f"table already exists at {root}") from e
        t._advance_hint(0)
        return t

    # Above this many resolved files, snapshot() stops materializing the
    # path list in the Python driver and switches to the distributed
    # read (glob scan + semi-join against the entries frame).  Class
    # attribute so tests force the distributed path with a tiny value.
    DISTRIBUTED_READ_THRESHOLD = 10_000

    # DELETE/MERGE matches at or below this fraction of a file's live
    # rows take the merge-on-read path (deletion-vector sidecar) instead
    # of a copy-on-write rewrite.  0 disables vectors (pure COW).  The
    # trade: a vector costs one extra anti-join at read time but turns a
    # point delete from an O(file) rewrite into an O(matches) sidecar —
    # below ~20% of a file, the rewrite always loses.
    DEFAULT_DV_FRAC = 0.2

    def snapshot(
        self, version: int | None = None, timestamp=None
    ) -> DataFrame:
        """The table as of ``version`` (default: latest), or as of
        ``timestamp`` (epoch seconds / datetime / ISO string, resolved
        through :meth:`version_at` — Delta's ``timestampAsOf``); the
        two selectors are mutually exclusive.  Reads exactly
        the resolved file set — a concurrent commit cannot tear it.  A
        version whose commits deleted every row has an empty file list;
        that is a valid (empty) table, not a read error.

        Scale path: past ``DISTRIBUTED_READ_THRESHOLD`` resolved files
        the Python driver no longer builds the 10^6-element path list
        (`spark.read.parquet(*paths)` ships every path through py4j).
        Instead the scan globs ``data/*/*.parquet`` and keeps only rows
        whose ``input_file_name()`` appears in the checkpoint-backed
        entries frame — deciding what to KEEP is a distributed semi-join
        against table metadata, exactly how Delta feeds its scans from
        the checkpoint's file index.  (Spark's own file listing for the
        glob is the JVM-side scalable path — driver-held, but never a
        Python list.)  Clone snapshots reference files OUTSIDE this
        table's root by absolute path; the distinct SOURCE ROOTS (a
        bounded set — one per clone-chain ancestor) are extracted
        distributed, each root contributes its own glob, and the
        semi-join keys on the normalized ABSOLUTE path — so multi-root
        clones get the same zero-driver-paths scale path as plain
        tables.  Only sub-threshold tables (or paths outside the
        <root>/data/<commit>/<file> layout) use the explicit list."""
        from pyspark.sql.types import StructType

        if timestamp is not None:
            if version is not None:
                raise ValueError("snapshot: pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        schema = StructType.fromJson(self._read_manifest(v)["schema"])
        ent = self._entries_frame(v).select("path", "dv")
        counts = ent.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("path").startswith("data/"), 0).otherwise(1)).alias(
                "ext"
            ),
        ).first()
        n_files, n_external = counts["n"], counts["ext"] or 0
        if n_files == 0:
            return self.spark.createDataFrame([], schema)
        if n_files <= self.DISTRIBUTED_READ_THRESHOLD:
            # read through the MANIFEST schema, not the files': after an
            # add-columns commit the old (unrewritten) files lack the new
            # columns, and the explicit schema makes the parquet reader
            # NULL-backfill them; _read_entries_data also resolves
            # renamed/dropped columns through the physical-name mapping
            # and anti-applies each file's deletion vector
            rows = ent.collect()
            return self._read_entries_data(
                schema,
                [
                    {"path": r["path"], "dv": json.loads(r["dv"]) if r["dv"] else None}
                    for r in rows
                ],
            )
        abs_root = os.path.abspath(self.root)
        ext_roots: list[str] = []
        if n_external > 0:
            # distinct source roots of the clone chain, computed
            # DISTRIBUTED; only the tiny distinct set reaches the driver
            rootcol = F.regexp_extract("path", r"^(/.*)/data/[^/]+/[^/]+$", 1)
            ext_roots = sorted(
                {
                    r["r"]
                    for r in ent.where(~F.col("path").startswith("data/"))
                    .select(rootcol.alias("r"))
                    .distinct()
                    .collect()
                }
            )
            if "" in ext_roots or len(ext_roots) > 64:
                # an external path outside the standard layout (or an
                # absurd root fan-out): the glob cannot cover it — use
                # the explicit list rather than silently dropping rows
                return self._read_entries_data(schema, self.entries(v))
        # every root that contributes entries MUST have its data dir:
        # a missing one (source table vacuumed/moved) would make its
        # glob silently drop rows — fall back to the explicit path read,
        # which surfaces the missing files as a loud error instead
        needed = ([abs_root] if n_files - n_external > 0 else []) + ext_roots
        globs = []
        for r in needed:
            ddir = os.path.join(r, "data")
            if not os.path.isdir(ddir):
                return self._read_entries_data(schema, self.entries(v))
            globs.append(os.path.join(ddir, "*", "*.parquet"))
        # __file = the file's normalized ABSOLUTE path; entries normalize
        # the same way (relative paths anchored at this table's root).
        # The glob may match files from removed versions or concurrent
        # commits, which the semi-join drops.
        raw = self._read_data(schema, globs, with_meta=True)
        live = ent.select(
            F.when(F.col("path").startswith("/"), F.col("path"))
            .otherwise(F.concat(F.lit(abs_root + "/"), F.col("path")))
            .alias("__file")
        )
        raw = raw.join(live, "__file", "left_semi")
        # deletion vectors at scale: the DISTINCT referenced vector dirs
        # (bounded by dv-writing commits since the last compaction, not
        # by file count) anti-join on the same (__file, __pos) identity;
        # exact because vectors are cumulative-replacement
        dv_dirs = [
            r["d"]
            for r in ent.where(F.col("dv").isNotNull())
            .select(F.get_json_object("dv", "$.path").alias("d"))
            .distinct()
            .collect()
        ]
        if dv_dirs:
            dvf = self._dv_frame([self._abs_path(d) for d in dv_dirs])
            raw = raw.join(dvf, ["__file", "__pos"], "left_anti")
        return raw.drop("__file", "__pos")

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
        Z-order layout exists to maximize.  The prune runs as a SPARK
        filter over the checkpointed entries frame — only the surviving
        paths come back to the driver, so deciding what to read scales
        with the answer, not with the table's file count."""
        from pyspark.sql.types import StructType as _ST

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self._read_manifest(v)
        # normalize each predicate bound to the COLUMN's granularity
        # before comparing: a datetime bound on a date column
        # ('1997-01-01T00:00:00' vs file stat '1997-01-01') would
        # otherwise out-compare a stat it chronologically equals and
        # prune a file whose rows match the bound at midnight
        scan_schema = _ST.fromJson(m["schema"])
        col_types = {f.name: f.dataType.simpleString() for f in scan_schema.fields}
        # GENERATED-COLUMN derived predicates (round 12, Delta's
        # generated-column partition pruning): a range on a SOURCE
        # column implies a range on any generated column whose
        # expression is on the monotone whitelist — f non-decreasing
        # means rows with src in [lo,hi] have f(src) in [f(lo),f(hi)],
        # so the derived interval prunes on the generated column's
        # per-file stats (which every write records) even though the
        # caller never mentioned it.  Bounds are evaluated by SPARK
        # ITSELF on a one-row frame, so timezone/truncation semantics
        # match the stats bit-for-bit; an unevaluable bound degrades
        # to an open side (prunes less, never wrong).
        gen = m.get("generated") or {}
        if gen:
            ranges = dict(ranges)
            for gcol, gexpr in gen.items():
                if gcol in ranges:
                    continue
                src = _monotone_source(gexpr)
                if not src or src not in ranges:
                    continue
                lo, hi = ranges[src]
                glo = self._eval_generated(gexpr, src, col_types.get(src), lo)
                ghi = self._eval_generated(gexpr, src, col_types.get(src), hi)
                if glo is not None or ghi is not None:
                    ranges[gcol] = (glo, ghi)
        # stats are keyed by PHYSICAL name (stable across renames)
        stats_key = {f.name: self._physical_name(f) for f in scan_schema.fields}
        ent = self._entries_frame(v)
        keep = F.lit(True)
        for col, (lo, hi) in ranges.items():
            t = col_types.get(col)
            nlo = _prune_bound(lo, t) if lo is not None else None
            nhi = _prune_bound(hi, t) if hi is not None else None
            sk = stats_key.get(col, col)
            smin = F.get_json_object("stats", f"$.{sk}.min")
            smax = F.get_json_object("stats", f"$.{sk}.max")
            if t in _INT_TYPES:
                smin_c, smax_c = smin.cast("bigint"), smax.cast("bigint")
                lo_l = F.lit(int(nlo)) if nlo is not None else None
                hi_l = F.lit(int(nhi)) if nhi is not None else None
            elif t in _FLOAT_TYPES:
                smin_c, smax_c = smin.cast("double"), smax.cast("double")
                lo_l = F.lit(float(nlo)) if nlo is not None else None
                hi_l = F.lit(float(nhi)) if nhi is not None else None
            else:
                # dates/timestamps/strings: the manifest stores ISO
                # strings whose lexical order IS chronological order
                smin_c, smax_c = smin, smax
                lo_l = F.lit(str(nlo)) if nlo is not None else None
                hi_l = F.lit(str(nhi)) if nhi is not None else None
            cond = F.lit(True)
            if lo_l is not None:
                cond = cond & (smax_c >= lo_l)
            if hi_l is not None:
                cond = cond & (smin_c <= hi_l)
            # no stats on this column -> cannot exclude the file
            keep = keep & F.when(smin.isNull(), F.lit(True)).otherwise(cond)
        # one cached resolution serves both the total count and the
        # prune — without it, the checkpoint read + tail reconstruction
        # would run twice per scan
        ent = ent.persist()
        try:
            total = ent.count()
            kept = [
                {"path": r["path"], "dv": json.loads(r["dv"]) if r["dv"] else None}
                for r in ent.where(keep).select("path", "dv").collect()
            ]
        finally:
            ent.unpersist()
        info = {"files_total": total, "files_read": len(kept), "version": v}
        from pyspark.sql.types import StructType

        if not kept:
            return self.spark.createDataFrame([], StructType.fromJson(m["schema"])), info
        df = self._read_entries_data(
            scan_schema, sorted(kept, key=lambda e: e["path"])
        )
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df, info

    def _eval_generated(self, expr: str, src: str, src_type: str | None, bound):
        """Evaluate a generated-column expression at one source bound,
        using Spark itself (session timezone, cast/truncation rules)
        so derived pruning bounds agree exactly with file stats.
        Returns None (open side) when the bound is None or the
        evaluation fails."""
        if bound is None:
            return None
        try:
            one = self.spark.range(1).select(
                F.lit(str(bound)).cast(src_type or "string").alias(src)
            )
            return one.select(F.expr(expr).alias("__v")).first()["__v"]
        except Exception:  # noqa: BLE001 — derivation is an optimization
            return None

    def compute_bloom_stats(
        self,
        cols: Sequence[str],
        m_bits: int | None = None,
        k: int = 5,
        salt: str = "bloom",
    ) -> int:
        """FILE-LEVEL BLOOM MEMBERSHIP stats (round 12): for
        high-cardinality UNORDERED keys (doc GUIDs, content hashes)
        per-file [min,max] stats prune nothing — every file's range
        spans the key space.  This maintenance op scans the snapshot
        ONCE, folds each file's values of each ``cols`` column into an
        ``m_bits``-bit Bloom bitmap (the PORTABLE md5 double-hash from
        operators/bloom.py, so an external engine can replay
        membership bit-for-bit), and lands them as a sidecar parquet
        under ``_bloom/<uuid>/`` plus a metadata-only commit recording
        the table-level ``bloom`` property.  :meth:`point_lookup` then
        prunes files whose bitmap provably lacks every probed value.

        Sizing: ``m_bits=None`` (default) AUTO-SIZES to ~10 bits per
        row of the LARGEST file (~1% false positives at k=5; an
        undersized bitmap saturates and silently stops pruning — the
        failure mode the auto-size exists to prevent), rounded to the
        60-bit word and capped at the sidecar word budget; pass an
        explicit value to trade sidecar bytes against pruning power.
        STALENESS IS SOUND: files written after this
        commit have no bitmap row and are conservatively read; removed
        files' rows are ignored (inner identity via the entries join).
        Deletion-vector-masked rows are excluded from the build (fewer
        false positives; never false negatives).

        The property carries forward through every commit at the
        ``_publish`` choke point (like CHECK constraints) until the
        next ``compute_bloom_stats`` replaces it."""
        from ..operators.bloom import (
            BITS_PER_WORD,
            MAX_WORDS,
            _check_params,
            _mask_array,
            _positions,
        )

        head = self._head()
        m = self._read_manifest(head)
        entries = self.entries(head)
        if m_bits is None:
            max_rows = max((e["rows"] for e in entries), default=0)
            words = max(64, -(-(max_rows * 10) // BITS_PER_WORD))
            m_bits = min(words, MAX_WORDS) * BITS_PER_WORD
        _check_params(m_bits, k)
        if m_bits > MAX_WORDS * BITS_PER_WORD:
            raise ValueError("m_bits exceeds the sidecar word budget")
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        phys = {f.name: self._physical_name(f) for f in schema.fields}
        missing = sorted(set(cols) - set(phys))
        if missing:
            raise ValueError(f"bloom columns not in schema: {missing}")
        abs_root = os.path.abspath(self.root)
        n_words = m_bits // BITS_PER_WORD
        df = self._read_entries_data(schema, entries, keep_meta=True)
        frames = []
        for c in cols:
            pos = (
                df.where(F.col(c).isNotNull())
                .select(
                    "__file",
                    F.explode(
                        F.array(*_positions(F.col(c), salt, m_bits, k, True))
                    ).alias("pos"),
                )
            )
            words = (
                pos.select(
                    "__file",
                    F.floor(F.col("pos") / BITS_PER_WORD).cast("int").alias("w"),
                    F.element_at(
                        _mask_array(), (F.col("pos") % BITS_PER_WORD).cast("int") + 1
                    ).alias("bit"),
                )
                .groupBy("__file", "w")
                .agg(F.bit_or("bit").alias("word"))
            )
            # one fixed-width hex string per file: word i at chars
            # [16i, 16i+16) — point_lookup addresses words by substring,
            # so membership checks never parse the whole bitmap
            hexes = (
                words.groupBy("__file")
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("w", "word"))
                    ).alias("wm")
                )
                .select(
                    "__file",
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(n_words - 1)),
                            lambda i: F.lpad(
                                F.hex(
                                    F.coalesce(
                                        F.element_at(F.col("wm"), i), F.lit(0)
                                    )
                                ),
                                16,
                                "0",
                            ),
                        ),
                        "",
                    ).alias("words"),
                )
                .withColumn("col", F.lit(phys[c]))
            )
            frames.append(hexes)
        allb = frames[0]
        for f in frames[1:]:
            allb = allb.unionByName(f)
        manifest_path = F.when(
            F.col("__file").startswith(abs_root + "/"),
            F.col("__file").substr(F.lit(len(abs_root) + 2), F.length("__file")),
        ).otherwise(F.col("__file"))
        rel = f"_bloom/{uuid.uuid4().hex}"
        allb.select(manifest_path.alias("path"), "col", "words").repartition(
            1
        ).write.mode("errorifexists").parquet(os.path.join(self.root, rel))
        return self._commit(
            {
                "version": head + 1,
                "operation": "bloom-stats",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "bloom": {
                    "dir": rel,
                    "cols": [phys[c] for c in cols],
                    "m_bits": m_bits,
                    "k": k,
                    "salt": salt,
                    "built_at": head,
                },
                "txns": self._merged_txns(m, None),
            }
        )

    def point_lookup(
        self,
        col: str,
        values: Sequence,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Point-lookup read ``col IN values`` with TWO pruning layers:
        per-file [min,max] containment (free), then Bloom membership
        when :meth:`compute_bloom_stats` covered ``col`` — a file is
        read only if SOME probed value passes both.  On unordered
        high-cardinality keys min/max keeps everything and the bitmap
        does the real work; Bloom false positives only cost a wasted
        read (the exact ``IN`` re-filter runs on the survivors), false
        negatives cannot happen.  The prune is a Spark filter over the
        entries frame joined with the bitmap sidecar — only surviving
        paths reach the driver.  Returns (DataFrame, info) with
        ``files_total`` / ``files_read`` like :meth:`scan`."""
        import hashlib

        from ..operators.bloom import BITS_PER_WORD

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m = self._read_manifest(v)
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        if col not in {f.name for f in schema.fields}:
            raise ValueError(f"column {col!r} not in schema")
        values = list(values)
        if not values:
            raise ValueError("point_lookup needs at least one value")
        sk = {f.name: self._physical_name(f) for f in schema.fields}[col]
        col_type = {f.name: f.dataType.simpleString() for f in schema.fields}[col]
        ent = self._entries_frame(v)
        # layer 1: min/max containment, per probed value, OR'd
        smin = F.get_json_object("stats", f"$.{sk}.min")
        smax = F.get_json_object("stats", f"$.{sk}.max")
        if col_type in _INT_TYPES:
            smin_c, smax_c = smin.cast("bigint"), smax.cast("bigint")
            lits = [F.lit(int(x)) for x in values]
        elif col_type in _FLOAT_TYPES:
            smin_c, smax_c = smin.cast("double"), smax.cast("double")
            lits = [F.lit(float(x)) for x in values]
        else:
            smin_c, smax_c = smin, smax
            lits = [F.lit(str(_range_scalar(x))) for x in values]
        contains_any = F.lit(False)
        for x in lits:
            contains_any = contains_any | ((smin_c <= x) & (smax_c >= x))
        keep = F.when(smin.isNull(), F.lit(True)).otherwise(contains_any)
        # layer 2: Bloom membership (driver-computed bit positions —
        # values are few by definition of a point lookup — checked as
        # substring/conv expressions against the hex bitmap column)
        bloom = m.get("bloom")
        if bloom and sk in bloom["cols"]:
            mb, kk, salt = bloom["m_bits"], bloom["k"], bloom["salt"]
            bf = (
                self.spark.read.parquet(os.path.join(self.root, bloom["dir"]))
                .where(F.col("col") == sk)
                .select("path", "words")
            )
            ent = ent.join(bf, "path", "left")
            any_val = F.lit(False)
            for x in values:
                hx = hashlib.md5((str(x) + salt).encode()).hexdigest()
                h1, h2 = int(hx[0:15], 16), int(hx[15:30], 16)
                base, step = h1 % mb, h2 % (mb - 1) + 1
                all_bits = F.lit(True)
                for i in range(kk):
                    p = (base + i * step) % mb
                    w, b = p // BITS_PER_WORD, p % BITS_PER_WORD
                    word = F.conv(
                        F.substring("words", w * 16 + 1, 16), 16, 10
                    ).cast("long")
                    all_bits = all_bits & (word.bitwiseAND(F.lit(1 << b)) != 0)
                any_val = any_val | all_bits
            keep = keep & F.when(F.col("words").isNull(), F.lit(True)).otherwise(
                any_val
            )
        ent = ent.persist()
        try:
            total = ent.count()
            kept = [
                {"path": r["path"], "dv": json.loads(r["dv"]) if r["dv"] else None}
                for r in ent.where(keep).select("path", "dv").collect()
            ]
        finally:
            ent.unpersist()
        info = {"files_total": total, "files_read": len(kept), "version": v}
        if not kept:
            return self.spark.createDataFrame([], schema), info
        df = self._read_entries_data(schema, sorted(kept, key=lambda e: e["path"]))
        return df.where(F.col(col).isin(values)), info

    def changes(
        self,
        from_version: int | None = None,
        to_version: int | None = None,
        pk_cols: Sequence[str] | None = None,
        from_timestamp=None,
        to_timestamp=None,
    ) -> DataFrame:
        """Row-level change feed between two snapshots (the Delta CDF /
        Iceberg changelog read): every logical difference as a row
        tagged ``_change_type`` in {insert, update_preimage,
        update_postimage, delete}.

        File-pruned: a data file carried unchanged between the two
        versions CANNOT contribute a change, so only files dropped
        since ``from_version`` (old side) and files added by
        ``to_version`` (new side) are read — the churn is computed by
        joining the two entries frames, so only the CHANGED paths ever
        reach the driver.  A file's identity here is (path, deletion
        vector): a carried file whose VECTOR changed contributes its
        masked rows as deletes/updates, read with each side's own
        vector.  COW rewrite + MOR vectoring together guarantee the
        prune is sound: any row an operation touches lives in a
        rewritten file or under a changed vector.  Rows rewritten with
        identical values (COW copies sharing a file with real changes)
        are filtered out by a null-safe whole-row compare, so the feed
        is the LOGICAL diff.  Assumes ``pk_cols`` (default: the table's
        ``key_cols``) are unique per snapshot.  Either endpoint may be
        given as a timestamp instead of a version (Delta CDF's
        ``startingTimestamp``/``endingTimestamp``), resolved through
        :meth:`version_at`."""
        if from_timestamp is not None:
            if from_version is not None:
                raise ValueError("changes: from_version OR from_timestamp")
            from_version = self.version_at(from_timestamp)
        if to_timestamp is not None:
            if to_version is not None:
                raise ValueError("changes: to_version OR to_timestamp")
            to_version = self.version_at(to_timestamp)
        if from_version is None:
            raise ValueError("changes: pass from_version or from_timestamp")
        head = self._head()
        to_v = head if to_version is None else to_version
        mo = self._read_manifest(from_version)
        keys = list(pk_cols) if pk_cols else list(mo["key_cols"])
        if not keys:
            raise ValueError("changes() needs pk_cols (table has no key_cols)")
        from pyspark.sql.types import StringType, StructType

        schema = StructType.fromJson(mo["schema"])
        # StructType.add mutates in place — build the tagged schema from
        # a fresh parse so `schema` keeps the table's own columns
        out_schema = StructType.fromJson(mo["schema"]).add("_change_type", StringType())
        # ONE full-outer join computes both diff directions, so each
        # version's entries frame (checkpoint read + tail replay) is
        # evaluated once, not once per anti-join
        fo = self._entries_frame(from_version).select(
            "path", F.col("dv").alias("__odv"), F.lit(True).alias("__o")
        )
        fn = self._entries_frame(to_v).select(
            "path", F.col("dv").alias("__ndv"), F.lit(True).alias("__n")
        )
        churn = (
            fo.join(fn, "path", "full_outer")
            .where(
                F.col("__o").isNull()
                | F.col("__n").isNull()
                | ~F.col("__odv").eqNullSafe(F.col("__ndv"))
            )
            .select("path", "__o", "__n", "__odv", "__ndv")
            .collect()
        )
        removed = sorted(
            ({"path": r["path"], "dv": json.loads(r["__odv"]) if r["__odv"] else None}
             for r in churn if r["__o"] is not None),
            key=lambda e: e["path"],
        )
        added = sorted(
            ({"path": r["path"], "dv": json.loads(r["__ndv"]) if r["__ndv"] else None}
             for r in churn if r["__n"] is not None),
            key=lambda e: e["path"],
        )
        if not removed and not added:
            return self.spark.createDataFrame([], out_schema)
        cols = [f.name for f in schema.fields]
        nonkey = [c for c in cols if c not in keys]

        def _side(entries: list[dict]) -> DataFrame:
            if not entries:
                return self.spark.createDataFrame([], schema)
            # read through the from-version's schema: files predating an
            # add-columns commit NULL-backfill, files written after it
            # project down — the diff always compares the same columns,
            # and physical names (stable across renames) resolve files
            # written on either side of a rename commit; each side
            # applies ITS OWN deletion vector
            return self._read_entries_data(schema, entries).select(*cols)

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

    def commit_timestamp(self, version: int) -> float:
        """Epoch seconds the commit became visible.  Prefers the
        manifest's in-commit ``timestamp`` field (monotone by
        construction — see ``_publish``); tables written before the
        field existed fall back to the manifest file's mtime, the same
        degradation Delta applies to pre-in-commit-timestamp logs."""
        m = self._read_manifest(version)
        ts = m.get("timestamp")
        if ts is not None:
            return float(ts)
        return os.path.getmtime(self._manifest_path(version))

    def version_at(self, timestamp) -> int:
        """TIMESTAMP->VERSION resolution (Delta's ``timestampAsOf``):
        the latest retained version whose commit time is <= the given
        instant.  ``timestamp`` is epoch seconds, a ``datetime``/
        ``date``, or an ISO-8601 string.  Raises if the instant
        predates the earliest RETAINED commit (older manifests may be
        past the vacuum horizon) — asking for "the table before it
        existed" is an error, not an empty table.  mtime-fallback
        timestamps are folded through a running max so the walk is
        monotone even for legacy logs."""
        ts = _epoch_seconds(timestamp)
        versions = self._versions_on_disk()
        if not versions:
            raise FileNotFoundError(f"no committed version at {self.root}")
        best: int | None = None
        eff = float("-inf")
        for v in versions:
            eff = max(eff, self.commit_timestamp(v))
            if eff <= ts:
                best = v
            else:
                break
        if best is None:
            raise ValueError(
                f"timestamp {timestamp!r} predates the earliest retained "
                f"commit (version {versions[0]} at epoch {eff})"
            )
        return best

    def detail(self) -> dict:
        """DESCRIBE DETAIL: one dict of the table's operational state —
        head version, created/last-modified instants, file and row
        counts, and every table property (key columns, CHECK
        constraints, generated/identity maps, reader features, bloom
        sidecar, optimize watermark).  File/row counts come from one
        aggregation over the checkpointed entries frame, so the call
        is O(metadata), never a data scan."""
        head = self._head()
        m = self._read_manifest(head)
        versions = self._versions_on_disk()
        agg = self._entries_frame(head).agg(
            F.count(F.lit(1)).alias("nf"), F.sum("rows").alias("nr")
        ).first()
        return {
            "location": self.root,
            "version": head,
            "earliest_retained_version": versions[0] if versions else None,
            "created_at": self.commit_timestamp(versions[0]) if versions else None,
            "last_modified": self.commit_timestamp(head),
            "num_files": int(agg["nf"]),
            "num_rows": int(agg["nr"] or 0),
            "key_cols": list(m.get("key_cols") or ()),
            "constraints": dict(m.get("constraints") or {}),
            "generated": dict(m.get("generated") or {}),
            "identity": dict(m.get("identity") or {}),
            "features": list(m.get("features") or ()),
            "bloom": (m.get("bloom") or {}).get("dir"),
            "last_optimize": m.get("last_optimize"),
            "checkpoint_interval": self.checkpoint_interval,
        }

    def history(self) -> list[dict]:
        """Commit log, oldest RETAINED first: version/operation/file and
        row counts.  One forward replay over the retained manifests
        (seeded from the resolution of the earliest retained version),
        so the cost is O(total retained actions), not
        O(versions x files)."""
        out = []
        state: dict[str, dict] = {}
        for i, v in enumerate(self._versions_on_disk()):
            m = self._read_manifest(v)
            if i == 0:
                state = {e["path"]: e for e in self.entries(v)}
            else:
                state = self._apply_manifest(state, m)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "timestamp": m.get("timestamp")
                    or os.path.getmtime(self._manifest_path(v)),
                    "num_files": len(state),
                    "num_rows": sum(e["rows"] for e in state.values()),
                }
            )
        return out

    def append(
        self,
        df: DataFrame,
        max_retries: int = 10,
        txn: tuple[str, int] | None = None,
        schema_evolution: bool = False,
    ) -> int:
        """Append-only commit.  Commutes with concurrent appends, so a
        lost race rebases on the new head and retries.  The commit
        record is sized by THIS append's files — the table's existing
        file list is never rewritten into the log.

        ``schema_evolution=True``: extra frame columns auto-add to the
        schema in this commit (see :meth:`merge`); a concurrent schema
        change then aborts the rebase instead of clobbering it."""
        base = self.latest_version()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        m0 = self._read_manifest(base)
        if self._txn_already_applied(m0, txn):
            return base
        from pyspark.sql.types import StructType as _AST

        ident = m0.get("identity") or {}
        new_ident = None
        if ident:
            supplied = sorted(set(ident) & set(df.columns))
            if supplied:
                raise ValueError(
                    f"identity columns {supplied} are allocated by the table "
                    "on append — remove them from the frame (use merge to "
                    "carry explicit values)"
                )
            df, counts = self._assign_identity(df, ident)
            new_ident = {
                c: {**spec, "hwm": int(spec["hwm"]) + counts[c]}
                for c, spec in ident.items()
            }
        self._enforce_constraints(df, m0, "append")
        wschema = _AST.fromJson(m0["schema"])
        evolved_json = None
        if schema_evolution:
            evolved = self._evolve_schema(wschema, df)
            if evolved is not wschema:
                wschema = evolved
                evolved_json = wschema.jsonValue()
        new_files = self._write_data_files(
            df, m0["key_cols"], schema=wschema, generated=m0.get("generated")
        )
        for _ in range(max_retries):
            head = self.latest_version()
            m = self._read_manifest(head)
            if self._txn_already_applied(m, txn):
                return head  # replayed batch landed concurrently
            if (m.get("constraints") or {}) != (m0.get("constraints") or {}):
                # a concurrent writer changed the CHECK constraints under
                # this append — the rows were validated against the OLD
                # set; re-enforce against the new head's set (on the
                # already-written files, the exact bytes committing) or
                # the constraint would be silently inherited unvalidated
                self._enforce_constraints(
                    self._read_data(
                        _AST.fromJson(m["schema"]),
                        [os.path.join(self.root, e["path"]) for e in new_files],
                    ),
                    m,
                    "append (rebased onto concurrently changed constraints)",
                )
                m0 = m
            if evolved_json is not None and m["schema"] != self._read_manifest(
                base
            )["schema"]:
                # an evolving append publishing over a concurrent schema
                # change could clobber it (or be clobbered) — abort
                # rather than guess a three-way schema merge
                raise ConcurrentWriteError(
                    "schema changed concurrently under a schema-evolving append"
                )
            if ident and (m.get("identity") or {}) != (m0.get("identity") or {}):
                # a concurrent commit moved the identity high-water mark:
                # the ids this batch allocated from the OLD mark would
                # duplicate the winner's — Delta-style metadata conflict,
                # abort instead of issuing duplicate ids
                raise ConcurrentWriteError(
                    "identity allocation conflict: another writer consumed "
                    "ids concurrently — retry the append"
                )
            commit_manifest = {
                "version": head + 1,
                "operation": "append",
                "schema": evolved_json or m["schema"],
                "key_cols": m["key_cols"],
                "add": new_files,
                "remove": [],
                "txns": self._merged_txns(m, txn),
            }
            if new_ident is not None:
                commit_manifest["identity"] = new_ident
            try:
                return self._commit(commit_manifest)
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(f"append lost {max_retries} straight races")

    def overwrite(self, df: DataFrame, txn: tuple[str, int] | None = None) -> int:
        head = self._head()
        m = self._read_manifest(head)
        if self._txn_already_applied(m, txn):
            return head
        # identity tables: an overwrite is a full-replacement insert
        # batch — allocate fresh ids continuing from the LATCHED mark
        # (Delta identity never resets), rejecting supplied values like
        # append; without this the commit's df-derived schema would
        # silently drop the identity column while the property carries
        # forward, bricking every later append
        ident = m.get("identity") or {}
        new_ident = None
        if ident:
            supplied = sorted(set(ident) & set(df.columns))
            if supplied:
                raise ValueError(
                    f"identity columns {supplied} are allocated by the table "
                    "on overwrite — remove them from the frame"
                )
            df, counts = self._assign_identity(df, ident)
            new_ident = {
                c: {**spec, "hwm": int(spec["hwm"]) + counts[c]}
                for c, spec in ident.items()
            }
        # compute/validate generated columns HERE (the manifest schema
        # below must include them) and skip _write_data_files'
        # re-validation — a second full-frame probe at 100 TB
        gen = m.get("generated") or {}
        df = self._apply_generated(df, gen)
        self._enforce_constraints(df, m, "overwrite")
        files = self._write_data_files(
            df,
            list(m["key_cols"]) + [c for c in gen if c not in m["key_cols"]],
        )
        manifest = {
            "version": head + 1,
            "operation": "overwrite",
            "schema": df.schema.jsonValue(),
            "key_cols": m["key_cols"],
            "reset": True,
            "add": files,
            "txns": self._merged_txns(m, txn),
        }
        if new_ident is not None:
            manifest["identity"] = new_ident
        return self._commit(manifest)

    def _probe_touched(
        self,
        head: int,
        keys_df: DataFrame,
        probe_col: str,
        key_type: str,
        recompute_frac: float | None,
        stats_key: str | None = None,
    ) -> tuple[list[dict], int, list[dict] | None]:
        """Which data files can contain any of ``keys_df``'s keys, by
        joining the keys against the checkpointed entries frame's
        [min,max] stats on ``probe_col`` — one keys-side aggregation,
        zero base-table I/O for skipped files, and only the HIT paths
        return to the driver.  Files without stats are conservatively
        flagged.  Returns ``(touched, total_files, all_entries)`` where
        ``all_entries`` is non-None only when ``recompute_frac`` is
        given and exceeded (the caller should then prefer a full
        recompute).  Touched/all results are ENTRY dicts carrying each
        file's live-row count and deletion-vector reference, so the
        caller's rewrite path applies vectors and the MOR split can
        compute match fractions."""
        sk = stats_key or probe_col
        ent = self._entries_frame(head).persist()

        def _ent(r) -> dict:
            e = {"path": r["path"], "rows": r["rows"]}
            if r["dv"]:
                e["dv"] = json.loads(r["dv"])
            return e

        try:
            total_files = ent.count()
            smin = F.get_json_object("stats", f"$.{sk}.min")
            smax = F.get_json_object("stats", f"$.{sk}.max")
            unranged = [
                _ent(r)
                for r in ent.where(smin.isNull())
                .select("path", "rows", "dv")
                .collect()
            ]
            ranged = ent.where(smin.isNotNull()).select(
                "path",
                "rows",
                "dv",
                smin.cast(key_type).alias("__min"),
                smax.cast(key_type).alias("__max"),
            )
            hits = (
                keys_df.select(F.col(probe_col).alias("__k"))
                .join(
                    F.broadcast(ranged),
                    (F.col("__k") >= F.col("__min")) & (F.col("__k") <= F.col("__max")),
                    "inner",
                )
                .select("path", "rows", "dv")
                .distinct()
                .collect()
            )
            by_path = {r["path"]: _ent(r) for r in hits}
            for e in unranged:
                by_path[e["path"]] = e
            touched = [by_path[p] for p in sorted(by_path)]
            all_entries = None
            if (
                recompute_frac is not None
                and total_files
                and len(touched) / total_files > recompute_frac
            ):
                # recompute will read the full snapshot — recover the
                # entry list from the ALREADY-resolved cached frame
                # instead of re-running the whole checkpoint+tail
                # resolution
                all_entries = [
                    _ent(r) for r in ent.select("path", "rows", "dv").collect()
                ]
        finally:
            ent.unpersist()
        return touched, total_files, all_entries

    def merge(
        self,
        delta: DataFrame,
        pk_cols: Sequence[str],
        txn: tuple[str, int] | None = None,
        recompute_frac: float = 0.6,
        dv_frac: float | None = None,
        schema_evolution: bool = False,
    ) -> int:
        """MERGE: delta rows replace matching-PK rows, unmatched delta
        rows insert.  Touched files whose matched fraction falls below
        ``dv_frac`` take the MERGE-ON-READ path (deletion vector masks
        the replaced rows, the delta lands as new files — no base data
        rewritten); the rest rewrite copy-on-write.  ``dv_frac=0``
        forces pure COW.

        ``schema_evolution=True`` (Delta's ``mergeSchema``): EXTRA
        delta columns auto-add to the table schema inside THIS commit
        (nullable, fresh physical names) — existing files NULL-backfill
        them at read time, nothing rewrites.  Off by default: a typo'd
        column should fail loudly, not fork the schema.

        File pruning: a data file must be rewritten only if its stats
        range on ``pk_cols[0]`` can contain some delta key.  The probe
        joins the delta against the checkpointed entries frame's
        [min,max] ranges — one delta-side aggregation, zero base-table
        I/O for skipped files, and only the HIT paths return to the
        driver.  Files without stats are conservatively rewritten.

        Adaptive strategy: when the probe shows the delta touching more
        than ``recompute_frac`` of the data files (a key spread uniform
        over the key space — BASELINE.md round-4b measures COW losing
        outright there: every file rewritten anyway, but fragmented),
        the merge switches to a full recompute — one anti-join +
        union, range-partitioned back into the same file count so
        per-file stats stay tight — committed as a reset.  Set
        ``recompute_frac=1.0`` to force pure COW.
        """
        head = self._head()
        m = self._read_manifest(head)
        if self._txn_already_applied(m, txn):
            return head
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
        self._enforce_constraints(delta, m, "merge delta")
        # generated columns compute on the delta HERE, not just at the
        # write: the rewrite path unions delta rows with existing-file
        # rows (allowMissingColumns), which would NULL-fill an absent
        # generated column and trip validation on the mixed frame
        delta = self._apply_generated(delta, m.get("generated"))

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        if schema_evolution:
            evolved = self._evolve_schema(schema, delta)
            if evolved is not schema:
                schema = evolved
                m = {**m, "schema": schema.jsonValue()}
        stats_key = {
            f.name: self._physical_name(f) for f in schema.fields
        }.get(probe_col, probe_col)
        touched, total_files, all_entries = self._probe_touched(
            head, delta, probe_col, dict(delta.dtypes)[probe_col], recompute_frac,
            stats_key=stats_key,
        )

        delta_keys = delta.select(*keys).dropDuplicates(keys)
        if all_entries is not None:
            # recompute: the COW path would rewrite nearly everything
            # anyway; one clean range-partitioned pass wins (and resets
            # the layout — deletion vectors included — so the NEXT
            # narrow delta prunes well again)
            snap = self._read_entries_data(schema, all_entries)
            merged = snap.join(delta_keys, keys, "left_anti").unionByName(
                delta, allowMissingColumns=True
            )
            merged = merged.repartitionByRange(
                max(total_files, 1), probe_col
            ).sortWithinPartitions(probe_col)
            files = self._write_data_files(
                merged,
                m["key_cols"],
                schema=schema,
                generated=m.get("generated"),
                validate_generated=False,
            )
            return self._commit(
                {
                    "version": head + 1,
                    "operation": "merge-recompute",
                    "schema": m["schema"],
                    "key_cols": m["key_cols"],
                    "reset": True,
                    "add": files,
                    "txns": self._merged_txns(m, txn),
                }
            )

        frac = self.DEFAULT_DV_FRAC if dv_frac is None else dv_frac
        empty, dv_actions, rewrite = ([], [], [])
        if touched:
            empty, dv_actions, rewrite = self._mor_split(
                schema,
                touched,
                lambda df: df.join(delta_keys, keys, "left_semi"),
                frac,
            )
        if rewrite:
            # manifest schema, not file schema: files predating an
            # add-columns commit NULL-backfill the late columns
            affected = self._read_entries_data(schema, rewrite)
            # allowMissingColumns: after an add-columns evolution a delta
            # carrying the pre-evolution shape NULL-fills the late columns
            # (Delta MERGE full-row-replace semantics) — without it the
            # same merge would fail or succeed depending on whether file
            # pruning happened to rewrite anything
            merged = affected.join(delta_keys, keys, "left_anti").unionByName(
                delta, allowMissingColumns=True
            )
        else:
            # matched base rows (if any) were handled by deletion
            # vectors / whole-file drops; the delta lands as new files
            merged = delta
        new_files = self._write_data_files(
            merged,
            m["key_cols"],
            schema=schema,
            generated=m.get("generated"),
            validate_generated=False,
        )
        manifest = {
            "version": head + 1,
            "operation": "merge",
            "schema": m["schema"],
            "key_cols": m["key_cols"],
            "add": new_files,
            "remove": empty + [e["path"] for e in rewrite],
            "dv": dv_actions,
            "txns": self._merged_txns(m, txn),
        }
        return self._commit_cow_with_rebase(
            manifest, delta_keys, probe_col, dict(delta.dtypes)[probe_col], txn,
            stats_key=stats_key,
        )

    def _commit_cow_with_rebase(
        self,
        manifest: dict,
        keys_df: DataFrame,
        probe_col: str,
        key_type: str,
        txn: tuple[str, int] | None,
        stats_key: str | None = None,
    ) -> int:
        """Publish a COW manifest with optimistic concurrency and LOGICAL
        conflict detection (the Delta model): a lost publish race rebases
        onto the new head when every intervening commit is an APPEND
        whose files cannot contain any of ``keys_df``'s keys (per-key
        stats check) — the prepared result is then still correct at the
        new head, because appends removed nothing and hold none of the
        written PKs.  Any other intervening operation (or a key-range
        hit, or missing stats) aborts, preserving serializability.
        Reset commits must NOT use this: a rebase would drop the
        concurrent appends' files from the republished snapshot."""
        op = manifest["operation"]
        for _ in range(10):
            try:
                return self._commit(manifest)
            except ConcurrentWriteError:
                new_head = self._head()
                m2 = self._read_manifest(new_head)
                if self._txn_already_applied(m2, txn):
                    return new_head
                if self._appends_conflict(
                    manifest["version"] - 1, new_head, keys_df, probe_col, key_type,
                    stats_key=stats_key,
                ):
                    raise
                manifest = {
                    **manifest,
                    "version": new_head + 1,
                    "txns": self._merged_txns(m2, txn),
                }
        raise ConcurrentWriteError(f"{op} lost 10 straight publish races")

    def _appends_conflict(
        self,
        base_head: int,
        new_head: int,
        keys_df: DataFrame,
        probe_col: str,
        key_type: str,
        stats_key: str | None = None,
    ) -> bool:
        """True unless every commit in (base_head, new_head] is a pure
        append whose files' [min,max] stats on ``probe_col`` contain NO
        key from ``keys_df``.  Conservative: missing stats or any
        non-append operation counts as a conflict."""
        try:
            base_schema = self._read_manifest(base_head)["schema"]
        except FileNotFoundError:
            return True
        appended = []
        for v in range(base_head + 1, new_head + 1):
            try:
                mv = self._read_manifest(v)
            except FileNotFoundError:
                return True
            if mv.get("operation") != "append" or mv.get("remove") or mv.get("reset"):
                return True
            if mv["schema"] != base_schema:
                # a concurrent schema-evolving append: republishing our
                # manifest would clobber its added columns — abort
                return True
            appended.extend(mv.get("add", []))
        if not appended:
            return False
        rows = []
        sk = stats_key or probe_col
        for e in appended:
            st = (e.get("stats") or {}).get(sk)
            if not st or st.get("min") is None:
                return True  # no stats: cannot prove disjointness
            rows.append((str(_range_scalar(st["min"])), str(_range_scalar(st["max"]))))
        rng = self.spark.createDataFrame(rows, "mn string, mx string").select(
            F.col("mn").cast(key_type).alias("__min"),
            F.col("mx").cast(key_type).alias("__max"),
        )
        hit = (
            keys_df.select(F.col(probe_col).alias("__k"))
            .join(
                F.broadcast(rng),
                (F.col("__k") >= F.col("__min")) & (F.col("__k") <= F.col("__max")),
                "inner",
            )
            .limit(1)
            .count()
        )
        return hit > 0

    def apply_cdc(
        self,
        feed: DataFrame,
        pk_cols: Sequence[str] | None = None,
        txn: tuple[str, int] | None = None,
        recompute_frac: float = 0.6,
        dv_frac: float | None = None,
    ) -> int:
        """Apply a row-level change feed (the output of :meth:`changes`
        on another table) to THIS table in ONE commit — the replication
        consumer: inserts and update_postimages upsert, deletes remove,
        update_preimages are ignored (their keys arrive via the
        postimage).  Applying the feed ``changes(v_from, v_to)`` to a
        replica at ``v_from`` makes it row-identical to the source at
        ``v_to``.

        Scale shape matches :meth:`merge`: ONE stats-range probe over
        the union of upsert+delete keys decides which files rewrite
        (zero I/O for the untouched bulk), the COW rewrite anti-joins
        the change keys and unions the upserts, and the same adaptive
        full-recompute fallback takes over when the feed's key spread
        defeats pruning.  A single commit keeps replication atomic and
        lets an ``(app, batch)`` writer transaction make it idempotent
        under replays — the exactly-once chain extends from the stream
        sink through to downstream replicas."""
        head = self._head()
        m = self._read_manifest(head)
        if self._txn_already_applied(m, txn):
            return head
        keys = list(pk_cols) if pk_cols else list(m["key_cols"])
        if not keys:
            raise ValueError("apply_cdc needs pk_cols (table has no key_cols)")
        probe_col = keys[0]
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        cols = [f.name for f in schema.fields]
        ups = feed.where(
            F.col("_change_type").isin("insert", "update_postimage")
        )
        ups = self._apply_generated(ups, m.get("generated")).select(*cols)
        dup = ups.groupBy(*keys).count().where("count > 1").limit(1).count()
        if dup:
            raise ValueError(
                f"apply_cdc feed contains duplicate upsert rows for pk {keys}; "
                "a net changes() feed never does — compact the feed first"
            )
        self._enforce_constraints(ups, m, "apply_cdc upserts")
        change_keys = (
            feed.where(F.col("_change_type") != "update_preimage")
            .select(*keys)
            .dropDuplicates(keys)
        )
        stats_key = {
            f.name: self._physical_name(f) for f in schema.fields
        }.get(probe_col, probe_col)
        touched, total_files, all_entries = self._probe_touched(
            head, change_keys, probe_col, dict(change_keys.dtypes)[probe_col],
            recompute_frac, stats_key=stats_key,
        )
        if all_entries is not None:
            snap = self._read_entries_data(schema, all_entries)
            merged = snap.join(change_keys, keys, "left_anti").unionByName(ups)
            merged = merged.repartitionByRange(
                max(total_files, 1), probe_col
            ).sortWithinPartitions(probe_col)
            files = self._write_data_files(
                merged,
                m["key_cols"],
                schema=schema,
                generated=m.get("generated"),
                validate_generated=False,
            )
            return self._commit(
                {
                    "version": head + 1,
                    "operation": "apply_cdc-recompute",
                    "schema": m["schema"],
                    "key_cols": m["key_cols"],
                    "reset": True,
                    "add": files,
                    "txns": self._merged_txns(m, txn),
                }
            )
        frac = self.DEFAULT_DV_FRAC if dv_frac is None else dv_frac
        empty, dv_actions, rewrite = ([], [], [])
        if touched:
            empty, dv_actions, rewrite = self._mor_split(
                schema,
                touched,
                lambda df: df.join(change_keys, keys, "left_semi"),
                frac,
            )
        if rewrite:
            affected = self._read_entries_data(schema, rewrite)
            merged = affected.join(change_keys, keys, "left_anti").unionByName(ups)
        else:
            merged = ups
        new_files = self._write_data_files(
            merged,
            m["key_cols"],
            schema=schema,
            generated=m.get("generated"),
            validate_generated=False,
        )
        # same rebase-over-disjoint-appends concurrency as merge
        return self._commit_cow_with_rebase(
            {
                "version": head + 1,
                "operation": "apply_cdc",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": new_files,
                "remove": empty + [e["path"] for e in rewrite],
                "dv": dv_actions,
                "txns": self._merged_txns(m, txn),
            },
            change_keys,
            probe_col,
            dict(change_keys.dtypes)[probe_col],
            txn,
            stats_key=stats_key,
        )

    def restore(self, version: int | None = None, timestamp=None) -> int:
        """RESTORE TABLE TO VERSION (or TO TIMESTAMP, resolved through
        :meth:`version_at` — exactly one selector): publish a new
        commit whose file set
        (and schema) is exactly that of ``version`` — a metadata-only
        rollback, no data file read or written (Delta's RESTORE).  The
        rolled-back history stays retained and time-travelable; the
        restore itself is one more commit, so it is undoable the same
        way.  Requires ``version`` to still be resolvable (not past a
        vacuum horizon)."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("restore: pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        if version is None:
            raise ValueError("restore: pass a version or a timestamp")
        head = self._head()
        target = self._read_manifest(version)
        new_v = head + 1
        owner = uuid.uuid4().hex
        # the restored file set goes to disk as a checkpoint parquet by
        # a DISTRIBUTED write (never a driver-held list or an O(files)
        # JSON manifest); the manifest only claims ownership of it
        self._write_owned_checkpoint(new_v, self._entries_frame(version), owner)
        manifest = {
            "version": new_v,
            "operation": "restore",
            "schema": target["schema"],
            "key_cols": target["key_cols"],
            "reset": True,
            "add": [],
            "checkpoint_owner": owner,
            # restore METADATA with the data (Delta's RESTORE): the
            # target version's constraints, not the current head's — a
            # head constraint added after `version` was never validated
            # against the restored rows, so inheriting it could publish
            # head data that violates an "active" constraint.  Explicit
            # (even when empty) so _publish's carry-forward never fires.
            "constraints": dict(target.get("constraints") or {}),
            "generated": dict(target.get("generated") or {}),
            "txns": self._merged_txns(self._read_manifest(head), None),
        }
        try:
            v = self._publish(manifest)
        except ConcurrentWriteError:
            # the staged dir is owner-unique, so removing it can never
            # touch the winner's file set
            shutil.rmtree(self._checkpoint_dir(new_v, owner), ignore_errors=True)
            raise
        self._advance_hint(v)
        return v

    def clone_to(
        self,
        dest_root: str,
        version: int | None = None,
        checkpoint_interval: int | None = None,
    ) -> "AcidTable":
        """Shallow CLONE (Delta's CREATE TABLE ... SHALLOW CLONE): a new
        table whose version 0 references this snapshot's data files by
        ABSOLUTE path — metadata-only, zero data bytes copied, O(files)
        regardless of table size.  The dev/test-sandbox story at 100 TB:
        fork the production table in milliseconds, run destructive
        experiments, throw the fork away.

        The clone evolves independently afterwards: COW rewrites land
        under the clone's own root and simply DROP references to source
        files (never deleting them — vacuum only ever removes files
        under its own root, so a clone cannot damage its source), and
        ``compact`` localizes the clone entirely.  Contract shared with
        Delta: vacuuming the SOURCE can break a clone that still
        references the vacuumed files — localize with ``compact`` before
        source vacuums tighter than the clone's age."""
        v = self._head() if version is None else version
        m = self._read_manifest(v)
        abs_root = os.path.abspath(self.root)
        # absolute-path rewrite as a COLUMN transform over the entries
        # frame — already-absolute paths (a clone of a clone) pass
        # through, mirroring os.path.join semantics.  Deletion-vector
        # references absolutize the same way: the clone must keep
        # reading the SOURCE's sidecars until its own writes replace
        # them (vector payload rows stay source-relative — _dv_frame
        # anchors them at the sidecar dir's own root).
        dvp = F.get_json_object("dv", "$.path")
        abs_dvp = F.when(dvp.startswith("/"), dvp).otherwise(
            F.concat(F.lit(abs_root + "/"), dvp)
        )
        ent = (
            self._entries_frame(v)
            .withColumn(
                "path",
                F.when(
                    F.col("path").startswith("/"), F.col("path")
                ).otherwise(F.concat(F.lit(abs_root + "/"), F.col("path"))),
            )
            .withColumn(
                "dv",
                F.when(F.col("dv").isNull(), F.lit(None).cast("string")).otherwise(
                    F.to_json(
                        F.struct(
                            abs_dvp.alias("path"),
                            F.get_json_object("dv", "$.deleted")
                            .cast("long")
                            .alias("deleted"),
                        )
                    )
                ),
            )
        )
        dest = AcidTable(
            self.spark,
            dest_root,
            checkpoint_interval=(
                self.checkpoint_interval
                if checkpoint_interval is None
                else checkpoint_interval
            ),
        )
        if dest.latest_version() is not None:
            raise FileExistsError(f"clone target {dest_root} already exists")
        owner = uuid.uuid4().hex
        dest._write_owned_checkpoint(0, ent, owner)
        try:
            dest._publish(
                {
                    "version": 0,
                    "operation": "clone",
                    "source": self.root,
                    "source_version": v,
                    "schema": m["schema"],
                    "key_cols": m["key_cols"],
                    "reset": True,
                    "add": [],
                    "checkpoint_owner": owner,
                    # table properties copy with the clone (Delta parity)
                    "constraints": dict(m.get("constraints") or {}),
                    "generated": dict(m.get("generated") or {}),
                    "identity": dict(m.get("identity") or {}),
                    # the cloned file set can reference structures (e.g.
                    # deletion vectors) only visible in the source's
                    # checkpoint, so the source's reader features copy
                    # explicitly — derivation alone can't see them
                    "features": sorted(set(m.get("features") or ())),
                    "txns": {},
                }
            )
        except ConcurrentWriteError as e:
            # owner-unique staging dir: this can only ever remove OUR
            # staged file set, never a racing clone winner's
            shutil.rmtree(dest._checkpoint_dir(0, owner), ignore_errors=True)
            raise FileExistsError(f"clone target {dest_root} already exists") from e
        dest._advance_hint(0)
        return dest

    def _mor_split(
        self,
        schema,
        entries: Sequence[dict],
        match_rows,
        dv_frac: float,
    ):
        """Merge-on-read core shared by delete / overwrite_where /
        merge / apply_cdc.  ``match_rows(df) -> df`` filters a
        row-identity read (``__file``/``__pos`` present, existing
        vectors already applied) down to the rows being REMOVED.  One
        scan of ``entries`` classifies every file by its live-match
        fraction:

        - 0 matches      -> CARRY: no manifest action at all (the probe
          was conservative; previously such files were rewritten
          byte-identically for nothing)
        - all rows match -> EMPTY: pure ``remove`` action, no rewrite
        - fraction <= ``dv_frac`` -> DELETION VECTOR: the matched
          positions (unioned with the file's previous vector —
          cumulative replacement) land in one new sidecar dir; the
          manifest gets a ``dv`` action per file
        - else           -> REWRITE: returned for the caller's COW pass

        Returns ``(empty_paths, dv_actions, rewrite_entries)``."""
        abs_root = os.path.abspath(self.root)
        tdf = self._read_entries_data(schema, entries, keep_meta=True)
        matches = match_rows(tdf).select("__file", "__pos").persist()
        try:
            counts = {
                r["__file"]: r["cnt"]
                for r in matches.groupBy("__file")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()  # bounded by files CONTAINING matches
            }
            empty: list[str] = []
            dv_files: list[tuple[str, dict, int]] = []
            rewrite: list[dict] = []
            for e in entries:
                a = self._abs_path(e["path"])
                mcount = counts.get(a, 0)
                if mcount == 0:
                    continue  # carried forward implicitly
                if mcount >= e["rows"]:
                    empty.append(e["path"])
                elif dv_frac > 0 and mcount / e["rows"] <= dv_frac:
                    dv_files.append((a, e, mcount))
                else:
                    rewrite.append(e)
            dv_actions: list[dict] = []
            if dv_files:
                dv_rel = f"dv/{uuid.uuid4().hex}"
                sel = self.spark.createDataFrame(
                    [(a,) for a, _, _ in dv_files], "__file string"
                )
                pos_frames = [matches.join(F.broadcast(sel), "__file", "left_semi")]
                # cumulative replacement: the new vector carries every
                # PREVIOUSLY deleted position of each re-vectored file
                olds = [(a, e) for a, e, _ in dv_files if e.get("dv")]
                if olds:
                    odv = self._dv_frame(
                        [self._abs_path(e["dv"]["path"]) for _, e in olds]
                    )
                    osel = self.spark.createDataFrame(
                        [(a,) for a, _ in olds], "__file string"
                    )
                    pos_frames.append(
                        odv.join(F.broadcast(osel), "__file", "left_semi")
                    )
                allpos = pos_frames[0]
                for f in pos_frames[1:]:
                    allpos = allpos.unionByName(f)
                # store each row keyed by the entry's MANIFEST path form
                # (root-relative when under this root, absolute for
                # clone-source files) so the table stays relocatable
                manifest_path = F.when(
                    F.col("__file").startswith(abs_root + "/"),
                    F.col("__file").substr(F.lit(len(abs_root) + 2), F.length("__file")),
                ).otherwise(F.col("__file"))
                out = allpos.select(
                    manifest_path.alias("path"), F.col("__pos").alias("pos")
                ).repartition(max(1, min(len(dv_files), 32)), "path")
                out.write.mode("errorifexists").parquet(
                    os.path.join(self.root, dv_rel)
                )
                for _, e, mcount in dv_files:
                    prior = (e.get("dv") or {}).get("deleted", 0)
                    dv_actions.append(
                        {
                            "path": e["path"],
                            "rows": e["rows"] - mcount,
                            "dv": {"path": dv_rel, "deleted": prior + mcount},
                        }
                    )
        finally:
            matches.unpersist()
        return empty, dv_actions, rewrite

    def delete(self, predicate: str, dv_frac: float | None = None) -> int:
        """Merge-on-read DELETE: files where the matches fall below
        ``dv_frac`` of live rows get a deletion-vector sidecar (no data
        bytes rewritten — the 100 TB point-delete path); files above it
        rewrite copy-on-write without the matching rows; fully-matched
        files simply drop.  ``dv_frac=0`` forces pure COW."""
        head = self._head()
        m = self._read_manifest(head)
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        frac = self.DEFAULT_DV_FRAC if dv_frac is None else dv_frac
        empty, dv_actions, rewrite = self._mor_split(
            schema, self.entries(head), lambda df: df.where(predicate), frac
        )
        new_files = []
        if rewrite:
            # IS NOT TRUE, not NOT(...): under three-valued logic a row
            # where the predicate evaluates to NULL matches neither the
            # delete nor its bare negation — it must be KEPT, not
            # silently dropped from the rewrite
            kept = self._read_entries_data(schema, rewrite).where(
                f"({predicate}) IS NOT TRUE"
            )
            new_files = self._write_data_files(
                kept,
                m["key_cols"],
                schema=schema,
                generated=m.get("generated"),
                validate_generated=False,
            )
        return self._commit(
            {
                "version": head + 1,
                "operation": "delete",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": new_files,
                "remove": empty + [e["path"] for e in rewrite],
                "dv": dv_actions,
                "txns": self._merged_txns(m, None),
            }
        )

    def overwrite_where(
        self,
        df: DataFrame,
        predicate: str,
        txn: tuple[str, int] | None = None,
        dv_frac: float | None = None,
    ) -> int:
        """Delta's ``replaceWhere``: atomically replace EXACTLY the rows
        matching ``predicate`` with ``df`` — the backfill primitive at
        100 TB (recompute one day / one partition / one tenant and swap
        it in; readers see the old slice or the new one, never a mix,
        and never a torn table like rewrite-in-place gives).

        ``df`` is VALIDATED against the predicate first: a replacement
        row outside the slice would otherwise survive ALONGSIDE the
        data it was meant to replace — the classic silent-backfill
        corruption Delta guards against (one delta-sized limit-1 job).

        COW shape shared with :meth:`delete`: untouched files carry
        forward implicitly; files straddling the predicate rewrite
        without their matching rows; the commit is ONE manifest with
        both the removes and the adds.  ``txn`` gives streaming sinks
        the usual exactly-once replay guard."""
        head = self._head()
        m = self._read_manifest(head)
        if self._txn_already_applied(m, txn):
            return head
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        bad = df.where(f"({predicate}) IS NOT TRUE").limit(1).count()
        if bad:
            raise ValueError(
                "overwrite_where: replacement rows exist outside the "
                f"predicate {predicate!r} — they would silently survive "
                "alongside the rows they were meant to replace"
            )
        self._enforce_constraints(df, m, "overwrite_where replacement")
        frac = self.DEFAULT_DV_FRAC if dv_frac is None else dv_frac
        empty, dv_actions, rewrite = self._mor_split(
            schema, self.entries(head), lambda d: d.where(predicate), frac
        )
        rewrite_files = []
        if rewrite:
            kept = self._read_entries_data(schema, rewrite).where(
                f"({predicate}) IS NOT TRUE"
            )
            rewrite_files = self._write_data_files(
                kept,
                m["key_cols"],
                schema=schema,
                generated=m.get("generated"),
                validate_generated=False,
            )
        new_files = self._write_data_files(
            df, m["key_cols"], schema=schema, generated=m.get("generated")
        )
        return self._commit(
            {
                "version": head + 1,
                "operation": "overwrite-where",
                "predicate": predicate,
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": rewrite_files + new_files,
                "remove": empty + [e["path"] for e in rewrite],
                "dv": dv_actions,
                "txns": self._merged_txns(m, txn),
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
        rewriting the table to add a column.

        Each added column gets a FRESH physical storage name
        (``c_<hex>``, recorded in the field metadata): if a column of
        the same logical name was previously dropped, old files still
        carry its physical column, and reusing the name would resurrect
        the stale values (the Delta/Iceberg column-mapping hazard)."""
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        head = self._head()
        m = self._read_manifest(head)
        schema = StructType.fromJson(m["schema"])
        existing = {f.name.lower() for f in schema.fields}
        for name, ddl in new_cols.items():
            # case-insensitive: Spark's default resolution would make a
            # same-name-different-case pair ambiguous everywhere
            if name.lower() in existing:
                raise ValueError(f"column {name!r} already exists")
            existing.add(name.lower())
            schema = StructType(
                [
                    *schema.fields,
                    StructField(
                        name,
                        _parse_datatype_string(ddl),
                        True,
                        {"physical_name": f"c_{uuid.uuid4().hex[:12]}"},
                    ),
                ]
            )
        return self._commit(
            {
                "version": head + 1,
                "operation": "add-columns",
                "schema": schema.jsonValue(),
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "txns": self._merged_txns(m, None),
            }
        )

    # widenings the parquet reader performs losslessly at scan time
    # (probed on this Spark build; Delta's type-widening table feature
    # allows the same set): the integer chain, float->double, and
    # same-scale decimal precision growth
    _INT_WIDEN_ORDER = ["tinyint", "smallint", "int", "bigint"]

    def widen_column(self, name: str, new_type: str) -> int:
        """Type widening as a METADATA-ONLY commit — no data file is
        rewritten (Delta's type-widening feature): the manifest schema
        changes, and every existing file's narrower physical type
        upcasts at read time (int32 pages read through a bigint schema
        — verified native on this Spark build).  Allowed: the integer
        chain (tinyint→smallint→int→bigint), float→double, and
        decimal(p,s)→decimal(p',s) with p'>=p.  Anything else (lossy,
        reordering, or cross-family) is refused — that's a rewrite,
        not a metadata change.  Time travel keeps the old type; stats
        min/max strings re-cast through the new type transparently."""
        import re as _re

        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        head = self._head()
        m = self._read_manifest(head)
        schema = StructType.fromJson(m["schema"])
        by_name = {f.name: f for f in schema.fields}
        if name not in by_name:
            raise ValueError(f"column {name!r} does not exist")
        old = by_name[name].dataType.simpleString()
        new = _parse_datatype_string(new_type).simpleString()
        ok = False
        if old in self._INT_WIDEN_ORDER and new in self._INT_WIDEN_ORDER:
            ok = self._INT_WIDEN_ORDER.index(new) > self._INT_WIDEN_ORDER.index(old)
        elif old == "float" and new == "double":
            ok = True
        else:
            mo = _re.fullmatch(r"decimal\((\d+),(\d+)\)", old)
            mn = _re.fullmatch(r"decimal\((\d+),(\d+)\)", new)
            if mo and mn and mo.group(2) == mn.group(2):
                ok = int(mn.group(1)) >= int(mo.group(1))
        if not ok:
            raise ValueError(
                f"cannot widen {name!r} from {old} to {new}: only lossless "
                "read-compatible widenings (int chain, float->double, "
                "same-scale decimal precision) are metadata-only"
            )
        fields = [
            StructField(
                f.name,
                _parse_datatype_string(new) if f.name == name else f.dataType,
                f.nullable,
                f.metadata,
            )
            for f in schema.fields
        ]
        return self._commit(
            {
                "version": head + 1,
                "operation": "widen-column",
                "schema": StructType(fields).jsonValue(),
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "txns": self._merged_txns(m, None),
            }
        )

    @staticmethod
    def _evolve_schema(schema, df: DataFrame):
        """Schema-evolution half of Delta's ``mergeSchema``: extend
        ``schema`` with the frame's EXTRA columns (nullable, fresh
        physical names so a previously dropped same-named column can
        never resurrect).  Returns the (possibly unchanged) schema."""
        from pyspark.sql.types import StructField, StructType

        existing = {f.name.lower() for f in schema.fields}
        extra = [f for f in df.schema.fields if f.name.lower() not in existing]
        if not extra:
            return schema
        return StructType(
            [
                *schema.fields,
                *[
                    StructField(
                        f.name,
                        f.dataType,
                        True,
                        {"physical_name": f"c_{uuid.uuid4().hex[:12]}"},
                    )
                    for f in extra
                ],
            ]
        )

    def check_constraints(self, version: int | None = None) -> dict[str, str]:
        """The table's CHECK constraints (name -> SQL expression) at a
        version (default head)."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return dict(self._read_manifest(v).get("constraints") or {})

    def _enforce_constraints(self, df: DataFrame, m: dict, what: str) -> None:
        """Refuse a write whose rows violate any CHECK constraint.
        Delta semantics: a row violates when the expression is FALSE or
        NULL (``IS NOT TRUE``).  One combined limit-1 job for the
        common all-clear case; only on a hit does a per-constraint pass
        run to name the offender."""
        cons = m.get("constraints") or {}
        if not cons:
            return
        combined = " OR ".join(f"(({e}) IS NOT TRUE)" for e in cons.values())
        if not df.where(combined).limit(1).count():
            return
        for name, expr in sorted(cons.items()):
            if df.where(f"({expr}) IS NOT TRUE").limit(1).count():
                raise ValueError(
                    f"{what} violates CHECK constraint {name!r}: {expr} "
                    "(rows where the expression is false or NULL)"
                )

    def add_check_constraint(self, name: str, expr: str) -> int:
        """Add a CHECK constraint (Delta's ``ADD CONSTRAINT``) as a
        metadata-only commit.  EXISTING rows are validated first (one
        limit-1 scan) — a constraint the current data violates is
        refused, like Delta.  Every subsequent data-adding write
        (append / merge / overwrite / overwrite_where / apply_cdc)
        enforces it at WRITE time, and the constraint carries forward
        through every operation — schema evolution, compaction,
        restore, clone — until :meth:`drop_check_constraint`."""
        head = self._head()
        m = self._read_manifest(head)
        cons = dict(m.get("constraints") or {})
        if name in cons:
            raise ValueError(f"constraint {name!r} already exists: {cons[name]}")
        snap = self.snapshot(head)
        if snap.where(f"({expr}) IS NOT TRUE").limit(1).count():
            raise ValueError(
                f"cannot add CHECK constraint {name!r}: existing rows "
                f"violate {expr}"
            )
        cons[name] = expr
        return self._commit(
            {
                "version": head + 1,
                "operation": "add-constraint",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "constraints": cons,
                "txns": self._merged_txns(m, None),
            }
        )

    def drop_check_constraint(self, name: str) -> int:
        """Drop a CHECK constraint (metadata-only commit)."""
        head = self._head()
        m = self._read_manifest(head)
        cons = dict(m.get("constraints") or {})
        if name not in cons:
            raise ValueError(f"constraint {name!r} does not exist")
        del cons[name]
        return self._commit(
            {
                "version": head + 1,
                "operation": "drop-constraint",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "constraints": cons,
                "txns": self._merged_txns(m, None),
            }
        )

    def rename_column(self, old: str, new: str) -> int:
        """Schema evolution: RENAME a column as a METADATA-ONLY commit —
        no data file is rewritten.  The field keeps its stable physical
        storage name (defaulting to its creation-time name), so every
        existing file resolves through the mapping; readers of the new
        version see ``new``, time travel to older versions still shows
        ``old``.  Renaming a key column updates ``key_cols`` in place —
        merge/scan pruning keeps working because stats are keyed by the
        physical name, which does not change."""
        from pyspark.sql.types import StructField, StructType

        head = self._head()
        m = self._read_manifest(head)
        schema = StructType.fromJson(m["schema"])
        names = {f.name for f in schema.fields}
        if old not in names:
            raise ValueError(f"column {old!r} does not exist")
        # case-INSENSITIVE collision check: Spark resolves column names
        # case-insensitively by default, so a table with both `id` and
        # `ID` would make every downstream reference ambiguous
        if new.lower() in {n.lower() for n in names if n != old}:
            raise ValueError(f"column {new!r} already exists")
        fields = []
        for f in schema.fields:
            if f.name == old:
                md = dict(f.metadata or {})
                md.setdefault("physical_name", f.name)
                fields.append(StructField(new, f.dataType, f.nullable, md))
            else:
                fields.append(f)
        return self._commit(
            {
                "version": head + 1,
                "operation": "rename-column",
                "schema": StructType(fields).jsonValue(),
                "key_cols": [new if k == old else k for k in m["key_cols"]],
                "add": [],
                "remove": [],
                "txns": self._merged_txns(m, None),
            }
        )

    def drop_column(self, name: str) -> int:
        """Schema evolution: DROP a column as a METADATA-ONLY commit —
        no data file is rewritten.  The physical column stays in the
        old files but is pruned from every read of the new version
        (the scan schema simply omits it); time travel to older
        versions still shows it.  Re-adding the same logical name later
        is safe because :meth:`add_columns` assigns a fresh physical
        name.  Key columns cannot be dropped (they drive file stats and
        merge pruning); drop them from ``key_cols`` via a rewrite
        operation instead."""
        from pyspark.sql.types import StructType

        head = self._head()
        m = self._read_manifest(head)
        schema = StructType.fromJson(m["schema"])
        names = [f.name for f in schema.fields]
        if name not in names:
            raise ValueError(f"column {name!r} does not exist")
        if name in m["key_cols"]:
            raise ValueError(f"column {name!r} is a key column; cannot drop")
        if len(names) == 1:
            raise ValueError("cannot drop the table's only column")
        return self._commit(
            {
                "version": head + 1,
                "operation": "drop-column",
                "schema": StructType(
                    [f for f in schema.fields if f.name != name]
                ).jsonValue(),
                "key_cols": m["key_cols"],
                "add": [],
                "remove": [],
                "txns": self._merged_txns(m, None),
            }
        )

    def _optimize_incremental(
        self, cluster, head: int, m: dict, schema, op: str
    ) -> int | None:
        """Shared skeleton of INCREMENTAL maintenance (compact and
        z-order): select the files added since the ``last_optimize``
        watermark, rewrite only them through ``cluster(df) ->
        (clustered_df, stats_cols)``, and publish with the
        rebase-over-pure-appends retry loop (OPTIMIZE never blocks
        ingest — Delta parity; anything touching existing entries
        aborts).  Returns the committed version, ``head`` when nothing
        is fresh, or None when there is no resolvable watermark (the
        caller falls back to its full pass)."""
        lo = m.get("last_optimize")
        old_paths: set[str] | None = None
        if lo is not None:
            try:
                old_paths = {e["path"] for e in self.entries(lo)}
            except FileNotFoundError:
                old_paths = None  # watermark vacuumed away: full pass
        if old_paths is None:
            return None
        fresh = [e for e in self.entries(head) if e["path"] not in old_paths]
        if not fresh:
            return head  # nothing added since the last optimize
        res = cluster(self._read_entries_data(schema, fresh))
        if res is None:
            # the fresh slice is un-clusterable (e.g. all-NULL z
            # column): leave it for a later pass rather than crash a
            # healthy maintenance job
            return head
        part, stats_cols = res
        files = self._write_data_files(
            part,
            stats_cols,
            schema=schema,
            generated=m.get("generated"),
            validate_generated=False,
        )
        base_head = head
        for _ in range(10):
            try:
                return self._commit(
                    {
                        "version": head + 1,
                        "operation": op,
                        "schema": m["schema"],
                        "key_cols": m["key_cols"],
                        "add": files,
                        "remove": [e["path"] for e in fresh],
                        "last_optimize": head + 1,
                        "txns": self._merged_txns(m, None),
                    }
                )
            except ConcurrentWriteError:
                # OPTIMIZE never blocks ingest (Delta parity): a pure
                # concurrent APPEND commutes with compacting
                # pre-existing files — its new files simply stay
                # uncompacted until the next pass.  Anything touching
                # existing entries (remove, reset, a deletion-vector
                # attach on a file we just rewrote, a schema change)
                # aborts.
                head = self._head()
                m = self._read_manifest(head)
                for v2 in range(base_head + 1, head + 1):
                    mv = self._read_manifest(v2)
                    if (
                        mv.get("operation") != "append"
                        or mv.get("remove")
                        or mv.get("reset")
                        or mv.get("dv")
                        or mv["schema"] != m["schema"]
                    ):
                        raise
        raise ConcurrentWriteError(f"{op} lost 10 straight publish races")

    def compact(
        self,
        target_files: int | None = None,
        target_rows_per_file: int | None = None,
        incremental: bool = False,
    ) -> int:
        """OPTIMIZE: rewrite the current snapshot into ``target_files``
        range-partitioned files (ranged on the first key column so the
        per-file min/max stats stay tight and merge/scan pruning keeps
        working).  Pass ``target_rows_per_file`` INSTEAD to size by
        content — the operational knob at 100 TB, where "how many
        files" is the wrong question and "how big should a file be" is
        the right one: the file count is derived from the live row
        count (manifest metadata for the full pass — no data scanned
        to decide; one churn-sized count for the incremental pass).  Pure metadata swap for readers: the new manifest is
        one atomic commit, time travel to the pre-compact version still
        resolves the old files until vacuum.

        The small-files problem is THE operational cost at 100 TB — a
        streaming MERGE sink or many narrow deltas leave thousands of
        KB-sized files whose open/footer overhead dominates scans;
        periodic compaction restores scan bandwidth without blocking
        readers or writers (an optimistic-concurrency conflict on the
        version simply retries the compaction later).

        ``incremental=True`` (round 12): compact ONLY the files added
        since the previous optimize (the ``last_optimize`` watermark
        property, carried through every commit) — a steady-state
        streaming sink compacts each maintenance window's churn in
        O(churn), never re-reading the 100 TB bulk it already
        compacted.  Files carried from before the watermark (their
        deletion vectors included) stay byte-identical; the logical
        snapshot is unchanged either way.  Falls back to a full
        compact when there is no watermark or its version is already
        vacuumed."""
        from pyspark.sql.types import StructType as _CST

        if (target_files is None) == (target_rows_per_file is None):
            raise ValueError(
                "compact: pass exactly one of target_files / "
                "target_rows_per_file"
            )
        if target_rows_per_file is not None and target_rows_per_file < 1:
            raise ValueError("compact: target_rows_per_file must be >= 1")

        def _files_for(nrows: int) -> int:
            return max(1, -(-int(nrows) // int(target_rows_per_file)))

        head = self._head()
        m = self._read_manifest(head)
        key_cols = m["key_cols"]
        schema = _CST.fromJson(m["schema"])
        if incremental:

            def _cluster(part: DataFrame) -> tuple[DataFrame, list]:
                tf = (
                    target_files
                    if target_files is not None
                    else _files_for(part.count())
                )
                if key_cols:
                    return (
                        part.repartitionByRange(
                            tf, key_cols[0]
                        ).sortWithinPartitions(key_cols[0]),
                        key_cols,
                    )
                return part.repartition(tf), key_cols

            v = self._optimize_incremental(
                _cluster, head, m, schema, "optimize-incremental"
            )
            if v is not None:
                return v
            # no resolvable watermark: fall through to the full pass
        if target_files is not None:
            tf = target_files
        else:
            # live row count from the entries frame — metadata only
            total = self._entries_frame(head).agg(F.sum("rows")).first()[0]
            tf = _files_for(total or 0)
        snap = self.snapshot(head)
        if key_cols:
            snap = snap.repartitionByRange(tf, key_cols[0]).sortWithinPartitions(
                key_cols[0]
            )
        else:
            snap = snap.repartition(tf)
        files = self._write_data_files(
            snap,
            key_cols,
            schema=schema,
            generated=m.get("generated"),
            validate_generated=False,
        )
        return self._commit(
            {
                "version": head + 1,
                "operation": "optimize",
                "schema": m["schema"],
                "key_cols": key_cols,
                "reset": True,
                "add": files,
                "last_optimize": head + 1,
                "txns": self._merged_txns(m, None),
            }
        )

    def optimize_zorder(
        self,
        zcols: Sequence[str],
        target_files: int,
        bits: int = 16,
        incremental: bool = False,
    ) -> int:
        """OPTIMIZE ZORDER BY: rewrite the snapshot clustered on the
        Morton interleave of ``zcols`` (integer/date/timestamp columns),
        so per-file min/max stats become tight on EVERY listed column
        and ``scan`` prunes hyper-rectangle predicates (see
        operators/layout.py).  Normalization bounds come from one
        min/max aggregation over the rows being clustered — the stats
        pass a real OPTIMIZE does first.  One range shuffle, same cost
        as any global sort; the key is dropped before write.

        ``incremental=True`` (round 12): z-cluster ONLY the files added
        since the ``last_optimize`` watermark — the steady-state form
        for an append-mostly table whose bulk is already clustered.
        The churn clusters among itself with churn-local normalization
        bounds (per-file stats stay exact either way — bounds affect
        only how the fresh rows pack together, and the next full pass
        re-normalizes globally); pre-watermark files stay
        byte-identical.  Falls back to a full pass when there is no
        resolvable watermark.  Same rebase-over-pure-appends loop as
        incremental compact: OPTIMIZE never blocks ingest.

        Measured trade-off (BASELINE.md round-4b probe): clustering on
        non-PK columns scrambles each file's PK range, so MERGE-on-PK
        file pruning stops skipping files on a z-ordered table.  Rule
        of thumb: z-order the read-optimized copy; keep tables that
        receive narrow PK deltas range-partitioned on the PK
        (``compact``); merge's adaptive recompute path is the safety
        net when a delta's keys spread uniformly over the key space."""
        from pyspark.sql.types import StructType as _ZST

        from ..operators.layout import zorder_key

        head = self._head()
        m = self._read_manifest(head)
        schema = _ZST.fromJson(m["schema"])
        typed = {f.name: f.dataType.simpleString() for f in schema.fields}

        def _as_long(c: str):
            t = typed[c]
            if t in ("date", "timestamp", "timestamp_ntz"):
                return F.datediff(F.col(c).cast("date"), F.to_date(F.lit("1970-01-01")))
            return F.col(c).cast("long")

        def _cluster(df: DataFrame) -> tuple[DataFrame, list]:
            aggs = []
            for c in zcols:
                aggs += [
                    F.min(_as_long(c)).alias(f"__lo_{c}"),
                    F.max(_as_long(c)).alias(f"__hi_{c}"),
                ]
            b = df.agg(*aggs).first()
            if any(b[f"__lo_{c}"] is None for c in zcols):
                # no usable bounds: empty frame or an all-NULL z column
                return None
            specs = []
            for c in zcols:
                lo, hi = b[f"__lo_{c}"], b[f"__hi_{c}"]
                if hi == lo:
                    hi = lo + 1  # constant column: degenerate but valid range
                specs.append((_as_long(c), int(lo), int(hi)))
            clustered = (
                df.withColumn("__zkey", zorder_key(specs, bits=bits))
                .repartitionByRange(target_files, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
            # stats must cover the z columns too, or scan() cannot
            # prune on them
            return clustered, list(dict.fromkeys([*m["key_cols"], *zcols]))

        if incremental:
            v = self._optimize_incremental(
                _cluster, head, m, schema, "optimize-zorder-incremental"
            )
            if v is not None:
                return v
            # no resolvable watermark: fall through to the full pass
        res = _cluster(self.snapshot(head))
        if res is None:
            raise ValueError(
                "optimize_zorder: no usable bounds — the snapshot is empty "
                "or every z column is entirely NULL"
            )
        clustered, stats_cols = res
        files = self._write_data_files(
            clustered,
            stats_cols,
            schema=schema,
            generated=m.get("generated"),
            validate_generated=False,
        )
        return self._commit(
            {
                "version": head + 1,
                "operation": "optimize-zorder",
                "schema": m["schema"],
                "key_cols": m["key_cols"],
                "reset": True,
                "add": files,
                "last_optimize": head + 1,
                "txns": self._merged_txns(m, None),
            }
        )

    def vacuum(
        self,
        keep_last: int = 2,
        retain_seconds: float = 3600.0,
        dry_run: bool = False,
    ) -> list[str]:
        """Drop data files referenced by NO retained version (the last
        ``keep_last``) and prune older manifests + checkpoints.  Returns
        the deleted file paths.  Irreversible: time travel past the
        horizon stops working, which is the point.

        ``dry_run=True`` (Delta's VACUUM ... DRY RUN): return the data
        files a real vacuum would delete under the same horizon and
        retention window, with ZERO side effects — no checkpoint
        written, nothing unlinked, no manifest pruned.  The
        look-before-you-leap step an operator runs before an
        irreversible horizon move.

        Before any manifest is pruned, a checkpoint is written AT the
        new horizon so later resolutions never need the deleted log
        entries.  ``retain_seconds`` is the in-flight-writer guard
        (Delta's VACUUM retention window): a concurrent commit writes
        its data files BEFORE publishing its manifest, so files younger
        than the window are never deleted even though no manifest
        references them yet — without it, a vacuum racing an append
        deletes the files the about-to-publish manifest points at.
        Lower it only when no other writer can be active."""
        import time

        head = self.latest_version()
        if head is None:
            return []
        horizon = max(0, head - keep_last + 1)
        will_prune_log = any(v < horizon for v in self._versions_on_disk())
        if will_prune_log and horizon > 0 and not dry_run:
            # resolution anchor for every retained version — written
            # while the about-to-be-pruned manifests still exist (an
            # INVALID dir at the horizon — e.g. an orphan from a crashed
            # checkpoint-backed commit — must be overwritten, not kept)
            if not self._checkpoint_valid(horizon):
                self._write_checkpoint(horizon)
        # live set via ONE seeded forward replay (the history() pattern):
        # resolve the earliest retained version once, then fold the
        # newer manifests' actions in memory — not a full checkpoint
        # read per retained version
        live: set[str] = set()
        live_dv: set[str] = set()
        retained = [v for v in self._versions_on_disk() if v >= horizon]
        state: dict[str, dict] = {}
        for i, v in enumerate(retained):
            if i == 0:
                state = {e["path"]: e for e in self.entries(v)}
            else:
                state = self._apply_manifest(state, self._read_manifest(v))
            live |= set(state)
            live_dv |= {
                e["dv"]["path"] for e in state.values() if e.get("dv")
            }
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
                if not dry_run:
                    os.unlink(full)
                deleted.append(rel)
            if not dry_run and not any(
                n.endswith(".parquet") for n in os.listdir(full_dir)
            ):
                shutil.rmtree(full_dir, ignore_errors=True)
        if dry_run:
            return sorted(deleted)
        # bloom-stats sidecar dirs referenced by NO retained manifest
        # (the property rides on manifests, inherited at publish)
        live_bloom = set()
        for v in retained:
            b = self._read_manifest(v).get("bloom")
            if b:
                live_bloom.add(b["dir"])
        bloom_root = os.path.join(self.root, "_bloom")
        for d in os.listdir(bloom_root) if os.path.isdir(bloom_root) else []:
            rel = os.path.join("_bloom", d)
            full = os.path.join(bloom_root, d)
            if rel in live_bloom or not os.path.isdir(full):
                continue
            try:
                age = now - os.path.getmtime(full)
            except FileNotFoundError:
                continue
            if age >= retain_seconds:
                shutil.rmtree(full, ignore_errors=True)
        # deletion-vector sidecar dirs referenced by NO retained version
        # (files under this root only — clone-inherited vectors live
        # under their source's root and are never touched, mirroring the
        # data-file rule); the age guard protects a concurrent MOR
        # writer that staged its vector but hasn't published yet
        dv_root = os.path.join(self.root, "dv")
        for d in os.listdir(dv_root) if os.path.isdir(dv_root) else []:
            rel = os.path.join("dv", d)
            full = os.path.join(dv_root, d)
            if rel in live_dv or not os.path.isdir(full):
                continue
            try:
                age = now - os.path.getmtime(full)
            except FileNotFoundError:
                continue
            if age >= retain_seconds:
                shutil.rmtree(full, ignore_errors=True)
        for v in self._versions_on_disk():
            if v < horizon:
                try:
                    os.unlink(self._manifest_path(v))
                except FileNotFoundError:
                    pass
        # checkpoint dirs: drop everything below the horizon (suffixed
        # owner-staged dirs included), plus AGED orphan staging dirs —
        # leftovers from a crashed or raced restore/clone whose owner the
        # committed manifest at that version does not claim.  Young
        # orphans are kept: they may belong to an in-flight writer that
        # has staged but not yet published.
        for n in os.listdir(self._log_dir) if os.path.isdir(self._log_dir) else []:
            mt = re.match(r"^(\d+)\.checkpoint(?:\.([0-9a-f]+))?$", n)
            if not mt:
                continue
            cv, downer = int(mt.group(1)), mt.group(2)
            d = os.path.join(self._log_dir, n)
            if cv < horizon:
                shutil.rmtree(d, ignore_errors=True)
                continue
            if downer is not None and self._checkpoint_path(cv) != d:
                try:
                    age = now - os.path.getmtime(d)
                except FileNotFoundError:
                    continue
                if age >= retain_seconds:
                    shutil.rmtree(d, ignore_errors=True)
        return sorted(deleted)


_GEN_MONOTONE = [
    re.compile(r"^cast\(\s*(\w+)\s+as\s+date\s*\)$", re.IGNORECASE),
    re.compile(r"^to_date\(\s*(\w+)\s*\)$", re.IGNORECASE),
    re.compile(
        r"^date_trunc\(\s*'(?:year|quarter|month|week|day|dd|hour|minute)'\s*,"
        r"\s*(\w+)\s*\)$",
        re.IGNORECASE,
    ),
    re.compile(r"^year\(\s*(\w+)\s*\)$", re.IGNORECASE),
]


def _monotone_source(expr: str) -> str | None:
    """The source column of a generated-column expression that is
    provably NON-DECREASING in it (the whitelist Delta uses for
    generated-column partition pruning: date casts/truncations and
    year()).  month()/day() are NOT monotone across year boundaries
    and stay off the list.  None = don't derive."""
    e = " ".join(expr.strip().split())
    for rx in _GEN_MONOTONE:
        mt = rx.match(e)
        if mt:
            return mt.group(1)
    return None


def _epoch_seconds(ts) -> float:
    """Coerce a time-travel selector to epoch seconds.  Accepts a
    number (epoch seconds), ``datetime``/``date`` (naive values are
    LOCAL time, matching how ``time.time()`` stamps land on this
    clock), or an ISO-8601 string."""
    import datetime as _dt

    if isinstance(ts, bool):
        raise TypeError(f"not a timestamp: {ts!r}")
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        return ts.timestamp()
    if isinstance(ts, _dt.date):
        return _dt.datetime.combine(ts, _dt.time.min).timestamp()
    raise TypeError(f"not a timestamp: {ts!r}")


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


def _percent_decode(c):
    """Percent-decode a COLUMN (file-URI paths from ``input_file_name``,
    hive-escaped partition dir values) without the ``+``-to-space
    mangling of plain URL decoding: java.net.URLDecoder (behind
    ``F.url_decode``) treats ``+`` as an encoded space, but in file
    paths and hive dir names ``+`` is a literal character — protect it
    as ``%2B`` first so only real ``%XX`` escapes decode."""
    return F.url_decode(F.replace(c, F.lit("+"), F.lit("%2B")))


def _percent_decode_py(s: str) -> str:
    """Driver-side twin of :func:`_percent_decode` for single paths,
    with the file-URI scheme prefix stripped."""
    from urllib.parse import unquote

    return unquote(re.sub("^file:(//)?", "", s))


def _iso_stat(c, dtype: str):
    """COLUMN twin of :func:`_json_scalar` for the distributed stats
    build in :meth:`AcidTable.import_existing`: render date/timestamp
    stats as the exact ISO strings ``datetime.isoformat()`` produces
    (microseconds omitted when zero), so adopted-table stats compare
    identically to ``create()``-written stats in :meth:`AcidTable.scan`
    / merge pruning.  Non-temporal types pass through (to_json renders
    them as native JSON scalars, the same shape json.dump gives)."""
    if dtype == "date":
        return F.date_format(c, "yyyy-MM-dd")
    if dtype in ("timestamp", "timestamp_ntz"):
        base = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
        micros = F.date_format(c, "SSSSSS")
        return F.when(
            micros == "000000", base
        ).otherwise(F.concat(base, F.lit("."), micros))
    return c
