"""Structured Streaming ingest over the `events` stream (SURVEY §2.9 —
explicitly BEYOND the reference, which has no streaming; its only
incremental notions are import/export timestamps, Codeunit 60000:364,
641-642, 787-788).

Exposes:
- `stream_events`: file-source stream with the events schema (new parquet
  files appearing under a directory are the micro-batches — how a 100 TB
  pipeline tails an object-store landing zone);
- `hourly_rollup_stream`: watermarked tumbling-window counts/sums — the
  streaming twin of the batch `events_hourly_rollup` query, so batch and
  stream share semantics.  Append mode emits each window exactly once,
  when the watermark passes its end; observed Spark 4.1 behavior in
  availableNow runs is that a within-run late row may still aggregate
  into its own (immediately-finalized) window rather than being silently
  dropped — rely on the exactly-once-per-window contract, not on drops;
- `sessionize`: custom stateful operator via applyInPandasWithState —
  per-user session windows (gap-based), the kind of operator the built-in
  window functions can't express.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Tail a landing directory of parquet event files as a stream (files
    are micro-batched in modification-time order)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with a watermark: the
    streaming analogue of the batch events_hourly_rollup oracle query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact order-independent decimal aggregation internally,
            # DOUBLE at the edge (DecimalRenderPolicy, README)
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )


SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int"
_STATE_SCHEMA = "start long, last long, n int"


def _session_fn(key, pdfs, state: GroupState):
    """Gap-based sessionizer: state carries (start, last, count) as epoch
    microseconds; a timeout or a gap larger than `gap` closes the session."""
    import pandas as pd

    gap_us = 30 * 60 * 1_000_000  # 30 min
    (user_id,) = key
    out = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            out.append((user_id, start, last, n))
            state.remove()
    else:
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_list[0], ts_list[0], 0
        for t in ts_list:
            if t - last > gap_us:
                out.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(60 * 60 * 1000)  # 1h processing-time timeout
    # integer timedelta arithmetic: s/1e6 float seconds can land ±1 µs off
    # (epoch µs needs ~51 of float64's 53 mantissa bits)
    epoch = dt.datetime(1970, 1, 1)
    return iter(
        [
            pd.DataFrame(
                [
                    (
                        u,
                        epoch + dt.timedelta(microseconds=s),
                        epoch + dt.timedelta(microseconds=e),
                        n,
                    )
                    for (u, s, e, n) in out
                ],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
        ]
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap-based sessions via applyInPandasWithState (custom
    stateful operator; emits CLOSED sessions only)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sliding_rollup_stream(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window rollup per event_type: every event contributes to
    window/slide overlapping windows (here 2), each [start, start+window)
    aligned to the slide.  The watermark bounds state — a window's
    partials are dropped once the watermark passes its end — so state is
    O(open windows × types), independent of stream length.  Ranking
    top-k WITHIN a window is deliberately NOT done in the stream: it
    runs as a tiny batch over the closed aggregates (cardinality =
    windows × types, not events), because a rank inside the streaming
    agg would force complete-mode recomputation of every window per
    micro-batch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value")
    )


def lateness_stats(query) -> list[dict]:
    """Per-micro-batch LATENESS / STATE observability for a streaming
    query — the no-silent-caps rule applied to streams (the batch-side
    analogue is ``lsh_bucket_stats``): one dict per completed batch with
    the batch's input-row count, the watermark it ran with, its min/max
    event time, a ``late_input_seen`` flag (some input arrived behind
    the watermark), and per-state-operator state sizes / updates /
    watermark-drop counts.

    Semantics this surfaces (pinned EMPIRICALLY by tests on pyspark
    4.1 — more permissive than the classic watermark doctrine):

    - windowed AGGREGATIONS do not silently discard late input: a row
      behind the watermark still produces a (late) partial aggregate
      downstream, and dedup (``dropDuplicates`` /
      ``dropDuplicatesWithinWatermark``) likewise admits-and-emits a
      late row rather than dropping it.  ``late_input_seen`` flags such
      batches so a pipeline can route or reconcile late emissions;
    - when the engine DOES drop at the state store (stream-stream
      interval joins past the join window, state eviction), the count
      lands in ``dropped_by_watermark`` (summed over the batch's
      operators) instead of disappearing.

    Reads ``query.recentProgress`` only — no plan change, no extra
    action; call it after (or during) the run.  Driver memory is
    bounded by ``spark.sql.streaming.numRecentProgressUpdates``
    (default 100 batches).  Caveat: multi-watermark queries (stream-
    stream joins) report only the global watermark in ``eventTime``,
    without per-batch min/max — ``late_input_seen`` stays False there;
    the drop counters still populate."""
    import json as _json
    from datetime import datetime, timezone

    def _ts(s: str | None):
        if not s:
            return None
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        )

    out: list[dict] = []
    for pr in query.recentProgress:
        pj = pr if isinstance(pr, dict) else _json.loads(pr.json)
        ev = pj.get("eventTime") or {}
        wm, mn = _ts(ev.get("watermark")), _ts(ev.get("min"))
        ops = pj.get("stateOperators") or []
        out.append(
            {
                "batch_id": pj["batchId"],
                "input_rows": pj.get("numInputRows", 0),
                "watermark": ev.get("watermark"),
                "event_min": ev.get("min"),
                "event_max": ev.get("max"),
                "late_input_seen": bool(
                    wm is not None and mn is not None and mn < wm
                ),
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_rows_updated": sum(o.get("numRowsUpdated", 0) for o in ops),
                "dropped_by_watermark": sum(
                    o.get("numRowsDroppedByWatermark", 0) for o in ops
                ),
                "operators": [o.get("operatorName") for o in ops],
            }
        )
    return out


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, await_seconds: float = 60.0
) -> None:
    """Drive a stream with the availableNow trigger into a memory sink and
    wait for completion — the test/bench harness entry."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if query_name.endswith("_rollup") else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)
    if q.isActive:
        q.stop()


def acid_merge_sink(
    table_root: str,
    pk_cols: list[str],
    app_id: str,
    compact_every: int | None = None,
    target_files: int = 32,
):
    """Exactly-once stream→ACID sink: a ``foreachBatch`` function that
    lands each micro-batch into an :class:`AcidTable` via idempotent
    MERGE.

    ``foreachBatch`` alone is at-least-once: a crash between the sink
    write and the checkpoint commit replays the batch on restart.  This
    sink records ``(app_id, batch_id)`` in the table's commit metadata
    (the Delta ``txn`` action) and skips any batch at or below the
    table's recorded high-water mark for the app — the replayed batch
    becomes a no-op, upgrading the contract to exactly-once even when
    the batch's rows are NOT naturally idempotent under PK upsert
    (e.g. aggregating sinks, or deltas that delete).  The first batch
    creates the table, also txn-stamped, so a crash straddling table
    creation replays safely too.

    Within-batch duplicate PKs (overlapping at-least-once source files)
    are deduped last-write-wins before the merge, mirroring the
    reference's replace-matching-rows apply (Codeunit 60000:440-451).

    ``compact_every``: every that many batches, run
    ``AcidTable.compact(target_files)`` after the merge — per-batch
    MERGE commits accumulate small files, THE operational cost of a
    streaming sink at 100 TB, and periodic OPTIMIZE bounds it without
    blocking readers.  Compaction is a separate (txn-less) commit: a
    crash-replay may re-run it, which is harmless — it rewrites the
    same snapshot — while the data-bearing merge stays exactly-once.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.upsert import dedup_by_pk
        from ..sources.acid_table import AcidTable

        spark = batch_df.sparkSession
        t = AcidTable(spark, table_root)
        last = t.last_txn(app_id)
        if last is not None and int(batch_id) <= last:
            return  # replayed batch: its commit already landed
        body = dedup_by_pk(batch_df, list(pk_cols))
        if t.latest_version() is None:
            AcidTable.create(
                spark, table_root, body, key_cols=list(pk_cols),
                txn=(app_id, int(batch_id)),
            )
        else:
            t.merge(body, list(pk_cols), txn=(app_id, int(batch_id)))
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            t.compact(target_files)

    return _apply


def acid_backfill_sink(
    table_root: str,
    slice_col: str,
    app_id: str,
    key_cols: list[str] | None = None,
):
    """Exactly-once stream→ACID BACKFILL sink (round 11): a
    ``foreachBatch`` function that lands each micro-batch by atomically
    REPLACING the table slices the batch carries —
    :meth:`AcidTable.overwrite_where` keyed on the batch's distinct
    ``slice_col`` values — instead of merging row-by-row.

    This is the streaming face of the recompute-and-swap pattern: a
    late-data reprocessor or dimension-refresh stream emits WHOLE
    corrected slices (a day, a tenant, a partition), and each batch
    swaps its slices in one commit — readers see an old slice or a new
    one, never a mix, and rows DELETED from a slice disappear (which a
    MERGE upsert can never do).  The ``(app_id, batch_id)`` txn stamp
    upgrades foreachBatch's at-least-once replay to exactly-once,
    matching :func:`acid_merge_sink`; the first batch creates the
    table, also txn-stamped.

    The predicate is built from the batch's DISTINCT slice values (a
    slice-count-sized collect — batches carry few slices by design;
    values are SQL-quoted, numerics pass through) so the validation in
    ``overwrite_where`` holds by construction."""

    def _quote(v) -> str:
        # typed literals, not bare str(): a date slice rendered as
        # `day IN (2024-01-01)` parses as integer arithmetic and fails
        # with an AnalysisException instead of a date predicate
        import datetime
        import decimal

        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, datetime.datetime):  # before date: subclass
            return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
        if isinstance(v, datetime.date):
            return "DATE '" + v.isoformat() + "'"
        if isinstance(v, (int, float, decimal.Decimal)):
            return str(v)
        raise TypeError(
            "acid_backfill_sink: slice value of unsupported type "
            f"{type(v).__name__!r} cannot form a replaceWhere predicate"
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.acid_table import AcidTable

        spark = batch_df.sparkSession
        t = AcidTable(spark, table_root)
        last = t.last_txn(app_id)
        if last is not None and int(batch_id) <= last:
            return  # replayed batch: its commit already landed
        vals = [
            r[slice_col]
            for r in batch_df.select(slice_col).distinct().collect()
        ]
        if not vals:
            return
        if any(v is None for v in vals):
            raise ValueError(
                "acid_backfill_sink: NULL slice values cannot form a "
                "replaceable predicate slice"
            )
        pred = f"{slice_col} IN ({', '.join(_quote(v) for v in sorted(vals))})"
        body = batch_df
        if t.latest_version() is None:
            AcidTable.create(
                spark,
                table_root,
                body,
                key_cols=list(key_cols or [slice_col]),
                txn=(app_id, int(batch_id)),
            )
        else:
            t.overwrite_where(body, pred, txn=(app_id, int(batch_id)))

    return _apply


def minhash_index_sink(
    table_root: str,
    app_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
    compact_every: int | None = None,
    target_files: int = 32,
):
    """Exactly-once STREAMING maintenance of the MinHash signature
    index — the stored-corpus side that ``minhash_dedup_incremental``
    probes (operators/dedup.py): each micro-batch of documents is
    signed (shingle→minhash, work proportional to the BATCH, the
    stored corpus is never re-read) and MERGEd into the signature
    AcidTable keyed by document id, txn-stamped through
    :func:`acid_merge_sink` so replayed batches are no-ops.

    The maintained table is byte-identical to a batch
    ``minhash_signatures`` over everything ever streamed (per-doc
    signatures are independent, and re-signed overlap rows upsert to
    identical values), so incremental dedup against it equals
    incremental dedup against freshly computed corpus signatures —
    asserted in tests and by the ``stream_minhash_index`` oracle
    entry.  At 100 TB this closes the loop: documents arrive as a
    stream, the dedup index keeps itself current, and each new batch
    dedups against the whole history without any corpus×corpus work."""
    base = acid_merge_sink(
        table_root, [id_col], app_id, compact_every, target_files
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import minhash_signatures

        sigs = minhash_signatures(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            n=n,
            num_hashes=num_hashes,
            portable=portable,
        ).withColumnRenamed("id", id_col)
        base(sigs, batch_id)

    return _apply


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each click matched to every purchase
    by the same user within ``window`` BEFORE it (inclusive both ends).

    Both sides carry a watermark so Spark can bound the join state: a
    buffered purchase can be evicted once the click-side watermark passes
    ``purchase_ts + window``, and vice versa.  With ``watermark`` >=
    ``window`` and (approximately) time-ordered arrival, no within-window
    pair is lost — the finished stream equals the batch interval join
    exactly, which is what the oracle checks.
    """
    c = (
        clicks.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts <= click_ts "
            f"AND purchase_ts >= click_ts - interval {window}"
        ),
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def _prune_sink_history(dirpath: str, app_id: str, bid: int, keep: int) -> None:
    """Retention sweep for the LSM sinks' per-batch bookkeeping files
    (``_txn`` markers, ``_carry`` records, both named ``<app>-<k>``):
    delete entries with k <= bid - keep once batch ``bid`` has
    committed.  Without this a long-running stream accumulates one
    marker (and one carry) per batch forever — unbounded small-file
    metadata next to the data it compacts.

    Safety: Structured Streaming replays at most the batches after the
    last checkpoint commit, so pruning anything ``keep`` batches behind
    the newest committed marker can never be consulted again as long as
    ``keep`` exceeds the replay horizon (the default 64 is orders of
    magnitude above Spark's one-uncommitted-batch horizon).  ``keep <= 0``
    disables pruning."""
    import glob
    import os

    if keep <= 0:
        return
    cutoff = bid - keep
    if cutoff < 0:
        return
    for f in glob.glob(os.path.join(dirpath, f"{app_id}-*")):
        tail = os.path.basename(f).rsplit("-", 1)[-1]
        if tail.isdigit() and int(tail) <= cutoff:
            try:
                os.remove(f)
            except OSError:
                pass


def ivf_index_sink(
    index_dir: str,
    centroids,
    app_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    retain_history: int = 64,
):
    """Exactly-once STREAMING maintenance of the IVF ANN index (round
    8) — the vector-search twin of :func:`minhash_index_sink`: each
    micro-batch of embeddings is assigned to the EXISTING centroids
    (one narrow batch pass, the stored index is never read) and
    published into the cluster-partitioned index.

    The index is plain partitioned parquet, not an AcidTable, so
    exactly-once is built from the LSM playbook instead of MERGE:

    1. a replayed ``(app_id, batch_id)`` with a committed marker under
       ``<index>/_txn/`` returns immediately (underscore paths are
       invisible to Spark's file index, so readers never see markers);
    2. any HALF-PUBLISHED files from a crashed attempt — recognizable
       because every published file is deterministically named
       ``<app>-<batch>-<seq>.parquet`` — are removed first;
    3. the batch is written to a private staging tree, hard-RENAMEd
       file-by-file into the cluster directories under those
       deterministic names, and only then is the marker committed.

    Crash at any point therefore replays to a byte-identical index.
    :func:`~..operators.similarity.ivf_index_retrain` and
    ``ivf_index_compact`` carry ``_txn`` across their directory swaps,
    so replay detection survives maintenance.  Readers see a batch's
    files appear non-atomically (per-file visibility, like any LSM
    segment publish); queries running mid-publish may see a prefix of
    the batch — the same contract as FAISS add() under concurrent
    search.  Trigger ``ivf_index_compact`` on :func:`ivf_index_stats`
    file counts to fold the per-batch segments back to one file per
    list."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import glob
        import os
        import shutil

        from ..operators.similarity import ivf_index_write

        bid = int(batch_id)
        marker_dir = os.path.join(index_dir, "_txn")
        marker = os.path.join(marker_dir, f"{app_id}-{bid}")
        if os.path.exists(marker):
            return  # committed batch replayed: no-op
        prefix = f"{app_id}-{bid}-"
        for f in glob.glob(os.path.join(index_dir, "cluster=*", prefix + "*.parquet")):
            os.remove(f)  # half-published crash leftovers
        stage = index_dir.rstrip("/") + f"__stage-{app_id}-{bid}"
        shutil.rmtree(stage, ignore_errors=True)
        ivf_index_write(
            batch_df, centroids, stage, id_col, vec_col, mode="overwrite",
            metric=metric,
        )
        seq = 0
        for cdir in sorted(glob.glob(os.path.join(stage, "cluster=*"))):
            dest = os.path.join(index_dir, os.path.basename(cdir))
            os.makedirs(dest, exist_ok=True)
            for f in sorted(glob.glob(os.path.join(cdir, "*.parquet"))):
                os.rename(f, os.path.join(dest, f"{prefix}{seq:05d}.parquet"))
                seq += 1
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass
        _prune_sink_history(marker_dir, app_id, bid, retain_history)

    return _apply


def pack_sequences_sink(
    out_dir: str,
    app_id: str,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    eos_id: int | None = None,
    retain_history: int = 64,
):
    """Exactly-once STREAMING sequence packing (round 8) — the
    continuous-production twin of
    :func:`~..operators.sampling.pack_token_sequences`: documents
    arrive as micro-batches of token-id arrays and leave as exact
    ``seq_len`` training sequences under ``<out>/data/``, with the
    inter-batch remainder carried forward so no token is dropped or
    duplicated at batch boundaries.

    State = one CARRY record per batch boundary (``_carry/<app>-<bid>``,
    written atomically for batch ``bid`` by batch ``bid-1``): the
    global next sequence id plus the < seq_len leftover tail — bounded
    by ``seq_len`` regardless of history, the streaming analogue of the
    prefix-sum offset.  Inside a batch the packing is the fully
    distributed batch operator (hierarchical prefix sum + slice
    explode) over (carry ⊕ batch-in-doc-id-order); only the single
    partial tail row is ever collected.

    Exactly-once follows the :func:`ivf_index_sink` LSM discipline:
    deterministic ``<app>-<bid>-<seq>`` segment names under ``data/``,
    half-published crash cleanup by prefix, ``_txn`` marker committed
    last.  A replayed batch re-reads ITS carry (carry files are never
    consumed destructively; markers and carries older than
    ``retain_history`` batches — far beyond any replay horizon — are
    pruned after each commit so bookkeeping stays bounded), recomputes
    deterministically, and republishes byte-identical segments — pinned
    in tests.

    ``id_col`` must be an integral, non-negative, non-null column: the
    sink validates this loudly up front (a non-integral id would cast
    to NULL and vanish silently at the offsets join; a negative id
    would collide with the carry pseudo-row's ordering key).

    ``eos_id`` appends a separator to every arriving document (the
    carry tail already contains its own boundaries and is never
    re-terminated)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import glob
        import json
        import os
        import shutil

        from pyspark.sql import functions as SF

        from ..operators.sampling import pack_token_sequences

        spark = batch_df.sparkSession
        bid = int(batch_id)
        data_dir = os.path.join(out_dir, "data")
        marker_dir = os.path.join(out_dir, "_txn")
        carry_dir = os.path.join(out_dir, "_carry")
        marker = os.path.join(marker_dir, f"{app_id}-{bid}")
        if os.path.exists(marker):
            return
        prefix = f"{app_id}-{bid}-"
        for f in glob.glob(os.path.join(data_dir, prefix + "*.parquet")):
            os.remove(f)
        carry_path = os.path.join(carry_dir, f"{app_id}-{bid}")
        if os.path.exists(carry_path):
            with open(carry_path) as fh:
                st = json.load(fh)
            next_seq, tail = int(st["next_seq"]), list(st["tail"])
            tail_docs = int(st.get("tail_docs", 1 if tail else 0))
        else:
            next_seq, tail, tail_docs = 0, [], 0

        id_type = batch_df.schema[id_col].dataType.simpleString()
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"pack_sequences_sink: {id_col} must be an integral type, "
                f"got {id_type} — a non-integral id casts to NULL and its "
                "rows would silently vanish at the offsets join, violating "
                "the no-token-dropped contract"
            )
        n_bad = batch_df.filter(
            SF.col(id_col).isNull() | (SF.col(id_col) < 0)
        ).count()
        if n_bad:
            raise ValueError(
                f"pack_sequences_sink: {n_bad} row(s) with NULL or negative "
                f"{id_col} — ids must be non-negative so the +1 ordering key "
                "never collides with the carry pseudo-row (__ord=0)"
            )
        elem = batch_df.schema[ids_col].dataType.elementType.simpleString()
        v = SF.col(ids_col)
        if eos_id is not None:
            v = SF.concat(
                SF.coalesce(v, SF.expr(f"CAST(array() AS array<{elem}>)")),
                SF.array(SF.lit(eos_id).cast(elem)),
            )
        body = batch_df.select(
            (SF.col(id_col).cast("long") + 1).alias("__ord"), v.alias("__v")
        )
        if tail:
            carry_row = spark.createDataFrame(
                [(0, tail)], f"__ord long, __v array<{elem}>"
            )
            body = carry_row.unionByName(body)
        packed = pack_token_sequences(
            body, "__ord", "__v", seq_len=seq_len, drop_last=False, out_col="ids"
        )
        # the carry row enters the packer as ONE pseudo-doc but stands
        # for tail_docs original documents — all of its tokens land in
        # local sequence 0 (the tail is < seq_len at offset 0), so that
        # sequence's doc count is adjusted and batch-mode n_docs
        # semantics are preserved across the boundary
        adj = (
            SF.when(
                (SF.col("seq_id") == 0) & SF.lit(bool(tail)),
                SF.col("n_docs") + SF.lit(max(0, tail_docs - 1)),
            )
            .otherwise(SF.col("n_docs"))
            .cast("int")
            .alias("n_docs")
        )
        packed = packed.select("seq_id", adj, "ids")
        full = packed.filter(SF.size("ids") == seq_len).select(
            (SF.col("seq_id") + SF.lit(next_seq)).alias("seq_id"),
            "n_docs",
            "ids",
        )
        partial = [
            (list(r["ids"]), int(r["n_docs"]))
            for r in packed.filter(SF.size("ids") < seq_len).collect()
        ]
        n_full = full.count()
        stage = out_dir.rstrip("/") + f"__stage-{app_id}-{bid}"
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(data_dir, exist_ok=True)
        full.write.mode("overwrite").parquet(stage)
        seq = 0
        for f in sorted(glob.glob(os.path.join(stage, "*.parquet"))):
            os.rename(f, os.path.join(data_dir, f"{prefix}{seq:05d}.parquet"))
            seq += 1
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(carry_dir, exist_ok=True)
        nxt = os.path.join(carry_dir, f"{app_id}-{bid + 1}")
        tmp = nxt + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "next_seq": next_seq + n_full,
                    "tail": partial[0][0] if partial else [],
                    "tail_docs": partial[0][1] if partial else 0,
                },
                fh,
            )
        os.replace(tmp, nxt)
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass
        _prune_sink_history(marker_dir, app_id, bid, retain_history)
        _prune_sink_history(carry_dir, app_id, bid, retain_history)

    return _apply


CUSUM_OUT_SCHEMA = (
    "user_id long, ts timestamp, event_id long, value double,"
    " cusum_pos_u long, cusum_neg_u long, alarm boolean"
)
_CUSUM_STATE_SCHEMA = "pp long, mp long, pn long, mn long"


def _cusum_fn_factory(target: float, slack: float, threshold: float):
    """Build the applyInPandasWithState fn for :func:`cusum_stream`.

    State = 4 micro-unit (1e-6) integers per user: prefix-sum end and
    running prefix-min for each CUSUM side — O(1) per key, unbounded
    stream safe.  Increments replay the BATCH operator's exact
    semantics: dev = value - (target±slack) in IEEE double, then the
    Spark double→DECIMAL(18,6) cast (BigDecimal.valueOf = HALF_UP on
    the SHORTEST double repr, reproduced with Decimal(repr(d))), so
    the stream's micro-unit integers equal the batch/oracle decimals
    ×10⁶ bit-for-bit — including 1e-6 half-way boundary values."""
    from decimal import ROUND_HALF_UP, Decimal

    up = float(target) + float(slack)
    dn = float(target) - float(slack)
    thr_u = int(
        (Decimal(repr(float(threshold))) * 1_000_000).to_integral_value()
    )
    q6 = Decimal("0.000001")

    def _dev_u(x: float, sub: bool) -> int:
        d = (x - up) if not sub else (dn - x)
        # Decimal(repr(d)) — shortest repr, matching Spark's
        # double→DECIMAL(18,6) cast (BigDecimal.valueOf) and DuckDB.
        # Decimal(d) would expand the exact binary value, which rounds
        # the other way on 1e-6 half-way boundaries (e.g. d = 5e-07:
        # exact binary is 4.9999...e-07 → 0, repr rounds HALF_UP → 1).
        return int(
            Decimal(repr(d)).quantize(q6, rounding=ROUND_HALF_UP) * 1_000_000
        )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return iter([])
        batch = pd.concat(frames).sort_values(["ts", "event_id"])
        if state.exists:
            pp, mp, pn, mn = state.get
        else:
            pp, mp, pn, mn = 0, None, 0, None
        pos_out, neg_out, alarm_out = [], [], []
        for x in batch["value"]:
            v = float(x)
            pp += _dev_u(v, sub=False)
            pn += _dev_u(v, sub=True)
            mp = pp if mp is None else min(mp, pp)
            mn = pn if mn is None else min(mn, pn)
            sp = pp - min(0, mp)
            sn = pn - min(0, mn)
            pos_out.append(sp)
            neg_out.append(sn)
            alarm_out.append(sp > thr_u or sn > thr_u)
        state.update((pp, mp, pn, mn))
        out = pd.DataFrame(
            {
                "user_id": user_id,
                "ts": batch["ts"].values,
                "event_id": batch["event_id"].values,
                "value": batch["value"].values,
                "cusum_pos_u": pos_out,
                "cusum_neg_u": neg_out,
                "alarm": alarm_out,
            }
        )
        return iter([out])

    return fn


def cusum_stream(
    events: DataFrame,
    target: float = 50.0,
    slack: float = 5.0,
    threshold: float = 200.0,
) -> DataFrame:
    """Per-user two-sided CUSUM drift alarms over an unbounded event
    stream (the streaming twin of operators/temporal.cusum_flags, same
    Page-1954 statistic): applyInPandasWithState carries FOUR micro-unit
    integers per user (prefix end + prefix min per side), each
    micro-batch folds its rows in (ts, event_id) order on top of the
    carried prefix, and emitted micro-unit cusums equal the batch
    operator's decimals ×10⁶ exactly — stream ≡ batch is pinned by the
    shared oracle.  Rows must arrive time-ordered per user across
    micro-batches (the landing pattern slices by event time), the same
    contract as every prefix-carrying stream here."""
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cusum_fn_factory(target, slack, threshold),
            outputStructType=CUSUM_OUT_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TREND_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01, fixed rebase constant


def trend_sums_stream(events: DataFrame) -> DataFrame:
    """Streaming SUFFICIENT STATISTICS for per-type OLS value-vs-time
    trend — the algebraic-aggregate streaming pattern: n, Σx, Σy, Σxy,
    Σx² are all mergeable sums, so the whole regression state is ONE
    ordinary streaming aggregation (complete/update mode), no custom
    state operator at all.  x = hours since a FIXED epoch constant
    (data-independent, so the aggregation stays single-level); y is
    DECIMAL(18,6)-exact.  Feed the final table to
    :func:`trend_from_sums`."""
    # integer DIV, not double /: a double quotient that rounds up across
    # an integer boundary would truncate to the wrong hour bucket
    x = F.expr(
        f"(unix_micros(CAST(ts AS TIMESTAMP)) - {TREND_EPOCH_US}L)"
        " DIV 3600000000"
    ).cast("long")
    y = F.col("value").cast("decimal(18,6)")
    return (
        events.select("event_type", x.alias("__x"), y.alias("__y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sx"),
            F.sum("__y").alias("sy"),
            F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
            F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        )
    )


def trend_from_sums(sums: DataFrame) -> DataFrame:
    """Closed-form OLS from :func:`trend_sums_stream`'s statistics:
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept likewise — each
    ONE division of exact decimal/integer sums, engine-exact.  The
    intercept is at x = 0 (the fixed epoch), not the series start."""
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num_s = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    num_i = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.when(den != 0, num_s.cast("double") / den.cast("double")).alias("slope"),
        F.when(den != 0, num_i.cast("double") / den.cast("double")).alias("intercept"),
    )


def follow_changes(
    source,
    replica,
    app_id: str,
    base_version: int | None = None,
    max_batches: int | None = None,
) -> list[int]:
    """STREAMING CHANGE-FEED SOURCE over an AcidTable commit log (round
    12): tail the source's versions as MICRO-BATCHES — one batch per
    commit — applying each version's row-level change feed
    (:meth:`AcidTable.changes`) to a replica table as ONE idempotent
    ``apply_cdc`` commit.  Returns the source versions applied by this
    call.

    The replica's txn ledger IS the stream offset: ``replica.last_txn
    (app_id)`` records the highest source version applied, so a
    restarted follower resumes exactly where it stopped and a REPLAYED
    batch is a no-op — the same exactly-once contract as
    :func:`acid_merge_sink`, extended source→replica.  ``base_version``
    seeds a fresh ledger: the source version whose snapshot the replica
    was initialized from (a clone or a create-from-snapshot).

    This is the lakehouse incremental-consumer primitive (Delta's
    ``readStream`` on a table / Iceberg's incremental scan) expressed
    over the engine's own log.  It is deliberately a poll loop rather
    than a PySpark DataSourceStreamReader: computing a version span's
    logical diff is itself a DISTRIBUTED join over two snapshots'
    churn, which a per-partition stream reader cannot express — the
    offset tracking and batch boundaries are the streaming half, and
    every batch body is Spark-native and file-pruned (only churned
    files are read; a merge+delete over a 10^6-file table moves the
    churn, never the table).

    Wrap in any scheduler (a foreachBatch trigger, a cron, a while
    loop) — each call drains everything available up to
    ``max_batches``.  Reference analogue: the apply codeunit's
    re-import loop (XML:774-798) run continuously instead of per
    package."""
    last = replica.last_txn(app_id)
    if last is None:
        if base_version is None:
            raise ValueError(
                "follow_changes: fresh ledger — pass base_version (the "
                "source version the replica was initialized from)"
            )
        last = int(base_version)
    head = source.latest_version()
    if head is None:
        raise FileNotFoundError(f"no committed version at {source.root}")
    applied: list[int] = []
    for v in range(last + 1, head + 1):
        if max_batches is not None and len(applied) >= max_batches:
            break
        feed = source.changes(v - 1, v)
        replica.apply_cdc(feed, txn=(app_id, v))
        applied.append(v)
    return applied


def follow_aggregate(
    source,
    agg,
    app_id: str,
    group_cols: list[str],
    sum_cols: list[str],
    base_version: int | None = None,
    max_batches: int | None = None,
) -> list[int]:
    """INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the ACID change
    feed (round 12): keep ``SELECT group_cols, COUNT(*) AS cnt,
    SUM(c) AS sum_<c> ... GROUP BY group_cols`` materialized in its own
    AcidTable, advanced one source commit at a time — each batch costs
    O(that commit's churn), never a rescan of the source (the Delta
    Live Tables / Materialize incremental-view primitive, here derived
    from first principles: count/sum form an abelian group, so a
    row-level diff IS an aggregate update).

    Per source version v the feed ``changes(v-1, v)`` is signed
    (+1 insert/update_postimage, -1 delete/update_preimage), reduced to
    per-group deltas, joined against ONLY the touched groups of the
    current view, and applied as one idempotent ``apply_cdc`` commit
    with txn ``(app_id, v)`` — the same ledger-as-offset exactly-once
    contract as :func:`follow_changes`, so replays no-op and a
    restarted follower resumes exactly.  Groups whose count reaches
    zero are DELETED from the view; a negative count means the ledger
    was tampered with and raises.

    ``sum_cols`` should be EXACT types (integers / decimals — cast a
    float column to decimal upstream) and NON-NULL: SQL's SUM ignores
    NULLs while delta arithmetic propagates them, so a NULL-valued row
    would silently diverge the view — both the seed and every batch
    REJECT NULL sum values loudly (coalesce upstream).  Group keys
    must be non-null (they are the view's primary key).  Seed the view
    with :func:`seed_aggregate`, which also stamps ``base_version``."""
    last = agg.last_txn(app_id)
    if last is None:
        if base_version is None:
            raise ValueError(
                "follow_aggregate: fresh ledger — seed the view with "
                "seed_aggregate() or pass base_version explicitly"
            )
        last = int(base_version)
    head = source.latest_version()
    if head is None:
        raise FileNotFoundError(f"no committed version at {source.root}")
    agg_schema = {f.name: f.dataType.simpleString() for f in agg.snapshot().schema}
    applied: list[int] = []
    for v in range(last + 1, head + 1):
        if max_batches is not None and len(applied) >= max_batches:
            break
        feed = source.changes(v - 1, v)
        w = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            feed.withColumn("__w", w)
            .groupBy(*group_cols)
            .agg(
                F.sum("__w").alias("__dcnt"),
                *[
                    F.sum(F.col(c) * F.col("__w")).alias(f"__d_{c}")
                    for c in sum_cols
                ],
                *[
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                        f"__null_{c}"
                    )
                    for c in sum_cols
                ],
            )
            # a version whose churn nets out for a group (COW copies)
            # still reaches here with all-zero deltas; keep them — the
            # update writes identical values and apply_cdc's whole-row
            # logic stays trivially correct
        )
        cur = agg.snapshot()
        j = delta.join(cur, group_cols, "left")
        ncnt = F.coalesce(F.col("cnt"), F.lit(0)) + F.col("__dcnt")
        upd = j.withColumn("__ncnt", ncnt)
        null_pred = None
        for c in sum_cols:
            p = F.col(f"__null_{c}") > 0
            null_pred = p if null_pred is None else (null_pred | p)
        bad = upd.where(
            (F.col("__ncnt") < 0) | null_pred if null_pred is not None
            else (F.col("__ncnt") < 0)
        ).limit(1).first()
        if bad is not None:
            if null_pred is not None and any(
                (bad[f"__null_{c}"] or 0) > 0 for c in sum_cols
            ):
                raise ValueError(
                    "follow_aggregate: NULL sum-column value in the churn — "
                    "SQL SUM ignores NULLs while delta arithmetic propagates "
                    "them; coalesce the column upstream"
                )
            raise ValueError(
                "follow_aggregate: a group's maintained count went negative — "
                "the view does not correspond to this source/base_version"
            )
        sums = [
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0)) + F.col(f"__d_{c}")
            ).cast(agg_schema[f"sum_{c}"]).alias(f"sum_{c}")
            for c in sum_cols
        ]
        synth = upd.select(
            *group_cols,
            F.col("__ncnt").cast(agg_schema["cnt"]).alias("cnt"),
            *sums,
            F.when(F.col("__ncnt") == 0, F.lit("delete"))
            .when(F.col("cnt").isNull(), F.lit("insert"))
            .otherwise(F.lit("update_postimage"))
            .alias("_change_type"),
        )
        agg.apply_cdc(synth, txn=(app_id, v))
        applied.append(v)
    return applied


def seed_aggregate(
    source,
    agg_root: str,
    app_id: str,
    group_cols: list[str],
    sum_cols: list[str],
    version: int | None = None,
):
    """Materialize the view's INITIAL state: one full GROUP BY over the
    source snapshot at ``version`` (default head), written as a new
    AcidTable keyed by the group columns, with the follower's ledger
    stamped at that version — so the first :func:`follow_aggregate`
    call picks up exactly where the seed stopped, and a re-run of the
    seed batch is a no-op.  Returns the view table."""
    from ..sources.acid_table import AcidTable

    v = source.latest_version() if version is None else version
    snap = source.snapshot(v)
    null_pred = None
    for c in sum_cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    if null_pred is not None and snap.where(null_pred).limit(1).count():
        raise ValueError(
            "seed_aggregate: NULL sum-column value in the source — the "
            "incremental maintenance contract requires non-null sum "
            "columns (coalesce upstream)"
        )
    seeded = snap.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    return AcidTable.create(
        source.spark, agg_root, seeded, key_cols=list(group_cols), txn=(app_id, v)
    )
