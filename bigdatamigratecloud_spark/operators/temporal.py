"""Temporal joins: as-of and bounded-range, built to survive 100 TB.

Neither exists in the reference (SURVEY §2.3 "Not in reference" row — the
reference's only joins are dimension lookups, Codeunit 60000:894-922) but
both are core engine capabilities for event/time-series data, and both are
driver-mandated scale ops: the naive formulation of each is a per-key
cross product that Catalyst plans as a sort-merge join with a post-join
range filter — quadratic in the hottest key.  These implementations bound
the work:

- ``asof_join``: union-tag + running ``last(ignorenulls)`` window.  ONE
  shuffle of (left ∪ right) keyed by the join key; within each key the
  match is found by a single ordered sweep, never a pairwise comparison.
  This is the standard distributed as-of (pandas ``merge_asof`` semantics,
  Flink temporal join) expressed in pure DataFrame ops — no UDF.
- ``range_join``: time-bucketed equi-join.  Each left row is exploded to
  the small set of right-side buckets its window can touch
  (``span/bucket_width + 1`` of them), the join runs as an equi-join on
  (key, bucket) — shuffle-partitionable, AQE-splittable — and the exact
  range predicate filters the bucket-local candidates.  Work is
  O(pairs within window), not O(pairs within key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP *or* TIMESTAMP_NTZ input.

    The driver fixtures are parquet `timestamp[us]` (isAdjustedToUTC=false)
    which Spark 4 scans as TIMESTAMP_NTZ, and `unix_micros` rejects NTZ
    outright.  Casting to TIMESTAMP first is a no-op for TIMESTAMP input
    and interprets NTZ wall time in the session timezone — which
    catalog.load_table pins to UTC, making the cast instant-preserving and
    equal to DuckDB's `epoch_us` on the same naive values.  Even under a
    non-UTC fixed-offset timezone the temporal operators stay correct:
    they only consume *differences* of this value."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the nearest
    right row with the same key — ``direction="backward"`` (default)
    picks the LATEST right row with ``right.ts <= left.ts`` (inclusive),
    ``direction="forward"`` the EARLIEST with ``right.ts >= left.ts`` —
    optionally within ``tolerance_us`` microseconds.

    Left rows with no match keep NULL payload (left-outer semantics).
    Ties on (key, right_ts) are broken deterministically by keeping the
    last row in ``right_cols``-order sort; pre-dedup the right side if
    tie-breaking matters to you.

    Scale: one shuffle on ``on`` over left ∪ right; per-key ordered sweep
    via a running ``last(ignorenulls=True)`` window.  No range cross
    product, no per-key quadratic blowup — a key with 10M right rows costs
    a sort, not 10M² comparisons.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    back = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns if c not in keys and c != right_ts]

    rpay = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols])
    lpay = F.struct(*[F.col(c) for c in left.columns])
    # tag ordering makes the as-of INCLUSIVE at equal timestamps: the
    # right row must fall inside the left row's window frame, so right
    # sorts before left when sweeping backward and after when forward
    rtag, ltag = (0, 1) if back else (1, 0)
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(rtag).alias("__tag"),
        rpay.alias("__rpay"),
    )
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(ltag).alias("__tag"),
        F.lit(None).cast(r2.schema["__rpay"].dataType).alias("__rpay"),
        lpay.alias("__lpay"),
    )
    r2 = r2.withColumn("__lpay", F.lit(None).cast(l2.schema["__lpay"].dataType))
    if back:
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__rpay", ignorenulls=True)
    else:
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__rpay", ignorenulls=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__tag")
        .rowsBetween(*frame)
    )
    matched = (
        r2.unionByName(l2)
        .withColumn("__m", pick.over(w))
        .where(F.col("__tag") == ltag)
    )
    if tolerance_us is not None:
        gap = (
            _epoch_us(F.col("__t")) - _epoch_us(F.col("__m.__rts"))
            if back
            else _epoch_us(F.col("__m.__rts")) - _epoch_us(F.col("__t"))
        )
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__m").isNotNull() & (gap <= F.lit(tolerance_us)), F.col("__m")),
        )

    return matched.select(
        "__lpay.*",
        F.col("__m.__rts").alias(right_ts + suffix),
        *[F.col("__m." + c).alias(c + suffix) for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int = 3_600_000_000,
    lower_inclusive: bool = False,
    upper_inclusive: bool = True,
) -> DataFrame:
    """Interval join: pairs (l, r) sharing ``on`` with
    ``r.ts - l.ts`` in (lower_us, upper_us] microseconds (inclusivity
    configurable).  Returns left columns + right columns suffixed ``_r``
    + ``delta_us``.

    Scale: instead of handing Catalyst a range predicate (which becomes a
    sort-merge join on the key alone + post-filter — per-key quadratic),
    both sides are assigned to time buckets of width ``upper_us -
    lower_us`` and the left side is exploded to the 2-3 candidate buckets
    its window spans.  The join is then a pure equi-join on
    (key, bucket): shuffle-partitioned, skew-splittable by AQE, and each
    probe only sees candidates already within one bucket width of the
    window.
    """
    keys = [on] if isinstance(on, str) else list(on)
    width = max(upper_us - lower_us, 1)

    lo_b = F.floor((_epoch_us(F.col(left_ts)) + F.lit(lower_us)) / F.lit(width))
    hi_b = F.floor((_epoch_us(F.col(left_ts)) + F.lit(upper_us)) / F.lit(width))
    l2 = left.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))

    r2 = right.withColumn(
        "__bucket", F.floor(_epoch_us(F.col(right_ts)) / F.lit(width))
    )
    r2 = r2.select(
        "__bucket",
        *[F.col(k).alias(k) for k in keys],
        *[
            F.col(c).alias(c + "_r")
            for c in right.columns
            if c not in keys
        ],
    )

    joined = l2.join(r2, keys + ["__bucket"]).drop("__bucket")
    delta = _epoch_us(F.col(right_ts + "_r")) - _epoch_us(F.col(left_ts))
    lo_ok = delta >= F.lit(lower_us) if lower_inclusive else delta > F.lit(lower_us)
    hi_ok = delta <= F.lit(upper_us) if upper_inclusive else delta < F.lit(upper_us)
    return joined.where(lo_ok & hi_ok).withColumn("delta_us", delta)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Gap-based sessionization: events of one user separated by more than
    ``gap_us`` start a new session (the classic clickstream/session-window
    semantics; the streaming twin is ``F.session_window`` in
    streaming/events.py).

    One shuffle total: the lag and the running sum share the same
    (user) partitioning, so Catalyst plans a single exchange + one sort —
    the formulation that scales to 100 TB of events.  ``order_cols``
    breaks timestamp ties deterministically."""
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    t = _epoch_us(F.col(ts_col))
    prev = F.lag(t).over(w)
    new_session = F.when(prev.isNull() | ((t - prev) > gap_us), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("__new_session", new_session)
        .withColumn("session_no", F.sum("__new_session").over(running).cast("long"))
        .drop("__new_session")
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    window_us: int = 259_200_000_000,  # 72 h
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    per_occurrence: bool = False,
) -> DataFrame:
    """Sequential conversion FUNNEL (round 9): per user, a strictly-
    ordered chain step1 < step2 < ... with every later step inside
    ``window_us`` of the chain's step-1 time; returns (step,
    event_type, users) — the DISTINCT-users-reached count per stage.

    Two attribution modes:

    - ``per_occurrence=False`` (default): the chain may only start at
      the user's EARLIEST step-1 event (the round-9 semantics — cheap,
      one start per user, but a user whose first attempt expires and
      who later converts from a fresh start does NOT count);
    - ``per_occurrence=True``: the chain may start at ANY step-1
      occurrence (the re-attempt window semantics of production funnel
      tools) — a user counts at stage k iff SOME start completes k
      steps.  Greedy earliest-next-step per start is exact for this
      existence question: for a fixed start, taking the earliest valid
      next event maximizes the remaining slack.

    Shape: per stage one type-filtered min() aggregation joined back on
    the USER key — k-1 user-keyed equi-joins for a k-step funnel, each
    map-side-combinable, never a self-cross of events; at 100 TB the
    per-stage frames shrink monotonically (conversion), so every join
    after the first is against a smaller right side (AQE broadcasts
    the tail stages).  per_occurrence multiplies the chain-frame rows
    by the user's step-1 occurrence count (bounded by that user's
    event history, never by the corpus)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    t = _epoch_us(F.col(ts_col))
    ev = df.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), t.alias("tu")
    )
    firsts = ev.filter(F.col("et") == steps[0])
    if per_occurrence:
        cur = (
            firsts.select("u", F.col("tu").alias("t1"))
            .distinct()
            .withColumn("tprev", F.col("t1"))
        )
    else:
        cur = (
            firsts.groupBy("u")
            .agg(F.min("tu").alias("t1"))
            .withColumn("tprev", F.col("t1"))
        )
    stage_frames = [cur]
    for s in steps[1:]:
        nxt = (
            ev.filter(F.col("et") == s)
            .join(cur.select("u", "t1", "tprev"), "u")
            .filter(
                (F.col("tu") > F.col("tprev"))
                & (F.col("tu") <= F.col("t1") + F.lit(window_us))
            )
            .groupBy("u", "t1")
            .agg(F.min("tu").alias("tprev"))
        )
        stage_frames.append(nxt)
        cur = nxt
    out = None
    for i, (s, frame) in enumerate(zip(steps, stage_frames)):
        c = frame.agg(
            F.lit(i + 1).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            F.count_distinct(F.col("u")).alias("users"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly COHORT RETENTION (round 9): users cohort by the week of
    their FIRST event; each (cohort_week, week_offset) cell counts the
    cohort's users active that week.  Two aggregations sharing the user
    key (first-seen, then distinct user-week) and one join — the
    standard retention triangle, exactly replayable (week boundaries
    are date_trunc, offsets are integer µs division)."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = df.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = df.select(
        F.col(user_col).alias("u"), wk.alias("aweek")
    ).distinct()
    offs = (
        (_epoch_us(F.col("aweek")) - _epoch_us(F.col("cohort_week")))
        / F.lit(7 * 86_400_000_000)
    ).cast("int")
    return (
        active.join(first, "u")
        .select("cohort_week", offs.alias("week_offset"), "u")
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("active_users"))
    )


def ema_by_group(
    df: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    alpha: float = 0.5,
    out_col: str = "ema",
) -> DataFrame:
    """Per-entity EXPONENTIAL MOVING AVERAGE (round 9): ema_0 = v_0,
    ema_t = α·v_t + (1-α)·ema_{t-1} over each group's time-ordered
    values — the recursive fold window functions cannot express.

    Shape: ONE group-keyed shuffle collects each entity's ordered
    series, a single array fold computes the whole EMA chain, and a
    posexplode returns per-row results.  The per-group array is the
    documented bound — this is a per-entity-time-series op (an
    entity's history must fit a task, the same contract as
    ``interpolate_linear``), not a corpus-wide scan state.

    Exactness: the fold is one fixed-order chain of α·v + (1-α)·acc
    IEEE ops, so an external engine replaying each prefix reproduces
    every double bit-for-bit (any closed-form re-association would
    not)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha={alpha}: need 0 < alpha <= 1")
    a = F.lit(float(alpha))
    one_m = F.lit(1.0 - float(alpha))
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                *[F.col(c).alias(c) for c in order_cols],
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    grouped = df.groupBy(F.col(group_col).alias("__g")).agg(seq.alias("__seq"))
    emas = F.aggregate(
        F.col("__seq"),
        F.array().cast("array<double>"),
        lambda acc, x: F.array_append(
            acc,
            F.when(F.size(acc) == 0, x["v"]).otherwise(
                a * x["v"] + one_m * F.element_at(acc, -1)
            ),
        ),
    )
    exploded = grouped.withColumn("__emas", emas).select(
        "__g", F.posexplode(F.arrays_zip(F.col("__seq"), F.col("__emas")))
    ).select(
        F.col("__g").alias(group_col),
        F.col("col")["__seq"]["ts"].alias(ts_col),
        *[F.col("col")["__seq"][c].alias(c) for c in order_cols],
        F.col("col")["__seq"]["v"].alias(value_col),
        F.col("col")["__emas"].alias(out_col),
    )
    return exploded


def resample_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Time-series resample with gap fill: aggregate ``value_col`` into
    fixed ``step`` buckets per group, then emit EVERY bucket in the
    group's [min, max] span — empty buckets appear with n=0 / sum=0
    (the regularized series every downstream window/forecast op needs;
    a naive GROUP BY silently skips empty buckets and corrupts
    lag/rolling computations).

    Scale shape: one aggregation shuffle on (group, bucket); the dense
    axis is generated per group with ``sequence`` + ``explode`` off the
    group's own 2-row (min,max) aggregate — never a driver-side range
    or a global calendar table — and joined back to the sparse buckets
    on the same key, so skew is bounded by a group's span/step.  Sums
    aggregate in DECIMAL and exit as DOUBLE (DecimalRenderPolicy).

    NULL handling: a NULL group key is a real group (the join is
    null-safe, so its buckets fill like any other's); rows with a NULL
    timestamp cannot land in any bucket and pass through as a single
    ``bucket IS NULL`` row per group rather than silently vanishing.
    ``n_vals`` counts the rows whose VALUE is non-null — the anchor
    count interpolate_linear needs (an all-NULL-value bucket has
    n>0 but no usable reading)."""
    groups = list(group_cols or [])
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.window(
        F.col(ts_col), step
    )["start"]
    sparse = (
        df.withColumn("__bucket", bucket)
        .groupBy(*groups, "__bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(value_col)).alias("n_vals"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
        )
    )
    with_bucket = sparse.filter(F.col("__bucket").isNotNull())
    null_bucket = sparse.filter(F.col("__bucket").isNull())
    span = with_bucket.groupBy(*groups).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    dense = span.select(
        *groups,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("__bucket"),
    )
    # null-safe equi-join: a NULL group key must still match its own
    # dense axis (plain `=` drops the whole group's data as n=0)
    cond = F.col("d.__bucket") == F.col("s.__bucket")
    for g in groups:
        cond = cond & F.col(f"d.{g}").eqNullSafe(F.col(f"s.{g}"))
    joined = dense.alias("d").join(with_bucket.alias("s"), cond, "left")
    out = joined.select(
        *[F.col(f"d.{g}").alias(g) for g in groups],
        F.col("d.__bucket").alias("bucket"),
        F.coalesce("s.n", F.lit(0)).cast("long").alias("n"),
        F.coalesce("s.n_vals", F.lit(0)).cast("long").alias("n_vals"),
        F.coalesce(F.col("s.__sum").cast("double"), F.lit(0.0)).alias("sum_value"),
    )
    passthrough = null_bucket.select(
        *groups,
        F.col("__bucket").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.col("n_vals").cast("long").alias("n_vals"),
        F.coalesce(F.col("__sum").cast("double"), F.lit(0.0)).alias("sum_value"),
    )
    return out.unionByName(passthrough)


def interpolate_linear(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Gauge-style gap fill: resample to ``step`` buckets and LINEARLY
    interpolate the value for empty buckets between their nearest
    observed neighbors (counts fill with zero — see resample_gapfill —
    but a gauge's missing reading is 'between the neighbors', not 0).
    Buckets before the first / after the last observation stay NULL.

    Per observed bucket the anchor is sum/count in exact decimal cast
    to double, so both the anchors and the lerp are deterministic IEEE
    expressions an external engine replays bit-for-bit.  Scale: the
    resample's one shuffle plus two ordered windows per group (forward
    fill of the previous anchor, backward fill of the next) — window
    state is a single row each way, skew bounded by a group's span."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    filled = resample_gapfill(df, ts_col, groups, value_col, step).filter(
        F.col("bucket").isNotNull()  # NULL-ts pass-through rows have no axis position
    )
    # anchor on rows with an actual reading: a bucket whose rows all have
    # NULL values is a GAP to interpolate through, not a 0.0 observation
    obs_val = F.when(
        F.col("n_vals") > 0, F.col("sum_value") / F.col("n_vals").cast("double")
    )
    base = filled.withColumn("__obs", obs_val).withColumn(
        # micros/1e6 is exact for whole buckets; _epoch_us centralizes the
        # NTZ/session-timezone contract (UTC pinned by catalog.load_table)
        "__epoch", (_epoch_us(F.col("bucket")) / F.lit(1000000.0))
    )
    fwd = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("__obs", ignorenulls=True).over(fwd)
    next_v = F.first("__obs", ignorenulls=True).over(bwd)
    prev_t = F.last(F.when(F.col("__obs").isNotNull(), F.col("__epoch")), True).over(fwd)
    next_t = F.first(F.when(F.col("__obs").isNotNull(), F.col("__epoch")), True).over(bwd)
    lerp = F.when(F.col("__obs").isNotNull(), F.col("__obs")).otherwise(
        prev_v + (next_v - prev_v) * ((F.col("__epoch") - prev_t) / (next_t - prev_t))
    )
    return base.select(
        *groups,
        "bucket",
        "n",
        "n_vals",
        lerp.alias("value_interp"),
    )


def seasonal_decompose(
    df: DataFrame,
    group_col: str,
    hour_col: str,
    value_col: str,
    period: int = 24,
    half_window: int = 12,
) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition of an evenly-spaced
    integer series (the moving-average method of Cleveland/STL's
    ancestor): value = trend + seasonal + residual, per ``group_col``.

    - trend(t) = centered moving average over 2·half_window+1 points
      (edges with an incomplete window are DROPPED — only full windows
      decompose, so every divisor is the constant window size W);
    - seasonal(p) = mean of the detrended values at phase
      p = hour mod ``period``;
    - residual = detrended − seasonal.

    Exactness: the input is INTEGER counts, so the windowed sum and
    the per-phase sums are order-independent integer aggregations; the
    detrended value is carried as the integer numerator
    d = W·v − window_sum (denominator W), and every emitted double is
    one fixed division chain — trend = s/W, detrended = d/W,
    seasonal = (Σd/n)/W, residual = detrended − seasonal — replayed
    bit-for-bit by any engine.

    Scale shape: one group-keyed ordered window (state = W rows per
    group), one (group, phase)-keyed aggregation, one broadcast-sized
    join back on (group, phase).  Hours need not start anywhere
    particular but must be CONTIGUOUS per group — run
    :func:`resample_gapfill` first on sparse series."""
    if period < 2 or half_window < 1:
        raise ValueError(f"period >= 2 and half_window >= 1 required")
    from pyspark.sql import Window

    w_size = 2 * half_window + 1
    w = (
        Window.partitionBy(group_col)
        .orderBy(hour_col)
        .rowsBetween(-half_window, half_window)
    )
    base = df.select(
        F.col(group_col),
        F.col(hour_col).cast("long").alias("h"),
        F.col(value_col).cast("long").alias("v"),
    )
    with_w = base.withColumn("__s", F.sum("v").over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(w)
    )
    full = with_w.filter(F.col("__cnt") == w_size).withColumn(
        "__d", F.lit(w_size) * F.col("v") - F.col("__s")
    )
    phase = (F.col("h") % period).alias("phase")
    seas = (
        full.select(group_col, phase, "__d")
        .groupBy(group_col, "phase")
        .agg(F.sum("__d").alias("__dn"), F.count(F.lit(1)).alias("__dc"))
    )
    wd = F.lit(float(w_size))
    out = (
        full.withColumn("phase", F.col("h") % period)
        .join(seas, [group_col, "phase"])
        .select(
            group_col,
            F.col("h").alias(hour_col),
            F.col("v").alias(value_col),
            (F.col("__s").cast("double") / wd).alias("trend"),
            (
                (F.col("__dn").cast("double") / F.col("__dc").cast("double")) / wd
            ).alias("seasonal"),
            (
                (F.col("__d").cast("double") / wd)
                - (F.col("__dn").cast("double") / F.col("__dc").cast("double")) / wd
            ).alias("residual"),
        )
    )
    return out


def cusum_flags(
    df: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 1.0,
) -> DataFrame:
    """Two-sided CUSUM drift detection (Page 1954) per entity — the
    classic streaming change-point statistic quality monitors run over
    metric series (a data pipeline's per-source document-quality drift
    alarm).  Recursions:

        S+_t = max(0, S+_{t-1} + (v_t - target - slack))
        S-_t = max(0, S-_{t-1} - (v_t - target + slack))

    with an alarm where either side exceeds ``threshold``.

    The recursion is NOT computed as a sequential fold: with
    P_t = prefix-sum of the increments, the identity
    S_t = P_t - min(0, min_{j<=t} P_j) turns each side into ONE running
    sum + ONE running min — two ordinary window functions over the
    same (entity, time) ordering, a single group-keyed shuffle, no
    per-entity arrays, no state beyond the window frame.  That is the
    100 TB-shape (compare ``ema_by_group``, whose recursion genuinely
    needs the per-entity fold).

    Exactness: each increment is one fixed IEEE chain
    (v - (target+slack), identical in any engine) cast to
    DECIMAL(18,6) per the repo numeric policy, so prefix sums and mins
    are exact and order-independent; both cusum columns and the alarm
    are engine-exact."""
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    from pyspark.sql import Window

    up = float(target) + float(slack)
    dn = float(target) - float(slack)
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    inc_p = (v - F.lit(up)).cast("decimal(18,6)")
    inc_n = (F.lit(dn) - v).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    h = F.lit(float(threshold)).cast("decimal(18,6)")
    out = (
        df.withColumn("__pp", F.sum(inc_p).over(w))
        .withColumn("__pn", F.sum(inc_n).over(w))
        .withColumn("__mp", F.min(F.col("__pp")).over(w))
        .withColumn("__mn", F.min(F.col("__pn")).over(w))
        .select(
            F.col(group_col),
            F.col(ts_col),
            *[F.col(c) for c in order_cols],
            F.col(value_col),
            (F.col("__pp") - F.least(zero, F.col("__mp"))).alias("cusum_pos"),
            (F.col("__pn") - F.least(zero, F.col("__mn"))).alias("cusum_neg"),
        )
        .withColumn(
            "alarm",
            (F.col("cusum_pos") > h) | (F.col("cusum_neg") > h),
        )
    )
    return out


def acf_by_group(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Sample AUTOCORRELATION function per series — the seasonality /
    periodicity detector that picks the ``period`` argument for
    :func:`seasonal_decompose` (a 24-hour cycle shows as an acf peak at
    lag 24).  Input is an evenly-spaced INTEGER series per group
    (contiguous ``t_col``, integer ``value_col`` — run
    :func:`resample_gapfill` first on sparse series).

    acf(k) = Σ_{t≤n−k} c_t·c_{t+k} / Σ_t c_t²  with  c_t = n·x_t − Σx
    (centering scaled by n, the :func:`seasonal_decompose` /
    ``pca_power`` trick) — every sum is order-independent integer
    arithmetic and each emitted double is ONE integer division, so any
    engine replays it bit-for-bit.  c_t stays BIGINT (|c_t| ≤ n·max x)
    but the squared-centered products are DECIMAL(38,0) (HUGEINT in a
    SQL replica) — n·v around 3e9 squares past int64, the same
    envelope chi2_keywords/pca_power widen for.

    Scale shape: one per-group (n, Σx) aggregation broadcast back, ONE
    ordered window pass computing all ``max_lag`` leads, one per-group
    aggregation — group-keyed shuffles only, state bounded by
    max_lag rows per window frame.  Returns (group, lag, n, acf);
    groups shorter than lag+1 emit NULL acf for that lag, and
    zero-variance groups (constant series, Σc² = 0) emit NULL acf for
    every lag rather than dividing by zero."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    from pyspark.sql import Window

    g, t, v = group_col, t_col, value_col
    stats = df.groupBy(g).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(F.col(v).cast("long")).alias("__s")
    )
    c = df.join(F.broadcast(stats), g).select(
        F.col(g),
        F.col(t),
        (F.col("__n") * F.col(v).cast("long") - F.col("__s")).alias("__c"),
        "__n",
    )
    w = Window.partitionBy(g).orderBy(t)
    leads = c.select(
        g,
        "__n",
        "__c",
        *[F.lead("__c", k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [
        F.sum(d38(F.col("__c")) * d38(F.col("__c"))).alias("__den"),
        F.max("__n").alias("n"),
    ] + [
        F.sum(d38(F.col("__c")) * d38(F.col(f"__l{k}"))).alias(f"__num{k}")
        for k in range(1, max_lag + 1)
    ]
    per = leads.groupBy(g).agg(*aggs)
    lag_structs = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.when(
                    F.col("__den") != 0,
                    F.col(f"__num{k}").cast("double")
                    / F.col("__den").cast("double"),
                ).alias("acf"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    return per.select(g, "n", F.explode(lag_structs).alias("__x")).select(
        g, F.col("__x.lag").alias("lag"), F.col("n"), F.col("__x.acf").alias("acf")
    )


def trend_ols_by_group(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares TREND over an integer series —
    the drift detector for metric monitoring (is this source's volume /
    quality score rising or falling?).  With x = t − min(t) and integer
    y, both closed-form coefficients are ONE integer division each:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    Every sum is order-independent BIGINT arithmetic, so slope and
    intercept are engine-exact doubles.  Groups with a degenerate
    x-variance (a single point) emit NULL coefficients.

    Scale shape: one per-group min broadcast back, ONE aggregation with
    map-side partials — nothing beyond two group-keyed shuffles."""
    from pyspark.sql import functions as _F

    g, t, v = group_col, t_col, value_col
    mins = df.groupBy(g).agg(_F.min(t).alias("__t0"))
    base = df.join(_F.broadcast(mins), g).select(
        _F.col(g),
        (_F.col(t) - _F.col("__t0")).cast("long").alias("__x"),
        _F.col(v).cast("long").alias("__y"),
    )
    per = base.groupBy(g).agg(
        _F.count(_F.lit(1)).alias("n"),
        _F.sum("__x").alias("__sx"),
        _F.sum("__y").alias("__sy"),
        _F.sum(_F.col("__x") * _F.col("__y")).alias("__sxy"),
        _F.sum(_F.col("__x") * _F.col("__x")).alias("__sxx"),
    )
    den = per["n"] * per["__sxx"] - per["__sx"] * per["__sx"]
    return per.select(
        g,
        _F.col("n").cast("long").alias("n"),
        _F.when(
            den != 0,
            (per["n"] * per["__sxy"] - per["__sx"] * per["__sy"]).cast("double")
            / den.cast("double"),
        ).alias("slope"),
        _F.when(
            den != 0,
            (per["__sy"] * per["__sxx"] - per["__sx"] * per["__sxy"]).cast("double")
            / den.cast("double"),
        ).alias("intercept"),
    )
