"""Training-corpus sampling ops (north-star, beyond the reference):
deterministic train/val/test splits, weighted per-source mixture
sampling, and concat-and-chunk sequence packing.

Every op here must be (a) deterministic — re-running the pipeline
yesterday, today, or after a task retry yields byte-identical splits —
and (b) cross-engine checkable.  Both follow from one building block:
a PORTABLE content hash.  ``xxhash64`` is Spark-only, so these ops hash
with ``md5(id || salt)`` and compare the leading hex digits
lexicographically against a precomputed threshold literal — md5 yields
identical lowercase hex in every engine, and a k-hex-digit prefix
compare is a uniform draw from 16^k buckets.  (md5 costs more than
xxhash64 per row, but both are single-pass narrow maps; at 100 TB the
scan dominates either.)

Scale design:
- split/mixture: pure narrow maps — no shuffle at all, any filter on the
  assigned split pushes into the same stage as the scan;
- packing: a distributed HIERARCHICAL prefix sum (per-shard windows,
  with the per-shard totals recursing through parent-partitioned
  windows, log-depth) — no global single-partition window, and no
  broadcast of any frame that grows with the corpus: the classic
  scale-killers in naive cumsum formulations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_hex_prefix(col: Column, salt: str, k: int = 6) -> Column:
    """First k hex chars of md5(col || salt) — a portable uniform draw
    from 16^k buckets, identical in Spark / DuckDB / any engine with
    standard md5."""
    return F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, k)


def rate_threshold_hex(rate: float, k: int = 6) -> str:
    """Hex literal t such that P(hash_hex_prefix < t) == round(rate*16^k)/16^k.
    rate >= 1 returns 'g', which lexicographically exceeds every k-digit
    hex string (a k+1-digit numeric literal like '1000000' would NOT —
    string compare is not numeric compare)."""
    n = 16**k
    v = min(n, max(0, round(rate * n)))
    if v >= n:
        return "g"
    return format(v, f"0{k}x")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given probabilities,
    deterministically from the id: same id -> same split, forever, on
    any engine and any cluster size.  Narrow map, no shuffle."""
    total = sum(weights.values())
    h = hash_hex_prefix(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(rate_threshold_hex(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out, expr)


def weighted_mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row with its group's sampling rate (corpus mixture
    weighting: e.g. keep 100% of books, 10% of common-crawl).
    Deterministic per id; a group absent from `rates` gets
    `default_rate`.  Narrow map, no shuffle, no sampleBy() (whose
    Bernoulli draws are seed- and partitioning-dependent)."""
    h = hash_hex_prefix(F.col(id_col), salt)
    # CASE-on-group semantics: a row whose group is listed gets EXACTLY
    # its group's threshold (no fallthrough to the default when the draw
    # fails — `when(group & draw)` chains would re-test failed rows
    # against the default rate, inflating the sample)
    expr = None
    for g, r in rates.items():
        pred = h < F.lit(rate_threshold_hex(r))
        expr = (
            F.when(F.col(group_col) == g, pred)
            if expr is None
            else expr.when(F.col(group_col) == g, pred)
        )
    default_pred = h < F.lit(rate_threshold_hex(default_rate))
    expr = default_pred if expr is None else expr.otherwise(default_pred)
    return df.filter(expr)


def _prefix_offsets(
    totals: DataFrame,
    shard_col: str,
    tot_col: str,
    out: str,
    fanout: int,
    max_shard: int,
    _level: int = 0,
) -> DataFrame:
    """Exclusive prefix sum over a per-shard totals frame, HIERARCHICAL:
    each level's window partitions by the parent shard (key // fanout)
    and the per-parent totals recurse, until the surviving frame is
    bounded by ``fanout`` rows — only THAT window runs unpartitioned,
    over a frame whose size is a fixed constant, never proportional to
    the data.  Depth is ceil(log_fanout(max_shard)) — 3 levels at
    fanout 4096 already cover ~7e10 shards — so no stage anywhere in
    the tree exceeds ``fanout`` rows per task.

    This removes the two scale hazards of the flat formulation (one
    global unpartitioned window over n/shard_size rows, plus a forced
    broadcast of that frame): every join here is a plain equi-join on
    the shard key, left to AQE to broadcast when genuinely small."""
    if fanout < 2:
        # fanout 1 would never shrink max_shard — recursion could not
        # terminate; fail at plan build, not with a RecursionError
        raise ValueError(f"prefix-sum fanout must be >= 2, got {fanout}")
    if max_shard < fanout:
        # bounded base case: <= fanout rows.  Partition by the parent
        # expression — provably single-valued here (shards are
        # non-negative and < fanout, so shard div fanout == 0 for every
        # row) — rather than leaving the spec empty: execution is the
        # same single tiny partition, but the plan carries no
        # unpartitioned window, so Spark's "No Partition Defined" scale
        # warning never fires for a stage that is bounded by design.
        # (A literal partition key would be constant-folded away.)
        # The invariant itself is RUNTIME-CHECKED: a caller-supplied
        # max_key that underestimates the true maximum would otherwise
        # split this partition and silently restart the prefix at 0.
        w = (
            Window.partitionBy(F.expr(f"`{shard_col}` div {fanout}"))
            .orderBy(shard_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        val = F.coalesce(F.sum(tot_col).over(w), F.lit(0)).cast("long")
        guard_ok = (F.col(shard_col) >= 0) & (F.col(shard_col) < fanout)
        return totals.withColumn(
            out,
            F.when(guard_ok, val).otherwise(
                F.raise_error(
                    F.lit(
                        "prefix-sum invariant violated: shard id outside "
                        "[0, fanout) at the bounded base case — max_key "
                        "was underestimated or keys are negative"
                    )
                ).cast("long")
            ),
        )
    p, ploc, ptot, poff = (
        f"__p{_level}",
        f"__ploc{_level}",
        f"__ptot{_level}",
        f"__poff{_level}",
    )
    w_in = (
        Window.partitionBy(p)
        .orderBy(shard_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integral `div`, never double division: above 2^53 a double quotient
    # can round UP across a shard boundary and split/merge parent groups
    local = totals.withColumn(
        p, F.expr(f"`{shard_col}` div {fanout}")
    ).withColumn(ploc, F.coalesce(F.sum(tot_col).over(w_in), F.lit(0)).cast("long"))
    parent_totals = local.groupBy(p).agg(F.sum(tot_col).cast("long").alias(ptot))
    parent_offsets = _prefix_offsets(
        parent_totals, p, ptot, poff, fanout, max_shard // fanout, _level + 1
    )
    return (
        local.join(parent_offsets.select(p, poff), p)
        .withColumn(out, (F.col(ploc) + F.col(poff)).cast("long"))
        .drop(p, ploc, poff)
    )


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "running",
    shard_size: int = 4096,
    max_key: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of `value_col` in `order_col` order, computed
    DISTRIBUTED: a window inside each contiguous shard of the key space
    plus a HIERARCHICAL prefix sum of the per-shard totals (see
    :func:`_prefix_offsets`).  Equivalent to
    ``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING ... 1 PRECEDING)``
    but with no single-partition window (and no broadcast) over any
    frame that grows with the data: the only unpartitioned stage is the
    top of the offsets tree, bounded by ``shard_size`` rows regardless
    of corpus size.

    ``max_key`` sizes the tree depth; when None it is computed with one
    cheap column-pruned ``max()`` job over ``df`` at plan-build time —
    pass it explicitly to keep the builder lazy.  An OVERestimate only
    deepens the tree by empty levels; an UNDERestimate (or negative
    keys, whose pre-check only runs on the computed path) is caught by
    a runtime guard at the bounded base case rather than silently
    corrupting the sums."""
    numeric = {"tinyint", "smallint", "int", "bigint"}
    if dict(df.dtypes).get(order_col) not in numeric:
        # a NULL __shard (string id cast to long) silently drops rows at
        # the offsets join — fail loudly instead
        raise ValueError(
            f"global_running_sum needs an integral order column; "
            f"{order_col!r} is {dict(df.dtypes).get(order_col)!r}"
        )
    if shard_size < 2:
        raise ValueError(f"shard_size must be >= 2, got {shard_size}")
    if max_key is None:
        b = df.agg(
            F.max(F.col(order_col).cast("long")).alias("mx"),
            F.min(F.col(order_col).cast("long")).alias("mn"),
        ).first()
        if b["mn"] is not None and b["mn"] < 0:
            # the offsets tree's bounded base case relies on shard ids
            # being non-negative (shard // fanout == 0 there); negative
            # keys would silently split that partition
            raise ValueError(
                f"global_running_sum needs non-negative keys; "
                f"min({order_col}) = {b['mn']}"
            )
        max_key = 0 if b["mx"] is None else int(b["mx"])
    # integral `div`: double division misassigns shards above 2^53
    shard = F.expr(f"CAST(`{order_col}` AS BIGINT) div {shard_size}")
    w_in = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("__shard", shard).withColumn(
        "__local", F.coalesce(F.sum(value_col).over(w_in), F.lit(0)).cast("long")
    )
    # negative-key runtime guard at the LEVEL-0 totals (one row per
    # shard, so the per-row check is O(shards), not O(rows)): at tree
    # depth >= 2 a negative shard's parent can truncate to 0 and slip
    # past the base-case guard, so it must be caught here — this also
    # covers the explicit-max_key path that skips the plan-time check
    shard_totals = local.groupBy("__shard").agg(
        F.sum(value_col).cast("long").alias("__t0")
    ).select(
        "__shard",
        F.when(F.col("__shard") >= 0, F.col("__t0"))
        .otherwise(
            F.raise_error(
                F.lit("global_running_sum: negative key encountered")
            ).cast("long")
        )
        .alias("__tot"),
    )
    offsets = _prefix_offsets(
        shard_totals, "__shard", "__tot", "__off", shard_size, max_key // shard_size
    ).select("__shard", "__off")
    return (
        local.join(offsets, "__shard")
        .withColumn(out, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__shard", "__local")
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column,
    capacity: int = 512,
    shard_size: int = 128,
) -> DataFrame:
    """Greedy no-split sequence packing: documents fill a bin in id order
    until the next one would overflow `capacity`, then a new bin opens
    (docs larger than capacity occupy their own bin).  Unlike
    ``pack_chunks`` (concat-and-cut, docs may straddle windows), bins
    here never split a document — the packing used when example
    boundaries must be respected.

    Scale design: greedy packing is inherently sequential, so it runs
    per SHARD of the id space (`id // shard_size`) as an Arrow-batched
    ``applyInPandas`` kernel — each shard's recursion is a few hundred
    rows of driver-free pandas — and shard-local bin numbers flatten to
    global ones with the hierarchical prefix sum of
    :func:`_prefix_offsets` (the per-shard bin counts recurse through
    parent-partitioned windows, so no unpartitioned window or broadcast
    ever sees a frame proportional to corpus size, even though the
    greedy kernel keeps ``shard_size`` small).  Bins never span shards
    by construction, which is exactly what makes the op parallel; the
    oracle replays the identical per-shard recursion.  The tree depth
    comes from one cheap ``max(id)`` scan of the input — the kernel
    itself is never run twice."""
    if shard_size < 2:
        raise ValueError(f"shard_size must be >= 2, got {shard_size}")
    shard = F.expr(f"CAST(`{id_col}` AS BIGINT) div {shard_size}")
    toks = df.select(
        F.col(id_col),
        n_tokens_col.cast("long").alias("n_tokens"),
        shard.alias("__shard"),
    )
    b = toks.agg(F.max("__shard").alias("mx"), F.min("__shard").alias("mn")).first()
    if b["mn"] is not None and b["mn"] < 0:
        raise ValueError(f"pack_bins needs non-negative ids; min shard = {b['mn']}")
    max_shard = 0 if b["mx"] is None else int(b["mx"])

    def kernel(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = []
        b, fill, first = 0, 0, True
        for n in pdf["n_tokens"]:
            n = int(n)
            if first:
                first = False
                fill = n
            elif fill + n <= capacity:
                fill += n
            else:
                b += 1
                fill = n
            bins.append(b)
        pdf["local_bin"] = bins
        return pdf[[id_col, "n_tokens", "__shard", "local_bin"]]

    packed = toks.groupBy("__shard").applyInPandas(
        kernel, f"{id_col} long, n_tokens long, __shard long, local_bin long"
    )
    counts = packed.groupBy("__shard").agg(
        (F.max("local_bin") + 1).cast("long").alias("__nb")
    )
    # hierarchical offsets with a WIDE fanout: the greedy kernel wants a
    # small shard_size, but the offsets tree can fan 4096× per level —
    # depth stays logarithmic and every window stage is partitioned
    offs = _prefix_offsets(
        counts, "__shard", "__nb", "__off", 4096, max_shard
    ).select("__shard", "__off")
    return (
        packed.join(offs, "__shard")
        .select(
            id_col,
            "n_tokens",
            (F.col("local_bin") + F.col("__off")).cast("long").alias("bin"),
        )
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column,
    chunk_tokens: int = 2048,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style): documents are
    concatenated in `id_col` order into one token stream cut into fixed
    windows of `chunk_tokens`; each doc reports the chunk range it lands
    in.  Built on the distributed prefix sum above — deterministic and
    shuffle-light at any scale."""
    toks = df.select(F.col(id_col), n_tokens_col.cast("long").alias("n_tokens"))
    offs = global_running_sum(toks, id_col, "n_tokens", out="start_offset")
    return offs.select(
        id_col,
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / chunk_tokens).cast("long").alias("first_chunk"),
        (
            F.when(F.col("n_tokens") > 0, (F.col("start_offset") + F.col("n_tokens") - 1))
            .otherwise(F.col("start_offset"))
            / chunk_tokens
        )
        .cast("long")
        .alias("last_chunk"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat",
    rank_col: str = "strat_rank",
) -> DataFrame:
    """Exact-size uniform sample per stratum: exactly ``min(n, |stratum|)``
    rows from every stratum, chosen uniformly (order by a portable content
    hash) and deterministically (same ids selected on any engine, any
    cluster size, any day).  The balanced-eval-set builder: 'give me 100
    docs per (source, lang) cell' — where Bernoulli `sampleBy` can only
    promise an EXPECTED count and changes with seed/partitioning.

    Scale: ROW_NUMBER over (strata, hash-order) compiles to Spark's
    WindowGroupLimit — map tasks pre-prune each stratum to its top n
    BEFORE the shuffle, so the exchange moves O(strata × n) rows, not the
    table.  One shuffle, skew-bounded by n itself; the md5 draw is a
    narrow map folded into the scan stage."""
    draw = hash_hex_prefix(F.col(id_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(draw.asc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n_per_stratum
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    cap: int = 1000,
    order_cols: list[Column] | None = None,
    id_col: str = "doc_id",
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Per-domain contribution cap (the Gopher/FineWeb-style curation op):
    keep at most ``cap`` documents per ``domain_col``, best-first by
    ``order_cols`` (tie-broken by ``id_col`` so the kept set is
    deterministic).  Stops one over-crawled domain from dominating the
    training mixture.

    Scale: ROW_NUMBER + rank filter compiles to Spark's WindowGroupLimit —
    each map task pre-prunes every group to its top ``cap`` BEFORE the
    shuffle, so the exchange moves O(domains × cap) rows, not the corpus.
    One shuffle total, skew-bounded by the cap itself."""
    order = list(order_cols) if order_cols else []
    w = Window.partitionBy(domain_col).orderBy(*order, F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def hash_unit_draw(col: Column, salt: str, k: int = 6) -> Column:
    """Portable uniform draw in [0, 1): the leading k hex digits of
    md5(col || salt) read as an integer over 16^k.  Numeric (unlike the
    prefix-compare draw above), so per-row thresholds can depend on row
    values — and still bit-reproducible in any engine with md5."""
    hexs = F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, k)
    return F.conv(hexs, 16, 10).cast("double") / F.lit(float(16**k))


def hash_unit_draw_sql(expr: str, salt: str, k: int = 6) -> str:
    """The exact same draw as an ANSI-SQL expression (DuckDB oracle):
    digit-expansion replay of base-16 -> integer (no CONV builtin
    needed), identical division."""
    h = f"md5(CAST({expr} AS VARCHAR) || '{salt}')"
    terms = [
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (k - 1 - i)}"
        for i in range(k)
    ]
    return f"(CAST({' + '.join(terms)} AS DOUBLE) / {float(16 ** k)})"


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    budget_frac: float = 0.5,
    salt: str = "temp-mix",
) -> DataFrame:
    """Temperature-based mixture rebalancing at τ = 1/2 (round 9) — the
    mT5/XLM-R recipe for multilingual corpora: per-group sampling
    probability ∝ (group share)^τ, which UP-samples tails and
    DOWN-samples heads relative to natural frequency.  τ is fixed at
    1/2 so the weight is an IEEE-exact ``sqrt`` (general τ needs libm
    ``pow``, which would break the oracle-exactness discipline; for
    other temperatures compute rates offline and use
    :func:`weighted_mixture_sample`).

    Rates derive ENTIRELY in-frame (no driver collect): per-group
    counts, Σ√n folded in EXPLICIT group order (a plain float SUM over
    groups would be partial-agg-order dependent), then
    r_g = min(1, budget_frac·N/Σ√n · 1/√n_g) and a portable per-id unit
    draw decides each row.  Clipping at 1 makes the realized budget a
    lower bound (documented).  Output = kept rows + their group's
    ``mix_rate``.  One count aggregation + one broadcast join + a
    narrow filter."""
    stats = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    folded = stats.agg(
        F.sum("__n").alias("__tot"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("__g").alias("g"), F.col("__n").alias("n")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n"].cast("double")),
        ).alias("__s"),
    )
    rates = (
        stats.crossJoin(F.broadcast(folded))
        .select(
            "__g",
            F.least(
                F.lit(1.0),
                (
                    F.lit(float(budget_frac))
                    * F.col("__tot").cast("double")
                    / F.col("__s")
                )
                / F.sqrt(F.col("__n").cast("double")),
            ).alias("mix_rate"),
        )
    )
    draw = hash_unit_draw(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates), df[group_col] == rates["__g"])
        .where(draw < F.col("mix_rate"))
        .drop("__g")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target_n: float,
    salt: str = "wsamp",
) -> DataFrame:
    """Weight-proportional Poisson sample with expected size ``target_n``:
    row i is kept iff u_i * W < target_n * w_i (u_i the portable unit
    draw, W the total weight), i.e. inclusion probability
    min(1, target_n * w_i / W) — importance sampling for corpus mixtures
    where long documents (or high-quality ones) should be drawn
    proportionally more often.  Deterministic per id: the same rows are
    selected on any engine, any partitioning, any day.

    Scale: one total-weight aggregate (broadcast as a 1-row frame) + a
    narrow filter folded into the scan; no shuffle of the data itself.
    The comparison multiplies instead of dividing so both sides stay in
    the exact operand order an external engine replays bit-for-bit."""
    tot = df.agg(
        F.sum(F.col(weight_col).cast("decimal(18,6)")).cast("double").alias("__W")
    )
    u = hash_unit_draw(F.col(id_col), salt)
    return (
        df.crossJoin(F.broadcast(tot))
        .filter(u * F.col("__W") < F.lit(float(target_n)) * F.col(weight_col).cast("double"))
        .drop("__W")
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_tokens_col: Column,
    targets: dict[str, float],
    default_target: float = 0.0,
    salt: str = "budget",
) -> DataFrame:
    """Per-source token-budget sampling — the mixture-curation op that
    turns "I want ~2 B tokens of books and ~500 M of forums" into keep
    decisions: each group keeps rows with probability
    ``min(1, target_tokens / group_total_tokens)``, so the kept token
    mass lands on the target in expectation (and exactly on the full
    group when the target covers it).  Groups absent from ``targets``
    get ``default_target`` (0 = drop).

    Deterministic per id (portable md5 unit draw), so the same corpus
    yields the same sample on any engine, any cluster size, any day —
    and the draw is numeric, which is what lets the threshold depend on
    a per-GROUP aggregate.  The comparison multiplies instead of
    dividing (``u * T < target``) so both operand orders replay
    bit-for-bit in an external engine.

    Scale: one aggregation shuffle for the per-group token totals
    (groups-sized frame, broadcast back), then a narrow filter folded
    into the scan — the corpus itself never shuffles.  The totals join
    is NULL-SAFE, so a NULL group is a real group: it draws against its
    own total at ``default_target`` like any unlisted group (a plain
    equi-join would silently drop every NULL-group row instead)."""
    tot = df.groupBy(group_col).agg(
        F.sum(n_tokens_col.cast("long")).alias("__T")
    ).withColumnRenamed(group_col, "__g")
    thr = None
    for g, t in targets.items():
        cond = F.col(group_col) == g
        thr = (
            F.when(cond, F.lit(float(t)))
            if thr is None
            else thr.when(cond, F.lit(float(t)))
        )
    thr = (
        F.lit(float(default_target))
        if thr is None
        else thr.otherwise(F.lit(float(default_target)))
    )
    u = hash_unit_draw(F.col(id_col), salt)
    return (
        df.join(F.broadcast(tot), F.col(group_col).eqNullSafe(F.col("__g")), "left")
        .where(u * F.col("__T").cast("double") < thr)
        .drop("__g", "__T")
    )


def winsorize_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out: str = "clipped",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lo, hi] percentiles — the outlier-capping step before mixing
    heterogeneous sources (a 10 MB document shouldn't dominate a length
    feature; a p99 cap per source is fair across sources the way a
    global cap is not).

    ``exact=True`` (default) anchors on exact interpolated percentiles,
    so the op is cross-engine checkable; the per-group sort-agg is the
    cost.  ``exact=False`` is the 100 TB path: the bounds come from the
    KLL/GK ``approx_percentile`` sketch — a mergeable, bounded-memory
    aggregate whose rank error is ~1/``accuracy`` — and the clip
    plumbing is identical.  (Approx bounds are sketch-implementation-
    specific, so only the exact path carries a value-level oracle; the
    approx path is pinned by a rank-tolerance test instead.)

    Either way: one aggregation shuffle for the per-group bounds, then
    a broadcast join + narrow clip folded into the scan.

    NULL semantics: a NULL value stays NULL (F.least/F.greatest skip
    NULLs, which would otherwise FABRICATE the lower bound for missing
    data), and a row whose group has no bounds (NULL group, or an
    all-NULL group) passes through unclipped via the left join — the op
    never changes the row count."""
    v = F.col(value_col).cast("double")
    if exact:
        bounds = df.groupBy(group_col).agg(
            F.percentile(v, F.lit(float(lo))).alias("__lo"),
            F.percentile(v, F.lit(float(hi))).alias("__hi"),
        )
    else:
        pair = F.approx_percentile(
            v, F.array(F.lit(float(lo)), F.lit(float(hi))), F.lit(int(accuracy))
        )
        bounds = df.groupBy(group_col).agg(
            pair.getItem(0).alias("__lo"), pair.getItem(1).alias("__hi")
        )
    clipped = F.when(
        v.isNull() | F.col("__lo").isNull(), v
    ).otherwise(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
    return (
        df.join(F.broadcast(bounds), on=group_col, how="left")
        .withColumn(out, clipped)
        .drop("__lo", "__hi")
    )


def standardize_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out: str = "zscore",
) -> DataFrame:
    """Per-group z-score ((x - mean) / sample-std) — feature
    normalization before mixing heterogeneous sources (a length or
    quality threshold that is fair across sources must be relative to
    each source's own distribution).  Groups with n < 2 or zero
    variance yield NULL.

    Cross-engine exactness: moments aggregate as DECIMAL (order-
    independent), and mean/variance are then a FIXED sequence of IEEE
    double ops (sqrt is correctly rounded per IEEE-754, so it is safe —
    unlike ln/pow, which are libm-specific); the oracle replays the
    identical expression.  One aggregation shuffle; the per-row join
    back broadcasts the groups-sized stats frame."""
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__s"),
        F.sum(
            (F.col(value_col).cast("decimal(28,6)") * F.col(value_col).cast("decimal(28,6)"))
        ).alias("__ss"),
    )
    enriched = df.join(F.broadcast(stats), group_col)
    m = F.col("__s").cast("double") / F.col("__n").cast("double")
    var = (
        F.col("__ss").cast("double") - F.col("__s").cast("double") * m
    ) / (F.col("__n").cast("double") - F.lit(1.0))
    z = F.when(
        (F.col("__n") > 1) & (var > 0),
        (F.col(value_col).cast("double") - m) / F.sqrt(var),
    )
    return enriched.withColumn(out, z).drop("__n", "__s", "__ss")


def pack_token_sequences(
    df: DataFrame,
    id_col: str,
    ids_col: str,
    seq_len: int = 2048,
    eos_id: int | None = None,
    drop_last: bool = True,
    out_col: str = "ids",
    shard_size: int = 4096,
) -> DataFrame:
    """Materialize fixed-length TRAINING SEQUENCES from per-document
    token-id arrays (round 8) — the last mile ``pack_chunks`` stops
    short of: it reports which windows a doc lands in; this op emits
    the windows themselves, ``(seq_id, n_docs, ids[seq_len])``, the
    GPT-style concat-and-cut pretraining format (optionally with an
    ``eos_id`` separator appended to every document first).

    Shape: per-document start offsets come from the hierarchical
    distributed prefix sum (:func:`global_running_sum` — no global
    window, no broadcast); each doc then EXPLODES into one row per
    overlapped sequence — ceil(n/L)+1 rows carrying an array SLICE, so
    the shuffle moves every token exactly once, keyed by ``seq_id``
    (uniform by construction: every sequence is exactly ``seq_len``
    tokens).  Assembly is an order-explicit fold: collect the pieces,
    sort by doc start offset, flatten — deterministic on any executor
    count.  No per-token rows ever exist, and no Python runs.

    Documents with NULL/empty id arrays (after optional EOS) are
    skipped.  With ``drop_last`` (the training default) the final
    partial sequence is dropped, so every output row has exactly
    ``seq_len`` ids; with ``drop_last=False`` the tail sequence
    surfaces short."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    elem = df.schema[ids_col].dataType.elementType
    v = F.col(ids_col)
    if eos_id is not None:
        v = F.concat(
            F.coalesce(v, F.array().cast(df.schema[ids_col].dataType)),
            F.array(F.lit(eos_id).cast(elem)),
        )
    base = (
        df.select(F.col(id_col), v.alias("__v"))
        .withColumn("__n", F.size("__v").cast("long"))
        .filter(F.col("__n") > 0)
    )
    offs = global_running_sum(
        base, id_col, "__n", out="__start", shard_size=shard_size
    )
    L = int(seq_len)
    first = F.expr(f"__start div {L}")
    last = F.expr(f"(__start + __n - 1) div {L}")
    ex = offs.withColumn("__seq", F.explode(F.sequence(first, last)))
    lstart = F.greatest(F.lit(0).cast("long"), F.col("__seq") * L - F.col("__start"))
    lend = (
        F.least(F.col("__start") + F.col("__n"), (F.col("__seq") + 1) * L)
        - F.col("__start")
    )
    piece = F.slice(
        F.col("__v"), (lstart + 1).cast("int"), (lend - lstart).cast("int")
    )
    seqs = (
        ex.select(
            F.col("__seq").alias("seq_id"),
            F.col("__start").alias("__s"),
            piece.alias("__p"),
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__s", "__p"))),
                    lambda x: x["__p"],
                )
            ).alias(out_col),
        )
    )
    if drop_last:
        seqs = seqs.filter(F.size(out_col) == L)
    return seqs.select("seq_id", "n_docs", out_col)


def dsir_score(
    corpus: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection via Importance Resampling): score every corpus
    document by how target-like its hashed n-gram profile is.
    Features are the paper's unigrams + bigrams hashed into
    ``n_buckets``; two bag-of-buckets models are fit with add-alpha
    smoothing — p (target) and q (raw corpus) — and each document
    aggregates its features' importance ratios p_b/q_b.

    Exactness contract: each bucket's ratio is ONE fixed IEEE chain,
      ((tc_b + a) * (R + a*B)) / ((rc_b + a) * (T + a*B)),
    and the per-document sum folds ratios in FEATURE-POSITION order
    (unigrams first, then bigrams, each left-to-right), so
    ``mean_ratio`` replays bit-for-bit in any engine.  ``log_weight``
    (Σ ln ratio — the paper's log importance weight) is also emitted
    for fidelity but is libm-dependent; oracle entries pin
    ``mean_ratio`` and treat log_weight as diagnostic.

    Scale shape (100 TB): one feature explode per side, two
    bucket-keyed counts (map-side partials; the model is B rows and
    BROADCASTS), one bucket join back to the corpus feature stream,
    one doc-keyed aggregation whose state is bounded by document
    length.  Nothing is corpus x corpus and the target pass is
    separate from (and typically far smaller than) the corpus pass.

    Documents with zero features are dropped (they have no profile to
    score).  Returns (id, n_features, mean_ratio, log_weight)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from .dedup import portable_hash60
    from .text import tokens, zip_shingles

    def feats(df: DataFrame) -> DataFrame:
        base = df.select(F.col(id_col), tokens(text_col).alias("__t"))
        stream = base.select(
            id_col,
            F.posexplode(
                F.concat(F.col("__t"), zip_shingles(F.col("__t"), 2))
            ).alias("pos", "feat"),
        )
        return stream.select(
            id_col, "pos", (portable_hash60(F.col("feat")) % n_buckets).alias("bucket")
        )

    cf = feats(corpus)
    tf = feats(target)
    rc = cf.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    tot = rc.agg(F.sum("rc").alias("R")).crossJoin(
        tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("T"))
    )
    a = float(alpha)
    ab = float(alpha) * float(n_buckets)
    ratio = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (
                    (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + F.lit(a))
                    * (F.col("R").cast("double") + F.lit(ab))
                )
                / (
                    (F.col("rc").cast("double") + F.lit(a))
                    * (F.col("T").cast("double") + F.lit(ab))
                )
            ).alias("ratio"),
        )
    )
    pr = cf.join(F.broadcast(ratio), "bucket").select(id_col, "pos", "ratio")
    rs = F.array_sort(F.collect_list(F.struct("pos", "ratio")))
    per = pr.groupBy(id_col).agg(rs.alias("__rs"))
    n = F.size("__rs")
    s = F.aggregate("__rs", F.lit(0.0), lambda acc, x: acc + x["ratio"])
    sln = F.aggregate("__rs", F.lit(0.0), lambda acc, x: acc + F.log(x["ratio"]))
    return per.select(
        id_col,
        n.cast("int").alias("n_features"),
        (s / n.cast("double")).alias("mean_ratio"),
        sln.alias("log_weight"),
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the ``n`` most target-like corpus documents by DSIR
    score (deterministic top-n on (mean_ratio DESC, id ASC) — the
    engine-exact selection rule; the paper's Gumbel-noise resampling
    trades determinism for diversity and can be layered on with
    ``hash_unit_draw`` if wanted).  The global top-n is orderBy+limit
    → TakeOrderedAndProject (per-partition partial top-n, the driver
    merges n rows) — never a full sort; the rank window then runs on
    the n-row result only."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    scores = dsir_score(corpus, target, n_buckets, alpha, text_col, id_col)
    top = scores.orderBy(F.col("mean_ratio").desc(), F.col(id_col).asc()).limit(n)
    w = Window.orderBy(F.col("mean_ratio").desc(), F.col(id_col).asc())
    return top.select(
        id_col,
        "n_features",
        "mean_ratio",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def equidepth_histogram(
    df: DataFrame, value_col: str, buckets: int = 8
) -> DataFrame:
    """EQUI-DEPTH (equal-frequency) histogram — the selectivity-
    estimation companion to the fixed-width histogram (w5): bucket
    boundaries at the exact j/buckets percentiles, so every bucket
    holds ~the same row count regardless of skew (a fixed-width
    histogram collapses under a heavy tail; optimizers and data
    profilers use equi-depth for exactly that reason).

    Boundary semantics, engine-exact: the buckets-1 exact percentile
    anchors are computed distributed and collected driver-side (k-1
    scalars — the winsorize anchor discipline), and a row's bucket is
    the COUNT OF ANCHORS STRICTLY BELOW its value (ties at an anchor
    fall in the lower bucket).  Exact percentiles match DuckDB's
    quantile_cont bit-for-bit (pinned by the winsorize oracle), so the
    whole histogram replays.  Returns (bucket, n_rows, min_value,
    max_value).

    Scale: one distributed percentile aggregation + one narrow bucket
    assignment + one bucket-keyed count — two scans, no sort.  Exact
    percentile state grows with distinct values; swap approx_percentile
    upstream at extreme cardinalities (the winsorize trade-off)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    qs = [j / buckets for j in range(1, buckets)]
    row = df.agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(q) for q in qs])).alias("b")
    ).first()
    if row["b"] is None:
        # percentile over zero non-NULL values — surface it instead of
        # the raw NoneType iteration error (round-10 adversarial sweep)
        raise ValueError(
            f"equidepth_histogram: {value_col!r} has no non-NULL values"
        )
    bounds = [float(b) for b in row["b"]]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(value_col) > F.lit(b), 1).otherwise(0)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    out_col: str = "shuffle_pos",
    n_buckets: int = 4096,
) -> DataFrame:
    """REPRODUCIBLE training-order shuffle: every row gets a dense
    position 0..n-1 ordered by (portable md5 draw of (salt, id), id) —
    the data-order randomization every training run needs, made a pure
    FUNCTION of (salt, id) so any engine, any partitioning, and any
    rerun produce the identical permutation (epoch k = salt 'epoch-k').

    Scale shape — NO unpartitioned window anywhere: the hash's top
    bits split the key space into ``n_buckets`` UNIFORM buckets
    (hashes are uniform, so bucket sizes are ~n/n_buckets with no
    skew); positions are a per-bucket rank window (bounded by the
    bucket) plus each bucket's exclusive offset from a bucket-count
    aggregation whose cumulative sum runs on an n_buckets-row frame —
    bounded by the PARAMETER, not the data.  Bucket order equals hash
    order because buckets ARE the hash's leading bits, so the
    composition reproduces the exact global (hash, id) rank.  Size
    ``n_buckets`` ≈ total_rows / target_partition_rows at scale."""
    if n_buckets < 1 or n_buckets > (1 << 30):
        raise ValueError(f"n_buckets must be in [1, 2^30], got {n_buckets}")
    bits = max(1, int(n_buckets - 1).bit_length())
    from pyspark.sql import Window

    from .dedup import portable_hash60

    h = portable_hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    b = F.shiftrightunsigned(h, 60 - bits)
    with_h = df.withColumn("__h", h).withColumn("__b", b)
    counts = with_h.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(woff), F.lit(0))
    ).select("__b", "__off")
    wrank = Window.partitionBy("__b").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        with_h.withColumn("__rn", F.row_number().over(wrank))
        .join(F.broadcast(offsets), "__b")
        .withColumn(out_col, (F.col("__off") + F.col("__rn") - 1).cast("long"))
        .drop("__h", "__b", "__rn", "__off")
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    m: float = 10.0,
    out_col: str = "encoded",
) -> DataFrame:
    """m-ESTIMATE target encoding (Micci-Barreca 2001) — the standard
    high-cardinality categorical feature for tabular models: each
    category's code is its target mean SHRUNK toward the global mean,

        enc(c) = (sum_c + m · global_mean) / (n_c + m)

    so rare categories fall back to the prior instead of memorizing
    noise.  Exactness: per-row targets are cast to DECIMAL(18,6)
    before summing (order-independent exact sums — the package's
    numeric policy), the global mean is one fixed division, and the
    encoding is one fixed IEEE chain per category — engine-exact.

    Shape: one category-keyed aggregation (map-side partials), a 1-row
    global broadcast, output is |categories| rows to broadcast-join
    back onto the fact table.  NULL targets are excluded from both
    sums; NULL categories form their own group (their rows still need
    a feature).  Returns (category, n_rows, encoded)."""
    if m < 0:
        raise ValueError(f"m must be >= 0, got {m}")
    dec = F.col(target_col).cast("decimal(18,6)")
    per = df.filter(F.col(target_col).isNotNull()).groupBy(category_col).agg(
        F.sum(dec).alias("__s"), F.count(F.lit(1)).alias("n_rows")
    )
    tot = per.agg(
        F.sum("__s").alias("__st"), F.sum("n_rows").alias("__nt")
    )
    gm = F.col("__st").cast("double") / F.col("__nt").cast("double")
    enc = (
        (F.col("__s").cast("double") + F.lit(float(m)) * gm)
        / (F.col("n_rows").cast("double") + F.lit(float(m)))
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(category_col, "n_rows", enc.alias(out_col))
    )


def kcenter_select(
    vecs: DataFrame,
    k: int = 6,
    q_scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-CENTER (farthest-point) coreset selection — the
    diversity-sampling primitive behind coreset curation (pick k
    maximally-spread representatives of an embedding space; the dual of
    semantic_dedup, which removes the crowded points).  Gonzalez's
    2-approximation: seed with the smallest id, then k-1 times add the
    point FARTHEST from the current set (max over points of min over
    selected of squared L2), ties to the smallest id.

    Engine-exact: coordinates quantize to floor(x·q_scale) integers
    (power-of-two scale ⇒ exact), every distance is an integer sum of
    squared differences, and every argmax is integer-ordered with an id
    tiebreak — the unrolled oracle replays the identical selection.

    Returns (sel_rank, vec_id, dist): dist = the point's min squared
    distance to the previously selected set at selection time (the
    covering radius sequence, nonincreasing); dist = 0 for the seed.
    Each id appears at most once — selected ids leave the candidate
    pool, so k > |rows| stops early with |rows| rows; empty input
    raises ValueError.

    Scale shape: each round is ONE corpus scan computing the distance
    to the single newly selected centre (a d-length plan literal —
    bounded by d·k, the ivf_assign literal discipline) folded into the
    running min, then one TakeOrderedAndProject(1).  k rounds = k scans
    of a cached quantized frame; nothing is ever corpus × corpus, and
    the driver holds k·d integers."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if q_scale < 2 or (q_scale & (q_scale - 1)) != 0:
        raise ValueError(f"q_scale must be a power of two >= 2, got {q_scale}")
    qs = F.lit(float(q_scale))
    q = vecs.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * qs).cast("long")
        ).alias("__q"),
    ).persist()
    try:
        seeds = q.orderBy(F.col("__id").asc()).limit(1).collect()
        if not seeds:
            raise ValueError("kcenter_select: input has no rows")
        seed = seeds[0]
        selected = [(1, seed["__id"], 0, list(seed["__q"]))]
        # Already-selected ids are excluded from every later round, so
        # each id is emitted at most once; with k > |rows| the loop
        # stops early with fewer than k rows (duplicate POINTS under
        # distinct ids are still eligible — they join the coreset with
        # dist 0, which is the correct covering radius).
        cur = q.filter(F.col("__id") != seed["__id"]).withColumn(
            "__mind", F.lit(None).cast("long")
        )
        for r in range(2, k + 1):
            s_lit = F.array(*[F.lit(int(v)) for v in selected[-1][3]])
            nd = F.aggregate(
                F.zip_with(F.col("__q"), s_lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            cur = cur.withColumn("__mind", F.least(F.coalesce(F.col("__mind"), nd), nd))
            picks = (
                cur.orderBy(F.col("__mind").desc(), F.col("__id").asc())
                .limit(1)
                .collect()
            )
            if not picks:
                break
            pick = picks[0]
            selected.append((r, pick["__id"], int(pick["__mind"]), list(pick["__q"])))
            cur = cur.filter(F.col("__id") != pick["__id"])
            # keep the plan O(1) deep across rounds
            cur = cur.localCheckpoint(eager=True)
        spark = vecs.sparkSession
        return spark.createDataFrame(
            [(r, i, d) for r, i, d, _ in selected],
            "sel_rank int, vec_id long, dist long",
        ).withColumnsRenamed({"vec_id": id_col})
    finally:
        q.unpersist()


def kcenter_sql_steps(
    k: int = 6,
    q_scale: int = 1024,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """CTE chain replaying :func:`kcenter_select` in DuckDB (rounds
    unrolled; identical integer distances and tiebreaks).  Exposes the
    selection as CTE ``kc_final(sel_rank, vec_id, dist)``."""
    qs = float(q_scale)
    d2 = (
        "list_reduce(list_transform(list_zip(a.q, s.q),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )
    parts = [
        f"""kc_q AS (SELECT {id_col} AS id,
                 list_transform({vec_col},
                     x -> CAST(FLOOR(CAST(x AS DOUBLE) * {qs!r}) AS BIGINT)) AS q
          FROM {table}),
       kc_s1 AS (SELECT id, q FROM kc_q ORDER BY id ASC LIMIT 1),
       kc_d1 AS (SELECT a.id, a.q, {d2} AS mind
                 FROM kc_q a CROSS JOIN kc_s1 s
                 WHERE a.id <> s.id)"""
    ]
    prev = "kc_d1"
    for r in range(2, k + 1):
        parts.append(
            f"""kc_s{r} AS (SELECT id, q, mind FROM {prev}
                  ORDER BY mind DESC, id ASC LIMIT 1),
       kc_d{r} AS (SELECT a.id, a.q,
                          CASE WHEN {d2} < a.mind THEN {d2} ELSE a.mind END AS mind
                   FROM {prev} a CROSS JOIN kc_s{r} s
                   WHERE a.id <> s.id)"""
        )
        prev = f"kc_d{r}"
    sel_union = "\n                 UNION ALL ".join(
        ["SELECT 1 AS sel_rank, id, CAST(0 AS BIGINT) AS dist FROM kc_s1"]
        + [
            f"SELECT {r}, id, CAST(mind AS BIGINT) FROM kc_s{r}"
            for r in range(2, k + 1)
        ]
    )
    parts.append(
        f"""kc_final AS (SELECT CAST(sel_rank AS INTEGER) AS sel_rank,
                          id AS {id_col}, dist
                   FROM ({sel_union}))"""
    )
    return ",\n       ".join(parts)
