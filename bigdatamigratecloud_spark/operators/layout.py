"""Multi-dimensional data layout: Z-order (Morton) interleaving keys.

Min/max file skipping (AcidTable stats, parquet row-group stats) prunes
on the SORT column only: sorting 100 TB of orders by customer makes
customer-range scans cheap and date-range scans full scans.  A Z-order
key interleaves the bits of several normalized columns, so sorting by
the single key gives every participating column locality — each file
covers a small hyper-rectangle, and a range predicate on ANY of the
columns prunes most files (the Delta/Iceberg OPTIMIZE ZORDER design).

Everything here is integer-exact and engine-portable:

- normalization is pure integer math (``(v - lo) * (2^bits - 1) div
  (hi - lo)`` with clamping), no floats, so DuckDB replays it exactly;
- interleaving is an unrolled shift/mask OR chain over ``bits``
  positions — built-in JVM expressions inside whole-stage codegen, no
  UDF, no shuffle (a narrow map folded into the scan);
- the total key width is ``bits * len(cols)`` and must fit 63 bits.

At 100 TB the write path is: compute the key (narrow), then
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` — one range
shuffle, the same cost as any global sort layout — and commit the files
with per-file min/max stats on the ORIGINAL columns; reads never need
the key again.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column into [0, 2^bits) by exact integer scaling.

    Values are clamped to [lo, hi] first (out-of-range rows land on the
    edge cells rather than corrupting the interleave).  Integer-only
    math: ``(v - lo) * (2^bits - 1) DIV (hi - lo)`` — portable to any
    engine with floor division.  The multiply runs in DECIMAL(38,0):
    (hi-lo) * (2^bits - 1) overflows a signed 64-bit long for ranges
    wider than ~1.4e14 (e.g. microsecond-epoch timestamps spanning a
    few years), and a silent wrap would scramble the clustering."""
    if hi <= lo:
        raise ValueError(f"empty normalization range [{lo}, {hi}]")
    top = (1 << bits) - 1
    # NULL -> lo edge cell: a null dimension must not null the whole key
    # (a null Morton key would escape every file's min/max range and
    # break scan pruning soundness for the OTHER columns)
    filled = F.coalesce(col.cast("long"), F.lit(int(lo)))
    clamped = F.greatest(F.least(filled, F.lit(int(hi))), F.lit(int(lo)))
    prod = (clamped - F.lit(int(lo))).cast("decimal(38,0)") * F.lit(top)
    # decimal division ROUNDS to the result scale (65534.99999 -> 65535
    # at scale 6 — not a floor!), so make the division exact first by
    # subtracting the remainder; the quotient is then a representable
    # integer < 2^bits and the long cast is lossless
    d = F.lit(int(hi - lo))
    return ((prod - prod % d) / d).cast("long")


def zorder_key(cols: list[tuple[Column, int, int]], bits: int = 16) -> Column:
    """Morton-interleaved key over ``cols`` = [(col, lo, hi), ...].

    Bit i of each normalized column j lands at position ``i*n + j`` of
    the key, giving the classic Z-curve.  Unrolled to ``bits * n``
    shift/mask terms OR-ed together — all built-in expressions, fully
    inside whole-stage codegen."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed 64-bit key")
    terms: list[Column] = []
    for j, (col, lo, hi) in enumerate(cols):
        scaled = normalize_to_bits(col, lo, hi, bits)
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zkey")


def zorder_key_sql(cols: list[tuple[str, int, int]], bits: int = 16) -> str:
    """The exact same key as ``zorder_key`` as an ANSI-SQL expression
    string (for the DuckDB oracle): identical clamp, identical integer
    scale, identical unrolled interleave."""
    n = len(cols)
    terms = []
    for j, (name, lo, hi) in enumerate(cols):
        top = (1 << bits) - 1
        # HUGEINT multiply mirrors the Spark side's decimal(38,0): the
        # span*top product overflows BIGINT for wide ranges; the final
        # quotient is < 2^bits so the BIGINT cast back is exact
        scaled = (
            f"CAST((CAST(GREATEST(LEAST(COALESCE(CAST({name} AS BIGINT), {lo}), {hi}), {lo})"
            f" - {lo} AS HUGEINT) * {top}) // {hi - lo} AS BIGINT)"
        )
        for i in range(bits):
            # full parens per term: Postgres-family grammars give <<, >>,
            # &, | ONE precedence level (left-assoc), so an unfenced
            # `a << 2 | b << 4` parses as `((a << 2) | b) << 4`
            terms.append(f"(((({scaled}) >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    sample_rows: int = 2_000,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as parquet with files NEAR ``target_mb`` — the
    generic small-files valve for plain-parquet outputs (AcidTable has
    ``compact``; everything else gets this).  Both failure modes of a
    naive write hurt at scale: too many tiny files (one per input
    partition — listing + open/footer cost on every later read) and
    too few huge ones (no read parallelism, giant task retries).

    Row size is ESTIMATED from a bounded driver sample (first
    ``sample_rows`` rows serialized through their parquet-ish in-memory
    width) with a 3x compression assumption — an estimate is all this
    needs, since being 2x off target is still orders of magnitude
    better than either failure mode.  One count + one repartition; the
    shuffle is round-robin, so output files are uniformly sized.
    Returns the partition count used."""
    import math

    from pyspark.sql import functions as F

    n = df.count()
    if n == 0:
        df.limit(0).write.mode(mode).parquet(path)
        return 1
    sample = df.limit(min(sample_rows, n)).collect()
    import sys

    raw = sum(sys.getsizeof(str(row)) for row in sample) / len(sample)
    est_row_bytes = max(16.0, raw / 3.0)  # ~3x parquet compression
    parts = max(1, math.ceil(n * est_row_bytes / (target_mb * 1024 * 1024)))
    w = df.repartition(parts).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return parts


def write_range_sorted_parquet(
    df,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """GLOBALLY-ORDERED parquet layout: rows range-partitioned on
    ``sort_cols`` (file i holds a contiguous key range strictly below
    file i+1's) and sorted WITHIN each file — the layout that makes
    downstream point/range scans prune by file min/max stats and
    merge-reads stay sequential, without ever materializing a global
    sort on one node.

    Shape: ``repartitionByRange`` samples the key distribution
    (reservoir sample, driver-bounded) to pick balanced boundaries,
    then each partition sorts independently — the classic distributed
    sort: one exchange + per-partition sorts, no single-point
    bottleneck at any size.  Complements ``write_sized_parquet``
    (uniform sizes, no order) and ``AcidTable.optimize_zorder``
    (multi-dim clustering): use THIS when ONE sort key dominates the
    read pattern.

    Range boundaries come from a SAMPLE, so file sizes are
    approximately balanced, not exact — the trade every engine makes
    (Spark's own sortBy does the same)."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
