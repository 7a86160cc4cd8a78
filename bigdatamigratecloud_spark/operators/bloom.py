"""Portable Bloom-filter semi-join pruning — the runtime-filter pattern
for joins whose build side is too large to broadcast exactly.

`j5_fk_violation_counts` broadcasts exact parent-key SETS, which is right
while the parent fits in memory; at 100 TB a fact-to-fact semi-join
("orders placed by customers seen this quarter") has a build side of
10^9+ keys, and shipping the exact set to every task stops scaling.  The
Bloom filter fixes the size: the build side folds into a CONSTANT-sized
bitmap (``m_bits`` regardless of build cardinality), the bitmap ships to
every probe task as a plan literal, and the probe stage is a NARROW map —
the expensive exact join then runs over the survivors only.  False
positives cost only wasted verify work; false negatives cannot happen,
so `bloom prune -> exact semi-join` is value-identical to the plain
semi-join (which is exactly what the oracle checks).

Everything is built from a PORTABLE hash so an external engine can replay
the candidate set bit-for-bit: two 60-bit integers are read from the hex
md5 of the key (digits 1-15 and 16-30), and the k probe positions are the
Kirsch-Mitzenmacher double-hash sequence

    pos_i = (h1 mod m + i * ((h2 mod (m-1)) + 1)) mod m,  i in [0, k)

(the ``+ 1`` keeps the stride nonzero so the k positions never collapse
onto one bit).  All arithmetic stays in non-negative BIGINT range —
words hold 60 bits, not 64, so no mask ever touches the sign bit and no
engine-specific overflow semantics leak into the result.

Scale design:
- build: one narrow map (md5 + k positions) + a ``bit_or`` aggregation
  whose group count is bounded by ``m_bits/60`` — partial aggregation
  collapses everything map-side, so the shuffle moves at most one
  bitmap per task regardless of build-side rows.  The driver collect is
  bounded by the bitmap size, never by the data.
- probe: a pure narrow filter (array-literal lookups + bitwiseAND)
  folded into the scan stage; no join, no shuffle, no broadcast
  exchange needed — the bitmap is part of the plan.
- verify: a plain left-semi equi-join over the candidates only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 60  # < 63 so every mask is a positive BIGINT in any engine

# The bitmap ships inside the PLAN as an array literal; past ~1 MiB that
# stops being a free constant (plan serialization per task, Catalyst
# tree size) and the filter should move to a broadcast variable or a
# word-keyed join instead.  Guard rather than degrade silently.
MAX_WORDS = 131_072  # 60 * 131072 bits ≈ 7.9 Mbit ≈ 1 MiB of longs


def _check_params(m_bits: int, k: int) -> None:
    if m_bits % BITS_PER_WORD != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of {BITS_PER_WORD}")
    if m_bits > MAX_WORDS * BITS_PER_WORD:
        raise ValueError(
            f"m_bits={m_bits} exceeds the plan-literal budget "
            f"({MAX_WORDS * BITS_PER_WORD} bits ≈ 1 MiB of words); a filter "
            "this large should be a broadcast variable or a word-keyed "
            "join, not a plan constant"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def _hash_pair(
    col: Column, salt: str, portable: bool = True
) -> tuple[Column, Column]:
    """Two independent 60-bit non-negative integers per key.

    ``portable=True``: hex-slice an md5 — replayable in any engine, the
    oracle path.  ``portable=False``: two seeded xxhash64 draws masked
    to 60 bits — JVM-native, ~5-10x cheaper per row, for production
    pipelines that don't need an external replay (measured: the md5
    double-hash costs ~1.5 us/row, which dominates bench-scale runs
    where the avoided shuffle is RAM-speed)."""
    if not portable:
        mask = F.lit((1 << 60) - 1)
        h1 = F.xxhash64(col.cast("string"), F.lit(salt)).bitwiseAND(mask)
        h2 = F.xxhash64(col.cast("string"), F.lit(salt + "#2")).bitwiseAND(mask)
        return h1, h2
    hx = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 16, 15), 16, 10).cast("long")
    return h1, h2


def _positions(
    col: Column, salt: str, m_bits: int, k: int, portable: bool = True
) -> list[Column]:
    h1, h2 = _hash_pair(col, salt, portable)
    base = h1 % F.lit(m_bits)
    step = h2 % F.lit(m_bits - 1) + F.lit(1)
    return [(base + F.lit(i) * step) % F.lit(m_bits) for i in range(k)]


# 60-entry literal lookup table: mask for bit b without shifting by a
# column (F.shiftleft takes only a Python-int shift amount)
def _mask_array() -> Column:
    return F.array(*[F.lit(1 << b).cast("long") for b in range(BITS_PER_WORD)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 61_440,
    k: int = 5,
    salt: str = "bloom",
    portable: bool = True,
) -> list[int]:
    """Fold the build side's keys into an ``m_bits``-bit bitmap, returned
    as ``m_bits/60`` words of 60 bits each.  NULL keys are skipped (a
    NULL never matches an equi-join, so the filter stays conservative).
    ``portable`` picks the hash family (see :func:`_hash_pair`) and must
    match between build and probe.

    The only driver materialization is the bitmap itself — bounded by
    ``m_bits``, constant in the build cardinality."""
    _check_params(m_bits, k)
    n_words = m_bits // BITS_PER_WORD
    pos = (
        df.select(F.col(key_col).alias("__k"))
        .where(F.col("__k").isNotNull())
        .select(
            F.explode(
                F.array(*_positions(F.col("__k"), salt, m_bits, k, portable))
            ).alias("pos")
        )
    )
    words = (
        pos.select(
            F.floor(F.col("pos") / BITS_PER_WORD).cast("int").alias("w"),
            F.element_at(_mask_array(), (F.col("pos") % BITS_PER_WORD).cast("int") + 1).alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * n_words
    for r in words:
        out[r["w"]] = r["word"]
    return out


def bloom_member(
    col: Column,
    words: list[int],
    m_bits: int = 61_440,
    k: int = 5,
    salt: str = "bloom",
    portable: bool = True,
) -> Column:
    """Membership predicate against a built bitmap: TRUE iff all k bit
    positions for ``col`` are set.  NULL keys yield NULL (filtered out —
    same as equi-join semantics).  Pure narrow expression: the bitmap is
    a constant array literal in the plan, each check is an element_at +
    bitwiseAND — no join, no shuffle, no broadcast variable."""
    _check_params(m_bits, k)
    if len(words) != m_bits // BITS_PER_WORD:
        raise ValueError(
            f"bitmap has {len(words)} words; m_bits={m_bits} needs {m_bits // BITS_PER_WORD}"
        )
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    masks = _mask_array()
    # explicit NULL guard: the md5 path nulls out on NULL keys naturally,
    # but xxhash64 SKIPS null arguments (hashing just the seed), so
    # without the guard a NULL key could pass the fast-path prune and
    # leak through verify=False pipelines
    checks = [col.isNotNull()]
    for pos in _positions(col, salt, m_bits, k, portable):
        word = F.element_at(arr, F.floor(pos / BITS_PER_WORD).cast("int") + 1)
        mask = F.element_at(masks, (pos % BITS_PER_WORD).cast("int") + 1)
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_semijoin(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = 61_440,
    k: int = 5,
    salt: str = "bloom",
    verify: bool = True,
    portable: bool = True,
) -> DataFrame:
    """``probe`` rows whose key appears in ``build`` — a left-semi join
    where the probe side is first pruned by a constant-size Bloom filter
    so the exact join's shuffle moves candidates only.  With
    ``verify=False`` the raw candidate set is returned (false positives
    included) for pipelines that tolerate approximate pruning."""
    words = bloom_build(build, build_key, m_bits, k, salt, portable)
    pruned = probe.where(
        bloom_member(F.col(probe_key), words, m_bits, k, salt, portable)
    )
    if not verify:
        return pruned
    keys = build.select(F.col(build_key).alias(probe_key)).where(
        F.col(probe_key).isNotNull()
    )
    return pruned.join(keys, probe_key, "left_semi")


# --- DuckDB replay -------------------------------------------------------


def hash_pair_sql(expr: str, salt: str) -> tuple[str, str]:
    """The same two 60-bit hashes as ANSI-ish SQL (DuckDB oracle):
    digit-expansion replay of hex -> integer, exact in BIGINT."""
    h = f"md5(CAST({expr} AS VARCHAR) || '{salt}')"

    def expand(start: int) -> str:
        terms = [
            f"(strpos('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
            f" * {16 ** (14 - i)}"
            for i in range(15)
        ]
        return "(" + " + ".join(terms) + ")"

    return expand(1), expand(16)


def positions_sql(h1: str, h2: str, m_bits: int, k: int, i_expr: str = "i") -> str:
    """Position ``i`` of the double-hash sequence as a SQL expression over
    precomputed h1/h2 columns (compute them once per row — the expansion
    is 15 terms each)."""
    return f"((({h1}) % {m_bits}) + ({i_expr}) * ((({h2}) % {m_bits - 1}) + 1)) % {m_bits}"


# --------------------------------------------------------------- CMS
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency twin
# of the Bloom filter above: d independent hash rows of w counters;
# estimate(key) = min over rows of its counter.  Always an
# OVER-estimate (collisions only add), error <= 2N/w with prob 1-2^-d.
# Mergeability is what matters at 100 TB: sketches of shards ADD
# cell-wise, so the sketch is a groupBy((row, bucket)).sum — partial
# aggregation collapses each partition to d*w cells map-side and the
# shuffle moves at most d*w rows per task regardless of data volume.


def _cms_bucket(col: Column, row: int, w: int, salt: str, portable: bool) -> Column:
    """Row-``row``'s bucket for a key: Kirsch-Mitzenmacher double hash
    mod w (same portable pair as the Bloom filter, so any engine
    replays the cell addressing)."""
    h1, h2 = _hash_pair(col, salt, portable)
    return (h1 % w + row * ((h2 % (w - 1)) + 1)) % w


def cms_build(
    df: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    salt: str = "cms",
    portable: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (row, bucket, cnt) sketch table — d*w rows at most,
    whatever the input size.  NULL keys are skipped.  ``weight_col``
    turns it into a weighted-frequency sketch (sums instead of
    counts).  Two sketches with identical (w, d, salt) merge by
    unionByName + groupBy(row, bucket).sum — asserted in tests."""
    if w < 2 or d < 1:
        raise ValueError(f"cms_build: need w >= 2 and d >= 1, got w={w} d={d}")
    k = F.col(key_col)
    wt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.where(k.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        _cms_bucket(k, i, w, salt, portable).cast("int").alias("bucket"),
                        wt.alias("wt"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c")
    )
    return (
        rows.select("c.row", "c.bucket", "c.wt")
        .groupBy("row", "bucket")
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    salt: str = "cms",
    portable: bool = True,
    out_col: str = "est",
) -> DataFrame:
    """Point estimates for ``keys``: each key probes its d cells and
    takes the MIN — an upper bound on the true frequency (never an
    undercount; absent cells read 0).  One explode + one equi-join on
    (row, bucket) against the tiny sketch (AQE broadcasts it) + one
    min-agg keyed by the key — no scan of the original data."""
    k = F.col(key_col)
    probes = keys.where(k.isNotNull()).select(
        k.alias("__key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        _cms_bucket(k, i, w, salt, portable).cast("int").alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("p"),
    ).select("__key", "p.row", "p.bucket")
    joined = probes.join(sketch, ["row", "bucket"], "left").select(
        "__key", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cell")
    )
    return joined.groupBy("__key").agg(F.min("cell").alias(out_col)).withColumnRenamed(
        "__key", key_col
    )
