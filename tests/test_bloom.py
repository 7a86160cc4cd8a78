"""Portable Bloom-filter semi-join (operators/bloom): no false
negatives ever, prune+verify value-identical to a plain semi-join,
bounded driver state, and a narrow (join-free, shuffle-free) probe
plan."""

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_member,
    bloom_semijoin,
)

M, K = 600, 4  # deliberately undersized so false positives occur


@pytest.fixture(scope="module")
def sides(spark):
    build = spark.range(0, 300).select((F.col("id") * 7).alias("key"))
    probe = spark.range(0, 5000).select(F.col("id").alias("key"))
    return build, probe


def test_no_false_negatives(spark, sides):
    build, _ = sides
    words = bloom_build(build, "key", M, K)
    misses = build.where(~bloom_member(F.col("key"), words, M, K)).count()
    assert misses == 0


def test_semijoin_matches_plain_semijoin(spark, sides):
    build, probe = sides
    got = {
        r["key"]
        for r in bloom_semijoin(probe, "key", build, "key", M, K).collect()
    }
    want = {r["key"] for r in probe.join(build, "key", "left_semi").collect()}
    assert got == want


def test_false_positives_exist_but_are_pruned(spark, sides):
    """The undersized filter MUST admit false positives (otherwise the
    verify stage is untested), and verify must remove every one."""
    build, probe = sides
    words = bloom_build(build, "key", M, K)
    cand = probe.where(bloom_member(F.col("key"), words, M, K)).count()
    exact = probe.join(build, "key", "left_semi").count()
    assert exact == 300
    assert cand > exact  # saturated 600-bit filter: FPs guaranteed
    assert bloom_semijoin(probe, "key", build, "key", M, K).count() == exact


def test_bitmap_size_is_constant_in_build_cardinality(spark):
    """Driver state is the bitmap, never the key set: growing the build
    side 10x leaves the word count (and so the shipped plan size)
    identical."""
    small = spark.range(0, 100).select(F.col("id").alias("key"))
    large = spark.range(0, 1000).select(F.col("id").alias("key"))
    ws = bloom_build(small, "key", M, K)
    wl = bloom_build(large, "key", M, K)
    assert len(ws) == len(wl) == M // BITS_PER_WORD


def test_probe_plan_is_narrow(spark, sides):
    """The pruning filter itself is a plan-literal narrow map: no join,
    no exchange, no broadcast anywhere in the candidate plan."""
    build, probe = sides
    words = bloom_build(build, "key", M, K)
    plan = (
        probe.where(bloom_member(F.col("key"), words, M, K))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Join", "Exchange", "Broadcast"):
        assert op not in plan, f"probe plan contains {op}:\n{plan}"


def test_null_keys_conservative(spark):
    """NULL keys: skipped on build, never a candidate on probe — the
    same rows an equi-join would drop.  Must hold on BOTH hash paths
    even without verify (xxhash64 skips null args, so the fast path
    needs its explicit guard)."""
    build = spark.createDataFrame([(1,), (None,)], "key int")
    probe = spark.createDataFrame([(1,), (2,), (None,)], "key int")
    for portable in (True, False):
        words = bloom_build(build, "key", M, K, portable=portable)
        got = [
            r["key"]
            for r in bloom_semijoin(
                probe, "key", build, "key", M, K, portable=portable
            ).collect()
        ]
        assert got == [1]
        cand = probe.where(
            bloom_member(F.col("key"), words, M, K, portable=portable)
        ).collect()
        assert all(r["key"] is not None for r in cand)


def test_param_validation(spark, sides):
    build, _ = sides
    with pytest.raises(ValueError):
        bloom_build(build, "key", m_bits=100, k=3)  # not a multiple of 60
    with pytest.raises(ValueError):
        bloom_build(build, "key", m_bits=M, k=0)
    with pytest.raises(ValueError):
        bloom_member(F.col("key"), [0] * 3, M, K)  # wrong word count
    with pytest.raises(ValueError, match="plan-literal budget"):
        bloom_build(build, "key", m_bits=60 * 131_073, k=3)  # > 1 MiB literal


def test_fast_hash_path_matches_semantics(spark, sides):
    """portable=False (seeded xxhash64): same no-false-negative and
    verify-equivalence guarantees, different (cheaper) hash family."""
    build, probe = sides
    words = bloom_build(build, "key", M, K, portable=False)
    misses = build.where(
        ~bloom_member(F.col("key"), words, M, K, portable=False)
    ).count()
    assert misses == 0
    got = {
        r["key"]
        for r in bloom_semijoin(
            probe, "key", build, "key", M, K, portable=False
        ).collect()
    }
    want = {r["key"] for r in probe.join(build, "key", "left_semi").collect()}
    assert got == want


def test_cms_never_undercounts_and_merges(spark):
    """CMS laws: estimate >= true count for every key (tiny w forces
    collisions), shard sketches merge cell-wise to the full sketch,
    absent keys read bounded-by-collisions, weighted mode sums."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.bloom import cms_build, cms_estimate

    rows = [(i % 13, 1) for i in range(500)] + [(99, 1)] * 40 + [(None, 1)] * 5
    df = spark.createDataFrame(rows, "k long, wt int")
    sk = cms_build(df, "k", w=8, d=3)
    assert sk.count() <= 8 * 3
    keys = spark.createDataFrame([(k,) for k in list(range(13)) + [99, 12345]], "k long")
    est = {r.k: r.est for r in cms_estimate(sk, keys, "k", w=8, d=3).collect()}
    true = {r.k: r["count"] for r in df.where(F.col("k").isNotNull()).groupBy("k").count().collect()}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    assert est[12345] >= 0  # absent key: whatever its cells hold, >= 0
    # cell-wise merge of shard sketches == sketch of the union
    a = cms_build(df.where(F.col("k") < 7), "k", w=8, d=3)
    b = cms_build(df.where((F.col("k") >= 7)), "k", w=8, d=3)
    merged = a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    full = cms_build(df, "k", w=8, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # weighted mode
    wsk = cms_build(df, "k", w=64, d=4, weight_col="wt")
    west = {r.k: r.est for r in cms_estimate(wsk, keys, "k", w=64, d=4).collect()}
    assert west[99] >= 40
    import pytest

    with pytest.raises(ValueError, match="w >= 2"):
        cms_build(df, "k", w=1, d=2)
