"""Hot-bucket guard for the banded-LSH candidate joins (round-9 scale
valve): an m-member degenerate bucket must emit O(m) pairs under the
star policy and <= C(cap, 2) under sample — never O(m²).  Covers the
shared helper plus its minhash / simhash / dhash front-ends."""

import math

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators import dedup
from bigdatamigratecloud_spark.operators.multimodal import dhash_neardup

M = 60  # planted identical docs (one degenerate bucket per band)
CAP = 5


@pytest.fixture(scope="module")
def planted(spark):
    """M identical docs (ids 0..M-1) + 6 distinct docs, as (doc_id, text)."""
    rows = [(i, "the same boilerplate body text shared by all planted docs") for i in range(M)]
    rows += [(M + j, f"unique document number {j} with distinct content entirely {j * 7}") for j in range(6)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_star_policy_emits_linear_pairs(spark, planted):
    sigs = dedup.minhash_signatures(planted)
    pairs = dedup.minhash_lsh_candidates(sigs, max_bucket=CAP, hot_policy="star").collect()
    planted_pairs = [r for r in pairs if r.id_a < M and r.id_b < M]
    # star: rep (min id = 0) pairs with every other member, exactly m-1 pairs
    assert len(planted_pairs) == M - 1
    assert all(r.id_a == 0 for r in planted_pairs)


def test_sample_policy_bounds_pairs(spark, planted):
    sigs = dedup.minhash_signatures(planted)
    pairs = dedup.minhash_lsh_candidates(sigs, max_bucket=CAP, hot_policy="sample").collect()
    planted_pairs = [r for r in pairs if r.id_a < M and r.id_b < M]
    # sample: the CAP lowest ids self-join -> exactly C(CAP, 2) pairs
    assert len(planted_pairs) == math.comb(CAP, 2)
    assert all(r.id_a < CAP and r.id_b < CAP for r in planted_pairs)


def test_unguarded_would_be_quadratic(spark, planted):
    sigs = dedup.minhash_signatures(planted)
    pairs = dedup.minhash_lsh_candidates(sigs, max_bucket=None).collect()
    planted_pairs = [r for r in pairs if r.id_a < M and r.id_b < M]
    assert len(planted_pairs) == math.comb(M, 2)  # the blowup the guard removes


def test_guard_inert_below_cap(spark, planted):
    """Cap above the bucket size -> identical pair set to unguarded."""
    sigs = dedup.minhash_signatures(planted)
    guarded = set(
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(sigs, max_bucket=M + 1).collect()
    )
    unguarded = set(
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(sigs, max_bucket=None).collect()
    )
    assert guarded == unguarded


def test_neardup_rerank_still_exact_through_guard(spark, planted):
    """Star pairs flow through the exact-Jaccard rerank: identical docs
    score 1.0 and every emitted pair touches the rep."""
    out = dedup.minhash_neardup(planted, max_bucket=CAP, hot_policy="star").collect()
    planted_pairs = [r for r in out if r.id_a < M and r.id_b < M]
    assert len(planted_pairs) == M - 1
    assert all(r.jaccard == 1.0 for r in planted_pairs)


def test_simhash_guard(spark, planted):
    out = dedup.simhash_neardup(planted, max_bucket=CAP, hot_policy="star").collect()
    planted_pairs = [r for r in out if r.id_a < M and r.id_b < M]
    assert len(planted_pairs) == M - 1
    assert all(r.hamming == 0 for r in planted_pairs)


def test_dhash_guard(spark):
    rows = [(i, "00ff00ff00ff00ff") for i in range(M)]  # identical dhash
    rows += [(M, "0123456789abcdef"), (M + 1, "fedcba9876543210")]
    hashes = spark.createDataFrame(rows, "media_id bigint, dhash_hex string")
    out = dhash_neardup(hashes, max_bucket=CAP, hot_policy="star").collect()
    planted_pairs = [r for r in out if r.id_a < M and r.id_b < M]
    assert len(planted_pairs) == M - 1
    assert all(r.hamming == 0 for r in planted_pairs)


def test_incremental_corpus_hot_bucket(spark, planted):
    """Corpus-side guard in the incremental path: a batch doc identical
    to a hot corpus bucket is still dropped (pairs with the rep)."""
    batch = spark.createDataFrame(
        [
            (1000, "the same boilerplate body text shared by all planted docs"),
            (1001, "a thoroughly novel batch document about something else entirely new"),
        ],
        "doc_id bigint, text string",
    )
    kept = dedup.minhash_dedup_incremental(
        batch, planted, max_bucket=CAP, hot_policy="star"
    ).collect()
    assert sorted(r.doc_id for r in kept) == [1001]


def test_bucket_stats_surfaces_over_cap(spark, planted):
    sigs = dedup.minhash_signatures(planted)
    stats = dedup.lsh_bucket_stats(sigs, max_bucket=CAP).collect()
    over = [r for r in stats if r.over_cap]
    assert over and all(r.members == M for r in over)  # the planted bucket, every band
    assert sum(r.n_buckets for r in over) == 8  # one degenerate bucket per band


def test_bad_policy_and_cap_raise(spark, planted):
    sigs = dedup.minhash_signatures(planted)
    with pytest.raises(ValueError, match="hot_policy"):
        dedup.minhash_lsh_candidates(sigs, hot_policy="drop")
    with pytest.raises(ValueError, match="max_bucket"):
        dedup.minhash_lsh_candidates(sigs, max_bucket=1)


def test_ppjoin_equals_bruteforce_and_prunes(spark, planted):
    """Prefix filtering is EXACT: pair set == jaccard_pairs at the same
    threshold on a corpus with heavy duplication; and the candidate
    explode really is smaller than the full shingle stream."""
    from pyspark.sql import functions as F

    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(planted, min_jaccard=0.5).collect()
    }
    pp = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_join_prefix(planted, min_jaccard=0.5).collect()
    }
    assert pp == brute and len(pp) > 0
    # prefix stream strictly smaller than full shingle stream at t=0.5
    sh = dedup.shingles_df(planted, "doc_id", "text", 3)
    full = sh.count()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    lists = sh.join(freq, "shingle").groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("seq")
    )
    plen = (F.size("seq") - F.ceil(F.lit(0.5) * F.size("seq")) + 1).cast("int")
    pref = lists.withColumn("__p", plen).select(
        F.explode(F.expr("slice(seq, 1, __p)")).alias("x")
    )
    assert pref.count() < full
    import pytest

    with pytest.raises(ValueError, match="min_jaccard"):
        dedup.jaccard_join_prefix(planted, min_jaccard=0.0)


# ----------------------------------------------------------- containment

def test_containment_detects_subsumed_doc(spark):
    from bigdatamigratecloud_spark.operators.dedup import containment_pairs

    snippet = "alpha beta gamma delta epsilon"
    article = "intro words here " + snippet + " closing words trail out"
    docs = spark.createDataFrame(
        [(1, snippet), (2, article), (3, "totally different text body now")],
        "doc_id long, text string",
    )
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_pairs(docs, min_containment=0.9).collect()
    }
    # every 3-shingle of the snippet appears in the article -> 1.0
    assert got == {(1, 2): 1.0}


def test_containment_is_directional_and_thresholds(spark):
    from bigdatamigratecloud_spark.operators.dedup import containment_pairs

    # A has 4 shingles, 2 shared; B has 8 shingles, 2 shared:
    # containment(A->B)=0.5, (B->A)=0.25
    a = "w1 w2 w3 w4 w5 w6"                   # shingles: 4
    b = "w3 w4 w5 x1 x2 x3 x4 x5 x6 x7"       # shares w3 w4 w5 -> 1 shared... build carefully
    docs = spark.createDataFrame(
        [(1, a), (2, "w1 w2 w3 w4 q1 q2 q3 q4 q5 q6")],
        "doc_id long, text string",
    )
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_pairs(docs, min_containment=0.4).collect()
    }
    # doc1: 4 shingles (w1w2w3, w2w3w4, w3w4w5, w4w5w6); doc2 shares
    # w1w2w3 and w2w3w4 -> containment(1->2) = 2/4 = 0.5
    # doc2: 8 shingles, 2 shared -> 0.25 (below threshold, absent)
    assert got == {(1, 2): 0.5}


def test_containment_validates_threshold(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        containment_pairs(docs, min_containment=0.0)


# ------------------------------------------------- sorted neighborhood

def test_sorted_neighborhood_window_and_blocks(spark):
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "a", "apple"), (2, "a", "apricot"), (3, "a", "banana"), (4, "a", "berry"),
        (5, "b", "apple"),   # other block: never pairs with block a
    ]
    df = spark.createDataFrame(rows, "doc_id long, blk string, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, block_expr=F.col("blk"), key_expr=F.col("name"), window=3
        ).collect()
    }
    # block a sort: apple(1), apricot(2), banana(3), berry(4); window 3
    # -> successors at distance 1 and 2
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_sorted_neighborhood_candidate_bound_and_guard(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.dedup import sorted_neighborhood_pairs

    n = 200
    df = spark.createDataFrame(
        [(i, "x", f"k{i:04d}") for i in range(n)], "doc_id long, blk string, name string"
    )
    w = 5
    out = sorted_neighborhood_pairs(df, F.col("blk"), F.col("name"), window=w)
    assert out.count() == (n - 1) + (n - 2) + (n - 3) + (n - 4)  # O(n*window)
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, F.col("blk"), F.col("name"), window=1)
