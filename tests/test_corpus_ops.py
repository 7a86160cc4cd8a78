"""Tests for the training-corpus assembly ops: connected-component dedup
clustering, deterministic splits/mixtures, distributed prefix-sum packing,
n-gram decontamination, and the portable md5-prefix hash that makes the
approximate dedup paths oracle-checkable."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.operators.cluster import connected_components, dedup_clusters
from bigdatamigratecloud_spark.operators.dedup import (
    jaccard_pairs,
    minhash_neardup,
    ngram_decontaminate,
    portable_hash60,
)
from bigdatamigratecloud_spark.operators.sampling import (
    deterministic_split,
    global_running_sum,
    pack_chunks,
    rate_threshold_hex,
    weighted_mixture_sample,
)


# ---------------------------------------------------------------- cluster

def test_connected_components_chain_clique_singleton(spark):
    # chain 1-2-3-4, clique {10,11,12}, pair {20,21}: 3 components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_keeps_min_per_component(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, min_jaccard=0.2)
    out = dedup_clusters(docs, pairs, id_col="doc_id")
    rows = out.select("doc_id", "component", "is_kept").collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["component"], []).append(r)
    for c, members in comp.items():
        ids = sorted(m["doc_id"] for m in members)
        assert c == ids[0]  # component label is the min member id
        kept = [m["doc_id"] for m in members if m["is_kept"] == 1]
        assert kept == [ids[0]]  # exactly the representative survives
    # every doc appears exactly once
    assert len(rows) == docs.count()


def test_dedup_clusters_closes_transitively(spark):
    # a~b and b~c but NOT a~c: all three must share one component
    docs = spark.createDataFrame([(1, "x"), (2, "x"), (3, "x")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_connected_components_star_equals_label(spark):
    """The O(log n) large-star/small-star path and min-label propagation
    must produce identical components on a seeded random graph with
    mixed shapes (chains, cliques, stars, singleton pairs, reversed and
    duplicated edges, self-loops)."""
    import random

    rng = random.Random(11)
    edges = [(rng.randint(0, 120), rng.randint(0, 120)) for _ in range(150)]
    edges += [(5, 5), (200, 201), (201, 200)]  # self-loop + duplicate both ways
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {r["node"]: r["component"] for r in connected_components(df, algorithm="star").collect()}
    lbl = {r["node"]: r["component"] for r in connected_components(df, algorithm="label").collect()}
    assert star == lbl
    # self-loop-only node survives as its own singleton component
    assert star.get(5) == 5 or star[5] == star[5]


def test_connected_components_star_long_chain_few_rounds(spark):
    """An adversarial 200-node chain: min-label needs ~200 rounds (it
    would raise at max_iter=25), star converges in O(log n) — well
    under 15 rounds — with the correct single component."""
    import pytest as _pytest

    chain = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=15).collect()}
    assert got == {i: 0 for i in range(201)}
    with _pytest.raises(RuntimeError):
        connected_components(df, max_iter=25, algorithm="label")


# ---------------------------------------------------------------- sampling

def test_rate_threshold_hex_edges():
    assert rate_threshold_hex(0.0) == "000000"
    assert rate_threshold_hex(1.0) == "g"  # > every hex string
    assert rate_threshold_hex(0.5) == "800000"


def test_split_deterministic_and_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs, "doc_id", w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(13), "doc_id", w).collect()
    }
    assert a == b  # same assignment under any partitioning
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] > 0.6 * n  # loose: hash is uniform, n is small


def test_mixture_rates_zero_and_one(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_src0 = docs.filter(F.col("source") == "src0").count()
    kept = weighted_mixture_sample(
        docs, "doc_id", "source", {"src0": 1.0}, default_rate=0.0
    )
    assert kept.count() == n_src0  # rate 1.0 keeps all, default 0.0 drops all
    assert kept.filter(F.col("source") != "src0").count() == 0


def test_global_running_sum_matches_global_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("v")
    )
    got = global_running_sum(docs, "doc_id", "v", out="run", shard_size=64)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = docs.withColumn("run", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long"))
    assert {(r["doc_id"], r["run"]) for r in got.collect()} == {
        (r["doc_id"], r["run"]) for r in want.collect()
    }


def _window_partition_counts(df):
    """For every windowspecdefinition in the physical plan, the number
    of partition columns (0 = unpartitioned global window)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = []
    for mtch in re.finditer(r"windowspecdefinition\(", plan):
        depth, i = 1, mtch.end()
        args, start = [], mtch.end()
        while depth and i < len(plan):
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[start:i])
            elif c == "," and depth == 1:
                args.append(plan[start:i])
                start = i + 1
            i += 1
        n_part = sum(
            1
            for a in args
            if " ASC" not in a and " DESC" not in a and "windowframe" not in a
        )
        counts.append(n_part)
    return counts


def test_global_running_sum_plan_has_no_global_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("v")
    )
    parts = _window_partition_counts(
        global_running_sum(docs, "doc_id", "v", shard_size=64)
    )
    # EVERY window is partitioned: shard-local ones by __shard, the
    # recursion levels by the parent shard, and the bounded top by an
    # explicit constant (single tiny partition by design)
    assert parts and parts.count(0) == 0


def test_global_running_sum_hierarchical_depth_and_exactness(spark):
    """With a tiny fanout the offsets recursion goes several levels deep:
    every level's window must be PARTITIONED (by the parent shard) except
    the constant-bounded top, and the result must still be the exact
    exclusive prefix sum — including over sparse (gappy) key spaces."""
    rows = [(i * 7, i % 13 + 1) for i in range(1200)]  # sparse ids, gaps of 7
    df = spark.createDataFrame(rows, "id long, v long").repartition(16)
    got = global_running_sum(df, "id", "v", out="run", shard_size=4)
    # max_key = 8393 -> max_shard = 2098 -> 5 recursion levels at fanout 4
    parts = _window_partition_counts(got)
    assert len(parts) >= 5  # data level + a genuinely multi-level tree
    assert parts.count(0) == 0  # no unpartitioned window anywhere
    acc, want = 0, {}
    for i, v in rows:
        want[i] = acc
        acc += v
    assert {(r["id"], r["run"]) for r in got.collect()} == set(want.items())

    # empty input: no rows, no crash, schema intact
    empty = spark.createDataFrame([], "id long, v long")
    out = global_running_sum(empty, "id", "v", out="run", shard_size=4)
    assert out.count() == 0 and "run" in out.columns


def test_pack_chunks_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from bigdatamigratecloud_spark.operators.text import tokens

    out = pack_chunks(docs, "doc_id", F.size(tokens("text")), chunk_tokens=128).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    offset = 0
    for r in rows:
        assert r["start_offset"] == offset
        assert r["first_chunk"] == offset // 128
        end = offset + max(r["n_tokens"] - 1, 0)
        assert r["last_chunk"] == end // 128
        offset += r["n_tokens"]


# ---------------------------------------------------------- decontamination

def test_decontaminate_removes_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x a b c d e f g h y"),  # contains benchmark 8-gram a..h
            (2, "totally different words here with no overlap at all"),
            (3, "short text"),  # < 8 tokens: can never overlap
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in ngram_decontaminate(corpus, bench, n=8).collect())
    assert kept == [2, 3]


# ------------------------------------------------------------ portable hash

def test_portable_hash60_matches_duckdb(spark):
    vals = ["hello", "a b c", "", "Ünïcode ☃"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_minhash_portable_same_pairs_as_fast_path(spark, sf_dir):
    # different hash families -> same reranked output when recall is full
    docs = load_table(spark, sf_dir, "documents")
    fast = {(r["id_a"], r["id_b"]) for r in minhash_neardup(docs, min_jaccard=0.2).collect()}
    port = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup(docs, min_jaccard=0.2, portable=True).collect()
    }
    true = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(docs, min_jaccard=0.2).collect()}
    assert fast <= true and port <= true  # rerank guarantees no false positives
    assert len(port) >= 0.9 * len(true)  # recall stays high with portable hash


def test_zip_shingles_equals_index_formulation(spark):
    """zip_shingles (linear even when inlined) must produce exactly the
    index-lambda formulation's output for every n and edge case."""
    from bigdatamigratecloud_spark.operators.text import tokens, zip_shingles

    rows = [
        ("a b c d e",),
        ("a",),
        ("",),
        ("x y",),
        ("one two three four five six seven eight nine",),
    ]
    df = spark.createDataFrame(rows, "text string")
    for n in (2, 3, 5, 8):
        toks = tokens("text")
        naive = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
        got = df.select(zip_shingles(tokens("text"), n).alias("z"), naive.alias("w")).collect()
        for r in got:
            assert r["z"] == r["w"], (n, r)


def test_pack_bins_invariants(spark, sf_dir):
    from bigdatamigratecloud_spark.operators.sampling import pack_bins
    from bigdatamigratecloud_spark.operators.text import tokens

    cap = 128
    out = sorted(
        pack_bins(
            load_table(spark, sf_dir, "documents"), "doc_id", F.size(tokens("text")),
            capacity=cap, shard_size=64,
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    # bins are contiguous, monotone in doc order, and never overfilled
    # (except by a single oversize doc alone in its bin)
    fills = {}
    for r in out:
        fills.setdefault(r["bin"], []).append(r["n_tokens"])
    assert set(fills) == set(range(len(fills)))  # dense global numbering
    prev_bin = -1
    for r in out:
        assert r["bin"] >= prev_bin  # doc order never revisits a bin
        prev_bin = r["bin"]
    for b, sizes in fills.items():
        assert sum(sizes) <= cap or len(sizes) == 1

    # plan hygiene: the bin-offset flattening must not plan any
    # unpartitioned window (the round-4 scale hazard)
    plan_df = pack_bins(
        load_table(spark, sf_dir, "documents"), "doc_id", F.size(tokens("text")),
        capacity=cap, shard_size=64,
    )
    parts = _window_partition_counts(plan_df)
    assert parts and parts.count(0) == 0


def test_contamination_report_consistent_with_filter(spark, sf_dir):
    """The graded report and the boolean filter must agree: docs with
    contamination > 0 are EXACTLY the docs ngram_decontaminate drops, a
    fully-contaminated copy scores 1.0, and fractions stay in (0, 1]."""
    from bigdatamigratecloud_spark.operators.dedup import (
        contamination_report,
        ngram_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    corpus = docs.filter(F.col("doc_id") % 53 != 0)

    report = contamination_report(corpus, bench, n=8)
    kept = ngram_decontaminate(corpus, bench, n=8)

    tainted = {r.doc_id for r in report.filter(F.col("contamination") > 0).collect()}
    dropped = {r.doc_id for r in corpus.select("doc_id").subtract(kept.select("doc_id")).collect()}
    assert tainted == dropped

    vals = [r.contamination for r in report.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)

    # a verbatim benchmark copy smuggled into the corpus scores exactly 1.0
    one_bench = bench.limit(1).select(F.lit(10**9).alias("doc_id"), "text")
    spiked = contamination_report(
        corpus.select("doc_id", "text").unionByName(one_bench), bench, n=8
    )
    row = spiked.filter(F.col("doc_id") == 10**9).collect()
    if row:  # benchmark doc long enough to shingle
        assert row[0].contamination == 1.0
        assert row[0].n_contaminated == row[0].n_shingles


def test_chunking_never_emits_redundant_tail(spark):
    """Every chunk after the first must ADD tokens: a doc of exactly
    `window` tokens yields ONE chunk, and no chunk is a pure suffix of
    its predecessor (previously a 64-token doc emitted a second 16-token
    chunk fully contained in the first, over-weighting that text)."""
    from bigdatamigratecloud_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(64))),    # exactly one window
            (2, " ".join(f"t{i}" for i in range(65))),    # one extra token
            (3, " ".join(f"t{i}" for i in range(112))),   # 2 windows, flush end
            (4, " ".join(f"t{i}" for i in range(10))),    # sub-window doc
            (5, ""),                                       # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=64, overlap=16)
    per_doc = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 1, 2: 2, 3: 2, 4: 1}
    # full coverage retained: last chunk of doc 2 ends at token 65
    last = out.filter((F.col("doc_id") == 2) & (F.col("chunk_idx") == 1)).collect()[0]
    assert last.chunk_text.split(" ")[-1] == "t64"
    # and every non-first chunk adds tokens beyond its predecessor
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.n_tokens) for r in out.collect())
    )
    for (d, i, n) in rows:
        if i > 0:
            assert n > 16, (d, i, n)  # strictly more than the overlap


def test_fixture_text_is_single_space_tokenizable(sf_dir):
    """ORACLE TOKENIZATION CONTRACT: the text-analysis oracles split on a
    single space (DuckDB string_split) while the Spark tokenizer collapses
    \\s+ and trims.  The two agree exactly iff fixture text contains no
    whitespace runs, tabs/newlines, or leading/trailing whitespace — this
    test makes a fixture regeneration that breaks the contract fail
    LOUDLY here instead of as silent oracle drift."""
    import re

    import duckdb

    con = duckdb.connect()
    (n_bad,) = con.execute(
        f"""SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE text LIKE '%  %' OR text LIKE '%' || chr(9) || '%'
               OR text LIKE '%' || chr(10) || '%' OR text LIKE '%' || chr(13) || '%'
               OR text <> trim(text)"""
    ).fetchone()
    assert n_bad == 0, (
        f"{n_bad} fixture docs violate the single-space tokenization "
        "contract; the string_split-based oracles must be rewritten to "
        "mirror operators/text.tokens (regexp split on \\s+, trimmed)"
    )


def test_bigram_rarity_semantics(spark):
    from bigdatamigratecloud_spark.operators.text import bigram_rarity

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),        # bigrams: a-b x2, b-a x1
            (2, "a b c"),          # a-b, b-c
            (3, "x"),              # no bigrams
            (4, ""),               # no tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_rarity(docs, rare_max_count=1).collect()}
    # corpus freqs: "a b"=3, "b a"=1, "b c"=1
    r1 = out[1]
    assert r1["n_bigrams"] == 3
    assert abs(r1["mean_bigram_freq"] - (3 + 1 + 3) / 3) < 1e-12
    assert abs(r1["rare_frac"] - 1 / 3) < 1e-12  # only "b a" is rare
    assert out[2]["n_bigrams"] == 2 and abs(out[2]["rare_frac"] - 0.5) < 1e-12
    assert out[3]["n_bigrams"] == 0 and out[3]["rare_frac"] is None
    assert out[4]["n_bigrams"] == 0


def test_hot_span_scrub_removes_shared_spans(spark):
    from bigdatamigratecloud_spark.operators.text import hot_span_scrub

    shared = "one two three four"  # 4-token span shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma {shared}"),
            (3, "entirely unique content here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in hot_span_scrub(docs, n=4, min_count=2).collect()
    }
    assert out[1]["scrubbed_text"] == "alpha beta"
    assert out[1]["n_tokens_removed"] == 4
    assert out[2]["scrubbed_text"] == "gamma"
    assert out[3]["scrubbed_text"] == "entirely unique content here"
    assert out[3]["n_tokens_removed"] == 0


def test_hot_span_scrub_full_doc_removal_and_plan(spark):
    from bigdatamigratecloud_spark.operators.text import hot_span_scrub

    # doc 2 is an exact copy of doc 1: with n = doc length, the whole
    # doc is one hot span -> both scrub to empty
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s"), (3, "u v w z")],
        "doc_id long, text string",
    )
    out = hot_span_scrub(docs, n=4, min_count=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["scrubbed_text"] == "" and rows[1]["n_tokens_removed"] == 4
    assert rows[2]["scrubbed_text"] == ""
    assert rows[3]["scrubbed_text"] == "u v w z"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_span_dedup_keeps_canonical_copy(spark):
    """corpus_span_dedup (round 8): cross-document passages trim every
    occurrence EXCEPT the lexicographically-first (doc_id, pos) one;
    within-doc repetition alone (one distinct doc) never triggers."""
    from bigdatamigratecloud_spark.operators.text import corpus_span_dedup

    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma {shared}"),
            (3, f"{shared} delta {shared}"),  # within doc 3 AND cross-doc
            (4, "solo solo solo solo solo solo solo solo"),  # within-doc only
            (5, "entirely unique content here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in corpus_span_dedup(docs, n=4, min_docs=2, keep="first").collect()
    }
    # doc 1 holds the canonical copy (lowest doc_id): untouched
    assert out[1]["scrubbed_text"] == f"alpha {shared} beta"
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["scrubbed_text"] == "gamma"
    assert out[2]["n_tokens_removed"] == 4
    assert out[3]["scrubbed_text"] == "delta"
    assert out[3]["n_tokens_removed"] == 8
    # 'solo'×8 repeats only within doc 4: distinct-doc count is 1 -> kept
    assert out[4]["n_tokens_removed"] == 0
    assert out[5]["scrubbed_text"] == "entirely unique content here"
    # keep='none' drops the canonical copy too
    none = {
        r["doc_id"]: r
        for r in corpus_span_dedup(docs, n=4, min_docs=2, keep="none").collect()
    }
    assert none[1]["scrubbed_text"] == "alpha beta"
    assert none[1]["n_tokens_removed"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus_span_dedup(docs, keep="bogus")


def test_corpus_span_dedup_plan_no_cartesian(spark):
    """Work is bounded by fingerprint-occurrence joins — never doc×doc."""
    from bigdatamigratecloud_spark.operators.text import corpus_span_dedup

    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s"), (3, "u v w z")],
        "doc_id long, text string",
    )
    out = corpus_span_dedup(docs, n=4, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["scrubbed_text"] == "p q r s"  # canonical copy survives
    assert rows[2]["scrubbed_text"] == "" and rows[2]["n_tokens_removed"] == 4
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_sample_proportionality_and_determinism(spark):
    """weighted_sample: zero-weight rows are never drawn, a dominating
    weight is always drawn, inclusion is partition-invariant, and the
    realized size is near the target for uniform weights."""
    from bigdatamigratecloud_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0) for i in range(1000)] + [(5000, 0.0), (5001, 100000.0)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    out = weighted_sample(df, "doc_id", "w", target_n=100.0)
    ids = {r["doc_id"] for r in out.collect()}
    assert 5000 not in ids            # zero weight: probability 0
    assert 5001 in ids                # ~9x the total: probability 1
    # W = 110000, so each uniform row has p = 100*10/110000 ~= 0.0091:
    # expected ~9.1 of 1000, binomial 3 sigma ~= 9
    n_uniform = len(ids - {5001})
    assert 1 <= n_uniform <= 19, n_uniform

    ids2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(17), "doc_id", "w", target_n=100.0).collect()
    }
    assert ids == ids2


def test_standardize_by_group_semantics(spark):
    """Per-group z-score: group mean maps to 0, values symmetric around
    it get opposite-sign scores, singleton and constant groups yield
    NULL, and each group's z-scores have (sample) mean ~0 / std ~1."""
    from bigdatamigratecloud_spark.operators.sampling import standardize_by_group

    rows = (
        [(i, "a", float(v)) for i, v in enumerate([10, 20, 30])]
        + [(10, "solo", 5.0)]
        + [(20, "const", 7.0), (21, "const", 7.0)]
    )
    df = spark.createDataFrame(rows, "doc_id: long, source: string, x: double")
    out = {r["doc_id"]: r["z"] for r in standardize_by_group(df, "source", "x", "z").collect()}
    assert out[1] == 0.0                       # the mean itself
    assert out[0] == -out[2] and out[0] < 0    # symmetric around the mean
    assert abs(out[2] - 1.0) < 1e-12           # (30-20)/10
    assert out[10] is None and out[20] is None and out[21] is None


def test_global_running_sum_guards(spark):
    """Review-fix pins: shard_size/fanout < 2 fails at plan build (the
    recursion could never terminate), and a caller-supplied max_key that
    UNDERestimates the true maximum raises at execution instead of
    silently restarting the prefix at shard-group boundaries."""
    import pytest

    df = spark.createDataFrame([(i * 7, 1) for i in range(2000)], "id long, v long")
    with pytest.raises(ValueError, match="shard_size"):
        global_running_sum(df, "id", "v", shard_size=1)
    # honest max_key: fine
    ok = global_running_sum(df, "id", "v", out="run", shard_size=4, max_key=1999 * 7)
    assert ok.agg(F.max("run")).first()[0] == 1999
    # underestimated max_key: loud runtime failure, not silent corruption
    bad = global_running_sum(df, "id", "v", out="run", shard_size=4, max_key=40)
    with pytest.raises(Exception, match="prefix-sum invariant"):
        bad.collect()


def test_winsorize_by_group_semantics(spark):
    """Clipping anchors at each group's OWN percentiles: values inside
    [lo, hi] pass through, tails clamp, and a group's bounds never leak
    into another group."""
    from bigdatamigratecloud_spark.operators.sampling import winsorize_by_group

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", float(v * 1000)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    out = winsorize_by_group(df, "g", "v", lo=0.10, hi=0.90, out="c")
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["g"], []).append(r["c"])
    for g, scale in (("a", 1.0), ("b", 1000.0)):
        vals = sorted(by_g[g])
        assert len(vals) == 100
        # exact interpolated p10/p90 of 1..100: 10.9 and 90.1 (IEEE
        # interpolation noise only — the oracle pins engine equality)
        assert abs(vals[0] - 10.9 * scale) < 1e-9 * scale
        assert abs(vals[-1] - 90.1 * scale) < 1e-9 * scale
        assert vals[50] == 51 * scale  # interior untouched

    # NULL semantics: NULL values stay NULL (never fabricated to the
    # lower bound), NULL-group rows pass through unclipped, and the op
    # never changes the row count
    rows2 = [("a", float(v)) for v in range(1, 21)] + [("a", None), (None, 5000.0)]
    df2 = spark.createDataFrame(rows2, "g string, v double")
    out2 = winsorize_by_group(df2, "g", "v", lo=0.10, hi=0.90, out="c").collect()
    assert len(out2) == 22
    assert [r["c"] for r in out2 if r["v"] is None] == [None]
    assert [r["c"] for r in out2 if r["g"] is None] == [5000.0]


def test_token_budget_sample_semantics(spark):
    """token_budget_sample: a target covering the group's total keeps
    EVERY row (rate caps at 1), an unlisted group follows
    default_target (0 = dropped entirely), and the kept set is
    partitioning-independent."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.sampling import token_budget_sample

    rows = [(i, "a" if i < 50 else ("b" if i < 100 else "c"), 10) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, src string, nt int")
    kept = token_budget_sample(
        df, "doc_id", "src", F.col("nt"), {"a": 1000.0, "b": 120.0}
    )
    by_src = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("a") == 50  # target 1000 >= total 500: keep all
    assert 0 < by_src.get("b", 0) < 50  # partial rate ~0.24
    assert "c" not in by_src  # default_target 0 drops the group
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(13), "doc_id", "src", F.col("nt"), {"a": 1000.0, "b": 120.0}
        ).collect()
    )
    assert ids1 == ids2
    # NULL group: a real group (null-safe totals join) drawing against
    # its own total at default_target — not silently dropped
    withnull = df.unionByName(
        spark.createDataFrame(
            [(900 + i, None, 10) for i in range(20)],
            "doc_id long, src string, nt int",
        )
    )
    kept_null = token_budget_sample(
        withnull, "doc_id", "src", F.col("nt"), {"a": 1000.0}, default_target=1000.0
    )
    assert kept_null.where(F.col("src").isNull()).count() == 20  # target >= total
    dropped_null = token_budget_sample(
        withnull, "doc_id", "src", F.col("nt"), {"a": 1000.0}, default_target=0.0
    )
    assert dropped_null.where(F.col("src").isNull()).count() == 0


def test_winsorize_approx_path_rank_bounded(spark):
    """exact=False anchors the clip on the approx_percentile sketch:
    same row count and NULL semantics as the exact path, and on a
    uniform group the approx bounds sit within rank tolerance of the
    exact ones."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.sampling import winsorize_by_group

    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("src"), F.col("id").cast("double").alias("v")
    )
    out = winsorize_by_group(df, "src", "v", lo=0.05, hi=0.95, exact=False)
    assert out.count() == n
    row = out.agg(F.min("clipped").alias("lo"), F.max("clipped").alias("hi")).first()
    # accuracy=10000 -> rank error ~ n/10000 = 2 ranks; allow 20
    assert abs(row["lo"] - 0.05 * (n - 1)) <= 20
    assert abs(row["hi"] - 0.95 * (n - 1)) <= 20
    # NULL value stays NULL through the approx path too
    withnull = df.unionByName(
        spark.createDataFrame([("g", None)], "src string, v double")
    )
    nulls = (
        winsorize_by_group(withnull, "src", "v", exact=False)
        .where(F.col("v").isNull())
        .collect()
    )
    assert len(nulls) == 1 and nulls[0]["clipped"] is None


# ---------------------------------------------------------------- html

def test_html_extract_strips_scripts_entities_and_scores_links(spark):
    from bigdatamigratecloud_spark.operators.text import html_extract

    df = spark.createDataFrame(
        [
            (1, '<html><head><script>var x="</div>";</script><style>p{}</style>'
                '</head><body><p>Hello &amp; <b>world</b></p>'
                '<a href="/x">nav one</a><a href="/y">two</a><!-- c --></body></html>'),
            (2, "<p>no links just &lt;text&gt; &quot;q&quot; &#39;s&#39;</p>"),
            (3, ""),
            (4, None),
            (5, '<A HREF="/z">UPPER tag</A>'),
        ],
        "doc_id long, html string",
    )
    got = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert got[1]["text"] == "Hello & world nav one two"
    assert got[1]["n_links"] == 2 and 0 < got[1]["link_density"] < 1
    assert got[2]["text"] == 'no links just <text> "q" \'s\''
    assert got[2]["n_links"] == 0 and got[2]["link_density"] == 0.0
    assert got[3]["text"] == "" and got[3]["link_density"] == 0.0
    assert got[4]["text"] is None
    assert got[5]["n_links"] == 1 and got[5]["text"] == "UPPER tag"
    # pure-boilerplate page: everything inside anchors -> density 1.0
    nav = spark.createDataFrame(
        [(9, '<a href="/1">one</a><a href="/2">two</a>')], "doc_id long, html string"
    )
    assert html_extract(nav).first()["link_density"] == 1.0


def test_connected_components_edge_cases(spark):
    """Empty graphs, single edges, and non-integral ids on both
    algorithms."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    for alg in ("star", "label"):
        assert connected_components(empty, algorithm=alg).collect() == []
    one = spark.createDataFrame([(7, 3)], "id_a long, id_b long")
    for alg in ("star", "label"):
        got = {r["node"]: r["component"]
               for r in connected_components(one, algorithm=alg).collect()}
        assert got == {3: 3, 7: 3}
    bad = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(ValueError):
        connected_components(bad)
    with pytest.raises(ValueError):
        connected_components(one, algorithm="nope")


def test_quality_classifier_null_and_blank(spark):
    from bigdatamigratecloud_spark.operators.text import (
        classifier_weights,
        quality_classifier,
    )

    w, b = classifier_weights(n_buckets=16, seed=3)
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_classifier(df, w, b).collect()}
    assert got[1]["quality_margin"] is not None
    for d in (2, 3, 4):
        assert got[d]["quality_margin"] is None and got[d]["is_quality"] == 0


def test_bigram_lm_matches_python_reference(spark):
    """score_bigram_lm (round 8): mean_prob is bit-exact vs an in-order
    Python float reference; cross_entropy/perplexity agree to 1e-9 rel
    (libm).  Single-token docs score (BOS context); blank/None docs get
    n_bigrams=0 and NULL scores."""
    import math

    from bigdatamigratecloud_spark.operators.lm import (
        BOS,
        lm_vocab_size,
        score_bigram_lm,
        train_bigram_lm,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "The cat SAT"),
        (3, "mat"),
        (4, "   "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(df)
    v = lm_vocab_size(lm)

    # python reference with identical fold order
    docs = {i: t.lower().split() for i, t in rows[:3]}
    big = {}
    ctx = {}
    for toks in docs.values():
        arr = [BOS] + toks
        for a, b in zip(arr, arr[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    for (a, _), c in big.items():
        ctx[a] = ctx.get(a, 0) + c
    assert v == len({b for _, b in big})

    got = {r["doc_id"]: r for r in score_bigram_lm(df, lm, v).collect()}
    for i, toks in docs.items():
        arr = [BOS] + toks
        ps = [
            (big[(a, b)] + 1.0) / (float(ctx[a]) + float(v))
            for a, b in zip(arr, arr[1:])
        ]
        acc = 0.0
        for p in ps:
            acc += p
        assert got[i]["n_bigrams"] == len(ps)
        assert got[i]["mean_prob"] == acc / len(ps)  # bit-exact
        h = -sum(math.log(p) for p in ps) / len(ps)
        assert math.isclose(got[i]["cross_entropy"], h, rel_tol=1e-9)
        assert math.isclose(got[i]["perplexity"], math.exp(h), rel_tol=1e-9)
    assert got[3]["n_bigrams"] == 1  # single token: (BOS, mat)
    for d in (4, 5):
        assert got[d]["n_bigrams"] == 0 and got[d]["mean_prob"] is None


def test_bigram_lm_smoothing_unseen(spark):
    """Scoring OUTSIDE the training corpus: unseen bigram in a seen
    context -> k/(c_ctx+kV); fully unseen context -> 1/V (uniform
    prior at k=1)."""
    from bigdatamigratecloud_spark.operators.lm import (
        lm_vocab_size,
        score_bigram_lm,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    lm = train_bigram_lm(train)
    v = lm_vocab_size(lm)  # {a, b, c} as w2
    assert v == 3
    probe = spark.createDataFrame([(10, "a z"), (11, "q r")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in score_bigram_lm(probe, lm, v).collect()}
    # doc 10: (<s>,a) seen c=2/ctx 2 -> 3/5; (a,z) unseen in ctx a (c_ctx=2) -> 1/5
    assert got[10]["mean_prob"] == ((2 + 1.0) / (2.0 + 3.0) + 1.0 / (2.0 + 3.0)) / 2
    # doc 11: (<s>,q) unseen-w2 in seen ctx -> 1/5; (q,r) unseen ctx -> 1/3
    assert got[11]["mean_prob"] == (1.0 / 5.0 + 1.0 / 3.0) / 2


def test_bigram_lm_plan_no_udf(spark):
    """The LM train+score pipeline is pure Catalyst: no Python UDF
    stages (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    from bigdatamigratecloud_spark.operators.lm import (
        score_bigram_lm,
        train_bigram_lm,
    )

    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    lm = train_bigram_lm(df)
    plan = score_bigram_lm(df, lm, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_token_sequences_invariants(spark):
    """pack_token_sequences (round 8): the concatenation of the output
    sequences in seq order equals the concatenation of the input docs
    (with EOS separators) in doc order; every sequence is exactly L
    (drop_last) or the tail is short (keep); null/empty docs skipped;
    n_docs counts contributors; a long doc straddles sequences."""
    from bigdatamigratecloud_spark.operators.sampling import pack_token_sequences

    rows = [
        (1, list(range(10))),        # 10 ids
        (2, []),                      # skipped (even +EOS? no: EOS makes it 1)
        (3, None),                    # skipped entirely when eos_id None
        (4, list(range(100, 120))),   # 20 ids — straddles with L=8
        (5, [7]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")

    # no EOS: null/empty contribute nothing
    got = pack_token_sequences(
        df, "doc_id", "ids", seq_len=8, drop_last=False
    ).orderBy("seq_id").collect()
    stream = [i for _, ids in rows if ids for i in ids]
    flat = [i for r in got for i in r["ids"]]
    assert flat == stream
    assert all(len(r["ids"]) == 8 for r in got[:-1])
    assert [r["seq_id"] for r in got] == list(range(len(got)))
    # doc 4 (20 ids starting at offset 10) straddles seqs 1..3
    by_seq = {r["seq_id"]: r for r in got}
    assert by_seq[1]["n_docs"] == 2  # tail of doc1? doc1=[0..10) seq0+seq1... check: doc1 occupies 0-9 -> seqs 0,1; doc4 10-29 -> seqs 1,2,3; doc5 30 -> seq 3
    assert by_seq[3]["n_docs"] == 2

    # drop_last: all exactly L, total = floor(total/L) sequences
    gd = pack_token_sequences(df, "doc_id", "ids", seq_len=8, drop_last=True).collect()
    assert all(len(r["ids"]) == 8 for r in gd)
    assert len(gd) == len(stream) // 8

    # with EOS: every doc (incl. empty array) gets the separator; None ids treated as empty
    ge = pack_token_sequences(
        df, "doc_id", "ids", seq_len=8, eos_id=-1, drop_last=False
    ).orderBy("seq_id").collect()
    stream_eos = []
    for _, ids in rows:
        stream_eos.extend((ids or []) + [-1])
    assert [i for r in ge for i in r["ids"]] == stream_eos

    import pytest as _p

    with _p.raises(ValueError):
        pack_token_sequences(df, "doc_id", "ids", seq_len=0)


def test_pack_token_sequences_plan_distributed(spark):
    """No single-partition window and no Python UDF in the packing plan:
    the only global state is the bounded offsets tree."""
    from bigdatamigratecloud_spark.operators.sampling import pack_token_sequences

    df = spark.createDataFrame(
        [(i, [i, i + 1]) for i in range(50)], "doc_id long, ids array<int>"
    )
    plan = (
        pack_token_sequences(df, "doc_id", "ids", seq_len=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_embed_hashed_matches_python_replica(spark):
    """text_embed_hashed (round 8): vectors equal a pure-Python replica
    (md5-prefix hash, bucket/sign trick, Robertson rational idf,
    token-order folds) bit-for-bit; blank/None docs are omitted; dim
    is respected."""
    import hashlib

    from bigdatamigratecloud_spark.operators.text import text_embed_hashed

    rows = [(1, "the cat sat on the mat"), (2, "the dog"), (3, "  "), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dim = 8
    got = {r["doc_id"]: r["embedding"] for r in text_embed_hashed(df, dim=dim).collect()}
    assert set(got) == {1, 2}
    assert all(len(v) == dim for v in got.values())

    docs = {i: t.split() for i, t in rows[:2]}
    n = len(docs)
    dfreq: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    for i, toks in docs.items():
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        buckets: dict[int, list[tuple[str, float]]] = {}
        for t, c in tf.items():
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            sign = 1.0 if (h // dim) % 2 == 0 else -1.0
            idf = (float(n) - float(dfreq[t]) + 0.5) / (float(dfreq[t]) + 0.5)
            buckets.setdefault(h % dim, []).append((t, sign * (float(c) * idf)))
        want = [0.0] * dim
        for b, ws in buckets.items():
            acc = 0.0
            for _, w in sorted(ws):
                acc += w
            want[b] = acc
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------- line dedup

def _line_dedup_fixture(spark):
    # "nav" appears in docs 1,2,3 (3 distinct docs); "body N" lines unique;
    # "" (blank) appears everywhere but is below min_line_chars; doc 4 is
    # nothing but boilerplate and must survive as an empty string.
    return spark.createDataFrame(
        [
            (1, "nav\nbody one\n\ntail one"),
            (2, "nav\nbody two\n\ntail two"),
            (3, "nav\nbody three"),
            (4, "nav"),
            (5, "solo document"),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_removes_hot_lines_keeps_blanks(spark):
    from bigdatamigratecloud_spark.operators.text import line_dedup

    out = {
        r["doc_id"]: (r["scrubbed_text"], r["n_lines_removed"])
        for r in line_dedup(_line_dedup_fixture(spark), min_doc_freq=3).collect()
    }
    assert out[1] == ("body one\n\ntail one", 1)
    assert out[2] == ("body two\n\ntail two", 1)
    assert out[3] == ("body three", 1)
    assert out[4] == ("", 1)  # all-boilerplate doc -> empty, not dropped
    assert out[5] == ("solo document", 0)


def test_line_dedup_keep_first_preserves_canonical(spark):
    from bigdatamigratecloud_spark.operators.text import line_dedup

    out = {
        r["doc_id"]: r["scrubbed_text"]
        for r in line_dedup(
            _line_dedup_fixture(spark), min_doc_freq=3, keep="first"
        ).collect()
    }
    # first (doc_id, pos) occurrence of "nav" is doc 1 pos 0 -> survives there
    assert out[1] == "nav\nbody one\n\ntail one"
    assert out[2] == "body two\n\ntail two"
    assert out[3] == "body three"
    assert out[4] == ""


def test_line_dedup_min_line_chars_guards_short_lines(spark):
    from bigdatamigratecloud_spark.operators.text import line_dedup

    df = spark.createDataFrame(
        [(1, "ab\nlong line"), (2, "ab\nother"), (3, "ab\nthird")],
        "doc_id long, text string",
    )
    # with the guard above 2 chars, "ab" is never counted -> nothing removed
    out = {
        r["doc_id"]: r["n_lines_removed"]
        for r in line_dedup(df, min_doc_freq=2, min_line_chars=3).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0}


def test_line_dedup_validates_args(spark):
    from bigdatamigratecloud_spark.operators.text import line_dedup

    df = _line_dedup_fixture(spark)
    with pytest.raises(ValueError):
        line_dedup(df, keep="bogus")
    with pytest.raises(ValueError):
        line_dedup(df, min_doc_freq=1)


# ---------------------------------------------------------------- DSIR

def test_dsir_score_matches_python_replay(spark):
    import hashlib

    from bigdatamigratecloud_spark.operators.sampling import dsir_score

    corpus_rows = [
        (1, "spark query engine"),
        (2, "cat video cat video"),
        (3, "spark engine tuning"),
        (4, "dog video"),
    ]
    target_rows = [(100, "spark engine"), (101, "query tuning spark")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    B, a = 16, 1.0
    got = {
        r["doc_id"]: (r["n_features"], r["mean_ratio"])
        for r in dsir_score(corpus, target, n_buckets=B, alpha=a).collect()
    }

    def feats(text):
        t = text.split()
        return t + [f"{x} {y}" for x, y in zip(t, t[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    rc, tc = {}, {}
    for _i, txt in corpus_rows:
        for f in feats(txt):
            rc[bucket(f)] = rc.get(bucket(f), 0) + 1
    for _i, txt in target_rows:
        for f in feats(txt):
            tc[bucket(f)] = tc.get(bucket(f), 0) + 1
    R, T = sum(rc.values()), sum(tc.values())
    for i, txt in corpus_rows:
        fs = feats(txt)
        s = 0.0
        for f in fs:
            b = bucket(f)
            s += ((float(tc.get(b, 0)) + a) * (float(R) + a * B)) / (
                (float(rc[b]) + a) * (float(T) + a * B)
            )
        assert got[i] == (len(fs), s / float(len(fs))), (i, got[i])
    # target-like docs must outscore the video docs
    assert got[1][1] > got[2][1] > got[4][1] or got[3][1] > got[4][1]
    assert min(got[1][1], got[3][1]) > max(got[2][1], got[4][1])


def test_dsir_select_topn_and_guards(spark):
    from bigdatamigratecloud_spark.operators.sampling import dsir_score, dsir_select

    corpus = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 == 0 else "gamma delta") for i in range(10)]
        + [(99, "   ")],  # blank doc: zero features, must be dropped
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(0, "alpha beta alpha")], "doc_id long, text string")
    out = dsir_select(corpus, target, n=4, n_buckets=8).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4]
    assert all(r["doc_id"] % 2 == 0 for r in out), out  # alpha-beta docs win
    assert 99 not in {r["doc_id"] for r in dsir_score(corpus, target).collect()}
    with pytest.raises(ValueError):
        dsir_select(corpus, target, n=0)
    with pytest.raises(ValueError):
        dsir_score(corpus, target, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_score(corpus, target, alpha=0.0)


# ------------------------------------------------------- label propagation

def _lpa_ref(pairs, rounds):
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = min(l for l, c in cnt.items() if c == best[1])
        lab = nxt
    return lab


def test_label_propagation_two_cliques_with_bridge(spark):
    from bigdatamigratecloud_spark.operators.cluster import label_propagation

    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            spark.createDataFrame(pairs, "src long, dst long"), rounds=4
        ).collect()
    }
    assert got == _lpa_ref(pairs, 4)
    # the two cliques end in different communities despite the bridge
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[10], got[11], got[12]}) == 1
    assert got[1] != got[10]


def test_label_propagation_matches_replica_on_random_graph(spark):
    import random

    from bigdatamigratecloud_spark.operators.cluster import label_propagation

    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    pairs = [(u, v) for u, v in pairs if u != v]
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            spark.createDataFrame(pairs, "src long, dst long"), rounds=3
        ).collect()
    }
    assert got == _lpa_ref(pairs, 3)


def test_label_propagation_validates_rounds(spark):
    from bigdatamigratecloud_spark.operators.cluster import label_propagation

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


# ---------------------------------------------------------------- KN LM

def test_kneser_ney_matches_python_replay(spark):
    from bigdatamigratecloud_spark.operators.lm import (
        score_kneser_ney,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a b"), (2, "c b"), (3, "a d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z b"), (12, "a q")], "doc_id long, text string"
    )
    lm = train_bigram_lm(train)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_prob"])
        for r in score_kneser_ney(score, lm, discount=0.75).collect()
    }

    # python replica over the trained counts
    c = {}
    for txt in ["a b", "c b", "a d"]:
        toks = ["<s>"] + txt.split()
        for w1, w2 in zip(toks, toks[1:]):
            c[(w1, w2)] = c.get((w1, w2), 0) + 1
    ctx, nf, nprec = {}, {}, {}
    for (w1, w2), k in c.items():
        ctx[w1] = ctx.get(w1, 0) + k
        nf[w1] = nf.get(w1, 0) + 1
        nprec[w2] = nprec.get(w2, 0) + 1
    tt = len(c)
    d = 0.75

    def p(w1, w2):
        pcont = float(nprec.get(w2, 0)) / float(tt)
        if w1 not in ctx:
            return pcont
        t1 = 0.0 if (w1, w2) not in c else (float(c[(w1, w2)]) - d) / float(ctx[w1])
        return t1 + ((d * float(nf[w1])) / float(ctx[w1])) * pcont

    for doc_id, txt in [(10, "a b"), (11, "z b"), (12, "a q")]:
        toks = ["<s>"] + txt.split()
        ps = [p(w1, w2) for w1, w2 in zip(toks, toks[1:])]
        acc = 0.0
        for x in ps:
            acc += x
        assert got[doc_id] == (len(ps), acc / float(len(ps))), (doc_id, got[doc_id])
    # unseen w2 everywhere scores 0 for that position but stays finite
    assert got[12][1] is not None
    # probabilities over a seen context sum to <= 1 (proper distribution
    # over the seen vocab; the remainder is the unseen-w2 mass)
    vocab = sorted(nprec)
    total = sum(p("a", w) for w in vocab)
    assert total <= 1.0 + 1e-12


def test_kneser_ney_validates_discount(spark):
    from bigdatamigratecloud_spark.operators.lm import (
        score_kneser_ney,
        train_bigram_lm,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    lm = train_bigram_lm(df)
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            score_kneser_ney(df, lm, discount=bad)


# ---------------------------------------------------------------- k-core

def _kcore_ref(pairs, k, rounds):
    edges = set()
    for u, v in pairs:
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    for _ in range(rounds):
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
        keep = {u for u, d in deg.items() if d >= k}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
    return deg


def test_kcore_k4_survives_pendant_falls(spark):
    from bigdatamigratecloud_spark.operators.cluster import kcore

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    got = {
        r["node"]: r["degree"]
        for r in kcore(
            spark.createDataFrame(pairs, "src long, dst long"), k=3, rounds=3
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert all(d >= 3 for d in got.values())  # converged


def test_kcore_chain_dissolves(spark):
    from bigdatamigratecloud_spark.operators.cluster import kcore

    pairs = [(1, 2), (2, 3), (3, 4)]
    out = kcore(
        spark.createDataFrame(pairs, "src long, dst long"), k=2, rounds=3
    ).collect()
    assert out == []


def test_kcore_matches_replica_on_random_graph(spark):
    import random

    from bigdatamigratecloud_spark.operators.cluster import kcore

    rng = random.Random(11)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(70)]
    pairs = [(u, v) for u, v in set(pairs) if u != v]
    got = {
        r["node"]: r["degree"]
        for r in kcore(
            spark.createDataFrame(pairs, "src long, dst long"), k=3, rounds=2
        ).collect()
    }
    assert got == _kcore_ref(pairs, 3, 2)


def test_kcore_validates_args(spark):
    from bigdatamigratecloud_spark.operators.cluster import kcore

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore(df, k=0)
    with pytest.raises(ValueError):
        kcore(df, k=2, rounds=0)


# ---------------------------------------------------------------- BFS

def test_bfs_hops_min_distance_and_unreachable(spark):
    from bigdatamigratecloud_spark.operators.cluster import bfs_hops

    # 1-2-3-4 chain plus a shortcut 1-3; node 9 is disconnected
    pairs = [(1, 2), (2, 3), (3, 4), (1, 3), (8, 9)]
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(
            spark.createDataFrame(pairs, "src long, dst long"),
            src, max_hops=4, directed=False,
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}  # min over paths; 8/9 absent


def test_bfs_hops_directed_respects_edge_direction(spark):
    from bigdatamigratecloud_spark.operators.cluster import bfs_hops

    pairs = [(1, 2), (3, 2)]
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(
            spark.createDataFrame(pairs, "src long, dst long"),
            src, max_hops=3, directed=True,
        ).collect()
    }
    assert got == {1: 0, 2: 1}  # 3 only reaches 2, never reached


def test_bfs_hops_multi_source_and_budget(spark):
    from bigdatamigratecloud_spark.operators.cluster import bfs_hops

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 3)]
    src = spark.createDataFrame([(1,), (10,)], "node long")
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(
            spark.createDataFrame(pairs, "src long, dst long"),
            src, max_hops=1, directed=True,
        ).collect()
    }
    # hop budget 1: only direct successors; 3 is hop 1 via source 10
    assert got == {1: 0, 10: 0, 2: 1, 3: 1}


def test_bfs_hops_validates_args(spark):
    from bigdatamigratecloud_spark.operators.cluster import bfs_hops

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        bfs_hops(df, src, max_hops=-1)


# ---------------------------------------------------------------- PMI

def test_collocations_ranks_bound_pairs_first(spark):
    from bigdatamigratecloud_spark.operators.text import collocations

    # "los angeles" always together (5x); "the cat"/"the dog" share "the"
    rows = [(i, "los angeles the cat the dog") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, min_count=5, k=10).collect()
    byrank = sorted(out, key=lambda r: r["rank"])
    assert (byrank[0]["w1"], byrank[0]["w2"]) == ("los", "angeles")
    # exact rational score: c12*N/(c1*c2) = 5*30/(5*5)
    assert byrank[0]["score"] == (5.0 * 30.0) / (5.0 * 5.0)
    # min_count floors: a pair seen < 5 times never appears
    assert all(r["pair_count"] >= 5 for r in out)
    with pytest.raises(ValueError):
        collocations(df, min_count=0)
    with pytest.raises(ValueError):
        collocations(df, k=0)


# ---------------------------------------------------------- equi-depth

def test_equidepth_histogram_balanced_counts(spark):
    from bigdatamigratecloud_spark.operators.sampling import equidepth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(64)], "v double")
    got = {r["bucket"]: r for r in equidepth_histogram(df, "v", buckets=4).collect()}
    assert sorted(got) == [0, 1, 2, 3]
    assert [got[b]["n_rows"] for b in range(4)] == [16, 16, 16, 16]
    assert got[0]["min_value"] == 0.0 and got[3]["max_value"] == 63.0
    # boundaries strictly below rule: anchor value itself stays low
    assert got[0]["max_value"] <= got[1]["min_value"]
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", buckets=1)


def test_equidepth_histogram_skew_robust(spark):
    from bigdatamigratecloud_spark.operators.sampling import equidepth_histogram

    # heavy tail: fixed-width would put ~all rows in bucket 0
    vals = [1.0] * 50 + [2.0] * 30 + [1e6, 2e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["bucket"]: r["n_rows"] for r in equidepth_histogram(df, "v", 2).collect()}
    assert max(got.values()) <= 60  # no bucket swallows everything


def test_equidepth_histogram_degenerate_inputs_raise_clearly(spark):
    """Round-10 adversarial sweep: empty / all-NULL inputs crashed with
    a raw NoneType iteration; they must raise a named error instead."""
    from bigdatamigratecloud_spark.operators.sampling import equidepth_histogram

    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        equidepth_histogram(empty, "v")
    allnull = spark.createDataFrame([(None,), (None,)], "v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        equidepth_histogram(allnull, "v")


# ---------------------------------------------------------- link extract

def test_extract_links_hrefs_positions_and_anchor_text(spark):
    from bigdatamigratecloud_spark.operators.text import extract_links

    df = spark.createDataFrame(
        [
            (1, '<p>x</p><a href="https://a.com/1">first <b>bold</b></a>'
                ' mid <a class="z" href="/rel">second\nlink</a>'),
            (2, "<p>no links at all</p>"),
        ],
        "doc_id long, html string",
    )
    rows = extract_links(df).collect()
    got = {(r["doc_id"], r["link_pos"]): (r["href"], r["anchor_text"]) for r in rows}
    assert got == {
        (1, 0): ("https://a.com/1", "first bold"),
        (1, 1): ("/rel", "second link"),
    }


def test_dedup_clusters_best_keeps_highest_score(spark):
    from bigdatamigratecloud_spark.operators.cluster import dedup_clusters_best

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["component"], r["is_kept"])
        for r in dedup_clusters_best(df, pairs, "quality").collect()
    }
    # component = min member id; doc 2 (quality 0.9) is the keeper
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 0), 9: (9, 1)}


def test_dedup_clusters_best_ties_break_to_smallest_id(spark):
    from bigdatamigratecloud_spark.operators.cluster import dedup_clusters_best

    df = spark.createDataFrame(
        [(5, 0.7), (6, 0.7)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["is_kept"]
        for r in dedup_clusters_best(df, pairs, "quality").collect()
    }
    assert got == {5: 1, 6: 0}


def test_char_stats_hand_values(spark):
    from bigdatamigratecloud_spark.operators.text import char_stats

    df = spark.createDataFrame(
        [(1, "aab 9"), (2, "xxxx"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_stats(df).collect()}
    r1 = got[1]  # chars: a,a,b,' ',9 -> counts {' ':1,'9':1,'a':2,'b':1}, n=5
    assert r1["n_chars"] == 5 and r1["n_distinct_chars"] == 4
    want = 0.0
    for c in [1, 1, 2, 1]:  # codepoint order: ' ','9','a','b'
        want += (c / 5.0) * (c / 5.0)
    assert r1["char_gini"] == want
    assert r1["digit_ratio"] == 1.0 / 5.0 and r1["space_ratio"] == 1.0 / 5.0
    r2 = got[2]  # single-char run -> maximum concentration
    assert r2["char_gini"] == 1.0 and r2["n_distinct_chars"] == 1
    r3 = got[3]  # empty doc: zero counts, NULL ratios
    assert (r3["n_chars"], r3["n_distinct_chars"]) == (0, 0)
    assert r3["char_gini"] is None and r3["digit_ratio"] is None


def test_readability_hand_values(spark):
    from bigdatamigratecloud_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. It purred!"), (2, "no terminator here"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = got[1]
    # words=5, sentence runs '.' and '!' -> 2, vowel groups:
    # e,a,a,I(+u? 'It'->'i'; 'purred'->'u','e') = The(1) cat(1) sat(1) It(1) purred(2) = 6
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllable_groups"]) == (5, 2, 6)
    want = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0)
    assert r1["flesch_score"] == want
    assert got[2]["n_sentences"] == 1  # floored so headlines score
    assert got[3]["flesch_score"] is None and got[3]["n_words"] == 0


def test_deterministic_shuffle_is_pure_function_of_salt_and_id(spark):
    import hashlib

    from bigdatamigratecloud_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: r["shuffle_pos"] for r in
         deterministic_shuffle(df, "doc_id", salt="e1").collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in
         deterministic_shuffle(df.repartition(7), "doc_id", salt="e1").collect()}
    assert a == b  # partitioning-invariant
    c = {r["doc_id"]: r["shuffle_pos"] for r in
         deterministic_shuffle(df, "doc_id", salt="e2").collect()}
    assert a != c  # epochs differ
    # equals the python replica permutation
    order = sorted(
        range(50),
        key=lambda i: (int(hashlib.md5(f"e1:{i}".encode()).hexdigest()[:15], 16), i),
    )
    assert a == {doc: pos for pos, doc in enumerate(order)}
    assert sorted(a.values()) == list(range(50))  # dense 0..n-1


def test_line_dedup_identity_when_threshold_unreachable(spark):
    """min_doc_freq above the corpus size removes nothing: rebuilt text
    must equal the input byte-for-byte (join/split round-trip law)."""
    from bigdatamigratecloud_spark.operators.text import line_dedup

    rows = [
        (1, "alpha\nbeta\n\ngamma"),
        (2, "single"),
        (3, "x\nx\nx"),      # within-doc repeats never count across docs
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["scrubbed_text"], r["n_lines_removed"])
           for r in line_dedup(df, min_doc_freq=99).collect()}
    for i, txt in rows:
        assert got[i] == (txt, 0), (i, got[i])


def test_target_encode_shrinks_toward_global_mean(spark):
    from bigdatamigratecloud_spark.operators.sampling import target_encode

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 100.0), (None, 40.0),
         ("c", None)],
        "cat string, t double",
    )
    got = {r["cat"]: r for r in target_encode(df, "cat", "t", m=2.0).collect()}
    gm = (10 + 20 + 30 + 100 + 40) / 5.0  # NULL target row excluded entirely
    assert got["a"]["encoded"] == (60.0 + 2.0 * gm) / (3.0 + 2.0)
    assert got["b"]["encoded"] == (100.0 + 2.0 * gm) / (1.0 + 2.0)
    assert got[None]["encoded"] == (40.0 + 2.0 * gm) / (1.0 + 2.0)
    assert "c" not in got  # no non-null targets -> no encodable evidence
    # rare category sits closer to the prior than its raw mean
    assert abs(got["b"]["encoded"] - gm) < abs(100.0 - gm)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        target_encode(df, "cat", "t", m=-1.0)


# ------------------------------------------------------- Naive Bayes

def test_naive_bayes_separable_corpus_and_replica(spark):
    import math

    from bigdatamigratecloud_spark.operators.lm import (
        naive_bayes_classify,
        naive_bayes_train,
    )

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the bone"),
        (3, "fr", "le chat est sur le tapis"),
        (4, "fr", "le chien mange le os"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model, stats = naive_bayes_train(docs)
    got = {
        r["doc_id"]: (r["pred_label"], r["cost"])
        for r in naive_bayes_classify(docs, model, stats).collect()
    }
    assert [got[d][0] for d in (1, 2, 3, 4)] == ["en", "en", "fr", "fr"]

    # replica: recompute doc 1's en-cost from raw counts
    toks = {}
    for _, lab, txt in rows:
        for t in txt.split():
            toks[(lab, t)] = toks.get((lab, t), 0) + 1
    v = len({t for _, t in toks})
    tot_en = sum(c for (lab, _), c in toks.items() if lab == "en")
    scale = 10_000_000
    prior = math.floor(-math.log(2 / 4) * scale)
    cost = prior
    for t in "the cat sat on the mat".split():
        c = toks.get(("en", t), 0)
        cost += math.floor(-math.log((c + 1) / (tot_en + v)) * scale)
    assert got[1] == ("en", cost)


def test_naive_bayes_unseen_tokens_fall_back_to_prior(spark):
    from bigdatamigratecloud_spark.operators.lm import (
        naive_bayes_classify,
        naive_bayes_train,
    )

    train = spark.createDataFrame(
        [(1, "a", "x x x"), (2, "a", "x y"), (3, "b", "z w")],
        "doc_id long, lang string, text string",
    )
    model, stats = naive_bayes_train(train)
    # all-unseen doc: every token pays unk; label 'a' wins on prior
    # (2/3 docs) AND its larger total makes unk_a < unk_b? totals:
    # a=5,b=2, v=4 -> unk_a=-ln(1/9), unk_b=-ln(1/6): unk_b is SMALLER,
    # so construct len-1 doc: cost_a = prior_a + unk_a, cost_b = prior_b + unk_b
    import math
    scale = 10_000_000
    ca = math.floor(-math.log(2 / 3) * scale) + math.floor(-math.log(1 / 9) * scale)
    cb = math.floor(-math.log(1 / 3) * scale) + math.floor(-math.log(1 / 6) * scale)
    test = spark.createDataFrame([(9, "?", "qq")], "doc_id long, lang string, text string")
    got = naive_bayes_classify(test, model, stats).collect()[0]
    assert got["pred_label"] == ("a" if ca <= cb else "b")
    assert got["cost"] == min(ca, cb)


def test_naive_bayes_validates_alpha(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.lm import naive_bayes_train

    docs = spark.createDataFrame([(1, "a", "x")], "doc_id long, lang string, text string")
    with _pytest.raises(ValueError):
        naive_bayes_train(docs, alpha=0)


# ------------------------------------------------------- k-center

def test_kcenter_picks_spread_points(spark):
    from bigdatamigratecloud_spark.operators.sampling import kcenter_select

    # three tight clusters far apart; k=3 must pick one per cluster
    pts = {
        0: [0.0, 0.0], 1: [0.01, 0.0], 2: [0.0, 0.01],        # cluster A
        10: [10.0, 10.0], 11: [10.01, 10.0],                  # cluster B
        20: [-10.0, 10.0], 21: [-10.0, 10.01],                # cluster C
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<double>"
    )
    got = kcenter_select(df, k=3)
    rows = sorted(got.collect(), key=lambda r: r["sel_rank"])
    assert rows[0]["vec_id"] == 0 and rows[0]["dist"] == 0  # seed = min id
    picked = {r["vec_id"] for r in rows}
    clusters = [{0, 1, 2}, {10, 11}, {20, 21}]
    assert all(len(picked & c) == 1 for c in clusters)
    # covering radius sequence is nonincreasing
    dists = [r["dist"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)


def test_kcenter_matches_python_replica(spark):
    import random

    from bigdatamigratecloud_spark.operators.sampling import kcenter_select

    rng = random.Random(5)
    pts = {i: [rng.uniform(-2, 2) for _ in range(3)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<double>"
    )
    import math
    q = {i: [math.floor(x * 1024.0) for x in v] for i, v in pts.items()}
    sel = [min(q)]
    dists = {i: None for i in q}
    ref = [(1, sel[0], 0)]
    for r in range(2, 6):
        s = q[sel[-1]]
        for i in q:
            d = sum((a - b) * (a - b) for a, b in zip(q[i], s))
            dists[i] = d if dists[i] is None else min(dists[i], d)
        pick = min(q, key=lambda i: (-dists[i], i))
        ref.append((r, pick, dists[pick]))
        sel.append(pick)
    got = [(r["sel_rank"], r["vec_id"], r["dist"])
           for r in sorted(kcenter_select(df, k=5).collect(), key=lambda r: r["sel_rank"])]
    assert got == ref


def test_kcenter_validates_args(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.sampling import kcenter_select

    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        kcenter_select(df, k=0)
    with _pytest.raises(ValueError):
        kcenter_select(df, q_scale=1000)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="no rows"):
        kcenter_select(empty, k=2)


def test_kcenter_no_duplicate_ids_and_early_stop(spark):
    """k beyond the point count must stop early with unique ids, never
    re-emit an already-selected id (round-9 ADVICE: the zero-distance
    argmax tie-break re-selected the seed)."""
    from bigdatamigratecloud_spark.operators.sampling import kcenter_select

    # 3 rows, two of them the SAME point under distinct ids
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [4.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = sorted(kcenter_select(df, k=10).collect(), key=lambda r: r["sel_rank"])
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 3  # early stop at |rows|, all unique
    assert ids[0] == 1 and ids[1] == 3  # farthest-first after the seed
    assert rows[2]["vec_id"] == 2 and rows[2]["dist"] == 0  # dup point, dist 0


def test_kcenter_sql_replica_matches_with_duplicates(spark):
    """The unrolled DuckDB replica must replay the id-exclusion
    semantics (selected ids leave the pool) including duplicate points
    and the k > |rows| early stop."""
    import duckdb

    from bigdatamigratecloud_spark.operators.sampling import (
        kcenter_select,
        kcenter_sql_steps,
    )

    pts = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [4.0, 0.0]), (4, [0.0, 9.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = sorted(
        [(r["sel_rank"], r["vec_id"], r["dist"]) for r in kcenter_select(df, k=6).collect()]
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r}::DOUBLE[])" for i, v in pts)
        + ") t(vec_id, embedding)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH " + kcenter_sql_steps(k=6) + " SELECT sel_rank, vec_id, dist FROM kc_final"
        ).fetchall()
    )
    assert got == want and len(got) == 4


# ------------------------------------------------------------ chi-square

def test_chi2_keywords_separable_vocab(spark):
    from bigdatamigratecloud_spark.operators.text import chi2_keywords

    rows = (
        [(i, "en", "apple pie common") for i in range(5)]
        + [(i + 10, "fr", "tarte pomme common") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = chi2_keywords(docs, top_k=3, min_doc_freq=2).collect()
    by_label = {}
    for r in got:
        by_label.setdefault(r["label"], []).append((r["rank"], r["token"], r["chi2"]))
    # perfectly separating tokens: a=5,b=0,c=0,d=5 -> chi2 = 10*(25)^2/(5*5*5*5) = 10
    en = {t for _, t, _ in by_label["en"]}
    fr = {t for _, t, _ in by_label["fr"]}
    assert en == {"apple", "pie"} and fr == {"tarte", "pomme"}
    for _, _, chi in by_label["en"] + by_label["fr"]:
        assert chi == 10.0
    # 'common' is in every doc -> det = 0 -> excluded everywhere


def test_chi2_keywords_replica_and_guards(spark):
    import random

    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.text import chi2_keywords

    rng = random.Random(9)
    vocab = ["w%d" % i for i in range(12)]
    rows = [
        (i, rng.choice(["a", "b"]), " ".join(rng.sample(vocab, 5)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["label"], r["token"]): r["chi2"]
        for r in chi2_keywords(docs, top_k=50, min_doc_freq=2).collect()
    }
    # python replica
    pres = {}
    lab_docs = {}
    for i, lab, txt in rows:
        lab_docs[lab] = lab_docs.get(lab, 0) + 1
        for t in set(txt.split()):
            pres[(lab, t)] = pres.get((lab, t), 0) + 1
    n = len(rows)
    tok_docs = {}
    for (lab, t), a in pres.items():
        tok_docs[t] = tok_docs.get(t, 0) + a
    ref = {}
    for (lab, t), a in pres.items():
        if tok_docs[t] < 2:
            continue
        b = tok_docs[t] - a
        c = lab_docs[lab] - a
        d = n - tok_docs[t] - lab_docs[lab] + a
        det = a * d - b * c
        if det <= 0:
            continue
        ref[(lab, t)] = (n * det * det) / ((a + b) * (c + d) * (a + c) * (b + d))
    assert got == ref
    with _pytest.raises(ValueError):
        chi2_keywords(docs, top_k=0)


def test_naive_bayes_margin_confidence(spark):
    from bigdatamigratecloud_spark.operators.lm import (
        naive_bayes_margin,
        naive_bayes_train,
    )

    rows = [
        (1, "en", "the cat sat"),
        (2, "en", "the dog ran"),
        (3, "fr", "le chat est"),
        (4, "fr", "le chien va"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model, stats = naive_bayes_train(docs)
    got = {r["doc_id"]: r for r in naive_bayes_margin(docs, model, stats).collect()}
    # separable corpus: every margin strictly positive, labels right
    assert all(r["margin"] > 0 for r in got.values())
    assert got[1]["pred_label"] == "en" and got[3]["pred_label"] == "fr"
    # an ambiguous doc (unseen vocab only) has margin = |prior+unk gap|
    amb = spark.createDataFrame([(9, "?", "zzz")], "doc_id long, lang string, text string")
    m = naive_bayes_margin(amb, model, stats).collect()[0]
    assert m["margin"] is not None and m["margin"] >= 0


def test_oov_rate_entry_semantics(spark, sf_dir):
    import __spark_entry__ as e

    rows = {r["doc_id"]: r for r in e.queries()["n5_oov_rate"](spark, sf_dir).collect()}
    assert rows  # every non-blank doc appears
    for r in rows.values():
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_rate"] == r["n_oov"] / r["n_tokens"]


def test_substring_dedup_within_doc_and_canonical(spark):
    """substring_dedup (round 12) vs its siblings: occurrence-count
    threshold WITH a canonical survivor — within-doc repetition IS
    deduplicated (corpus_span_dedup's distinct-doc gate would skip
    it), and the first (doc_id, pos) occurrence survives
    (hot_span_scrub would cut it too)."""
    from bigdatamigratecloud_spark.operators.text import substring_dedup

    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma {shared}"),
            (3, f"{shared} delta {shared}"),
            (4, "solo solo solo solo solo solo solo solo solo solo"),
            (5, "entirely unique content here is this"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in substring_dedup(docs, min_len=4).collect()
    }
    # doc 1 holds the canonical copy: untouched
    assert out[1]["text"] == f"alpha {shared} beta"
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "gamma" and out[2]["n_removed"] == 4
    # doc 3: both its occurrences are non-canonical -> both cut
    assert out[3]["text"] == "delta" and out[3]["n_removed"] == 8
    # doc 4: 'solo'x10 self-repeats; windows 2..7 duplicate window 1.
    # Coverage [2,10] leaves exactly the first window's first token...
    # island merge: marked windows start at 2..7 covering [2,10] ->
    # tokens 1 survives
    assert out[4]["text"] == "solo" and out[4]["n_removed"] == 9
    assert out[5]["n_removed"] == 0
    assert out[5]["n_tokens"] == 6


def test_substring_dedup_interval_merge_and_short_docs(spark):
    """Overlapping marked windows merge into one maximal interval
    (n_removed counts each token once); docs shorter than min_len are
    untouched; a full later-duplicate doc empties out."""
    from bigdatamigratecloud_spark.operators.text import substring_dedup

    long = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, long), (2, long), (3, "tiny doc"), (4, f"x {long} y {long} z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, min_len=4).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "" and out[2]["n_removed"] == 10
    assert out[3]["text"] == "tiny doc" and out[3]["n_removed"] == 0
    # doc 4 embeds the span twice: both occurrences are non-canonical,
    # the seams survive
    assert out[4]["text"] == "x y z" and out[4]["n_removed"] == 20
    # removed-token accounting is consistent with the rebuilt text
    for r in out.values():
        kept = 0 if r["text"] == "" else len(r["text"].split(" "))
        assert kept + r["n_removed"] == r["n_tokens"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        substring_dedup(docs, min_len=1)
    with _pytest.raises(ValueError):
        substring_dedup(docs, min_count=1)
