"""Distributed BPE training (operators/bpe.py): value-exactness against
a pure-Python replay of the published algorithm, determinism under
repartitioning, greedy-merge edge cases, and the segment (encode)
path."""

from __future__ import annotations

from bigdatamigratecloud_spark.operators.bpe import bpe_segment, bpe_train


def _replay(word_counts, n, min_count=2):
    """Sequential-scan reference implementation (Sennrich get_stats +
    greedy merge)."""
    w = {word: (list(word), c) for word, c in word_counts.items()}
    out = []
    for rank in range(1, n + 1):
        freq: dict = {}
        for _, (syms, c) in w.items():
            for i in range(len(syms) - 1):
                freq[(syms[i], syms[i + 1])] = freq.get((syms[i], syms[i + 1]), 0) + c
        if not freq:
            break
        (a, b), tot = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if tot < min_count:
            break
        out.append((rank, a, b, a + b, tot))
        for word, (syms, c) in w.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            w[word] = (ns, c)
    return out


def _counts(texts):
    wc: dict = {}
    for t in texts:
        for tok in t.split():
            wc[tok] = wc.get(tok, 0) + 1
    return wc


TEXTS = [
    "low lower lowest low low",
    "newer newest new low",
    "wider wide wider",
]


def test_bpe_matches_sequential_replay(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, num_merges=8).collect()]
    assert got == _replay(_counts(TEXTS), 8)


def test_bpe_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    a = [tuple(r) for r in bpe_train(docs.repartition(1), num_merges=6).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(7, "doc_id"), num_merges=6).collect()]
    assert a == b == _replay(_counts(TEXTS), 6)


def test_bpe_greedy_identical_symbol_chains(spark):
    """Runs of identical symbols are where greedy left-to-right differs
    from naive global replacement: 'aaaa' merges to two 'aa', 'aaa' to
    'aa'+'a' — the fold must match the sequential scan exactly."""
    texts = ["aaaa aaa aa aaaa aaaa"]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, num_merges=3, min_pair_count=1).collect()]
    exp = _replay(_counts(texts), 3, min_count=1)
    assert got == exp
    # first merge must be (a, a); second round counts pairs of 'aa'
    assert got[0][1:4] == ("a", "a", "aa")


def test_bpe_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij kl")], "doc_id long, text string"
    )
    got = bpe_train(docs, num_merges=10, min_pair_count=2).collect()
    assert got == []  # every pair occurs once


def test_bpe_segment_applies_rules_in_order(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"]) for r in bpe_train(docs, num_merges=8).collect()
    ]
    seg = bpe_segment(
        spark.createDataFrame([(1, "low lowest wider")], "doc_id long, text string"),
        merges,
    ).first()["bpe_tokens"]
    # replay the same rules sequentially
    def apply(word):
        syms = list(word)
        for a, b in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        return syms

    exp = [s for w in "low lowest wider".split() for s in apply(w)]
    assert seg == exp
    assert "low" in seg  # the corpus's dominant word became one token
