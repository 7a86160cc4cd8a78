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
    """All three strategies — local fast path (the default), recount,
    delta-maintained — emit the identical merge table."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    exp = _replay(_counts(TEXTS), 8)
    got_local = [tuple(r) for r in bpe_train(docs, num_merges=8).collect()]
    got_rec = [
        tuple(r) for r in bpe_train(docs, num_merges=8, incremental=False).collect()
    ]
    got_inc = [
        tuple(r) for r in bpe_train(docs, num_merges=8, incremental=True).collect()
    ]
    assert got_local == got_rec == got_inc == exp


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
    'aa'+'a' — both the fold and the local trainer must match the
    sequential scan exactly."""
    texts = ["aaaa aaa aa aaaa aaaa"]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    exp = _replay(_counts(texts), 3, min_count=1)
    got = [tuple(r) for r in bpe_train(docs, num_merges=3, min_pair_count=1).collect()]
    got_d = [
        tuple(r)
        for r in bpe_train(
            docs, num_merges=3, min_pair_count=1, incremental=False
        ).collect()
    ]
    assert got == got_d == exp
    # first merge must be (a, a); second round counts pairs of 'aa'
    assert got[0][1:4] == ("a", "a", "aa")


def test_bpe_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij kl")], "doc_id long, text string"
    )
    assert bpe_train(docs, num_merges=10, min_pair_count=2).collect() == []
    assert (
        bpe_train(docs, num_merges=10, min_pair_count=2, incremental=False).collect()
        == []
    )


def test_bpe_local_trainer_large_synthetic():
    """The local fast path on a larger synthetic vocab (~2.5k distinct
    words, Zipf-ish counts) equals the brute-force sequential replay —
    pure-Python check of _train_local's heap/delta machinery, no Spark."""
    import random

    from bigdatamigratecloud_spark.operators.bpe import _train_local

    rng = random.Random(11)
    alphabet = "abcdefgh"
    wc: dict[str, int] = {}
    while len(wc) < 2500:
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12)))
        wc[w] = rng.randint(1, 50)
    exp = _replay(dict(wc), 200, min_count=2)
    got = _train_local([(list(w), c) for w, c in wc.items()], 200, 2)
    assert got == exp


def test_bpe_local_budget_fallback(spark):
    """A vocab past local_budget falls through to the distributed loop
    with the identical result; local_budget=0 disables local outright."""
    docs = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    exp = _replay(_counts(TEXTS), 6)
    over = [
        tuple(r)
        for r in bpe_train(docs, num_merges=6, local_budget=2).collect()
    ]  # way under the 10 distinct words -> distributed
    off = [
        tuple(r)
        for r in bpe_train(docs, num_merges=6, local_budget=0).collect()
    ]
    assert over == off == exp


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


def test_bpe_train_incremental_equals_recount(spark):
    """The delta-maintained pair-count trainer must replay the EXACT
    merge sequence (and pair counts) of the full-recount reference, on
    corpora with overlapping-run edge cases included."""
    texts = TEXTS + ["aaaa aaa baab abab abab", "lowest newest widest estest"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rec = [
        tuple(r)
        for r in bpe_train(docs, num_merges=20, min_pair_count=1, incremental=False).collect()
    ]
    inc = [
        tuple(r)
        for r in bpe_train(docs, num_merges=20, min_pair_count=1, incremental=True).collect()
    ]
    assert inc == rec == _replay(_counts(texts), 20, min_count=1)


def test_bpe_train_auto_picks_incremental_beyond_threshold(spark):
    """With the local path disabled (local_budget=0), `incremental=None`
    at >16 merges routes through the delta path — same answer as the
    sequential replay."""
    texts = TEXTS + ["estest lowered widened newness"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe_train(
            docs, num_merges=24, min_pair_count=1, local_budget=0
        ).collect()
    ]
    assert got == _replay(_counts(texts), 24, min_count=1)


def test_bpe_segment_kernel_equals_fold(spark):
    """The Arrow mapInPandas encoder (broadcast rank dict, min-rank
    iteration) must produce byte-identical subword sequences to the
    Catalyst fold path — including null text, blank text, whitespace
    runs, and identical-symbol chains."""
    train_docs = spark.createDataFrame(
        list(enumerate(TEXTS + ["aaaa aaa abab baab"])), "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(train_docs, num_merges=12, min_pair_count=1).collect()
    ]
    probe = spark.createDataFrame(
        [
            (1, "low lowest wider aaaa abab"),
            (2, ""),
            (3, None),
            (4, "   low\t\twider \n aaa  "),
            (5, "unseen zzz qqq low"),
        ],
        "doc_id long, text string",
    )
    fold = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(probe, merges, impl="fold").collect()
    }
    kern = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(probe, merges, impl="kernel").collect()
    }
    assert kern == fold
    assert kern[3] is None and kern[2] == []


def test_bpe_segment_kernel_plan_depth_constant(spark):
    """At a 1k-rule vocab the kernel path's plan must stay O(1) — one
    mapInPandas over the scan, no per-rule expression nesting — where
    the fold path would nest 1,000 aggregates.  (The auto dispatcher
    must route there.)"""
    rules = [(chr(97 + i % 26), chr(97 + (i * 7) % 26)) for i in range(1000)]
    df = spark.createDataFrame([(1, "abc xyz")], "doc_id long, text string")
    seg = bpe_segment(df, rules)  # auto -> kernel
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    # the plan string stays tiny — a nested fold would be megabytes
    assert len(plan) < 20_000
    seg.collect()  # and it executes


def test_bpe_segment_auto_guards_fold_kernel_divergence(spark):
    """ADVICE r7: a merge table where a later rule re-creates an earlier
    rule's operand (operands not built from strictly-earlier merges, or
    duplicate merged strings) makes one-pass-per-rule folding diverge
    from canonical min-rank-first.  `auto` must detect this and take the
    kernel regardless of rule count, so output can never silently change
    across the fold_max_rules threshold."""
    from bigdatamigratecloud_spark.operators.bpe import _fold_equivalent

    # trained tables are fold-equivalent
    docs = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    trained = [(r["lhs"], r["rhs"]) for r in bpe_train(docs, num_merges=8).collect()]
    assert _fold_equivalent(trained)
    # operand 'abc' used (rank 1) before anything produced it -> divergent
    bad = [("a", "b"), ("abc", "d"), ("b", "c"), ("a", "bc"), ("ab", "c")]
    assert not _fold_equivalent(bad)
    # duplicate merged string 'abc' -> divergent
    dup = [("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c")]
    assert not _fold_equivalent(dup)
    df = spark.createDataFrame([(1, "abcd abcd")], "doc_id long, text string")
    # on `bad`, fold and kernel genuinely differ: auto must equal kernel
    fold = bpe_segment(df, bad, impl="fold").first()["bpe_tokens"]
    kern = bpe_segment(df, bad, impl="kernel").first()["bpe_tokens"]
    auto = bpe_segment(df, bad, impl="auto").first()["bpe_tokens"]
    assert fold == ["abc", "d", "abc", "d"]
    assert kern == ["abcd", "abcd"]  # min-rank-first re-fires (abc, d)
    assert auto == kern


def test_bpe_segment_edge_cases(spark):
    """Dispatch validation and degenerate inputs on both encode paths."""
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bpe_segment(df, [("a", "b")], impl="bogus")
    # empty rule list: tokens come back as plain characters on both paths
    for impl in ("fold", "kernel"):
        got = bpe_segment(df, [], impl=impl).first()["bpe_tokens"]
        assert got == ["a", "b"]
    # empty corpus trains an empty merge table on both trainers
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty, num_merges=3, incremental=False).collect() == []
    assert bpe_train(empty, num_merges=3, incremental=True).collect() == []


def test_bpe_byte_level_train_and_segment(spark):
    """Byte-level BPE (round 8): GPT-2 pre-tokenization, byte-fallback
    symbols, special-token passthrough — kernel output equals the
    sequential fold reference, and inverse-mapping the output symbols
    reconstructs the pretokens' exact UTF-8 bytes (losslessness)."""
    from bigdatamigratecloud_spark.operators.bpe import (
        _B2U,
        _pretokenize,
        bpe_bytes_fold_reference,
        bpe_segment_bytes,
        bpe_train_bytes,
    )

    texts = [
        "the quick brown fox 123 jumps!",
        "naïve café déjà-vu übergroß",   # non-ASCII: multi-byte fallback
        "日本語 テスト 123",               # CJK: 3-byte sequences
        "the the the quick quick fox",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(docs, num_merges=20, min_pair_count=2).collect()
    ]
    assert merges, "corpus has repeated pairs; training must learn rules"
    probe_texts = texts + ["", None, "  spaced   out  ", "mixé ascii日本"]
    probe = spark.createDataFrame(
        list(enumerate(probe_texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_bytes(probe, merges).collect()
    }
    u2b = {c: bytes([b]) for b, c in _B2U.items()}
    for i, t in enumerate(probe_texts):
        if t is None:
            assert got[i] is None
            continue
        # kernel == sequential fold reference (trained tables are
        # fold-equivalent)
        assert got[i] == bpe_bytes_fold_reference(t, merges), t
        # losslessness: symbols decode back to the pretokens' bytes
        back = b"".join(u2b[c] for tok in got[i] for c in tok)
        expect = b"".join(w.encode("utf-8") for w in _pretokenize(t))
        assert back == expect, t


def test_bpe_byte_special_tokens_pass_through(spark):
    """Special tokens are emitted verbatim as single symbols — never
    normalized, pretokenized, or merged — with longest-first matching."""
    from bigdatamigratecloud_spark.operators.bpe import (
        bpe_segment_bytes,
        bpe_train_bytes,
    )

    docs = spark.createDataFrame(
        [(1, "hello world hello world hello")], "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(docs, num_merges=8, min_pair_count=2).collect()
    ]
    probe = spark.createDataFrame(
        [(1, "<|endoftext|>hello world<|end|><|endoftext|>")],
        "doc_id long, text string",
    )
    toks = bpe_segment_bytes(
        probe, merges, special_tokens=["<|end|>", "<|endoftext|>"]
    ).first()["bpe_tokens"]
    assert toks[0] == "<|endoftext|>"
    assert toks[-1] == "<|endoftext|>"
    assert "<|end|>" in toks
    # the inner text was still BPE-encoded (not one giant literal)
    assert all("|" not in t for t in toks if not t.startswith("<|"))


def test_bpe_byte_token_ids_roundtrip(spark):
    """emit='ids' (round 8): ids follow the deterministic vocab space —
    byte value for single-byte symbols, 256+rank for merges, specials
    last — and invert exactly back to the token strings."""
    from bigdatamigratecloud_spark.operators.bpe import (
        bpe_segment_bytes,
        bpe_train_bytes,
        bpe_vocab_ids,
    )

    docs = spark.createDataFrame(
        [(1, "hello world hello world hello naïve")], "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(docs, num_merges=6, min_pair_count=2).collect()
    ]
    probe = spark.createDataFrame(
        [(1, "<|eot|>hello naïve world"), (2, None)], "doc_id long, text string"
    )
    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_bytes(probe, merges, special_tokens=["<|eot|>"]).collect()
    }
    ids = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment_bytes(
            probe, merges, special_tokens=["<|eot|>"], emit="ids"
        ).collect()
    }
    vocab = bpe_vocab_ids(merges, ["<|eot|>"])
    inv = {v: k for k, v in vocab.items()}
    assert ids[2] is None and toks[2] is None
    assert [inv[i] for i in ids[1]] == toks[1]
    assert ids[1][0] == 256 + len(merges)  # the special's id
    # single-byte ids are byte values; merge ids start at 256
    for t, i in zip(toks[1], ids[1]):
        if len(t) == 1 and ord(t) < 256 and i < 256:
            assert i == t.encode("utf-8")[0] if ord(t) < 128 else True
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_segment_bytes(probe, merges, emit="bogus")


def test_bpe_decode_bytes_roundtrip(spark):
    """bpe_decode_bytes (round 8): decode(encode(t, emit='ids')) equals
    the whitespace-normalized text, including non-ASCII (multi-byte
    UTF-8 reassembled from byte-level ids) and special tokens (literal
    re-emission); null arrays stay null; unknown ids raise."""
    from bigdatamigratecloud_spark.operators.bpe import (
        bpe_decode_bytes,
        bpe_segment_bytes,
        bpe_train_bytes,
    )

    docs = spark.createDataFrame(
        [(1, "hello world hello world naïve café 日本")],
        "doc_id long, text string",
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(docs, num_merges=8, min_pair_count=2).collect()
    ]
    probe = spark.createDataFrame(
        [
            (1, "hello  naïve\tcafé 日本 world"),
            (2, "<|eot|>hello<|eot|>"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    enc = bpe_segment_bytes(probe, merges, special_tokens=["<|eot|>"], emit="ids")
    dec = {
        r["doc_id"]: r["text2"]
        for r in bpe_decode_bytes(
            enc.drop("text"), merges, out_col="text2", special_tokens=["<|eot|>"]
        ).collect()
    }
    assert dec[1] == "hello naïve café 日本 world"  # whitespace-normalized
    assert dec[2] == "<|eot|>hello<|eot|>"
    assert dec[3] is None

    import pytest as _p

    bogus = spark.createDataFrame([(1, [99999])], "doc_id long, bpe_tokens array<int>")
    with _p.raises(Exception, match="unknown token id"):
        bpe_decode_bytes(bogus, merges).collect()


def test_wordpiece_segment_bert_semantics(spark):
    """wordpiece_segment (round 8): greedy longest-match-first with ##
    continuations (BERT WordpieceTokenizer): 'unaffable' ->
    un ##aff ##able; no-match and overlong words collapse to [UNK]
    wholesale; null/blank behave like the BPE kernels."""
    from bigdatamigratecloud_spark.operators.wordpiece import wordpiece_segment

    vocab = [
        ("un", False), ("aff", True), ("able", True), ("a", False),
        ("b", True), ("runn", False), ("ing", True), ("run", False),
    ]
    df = spark.createDataFrame(
        [
            (1, "unaffable"),
            (2, "running"),      # longest-first: runn ##ing beats run...
            (3, "unaffordable"), # 'ord...' has no continuation -> [UNK]
            (4, "ab"),
            (5, "verylongwordhere"),  # > max_word_len -> [UNK]
            (6, ""),
            (7, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_segment(df, vocab, max_word_len=12).collect()
    }
    assert got[1] == ["un", "##aff", "##able"]
    assert got[2] == ["runn", "##ing"]
    assert got[3] == ["[UNK]"]
    assert got[4] == ["a", "##b"]
    assert got[5] == ["[UNK]"]
    assert got[6] == []
    assert got[7] is None


def test_wordpiece_train_alphabet_and_budget(spark):
    """wordpiece_train: single-char alphabet rows always present (in
    the positions they occur); multi-char rows fill vocab_size minus
    alphabet by (cnt DESC, raw ASC, initial-first); segmenting the
    training corpus with its own vocab never yields [UNK]."""
    from bigdatamigratecloud_spark.operators.wordpiece import (
        wordpiece_segment,
        wordpiece_train,
    )

    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], "doc_id long, text string"
    )
    v = wordpiece_train(df, vocab_size=8, max_piece_len=3)
    rows = v.collect()
    pieces = {r["piece"] for r in rows}
    # alphabet: a,c initial; b,d continuation (and a/b mid-word forms)
    assert {"a", "c", "##b", "##d"} <= pieces
    assert len(rows) == 8
    vocab = [(r["raw"], r["is_cont"]) for r in rows]
    seg = wordpiece_segment(df, vocab)
    toks = [t for r in seg.collect() for t in r["wp_tokens"]]
    assert "[UNK]" not in toks


def test_unigram_segment_semantics(spark):
    """unigram_segment (round 8): Viterbi-optimal split under integer
    costs (cheaper 2-piece split beats a greedy longest prefix); ties
    break by fewer pieces then lexicographic; uncoverable words ->
    [UNK]; null/blank like the other kernels."""
    from bigdatamigratecloud_spark.operators.unigram import unigram_segment

    # 'abc' as one piece costs 10; 'ab'+'c' costs 3+3=6 -> Viterbi picks
    # the split even though 'abc' is the longest match (greedy would not)
    vocab = [("abc", 10), ("ab", 3), ("c", 3), ("a", 9), ("b", 9)]
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abq"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ug_tokens"]
        for r in unigram_segment(df, vocab).collect()
    }
    assert got[1] == ["ab", "c"]
    assert got[2] == ["[UNK]"]  # 'q' uncoverable
    assert got[3] == [] and got[4] is None


def test_unigram_train_alphabet_coverage_and_budget(spark):
    """unigram_train: single chars always in the vocab (coverage: the
    training corpus never segments to [UNK]); vocab_size bounds the
    result; cost is the integer scaled log of cnt/total."""
    import math

    from bigdatamigratecloud_spark.operators.unigram import (
        SCALE,
        unigram_segment,
        unigram_train,
    )

    df = spark.createDataFrame(
        [(1, "abab ab cd abab"), (2, "ab abab cd abcd")],
        "doc_id long, text string",
    )
    v = unigram_train(df, vocab_size=6, max_piece_len=3, em_rounds=2)
    rows = v.collect()
    assert len(rows) <= 6
    pieces = {r["piece"] for r in rows}
    assert {"a", "b", "c", "d"} <= pieces
    total = sum(r["cnt"] for r in rows)
    for r in rows:
        assert r["cost"] == math.floor(-math.log(r["cnt"] / total) * SCALE)
    seg = unigram_segment(df, [(r["piece"], r["cost"]) for r in rows])
    toks = [t for r in seg.collect() for t in r["ug_tokens"]]
    assert toks and "[UNK]" not in toks


def test_bpe_vocab_ids_rejects_surface_collisions():
    """Round-9 ADVICE fix: duplicate merged surfaces (('a','bc') and
    ('ab','c') both forming 'abc') or a special equal to a merged
    string must raise, not silently shadow an id."""
    import pytest

    from bigdatamigratecloud_spark.operators.bpe import bpe_vocab_ids

    ok = bpe_vocab_ids([("a", "b"), ("ab", "c")], ["<|eot|>"])
    assert ok["ab"] == 256 and ok["abc"] == 257 and ok["<|eot|>"] == 258
    with pytest.raises(ValueError, match="collides"):
        bpe_vocab_ids([("a", "bc"), ("ab", "c")])  # both form 'abc'
    with pytest.raises(ValueError, match="special token"):
        bpe_vocab_ids([("a", "b")], ["ab"])  # special shadows merge


def test_unigram_oracle_rejects_overlong_words():
    """Round-9 ADVICE fix: a corpus word longer than max_word_len must
    make the DuckDB oracle raise loudly (the unrolled Viterbi CTEs
    cannot segment it), never silently drop its rows."""
    import duckdb
    import pytest

    from bigdatamigratecloud_spark.operators.unigram import unigram_sql_steps

    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT 1 AS doc_id, "
            "'short words only here' AS text")
    sql = ("WITH " + unigram_sql_steps(vocab_size=20, max_piece_len=3,
                                       em_rounds=1, max_word_len=6)
           + " SELECT count(*) FROM ug_seg")
    assert con.sql(sql).fetchone()[0] > 0  # guard inert when all fit
    con.sql("INSERT INTO documents VALUES (2, 'supercalifragilistic word')")
    with pytest.raises(duckdb.Error, match="max_word_len"):
        con.sql(sql).fetchall()
