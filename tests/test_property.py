"""Property-based tests (SURVEY §5 item 5, hypothesis): random values
through the format→parse round trip, scalar-function laws, and a
melt→pivot inverse property on generated typed rows.

Pure-Python properties run at full hypothesis example counts; the Spark
round-trip property batches ALL generated rows into one DataFrame per
example and uses few examples (each example is several Spark jobs)."""

from __future__ import annotations

import datetime as dt
import re

import pytest
from hypothesis import given, settings, strategies as st

from bigdatamigratecloud_spark.functions.scalars import (
    a1_col_index,
    a1_col_letters,
    clamp_sheet_name,
    eval_dateformula,
    sanitize_xml_name,
)

@given(st.integers(min_value=1, max_value=1_000_000))
def test_a1_letters_index_roundtrip(i):
    assert a1_col_index(a1_col_letters(i)) == i


@given(st.text(min_size=1, max_size=64))
def test_sanitize_xml_name_valid_and_idempotent(name):
    import xml.etree.ElementTree as ET

    out = sanitize_xml_name(name)
    assert out, (name, out)  # always non-empty (prefixed if needed)
    ET.fromstring(f"<{out}/>")  # a real XML parser accepts it as a name
    assert sanitize_xml_name(out) == out  # fixed point


@given(st.text(min_size=1, max_size=80), st.integers(min_value=0, max_value=99999))
def test_clamp_sheet_name_bounds(name, table_id):
    assert len(clamp_sheet_name(name)) <= 31
    assert len(clamp_sheet_name(name, table_id)) <= 31


_DATES = st.dates(min_value=dt.date(1900, 1, 2), max_value=dt.date(2200, 12, 30))


@given(_DATES, st.integers(min_value=0, max_value=3650))
def test_dateformula_day_addition_inverts(base, n):
    assert eval_dateformula(f"<+{n}D>", base) == base + dt.timedelta(days=n)
    assert eval_dateformula(f"<-{n}D>", eval_dateformula(f"<+{n}D>", base)) == base


@given(_DATES)
def test_dateformula_current_month_end(base):
    cm = eval_dateformula("<CM>", base)
    assert cm.month == base.month and cm.year == base.year
    assert cm >= base
    assert (cm + dt.timedelta(days=1)).day == 1  # last day of the month


@given(_DATES, st.integers(min_value=1, max_value=24))
def test_dateformula_month_then_month_end(base, n):
    d = eval_dateformula(f"<{n}M+CM>", base)
    assert (d + dt.timedelta(days=1)).day == 1
    months = base.year * 12 + (base.month - 1) + n
    assert (d.year, d.month) == (months // 12, months % 12 + 1)


# --- Spark round-trip property: serialize_cell ∘ parse == identity -------

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs",), exclude_characters="\x00"
                ),
                max_size=40,
            ),
        ),
        st.one_of(st.none(), st.booleans()),
        st.one_of(st.none(), st.dates(min_value=dt.date(1583, 1, 1), max_value=dt.date(9999, 12, 31))),
        st.one_of(
            st.none(),
            st.decimals(
                min_value=-(10**18), max_value=10**18, places=4, allow_nan=False, allow_infinity=False
            ),
        ),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(_ROWS)
def test_melt_pivot_inverse_on_generated_rows(spark, rows):
    from pyspark.sql import types as T

    from bigdatamigratecloud_spark.operators.staging import (
        melt_to_staging,
        pivot_from_staging,
    )

    schema = T.StructType(
        [
            T.StructField("pk", T.LongType(), False),
            T.StructField("txt", T.StringType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("amount", T.DecimalType(28, 4), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    staged = melt_to_staging(df, "prop_table", record_key_col="pk")
    back = pivot_from_staging(staged, schema)
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


@pytest.mark.usefixtures("spark")
@given(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=40),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_chunking_reconstructs_token_stream(spark, words, window, overlap):
    """Invariant: dropping each chunk's first `overlap` tokens (except
    chunk 0) and concatenating reconstructs the original token stream —
    no token lost, none invented, chunk sizes consistent."""
    from bigdatamigratecloud_spark.operators.text import chunk_documents

    if overlap >= window:
        overlap = window - 1
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window=window, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    rebuilt = []
    for r in rows:
        toks = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(toks) == r.n_tokens
        rebuilt.extend(toks if r.chunk_idx == 0 else toks[overlap:])
    assert rebuilt[: len(words)] == words  # stream reconstructed in order
    assert set(rebuilt) <= set(words)  # trailing overlap re-emits, never invents


# --- GIF LZW codec properties (pure python, no Spark) ---------------------


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 17),
    ncol=st.integers(1, 256),
    data=st.data(),
    interlace=st.booleans(),
)
def test_gif_encode_decode_roundtrip_property(w, h, ncol, data, interlace):
    """Any (h, w) index grid over any palette size roundtrips pixel-
    exactly through encode_gif -> _decode_gif, interlaced or not —
    width-growth sync between encoder and decoder holds for arbitrary
    content, not just the handcrafted cases."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    idx = data.draw(
        st.lists(st.integers(0, ncol - 1), min_size=w * h, max_size=w * h)
    )
    grid = np.array(idx, dtype=np.uint8).reshape(h, w)
    palette = [(i % 256, (i * 7) % 256, (i * 131) % 256) for i in range(ncol)]
    payload = encode_gif(grid, palette, interlace=interlace)
    arr = _decode_gif(payload)
    assert arr is not None and arr.shape == (h, w, 3)
    want = np.array(palette, dtype=np.uint8)[grid]
    assert (arr == want).all()


# ---- ACID log: arbitrary op sequences keep snapshot == replayed model ----

_ACID_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.integers(0, 999)),
        st.tuples(st.just("delete"), st.integers(0, 30)),
        st.tuples(st.just("restore"), st.integers(0, 99)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("replace"), st.integers(0, 999)),
        st.tuples(st.just("vacuum"), st.integers(1, 2)),
    ),
    min_size=3,
    max_size=6,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(ops=_ACID_OPS)
def test_acid_any_op_sequence_matches_replayed_model(ops, spark):
    """Any (merge|delete|restore|vacuum|compact|overwrite_where)*
    sequence keeps
    snapshot() readable and equal to a pure-Python replay of the same
    semantics — the log-replay contract that every maintenance op must
    preserve.  Restores only target still-resolvable versions (vacuum
    moves that horizon, which the generator respects, mirroring the
    documented contract)."""
    import tempfile

    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="acid_prop_")
    base = {i: i * 10 for i in range(12)}
    df = spark.createDataFrame(sorted(base.items()), "id long, v long")
    # round 12: a generated column rides EVERY op of the sequence — no
    # write path may land a row where it diverges from its expression
    t = AcidTable.create(
        spark,
        root + "/t",
        df.repartition(3),
        key_cols=["id"],
        generated={"g": "v * 2"},
    )
    states = {0: dict(base)}  # committed version -> expected rows
    model = dict(base)
    min_restorable = 0

    def check():
        snap = t.snapshot()
        got = sorted((r["id"], r["v"]) for r in snap.collect())
        assert got == sorted(model.items()), (got, sorted(model.items()))
        assert snap.where("g IS NULL OR g != v * 2").count() == 0

    for op, arg in ops:
        if op == "merge":
            delta = {(arg * 7 + k) % 30: arg * 100 + k for k in range(5)}
            ddf = spark.createDataFrame(sorted(delta.items()), "id long, v long")
            v = t.merge(ddf, pk_cols=["id"])
            model.update(delta)
            states[v] = dict(model)
        elif op == "replace":
            # overwrite_where on a key slice: replace ids in [lo, lo+3)
            lo = arg % 28
            repl = {lo + k: arg * 1000 + k for k in range(3)}
            rdf = spark.createDataFrame(sorted(repl.items()), "id long, v long")
            v = t.overwrite_where(rdf, f"id >= {lo} AND id < {lo + 3}")
            model = {i: x for i, x in model.items() if not (lo <= i < lo + 3)}
            model.update(repl)
            states[v] = dict(model)
        elif op == "delete":
            v = t.delete(f"id >= {arg}")
            model = {i: x for i, x in model.items() if not i >= arg}
            states[v] = dict(model)
        elif op == "restore":
            candidates = sorted(v for v in states if v >= min_restorable)
            target = candidates[arg % len(candidates)]
            v = t.restore(target)
            model = dict(states[target])
            states[v] = dict(model)
        elif op == "compact":
            if not model:
                continue
            v = t.compact(target_files=2)
            states[v] = dict(model)
        else:  # vacuum
            t.vacuum(keep_last=arg, retain_seconds=0.0)
            head = max(states)
            min_restorable = max(min_restorable, head - arg + 1)
        check()
    # round-12 closing invariants over the whole surviving log:
    # every retained commit's instant resolves back to itself, a
    # timestamp-travelled snapshot equals the recorded model state,
    # and the head's reader features contain every retained commit's
    # (latched, never dropped)
    head = t.latest_version()
    retained = [v for v in sorted(states) if v >= min_restorable]
    for v in retained:
        assert t.version_at(t.commit_timestamp(v)) == v
    probe = retained[len(retained) // 2]
    tv = t.snapshot(timestamp=t.commit_timestamp(probe))
    got = sorted((r["id"], r["v"]) for r in tv.collect())
    assert got == sorted(states[probe].items())
    head_feats = set(t._read_manifest(head).get("features") or ())
    for v in retained:
        assert set(t._read_manifest(v).get("features") or ()) <= head_feats


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=10),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=0, max_value=10),
)
def test_bpe_kernel_encoder_equals_pure_fold(docs_words, n_rules):
    """Pure-Python property (no Spark): the kernel's min-rank-iteration
    encode (bpe._bpe_segment_kernel's algorithm) must equal the
    sequential rule-by-rule fold for ANY rule list a trainer could
    produce over the corpus — including identical-symbol runs and rules
    that never fire."""
    from bigdatamigratecloud_spark.operators.bpe import _python_tokens

    texts = [" ".join(ws) for ws in docs_words]
    # train rules with the reference replay over these texts
    wc: dict = {}
    for t in texts:
        for tok in t.split():
            wc[tok] = wc.get(tok, 0) + 1
    rules = []
    w = {word: list(word) for word in wc}
    for _ in range(n_rules):
        freq: dict = {}
        for word, syms in w.items():
            for i in range(len(syms) - 1):
                freq[(syms[i], syms[i + 1])] = freq.get((syms[i], syms[i + 1]), 0) + wc[word]
        if not freq:
            break
        (a, b), tot = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if tot < 1:
            break
        rules.append((a, b))
        for word, syms in w.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b); i += 2
                else:
                    ns.append(syms[i]); i += 1
            w[word] = ns

    ranks = {p: i for i, p in enumerate(rules)}

    def kernel_encode(word):
        syms = list(word)
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = rules[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    def fold_encode(word):
        syms = list(word)
        for a, b in rules:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b); i += 2
                else:
                    ns.append(syms[i]); i += 1
            syms = ns
        return syms

    for t in texts:
        for word in _python_tokens(t):
            assert kernel_encode(word) == fold_encode(word), (word, rules)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.sampled_from([1, 5, 32773]),
    st.sampled_from(["<", ">"]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_tiff_roundtrip_property(h, w, spp, comp, bo, seed):
    """Any 8-bit array roundtrips bit-exact through the TIFF codec for
    every compression x byte order x channel combination."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(seed % (2**31))
    arr = rng.randint(0, 256, (h, w, spp)).astype(np.uint8)
    got = decode_tiff(encode_tiff(arr if spp > 1 else arr[:, :, 0],
                                  compression=comp, byte_order=bo))
    assert got.shape == arr.shape
    assert (got == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
            ),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=16),
)
def test_bpe_byte_kernel_equals_fold_on_non_ascii(texts, n_rules):
    """Byte-level property (round 8, pure Python): on ARBITRARY unicode
    text — multi-byte UTF-8, combining marks, whitespace runs — a
    byte-level merge table trained by the exact local loop encodes
    identically min-rank-first (the kernel order) and one-pass-per-rule
    (the fold order), and the byte mapping is lossless."""
    from bigdatamigratecloud_spark.operators.bpe import (
        _B2U,
        _byte_syms,
        _pretokenize,
        _train_local,
        bpe_bytes_fold_reference,
    )

    wc: dict = {}
    for t in texts:
        for w in _pretokenize(t):
            wc[w] = wc.get(w, 0) + 1
    rules = [
        (lhs, rhs)
        for _, lhs, rhs, _, _ in _train_local(
            [(_byte_syms(w), c) for w, c in wc.items()], n_rules, 1
        )
    ]
    ranks = {p: i for i, p in enumerate(rules)}

    def kernel_encode(w):
        syms = _byte_syms(w)
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = rules[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    u2b = {c: bytes([b]) for b, c in _B2U.items()}
    from bigdatamigratecloud_spark.operators.bpe import bpe_vocab_ids

    vocab = bpe_vocab_ids(rules)
    inv = {v: k for k, v in vocab.items()}
    for t in texts:
        kern = [s for w in _pretokenize(t) for s in kernel_encode(w)]
        assert kern == bpe_bytes_fold_reference(t, rules), (t, rules)
        back = b"".join(u2b[c] for tok in kern for c in tok)
        assert back == b"".join(w.encode("utf-8") for w in _pretokenize(t))
        # id space is a bijection over the emitted symbols (round 8):
        # encode->ids->decode loses nothing on arbitrary unicode
        ids = [vocab[s] for s in kern]
        assert [inv[i] for i in ids] == kern


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7), min_size=1, max_size=5
    ),
    st.integers(min_value=1, max_value=9),
)
def test_unigram_viterbi_is_globally_optimal(words, cost_seed):
    """Pure-Python property (round 8): _viterbi returns THE minimum of
    (total cost, piece count, joined string) over ALL segmentations —
    checked by brute-force enumeration on short words."""
    from bigdatamigratecloud_spark.operators.unigram import SEP, _viterbi

    vocab = {}
    for w in words:
        for i in range(len(w)):
            for L in range(1, min(3, len(w) - i) + 1):
                p = w[i : i + L]
                vocab[p] = (hash((p, cost_seed)) % 97) + 1

    def all_segs(w):
        if not w:
            yield []
            return
        for L in range(1, min(3, len(w)) + 1):
            if w[:L] in vocab:
                for rest in all_segs(w[L:]):
                    yield [w[:L]] + rest

    for w in words:
        got = _viterbi(w, vocab, 3)
        best = min(
            (
                (sum(vocab[p] for p in s), len(s), SEP.join(s), s)
                for s in all_segs(w)
            ),
            default=None,
        )
        if best is None:
            assert got is None
        else:
            assert got == best[3], (w, got, best)


@settings(max_examples=40, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=0, max_size=40
    )
)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Property: the degree-oriented wedge algorithm agrees with an
    O(n^3) brute force on arbitrary small graphs (dups, reversals,
    self-loops included)."""
    from itertools import combinations

    from bigdatamigratecloud_spark.operators.cluster import triangle_counts

    simple = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = sorted({x for e in simple for x in e})
    adj = {n: set() for n in nodes}
    for u, v in simple:
        adj[u].add(v)
        adj[v].add(u)
    expect = {}
    for n in nodes:
        t = sum(
            1
            for a, b in combinations(sorted(adj[n]), 2)
            if b in adj[a]
        )
        expect[n] = (len(adj[n]), t)
    if not edges:
        edges = [(0, 0)]  # createDataFrame needs >= 1 row; self-loop drops
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree, r.triangles) for r in triangle_counts(df).collect()
    }
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    ),
    alpha=st.sampled_from([0.25, 0.5, 0.9, 1.0]),
)
def test_ema_matches_python_fold(spark, vals, alpha):
    """Property: ema_by_group reproduces the sequential Python fold
    bit-for-bit for any values and alpha."""
    import datetime

    from bigdatamigratecloud_spark.operators.temporal import ema_by_group

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, i, base + datetime.timedelta(seconds=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = [
        r.ema
        for r in ema_by_group(df, alpha=alpha)
        .orderBy("event_id")
        .collect()
    ]
    acc = None
    expect = []
    for v in vals:
        acc = v if acc is None else alpha * v + (1.0 - alpha) * acc
        expect.append(acc)
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(
    host=st.lists(
        st.text(alphabet="abcz09", min_size=1, max_size=4), min_size=1, max_size=4
    ),
    scheme=st.sampled_from(["http", "https", "HTTPS"]),
    port=st.sampled_from([None, 80, 443, 8080]),
    path=st.sampled_from(["", "/", "/a/b", "/a/b/"]),
    params=st.lists(
        st.sampled_from(["q=1", "utm_source=x", "fbclid=9", "k=v"]), max_size=4
    ),
)
def test_normalize_url_idempotent_property(spark, host, scheme, port, path, params):
    """Property: normalize(normalize(u)) == normalize(u) for any
    well-formed URL assembled from components."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.urls import normalize_url

    u = f"{scheme}://{'.'.join(host)}"
    if port is not None:
        u += f":{port}"
    u += path
    if params:
        u += "?" + "&".join(params)
    u += "#frag"
    df = spark.createDataFrame([(u,)], "url string")
    once = df.select(normalize_url(F.col("url")).alias("url"))
    twice = once.select(normalize_url(F.col("url")).alias("url"))
    assert once.first().url == twice.first().url


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=64), min_size=1, max_size=8
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(spark, tmp_path_factory, payloads, gz):
    """Property: arbitrary payload BYTES (CRLF runs, empties, nulls)
    survive the WARC record framing byte-for-byte."""
    import gzip as _gz

    from bigdatamigratecloud_spark.sources import warc

    d = tmp_path_factory.mktemp("warcprop")
    recs = b""
    for i, p in enumerate(payloads):
        head = (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:uuid:p" + str(i).encode() + b">\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Target-URI: http://p.example/" + str(i).encode() + b"\r\n"
            b"Content-Type: application/octet-stream\r\n"
            b"Content-Length: " + str(len(p)).encode() + b"\r\n\r\n"
        )
        rec = head + p + b"\r\n\r\n"
        recs += _gz.compress(rec) if gz else rec
    (d / ("a.warc.gz" if gz else "a.warc")).write_bytes(recs)
    got = {
        r.target_uri: bytes(r.payload)
        for r in warc.read_warc(spark, str(d)).collect()
    }
    assert got == {
        f"http://p.example/{i}": bytes(p) for i, p in enumerate(payloads)
    }


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=6, max_size=30), min_size=3, max_size=12
    )
)
def test_hot_bucket_guard_inert_property(spark, texts):
    """Property: with the cap above every bucket size, the guarded
    candidate join equals the unguarded one on arbitrary corpora."""
    from bigdatamigratecloud_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = dedup.minhash_signatures(docs)
    hi = len(texts) * 8 + 2
    guarded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(sigs, max_bucket=hi).collect()
    }
    unguarded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(sigs, max_bucket=None).collect()
    }
    assert guarded == unguarded


# --------------------------------------------------------------- CUSUM

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-500.0, max_value=500.0, allow_nan=False, width=64),
        min_size=1,
        max_size=60,
    ),
    st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=64),
    st.floats(min_value=0.0, max_value=20.0, allow_nan=False, width=64),
)
def test_cusum_prefix_identity_equals_recursion(vals, target, slack):
    """The windowed rewrite S_t = P_t - min(0, min_{j<=t} P_j) must equal
    the textbook recursion S_t = max(0, S_{t-1} + dev_t) on EXACT decimal
    increments — for any series, target, and slack."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")

    def dev(v, up):
        return Decimal(v - up).quantize(q, rounding=ROUND_HALF_UP)

    up = target + slack
    # recursion
    s = Decimal(0)
    rec = []
    for v in vals:
        s = max(Decimal(0), s + dev(v, up))
        rec.append(s)
    # prefix identity
    p = Decimal(0)
    mn = None
    out = []
    for v in vals:
        p += dev(v, up)
        mn = p if mn is None else min(mn, p)
        out.append(p - min(Decimal(0), mn))
    assert out == rec


# ------------------------------------------------------------- robots.txt

def _robots_reference_parse(host: str, txt: str) -> set[tuple]:
    """Independent pure-Python replica of operators/urls.robots_rules
    (line scan with explicit UA-run state instead of window functions)."""
    import re as _re

    out: set[tuple] = set()
    run_agents: list[str] = []
    in_ua_run = False
    for raw in _re.split(r"\r?\n", txt):
        line = _re.sub(r"#.*$", "", raw).strip()
        m = _re.match(r"^([^:]+):(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).strip().lower(), m.group(2).strip()
        if field == "user-agent":
            if not in_ua_run:
                run_agents, in_ua_run = [], True
            if value:
                run_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_ua_run = False
            if value:
                for a in run_agents:
                    out.add((host, a, field, value))
    # group existence marker (zero-length allow) for every declared agent
    seen_agents = set()
    in_ua_run = False
    for raw in _re.split(r"\r?\n", txt):
        line = _re.sub(r"#.*$", "", raw).strip()
        m = _re.match(r"^([^:]+):(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).strip().lower(), m.group(2).strip()
        if field == "user-agent" and value:
            seen_agents.add(value.lower())
    for a in seen_agents:
        out.add((host, a, "allow", ""))
    return out


_ROBOTS_LINES = st.lists(
    st.one_of(
        st.sampled_from(
            ["User-agent: *", "User-agent: botA", "USER-AGENT: botB",
             "Disallow: /a/", "Disallow: /a/b", "Allow: /a/b/c",
             "Disallow:", "Allow: /x", "# comment", "", "   ",
             "Disallow: /q/  # trailing", "Crawl-delay: 5", "junk line"]
        ),
    ),
    min_size=0, max_size=14,
)


@settings(max_examples=12, deadline=None)
@given(_ROBOTS_LINES, st.sampled_from(["\n", "\r\n"]))
def test_robots_rules_matches_reference_parser(spark, lines, sep):
    """The window-function parse must agree with an independent
    stateful line-scan reference on randomized robots.txt documents
    (UA runs, comments, junk fields, blank lines, CRLF)."""
    from bigdatamigratecloud_spark.operators import urls

    txt = sep.join(lines)
    got = {
        (r.host, r.agent, r.rule, r.path_prefix)
        for r in urls.robots_rules(
            spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
        ).collect()
    }
    assert got == _robots_reference_parse("h.example", txt)
