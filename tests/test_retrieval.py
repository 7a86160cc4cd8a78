"""BM25 retrieval + fixed-point PageRank (operators/retrieval.py):
value-exactness against independent Python replays, determinism under
repartitioning, and the plan shapes the 100 TB story depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.retrieval import (
    PAGERANK_SCALE,
    bm25_topk,
    bm25_topk_multi,
    pagerank,
)


def _bm25_expected(corpus: dict[int, str], terms: list[str], k: int = 10):
    """Independent float replay of the exact op sequence."""
    toks = {d: t.split(" ") for d, t in corpus.items()}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    avgdl = float(total) / float(n)
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    rows = []
    for d, v in toks.items():
        score = 0.0
        hit = False
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                score = score + 0.0
                continue
            hit = True
            idf = (float(n - df[t]) + 0.5) / (float(df[t]) + 0.5)
            denom = float(tf) + 1.2 * (0.25 + 0.75 * (float(len(v)) / avgdl))
            score = score + idf * ((float(tf) * 2.2) / denom)
        if hit:
            rows.append((d, score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


CORPUS = {
    1: "spark join scan join join filter",
    2: "vector vector store",
    3: "slow query slow join",
    4: "nothing relevant here at all",
    5: "join",
    6: "vector join slow vector join slow vector",
}
TERMS = ["join", "vector", "slow"]


def test_bm25_matches_independent_replay(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string"
    )
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(docs, TERMS).collect()]
    exp = _bm25_expected(CORPUS, TERMS)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-12), (gd, gs, es)
    # doc 4 matches no term and must not appear
    assert 4 not in [g[0] for g in got]


def test_bm25_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string"
    )
    a = bm25_topk(docs.repartition(1), TERMS).collect()
    b = bm25_topk(docs.repartition(7, "doc_id"), TERMS).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_plan_topk_no_global_sort(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string"
    )
    plan = bm25_topk(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    # top-k must plan as TakeOrderedAndProject (per-partition top-k),
    # never a full global Sort of the scored frame
    assert "TakeOrderedAndProject" in plan


def test_bm25_input_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["a", "a"])


BATCH = {
    "qa": ["join", "vector"],
    "qb": ["slow"],
    "qc": ["vector", "slow", "join"],
}


def test_bm25_batch_matches_single_query_bit_for_bit(spark):
    """Each query's rows out of the batch path must be IDENTICAL (score
    bits included) to bm25_topk run alone with that query's terms —
    the union-term scan must not perturb any per-query expression."""
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string"
    )
    batch = bm25_topk_multi(docs, BATCH, k=5)
    rows = batch.collect()
    for qid, terms in BATCH.items():
        got = [
            (r["doc_id"], r["score"], r["rank"])
            for r in sorted(
                (r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"]
            )
        ]
        single = [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(docs, terms, k=5).collect()
        ]
        assert got == single, qid


def test_bm25_batch_one_corpus_scan(spark, sf_dir):
    """The decontamination-sweep contract: |queries| corpus scans would
    be the 100 TB killer.  The per-doc tf frame is checkpointed, so the
    executed plan downstream of it must contain ZERO parquet scans —
    the corpus was read exactly once, during the checkpoint."""
    from bigdatamigratecloud_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk_multi(docs, BATCH, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower(), plan


def test_bm25_batch_input_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk_multi(docs, {})
    with pytest.raises(ValueError):
        bm25_topk_multi(docs, {"q": []})
    with pytest.raises(ValueError):
        bm25_topk_multi(docs, {"q": ["a", "a"]})


def _pagerank_expected(edges, iters=5, scale=PAGERANK_SCALE, num=85, den=100):
    """Pure-Python integer replay of the recurrence (full node set,
    dangling mass redistributed uniformly)."""
    nodes = set()
    outdeg = {}
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    init = scale // n
    base = (init * (den - num)) // den
    rank = {v: init for v in nodes}
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        dsum = sum(rank[v] for v in nodes if v not in outdeg)
        for s, d in edges:
            acc[d] += rank[s] // outdeg[s]
        share = dsum // n
        rank = {v: base + (num * (acc[v] + share)) // den for v in nodes}
    return rank


def _undirected(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def test_pagerank_star_graph_exact(spark):
    # star: hub 0 — spokes 1..5; hub must dominate, values bit-exact
    edges = _undirected([(0, i) for i in range(1, 6)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=5).collect()}
    exp = _pagerank_expected(edges)
    assert got == exp
    assert got[0] > max(got[i] for i in range(1, 6))
    # spokes are symmetric
    assert len({got[i] for i in range(1, 6)}) == 1


def test_pagerank_partitioning_invariant(spark):
    edges = _undirected([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {tuple(r) for r in pagerank(df.repartition(1), iters=4).collect()}
    b = {tuple(r) for r in pagerank(df.repartition(5, "src"), iters=4).collect()}
    assert a == b == set(_pagerank_expected(edges, iters=4).items())


def test_pagerank_dangling_node_mass_redistributed(spark):
    """Node 4 has no out-edges: it must stay in the output, keep
    receiving rank, and donate its mass back uniformly each round —
    bit-exact vs the integer replay."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=5).collect()}
    exp = _pagerank_expected(edges)
    assert got == exp
    assert set(got) == {1, 2, 3, 4}
    # with redistribution the total mass stays near `scale` instead of
    # decaying by ~the dangling share each round
    assert sum(got.values()) > PAGERANK_SCALE * 9 // 10


def test_pagerank_zero_indegree_node_kept(spark):
    """Node 1 has no in-edges: standard PageRank gives it the base term
    every round; it must not vanish from the output (regression for the
    contribs-only rebuild that dropped it)."""
    edges = [(1, 2), (1, 3), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=4).collect()}
    exp = _pagerank_expected(edges, iters=4)
    assert got == exp
    assert 1 in got and got[1] > 0
    assert got[2] > got[1] and got[3] > got[1]


def test_pagerank_iteration_does_not_reshuffle_edges(spark):
    """The 100 TB contract: edges are bucketed by src once and cached
    (a cached plan KEEPS its outputPartitioning; a localCheckpoint
    under AQE does not), so ONE iteration's executed plan carries only
    the nodes-sized rank-frame alignments and the dst-sum shuffle — the
    edge cache is scanned with no Exchange on top."""
    from pyspark.sql import functions as SF

    from bigdatamigratecloud_spark.operators.retrieval import _pagerank_iteration

    edges = _undirected([(i, (i + 1) % 50) for i in range(50)])
    df = spark.createDataFrame(edges, "src long, dst long")
    e = df.repartition(SF.col("src")).persist()
    outdeg = e.groupBy("src").agg(SF.count(SF.lit(1)).alias("od"))
    nodes = (
        e.select(SF.col("src").alias("node"))
        .union(e.select(SF.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        nodes.join(outdeg.withColumnRenamed("src", "node"), "node", "left")
        .select("node", SF.coalesce(SF.col("od"), SF.lit(0)).cast("long").alias("outdeg"))
        .repartition(SF.col("node"))
        .persist()
    )
    n = deg.count()
    init = PAGERANK_SCALE // n
    base = (init * 15) // 100
    ranks = deg.select(
        "node", SF.lit(init).cast("long").alias("rank_scaled")
    ).localCheckpoint(eager=True)
    try:
        out = _pagerank_iteration(
            ranks, deg, e.withColumnRenamed("src", "node"), n, base, 85, 100
        )
        # traverse the ACTUAL physical tree (children() skips the cached
        # relations' innerChildren, which the text dump echoes and which
        # made substring counting lie)
        def nodes_of(p):
            stack, out_nodes = [(p, ())], []
            while stack:
                nd, path = stack.pop()
                name = nd.getClass().getSimpleName()
                out_nodes.append((nd, name, path))
                kids = []
                if name == "AdaptiveSparkPlanExec":
                    kids = [nd.executedPlan()]
                else:
                    ch = nd.children()
                    kids = [ch.apply(i) for i in range(ch.size())]
                    if name.endswith("QueryStageExec"):
                        kids.append(nd.plan())
                for k in kids:
                    stack.append((k, path + (name,)))
            return out_nodes

        plan_nodes = nodes_of(out._jdf.queryExecution().executedPlan())
        hash_shuffles = [
            nd
            for nd, name, _ in plan_nodes
            if name == "ShuffleExchangeExec"
            and "hashpartitioning" in nd.simpleString(200)
        ]
        # the only hash shuffle of a round is the map-side-combined dst
        # contribution sum (plus, at scale, a nodes-sized rank alignment)
        assert len(hash_shuffles) <= 2, [s.simpleString(120) for s in hash_shuffles]
        # and NO shuffle sits narrowly above the edge cache: an edge scan
        # reachable from an Exchange through only narrow ops would mean
        # the edge list re-shuffles every iteration
        NARROW = {"SortExec", "FilterExec", "ProjectExec", "InputAdapter",
                  "WholeStageCodegenExec", "InMemoryTableScanExec"}
        for sh in hash_shuffles:
            stack = [sh.children().apply(i) for i in range(sh.children().size())]
            while stack:
                nd = stack.pop()
                name = nd.getClass().getSimpleName()
                if name == "InMemoryTableScanExec":
                    assert "dst#" not in nd.simpleString(300), (
                        "edge cache scanned under a hash Exchange"
                    )
                if name in NARROW:
                    ch = nd.children()
                    stack += [ch.apply(i) for i in range(ch.size())]
        # and the result is the replayed iteration, bit-exact
        got = {r["node"]: r["rank_scaled"] for r in out.collect()}
        assert got == _pagerank_expected(edges, iters=1)
    finally:
        e.unpersist()
        deg.unpersist()


def test_pagerank_plan_depth_constant(spark):
    # localCheckpoint per round must keep the final plan free of the
    # full iteration lineage: no more than one shuffle round in the plan
    edges = _undirected([(0, 1), (1, 2)])
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(df, iters=6)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan


def test_pagerank_convergence_mode(spark):
    """until_delta stops iterating once no node moves more than the
    threshold — integer-exact, so the stop round (hence the result) is
    deterministic and equals the sequential replay with the same rule."""
    edges = _undirected([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 4)])
    df = spark.createDataFrame(edges, "src long, dst long")

    def replay_until(delta, cap=50):
        prev = None
        for it in range(1, cap + 1):
            cur = _pagerank_expected(edges, iters=it)
            if prev is not None and max(
                abs(cur[v] - prev[v]) for v in cur
            ) <= delta:
                return cur, it
            prev = cur
        return cur, cap

    exp, stop_round = replay_until(10_000_000)
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, iters=50, until_delta=10_000_000).collect()
    }
    assert got == exp, (stop_round, got, exp)
    assert stop_round < 50  # the rule actually fired before the cap
    # and a tighter threshold keeps iterating (strictly closer to the cap)
    exp2, stop2 = replay_until(1_000)
    got2 = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, iters=50, until_delta=1_000).collect()
    }
    assert got2 == exp2
    assert stop2 > stop_round


def test_rrf_fuse_semantics(spark):
    """rrf_fuse (round 8): a doc in both lists outranks single-list
    docs with better individual ranks; absent lists contribute 0;
    score is exactly sum 1/(c+rank); empty rankings raise."""
    import pytest as _p

    from bigdatamigratecloud_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, c=60).collect()}
    # doc 3: 1/63 + 1/61 beats doc 1's 1/61 alone
    assert got[3]["rank"] == 1
    assert got[3]["rrf_score"] == 1.0 / 63.0 + 1.0 / 61.0
    assert got[1]["rrf_score"] == 1.0 / 61.0
    assert got[4]["rrf_score"] == 1.0 / 62.0
    assert set(got) == {1, 2, 3, 4}
    with _p.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------- MaxSim

def _tok(df_rows, spark, id_name):
    return spark.createDataFrame(
        df_rows, f"{id_name} long, tok_pos long, vec array<double>"
    )


def test_maxsim_matches_python_replay(spark):
    from bigdatamigratecloud_spark.operators.retrieval import maxsim_topk

    docs = _tok(
        [
            (10, 0, [1.0, 0.0]), (10, 1, [0.0, 1.0]),
            (20, 0, [1.0, 1.0]), (20, 1, [3.0, 4.0]),
            (30, 0, [-1.0, 0.0]),
        ],
        spark, "doc_id",
    )
    qs = _tok([(1, 0, [2.0, 0.0]), (1, 1, [0.0, 5.0])], spark, "query_id")
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in maxsim_topk(docs, qs, k=3).collect()
    }

    import math

    def unit(v):
        n = math.sqrt(sum(0.0 + x * x for x in v))
        return [x / n for x in v]

    dv = {10: [[1.0, 0.0], [0.0, 1.0]], 20: [[1.0, 1.0], [3.0, 4.0]], 30: [[-1.0, 0.0]]}
    qv = [[2.0, 0.0], [0.0, 5.0]]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    want = {}
    for d, toks in dv.items():
        s = 0.0
        for q in qv:
            s += max(dot(unit(q), unit(t)) for t in toks)
        want[d] = s
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    for rk, (d, s) in enumerate(ranked, 1):
        assert got[(1, d)] == (rk, s), (d, got[(1, d)], (rk, s))


def test_maxsim_exact_copy_scores_query_length(spark):
    from bigdatamigratecloud_spark.operators.retrieval import maxsim_topk

    # doc 1 contains exact copies of both query tokens -> each MaxSim
    # term is cos=1.0, score == number of query tokens, rank 1
    docs = _tok(
        [(1, 0, [3.0, 0.0]), (1, 1, [0.0, 7.0]), (2, 0, [1.0, 1.0])],
        spark, "doc_id",
    )
    qs = _tok([(9, 0, [6.0, 0.0]), (9, 1, [0.0, 14.0])], spark, "query_id")
    rows = {r["doc_id"]: r for r in maxsim_topk(docs, qs, k=2).collect()}
    assert rows[1]["score"] == 2.0 and rows[1]["rank"] == 1
    assert rows[2]["rank"] == 2


def test_maxsim_validates_k(spark):
    from bigdatamigratecloud_spark.operators.retrieval import maxsim_topk

    df = _tok([(1, 0, [1.0])], spark, "doc_id")
    q = _tok([(1, 0, [1.0])], spark, "query_id")
    with pytest.raises(ValueError):
        maxsim_topk(df, q, k=0)


# ---------------------------------------------------------------- phrases

def test_phrase_match_counts_overlapping_and_absent(spark):
    from bigdatamigratecloud_spark.operators.retrieval import phrase_match_counts

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),       # "a b a" starts at 0 and 2
            (2, "x a b a y"),       # one start
            (3, "a a b b"),         # no match
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(100, ["a", "b", "a"]), (200, ["zz", "qq"])],
        "phrase_id long, words array<string>",
    )
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(docs, phrases).collect()
    }
    assert got == {(100, 1): 2, (100, 2): 1}


def test_phrase_match_single_word_phrase_counts_occurrences(spark):
    from bigdatamigratecloud_spark.operators.retrieval import phrase_match_counts

    docs = spark.createDataFrame([(1, "w v w w")], "doc_id long, text string")
    phrases = spark.createDataFrame([(9, ["w"])], "phrase_id long, words array<string>")
    got = phrase_match_counts(docs, phrases).collect()
    assert len(got) == 1 and got[0]["n_matches"] == 3


# ------------------------------------------------------------------- RM3

def _rm3_ref(doc_texts, terms, fb_docs, orig_weight):
    """Pure-Python RM3 replay (BM25 k1=1.2 b=0.75, rational idf)."""
    toks = {d: t.split() for d, t in doc_texts.items() if t.split()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scored = []
    for d, v in toks.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hit = True
            idf = ((n - dfs[t]) + 0.5) / (dfs[t] + 0.5)
            s = s + idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(v) / avgdl))))
        if hit:
            scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    fb = scored[:fb_docs]
    ssum = 0.0
    for _, s in fb:
        ssum = ssum + s
    fw = {}
    for r, (d, s) in enumerate(fb, 1):
        v = toks[d]
        for t in set(v):
            fw.setdefault(t, []).append((r, (v.count(t) / len(v)) * (s / ssum)))
    mix = 1.0 - orig_weight
    ow = orig_weight * (1.0 / len(terms))
    out = {}
    for t, cs in fw.items():
        acc = 0.0
        for _, c in sorted(cs):
            acc = acc + c
        out[t] = (ow + mix * acc) if t in terms else mix * acc
    return out


def test_rm3_matches_python_replica(spark):
    from bigdatamigratecloud_spark.operators.retrieval import rm3_expand

    texts = {
        1: "spark join shuffle broadcast join",
        2: "join join vector index",
        3: "window frame sort",
        4: "vector quantize vector recall",
        5: "slow scan pushdown join",
        6: "totally unrelated words here",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["token"]: r["weight"]
        for r in rm3_expand(docs, ["join", "vector"], fb_docs=3, fb_terms=50).collect()
    }
    ref = _rm3_ref(texts, ["join", "vector"], 3, 0.6)
    top = dict(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    assert got == top


def test_rm3_boosts_original_terms_and_validates(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.retrieval import rm3_expand

    docs = spark.createDataFrame(
        [(1, "q x"), (2, "q y")], "doc_id long, text string"
    )
    out = {r["token"]: r["weight"] for r in rm3_expand(docs, ["q"], fb_docs=2, fb_terms=10).collect()}
    # q has the same fb mass as x+y combined plus the 0.6 original boost
    assert out["q"] > out["x"] and out["q"] > out["y"]
    with _pytest.raises(ValueError):
        rm3_expand(docs, ["q"], fb_docs=0)
    with _pytest.raises(ValueError):
        rm3_expand(docs, ["q"], orig_weight=1.5)


# ------------------------------------------------------------ IR metrics

def test_ir_metrics_rr_recall_and_unretrieved_query(spark):
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.retrieval import ir_metrics

    run = spark.createDataFrame(
        [
            ("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
            ("q2", 20, 1), ("q2", 21, 2),
        ],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            ("q1", 11), ("q1", 12), ("q1", 99),     # first rel at rank 2
            ("q2", 77),                              # never retrieved
            ("q3", 5),                               # judged, no run rows
        ],
        "query_id string, doc_id long",
    )
    got = {r["query_id"]: r for r in ir_metrics(run, qrels, k=2).collect()}
    assert got["q1"]["first_rel_rank"] == 2 and got["q1"]["rr"] == 0.5
    assert got["q1"]["recall_at_k"] == 1 / 3          # only rank-2 hit <= k
    assert got["q2"]["rr"] is None and got["q2"]["recall_at_k"] == 0.0
    assert got["q3"]["rr"] is None and got["q3"]["n_rel"] == 1
    with _pytest.raises(ValueError):
        ir_metrics(run, qrels, k=0)


# ------------------------------------------------------------------ PPR

def _ppr_ref(pairs, seed_set, iters, scale=1_000_000_000_000, num=85, den=100):
    """Pure-Python integer replica of pagerank_personalized."""
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    out = {}
    for u, v in set(pairs):
        out.setdefault(u, []).append(v)
    seeds = sorted(seed_set)
    init = scale // len(seeds)
    base = (init * (den - num)) // den
    rank = {n: (init if n in seed_set else 0) for n in nodes}
    for _ in range(iters):
        dsum = sum(rank[n] for n in nodes if n not in out)
        s = {n: 0 for n in nodes}
        for u, vs in out.items():
            c = rank[u] // len(vs)
            for v in vs:
                s[v] += c
        rank = {
            n: (base if n in seed_set else 0)
            + (num * (s[n] + (dsum // len(seeds) if n in seed_set else 0))) // den
            for n in nodes
        }
    return rank


def test_ppr_matches_python_replica_and_zeroes_off_component(spark):
    from bigdatamigratecloud_spark.operators.retrieval import pagerank_personalized

    # chain 1-2-3-4-5 plus a disconnected component 10-11; seed = {1}
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 5), (5, 4),
             (10, 11), (11, 10)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_personalized(edges, seeds, iters=6).collect()}
    assert got == _ppr_ref(pairs, {1}, 6)
    assert got[10] == 0 and got[11] == 0
    # every node of the seed's component carries positive mass
    assert all(got[n] > 0 for n in (1, 2, 3, 4, 5))


def test_ppr_empty_seed_set_is_all_zero(spark):
    from bigdatamigratecloud_spark.operators.retrieval import pagerank_personalized

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([], "node long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_personalized(edges, seeds).collect()}
    assert got == {1: 0, 2: 0}


def test_ppr_partition_invariant(spark):
    import random

    from bigdatamigratecloud_spark.operators.retrieval import pagerank_personalized

    rng = random.Random(4)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    pairs = [(u, v) for u, v in pairs if u != v]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (7,)], "node long")
    a = {r["node"]: r["rank_scaled"] for r in pagerank_personalized(edges, seeds, iters=4).collect()}
    b = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_personalized(edges.repartition(17), seeds, iters=4).collect()
    }
    assert a == b
