"""BM25 retrieval + fixed-point PageRank (operators/retrieval.py):
value-exactness against independent Python replays, determinism under
repartitioning, and the plan shapes the 100 TB story depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.retrieval import (
    PAGERANK_SCALE,
    bm25_topk,
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


def _pagerank_expected(edges, iters=5, scale=PAGERANK_SCALE, num=85, den=100):
    """Pure-Python integer replay of the recurrence."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(outdeg)
    init = scale // n
    base = (init * (den - num)) // den
    rank = {v: init for v in outdeg}
    for _ in range(iters):
        acc = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + rank[s] // outdeg[s]
        rank = {v: base + (num * s) // den for v, s in acc.items()}
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


def test_pagerank_plan_depth_constant(spark):
    # localCheckpoint per round must keep the final plan free of the
    # full iteration lineage: no more than one shuffle round in the plan
    edges = _undirected([(0, 1), (1, 2)])
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(df, iters=6)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan
