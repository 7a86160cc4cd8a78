"""Corpus retrieval & graph-scoring ops (north-star, beyond the
reference): BM25 keyword search over the document corpus and a
fixed-point PageRank over a link graph.

Why these belong in an LLM-data pipeline: BM25 is the standard lexical
retriever for targeted data selection (pull the documents most relevant
to a benchmark/topic out of a 100 TB corpus — the retrieval half of
decontamination's "find the overlap" problem), and PageRank-style link
centrality is a classic web-corpus quality prior (a page many hubs
point at is worth more training mass than an orphan).

Cross-engine exactness is the design constraint, as everywhere in this
package:

- BM25's per-(doc,term) score is a FIXED sequence of IEEE-double ops
  (rational Robertson idf — no ln(), which is libm-specific), and the
  per-document sum over query terms is a FIXED-ORDER chain of `+` over
  per-term pivot columns, never an aggregate whose accumulation order
  the engine chooses.  Identical bits in Spark and DuckDB.
- PageRank runs entirely in scaled INTEGER arithmetic (rank is bigint
  micro-units of 1e-12): init = SCALE div N, contribution =
  rank div outdeg, damping = (85 * sum) div 100.  Floor division on
  non-negative integers is engine-independent, and BIGINT sums are
  order-independent — so five iterations replay bit-for-bit in any
  engine, which no floating-point PageRank can promise.

Scale design (100 TB):
- BM25: the query-term list is tiny and fixed, so per-document stats
  (dl + one tf per term) come out of ONE token-scan aggregation via
  conditional counts — a single corpus shuffle keyed by doc_id, partial
  aggregation map-side.  The (N, df, total_tokens) frame is one row and
  broadcasts.  Top-k is orderBy+limit → TakeOrderedAndProject (per-
  partition top-k, driver merges k rows, no global sort).
- PageRank: edges are the big frame; each iteration is one shuffle join
  of the nodes-sized rank frame against pre-aggregated out-degrees plus
  one sum keyed by dst.  The rank frame is localCheckpoint-ed per round
  so the plan stays O(1) deep instead of O(iterations); the edge frame
  is checkpointed once.  Rounds are a fixed small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# BM25 constants, written as the exact literals both engines evaluate:
# k1 = 1.2, b = 0.75, k1 + 1 = 2.2, 1 - b = 0.25.
_K1 = 1.2
_K1P1 = 2.2
_B = 0.75
_ONE_MINUS_B = 0.25

PAGERANK_SCALE = 1_000_000_000_000  # 1e12 micro-units of rank mass


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25(k1=1.2, b=0.75) for a fixed bag of query
    terms.  Returns (doc_id, score, rank), rank 1..k, ties broken by
    doc_id ascending.

    The idf is the RATIONAL Robertson form (N - df + 0.5)/(df + 0.5)
    — the same monotone ranking as the usual ln(1 + ...) form for any
    fixed corpus, without a libm-dependent transcendental — and every
    double op is written in one fixed parenthesization that the oracle
    SQL mirrors token-for-token, so scores are bit-identical across
    engines.

    Plan shape: one shuffle (per-doc conditional aggregation over the
    token scan), one broadcast of the 1-row corpus-stats frame, then
    TakeOrderedAndProject for the top-k.  The posting lists never
    materialize wider than (dl, tf_1..tf_m) per document.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_topk query terms must be distinct")

    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    # ONE aggregation: document length + one conditional tf per term
    aggs = [F.count(F.lit(1)).alias("dl")] + [
        F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    per = toks.groupBy(id_col).agg(*aggs)
    # corpus stats: N, total token count, per-term document frequency
    stat_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    ] + [
        F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
        for i in range(len(terms))
    ]
    stats = per.agg(*stat_aggs)

    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")

    def contrib(i: int):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}")
        idf = ((F.col("n_docs") - df).cast("double") + F.lit(0.5)) / (
            df.cast("double") + F.lit(0.5)
        )
        denom = tf + F.lit(_K1) * (
            F.lit(_ONE_MINUS_B) + F.lit(_B) * (F.col("dl").cast("double") / avgdl)
        )
        return F.when(
            F.col(f"tf{i}") > 0, idf * ((tf * F.lit(_K1P1)) / denom)
        ).otherwise(F.lit(0.0))

    # FIXED-ORDER sum: term 0 + term 1 + ... — never an engine-ordered
    # aggregate over doubles
    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)

    matched = None
    for i in range(len(terms)):
        cond = F.col(f"tf{i}") > 0
        matched = cond if matched is None else (matched | cond)

    scored = (
        per.crossJoin(F.broadcast(stats))
        .where(matched)
        .select(F.col(id_col), score.alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "score", "rank"
    )


def bm25_topk_sql(
    terms: list[str], table: str = "documents", id_col: str = "doc_id", k: int = 10
) -> str:
    """DuckDB oracle for :func:`bm25_topk` — the identical fixed
    expression sequence, so the scores are bit-equal, not just
    rank-equal."""
    m = len(terms)
    tf_cols = ",\n               ".join(
        f"count(*) FILTER (token = '{t}') AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n              ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in range(m)
    )
    def contrib(i: int) -> str:
        return (
            f"(CASE WHEN tf{i} > 0 THEN "
            f"((CAST(n_docs - df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
            f" * ((CAST(tf{i} AS DOUBLE) * 2.2) / (CAST(tf{i} AS DOUBLE)"
            f" + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))"
            f" ELSE CAST(0.0 AS DOUBLE) END)"
        )
    score = " + ".join(contrib(i) for i in range(m))
    matched = " OR ".join(f"tf{i} > 0" for i in range(m))
    return f"""WITH toks AS (SELECT {id_col}, unnest(string_split(text, ' ')) AS token
                     FROM {table}),
       per AS (SELECT {id_col}, count(*) AS dl,
               {tf_cols}
               FROM toks GROUP BY {id_col}),
       stats AS (SELECT count(*) AS n_docs, SUM(dl) AS total_tokens,
              {df_cols}
              FROM per),
       scored AS (SELECT {id_col},
                         {score} AS score
                  FROM per CROSS JOIN
                       (SELECT *, CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                        FROM stats) s
                  WHERE {matched}),
       top AS (SELECT {id_col}, score FROM scored
               ORDER BY score DESC, {id_col} ASC LIMIT {k})
       SELECT {id_col}, score,
              CAST(ROW_NUMBER() OVER (ORDER BY score DESC, {id_col} ASC) AS INT) AS rank
       FROM top"""


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-point PageRank: `iters` synchronous iterations of
    rank(v) <- (1-d)/N + d * sum_{u->v} rank(u)/outdeg(u) with d =
    damping_num/damping_den, ALL arithmetic in scaled 64-bit integers
    (micro-units of `scale`), so the result is bit-identical on any
    engine and any partitioning:

        init      = scale div N
        contrib   = rank(u) div outdeg(u)
        rank'(v)  = ((scale div N) * (den-num)) div den
                    + (num * sum(contrib)) div den

    Floor-division remainders mean total mass decays slightly per round
    — deterministically, identically everywhere; the op ranks nodes, it
    does not promise a stochastic-matrix invariant.  Directed edges;
    every node is assumed to appear as a source (feed an undirected
    graph as both directions — dangling nodes would otherwise leak rank
    and vanish from the output).

    Returns (node, rank_scaled) for every node, rank in micro-units.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if checkpoint:
        deg = deg.localCheckpoint(eager=True)
    n_nodes = deg.count()  # one tiny action; deg is nodes-sized
    if n_nodes == 0:
        return deg.select(
            F.col("src").alias("node"), F.lit(0).cast("long").alias("rank_scaled")
        )
    init = scale // n_nodes
    base = (init * (damping_den - damping_num)) // damping_den
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(init).cast("long").alias("rank_scaled")
    )
    deg_n = deg.withColumnRenamed("src", "node")
    e_n = e.withColumnRenamed("src", "node")
    for _ in range(iters):
        contribs = (
            ranks.join(deg_n, "node")
            .join(e_n, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div outdeg").cast("long").alias("c"),
            )
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(base)
                + F.expr(f"({damping_num} * sum(c)) div {damping_den}")
            )
            .cast("long")
            .alias("rank_scaled")
        )
        if checkpoint:
            # nodes-sized frame; without this the plan doubles per round
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_sql_steps(
    edges_cte: str,
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """CTE chain replaying :func:`pagerank` in DuckDB (iterations
    unrolled — portable across engines whose recursive CTEs restrict
    aggregation in the recursive term).  `edges_cte` must yield
    (src, dst).  Exposes the final ranks as CTE `prfinal(node,
    rank_scaled)`; integer arithmetic throughout, `//` = floor div on
    the non-negative operands used here."""
    rest = damping_den - damping_num
    parts = [
        f"edges AS ({edges_cte})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*) AS n_nodes FROM deg)",
        f"it0 AS (SELECT src AS node, {scale} // n_nodes AS rank_scaled "
        "FROM deg CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS (SELECT e.dst AS node, SUM(p.rank_scaled // d.outdeg) AS s "
            f"FROM it{i-1} p JOIN deg d ON p.node = d.src "
            f"JOIN edges e ON p.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"it{i} AS (SELECT node, (({scale} // n_nodes) * {rest}) // {damping_den}"
            f" + ({damping_num} * s) // {damping_den} AS rank_scaled "
            f"FROM s{i} CROSS JOIN nn)"
        )
    parts.append(f"prfinal AS (SELECT node, rank_scaled FROM it{iters})")
    return ",\n       ".join(parts)
