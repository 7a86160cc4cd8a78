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

    # FIXED-ORDER sum: term 0 + term 1 + ... — never an engine-ordered
    # aggregate over doubles
    score = _bm25_contrib(0)
    for i in range(1, len(terms)):
        score = score + _bm25_contrib(i)

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


def _bm25_ctes(terms: list[str], table: str, id_col: str, k: int) -> str:
    """The shared CTE chain (toks → per → stats → scored → top) replaying
    :func:`bm25_topk` — the identical fixed expression sequence, so the
    scores are bit-equal, not just rank-equal.  Reused verbatim by
    :func:`bm25_topk_sql` and :func:`rm3_expand_sql`."""
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
    # Tokenization must mirror text.tokens() exactly: collapse whitespace
    # runs, trim, and EXCLUDE blank documents — a bare string_split(text,
    # ' ') would yield [''] for an empty doc (counted with dl=1), while
    # Spark yields an empty array (doc excluded from N/avgdl/df).
    return f"""toks AS (SELECT {id_col},
                            unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
                     FROM {table}
                     WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
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
       top AS (SELECT {id_col}, score,
                      CAST(ROW_NUMBER() OVER (ORDER BY score DESC, {id_col} ASC) AS INT) AS rank
               FROM scored
               ORDER BY score DESC, {id_col} ASC LIMIT {k})"""


def bm25_topk_sql(
    terms: list[str], table: str = "documents", id_col: str = "doc_id", k: int = 10
) -> str:
    """DuckDB oracle for :func:`bm25_topk` (see :func:`_bm25_ctes`)."""
    return f"""WITH {_bm25_ctes(terms, table, id_col, k)}
       SELECT {id_col}, score, rank FROM top"""


def rm3_expand(
    docs: DataFrame,
    terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 20,
    orig_weight: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft
    relevance models, the Anserini/Indri production form): run BM25,
    take the top ``fb_docs`` feedback documents, estimate a feedback
    term distribution

        fw(w) = sum_{d in Fb} (tf(w,d) / dl_d) * (score_d / sum_score)

    and interpolate with the uniform original query model —
    weight(w) = ow·(1/|Q|)·[w in Q] + (1-ow)·fw(w) — returning the top
    ``fb_terms`` expansion terms as (token, weight, rank).  This is the
    targeted-data-selection amplifier: one seed query pulls topic
    vocabulary out of the corpus itself, and the expanded term set
    feeds bm25_topk/bm25_topk_multi for the wide sweep.

    Exactness: every per-(doc,term) contribution is a fixed IEEE chain
    ((tf/dl) * (score/sum_score)); the sum over feedback docs folds in
    RANK order (collect ≤ fb_docs structs, array_sort, one ordered
    fold), and sum_score folds the ≤ fb_docs scores the same way — no
    engine-ordered double aggregation anywhere, so weights are
    bit-identical across engines.

    Scale shape: the corpus pays ONE extra token scan beyond bm25_topk
    — feedback doc ids broadcast into it, so tf/dl aggregate over the
    ≤ fb_docs surviving documents only; everything downstream is
    bounded by (feedback vocabulary × fb_docs).  fb arrays are ≤
    fb_docs elements by construction."""
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError(f"fb_docs/fb_terms must be >= 1, got {fb_docs}/{fb_terms}")
    if not 0.0 <= orig_weight <= 1.0:
        raise ValueError(f"orig_weight must be in [0,1], got {orig_weight}")
    mix = 1.0 - float(orig_weight)
    ow_term = float(orig_weight) * (1.0 / len(terms))

    fb = bm25_topk(docs, terms, id_col=id_col, text_col=text_col, k=fb_docs)
    ssum = fb.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("rank"), F.col("score")))),
            F.lit(0.0),
            lambda acc, x: acc + x["score"],
        ).alias("ssum")
    )
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    fb_toks = toks.join(F.broadcast(fb), id_col)
    tf = fb_toks.groupBy(id_col, "rank", "score", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = fb_toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    contrib = (
        tf.join(F.broadcast(dl), id_col)
        .crossJoin(F.broadcast(ssum))
        .select(
            "token",
            "rank",
            (
                (F.col("tf").cast("double") / F.col("dl").cast("double"))
                * (F.col("score") / F.col("ssum"))
            ).alias("c"),
        )
    )
    fw = contrib.groupBy("token").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("rank"), F.col("c")))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("fw")
    )
    weighted = fw.select(
        "token",
        F.when(
            F.col("token").isin(list(terms)),
            F.lit(ow_term) + F.lit(mix) * F.col("fw"),
        )
        .otherwise(F.lit(mix) * F.col("fw"))
        .alias("weight"),
    )
    topt = weighted.orderBy(F.col("weight").desc(), F.col("token").asc()).limit(fb_terms)
    w = Window.orderBy(F.col("weight").desc(), F.col("token").asc())
    return topt.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "token", "weight", "rank"
    )


def rm3_expand_sql(
    terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 20,
    orig_weight: float = 0.6,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`rm3_expand` — reuses the bm25 CTE chain
    and replays the rank-ordered folds as explicit parenthesized chains
    (absent feedback ranks contribute +0.0, the IEEE identity on the
    non-negative partials here)."""
    mix = 1.0 - float(orig_weight)
    ow_term = float(orig_weight) * (1.0 / len(terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    ssum_chain = "0.0"
    for r in range(1, fb_docs + 1):
        ssum_chain = (
            f"({ssum_chain} + COALESCE(MAX(CASE WHEN rank = {r} THEN score END), 0.0))"
        )
    fw_chain = "0.0"
    for r in range(1, fb_docs + 1):
        fw_chain = (
            f"({fw_chain} + COALESCE(MAX(CASE WHEN rank = {r} THEN c END), 0.0))"
        )
    return f"""WITH {_bm25_ctes(terms, table, id_col, fb_docs)},
       fbt AS (SELECT t.{id_col}, t.rank, t.score, k.token
               FROM top t JOIN toks k USING ({id_col})),
       tf AS (SELECT {id_col}, rank, score, token, count(*) AS tf
              FROM fbt GROUP BY 1, 2, 3, 4),
       dl AS (SELECT {id_col}, count(*) AS dl FROM fbt GROUP BY 1),
       ss AS (SELECT {ssum_chain} AS ssum FROM top),
       ct AS (SELECT token, rank,
                     (CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
                     * (score / ssum) AS c
              FROM tf JOIN dl USING ({id_col}) CROSS JOIN ss),
       fw AS (SELECT token, {fw_chain} AS fw FROM ct GROUP BY token),
       wt AS (SELECT token,
                     CASE WHEN token IN ({in_list})
                          THEN CAST('{ow_term!r}' AS DOUBLE)
                               + CAST('{mix!r}' AS DOUBLE) * fw
                          ELSE CAST('{mix!r}' AS DOUBLE) * fw END AS weight
              FROM fw),
       topt AS (SELECT token, weight FROM wt
                ORDER BY weight DESC, token ASC LIMIT {fb_terms})
       SELECT token, weight,
              CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, token ASC) AS INT)
                  AS rank
       FROM topt"""


def _bm25_contrib(i: int):
    """Per-term BM25 contribution column over the (dl, tf{i}, df{i},
    n_docs, total_tokens) frame — the single fixed IEEE-double expression
    both bm25_topk and bm25_topk_multi evaluate."""
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
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


def bm25_topk_multi(
    docs: DataFrame,
    queries: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Batch BM25: top-k documents for EVERY query in `queries`
    ({query_id: [terms...]}) out of ONE corpus scan — the shape a
    benchmark-decontamination sweep needs (hundreds of queries against
    a 100 TB corpus must not mean hundreds of corpus scans).

    Returns (query_id, doc_id, score, rank), rank 1..k per query, ties
    by doc_id — per-query results identical to bm25_topk(terms) bit for
    bit: the per-(doc, term) contribution is the same fixed double
    expression and each query's score is the same fixed-order chain of
    `+` over ITS terms (never an engine-ordered aggregate).

    Plan shape: the union of all query terms drives one conditional-agg
    token scan producing (dl, tf per union-term) per document; that
    frame is localCheckpoint-ed (materialized ONCE — the corpus scan
    happens exactly once, asserted in tests) and every query scores off
    it with a docs-sized projection; per-query top-k runs as ONE
    rank-window over the unioned scored frame, which Spark executes as
    WindowGroupLimit (per-partition partial top-k per query — no global
    sort, no full materialization)."""
    if not queries:
        raise ValueError("bm25_topk_multi needs at least one query")
    union_terms: list[str] = []
    seen = set()
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(f"query {qid!r} has no terms")
        if len(set(terms)) != len(terms):
            raise ValueError(f"query {qid!r} terms must be distinct")
        for t in terms:
            if t not in seen:
                seen.add(t)
                union_terms.append(t)
    idx = {t: i for i, t in enumerate(union_terms)}

    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    aggs = [F.count(F.lit(1)).alias("dl")] + [
        F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"tf{i}")
        for i, t in enumerate(union_terms)
    ]
    # materialize ONCE: every query branch below reads this frame, not
    # the corpus — one token-scan shuffle total, regardless of |queries|
    per = toks.groupBy(id_col).agg(*aggs).localCheckpoint(eager=True)
    stat_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    ] + [
        F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
        for i in range(len(union_terms))
    ]
    stats = per.agg(*stat_aggs)
    wide = per.crossJoin(F.broadcast(stats))

    scored = None
    for qid, terms in queries.items():
        score = _bm25_contrib(idx[terms[0]])
        for t in terms[1:]:
            score = score + _bm25_contrib(idx[t])
        matched = None
        for t in terms:
            cond = F.col(f"tf{idx[t]}") > 0
            matched = cond if matched is None else (matched | cond)
        branch = wide.where(matched).select(
            F.lit(qid).alias("query_id"), F.col(id_col), score.alias("score")
        )
        scored = branch if scored is None else scored.unionAll(branch)

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def bm25_topk_multi_sql(
    queries: dict[str, list[str]],
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 10,
) -> str:
    """DuckDB oracle for :func:`bm25_topk_multi` — same union-term
    conditional-agg pass, same per-query fixed-order score chains, so
    every score is bit-equal."""
    union_terms: list[str] = []
    seen = set()
    for terms in queries.values():
        for t in terms:
            if t not in seen:
                seen.add(t)
                union_terms.append(t)
    idx = {t: i for i, t in enumerate(union_terms)}
    m = len(union_terms)
    tf_cols = ",\n               ".join(
        f"count(*) FILTER (token = '{t}') AS tf{i}" for i, t in enumerate(union_terms)
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

    branches = []
    for qid, terms in queries.items():
        score = " + ".join(contrib(idx[t]) for t in terms)
        matched = " OR ".join(f"tf{idx[t]} > 0" for t in terms)
        branches.append(
            f"SELECT '{qid}' AS query_id, {id_col}, {score} AS score "
            f"FROM wide WHERE {matched}"
        )
    union = "\n                  UNION ALL ".join(branches)
    return f"""WITH toks AS (SELECT {id_col},
                            unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
                     FROM {table}
                     WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       per AS (SELECT {id_col}, count(*) AS dl,
               {tf_cols}
               FROM toks GROUP BY {id_col}),
       stats AS (SELECT count(*) AS n_docs, SUM(dl) AS total_tokens,
              {df_cols}
              FROM per),
       wide AS (SELECT * FROM per CROSS JOIN
                (SELECT *, CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                 FROM stats) s),
       scored AS ({union})
       SELECT query_id, {id_col}, score, rank FROM (
         SELECT query_id, {id_col}, score,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, {id_col} ASC) AS INT) AS rank
         FROM scored) r
       WHERE rank <= {k}"""


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint: bool = True,
    until_delta: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank: `iters` synchronous iterations of
    rank(v) <- (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + D/N) with
    d = damping_num/damping_den and D the total rank mass sitting on
    DANGLING nodes (no out-edges) — redistributed uniformly, the
    standard web-graph treatment.  ALL arithmetic is scaled 64-bit
    integer (micro-units of `scale`), so the result is bit-identical on
    any engine and any partitioning:

        init      = scale div N
        contrib   = rank(u) div outdeg(u)
        D         = sum of rank over nodes with outdeg = 0
        rank'(v)  = ((scale div N) * (den-num)) div den
                    + (num * (sum(contrib) + D div N)) div den

    Floor-division remainders mean total mass decays slightly per round
    — deterministically, identically everywhere; the op ranks nodes, it
    does not promise a stochastic-matrix invariant.  The node set is
    src UNION dst: nodes with no in-edges stay in the output at the
    base term (+ dangling share) every round, and dangling nodes both
    keep receiving rank and donate theirs back through D.

    Returns (node, rank_scaled) for EVERY node of the graph.

    Scale shape: edges are repartitioned by src ONCE and PERSISTED —
    a cached plan keeps its outputPartitioning (a localCheckpoint does
    not under AQE: LogicalRDD comes back with unknown partitioning and
    every iteration would re-shuffle the edge list), so each round
    shuffles only the nodes-sized rank frame plus the map-side-combined
    contribution sum; the edge frame is scanned from cache already
    co-partitioned (asserted in tests).  At real 100 TB scale the same
    layout persists across jobs as a bucketed table.  The dangling mass
    is a 1-row aggregate broadcast into the update.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # bucket the big frame once; every iteration's src-join reuses this
    # partitioning straight out of the cache
    e = e.repartition(F.col("src")).persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        nodes.join(outdeg.withColumnRenamed("src", "node"), "node", "left")
        .select("node", F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("outdeg"))
        .repartition(F.col("node"))
        .persist()
    )
    n_nodes = deg.count()  # one tiny action; deg is nodes-sized
    if n_nodes == 0:
        # release the (empty) caches too — an early return must not
        # leak them for the session's lifetime
        out = deg.select(
            F.col("node"), F.lit(0).cast("long").alias("rank_scaled")
        )
        e.unpersist()
        deg.unpersist()
        return out
    init = scale // n_nodes
    base = (init * (damping_den - damping_num)) // damping_den
    ranks = deg.select(
        "node", F.lit(init).cast("long").alias("rank_scaled")
    )
    e_n = e.withColumnRenamed("src", "node")
    for _ in range(iters):
        prev = ranks
        ranks = _pagerank_iteration(
            ranks, deg, e_n, n_nodes, base, damping_num, damping_den
        )
        if checkpoint:
            # nodes-sized frame; without this the plan doubles per round
            ranks = ranks.localCheckpoint(eager=True)
        if until_delta is not None:
            # convergence mode: stop once no node moved more than
            # until_delta micro-units this round — one nodes-sized join
            # + 1-row max per round, integer-exact so the iteration
            # count (hence the result) is engine- and partition-
            # independent.  `iters` becomes the cap.
            moved = (
                ranks.join(
                    prev.select(
                        "node", F.col("rank_scaled").alias("__prev")
                    ),
                    "node",
                )
                .agg(
                    F.max(
                        F.abs(F.col("rank_scaled") - F.col("__prev"))
                    ).alias("d")
                )
                .first()["d"]
            )
            if moved is not None and moved <= until_delta:
                break
    # release the cached edge/degree frames UNCONDITIONALLY instead of
    # leaking them for the session's lifetime.  With checkpoint=True the
    # result is already materialized; with checkpoint=False the returned
    # lazy frame recomputes from source on each action — every step is
    # scaled-integer and partition-independent, so the values are
    # bit-identical either way (just slower, and that path exists only
    # for plan inspection).
    e.unpersist()
    deg.unpersist()
    return ranks


def _pagerank_iteration(
    ranks: DataFrame,
    deg: DataFrame,
    e_n: DataFrame,
    n_nodes: int,
    base: int,
    damping_num: int,
    damping_den: int,
) -> DataFrame:
    """One synchronous PageRank round (see :func:`pagerank`).  Exposed
    so tests can inspect a single iteration's executed plan: with
    checkpointed node-partitioned `ranks`/`deg` and src-partitioned
    `e_n`, the round introduces NO Exchange above the edge scan."""
    rd = ranks.join(deg, "node")
    dsum = rd.where(F.col("outdeg") == 0).agg(
        F.coalesce(F.sum("rank_scaled"), F.lit(0)).cast("long").alias("dsum")
    )
    contribs = (
        rd.where(F.col("outdeg") > 0)
        .join(e_n, "node")
        .select(
            F.col("dst").alias("node"),
            F.expr("rank_scaled div outdeg").cast("long").alias("c"),
        )
    )
    sums = contribs.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
    return (
        deg.select("node")
        .join(sums, "node", "left")
        .crossJoin(F.broadcast(dsum))
        .select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * (coalesce(s, 0L)"
                    f" + (dsum div {n_nodes}))) div {damping_den}"
                )
            )
            .cast("long")
            .alias("rank_scaled"),
        )
    )


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
    # every multiply-referenced CTE is MATERIALIZED: the per-round state
    # it{i-1} feeds BOTH the contribution sum and the dangling sum, and
    # a CTE-inlining engine would otherwise re-evaluate the whole chain
    # per reference — 2^iters blow-up measured as an 80 GB DuckDB temp
    # spill at sf0.1 before this hint
    parts = [
        f"edges AS MATERIALIZED ({edges_cte})",
        "odeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "vnodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS MATERIALIZED (SELECT v.node, COALESCE(o.outdeg, 0) AS outdeg "
        "FROM vnodes v LEFT JOIN odeg o ON v.node = o.src)",
        "nn AS MATERIALIZED (SELECT count(*) AS n_nodes FROM deg)",
        f"it0 AS MATERIALIZED (SELECT node, {scale} // n_nodes AS rank_scaled "
        "FROM deg CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"dg{i} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank_scaled), 0) AS dsum "
            f"FROM it{i-1} p JOIN deg d ON p.node = d.node AND d.outdeg = 0)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS node, SUM(p.rank_scaled // d.outdeg) AS s "
            f"FROM it{i-1} p JOIN deg d ON p.node = d.node AND d.outdeg > 0 "
            f"JOIN edges e ON p.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"it{i} AS MATERIALIZED (SELECT d.node,"
            f" (({scale} // n_nodes) * {rest}) // {damping_den}"
            f" + ({damping_num} * (COALESCE(s.s, 0) + dg.dsum // n_nodes))"
            f" // {damping_den} AS rank_scaled "
            f"FROM deg d LEFT JOIN s{i} s ON d.node = s.node "
            f"CROSS JOIN nn CROSS JOIN dg{i} dg)"
        )
    parts.append(
        # DuckDB SUM over BIGINT widens to HUGEINT and the width sticks to
        # every downstream expression; cast back at the edge so consumers
        # honor the DOUBLE/BIGINT-at-the-boundary type policy (values are
        # exact either way — rank mass is bounded by `scale`).
        f"prfinal AS (SELECT node, CAST(rank_scaled AS BIGINT) AS rank_scaled "
        f"FROM it{iters})"
    )
    return ",\n       ".join(parts)


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PERSONALIZED PageRank: the teleport (and the dangling-mass
    donation) return to the SEED set instead of the whole graph — the
    seed-relevance score behind focused crawling and "pages like these"
    corpus expansion (BFS gives hop distance; PPR weights every path).

        init(v)   = [v∈S] · (scale div |S|)
        rank'(v)  = [v∈S]·((scale div |S|)·(den−num)) div den
                    + (num·(Σ_{u→v} rank(u) div outdeg(u)
                            + [v∈S]·(D div |S|))) div den

    ALL arithmetic scaled 64-bit integer (the :func:`pagerank`
    discipline) — bit-identical on any engine/partitioning.  Returns
    (node, rank_scaled) for every node; non-seed nodes unreachable
    from the seeds hold rank 0.

    Scale shape identical to :func:`pagerank`: edges src-partitioned
    and persisted once, per round one nodes-sized join + one map-side-
    combined contribution sum; the seed flag is a column of the cached
    degree frame, the dangling mass a 1-row broadcast."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    e = e.repartition(F.col("src")).persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col(node).cast("long").alias("node")).distinct()
    deg = (
        nodes.join(outdeg.withColumnRenamed("src", "node"), "node", "left")
        .join(sd.withColumn("__seed", F.lit(True)), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("outdeg"),
            F.coalesce(F.col("__seed"), F.lit(False)).alias("is_seed"),
        )
        .repartition(F.col("node"))
        .persist()
    )
    n_seeds = deg.where(F.col("is_seed")).count()
    if n_seeds == 0:
        out = deg.select("node", F.lit(0).cast("long").alias("rank_scaled"))
        e.unpersist()
        deg.unpersist()
        return out
    init = scale // n_seeds
    base = (init * (damping_den - damping_num)) // damping_den
    ranks = deg.select(
        "node",
        F.when(F.col("is_seed"), F.lit(init)).otherwise(F.lit(0))
        .cast("long")
        .alias("rank_scaled"),
    )
    e_n = e.withColumnRenamed("src", "node")
    for _ in range(iters):
        rd = ranks.join(deg, "node")
        dsum = rd.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank_scaled"), F.lit(0)).cast("long").alias("dsum")
        )
        contribs = (
            rd.where(F.col("outdeg") > 0)
            .join(e_n, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div outdeg").cast("long").alias("c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
        ranks = (
            deg.select("node", "is_seed")
            .join(sums, "node", "left")
            .crossJoin(F.broadcast(dsum))
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * (coalesce(s, 0L)"
                        f" + (CASE WHEN is_seed THEN dsum div {n_seeds}"
                        f" ELSE 0L END))) div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    deg.unpersist()
    return ranks


def ppr_sql_steps(
    edges_cte: str,
    seeds_cte: str,
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """CTE chain replaying :func:`pagerank_personalized` in DuckDB
    (unrolled, MATERIALIZED per-round state — the pagerank_sql_steps
    discipline).  `edges_cte` → (src, dst), `seeds_cte` → (node).
    Exposes `pprfinal(node, rank_scaled)`."""
    rest = damping_den - damping_num
    parts = [
        f"pedges AS MATERIALIZED ({edges_cte})",
        f"pseeds AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_cte}))",
        "podeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM pedges GROUP BY src)",
        "pvnodes AS MATERIALIZED (SELECT src AS node FROM pedges UNION SELECT dst FROM pedges)",
        "pdeg AS MATERIALIZED (SELECT v.node, COALESCE(o.outdeg, 0) AS outdeg, "
        "s.node IS NOT NULL AS is_seed "
        "FROM pvnodes v LEFT JOIN podeg o ON v.node = o.src "
        "LEFT JOIN pseeds s ON v.node = s.node)",
        "pns AS MATERIALIZED (SELECT count(*) AS n_seeds FROM pdeg WHERE is_seed)",
        f"pit0 AS MATERIALIZED (SELECT node, CASE WHEN is_seed "
        f"THEN {scale} // n_seeds ELSE 0 END AS rank_scaled "
        "FROM pdeg CROSS JOIN pns)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"pdg{i} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank_scaled), 0) AS dsum "
            f"FROM pit{i-1} p JOIN pdeg d ON p.node = d.node AND d.outdeg = 0)"
        )
        parts.append(
            f"ps{i} AS MATERIALIZED (SELECT e.dst AS node, SUM(p.rank_scaled // d.outdeg) AS s "
            f"FROM pit{i-1} p JOIN pdeg d ON p.node = d.node AND d.outdeg > 0 "
            f"JOIN pedges e ON p.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"pit{i} AS MATERIALIZED (SELECT d.node,"
            f" (CASE WHEN d.is_seed THEN (({scale} // n_seeds) * {rest}) // {damping_den}"
            f" ELSE 0 END)"
            f" + ({damping_num} * (COALESCE(s.s, 0)"
            f" + (CASE WHEN d.is_seed THEN dg.dsum // n_seeds ELSE 0 END)))"
            f" // {damping_den} AS rank_scaled "
            f"FROM pdeg d LEFT JOIN ps{i} s ON d.node = s.node "
            f"CROSS JOIN pns CROSS JOIN pdg{i} dg)"
        )
    parts.append(
        f"pprfinal AS (SELECT node, CAST(rank_scaled AS BIGINT) AS rank_scaled "
        f"FROM pit{iters})"
    )
    return ",\n       ".join(parts)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-retrieval combiner: score(d) = Σ over ranked lists
    of 1/(c + rank_d(list)), lists where d is absent contributing 0.
    Rank-based, so BM25 scores and cosine similarities fuse without
    any calibration — exactly why RRF is the default hybrid in
    production search stacks.

    Exactness contract (the repo's rational-form discipline): the sum
    is a FIXED-ORDER expression over the lists as given — coalesce(1/
    (c+r1),0) + coalesce(1/(c+r2),0) + … — so any engine reproduces
    the fused doubles bit-for-bit.  Shape: len(rankings)−1 id-keyed
    outer joins of k-row frames (broadcast-sized), one rank window."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col(rank_col).alias(f"__r{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        out.select(id_col, score.alias("rrf_score"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def maxsim_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    doc_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    pos_col: str = "tok_pos",
    vec_col: str = "vec",
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020,
    arXiv:2004.12832): documents and queries are BAGS of token vectors,
    and score(q, d) = Σ over q's tokens of max over d's tokens of
    cosine similarity — the MaxSim operator.  Late interaction is the
    production middle ground between single-vector ANN (cheap, lossy)
    and cross-encoders (accurate, O(pairs) inference): token-level
    matching with embedding-only infrastructure.

    Exactness contract: token vectors are unit-normalized with the
    package's fixed fold, each (query token, doc token) cosine is one
    zip_with/aggregate chain, the per-(query, doc, query-token) MAX is
    arithmetic-free, and the final per-document sum folds the maxes in
    QUERY-TOKEN ORDER (array_sort on tok_pos, then a left fold seeded
    with 0.0) — never an engine-ordered float aggregate — so any engine
    reproduces the score doubles bit-for-bit.

    Scale shape (100 TB of token embeddings): the query token set is
    tiny (|Q| queries × ~32 tokens) and BROADCAST; the corpus token
    table is scanned ONCE; the two aggregations are keyed by
    (query, doc[, qpos]) — bounded by |Q|·docs, never doc×doc; the
    rank is a per-query window over |Q|·docs rows.  At real corpus
    sizes compose with the IVF index exactly like ColBERT's own
    two-stage design: `ivf_index_query` over the token vectors yields
    candidate doc ids, and this operator reranks only the candidates'
    tokens.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .similarity import _dot, with_unit_vector

    d = with_unit_vector(doc_tokens, vec_col, "du").select(
        F.col(doc_id_col).alias("doc_id"), F.col(pos_col).alias("dpos"), "du"
    )
    q = with_unit_vector(query_tokens, vec_col, "qu").select(
        F.col(query_id_col).alias("query_id"), F.col(pos_col).alias("qpos"), "qu"
    )
    sim = d.crossJoin(F.broadcast(q)).select(
        "query_id", "qpos", "doc_id", _dot(F.col("qu"), F.col("du")).alias("cos")
    )
    mx = sim.groupBy("query_id", "qpos", "doc_id").agg(F.max("cos").alias("m"))
    sc = mx.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("qpos", "m"))),
                lambda s: s["m"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )


def phrase_match_counts(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    words_col: str = "words",
) -> DataFrame:
    """EXACT PHRASE matching via a positional posting list — the
    retrieval op behind phrase-level decontamination ("which corpus
    documents contain this benchmark sentence verbatim?") and phrase
    queries generally.  ``phrases`` is (phrase_id, words array);
    returns (phrase_id, doc_id, n_matches) with one row per document
    CONTAINING the phrase, n_matches = number of starting positions.

    Shape: the corpus explodes ONCE into positional postings
    (doc, pos, token); the phrase set explodes into (phrase, offset,
    word) — tiny, broadcast; a token=word equi-join anchors every
    candidate (phrase, doc, pos-offset) start, and a start is a match
    iff ALL of the phrase's offsets anchored there: COUNT(DISTINCT
    offset) == phrase length after one (phrase, doc, start)-keyed
    aggregation.  No self-join of the posting list, no per-phrase
    corpus scan — the entire phrase set resolves in one pass, the
    batch-BM25 discipline.

    Stop-word-heavy phrases make the anchor join skewed on hot tokens
    (the classic positional-index caveat); AQE's skew join handles it,
    or pre-filter anchors to the phrase's RAREST word before the
    aggregation when |phrases| is large."""
    from .text import tokens

    tp = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    pw = phrases.select(
        F.col(phrase_id_col),
        F.posexplode(F.col(words_col)).alias("i", "word"),
    )
    plen = phrases.select(
        F.col(phrase_id_col), F.size(words_col).alias("__k")
    )
    anchored = tp.join(F.broadcast(pw), tp["tok"] == pw["word"]).select(
        phrase_id_col, id_col, (F.col("pos") - F.col("i")).alias("start"), "i"
    ).filter(F.col("start") >= 0)
    starts = (
        anchored.groupBy(phrase_id_col, id_col, "start")
        .agg(F.count_distinct("i").alias("__hit"))
        .join(F.broadcast(plen), phrase_id_col)
        .filter(F.col("__hit") == F.col("__k"))
    )
    return starts.groupBy(phrase_id_col, id_col).agg(
        F.count(F.lit(1)).alias("n_matches")
    )


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query RETRIEVAL EVALUATION — reciprocal rank and recall@k,
    the regression gate every retrieval stack needs next to the
    retrievers themselves.  ``run`` = (query, doc, rank) from
    bm25_topk_multi / ANN top-k; ``qrels`` = (query, doc) relevance
    judgments.

    Per query: n_rel = |judged docs|, first_rel_rank = rank of the
    first relevant retrieved doc (NULL if none), rr = 1/first_rel_rank,
    recall_at_k = |relevant ∩ top-k| / n_rel.  Both metrics are ONE
    integer division — engine-exact; queries with judgments but an
    empty run still appear (rr NULL, recall 0).  nDCG is deliberately
    absent: its log2 discount is libm-bound (the lm-module contract
    applies — tolerance-tested, not oracle-hashed).

    Scale shape: qrels join the run on (query, doc) — both key-
    partitioned; two query-keyed aggregations; output = one row per
    judged query."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d, r = query_col, doc_col, rank_col
    judged = qrels.groupBy(q).agg(F.count(F.lit(1)).alias("n_rel"))
    hits = run.join(qrels.select(q, d).distinct(), [q, d])
    per = hits.groupBy(q).agg(
        F.min(r).alias("first_rel_rank"),
        F.sum(F.when(F.col(r) <= k, 1).otherwise(0)).alias("__hits_k"),
    )
    return (
        judged.join(per, q, "left")
        .select(
            q,
            F.col("n_rel").cast("long").alias("n_rel"),
            F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
            (F.lit(1.0) / F.col("first_rel_rank").cast("double")).alias("rr"),
            (
                F.coalesce(F.col("__hits_k"), F.lit(0)).cast("double")
                / F.col("n_rel").cast("double")
            ).alias("recall_at_k"),
        )
    )
