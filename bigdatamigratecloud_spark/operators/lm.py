"""Conditional n-gram language-model training and scoring — the
CCNet-style perplexity quality filter (north-star N4, SURVEY §2.12).

CCNet filters web text by perplexity under a KenLM n-gram model; the
same signal here is a corpus-trained add-k-smoothed bigram model,
expressed entirely as DataFrame ops so it trains in ONE shuffle and
scores with two key-partitioned joins — no model file on the driver,
no UDF, no collect.  The model IS a DataFrame: ``(w1, w2, c)`` bigram
counts, so a 100 TB corpus with billions of distinct bigrams stays
distributed end-to-end (contrast a broadcast KenLM binary, which caps
the vocabulary at executor memory).

Numeric contract (see ``bigram_rarity``'s rational-form note): every
oracle-checked output is built from integer counts and IEEE divisions
folded in EXPLICIT position order (``array_sort`` + ``aggregate``), so
any engine reproduces ``mean_prob`` bit-exactly.  ``cross_entropy`` /
``perplexity`` need libm ``ln``/``exp`` whose last-ulp behavior is
engine-specific — they are for users and are pinned in tests with a
1e-9 relative tolerance instead of the exact oracle hash.

Generalizes the reference's per-field validation scoring (Codeunit
60000:826-862 scores cells one at a time) to corpus-conditional
sequence scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sentinel context for the first token of a document.  Lowercased
#: corpus tokens can still collide with it if a document literally
#: contains "<s>"; acceptable for a quality signal (CCNet's KenLM has
#: the same property).
BOS = "<s>"


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, w1, w2) bigram positions over lowercased whitespace
    tokens with a BOS sentinel context, so every non-blank document —
    including single-token ones — yields >= 1 bigram.  Linear per row:
    two slices zipped, never an index-lambda re-evaluating the
    tokenizer per element (see ``zip_shingles``)."""
    from .text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    arr = F.concat(F.array(F.lit(BOS)), toks)
    m = F.size(arr) - 1
    pairs = F.zip_with(
        F.slice(arr, 1, m),
        F.slice(arr, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.col(id_col), F.posexplode(pairs).alias("pos", "bg"))
        .select(id_col, "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the model: bigram counts ``(w1, w2, c)`` over the corpus.
    One explode + one groupBy shuffle (map-side partial counts); the
    result is the model artifact — persist it with plain
    ``.write.parquet`` to reuse across scoring runs."""
    return _doc_bigrams(df, text_col, id_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )


def lm_vocab_size(lm: DataFrame) -> int:
    """V for add-k smoothing: distinct predicted tokens in the model
    (BOS never appears as w2, so it doesn't count).  One small job;
    cache the scalar alongside the persisted model."""
    return lm.select("w2").distinct().count()


def score_bigram_lm(
    df: DataFrame,
    lm: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document under the model with add-k smoothing:

        P(w2 | w1) = (c(w1,w2) + k) / (c(w1,·) + k·V)

    Unseen bigrams fall back to c = 0; unseen contexts to c(w1,·) = 0
    (so a fully-novel context scores k/(k·V) = 1/V at k=1 — the uniform
    prior).  Output per document:

    - ``n_bigrams``  — tokens scored (= token count, thanks to BOS)
    - ``mean_prob``  — arithmetic mean of P, folded in position order:
      bit-exact across engines (the oracle-checked column)
    - ``cross_entropy`` — -(1/n) Σ ln P   (libm; tolerance-pinned)
    - ``perplexity``    — exp(cross_entropy)

    Blank documents surface with n_bigrams = 0 and NULL scores.

    Scale shape: one (w1,w2)-keyed join against the distributed model,
    one w1-keyed join for context totals, one doc-id aggregation whose
    state is bounded by document length.  Stop-word contexts ("the",
    "of") are the classic skew keys — AQE skew-join handles them, or
    pre-salt the context join if a single context exceeds a partition.
    """
    bg = _doc_bigrams(df, text_col, id_col)
    ctx = lm.groupBy("w1").agg(F.sum("c").alias("c_ctx"))
    p = (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(float(k))) / (
        F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double")
        + F.lit(float(k)) * F.lit(float(vocab_size))
    )
    scored = (
        bg.join(lm, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .select(id_col, "pos", p.alias("p"))
    )
    ps = F.array_sort(F.collect_list(F.struct("pos", "p")))
    per = scored.groupBy(id_col).agg(ps.alias("__ps"))
    n = F.size("__ps")
    sum_p = F.aggregate("__ps", F.lit(0.0), lambda acc, x: acc + x["p"])
    sum_ln = F.aggregate("__ps", F.lit(0.0), lambda acc, x: acc + F.log(x["p"]))
    h = -sum_ln / n.cast("double")
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(n, F.lit(0)).alias("n_bigrams"),
            (sum_p / n.cast("double")).alias("mean_prob"),
            h.alias("cross_entropy"),
            F.exp(h).alias("perplexity"),
        )
    )


def score_kneser_ney(
    df: DataFrame,
    lm: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated KNESER-NEY bigram scoring (Kneser & Ney 1995; the
    Chen & Goodman 1999 interpolated form — the smoothing KenLM
    defaults to, i.e. the model family CCNet's production filter
    actually runs).  Where add-k backs off to a uniform prior,
    Kneser-Ney backs off to the CONTINUATION probability — how many
    distinct contexts a word follows — which is what separates
    versatile words from frequent-but-bound ones ("francisco" is
    frequent but predicts almost nothing new):

        P(w2|w1) = (c(w1,w2) - d) / c(w1,·)
                   + (d · N1+(w1,·) / c(w1,·)) · Pcont(w2)
        Pcont(w2) = N1+(·,w2) / N1+(·,·)

    with d the absolute discount.  Unseen bigram: the first term is 0.
    Unseen CONTEXT w1: full backoff, P = Pcont(w2).  A w2 the model
    never saw anywhere has Pcont = 0 and scores 0 — the rational
    ``mean_prob`` stays well-defined (log-space columns would be -inf,
    so this scorer emits none; use ``score_bigram_lm`` for perplexity).

    Exactness: every component is an integer count, the per-position
    probability is ONE fixed IEEE chain, and the per-document sum
    folds in position order — bit-replayable (the n4_kn_lm_score
    oracle).  Scale shape matches ``score_bigram_lm``: the model and
    its three marginal frames stay DISTRIBUTED (billion-bigram safe);
    one (w1,w2) join, one w1 join, one w2 join, a 1-row type-count
    broadcast, one doc-bounded aggregation."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    d = F.lit(float(discount))
    bg = _doc_bigrams(df, text_col, id_col)
    ctx = lm.groupBy("w1").agg(
        F.sum("c").alias("c_ctx"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = lm.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    tt = lm.agg(F.count(F.lit(1)).alias("tt"))
    pcont = F.coalesce(F.col("n_prec"), F.lit(0)).cast("double") / F.col("tt").cast(
        "double"
    )
    seen_ctx = (
        F.when(F.col("c").isNull(), F.lit(0.0)).otherwise(
            (F.col("c").cast("double") - d) / F.col("c_ctx").cast("double")
        )
        + ((d * F.col("n_follow").cast("double")) / F.col("c_ctx").cast("double"))
        * pcont
    )
    p = F.when(F.col("c_ctx").isNull(), pcont).otherwise(seen_ctx)
    scored = (
        bg.join(lm, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tt))
        .select(id_col, "pos", p.alias("p"))
    )
    ps = F.array_sort(F.collect_list(F.struct("pos", "p")))
    per = scored.groupBy(id_col).agg(ps.alias("__ps"))
    n = F.size("__ps")
    sum_p = F.aggregate("__ps", F.lit(0.0), lambda acc, x: acc + x["p"])
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(n, F.lit(0)).alias("n_bigrams"),
            (sum_p / n.cast("double")).alias("mean_prob"),
        )
    )


def naive_bayes_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: int = 1,
    scale: int = 10_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Multinomial Naive Bayes trainer over labeled documents — the
    classic supervised text classifier (language ID, topic/quality
    routing) trained IN-ENGINE from a labeled corpus.

    Counting is fully distributed (one token shuffle for the
    (label, token) counts).  The cost table itself is computed on the
    DRIVER — it is model-bounded (|labels| × vocab), the same explicit
    budget discipline as ``bpe_train``'s local path — as SCALED-INTEGER
    log costs (the ``unigram`` discipline):

        cost(t | L)  = floor(-ln((c_tL + α) / (total_L + α·V)) · scale)
        unk(L)       = floor(-ln(α / (total_L + α·V)) · scale)
        prior(L)     = floor(-ln(n_L / n_docs) · scale)

    Driver ``math.log`` is the same libm DuckDB's ``ln`` calls, so the
    oracle replays every cost integer exactly; everything downstream of
    the floor is order-independent integer arithmetic.

    Returns ``(model, stats)``: model = (label, token, cost);
    stats = (label, prior_cost, unk_cost).  Blank documents carry no
    tokens and contribute nothing."""
    import math

    if alpha < 1:
        raise ValueError(f"alpha must be >= 1, got {alpha}")
    from .text import tokens as _tokens

    toks = docs.select(
        F.col(label_col).alias("label"), F.explode(_tokens(text_col)).alias("token")
    )
    counts = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("cnt"))
    v = counts.select("token").distinct().count()
    rows = counts.collect()  # model-bounded: |labels| x vocab
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["label"]] = totals.get(r["label"], 0) + r["cnt"]
    doc_counts = {
        r["label"]: r["n"]
        for r in docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_docs = sum(doc_counts.values())
    model_rows = [
        (
            r["label"],
            r["token"],
            int(math.floor(-math.log((r["cnt"] + alpha) / (totals[r["label"]] + alpha * v)) * scale)),
        )
        for r in rows
    ]
    stats_rows = [
        (
            lab,
            int(math.floor(-math.log(doc_counts[lab] / n_docs) * scale)),
            int(math.floor(-math.log(alpha / (tot + alpha * v)) * scale)),
        )
        for lab, tot in sorted(totals.items())
    ]
    spark = docs.sparkSession
    model = spark.createDataFrame(model_rows, "label string, token string, cost long")
    stats = spark.createDataFrame(
        stats_rows, "label string, prior_cost long, unk_cost long"
    )
    return model, stats


def naive_bayes_classify(
    docs: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify documents under a :func:`naive_bayes_train` model:
    per (doc, label) total cost = prior + Σ_tokens tf · cost(t|L)
    (unseen tokens pay the label's unk cost), prediction = the
    MIN-cost label, ties to the smallest label.  Returns
    (id, pred_label, cost).

    Scale shape: one token shuffle for per-doc tf, a |labels|-way
    broadcast cross (5-10 labels — the corpus frame grows by that
    constant, the batch-BM25 discipline), one broadcast join against
    the (label, token) model, one (doc, label) sum with map-side
    partials, one per-doc rank window bounded by |labels|.  All
    integer arithmetic — order-independent, engine-exact."""
    from pyspark.sql import Window

    per = naive_bayes_scores(docs, model, stats, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(F.col("cost").asc(), F.col("label").asc())
    return (
        per.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "cost")
    )


def naive_bayes_scores(
    docs: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The per-(doc, label) integer cost frame behind
    :func:`naive_bayes_classify` — exposed so margin/confidence views
    share one scoring pass.  Returns (id, label, cost)."""
    from .text import tokens as _tokens

    dtok = (
        docs.select(F.col(id_col).alias("__id"), F.explode(_tokens(text_col)).alias("token"))
        .groupBy("__id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    lab = dtok.crossJoin(F.broadcast(stats))
    seen = lab.join(F.broadcast(model), ["label", "token"], "left")
    return seen.groupBy("__id", "label", "prior_cost").agg(
        F.sum(F.col("tf") * F.coalesce(F.col("cost"), F.col("unk_cost"))).alias("__s")
    ).select(
        F.col("__id").alias(id_col),
        "label",
        (F.col("prior_cost") + F.col("__s")).cast("long").alias("cost"),
    )


def naive_bayes_margin(
    docs: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document CONFIDENCE view of the NB decision: the predicted
    label plus margin = runner-up cost − best cost (scaled-integer log
    units; bigger = more confident, 0 = tie).  The
    confidence-thresholded routing pattern: low-margin docs go to a
    heavier classifier or human review.  Single-label models emit NULL
    margin.  Same scale shape as classify plus one more bounded rank
    row per doc."""
    from pyspark.sql import Window

    per = naive_bayes_scores(docs, model, stats, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(F.col("cost").asc(), F.col("label").asc())
    ranked = per.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= 2)
    best = ranked.where(F.col("__rn") == 1).select(
        id_col, F.col("label").alias("pred_label"), F.col("cost").alias("cost")
    )
    second = ranked.where(F.col("__rn") == 2).select(
        id_col, F.col("cost").alias("__c2")
    )
    return best.join(second, id_col, "left").select(
        id_col,
        "pred_label",
        "cost",
        (F.col("__c2") - F.col("cost")).cast("long").alias("margin"),
    )
