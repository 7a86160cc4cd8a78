"""Text-analysis operators for LLM training-data pipelines (north-star N4,
SURVEY §2.12): tokenization, token/quality statistics, language-ID
heuristic, content hashing, rolling-hash document fingerprinting.

All hot-path expressions are JVM-side Catalyst (split / higher-order array
functions / sha2) — no Python UDFs — so they whole-stage-codegen and scale
linearly with executors.  The only driver-side artifacts are the small
stopword lexicons (broadcast as literals inside the plan).

Generalizes the reference's per-cell text handling (value formatting and
validation over Text[250] staging cells, Codeunit 60000:826-862, 774-785)
to corpus-level statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parallelism import spread_for_cpu

# Tiny per-language function-word lexicons for the heuristic classifier.
# Deterministic and public-knowledge word lists.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization: collapse runs of whitespace, trim, split.
    Produces an empty array (not ['']) for empty/blank text."""
    if isinstance(text, str):
        text = F.col(text)
    norm = F.trim(F.regexp_replace(text, r"\s+", sep))
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, sep if sep != " " else r" ")
    )


def zip_shingles(toks: Column, n: int, sep: str = " ") -> Column:
    """n-token shingles built by zipping n shifted slices of the token
    array.  Crucially LINEAR even when `toks` is an inlined expression:
    every slice is a lambda ARGUMENT (evaluated once per row), unlike the
    index-lambda formulation ``transform(sequence(...), i -> slice(toks,
    i+1, n))`` whose body re-evaluates `toks` once PER ELEMENT — O(rowlen²)
    per row the moment the optimizer substitutes the tokenizer expression
    into a pushed-down predicate or collapsed projection."""
    m = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        nxt = F.slice(toks, 1 + j, m)
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat(a, F.lit(sep), b))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(acc)


def bpe_ish_tokens(text: Column | str) -> Column:
    """A BPE-style pre-tokenization: split on word/number/punct boundaries
    (the GPT-2 pre-tokenizer regex family, simplified to what Spark's
    Java-regex supports).  Counts approximate LLM token counts ~1.3-1.5×."""
    if isinstance(text, str):
        text = F.col(text)
    # mark each token start with a \x01 sentinel, split on it, trim
    marked = F.regexp_replace(text, r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+)", "\u0001$1")
    parts = F.transform(F.split(marked, "\u0001"), lambda t: F.trim(t))
    return F.filter(parts, lambda t: F.length(t) > 0)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: counts, uniqueness, mean token
    length, stopword ratio — the building blocks of quality filters."""
    df = with_tokens(df, text_col)
    toks = F.col("__toks")
    stop = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n = F.size(toks)
    out = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        # ratio math in IEEE doubles, emitted AS doubles: int/int double
        # division is bit-identical across engines, whereas a final DECIMAL
        # cast renders differently per engine's canonicalization (verified
        # driver hash mismatch in round 1 despite row-identical values)
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            .cast("double")
            / n.cast("double")
        )
        .alias("avg_token_len"),
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
            / n.cast("double")
        )
        .alias("stopword_ratio"),
    )
    return out


def quality_col(text_col: str = "text", toks: Column | None = None) -> Column:
    """Column form of the composite quality score (see quality_score) —
    usable inside a single multi-signal projection so composed pipelines
    pay ONE corpus scan instead of one per signal.

    Pass `toks` as a MATERIALIZED column attribute when composing: a raw
    ``tokens(text)`` expression embedded here is re-evaluated at every
    reference (and, inside higher-order lambdas, once PER ELEMENT — the
    tokenizer regex runs O(n_tokens) times per row, measured 10×+ on the
    corpus signals).  The DataFrame wrappers below do this hoisting."""
    toks = tokens(text_col) if toks is None else toks
    stop = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
    # all-double expression tree, emitted as DOUBLE (identical IEEE result
    # in any engine; DECIMAL rendering is what diverges cross-engine)
    len_term = F.least(n, F.lit(100.0)) / F.lit(100.0)
    uniq_term = n_uniq / n
    stop_term = F.least(n_stop / n * F.lit(5.0), F.lit(1.0))
    score = (
        len_term * F.lit(4.0) + uniq_term * F.lit(4.0) + stop_term * F.lit(2.0)
    ) / F.lit(10.0)
    return F.when(F.size(toks) == 0, F.lit(None).cast("double")).otherwise(score)


def with_tokens(
    df: DataFrame, text_col: str = "text", out: str = "__toks"
) -> DataFrame:
    """Materialize the token array as a column attribute in its own
    projection.  Downstream signal expressions then reference a cheap
    attribute instead of inlining the tokenizer; Catalyst's
    CollapseProject keeps the boundary because the expression is
    non-cheap and multiply-referenced."""
    return spread_for_cpu(df).withColumn(out, tokens(text_col))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: rewards mid-length docs, lexical
    diversity, and a natural stopword rate.  Deterministic decimal math so
    scores are reproducible across engines."""
    base = with_tokens(df, text_col)
    return base.select(
        F.col(id_col), quality_col(text_col, F.col("__toks")).alias("quality")
    )


def _lang_best(text_col: str, toks: Column | None = None) -> Column:
    toks = tokens(text_col) if toks is None else toks
    hit_cols = []
    for code in sorted(LANG_STOPWORDS):
        lex = F.array(*[F.lit(w) for w in LANG_STOPWORDS[code]])
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(lex, t))).alias("hits"),
                F.lit(code).alias("code"),
            )
        )
    # argmax: sort (hits desc, code asc) -> first.  array_sort on structs
    # sorts ascending by field order, so negate hits.
    ranked = F.sort_array(
        F.array(*[F.struct((-c["hits"]).alias("neg"), c["code"].alias("code"), c["hits"].alias("hits")) for c in hit_cols])
    )
    return ranked.getItem(0)


def detected_lang_col(text_col: str = "text", toks: Column | None = None) -> Column:
    """Column form of the language-ID argmax (see lang_id)."""
    best = _lang_best(text_col, toks)
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["code"])


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: per-language function-word hit counts over
    the token array, argmax with deterministic tiebreak (language code
    order); 'und' (undetermined) when no lexicon hits at all."""
    base = with_tokens(df, text_col)
    # materialize the argmax struct ONCE and derive both outputs from it
    # (building the _lang_best tree per output column duplicates all five
    # lexicon filter scans in one projection)
    best = base.withColumn("__best", _lang_best(text_col, F.col("__toks")))
    return best.select(
        F.col(id_col),
        F.when(F.col("__best")["hits"] <= 0, F.lit("und"))
        .otherwise(F.col("__best")["code"])
        .alias("detected_lang"),
        F.col("__best")["hits"].alias("lang_hits"),
    )


def content_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SHA-256 content fingerprint (exact-dup key, north-star N1)."""
    return df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("fingerprint"))


def rolling_hash_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    keep: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every k-token shingle,
    keep the `keep` smallest hashes as the doc's fingerprint set.  Robust
    to local edits (unlike sha2 of the whole doc).

    JVM-side: shingles via transform over an index sequence; hash =
    xxhash64 of the shingle string (or the engine-portable md5-prefix
    hash when `portable`, so an external oracle can recompute the exact
    sets); min-k via sort+slice.
    """
    df = with_tokens(df, text_col)
    toks = F.col("__toks")
    shingles = zip_shingles(toks, k)
    if portable:
        from .dedup import portable_hash60

        hashes = F.transform(shingles, portable_hash60)
    else:
        hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    fp = F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
    return df.select(F.col(id_col), fp.alias("fingerprint_set"))


# PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically: character classes, bounded repetition, no
# backrefs/lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Training-data PII redaction: emails and phone-shaped numbers are
    replaced with typed placeholders, and the redaction counts are kept
    per document (audit trail).  All-JVM regexp — narrow, zero shuffles,
    scales like the scan."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(f"({PII_EMAIL_RE})"), 1))
    scrubbed1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_phone = F.size(F.regexp_extract_all(scrubbed1, F.lit(f"({PII_PHONE_RE})"), 1))
    scrubbed2 = F.regexp_replace(scrubbed1, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        scrubbed2.alias("scrubbed_text"),
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
    )


def _grams(text_col: str, n: int, toks: Column | None = None) -> Column:
    toks = tokens(text_col) if toks is None else toks
    return zip_shingles(toks, n, sep="\x1f")


def repetition_col(text_col: str = "text", n: int = 2, toks: Column | None = None) -> Column:
    """Column form of the repetition fraction (see repetition_ratio)."""
    grams = _grams(text_col, n, toks)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return (
        F.when(total == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0) - distinct.cast("double") / total.cast("double"))
    )


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of n-gram occurrences
    that are repeats of an earlier n-gram, 1 - distinct/total.  High
    values flag boilerplate/spam for corpus filtering.  NULL for
    documents with no n-grams."""
    base = with_tokens(df, text_col)
    grams = _grams(text_col, n, F.col("__toks"))
    return base.select(
        F.col(id_col),
        F.size(grams).cast("int").alias("n_grams"),
        repetition_col(text_col, n, F.col("__toks")).alias("repetition"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    training-sample chunking step (context-window packing).  Pure Catalyst:
    tokens -> stride sequence -> transform -> posexplode; a narrow
    operation (zero shuffles), so at 100 TB it scales like the scan.

    Output: (id, chunk_idx, chunk_text, n_tokens).  The final window may
    be shorter; empty documents yield no chunks.  A trailing start whose
    window would add NO new tokens (start >= n - overlap, i.e. the
    previous window already reached the document end) is dropped — it
    would re-emit a pure suffix of the previous chunk, over-weighting
    that text in the training mixture."""
    if not (0 <= overlap < window):
        raise ValueError("need 0 <= overlap < window")
    step = window - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.filter(
            F.sequence(F.lit(0), n - 1, F.lit(step)),
            lambda st: (st == 0) | (st < n - F.lit(overlap)),
        )
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s + 1, window)).alias("txt"),
            F.least(F.lit(window), n - s).alias("n"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.txt").alias("chunk_text"),
            F.col("c.n").cast("int").alias("n_tokens"),
        )
    )


def bigram_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
) -> DataFrame:
    """Corpus-LM quality proxy (CCNet-style filtering, rational form):
    train a bigram frequency model on the corpus itself, then score each
    document by (a) the fraction of its bigrams that are corpus-rare
    (freq <= ``rare_max_count``) and (b) its mean corpus bigram
    frequency.  High rare-fraction ~ high perplexity under the corpus LM
    — the same signal CCNet thresholds — but kept as integer-derived
    IEEE divisions so any engine reproduces it bit-exactly (a log-space
    perplexity is libm-dependent; see n5_tfidf's rational-idf note).

    Scale shape: one shuffle to count bigrams (map-side partials), one
    bigram-key shuffle join scoring docs against the model (the model
    stays distributed — never collected or broadcast, so a 100 TB corpus
    with billions of distinct bigrams works), one doc-id aggregation.
    Docs with < 2 tokens surface with n_bigrams = 0 and NULL scores."""
    big = df.select(
        F.col(id_col), F.explode(zip_shingles(tokens(text_col), 2)).alias("bigram")
    )
    model = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("freq"))
    per_doc = (
        big.join(model, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(F.col("freq") <= rare_max_count, 1)).alias("__n_rare"),
            F.sum("freq").alias("__sum_freq"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (F.col("__n_rare").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "rare_frac"
            ),
            (F.col("__sum_freq").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "mean_bigram_freq"
            ),
        )
    )


def _rebuild_scrubbed(
    toks_df: DataFrame, covered: DataFrame, id_col: str
) -> DataFrame:
    """Shared tail of the span-scrub family: drop covered token
    positions, reassemble survivors in order, report removal counts.
    ``toks_df`` is (id, __toks); ``covered`` is (id, tpos)."""
    tok_pos = toks_df.select(id_col, F.posexplode("__toks").alias("tpos", "tok"))
    kept = tok_pos.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("scrubbed_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        toks_df.select(id_col, F.size("__toks").alias("__n_orig"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
            (F.col("__n_orig") - F.coalesce("__n_kept", F.lit(0)))
            .cast("int")
            .alias("n_tokens_removed"),
        )
    )


def corpus_span_dedup(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "first",
) -> DataFrame:
    """CROSS-DOCUMENT repeated-passage removal — the n-gram realization
    of Lee et al. 2022's exact-substring training-data dedup
    (arXiv:2107.06499), round-8 item #3: an n-token span whose rolling
    FINGERPRINT occurs in >= ``min_docs`` DISTINCT documents is
    corpus-duplicated; its covered tokens are trimmed from every
    occurrence except (with ``keep='first'``, the Lee-et-al semantic)
    the lexicographically-first (doc_id, position) occurrence, which
    survives as the canonical copy.  ``keep='none'`` drops every
    occurrence (aggressive boilerplate removal — the cross-document
    twin of :func:`hot_span_scrub`, which thresholds on total
    occurrence count rather than distinct documents).

    Scale shape (100 TB): the shuffle keys are 60-bit portable hashes
    of the spans, NOT the n-token strings themselves — fixed-width
    8-byte keys where hot_span_scrub shuffles ~50-byte span text; one
    fingerprint count (map-side partials + distinct-doc count), one
    fingerprint-key join back to occurrences (the hot set stays
    distributed — never broadcast), a per-fingerprint window for the
    canonical pick (bounded by occurrence count per fingerprint), a
    positional explode bounded by n per hit, one doc-id aggregation to
    rebuild.  Work is bounded by fingerprint-occurrence counts — never
    doc × doc (plan-asserted in tests).

    Deterministic and engine-portable end-to-end (md5-prefix hashes),
    so the DuckDB oracle replays the exact scrubbed text.  60-bit
    fingerprints can collide at extreme corpus sizes (~2^30 spans for a
    birthday collision); a collision conservatively removes a
    non-duplicated span — acceptable for curation, documented here."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    from pyspark.sql import Window

    from .dedup import portable_hash60

    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    spans = toks_df.select(
        id_col, F.posexplode(zip_shingles(F.col("__toks"), n)).alias("pos", "span")
    ).select(id_col, "pos", portable_hash60(F.col("span")).alias("fp"))
    hot = (
        spans.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("fp")
    )
    hits = spans.join(hot, "fp")
    if keep == "first":
        w = Window.partitionBy("fp").orderBy(F.col(id_col).asc(), F.col("pos").asc())
        hits = (
            hits.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
    covered = (
        hits.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("tpos"),
        )
        .distinct()
    )
    return _rebuild_scrubbed(toks_df, covered, id_col)


def hot_span_scrub(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-span removal — the n-gram approximation of exact-
    substring training-data dedup (Lee et al. 2022's ExactSubstr,
    arXiv:2107.06499): any n-token span occurring >= ``min_count`` times
    across the corpus is boilerplate/duplication; every token covered by
    such a span is dropped from every document, and the survivors are
    reassembled in order.

    Scale shape: one shingle count (map-side partials), one shingle-key
    shuffle join back to spans (the hot set stays distributed — with a
    low threshold it can be a large fraction of all spans, so no
    broadcast assumption), a positional explode bounded by n per hit,
    and one doc-id aggregation to rebuild text.  No step is driver-side
    and nothing is quadratic in document count."""
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    spans = toks_df.select(
        id_col, F.posexplode(zip_shingles(F.col("__toks"), n)).alias("pos", "span")
    )
    hot = (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("span")
    )
    covered = (
        spans.join(hot, "span")
        .select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("tpos"),
        )
        .distinct()
    )
    return _rebuild_scrubbed(toks_df, covered, id_col)


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
    min_count: int = 2,
    portable: bool = True,
) -> DataFrame:
    """EXACT-SUBSTRING dedup with a canonical survivor — the closest
    member of this family to Lee et al. 2022's ExactSubstr
    (arXiv:2107.06499): every ``min_len``-token window occurring >=
    ``min_count`` times in the corpus — INCLUDING repeats inside one
    document — is duplicated, and every occurrence except the
    lexicographically-first (id, position) one is cut.  Returns
    ``(id_col, text_col cleaned, n_tokens, n_removed)``.

    Family map (each axis differs in exactly one semantic):
    - :func:`hot_span_scrub` — occurrence threshold, removes EVERY
      occurrence (no canonical copy survives);
    - :func:`corpus_span_dedup` — DISTINCT-DOCUMENT threshold with a
      canonical survivor: within-doc repetition alone never triggers;
    - this — occurrence threshold WITH a canonical survivor: the
      paper's semantic, where a doc repeating its own boilerplate is
      deduplicated against itself too.

    Scale shape (100 TB): windows shuffle once by a 60-bit hash of the
    window text (fixed-width key; :func:`~..dedup.portable_hash60`
    when ``portable`` so DuckDB replays the marking bit-for-bit); ONE
    window spec yields both the occurrence count and the canonical
    rank; marked windows then merge into maximal covered intervals
    per document (gaps-and-islands over the doc partition) BEFORE
    touching tokens, so coverage never explodes ``min_len`` positions
    per hit — overlapping marked windows collapse to one interval and
    survivors fall out of a doc-keyed anti-join.  Not idempotent by
    design: cutting spans creates new adjacencies (the paper re-runs
    to fixpoint).  Pathological boilerplate (one window repeated 10^8
    times) skews the hash shuffle — raise ``min_len`` or pre-scrub
    with :func:`line_dedup`."""
    from pyspark.sql import Window as W

    from .dedup import portable_hash60

    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    tk = docs.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__tk"))
    n = F.size("__tk")
    gram = F.concat_ws(" ", F.slice(F.col("__tk"), F.col("__i"), L))
    ghash = portable_hash60(gram) if portable else F.xxhash64(gram)
    w = (
        tk.where(n >= L)
        .select(
            "__id",
            "__tk",
            F.explode(F.sequence(F.lit(1), n - L + 1)).alias("__i"),
        )
        .select("__id", "__i", ghash.alias("__gh"))
    )
    part = W.partitionBy("__gh")
    marked = (
        w.withColumn("__cnt", F.count(F.lit(1)).over(part))
        .withColumn("__rn", F.row_number().over(part.orderBy("__id", "__i")))
        .where((F.col("__cnt") >= min_count) & (F.col("__rn") > 1))
        .select("__id", F.col("__i").alias("__s"), (F.col("__i") + L - 1).alias("__e"))
    )
    seq = W.partitionBy("__id").orderBy("__s", "__e")
    spans = (
        marked.withColumn(
            "__pmax", F.max("__e").over(seq.rowsBetween(W.unboundedPreceding, -1))
        )
        .withColumn(
            "__brk",
            F.when(
                F.col("__pmax").isNull() | (F.col("__s") > F.col("__pmax") + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "__grp", F.sum("__brk").over(seq.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("__id", "__grp")
        .agg(F.min("__s").alias("__s"), F.max("__e").alias("__e"))
        .select("__id", "__s", "__e")
    )
    toks_pos = tk.select("__id", F.posexplode("__tk").alias("__p0", "__t"))
    kept = toks_pos.join(
        spans,
        (toks_pos["__id"] == spans["__id"])
        & (toks_pos["__p0"] + 1 >= spans["__s"])
        & (toks_pos["__p0"] + 1 <= spans["__e"]),
        "left_anti",
    )
    cleaned = kept.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p0", "__t"))),
                lambda x: x["__t"],
            ),
        ).alias("__clean")
    )
    removed = spans.groupBy("__id").agg(
        F.sum(F.col("__e") - F.col("__s") + 1).alias("__rm")
    )
    return (
        tk.select("__id", n.alias("n_tokens"))
        .join(cleaned, "__id", "left")
        .join(removed, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
            "n_tokens",
            F.coalesce(F.col("__rm"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def line_dedup(
    df: DataFrame,
    min_doc_freq: int = 2,
    min_line_chars: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "none",
) -> DataFrame:
    """LINE-level corpus dedup — the CCNet (Wenzek et al. 2020,
    arXiv:1911.00359) / RefinedWeb (Penedo et al. 2023) boilerplate
    filter: a line whose exact text occurs in >= ``min_doc_freq``
    DISTINCT documents (navigation bars, cookie banners, footers) is
    removed from every document; survivors are reassembled in original
    line order.  This is the per-LINE modality the n-gram passage
    dedup (:func:`corpus_span_dedup`) misses: boilerplate lines are
    short, exactly repeated, and aligned to '\\n' boundaries, so exact
    line identity is both cheaper and more precise than span
    fingerprinting for them.

    ``keep='none'`` (the CCNet semantic) drops every occurrence;
    ``keep='first'`` preserves the lexicographically-first
    (doc_id, position) occurrence as the canonical copy.  Lines shorter
    than ``min_line_chars`` (e.g. blank separators) are never counted
    and never removed — removing every empty line would destroy
    paragraph structure corpus-wide.

    Scale shape (100 TB): lines shuffle by a 60-bit portable hash of
    the line text — fixed-width 8-byte keys, never the line itself;
    one hash-keyed distinct-doc count (map-side partials), one
    hash-keyed join back (the hot set stays distributed — on a web
    corpus it is far too large to broadcast), a doc-keyed left-anti +
    rebuild aggregation.  Nothing is doc x doc and no step holds more
    than one document's lines in memory.  60-bit hashes can collide at
    ~2^30 distinct lines; a collision conservatively removes a
    non-duplicated line — acceptable for curation, documented here.

    Returns (id, scrubbed_text, n_lines_removed)."""
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    if min_doc_freq < 2:
        raise ValueError(f"min_doc_freq must be >= 2, got {min_doc_freq}")
    from .dedup import portable_hash60

    split = F.split(F.col(text_col), "\n", -1)
    lines = df.select(F.col(id_col), F.posexplode(split).alias("pos", "line"))
    countable = lines.filter(F.length("line") >= min_line_chars).select(
        id_col, "pos", portable_hash60(F.col("line")).alias("__h")
    )
    hot = (
        countable.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__ndocs"))
        .filter(F.col("__ndocs") >= min_doc_freq)
        .select("__h")
    )
    hits = countable.join(hot, "__h")
    if keep == "first":
        # canonical copy = lexicographically-first (id, pos) occurrence,
        # found with a MIN-STRUCT aggregation (map-side partials), never
        # a per-hash window: a footer in 100M documents would hand a
        # window 100M rows in one partition, while the min-struct state
        # is one struct per hash regardless of occurrence count
        canon = hits.groupBy("__h").agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
                "__c"
            )
        )
        hits = (
            hits.join(canon, "__h")
            .filter(
                ~(
                    (F.col(id_col) == F.col("__c.i"))
                    & (F.col("pos") == F.col("__c.p"))
                )
            )
            .drop("__c")
        )
    kept = lines.join(hits.select(id_col, "pos"), [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("scrubbed_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        df.select(F.col(id_col), F.size(split).alias("__n_lines"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
            (F.col("__n_lines") - F.coalesce("__n_kept", F.lit(0)))
            .cast("int")
            .alias("n_lines_removed"),
        )
    )


# -------------------------------------------------- quality classifier

def classifier_weights(n_buckets: int = 256, seed: int = 7) -> tuple[list[float], float]:
    """Deterministic fastText-style linear-model weights over hashed
    token features: ``n_buckets`` uniform(-1, 1) weights + a bias,
    rounded to 6 decimals so the SAME literals embed exactly in both the
    Spark plan and the DuckDB oracle (decimal→double parse is correctly
    rounded in both engines).  In production these are the trained
    model's weights, broadcast the same way."""
    import random

    rng = random.Random(seed)
    w = [round(rng.uniform(-1.0, 1.0), 6) for _ in range(n_buckets)]
    return w, round(rng.uniform(-0.2, 0.2), 6)


def quality_classifier(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear quality-classifier INFERENCE — the standard LLM-curation
    gate (fastText-style): hash each token into one of ``len(weights)``
    buckets (engine-portable md5-prefix hash), score = bias + mean of
    the bucket weights, keep when score > threshold.

    100 TB shape: completely NARROW — the weight vector is a plan
    literal evaluated inside one JVM ``aggregate`` fold per row (no
    Python UDF, no explode, no shuffle, no join); the model "broadcast"
    costs one array literal per task.  Blank documents score NULL and
    are never kept.  DuckDB replays the identical arithmetic (left-fold
    sum, then /n, then +bias), so the entry is value-exact."""
    from .dedup import portable_hash60

    n = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = tokens(text_col)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(warr, (portable_hash60(t) % n + 1).cast("int")),
    )
    score = F.when(
        F.size(toks) > 0, F.lit(float(bias)) + total / F.size(toks)
    )
    return df.select(
        id_col,
        score.alias("quality_margin"),
        F.coalesce(score > F.lit(float(threshold)), F.lit(False)).cast("int").alias(
            "is_quality"
        ),
    )


def quality_classifier_sql(
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.0,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`quality_classifier`: same literal weights,
    same md5-prefix bucket hash, same left-fold sum / mean / bias /
    threshold arithmetic."""
    n = len(weights)
    wlist = "[" + ", ".join(f"CAST({w!r} AS DOUBLE)" for w in weights) + "]"
    norm = f"trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))"
    return f"""
    WITH qc_toks AS (
      SELECT {id_col},
             string_split({norm}, ' ') AS toks
      FROM {docs_table}
    ), qc_scored AS (
      SELECT {id_col},
             CASE WHEN length({norm}) > 0 AND len(toks) > 0 THEN
               CAST({bias!r} AS DOUBLE) +
               list_reduce(
                 list_transform(toks, t ->
                   ({wlist})[CAST(('0x' || substr(md5(t), 1, 15))::BIGINT
                             % {n} AS INT) + 1]),
                 (a, b) -> a + b) / len(toks)
             END AS quality_margin
      FROM {docs_table} d JOIN qc_toks USING ({id_col})
    )
    SELECT {id_col}, quality_margin,
           CAST(COALESCE(quality_margin > CAST({threshold!r} AS DOUBLE), FALSE)
                AS INT) AS is_quality
    FROM qc_scored"""


# ------------------------------------------------------ HTML extraction

def html_to_text_col(html_col: Column | str) -> Column:
    """Plain text from HTML markup — the FIRST step of every web-corpus
    curation pipeline: drop <script>/<style> blocks (content included),
    strip all remaining tags and comments, decode the common entities
    (&amp; last, so '&amp;lt;' cannot double-decode), collapse
    whitespace.  One narrow chain of JVM regexp_replace calls — no UDF,
    no shuffle — using only syntax Java regex and DuckDB's RE2 share
    ((?is) flags, non-greedy .*?), so the oracle replays it verbatim."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, text, n_links, link_density) from an HTML
    column: extracted plain text plus the boilerplate signals a quality
    gate needs — anchor count and LINK DENSITY (fraction of extracted
    characters living inside <a> tags; navigation/boilerplate pages
    score high, prose scores low).  Entirely narrow (regexp chains +
    one regexp_extract_all), one pass over the corpus.  ``keep_cols``
    pass through untouched (url/status/timestamp in a crawl pipeline —
    keeps the op a single narrow select even under streaming, where a
    re-join would become a stateful stream-stream join)."""
    text = html_to_text_col(html_col)
    anchors = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1
    )
    anchor_text = F.array_join(
        F.transform(anchors, lambda a: html_to_text_col(a)), " "
    )
    n_links = F.size(anchors)
    return df.select(
        id_col,
        *keep_cols,
        text.alias("text"),
        n_links.cast("int").alias("n_links"),
        F.when(
            F.length(text) > 0,
            F.least(
                F.length(anchor_text).cast("double") / F.length(text),
                F.lit(1.0),
            ),
        ).otherwise(F.lit(0.0)).alias("link_density"),
    )


def text_embed_hashed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Feature-hashing TF-IDF document embeddings (the hashing trick,
    Weinberger et al. 2009) — round 8: turn raw TEXT into a fixed-dim
    vector column entirely in-engine, so the whole embedding toolchain
    downstream (cosine_topk, IVF/PQ indexes, SemDeDup, hard negatives)
    runs on corpora that never saw a neural encoder.  Each token lands
    in bucket ``h mod dim`` with sign ``(h div dim) mod 2`` (the
    unbiasedness trick), weighted by tf × Robertson rational idf
    ((N − df + 0.5)/(df + 0.5) — no libm, same monotone form as BM25;
    ubiquitous terms go negative, the standard BM25 property).

    Exactness: the portable md5-prefix hash, rational idf, and
    EXPLICIT-ORDER folds (per-bucket sums fold in token order, the
    dense vector assembles bucket-ascending) make the vectors
    bit-reproducible in any engine.  Shape: one tf shuffle, one
    token-keyed idf join, one (doc, bucket) aggregation, one doc
    aggregation — all map-side-combinable; N is the only driver
    scalar.  Docs with no tokens are omitted (an all-zero vector has
    no direction)."""
    from .dedup import portable_hash60

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = toks.select(id_col).distinct().count()
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    h = portable_hash60(F.col("tok"))
    idf = (
        F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    sign = F.when(
        F.expr(f"(__h div {int(dim)}) % 2") == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    wts = (
        tf.join(dfreq, "tok")
        .withColumn("__h", h)
        .select(
            id_col,
            "tok",
            (F.expr(f"__h % {int(dim)}")).cast("int").alias("__b"),
            (sign * (F.col("tf").cast("double") * idf)).alias("__w"),
        )
    )
    per_bucket = wts.groupBy(id_col, "__b").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "__w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__w"],
        ).alias("__val")
    )
    mp = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__val"))).alias("__m")
    )
    return mp.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(int(dim) - 1)),
            lambda b: F.coalesce(
                F.element_at(F.col("__m"), b.cast("int")), F.lit(0.0)
            ),
        ).alias(out_col),
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k COLLOCATIONS by pointwise mutual information — the
    classic phrase-mining signal (Church & Hanks 1990): bigrams whose
    joint frequency far exceeds what their parts predict ("los
    angeles", "machine learning") — used to build tokenizer seed
    phrases and domain lexicons from a raw corpus.

    The ranking statistic is the RATIONAL PMI kernel
        score = c(w1,w2) * N / (c(w1) * c(w2))
    (N = total tokens): exp(PMI) up to a constant factor, so the
    RANKING is exactly PMI's while every score is one fixed IEEE
    chain over integer counts — engine-exact, no libm log (the
    package's rational-form discipline; take ln driver-side for
    display if wanted).  ``min_count`` floors the joint count — the
    standard guard against PMI's preference for hapax pairs.

    Scale shape: one token pass feeds both the unigram and bigram
    counts (map-side partials); two broadcast-sized unigram joins onto
    the bigram frame keyed by word (hot stop-words are classic skew —
    AQE handles, and min_count prunes the tail before the joins);
    top-k via orderBy+limit → TakeOrderedAndProject, never a global
    sort.  Returns (w1, w2, pair_count, score, rank)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_tok = uni.agg(F.sum("c").alias("N"))
    base = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    bg = base.select(
        F.explode(zip_shingles(F.col("__t"), 2)).alias("bigram")
    ).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    pairs = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    score = (
        (F.col("pair_count").cast("double") * F.col("N").cast("double"))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    scored = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select("w1", "w2", "pair_count", score.alias("score"))
    )
    top = scored.orderBy(
        F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def extract_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, link_pos, href, anchor_text) from an HTML column — the
    LINK-GRAPH first mile: feeds `retrieval.pagerank`, `cluster.kcore`
    and `cluster.label_propagation` with edges, and anchor text is the
    classic relevance signal web search trains on.  Completes the web
    loop: WARC → html_extract (text) + extract_links (graph).

    One narrow JVM chain — regexp_extract_all collects whole
    double-quoted-href anchor elements (the only form emitted by the
    package's own sinks; single-quoted/bare hrefs are out of scope,
    documented), then per-element regexp_extract pulls the href and
    the inner markup, which is tag-stripped and whitespace-collapsed
    like html_to_text_col.  Restricted to Java∩RE2 regex syntax so the
    oracle replays verbatim.  The positional explode is bounded by the
    per-document anchor count; no shuffle, no UDF."""
    a_pat = r'(?is)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>'
    c = F.col(html_col)
    elems = F.expr(
        f"regexp_extract_all({html_col}, "
        r"'(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>', 0)"
    )
    out = df.select(F.col(id_col), F.posexplode(elems).alias("link_pos", "__a"))
    href = F.regexp_extract(F.col("__a"), a_pat, 1)
    inner = F.regexp_extract(F.col("__a"), a_pat, 2)
    anchor = F.trim(
        F.regexp_replace(F.regexp_replace(inner, r"(?s)<[^>]*>", " "), r"\s+", " ")
    )
    return out.select(
        id_col, "link_pos", href.alias("href"), anchor.alias("anchor_text")
    )


def char_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-distribution quality signals — the gibberish/binary-
    junk detector that complements the token-level gates: a document of
    mashed keys or base64 spill has near-uniform characters (low
    concentration), no spaces, heavy digits.  Emits per document:

    - ``n_chars``        — raw length
    - ``n_distinct_chars``
    - ``char_gini``      — Σ (c_i/n)² over the character histogram,
      folded in CODEPOINT ORDER: the Gini/Simpson concentration index,
      the RATIONAL stand-in for character entropy (monotone in the
      same direction, zero libm — the package's rational-form
      discipline; natural text ≈ 0.05-0.1, single-char runs → 1.0)
    - ``digit_ratio``, ``space_ratio`` — fixed IEEE divisions

    Scale shape: one character explode → one (doc, char) count → one
    doc-keyed fold bounded by the doc's distinct-char count (≤
    alphabet size, so state is tiny regardless of document length);
    ratios come from the same length projection.  Empty/blank docs
    emit zero counts and NULL ratios."""
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("n_chars"),
    )
    chars = base.where(F.col("n_chars") > 0).select(
        id_col, F.explode(F.split(F.col("__t"), "")).alias("ch")
    ).where(F.length("ch") > 0)
    hist = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    per = hist.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum("c").alias("__n"),
        F.array_sort(F.collect_list(F.struct("ch", "c"))).alias("__h"),
    )
    gini = F.aggregate(
        "__h",
        F.lit(0.0),
        lambda acc, x: acc
        + (x["c"].cast("double") / F.col("__n").cast("double"))
        * (x["c"].cast("double") / F.col("__n").cast("double")),
    )
    digit = F.length(F.regexp_replace("__t", r"[^0-9]", ""))
    space = F.length(F.regexp_replace("__t", r"[^ ]", ""))
    return (
        base.join(per, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("n_distinct_chars", F.lit(0)).alias("n_distinct_chars"),
            F.when(F.col("__n").isNotNull(), gini).alias("char_gini"),
            F.when(
                F.col("n_chars") > 0,
                digit.cast("double") / F.col("n_chars").cast("double"),
            ).alias("digit_ratio"),
            F.when(
                F.col("n_chars") > 0,
                space.cast("double") / F.col("n_chars").cast("double"),
            ).alias("space_ratio"),
        )
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease scoring — the classic readability quality
    signal (used alongside perplexity in curation stacks to separate
    prose from listings/code):

        206.835 − 1.015·(words/sentences) − 84.6·(syllable_groups/words)

    with sentences = [.!?]+ runs (min 1 so headlines score), words =
    whitespace tokens, and syllables approximated by VOWEL GROUPS
    (``[aeiouy]+`` runs in the lowercased text) — the standard
    dictionary-free proxy.  Every count is a regexp aggregate and the
    score is one fixed IEEE chain, so the whole frame replays
    engine-exactly.  Narrow: no shuffle, no UDF, no join.  Blank
    documents emit NULL score."""
    t = F.col(text_col)
    n_words = F.size(tokens(text_col))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_syll = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), F.lit(0)))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.cast("int").alias("n_sentences"),
        n_syll.alias("n_syllable_groups"),
        F.when(n_words > 0, score).alias("flesch_score"),
    )


def chi2_keywords(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    min_doc_freq: int = 2,
) -> DataFrame:
    """χ² keyword extraction — the classic supervised feature selector
    (which tokens DISTINGUISH this label's documents): per (label,
    token) the 2×2 document-presence contingency a,b,c,d and

        χ² = N·(a·d − b·c)² / ((a+b)(c+d)(a+c)(b+d))

    keeping only positively-associated tokens (a·d > b·c) and the
    ``top_k`` per label (ties to the smallest token).  One rational
    expression per cell — all products exact DECIMAL(38,0) (HUGEINT in
    the oracle), the statistic ONE integer division — so every double
    is engine-exact.  Exactness envelope: the N⁵-order numerator fits
    38 digits for corpora to ~3·10⁷ docs per run; sample above that
    (documented, loud overflow → null under ANSI off is caught by the
    count bound below being tiny).

    Scale shape: one token shuffle for distinct (doc, token), one
    (label, token) count with map-side partials, token totals +
    |labels|-row label totals broadcast back, a per-label rank window
    bounded by the surviving vocabulary.  ``min_doc_freq`` drops hapax
    tokens before the window."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    dtok = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).alias("label"),
            F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        )
        .distinct()
    )
    lt = dtok.groupBy("label", "token").agg(F.count(F.lit(1)).alias("a"))
    tok_tot = lt.groupBy("token").agg(F.sum("a").alias("tokdocs"))
    lab_tot = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("labdocs"))
    )
    n_row = lab_tot.agg(F.sum("labdocs").alias("n"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    full = (
        lt.join(tok_tot, "token")
        .join(F.broadcast(lab_tot), "label")
        .crossJoin(F.broadcast(n_row))
        .where(F.col("tokdocs") >= min_doc_freq)
        .select(
            "label",
            "token",
            "a",
            (F.col("tokdocs") - F.col("a")).alias("b"),
            (F.col("labdocs") - F.col("a")).alias("c"),
            (F.col("n") - F.col("tokdocs") - F.col("labdocs") + F.col("a")).alias("d"),
            "n",
        )
    )
    det = d38(F.col("a")) * d38(F.col("d")) - d38(F.col("b")) * d38(F.col("c"))
    num = d38(F.col("n")) * det * det
    den = (
        d38(F.col("a") + F.col("b"))
        * d38(F.col("c") + F.col("d"))
        * d38(F.col("a") + F.col("c"))
        * d38(F.col("b") + F.col("d"))
    )
    scored = full.where(det > 0).select(
        "label",
        "token",
        (num.cast("double") / den.cast("double")).alias("chi2"),
    )
    w = Window.partitionBy("label").orderBy(F.col("chi2").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("label", "token", "chi2", "rank")
    )
