"""Unigram-LM tokenizer (SentencePiece family, Kudo 2018) — north-star
N5, round 8.  Completes the tokenizer-family coverage: char-level BPE,
byte-level BPE, WordPiece (greedy), and now the unigram LM, whose
segmentation is the VITERBI-optimal split of each word under per-piece
costs rather than a greedy or merge-order rule.

Honest simplifications, documented:

- Training is HARD-EM (Viterbi-EM): the E-step takes each word's single
  best segmentation under current costs and the M-step re-counts pieces
  from it, instead of SentencePiece's soft-EM forward-backward expected
  counts; pruning keeps the top pieces by count with the single-char
  alphabet always retained (coverage guarantee).  Hard-EM is the
  classic deterministic variant; the resulting vocabularies agree with
  soft-EM on dominant pieces and the SEGMENTATION semantics (Viterbi
  under piece costs) is exactly SentencePiece's inference path.
- Costs are SCALED-INTEGER logs: cost(p) = floor(-ln(c_p / total) ·
  1e9).  The one floating step (ln) happens ONCE per piece per round
  when deriving costs from integer counts; every Viterbi comparison is
  then exact integer arithmetic, so the distributed segmentation and
  the DuckDB oracle replay cannot drift.  (The floor boundary is the
  only cross-engine risk — both sides take libm ln of identical
  doubles; a disagreement needs the product to land within one ulp of
  an integer, ~1e-7 odds per piece, and would surface deterministically
  in the oracle gate, not silently.)

Scale shape mirrors the BPE local fast path (bpe.py): ONE distributed
corpus pass builds the (word, count) table; when it fits the collect
budget the exact EM loop runs in-process over the vocab-sized table
(training state is vocab-bounded, never corpus-bounded).  Segmentation
— the data-scale op — is ONE Arrow ``mapInPandas`` with the broadcast
(piece → integer cost) dict: O(1) plan depth, cache per batch.

:func:`unigram_sql_steps` emits the unrolled DuckDB CTE chain replaying
training (per-round cost derivation + per-position Viterbi DP CTEs +
usage re-count) and final segmentation, for the oracle entries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"
SCALE = 10**9
#: DP tie-break: (total cost, piece count, sep-joined piece string).
#: The separator must sort below every piece character for the prefix
#: argument in the docstring of :func:`_viterbi` to hold; pieces come
#: from whitespace words, so ' ' (0x20) is strictly smaller.
SEP = " "


def _viterbi(word: str, costs: dict[str, int], max_piece_len: int):
    """Best segmentation of ``word`` under integer ``costs``: minimize
    (sum of costs, number of pieces, sep-joined piece string) — the
    string component keeps ties deterministic and is prefix-decomposable
    because the separator sorts below every piece char.  Returns the
    piece list, or None when some prefix is uncoverable."""
    n = len(word)
    best: list[tuple[int, int, str, list[str]] | None] = [None] * (n + 1)
    best[0] = (0, 0, "", [])
    for j in range(1, n + 1):
        cand = None
        for length in range(1, min(max_piece_len, j) + 1):
            p = word[j - length : j]
            c = costs.get(p)
            prev = best[j - length]
            if c is None or prev is None:
                continue
            acc = prev[2] + SEP + p if prev[2] else p
            key = (prev[0] + c, prev[1] + 1, acc)
            if cand is None or key < cand[:3]:
                cand = (key[0], key[1], key[2], prev[3] + [p])
        best[j] = cand
    return None if best[n] is None else best[n][3]


def _costs_from_counts(counts: dict[str, int], scale: int = SCALE) -> dict[str, int]:
    total = sum(counts.values())
    return {
        p: int(math.floor(-math.log(c / total) * scale)) for p, c in counts.items()
    }


def unigram_train_local(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    min_seed_count: int = 2,
    scale: int = SCALE,
) -> list[tuple[str, int, int]]:
    """Exact hard-EM over a (word, count) table; returns the final
    vocab as (piece, count, integer cost) sorted by piece.  The SQL of
    :func:`unigram_sql_steps` replays this loop verbatim."""
    seed: dict[str, int] = {}
    chars: set[str] = set()
    for w, c in word_counts:
        for i in range(len(w)):
            chars.add(w[i])
            for length in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + length]
                seed[p] = seed.get(p, 0) + c
    counts = {
        p: c for p, c in seed.items() if c >= min_seed_count or len(p) == 1
    }
    for _ in range(int(em_rounds)):
        costs = _costs_from_counts(counts, scale)
        usage: dict[str, int] = {}
        for w, c in word_counts:
            pieces = _viterbi(w, costs, max_piece_len)
            if pieces is None:  # unreachable: alphabet always covered
                continue
            for p in pieces:
                usage[p] = usage.get(p, 0) + c
        counts = {p: c for p, c in usage.items() if len(p) > 1 and c > 0}
        for ch in chars:
            counts[ch] = max(usage.get(ch, 0), 1)
    ranked = sorted(
        ((c, p) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[0], x[1]),
    )
    budget = max(0, int(vocab_size) - len(chars))
    keep = {p for _, p in ranked[:budget]}
    final = {p: c for p, c in counts.items() if len(p) == 1 or p in keep}
    costs = _costs_from_counts(final, scale)
    return [(p, final[p], costs[p]) for p in sorted(final)]


def unigram_train(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 4,
    em_rounds: int = 2,
    min_seed_count: int = 2,
    collect_budget: int = 5_000_000,
) -> DataFrame:
    """One distributed word-count pass, then the exact local EM loop
    (training state is vocab-bounded — the BPE-fast-path argument,
    bpe.py).  Raises when the distinct-word table exceeds
    ``collect_budget`` — at that scale pre-aggregate (e.g. frequency-
    truncate the long tail) before training, as SentencePiece itself
    requires the corpus to fit its trainer."""
    from .wordpiece import _word_counts

    wc = _word_counts(df, text_col)
    n = wc.count()
    if n > collect_budget:
        raise ValueError(
            f"unigram_train: {n} distinct words exceeds collect_budget="
            f"{collect_budget}; truncate the tail first"
        )
    rows = [(r["word"], r["cnt"]) for r in wc.collect()]
    out = unigram_train_local(
        rows, vocab_size, max_piece_len, em_rounds, min_seed_count
    )
    return df.sparkSession.createDataFrame(
        out, "piece string, cnt long, cost long"
    )


def unigram_segment(
    df: DataFrame,
    pieces: list[tuple[str, int]],
    text_col: str = "text",
    out_col: str = "ug_tokens",
    unk: str = UNK,
    max_piece_len: int | None = None,
) -> DataFrame:
    """Viterbi segmentation of whitespace words under integer piece
    costs — SentencePiece's inference path.  ``pieces`` is (piece,
    cost) from :func:`unigram_train`.  Uncoverable words (a char
    outside the vocab) collapse to ``unk``.  One broadcast-dict Arrow
    kernel with a per-batch word cache; null text stays null, blank
    yields []."""
    from pyspark.sql import types as T

    from .text import tokens

    costs = {str(p): int(c) for p, c in pieces}
    max_l = (
        int(max_piece_len)
        if max_piece_len is not None
        else max((len(p) for p in costs), default=1)
    )
    bc = df.sparkSession.sparkContext.broadcast((costs, max_l))
    toked = df.withColumn("__words", tokens(text_col))
    out_schema = T.StructType(
        list(toked.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def run(batches):
        cs, ml = bc.value
        cache: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                pieces_w = _viterbi(w, cs, ml)
                got = [unk] if pieces_w is None else pieces_w
                cache[w] = got
            return got

        for pdf in batches:
            res = pdf.copy()
            res[out_col] = [
                None if ws is None else [p for w in ws for p in seg(w)]
                for ws in pdf["__words"]
            ]
            yield res

    return toked.mapInPandas(run, schema=out_schema).drop("__words")


def _dp_ctes(
    tag: str, cost_cte: str, max_word_len: int, max_piece_len: int
) -> tuple[list[str], str]:
    """Unrolled Viterbi DP over distinct words (from CTE ``ug_wset``)
    against cost CTE ``cost_cte(piece, cost)``.  Returns (CTE list,
    name of the best-segmentation CTE ``{tag}_best(word, acc)``)."""
    parts = [
        f"""{tag}_d0 AS MATERIALIZED (
          SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS k,
                 CAST('' AS VARCHAR) AS acc
          FROM ug_wset)"""
    ]
    for j in range(1, max_word_len + 1):
        branches = []
        for length in range(1, min(max_piece_len, j) + 1):
            p = j - length
            branches.append(
                f"""SELECT d.word, d.cost + v.cost AS cost, d.k + 1 AS k,
                 CASE WHEN d.acc = '' THEN v.piece
                      ELSE d.acc || ' ' || v.piece END AS acc
          FROM {tag}_d{p} d JOIN {cost_cte} v
            ON length(v.piece) = {length}
           AND v.piece = substr(d.word, {p} + 1, {length})
          WHERE length(d.word) >= {j}"""
            )
        union = "\n          UNION ALL\n          ".join(branches)
        parts.append(
            f"""{tag}_d{j} AS MATERIALIZED (
          SELECT word, cost, k, acc FROM (
            SELECT word, cost, k, acc,
                   ROW_NUMBER() OVER (PARTITION BY word
                                      ORDER BY cost, k, acc) AS rn
            FROM ({union}))
          WHERE rn = 1)"""
        )
    finals = "\n          UNION ALL\n          ".join(
        f"SELECT word, acc FROM {tag}_d{j} WHERE length(word) = {j}"
        for j in range(1, max_word_len + 1)
    )
    parts.append(f"""{tag}_best AS MATERIALIZED (
          {finals})""")
    return parts, f"{tag}_best"


def unigram_sql_steps(
    docs_table: str = "documents",
    text_col: str = "text",
    vocab_size: int = 40,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    max_word_len: int = 12,
    min_seed_count: int = 2,
    scale: int = SCALE,
) -> str:
    """Unrolled DuckDB CTE chain replaying :func:`unigram_train_local`
    + the final Viterbi segmentation of every distinct corpus word.
    Exposes ``ug_vocab(piece, cnt, cost)`` and ``ug_seg(word, pieces)``
    (space-joined).  Every word must fit ``max_word_len`` (the DP is
    unrolled one CTE per position) — a longer word raises a LOUD
    DuckDB ``error()`` from inside ``ug_words`` (the Spark kernel
    segments any length, so a silently violated precondition would
    otherwise show up as quietly missing ``ug_seg`` rows, not a
    mismatch)."""
    norm = f"trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))"
    parts = [
        f"""ug_words AS MATERIALIZED (
          SELECT CASE WHEN length(token) > {int(max_word_len)}
                      THEN error('unigram_sql_steps: word "' || token ||
                           '" exceeds max_word_len={int(max_word_len)} — '
                           'the unrolled Viterbi CTEs cannot segment it; '
                           'raise max_word_len to cover the corpus')
                      ELSE token END AS word,
                 count(*) AS cnt
          FROM (SELECT unnest(string_split({norm}, ' ')) AS token
                FROM {docs_table} WHERE length({norm}) > 0)
          GROUP BY 1)""",
        """ug_wset AS MATERIALIZED (SELECT DISTINCT word FROM ug_words)""",
        f"""ug_seed AS MATERIALIZED (
          SELECT substr(w.word, i.i, l.l) AS piece, SUM(w.cnt) AS cnt
          FROM ug_words w,
               UNNEST(range(1, length(w.word) + 1)) i(i),
               UNNEST(range(1, least({int(max_piece_len)},
                                     length(w.word) - i.i + 1) + 1)) l(l)
          GROUP BY 1)""",
        """ug_chars AS MATERIALIZED (
          SELECT piece FROM ug_seed WHERE length(piece) = 1)""",
        f"""ug_cnt0 AS MATERIALIZED (
          SELECT piece, cnt FROM ug_seed
          WHERE cnt >= {int(min_seed_count)} OR length(piece) = 1)""",
    ]
    prev = "ug_cnt0"
    for r in range(1, int(em_rounds) + 1):
        parts.append(
            f"""ug_cost{r} AS MATERIALIZED (
          SELECT piece, CAST(floor(-ln(CAST(cnt AS DOUBLE)
                 / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM {prev}))
                 * {int(scale)}) AS BIGINT) AS cost
          FROM {prev})"""
        )
        dp, best = _dp_ctes(f"r{r}", f"ug_cost{r}", int(max_word_len),
                            int(max_piece_len))
        parts.extend(dp)
        parts.append(
            f"""ug_use{r} AS MATERIALIZED (
          SELECT p.piece, SUM(w.cnt) AS cnt
          FROM {best} b JOIN ug_words w USING (word),
               UNNEST(string_split(b.acc, ' ')) p(piece)
          GROUP BY 1)"""
        )
        parts.append(
            f"""ug_cnt{r} AS MATERIALIZED (
          SELECT piece, cnt FROM ug_use{r}
          WHERE length(piece) > 1 AND cnt > 0
          UNION ALL
          SELECT c.piece, greatest(COALESCE(u.cnt, 0), 1) AS cnt
          FROM ug_chars c LEFT JOIN ug_use{r} u USING (piece))"""
        )
        prev = f"ug_cnt{r}"
    parts.append(
        f"""ug_keep AS MATERIALIZED (
          SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
            FROM {prev} WHERE length(piece) > 1)
          WHERE rn <= {int(vocab_size)} - (SELECT COUNT(*) FROM ug_chars)
          UNION ALL
          SELECT piece, cnt FROM {prev} WHERE length(piece) = 1)"""
    )
    parts.append(
        f"""ug_vocab AS MATERIALIZED (
          SELECT piece, cnt,
                 CAST(floor(-ln(CAST(cnt AS DOUBLE)
                 / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM ug_keep))
                 * {int(scale)}) AS BIGINT) AS cost
          FROM ug_keep)"""
    )
    dp, best = _dp_ctes("fin", "ug_vocab", int(max_word_len), int(max_piece_len))
    parts.extend(dp)
    parts.append(f"""ug_seg AS MATERIALIZED (
          SELECT word, acc AS pieces FROM {best})""")
    return ",\n       ".join(parts)
