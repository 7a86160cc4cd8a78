"""WordPiece tokenizer (BERT family) — north-star N5, round 8.

Completes the tokenizer-family coverage next to char-level BPE
(``bpe.bpe_train``/``bpe_segment``) and byte-level BPE
(``bpe_train_bytes``/``bpe_segment_bytes``): WordPiece segments each
word greedy-longest-match-first against a fixed vocabulary, with
``##``-prefixed continuation pieces and a wholesale ``[UNK]`` fallback
— exactly BERT's WordpieceTokenizer contract.

Training here is FREQUENCY-ranked: every (substring ≤ ``max_piece_len``,
initial-vs-continuation) candidate is counted across the corpus
(weighted by word frequency, one count per occurrence position), the
single-char alphabet is always included for coverage, and the
remaining vocab budget goes to the most frequent multi-char candidates
with a total deterministic order (count DESC, piece ASC, initial
first).  That is the practical substitute for the likelihood-based
original (public references: BERT's tokenization.py, HuggingFace
tokenizers) — the SEGMENTATION semantics, which is what downstream
consumers depend on, is canonical.

Scale shape: training is one whitespace-word count shuffle (vocab-
bounded) + one substring explode/count shuffle whose width is bounded
by ``max_piece_len`` × word length, then a distributed TakeOrdered for
the top-K — no single-partition window, no driver loop over the
corpus.  Segmentation is ONE Arrow ``mapInPandas`` with the broadcast
vocab set (plan depth O(1), like the BPE kernels).

Every step is replayable in SQL: :func:`wordpiece_sql_steps` emits the
unrolled DuckDB CTE chain (training counts, rank-based vocab cut,
greedy match unrolled one CTE per consumed piece) the oracle entry
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    from .text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def wordpiece_train(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Train the vocab; returns (piece, raw, is_cont, cnt) where
    ``piece`` is the surface form (``##`` prefix when ``is_cont``).
    Alphabet rows (single chars, in the positions they occur) are
    always included; multi-char rows fill the remaining budget by
    (cnt DESC, raw ASC, initial-before-continuation)."""
    wc = _word_counts(df, text_col)
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(sequence(1, least({int(max_piece_len)},
                                              length(word) - i + 1)),
                L -> struct(substr(word, i, L) AS raw, i > 1 AS is_cont))))"""
    )
    cand = (
        wc.select(F.explode(subs).alias("s"), "cnt")
        .groupBy(F.col("s.raw").alias("raw"), F.col("s.is_cont").alias("is_cont"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    alpha = cand.filter(F.length("raw") == 1)
    n_alpha = alpha.count()
    budget = max(0, int(vocab_size) - n_alpha)
    multi = (
        cand.filter(F.length("raw") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("raw").asc(), F.col("is_cont").asc())
        .limit(budget)
    )
    piece = F.when(F.col("is_cont"), F.concat(F.lit("##"), F.col("raw"))).otherwise(
        F.col("raw")
    )
    return alpha.unionByName(multi).select(
        piece.alias("piece"), "raw", "is_cont", "cnt"
    )


def wordpiece_segment(
    df: DataFrame,
    vocab: list[tuple[str, bool]],
    text_col: str = "text",
    out_col: str = "wp_tokens",
    unk: str = UNK,
    max_word_len: int = 100,
) -> DataFrame:
    """BERT WordpieceTokenizer semantics over whitespace words: each
    word is consumed greedy-longest-match-first against ``vocab``
    (pairs of (raw, is_cont)); continuation pieces surface with
    ``##``; a word with no matching prefix at any point — or longer
    than ``max_word_len`` — becomes a single ``unk`` token.  One
    broadcast-dict Arrow kernel; null text stays null, blank yields
    []."""
    from pyspark.sql import types as T

    from .text import tokens

    vset = {(str(r), bool(c)) for r, c in vocab}
    max_l = max((len(r) for r, _ in vset), default=1)
    bc = df.sparkSession.sparkContext.broadcast((vset, max_l))
    toked = df.withColumn("__words", tokens(text_col))
    out_schema = T.StructType(
        list(toked.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def run(batches):
        vs, ml = bc.value
        cache: dict[str, list[str]] = {}

        def wp_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            if len(w) > max_word_len:
                cache[w] = [unk]
                return [unk]
            pieces: list[str] = []
            pos = 0
            while pos < len(w):
                best = None
                for L in range(min(ml, len(w) - pos), 0, -1):
                    if (w[pos : pos + L], pos > 0) in vs:
                        best = L
                        break
                if best is None:
                    pieces = [unk]
                    break
                raw = w[pos : pos + best]
                pieces.append("##" + raw if pos else raw)
                pos += best
            cache[w] = pieces
            return pieces

        for pdf in batches:
            res = pdf.copy()
            res[out_col] = [
                None if ws is None else [p for w in ws for p in wp_word(w)]
                for ws in pdf["__words"]
            ]
            yield res

    return toked.mapInPandas(run, schema=out_schema).drop("__words")


def wordpiece_sql_steps(
    docs_table: str = "documents",
    text_col: str = "text",
    vocab_size: int = 60,
    max_piece_len: int = 4,
    max_word_len: int = 12,
) -> str:
    """Unrolled DuckDB CTE chain replaying :func:`wordpiece_train` and
    the greedy segmentation of every distinct corpus word.  Exposes
    ``wp_vocab(piece, raw, is_cont, cnt)`` and ``wp_seg(word, pieces)``
    (pieces space-joined; ``[UNK]`` for no-match/overlong words).  One
    ``s{i}`` CTE per consumed piece — ``max_word_len`` steps bound the
    walk because every step consumes >= 1 char and longer words are
    ``[UNK]`` immediately."""
    norm = f"trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))"
    parts = [
        f"""wp_words AS MATERIALIZED (
          SELECT token AS word, count(*) AS cnt
          FROM (SELECT unnest(string_split({norm}, ' ')) AS token
                FROM {docs_table} WHERE length({norm}) > 0)
          GROUP BY 1)""",
        f"""wp_cand AS MATERIALIZED (
          SELECT substr(w.word, i.i, l.l) AS raw, i.i > 1 AS is_cont,
                 SUM(w.cnt) AS cnt
          FROM wp_words w,
               UNNEST(range(1, length(w.word) + 1)) i(i),
               UNNEST(range(1, least({int(max_piece_len)},
                                     length(w.word) - i.i + 1) + 1)) l(l)
          GROUP BY 1, 2)""",
        """wp_alpha AS (SELECT raw, is_cont, cnt FROM wp_cand
          WHERE length(raw) = 1)""",
        f"""wp_multi AS (SELECT raw, is_cont, cnt FROM (
          SELECT raw, is_cont, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, raw ASC, is_cont ASC)
                     AS rn
          FROM wp_cand WHERE length(raw) >= 2)
          WHERE rn <= {int(vocab_size)} - (SELECT COUNT(*) FROM wp_alpha))""",
        """wp_vocab AS MATERIALIZED (
          SELECT CASE WHEN is_cont THEN '##' || raw ELSE raw END AS piece,
                 raw, is_cont, cnt
          FROM (SELECT * FROM wp_alpha UNION ALL SELECT * FROM wp_multi))""",
        f"""s0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST('' AS VARCHAR) AS acc,
                 length(word) > {int(max_word_len)} AS unk, FALSE AS nomatch
          FROM (SELECT DISTINCT word FROM wp_words))""",
    ]
    for i in range(1, int(max_word_len) + 1):
        p = i - 1
        parts.append(
            f"""c{i} AS MATERIALIZED (
          SELECT s.word, s.pos, s.acc, v.piece, length(v.raw) AS l,
                 ROW_NUMBER() OVER (PARTITION BY s.word
                                    ORDER BY length(v.raw) DESC) AS rn
          FROM s{p} s JOIN wp_vocab v
            ON v.is_cont = (s.pos > 0)
           AND v.raw = substr(s.word, s.pos + 1, length(v.raw))
          WHERE s.pos < length(s.word) AND NOT s.unk AND NOT s.nomatch)"""
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (
          SELECT word, pos, acc, unk, nomatch FROM s{p}
          WHERE pos >= length(word) OR unk OR nomatch
          UNION ALL
          SELECT word, pos + l, CASE WHEN acc = '' THEN piece
                                     ELSE acc || ' ' || piece END,
                 FALSE, FALSE
          FROM c{i} WHERE rn = 1
          UNION ALL
          SELECT s.word, s.pos, s.acc, s.unk, TRUE
          FROM s{p} s
          WHERE s.pos < length(s.word) AND NOT s.unk AND NOT s.nomatch
            AND NOT EXISTS (SELECT 1 FROM c{i} c WHERE c.word = s.word))"""
        )
    parts.append(
        f"""wp_seg AS (
          SELECT word, CASE WHEN unk OR nomatch THEN '{UNK}' ELSE acc END
                     AS pieces
          FROM s{int(max_word_len)})"""
    )
    return ",\n       ".join(parts)
