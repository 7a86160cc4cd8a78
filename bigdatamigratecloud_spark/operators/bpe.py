"""Distributed BPE tokenizer training (north-star N4/N5 extension —
beyond the reference, which has no text pipeline at all).

Training a byte-pair-encoding vocabulary on the corpus is the one
tokenizer-side job a 100 TB training-data engine owes its users: the
published algorithm (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units") is an ITERATIVE argmax loop — count
adjacent symbol pairs, merge the most frequent pair, repeat — and this
module runs it Spark-shaped:

- ONE corpus pass builds the (word, count) frequency table; every
  merge round thereafter touches only the VOCAB-sized frame (distinct
  words), never the corpus — the classic word-frequency formulation.
- Per round: one vocab-sized aggregation (map-side combined) finds the
  best pair; the greedy left-to-right merge is applied with a single
  ``aggregate`` fold per word (JVM-side higher-order function, no
  Python UDF); the frame is localCheckpoint-ed so plan depth stays
  O(1) across rounds, exactly like operators/retrieval.pagerank.
- Everything is DETERMINISTIC: ties on pair count break by (lhs, rhs)
  lexicographic order, so any engine replays the identical merge
  sequence — :func:`bpe_sql_steps` generates an unrolled DuckDB oracle
  (the second iterative algorithm in the package with a value-exact
  oracle, after PageRank).

Cross-engine equivalence of the merge application: the Spark side is a
left fold (merge when the accumulator ends with lhs and the next
symbol is rhs), the SQL side is the gaps-and-islands formulation (mark
match starts, group consecutive starts into islands, keep odd ranks).
These coincide because two match starts can only be adjacent when
lhs == rhs (a run of identical symbols), where greedy left-to-right
merging takes the 1st, 3rd, ... start of the run — the odd ranks.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

_MERGES_DDL = "rank int, lhs string, rhs string, merged string, pair_count long"

# Java's \s (what text.tokens() collapses) is ASCII-only — mirror it
# exactly in the Python kernel so fold and kernel tokenize identically
_JAVA_WS = _re.compile(r"[ \t\n\x0B\f\r]+")


def _python_tokens(s: str) -> list[str]:
    """Byte-for-byte mirror of text.tokens(): collapse Java-\\s runs to
    one space, trim, split — [] for blank text."""
    norm = _JAVA_WS.sub(" ", s).strip(" ")
    return norm.split(" ") if norm else []


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_fold(lhs_col, rhs_col):
    """Greedy left-to-right merge of (lhs, rhs) runs inside a symbol
    array, as one JVM-side fold: replace a trailing lhs with lhs||rhs
    when the incoming symbol is rhs.  Chains of identical symbols come
    out exactly like the sequential scan (see module docstring)."""
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lhs_col)
            & (s == rhs_col),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(lhs_col, rhs_col)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _adjacent_pairs(w: DataFrame) -> DataFrame:
    """(lhs, rhs, total) counts of all adjacent symbol pairs in a
    (word, cnt, syms) frame — map-side-combined, one shuffle."""
    return (
        w.where(F.size("syms") >= 2)
        .select(
            "cnt",
            "syms",
            F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
        )
        .select(
            F.element_at("syms", F.col("i")).alias("lhs"),
            F.element_at("syms", F.col("i") + 1).alias("rhs"),
            "cnt",
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("cnt").alias("total"))
    )


def _has_adjacent_pair(lhs: str, rhs: str):
    """Boolean column: does ``syms`` contain (lhs, rhs) adjacently?
    Linear (zip of two shifted slices), no per-element re-evaluation."""
    n = F.size("syms")
    return (n >= 2) & F.array_contains(
        F.zip_with(
            F.slice(F.col("syms"), 1, F.greatest(n - 1, F.lit(0))),
            F.slice(F.col("syms"), 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: (a == F.lit(lhs)) & (b == F.lit(rhs)),
        ),
        True,
    )


def _train_local(
    words: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple]:
    """Exact sequential BPE trainer over an in-process (syms, count)
    word table — the fast path for vocab-bounded corpora.

    Replays the distributed loop's EXACT semantics: pair totals are
    occurrence-position counts weighted by word frequency; the argmax
    tie-breaks (count desc, lhs asc, rhs asc) — Python's code-point
    string order, which equals Spark's UTF8String byte order and
    DuckDB's binary collation, since UTF-8 preserves code-point order;
    merge application is greedy left-to-right non-overlapping.

    Cost: a heap argmax with lazy invalidation + incremental pair-count
    deltas touching only the words that contain the merged pair — the
    in-process twin of the delta-maintained Spark path, minus the
    Θ(num_merges) job-launch floor.  32k merges run in seconds-to-
    minutes on a vocab-sized table (BASELINE.md round-8 probe) instead
    of ~6.5 h of per-merge Spark jobs."""
    import heapq

    pair_counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}

    def add_pairs(wi: int, syms: list[str], cnt: int, sign: int):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * cnt
            if sign > 0:
                occ.setdefault(p, set()).add(wi)

    for wi, (syms, cnt) in enumerate(words):
        add_pairs(wi, syms, cnt, 1)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items() if c > 0]
    heapq.heapify(heap)
    merges: list[tuple] = []
    for rank in range(1, num_merges + 1):
        best = None
        while heap:
            negc, lhs, rhs = heap[0]
            cur = pair_counts.get((lhs, rhs), 0)
            if cur != -negc or cur <= 0:
                heapq.heappop(heap)  # stale entry (count changed)
                continue
            best = (lhs, rhs, cur)
            break
        if best is None or best[2] < min_pair_count:
            break
        lhs, rhs, total = best
        merged = lhs + rhs
        merges.append((rank, lhs, rhs, merged, int(total)))
        changed: set[tuple[str, str]] = set()
        for wi in sorted(occ.get((lhs, rhs), ())):
            syms, cnt = words[wi]
            # occ is append-only, so verify the pair is still present
            has = any(
                syms[i] == lhs and syms[i + 1] == rhs
                for i in range(len(syms) - 1)
            )
            if not has:
                continue
            for i in range(len(syms) - 1):
                changed.add((syms[i], syms[i + 1]))
            add_pairs(wi, syms, cnt, -1)
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, cnt)
            add_pairs(wi, out, cnt, 1)
            for i in range(len(out) - 1):
                changed.add((out[i], out[i + 1]))
        for p in changed:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint: bool = True,
    incremental: bool | None = None,
    local_budget: int | None = None,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merge rules from the corpus.

    Returns (rank, lhs, rhs, merged, pair_count), rank 1..n in merge
    order — fewer than ``num_merges`` rows when no remaining pair
    reaches ``min_pair_count`` (the oracle mirrors this: later
    unrolled rounds re-select the same sub-threshold argmax and filter
    it out, so stopping early is value-identical to running on).

    The merge table itself is tiny (``num_merges`` rows) and builds on
    the driver; all counting and merging is distributed.

    Three value-identical strategies.  The default (``incremental=None``,
    ``local_budget=None``) is the LOCAL fast path whenever the distinct-
    word table fits a 5M-word budget (see below); an explicit
    ``incremental`` forces one of the two distributed per-round
    strategies (recount — the oracle-reference path — or
    delta-maintenance):

    - **recount** (``incremental=False``): re-explode every word's
      pairs and re-aggregate each round.  Per-round cost O(vocab ×
      avg word length) regardless of how little changed — fine for a
      handful of merges, quadratic waste at a production vocab.
    - **delta-maintained** (``incremental=True``): keep the pair-count
      table as a persistent frame; each round touches only the words
      that actually CONTAIN the merged pair (subtract their old pairs,
      add their post-merge pairs).  Late rounds affect a vanishing
      slice of the vocabulary, so per-merge pair work shrinks toward
      zero while the recount path stays flat — the ≥1k-merge probe in
      BASELINE.md measures exactly this.

    Exactness bound, stated honestly: BPE's argmax is inherently
    sequential — every DISTRIBUTED strategy needs one driver round-trip
    (the 1-row argmax) per merge, so training n merges is Θ(n) Spark
    jobs.  The delta path makes each job small; it cannot make them
    fewer.  That floor (0.73 s/merge ≈ 6.5 h at a 32k vocab, dominated
    by job launch, not data) is why the LOCAL fast path exists:

    - **local** (``local_budget``): after the ONE corpus pass, the
      (word, count) table is vocab-sized and bounded — when it fits the
      budget it is collected ONCE and the exact sequential argmax loop
      runs in-process (:func:`_train_local`: heap argmax with lazy
      invalidation + incremental pair deltas), emitting the IDENTICAL
      merge table (same counts, same tie-break) in seconds instead of
      hours.  This is the industry-standard shape — every production
      tokenizer trainer works off the bounded word-frequency table.
      ``local_budget=None`` with ``incremental=None`` (the default)
      auto-enables it at a 5M-distinct-word budget; passing an explicit
      ``incremental`` forces the distributed strategies (the oracle
      paths); ``local_budget=0`` disables the local path outright."""
    spark = docs.sparkSession
    if local_budget is None and incremental is None:
        local_budget = 5_000_000
    wc = _word_counts(docs, text_col)
    if local_budget:
        # one job: an over-budget vocab comes back truncated at
        # budget+1 rows and falls through to the distributed loop
        rows = wc.limit(local_budget + 1).collect()
        if len(rows) <= local_budget:
            words = [(list(r["word"]), int(r["cnt"])) for r in rows]
            merges_local = _train_local(words, num_merges, min_pair_count)
            return spark.createDataFrame(merges_local, _MERGES_DDL)
    if incremental is None:
        incremental = num_merges > 16
    w = wc.withColumn("syms", F.split(F.col("word"), ""))
    if checkpoint:
        w = w.localCheckpoint(eager=True)
    merges: list[tuple] = []
    pair_tbl = None
    base_parts = 1
    if incremental:
        base_parts = max(1, w.rdd.getNumPartitions())
        pair_tbl = _adjacent_pairs(w)
        if checkpoint:
            pair_tbl = pair_tbl.localCheckpoint(eager=True)
    for rank in range(1, num_merges + 1):
        cand = pair_tbl if incremental else _adjacent_pairs(w)
        best = (
            cand.orderBy(F.col("total").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < min_pair_count:
            break
        b = best[0]
        merges.append((rank, b["lhs"], b["rhs"], b["lhs"] + b["rhs"], int(b["total"])))
        if incremental:
            has = _has_adjacent_pair(b["lhs"], b["rhs"])
            affected = w.where(has)
            merged_aff = affected.select(
                "word",
                "cnt",
                _merge_fold(F.lit(b["lhs"]), F.lit(b["rhs"])).alias("syms"),
            )
            # pair-count delta: -old pairs of the affected words,
            # +their post-merge pairs — everything else is untouched
            delta = _adjacent_pairs(
                affected.withColumn("cnt", -F.col("cnt"))
            ).unionByName(_adjacent_pairs(merged_aff))
            pair_tbl = (
                pair_tbl.unionByName(delta)
                .groupBy("lhs", "rhs")
                .agg(F.sum("total").alias("total"))
                .where(F.col("total") > 0)
            )
            # NARROW coalesce after the union: without it the partition
            # count DOUBLES per round (union concatenates both inputs'
            # partitions and the checkpoint freezes them) — 32·2^k
            # partitions by round k
            w = w.where(~has).unionByName(merged_aff).coalesce(base_parts)
            # EAGER checkpoint both frames EVERY round: w is referenced
            # ~4× per round (affected / merged / keep-filter / delta),
            # so any lazy window recomputes with ~4^window fan-out —
            # measured 30× slower at window 8.  Eager-per-round keeps
            # plan depth O(1) and per-merge cost at the job-launch
            # floor (the Θ(num_merges)-jobs bound documented above).
            if checkpoint:
                pair_tbl = pair_tbl.localCheckpoint(eager=True)
                w = w.localCheckpoint(eager=True)
        else:
            bf = spark.createDataFrame([(b["lhs"], b["rhs"])], "l string, r string")
            w = w.crossJoin(F.broadcast(bf)).select(
                "word", "cnt", _merge_fold(F.col("l"), F.col("r")).alias("syms")
            )
            if checkpoint:
                # vocab-sized; keeps the plan O(1) deep across rounds
                w = w.localCheckpoint(eager=True)
    return spark.createDataFrame(merges, _MERGES_DDL)


def _fold_equivalent(merges: list[tuple[str, str]]) -> bool:
    """True when the one-pass-per-rule fold provably equals the
    min-rank-first kernel for this merge table.

    Sufficient conditions (both hold for every table ``bpe_train``
    emits on real corpora, and both are checked, not assumed):

    1. every rule's lhs/rhs is a single symbol (length-1 string) or the
       merged string of a STRICTLY EARLIER rule — so at the fold's pass
       k, all of rule k's operand symbols already exist;
    2. merged strings are UNIQUE across the table — so no later rule
       can re-create an earlier rule's operand symbol via a different
       split (the counterexample: 'abc' formed by (a,bc) at rank i and
       again by (ab,c) at rank j>i, with a rank-k rule in between
       consuming 'abc' — the kernel re-fires rule k, one fold pass per
       rule does not).

    Under 1+2, after pass k no NEW (lhs_k, rhs_k) adjacency can ever
    appear: a later pass j only introduces the symbol merged_j, which
    by uniqueness is not lhs_k or rhs_k — hence one pass per rule, in
    rank order, is exhaustive and order-equivalent to min-rank-first."""
    produced: set[str] = set()
    for lhs, rhs in merges:
        for s in (lhs, rhs):
            if len(s) > 1 and s not in produced:
                return False
        m = lhs + rhs
        if m in produced:
            return False
        produced.add(m)
    return True


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    impl: str = "auto",
    fold_max_rules: int = 64,
) -> DataFrame:
    """Tokenize text with learned merge rules.  Returns the input plus
    ``out_col: array<string>`` of subword units.

    Two implementations, dispatched by ``impl``:

    - ``"fold"``: one chained JVM ``aggregate`` fold PER RULE — pure
      Catalyst, zero Python, the oracle-reference path.  Plan depth is
      O(len(merges)): fine at tens of rules, a codegen/analysis
      explosion at a production 32k-merge vocab.
    - ``"kernel"``: a broadcast merge-rank dict applied in one Arrow
      ``mapInPandas`` kernel — O(1) plan depth at ANY vocab size.  Per
      word it iteratively merges the lowest-ranked pair present
      (greedy left-to-right within a rule), with a per-batch word
      cache.  The kernel's min-rank-first order is CANONICAL BPE
      (Sennrich/GPT-2 semantics).
    - ``"auto"`` (default): fold up to ``fold_max_rules`` rules,
      kernel beyond — but ONLY when :func:`_fold_equivalent` proves
      the two orders coincide for this table (operands are earlier
      merges, merged strings unique).  An adversarial table that
      violates either condition always takes the canonical kernel, so
      ``auto`` can never silently change output across the rule-count
      threshold.

    Unicode note: both paths split words into code units the way their
    engine does; they agree on all BMP text (the fixtures and oracle
    are ASCII)."""
    if impl not in ("auto", "fold", "kernel"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "kernel" or (
        impl == "auto"
        and (len(merges) > fold_max_rules or not _fold_equivalent(merges))
    ):
        return _bpe_segment_kernel(df, merges, text_col, out_col)
    toks = tokens(text_col)
    word_syms = F.transform(toks, lambda wd: F.split(wd, ""))

    def one_rule(lhs: str, rhs: str):
        def fold(acc, s):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(lhs))
                & (s == F.lit(rhs)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(lhs + rhs))
                ),
            ).otherwise(F.concat(acc, F.array(s)))

        return fold

    def apply_rules(syms_col):
        out = syms_col
        for lhs, rhs in merges:
            out = F.aggregate(out, F.array().cast("array<string>"), one_rule(lhs, rhs))
        return out

    return df.withColumn(
        out_col, F.flatten(F.transform(word_syms, apply_rules))
    )


def _bpe_segment_kernel(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    out_col: str,
) -> DataFrame:
    """Arrow ``mapInPandas`` BPE encoder (see :func:`bpe_segment`).

    The merge table ships ONCE per executor as a broadcast (a 32k-rule
    vocab is ~1 MB — never a plan literal, never per-task); encoding a
    word is O(len²) in the word's length and INDEPENDENT of vocab size
    (dict lookups), with a per-batch word cache exploiting Zipf repeat
    rates.  Null text stays null, matching the fold path."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    rules = [(str(l), str(r)) for l, r in merges]
    bc = df.sparkSession.sparkContext.broadcast(rules)

    def run(batches):
        rule_list = bc.value
        ranks = {pair: i for i, pair in enumerate(rule_list)}
        cache: dict[str, list[str]] = {}

        def encode(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                lhs, rhs = rule_list[best]
                out: list[str] = []
                i, n = 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        for pdf in batches:
            res = pdf.copy()
            res[out_col] = [
                None
                if txt is None
                else [t for w in _python_tokens(txt) for t in encode(w)]
                for txt in pdf[text_col]
            ]
            yield res

    return df.mapInPandas(run, schema=out_schema)


# --- byte-level BPE with pre-tokenization (round 8, item #4) --------------

# Pre-tokenization pattern shared verbatim by Java regex (Spark), RE2
# (DuckDB) and Python re (the kernel): runs on WHITESPACE-NORMALIZED
# text (runs collapsed to single spaces), so the only whitespace left
# is the optional leading space each pretoken absorbs — the GPT-2
# shape, restricted to syntax all three engines interpret identically
# (no lookahead, no \p classes).
PRETOK_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte<->unicode bijection (public algorithm): printable
    latin bytes map to themselves; the rest (controls, space, DEL, the
    0x80-0xA0 gap, 0xAD) shift to 256+n so every byte is a visible,
    single code point — space becomes 'Ġ' (U+0120).  Makes byte-level
    symbols plain strings, so the same merge machinery (and the same
    DuckDB char-split oracle) applies unchanged."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = _bytes_to_unicode()


def _byte_syms(pretok: str) -> list[str]:
    """A pretoken's initial symbol list: one mapped char per UTF-8
    byte.  Non-ASCII text expands to multiple symbols per character —
    the byte-fallback alphabet that guarantees zero out-of-vocabulary
    bytes."""
    return [_B2U[b] for b in pretok.encode("utf-8")]


def _pretokenize(text: str) -> list[str]:
    """Python mirror of the shared engine pipeline: Java-\\s collapse,
    trim, then PRETOK_RE findall."""
    norm = _JAVA_WS.sub(" ", text).strip(" ")
    return _re.findall(PRETOK_RE, norm) if norm else []


def bpe_train_bytes(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
    local_budget: int = 5_000_000,
) -> DataFrame:
    """Byte-level BPE training over GPT-2-style pretokens.  The corpus
    pass runs DISTRIBUTED (pretoken counts via one JVM
    regexp_extract_all + explode + map-side-combined groupBy); the
    vocab-sized table is then collected and trained with the exact
    local argmax loop (:func:`_train_local`) over byte-mapped symbol
    lists.  Same merge table schema and tie-break as :func:`bpe_train`;
    lhs/rhs/merged are strings over the byte-unicode alphabet.

    A vocabulary past ``local_budget`` distinct pretokens raises — the
    distributed per-round loop is char-level only; byte-level training
    is the bounded-vocab case by construction (the pretokenizer caps
    word shapes), matching every production tokenizer trainer."""
    if isinstance(text_col, str):
        tc = F.col(text_col)
    else:
        tc = text_col
    norm = F.trim(F.regexp_replace(tc, r"\s+", " "))
    pretoks = F.regexp_extract_all(norm, F.lit(f"({PRETOK_RE})"), 1)
    wc = (
        docs.where(F.length(norm) > 0)
        .select(F.explode(pretoks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = wc.limit(local_budget + 1).collect()
    if len(rows) > local_budget:
        raise ValueError(
            f"byte-level vocab exceeds local_budget={local_budget}; "
            "raise the budget (the table is pretoken-bounded)"
        )
    words = [(_byte_syms(r["word"]), int(r["cnt"])) for r in rows]
    merges = _train_local(words, num_merges, min_pair_count)
    return docs.sparkSession.createDataFrame(merges, _MERGES_DDL)


def bpe_vocab_ids(
    merges: list[tuple[str, str]], special_tokens: list[str] | None = None
) -> dict[str, int]:
    """The deterministic id space production tokenizers emit: ids
    0-255 are the byte alphabet IN BYTE ORDER (so a single-byte
    symbol's id IS its byte value), ids 256..256+len(merges)-1 are the
    merged strings in rank order, specials follow in the order given.
    The whole table derives from the merge list — no separate vocab
    artifact to keep in sync.

    Surface forms must be unique: a merge table can in principle form
    the same merged string twice (e.g. 'abc' via (a,bc) and later
    (ab,c)), and a special token can equal a merged string.  Plain
    overwrite would silently shadow the earlier id — two vocab entries
    sharing one surface, the shadowed id unreachable, and
    ``bpe_decode_bytes`` raising 'unknown token id' on externally
    produced streams that use it.  Collisions raise here instead
    (the id-space analogue of ``_fold_equivalent``'s segmentation
    uniqueness guard)."""
    ids = {c: b for b, c in _B2U.items()}
    for i, (lhs, rhs) in enumerate(merges):
        surface = str(lhs) + str(rhs)
        if surface in ids:
            raise ValueError(
                f"bpe_vocab_ids: merged string {surface!r} (rank {i}) collides "
                f"with existing vocab id {ids[surface]} — duplicate merged "
                "surfaces make the earlier id unreachable"
            )
        ids[surface] = 256 + i
    for j, s in enumerate(special_tokens or []):
        s = str(s)
        if s in ids:
            raise ValueError(
                f"bpe_vocab_ids: special token {s!r} collides with existing "
                f"vocab id {ids[s]} — specials must not equal a byte symbol "
                "or merged string"
            )
        ids[s] = 256 + len(merges) + j
    return ids


def bpe_segment_bytes(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    special_tokens: list[str] | None = None,
    emit: str = "tokens",
) -> DataFrame:
    """Byte-level BPE encode — the kernel path generalized (round-8
    item #4): ONE Arrow ``mapInPandas`` over the scan, broadcast
    merge-rank dict, O(1) plan depth at any vocab size.  Per text:
    special tokens (if any) pass through VERBATIM as single symbols
    (matched before normalization, longest-first, never pretokenized
    or merged); the remaining segments are whitespace-normalized,
    pretokenized with :data:`PRETOK_RE`, each pretoken mapped to its
    UTF-8 byte symbols (:func:`_byte_syms`) and encoded min-rank-first
    with a per-batch cache.  Null text stays null; blank text yields
    [].  Output symbols live in the byte-unicode alphabet (space =
    'Ġ'), exactly like GPT-2's tokenizer output.

    ``emit='ids'`` returns ``array<int>`` TOKEN IDS instead, through
    the deterministic :func:`bpe_vocab_ids` space (byte-value ids for
    single bytes, 256+rank for merges, then specials) — the form a
    training pipeline actually materializes."""
    from pyspark.sql import types as T

    if emit not in ("tokens", "ids"):
        raise ValueError(f"emit must be 'tokens' or 'ids', got {emit!r}")
    elem = T.IntegerType() if emit == "ids" else T.StringType()
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(elem))]
    )
    rules = [(str(l), str(r)) for l, r in merges]
    originals = [str(s) for s in (special_tokens or [])]
    specials = sorted(originals, key=len, reverse=True)
    id_map = bpe_vocab_ids(rules, originals) if emit == "ids" else None
    bc = df.sparkSession.sparkContext.broadcast((rules, specials, id_map))

    def run(batches):
        rule_list, specs, ids = bc.value
        ranks = {pair: i for i, pair in enumerate(rule_list)}
        spec_re = (
            _re.compile("|".join(_re.escape(s) for s in specs)) if specs else None
        )
        cache: dict[str, list[str]] = {}

        def encode_word(syms: list[str]) -> list[str]:
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                lhs, rhs = rule_list[best]
                out: list[str] = []
                i, n = 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        def encode_pretok(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = encode_word(_byte_syms(w))
                cache[w] = got
            return got

        def encode_text(txt: str) -> list[str]:
            segments = [(txt, False)]
            if spec_re is not None:
                segments = []
                last = 0
                for m in spec_re.finditer(txt):
                    if m.start() > last:
                        segments.append((txt[last : m.start()], False))
                    segments.append((m.group(0), True))
                    last = m.end()
                if last < len(txt):
                    segments.append((txt[last:], False))
            out: list[str] = []
            for seg, is_special in segments:
                if is_special:
                    out.append(seg)
                else:
                    for w in _pretokenize(seg):
                        out.extend(encode_pretok(w))
            return out

        for pdf in batches:
            res = pdf.copy()
            if ids is None:
                res[out_col] = [
                    None if txt is None else encode_text(txt)
                    for txt in pdf[text_col]
                ]
            else:
                res[out_col] = [
                    None
                    if txt is None
                    else [ids[t] for t in encode_text(txt)]
                    for txt in pdf[text_col]
                ]
            yield res

    return df.mapInPandas(run, schema=out_schema)


def bpe_bytes_fold_reference(
    text: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Sequential one-pass-per-rule FOLD reference for the byte-level
    kernel (pure Python, test-only): pretokenize, byte-map, then apply
    each rule in rank order with one greedy left-to-right pass.  The
    property tests pin kernel ≡ fold on non-ASCII text for tables
    produced by :func:`bpe_train_bytes` (which satisfy the
    :func:`_fold_equivalent` conditions)."""
    out: list[str] = []
    for w in _pretokenize(text):
        syms = _byte_syms(w)
        for lhs, rhs in merges:
            ns: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        out.extend(syms)
    return out


def bpe_sql_steps(
    docs_table: str = "documents",
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_count: int = 2,
    words_sql: str | None = None,
) -> str:
    """Unrolled DuckDB CTE chain replaying :func:`bpe_train` exactly.
    Exposes the merge table as CTE ``bpe_merges(rank, lhs, rhs,
    merged, pair_count)``.  Tokenization mirrors text.tokens()
    (whitespace collapse, blank-doc exclusion); greedy merge
    application is the gaps-and-islands window formulation (see module
    docstring for why it equals the Spark fold).

    ``words_sql`` overrides the word-frequency CTE body (must yield
    (word, cnt), with ``word`` already in the symbol alphabet — the
    byte-level oracle passes pretokens with space mapped to 'Ġ', whose
    char split IS the byte split on an ASCII corpus)."""
    norm = f"trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))"
    if words_sql is None:
        words_sql = f"""SELECT token AS word, count(*) AS cnt
          FROM (SELECT unnest(string_split({norm}, ' ')) AS token
                FROM {docs_table} WHERE length({norm}) > 0)
          GROUP BY 1"""
    parts = [
        f"""bpe_words AS MATERIALIZED (
          {words_sql})""",
        """bw0 AS MATERIALIZED (SELECT word, cnt,
                 list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
          FROM bpe_words)""",
    ]
    for i in range(1, num_merges + 1):
        p = i - 1
        parts.append(
            f"""bp{i} AS MATERIALIZED (
          SELECT w.syms[i.i] AS lhs, w.syms[i.i + 1] AS rhs, SUM(w.cnt) AS total
          FROM bw{p} w, UNNEST(range(1, len(w.syms))) AS i(i)
          GROUP BY 1, 2)"""
        )
        parts.append(
            f"""bb{i} AS MATERIALIZED (
          SELECT lhs, rhs, total FROM bp{i}
          WHERE total >= {min_pair_count}
          ORDER BY total DESC, lhs, rhs LIMIT 1)"""
        )
        parts.append(
            f"""bbx{i} AS MATERIALIZED (
          SELECT lhs, rhs FROM bb{i}
          UNION ALL
          SELECT NULL, NULL WHERE NOT EXISTS (SELECT 1 FROM bb{i}))"""
        )
        parts.append(
            f"""be{i} AS MATERIALIZED (
          SELECT w.word, w.cnt, i.i AS pos, w.syms[i.i] AS sym, b.lhs, b.rhs
          FROM bw{p} w CROSS JOIN bbx{i} b,
               UNNEST(range(1, len(w.syms) + 1)) AS i(i))"""
        )
        parts.append(
            f"""bm{i} AS MATERIALIZED (
          SELECT *, COALESCE(sym = lhs
                 AND lead(sym) OVER (PARTITION BY word ORDER BY pos) = rhs,
                 FALSE) AS mst
          FROM be{i})"""
        )
        parts.append(
            f"""bg{i} AS MATERIALIZED (
          SELECT word, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS isl
          FROM bm{i} WHERE mst)"""
        )
        parts.append(
            f"""bk{i} AS MATERIALIZED (
          SELECT word, pos FROM (
            SELECT word, pos,
                   ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY pos) AS rn
            FROM bg{i}) t
          WHERE rn % 2 = 1)"""
        )
        parts.append(
            f"""bw{i} AS MATERIALIZED (
          SELECT m.word, m.cnt,
                 list(CASE WHEN k.pos IS NOT NULL THEN m.lhs || m.rhs
                           ELSE m.sym END ORDER BY m.pos) AS syms
          FROM bm{i} m
          LEFT JOIN bk{i} k ON m.word = k.word AND m.pos = k.pos
          LEFT JOIN bk{i} kc ON m.word = kc.word AND m.pos = kc.pos + 1
          WHERE kc.pos IS NULL
          GROUP BY m.word, m.cnt)"""
        )
    union = "\n          UNION ALL ".join(
        f"SELECT {i} AS rank, lhs, rhs, lhs || rhs AS merged, "
        f"CAST(total AS BIGINT) AS pair_count FROM bb{i}"
        for i in range(1, num_merges + 1)
    )
    parts.append(
        f"""bpe_merges AS (
          SELECT * FROM ({union}) u
          WHERE lhs IS NOT NULL)"""
    )
    return ",\n       ".join(parts)


def bpe_decode_bytes(
    df: DataFrame,
    merges: list[tuple[str, str]],
    ids_col: str = "bpe_tokens",
    out_col: str = "text",
    special_tokens: list[str] | None = None,
) -> DataFrame:
    """Invert :func:`bpe_segment_bytes(emit='ids')` — token-id arrays
    back to text (round 8): ids map through the inverse of
    :func:`bpe_vocab_ids` to byte-unicode symbol strings, concatenate,
    translate the GPT-2 byte-unicode alphabet back to raw UTF-8 bytes,
    and decode.  Special-token ids re-emit their literal text (they
    never entered the byte alphabet).  One Arrow ``mapInPandas`` with
    the broadcast inverse vocab — O(1) plan depth like the encoder;
    unknown ids raise (a corrupt sequence should fail loudly, not
    silently drop tokens); undecodable byte runs use U+FFFD
    replacement so a truncated multi-byte sequence cannot kill the
    task.  Null arrays stay null.  Roundtrip contract (tests):
    ``decode(encode(t)) == normalized(t)`` for any unicode text."""
    from pyspark.sql import types as T

    rules = [(str(l), str(r)) for l, r in merges]
    specials = [str(s) for s in (special_tokens or [])]
    inv = {v: k for k, v in bpe_vocab_ids(rules, specials).items()}
    spec_ids = {256 + len(rules) + j for j in range(len(specials))}
    u2b = {c: b for b, c in _B2U.items()}
    bc = df.sparkSession.sparkContext.broadcast((inv, spec_ids, u2b))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType())]
    )

    def run(batches):
        inv_l, spec_l, u2b_l = bc.value

        def decode_ids(ids):
            parts: list[str] = []
            buf: list[int] = []
            for i in ids:
                sym = inv_l.get(i)
                if sym is None:
                    raise ValueError(f"bpe_decode_bytes: unknown token id {i}")
                if i in spec_l:
                    if buf:
                        parts.append(bytes(buf).decode("utf-8", errors="replace"))
                        buf = []
                    parts.append(sym)
                else:
                    buf.extend(u2b_l[c] for c in sym)
            if buf:
                parts.append(bytes(buf).decode("utf-8", errors="replace"))
            return "".join(parts)

        for pdf in batches:
            res = pdf.copy()
            res[out_col] = [
                None if ids is None else decode_ids(list(ids))
                for ids in pdf[ids_col]
            ]
            yield res

    return df.mapInPandas(run, schema=out_schema)
