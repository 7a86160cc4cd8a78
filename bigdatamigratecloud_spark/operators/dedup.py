"""Deduplication operators (north-star N1/N2, SURVEY §2.12): exact
content-hash dedup, n-gram Jaccard near-dup, MinHash+LSH banding, SimHash,
and embedding-cosine near-dup.

Scale design (100 TB):
- exact dedup: sha2 content key -> groupBy/min — one shuffle on the hash,
  map-side partial aggregation, no skew (hashes are uniform);
- Jaccard pairs: explode distinct shingles -> self-join on shingle ->
  count shared -> jaccard.  The shingle join is the scale risk (a shingle
  shared by m docs yields m² pairs); `max_shingle_freq` drops
  ultra-common shingles (stopword phrases) exactly like dropping
  high-document-frequency terms in IR — bounded blowup, tiny recall loss;
- MinHash+LSH: k independent hash mins per doc (one pass over exploded
  shingles via groupBy(doc).agg(min(h_i))), band signatures, join on
  (band_id, band_hash) — candidate pairs only, then exact-Jaccard rerank.
  This is the published shingle->minhash->band->bucket-join pipeline
  (Broder; Mining of Massive Datasets ch.3) as pure DataFrame ops;
- SimHash: 64-bit weighted-bit signature per doc, hamming<=r candidate
  pairing via table rotation — here: band the 64 bits into 4 16-bit keys
  (any pair with hamming<=3 shares >=1 exact band);
- embedding cosine: normalized dot product; brute pairs for small dims,
  random-hyperplane LSH buckets as the scale path (see similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from .text import tokens


def portable_hash60(col: Column) -> Column:
    """60-bit hash from the md5 hex prefix — identical in every engine
    with a standard md5 (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT).
    ~3-4× the per-row cost of xxhash64; use it when cross-engine
    reproducibility matters more than hash throughput (the scan still
    dominates both at scale)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingle_hash(i: int, portable: bool) -> "Column":
    salted = F.concat(F.lit(f"mh{i}:"), F.col("shingle"))
    return portable_hash60(salted) if portable else F.xxhash64(salted)


def _pt_hash_sql(expr: str) -> str:
    """DuckDB SQL mirroring portable_hash60."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


from .parallelism import spread_for_cpu  # noqa: F401  (re-exported; used below)


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the smallest id per exact content group (N1).  Hash first so
    the shuffle key is a fixed-width string, not a megabyte of text.

    NULL-safe key: concat_ws SKIPS null arguments, so without the
    per-column encoding (NULL vs 'v'+value) rows like (NULL,'x') and
    ('x',NULL) would collide on the same key and a non-duplicate row
    would be silently dropped."""
    key = F.sha2(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(
                    F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("\x00")
                )
                for c in content_cols
            ],
        ),
        256,
    )
    return (
        df.withColumn("__key", key)
        .groupBy("__key")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .drop("__key")
    )


def shingles_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct n-token shingles per doc: (id, shingle).

    The token array is materialized as an attribute in its own projection
    BEFORE the shingle lambda: embedding ``tokens(text)`` directly would
    re-run the tokenizer regex once per shingle (the lambda body re-
    evaluates its free expressions per element) — O(n_tokens²) per row."""
    from .text import zip_shingles

    base = spread_for_cpu(df).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    )
    sh = zip_shingles(F.col("__toks"), n)
    return base.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All doc pairs (a < b) with shingle-set Jaccard >= threshold (N2).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), decimal(28,7) so results
    are engine-reproducible.
    """
    sh = shingles_df(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.filter(F.col("df") <= max_shingle_freq).select("shingle"), "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            # double division, emitted as DOUBLE: int/int IEEE division is
            # bit-identical across engines, while DECIMAL canonicalization
            # diverged in the round-1 driver hash despite identical values
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_containment: float = 0.6,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """DIRECTED shingle-containment pairs: containment(A→B) =
    |A∩B| / |A| — the asymmetric near-dup relation Jaccard misses (a
    tweet quoted inside an article has tiny Jaccard but containment
    ≈ 1).  This is the C4/RealNews "document subsumed by another"
    dedup rule; downstream keep-best then drops the contained copy.

    Returns (contained_id, container_id, containment) for every
    ORDERED pair with containment >= threshold (both directions of a
    mutual near-dup appear).  Same scale shape as :func:`jaccard_pairs`
    — shingle explode + equi-join + per-pair count, never a cross
    product; ``max_shingle_freq`` prunes boilerplate shingles exactly
    like there."""
    if not 0.0 < min_containment <= 1.0:
        raise ValueError(
            f"min_containment must be in (0,1], got {min_containment}"
        )
    sh = shingles_df(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            freq.filter(F.col("df") <= max_shingle_freq).select("shingle"),
            "shingle",
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    both = shared.join(sa, "id_a").join(sb, "id_b")
    fwd = both.select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        (F.col("inter").cast("double") / F.col("sz_a").cast("double")).alias(
            "containment"
        ),
    )
    rev = both.select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        (F.col("inter").cast("double") / F.col("sz_b").cast("double")).alias(
            "containment"
        ),
    )
    return fwd.union(rev).filter(F.col("containment") >= F.lit(min_containment))


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    via: str = "broadcast",
    bloom_bits: int = 1_966_080,
    bloom_k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: drop every corpus doc sharing ANY
    n-token shingle with the benchmark set (the published n-gram-overlap
    decontamination rule used for pre-training corpora, typically
    n = 8..13).

    Scale design, ``via="broadcast"`` (default): benchmark shingles are
    a SMALL distinct set (benchmarks are thousands of docs, not
    billions) — broadcast them; the corpus shingle stream semi-probes
    the broadcast, then docs with any hit anti-join away.  One shuffle
    on doc id, corpus scanned once, no pairwise blowup.

    ``via="bloom"``: the extreme-benchmark-size path made real — when
    the distinct shingle set outgrows the broadcast budget, a
    constant-size Bloom bitmap (``bloom_bits``) prunes the corpus
    shingle stream with a NARROW filter first, and only surviving
    candidate shingles enter the exact (shuffled) semi-join.  False
    positives cost verify work only; the result is identical to the
    broadcast path by construction."""
    bench_sh = shingles_df(benchmark, id_col, text_col, n).select("shingle").distinct()
    corpus_sh = shingles_df(corpus, id_col, text_col, n)
    if via == "bloom":
        from .bloom import bloom_build, bloom_member

        words = bloom_build(bench_sh, "shingle", bloom_bits, bloom_k, salt="decon")
        corpus_sh = corpus_sh.where(
            bloom_member(F.col("shingle"), words, bloom_bits, bloom_k, "decon")
        )
        probe = bench_sh  # exact verify: shuffled semi-join over candidates
    elif via == "broadcast":
        probe = F.broadcast(bench_sh)
    else:
        raise ValueError(f"via must be 'broadcast' or 'bloom', got {via!r}")
    hits = (
        corpus_sh.join(probe, "shingle", "left_semi")
        .select("id")
        .distinct()
        .withColumnRenamed("id", id_col)
    )
    return corpus.join(hits, id_col, "left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Graded companion to ngram_decontaminate: per corpus doc, the
    FRACTION of its distinct n-token shingles that appear anywhere in the
    benchmark set — (id, n_shingles, n_contaminated, contamination).
    The boolean filter answers "is it tainted?"; this answers "how much?",
    which is what you audit before choosing a drop threshold.  Docs with
    fewer than ``n`` tokens have no shingles and are absent from the
    report (nothing to measure).

    Scale: same shape as the filter — benchmark shingles broadcast
    (bloom-filter swap at extreme sizes), corpus shingle stream scanned
    once, ONE shuffle keyed by doc id for the per-doc counts."""
    bench_sh = F.broadcast(
        shingles_df(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_sh = shingles_df(corpus, id_col, text_col, n)
    return (
        corpus_sh.join(bench_sh, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias("contamination"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(id, sig: array<bigint>) — k independent min-hashes per doc,
    computed in ONE pass: explode shingles, per-row k hashes, groupBy(id)
    with k min() aggregates (map-side partial agg keeps the shuffle tiny:
    k longs per doc per partition).  `portable=True` swaps xxhash64 for
    the md5-prefix hash so an external engine can recompute the exact
    signatures (oracle checking); default stays xxhash64 for the hot
    path."""
    sh = shingles_df(df, id_col, text_col, n)
    hashed = sh.select(
        "id", *[_shingle_hash(i, portable).alias(f"h{i}") for i in range(num_hashes)]
    )
    aggd = hashed.groupBy("id").agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)])
    return aggd.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def _banded(
    sigs: DataFrame, bands: int, rows_per_band: int, portable: bool
) -> DataFrame:
    """(id, band, bucket) rows: each signature split into ``bands`` bands
    of ``rows_per_band`` hashes, bucket-keyed per band."""

    def bucket(b: int) -> Column:
        joined = F.concat_ws(
            ",",
            *[
                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ],
        )
        # portable: the md5 hex string itself is the bucket key (string
        # equality joins identically everywhere); fast path: xxhash64
        return F.md5(joined) if portable else F.xxhash64(joined)

    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


# Default hot-bucket cap shared by every banded candidate join in the
# engine (minhash / simhash / dhash / audio-fingerprint).  Chosen so an
# m-member bucket at the cap emits at most ~5e9 verify pairs per bucket
# under `sample` — large enough that no legitimate near-dup cluster at
# test scale ever trips it, small enough that a web-scale degenerate
# bucket (empty pages, templated boilerplate, black frames) cannot emit
# the O(m²) pair explosion AQE cannot save you from (splitting a skewed
# partition re-balances work but cannot shrink the pair OUTPUT).
DEFAULT_MAX_BUCKET = 100_000


def guarded_band_self_join(
    banded: DataFrame,
    carry_cols: tuple[str, ...] = (),
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
    band_col: str = "band",
    key_col: str = "bucket",
    id_col: str = "id",
) -> DataFrame:
    """Band-bucket candidate SELF-join with a hot-bucket guard — the one
    shared scale valve for every banded-LSH family here (minhash LSH,
    simhash, image dHash, audio fingerprints).

    The naive band self-join emits O(m²) pairs for an m-member bucket;
    at web scale degenerate buckets are routine (a 10M-member bucket of
    boilerplate docs would emit 5x10^13 pairs).  Guard: a per-(band,
    bucket) count pre-aggregation (map-side combine -> one row per
    bucket) splits rows into cold (<= ``max_bucket`` members, joined
    exactly as before) and hot buckets, which follow ``hot_policy``:

    - ``"star"`` (default, the Gopher/RefinedWeb production shape): the
      bucket's min-id member becomes its representative and every other
      member pairs with it — O(m) output.  Members of an over-cap
      bucket collide on a full band, so they are near-duplicates of
      each other by construction; the caller's exact rerank still
      verifies each (rep, member) pair, and downstream clustering
      (connected components) merges the bucket transitively through
      the rep.  Trade-off: member-vs-member pairs inside a hot bucket
      that do NOT match the rep are not emitted.
    - ``"sample"``: the ``max_bucket`` lowest-id members of each hot
      bucket self-join (deterministic, order-by-id), the rest emit no
      pairs — bounds output at C(max_bucket, 2) per bucket.

    Neither policy is silent: :func:`lsh_bucket_stats` surfaces the
    per-bucket membership counts and over-cap flags as a queryable
    (oracle-checked) frame so a pipeline can log exactly which buckets
    were degraded and by how much.  ``max_bucket=None`` disables the
    guard (the pre-round-9 behavior).

    Scale shape: the banded frame is MATERIALIZED once (localCheckpoint)
    — it is consumed by the bucket-stats aggregation, both sides of the
    cold self-join and the hot-member scan, and callers routinely pass
    it with a whole signature pipeline as lineage, which would otherwise
    re-execute per consumer (measured: 12 copies of the banding subtree
    in the pre-fusion plan, each re-running the upstream signatures when
    they were not checkpointed).  Bucket count and star representative
    (id + carried columns, via ``min_by``) come from ONE grouped
    aggregation — one row per distinct bucket, map-side partials — whose
    over-cap subset is tiny by construction and broadcast once; star hot
    pairs are then a pure projection of the tagged members (no rep join
    at all).  Candidate output is bounded by cold² per cold bucket +
    (m or cap²) per hot bucket — never corpus-quadratic.
    """
    if hot_policy not in ("star", "sample"):
        raise ValueError(f"hot_policy={hot_policy!r}: expected 'star' or 'sample'")

    def pair_cols():
        cols = [
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ]
        for c in carry_cols:
            cols.append(F.col(f"a.{c}").alias(f"{c}_a"))
            cols.append(F.col(f"b.{c}").alias(f"{c}_b"))
        return cols

    def self_join(df: DataFrame) -> DataFrame:
        a, b = df.alias("a"), df.alias("b")
        return a.join(
            b,
            (F.col(f"a.{band_col}") == F.col(f"b.{band_col}"))
            & (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(*pair_cols())

    # materialize once: every consumer below (stats agg, cold a, cold b,
    # hot members) would otherwise re-execute the banding AND its whole
    # upstream lineage; the cut is banded-sized (id, band, bucket [+
    # carries] per doc per band — same budget class as the signature
    # checkpoints upstream), value-transparent
    banded = banded.localCheckpoint(eager=True)
    if max_bucket is None:
        return self_join(banded).dropDuplicates(["id_a", "id_b"])
    if max_bucket < 2:
        raise ValueError(f"max_bucket={max_bucket}: must be >= 2 (or None to disable)")

    # ONE pass over the buckets: membership count + (star) the rep id and
    # its carried columns — min_by is deterministic here because ids are
    # unique within a (band, bucket)
    aggs = [F.count(F.lit(1)).alias("__bcnt")]
    if hot_policy == "star":
        aggs.append(F.min(id_col).alias("__rep"))
        if carry_cols:
            aggs.append(
                F.min_by(
                    F.struct(*[F.col(c) for c in carry_cols]), F.col(id_col)
                ).alias("__repc")
            )
    stats = banded.groupBy(band_col, key_col).agg(*aggs)
    # materialize the over-cap subset: `tagged` is expanded once per
    # consumer (cold self-join side a, side b, hot members — three plan
    # copies), and each copy would re-run the full groupBy over the
    # banded frame to rebuild this broadcast side.  hot_stats is tiny by
    # construction (only buckets past the cap), so the cut costs one
    # bucket-stats job and replaces two corpus-sized aggregation passes
    # with scans of a few-row RDD
    hot_stats = stats.filter(F.col("__bcnt") > max_bucket).localCheckpoint(eager=True)
    tagged = banded.join(F.broadcast(hot_stats), [band_col, key_col], "left")
    cold = tagged.filter(F.col("__bcnt").isNull()).select(*banded.columns)
    cold_pairs = self_join(cold)
    if hot_policy == "star":
        # rep-vs-member pairs WITHOUT a join: the rep id and its carries
        # ride in on the broadcast stats row of each hot member
        members = tagged.filter(
            F.col("__bcnt").isNotNull() & (F.col(id_col) != F.col("__rep"))
        )
        cols = [F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")]
        for c in carry_cols:
            cols.append(F.col("__repc").getField(c).alias(f"{c}_a"))
            cols.append(F.col(c).alias(f"{c}_b"))
        hot_pairs = members.select(*cols)
    else:
        from pyspark.sql import Window

        hot = tagged.filter(F.col("__bcnt").isNotNull()).select(*banded.columns)
        w = Window.partitionBy(band_col, key_col).orderBy(id_col)
        sampled = (
            hot.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_bucket)
            .drop("__rn")
        )
        hot_pairs = self_join(sampled)
    return cold_pairs.unionByName(hot_pairs).dropDuplicates(["id_a", "id_b"])


def lsh_bucket_stats(
    sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    portable: bool = False,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Per-(band, bucket) membership profile for the minhash-LSH banding
    — the no-silent-caps surfacing for :func:`guarded_band_self_join`:
    (band, members, over_cap) so a pipeline can log exactly how many
    buckets the hot-bucket guard degraded and how big they were.  The
    bucket key itself is dropped from the output (it is an engine hash,
    meaningless to report); buckets aggregate to one row per (band,
    members) histogram cell, which keeps the report tiny at any corpus
    size."""
    banded = _banded(sigs, bands, rows_per_band, portable)
    per_bucket = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("members")
    )
    return (
        per_bucket.groupBy("band", "members")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            "band",
            "members",
            "n_buckets",
            (F.col("members") > F.lit(max_bucket)).alias("over_cap"),
        )
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    portable: bool = False,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """LSH banding: split each signature into `bands` bands of
    `rows_per_band` hashes; docs sharing any (band_id, band_hash) bucket
    become candidate pairs (id_a < id_b, distinct).  Buckets over
    ``max_bucket`` members follow ``hot_policy`` instead of exploding
    quadratically — see :func:`guarded_band_self_join`."""
    assert bands * rows_per_band <= 1 << 10
    banded = _banded(sigs, bands, rows_per_band, portable)
    return guarded_band_self_join(
        banded, max_bucket=max_bucket, hot_policy=hot_policy
    )


def minhash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.2,
    portable: bool = False,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """Full scale-path near-dup: minhash -> LSH candidates -> exact
    Jaccard rerank of candidates only.  At 100 TB the rerank join touches
    candidate docs only, not the full corpus cross-product; degenerate
    buckets are capped by the shared hot-bucket guard (the rerank still
    verifies every emitted pair exactly).

    The two mid-pipeline frames are MATERIALIZED (localCheckpoint):
    ``sigs`` (k longs per doc) and the candidate-restricted shingle
    stream.  Without this, the signature pipeline and the upstream
    ``df`` plan (often a whole curation chain) re-execute once per
    consumer — sigs feeds 8 band stages, the shingle stream feeds three
    rerank joins — and with AQE over a cached/derived source the
    re-planning multiplied one corpus pass into ~900 stage jobs
    (measured 300 s vs 13 s on the sf0.1 pipeline).  Both frames are
    output-sized (docs x k ints; candidate shingles), never
    corpus-quadratic, so the eager cut is safe at any scale."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, portable)
    sigs = sigs.localCheckpoint(eager=True)
    cands = minhash_lsh_candidates(
        sigs, bands, num_hashes // bands, portable, max_bucket, hot_policy
    ).localCheckpoint(eager=True)
    # rerank restricted to CANDIDATES: semi-join the shingle stream down
    # to docs appearing in some candidate pair, then count intersections
    # per candidate pair.  (Calling jaccard_pairs over the whole corpus
    # here would materialize the full shingle self-join — the exact
    # all-pairs blowup the LSH stage exists to avoid.)
    # no .distinct() on the id list: a LEFT SEMI join's build side
    # dedupes inside the hash relation, so the exchange a distinct would
    # add buys nothing (ids holds 2 rows per candidate pair — tiny)
    ids = cands.select(F.col("id_a").alias(id_col)).unionByName(
        cands.select(F.col("id_b").alias(id_col))
    )
    # semi-join the DOCS down to candidates BEFORE shingling: tokenizing
    # and exploding n-grams for the whole corpus only to drop all
    # non-candidate rows afterwards is a full wasted corpus pass (the
    # semi-join is id-keyed and cannot be pushed below the explode by
    # Catalyst).  Filtering first shingles candidate docs only —
    # identical output, O(candidates) instead of O(corpus) rerank prep.
    sh = (
        shingles_df(df.join(ids, id_col, "left_semi"), id_col, text_col, n)
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(
            sh.alias("sb"),
            (F.col("id_b") == F.col("sb.id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            # same IEEE double division as jaccard_pairs (oracle-identical)
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


def jaccard_join_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """EXACT set-similarity join with PREFIX FILTERING (AllPairs /
    PPJoin family, Bayardo et al. / Xiao et al.) — recall 1.0 by
    construction, unlike the MinHash-LSH path: any pair with
    Jaccard ≥ t must share a shingle inside each side's prefix.

    Why: |A∩B| ≥ t·|A∪B| ≥ t·|A|, so if a qualifying partner shares
    NOTHING in A's first |A| − ⌈t·|A|⌉ + 1 shingles (ordered rarest-
    first by global document frequency), the intersection is at most
    ⌈t·|A|⌉ − 1 — contradiction.  Candidates therefore join only on
    PREFIX shingles, and the rarest-first ordering makes those prefix
    shingles precisely the ones with the smallest posting lists — the
    candidate join shrinks on both axes (fewer tokens per doc AND
    fewer docs per token), where the plain shared-shingle join
    (:func:`jaccard_pairs`) pays for every common shingle.  The exact
    rerank then touches candidate docs only.

    Output is IDENTICAL to brute-force ``jaccard_pairs`` at the same
    threshold (the oracle states exactly that)."""
    if not 0.0 < min_jaccard <= 1.0:
        raise ValueError(f"min_jaccard={min_jaccard}: need 0 < t <= 1")
    # one corpus tokenization, materialized: the shingle stream feeds
    # the frequency pass, the prefix build, AND the 3-way rerank — the
    # same multi-consumer re-execution minhash_neardup documents
    sh = shingles_df(df, id_col, text_col, n).localCheckpoint(eager=True)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(freq, "shingle")
    lists = ranked.groupBy("id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("shingle")))
        ).alias("seq")
    )
    sz = F.size("seq")
    plen = (sz - F.ceil(F.lit(float(min_jaccard)) * sz) + 1).cast("int")
    prefix = (
        lists.withColumn("__plen", plen)
        .select("id", F.explode(F.expr("slice(seq, 1, __plen)")).alias("p"))
        .select("id", F.col("p.shingle").alias("shingle"))
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint(eager=True)
    )
    # exact rerank over CANDIDATE docs only (same shape as the minhash
    # rerank: semi-join the shingle stream down, count intersections)
    ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    shc = sh.join(ids, "id", "left_semi")
    sizes = shc.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(shc.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(
            shc.alias("sb"),
            (F.col("id_b") == F.col("sb.id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


def minhash_dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.2,
    portable: bool = False,
    corpus_sigs: DataFrame | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """Incremental near-dup dedup: keep the BATCH rows that are neither a
    near-duplicate of any CORPUS doc nor of a lower-id batch doc — the
    growing-corpus ingestion op: each arriving batch dedups against what
    is already indexed WITHOUT re-processing the corpus.

    Scale design: corpus signatures are the INDEX — pass them
    precomputed via ``corpus_sigs`` (stored alongside the corpus; at
    100 TB recomputing them per batch is the cost this op exists to
    avoid) and only the batch runs the shingle->minhash pass.  Both
    candidate joins are band-bucket equi-joins (batch x corpus and batch
    x batch — never corpus x corpus), and the exact-Jaccard rerank reads
    shingles for CANDIDATE docs only on either side.  Within the batch
    the keep rule is greedy keep-first (a doc drops iff a lower-id batch
    doc is a near-dup — same pair-local rule as n2_embedding_dedup, not
    transitive clustering).  Batch and corpus ids must be disjoint."""
    rows_per_band = num_hashes // bands
    # batch signatures feed the cross join AND the intra candidates —
    # materialize once (k longs per batch doc; see minhash_neardup)
    sig_b = minhash_signatures(
        batch, id_col, text_col, n, num_hashes, portable
    ).localCheckpoint(eager=True)
    sig_c = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signatures(corpus, id_col, text_col, n, num_hashes, portable)
    )
    bb = _banded(sig_b, bands, rows_per_band, portable)
    bc = _banded(sig_c, bands, rows_per_band, portable)
    # Hot-bucket guard, cross-join flavor: a CORPUS bucket over the cap
    # contributes only its min-id representative to the batch x corpus
    # candidate join (star) or its max_bucket lowest-id members (sample)
    # — a batch doc colliding with a 10M-member boilerplate bucket pairs
    # with O(1)/O(cap) corpus docs, not all 10M.  The exact rerank below
    # still verifies the emitted pairs; members of a hot bucket are
    # near-identical to the rep by construction, so rep-vs-batch decides.
    if max_bucket is not None:
        if hot_policy not in ("star", "sample"):
            raise ValueError(f"hot_policy={hot_policy!r}: expected 'star' or 'sample'")
        # ONE pass over the corpus banding for count AND star rep: the
        # hot buckets' representatives fall out of the same aggregation
        # (min over a bucket's ids), so the star path never rescans the
        # corpus-sized bc rows — the index side stays at two passes
        # total (stats + tag) and is deliberately NOT materialized
        # (pinning corpus x bands rows defeats the incremental point).
        # The over-cap SUBSET, however, is materialized: it is consumed
        # twice (broadcast guard probe + the hot-rep rows of the union),
        # and left lazy each consumer re-runs the corpus-banding
        # aggregation; the subset is a few rows by construction
        ccnt = bc.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__bcnt"), F.min("id").alias("__rep")
        )
        hot_keys = ccnt.filter(F.col("__bcnt") > max_bucket).localCheckpoint(
            eager=True
        )
        if hot_policy == "star":
            bc_cold = (
                bc.join(
                    F.broadcast(hot_keys.select("band", "bucket")),
                    ["band", "bucket"],
                    "left_anti",
                )
            )
            bc_hot = hot_keys.select(F.col("__rep").alias("id"), "band", "bucket")
        else:
            from pyspark.sql import Window

            tagged = bc.join(
                F.broadcast(hot_keys.select("band", "bucket", "__bcnt")),
                ["band", "bucket"],
                "left",
            )
            bc_cold = tagged.filter(F.col("__bcnt").isNull()).drop("__bcnt")
            bc_hot = tagged.filter(F.col("__bcnt").isNotNull()).drop("__bcnt")
            w = Window.partitionBy("band", "bucket").orderBy("id")
            bc_hot = (
                bc_hot.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= max_bucket)
                .drop("__rn")
            )
        bc = bc_cold.select("id", "band", "bucket").unionByName(
            bc_hot.select("id", "band", "bucket")
        )
    cross = (
        bb.alias("a")
        .join(
            bc.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.id").alias("bid"), F.col("b.id").alias("cid"))
        .dropDuplicates(["bid", "cid"])
    )
    intra = minhash_lsh_candidates(
        sig_b, bands, rows_per_band, portable, max_bucket, hot_policy
    )

    def exact_jaccard(pairs, left_key, right_key, sh_left, sh_right):
        ids_l = pairs.select(F.col(left_key).alias("id")).distinct()
        ids_r = pairs.select(F.col(right_key).alias("id")).distinct()
        sl = sh_left.join(ids_l, "id", "left_semi")
        sr = sh_right.join(ids_r, "id", "left_semi")
        sz_l = sl.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        sz_r = sr.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            pairs.join(sl.alias("sa"), F.col(left_key) == F.col("sa.id"))
            .join(
                sr.alias("sb"),
                (F.col(right_key) == F.col("sb.id"))
                & (F.col("sa.shingle") == F.col("sb.shingle")),
            )
            .groupBy(left_key, right_key)
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.join(
                sz_l.select(F.col("id").alias(left_key), F.col("sz").alias("sz_a")),
                left_key,
            )
            .join(
                sz_r.select(F.col("id").alias(right_key), F.col("sz").alias("sz_b")),
                right_key,
            )
            .select(
                left_key,
                right_key,
                (
                    F.col("inter").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
                ).alias("jaccard"),
            )
        )

    # sh_b feeds both reranks (cross and intra, twice each); the corpus
    # stream stays LAZY — exact_jaccard semi-joins it down to candidate
    # docs before any aggregation, so the full corpus is never
    # materialized (the point of the incremental path)
    sh_b = shingles_df(batch, id_col, text_col, n).localCheckpoint(eager=True)
    sh_c = shingles_df(corpus, id_col, text_col, n)
    cross_dup = (
        exact_jaccard(cross, "bid", "cid", sh_b, sh_c)
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select(F.col("bid").alias(id_col))
    )
    intra_dup = (
        exact_jaccard(intra, "id_a", "id_b", sh_b, sh_b)
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select(F.col("id_b").alias(id_col))  # keep-first: lower id wins
    )
    drops = cross_dup.unionByName(intra_dup).distinct()
    return batch.join(drops, id_col, "left_anti")


def _minhash_cte_sql(
    table: str, id_col: str, text_col: str, n: int, num_hashes: int, bands: int
) -> str:
    """The shared CTE chain (toks -> sh -> mins -> bnd -> cand) that
    reproduces the portable minhash LSH candidate pairs in DuckDB —
    composed by both the Jaccard and the edit-distance rerank oracles."""
    rows_per_band = num_hashes // bands
    grams = " || ' ' || ".join(f"sp[i+{j+1}]" for j in range(n))
    min_cols = ",\n                 ".join(
        "min({h}) AS h{i}".format(h=_pt_hash_sql(f"'mh{i}:' || shingle"), i=i)
        for i in range(num_hashes)
    )
    band_selects = "\n         UNION ALL ".join(
        "SELECT {id}, {b} AS band, md5(concat_ws(',', {cols})) AS bucket FROM mins".format(
            id=id_col,
            b=b,
            cols=", ".join(
                f"CAST(h{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"""toks AS (SELECT {id_col}, string_split({text_col}, ' ') AS sp FROM {table}),
       sh AS (SELECT {id_col},
                     unnest(list_distinct(list_transform(range(0, len(sp)-{n - 1}),
                            i -> {grams}))) AS shingle
              FROM toks WHERE len(sp) >= {n}),
       mins AS (SELECT {id_col},
                 {min_cols}
                FROM sh GROUP BY {id_col}),
       bnd AS ({band_selects}),
       cand AS (SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
                FROM bnd a JOIN bnd b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.{id_col} < b.{id_col})"""


# Planted degenerate-bucket fixture text shared by the hot-bucket-guard
# oracle entries: every third document gets this exact text, creating one
# ~170-member identical bucket at sf0.01 (fixture buckets are otherwise
# far below any realistic cap).
PLANTED_BOILERPLATE = (
    "planted boilerplate text repeated verbatim across every third document"
)


def _planted_src_sql(table: str, id_col: str, text_col: str) -> str:
    return (
        f"src AS (SELECT {id_col}, CASE WHEN {id_col} % 3 = 0 "
        f"THEN '{PLANTED_BOILERPLATE}' ELSE {text_col} END AS {text_col} "
        f"FROM {table})"
    )


def hot_bucket_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 8,
) -> str:
    """DuckDB replay of ``minhash_lsh_candidates`` WITH the hot-bucket
    guard, on a corpus where every third doc carries identical planted
    boilerplate (one degenerate bucket per band).  Emits the candidate
    pair set under BOTH policies, tagged by a ``policy`` column, so the
    oracle pins star (rep-vs-member, O(m) per hot bucket) and sample
    (lowest-``max_bucket`` ids self-join) exactly."""
    cte = _minhash_cte_sql("src", id_col, text_col, n, num_hashes, bands)
    return f"""WITH {_planted_src_sql(table, id_col, text_col)},
       {cte},
       cnt AS (SELECT band, bucket, count(*) AS c FROM bnd GROUP BY 1, 2),
       cold AS (SELECT b.{id_col} AS id, b.band, b.bucket
                FROM bnd b JOIN cnt ON cnt.band = b.band AND cnt.bucket = b.bucket
                WHERE cnt.c <= {max_bucket}),
       hot AS (SELECT b.{id_col} AS id, b.band, b.bucket
               FROM bnd b JOIN cnt ON cnt.band = b.band AND cnt.bucket = b.bucket
               WHERE cnt.c > {max_bucket}),
       cold_pairs AS (SELECT a.id AS id_a, b.id AS id_b
                      FROM cold a JOIN cold b
                        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
       reps AS (SELECT band, bucket, min(id) AS rep FROM hot GROUP BY 1, 2),
       star_hot AS (SELECT r.rep AS id_a, h.id AS id_b
                    FROM hot h JOIN reps r
                      ON r.band = h.band AND r.bucket = h.bucket
                    WHERE h.id <> r.rep),
       star_pairs AS (SELECT DISTINCT id_a, id_b FROM
                      (SELECT * FROM cold_pairs UNION ALL SELECT * FROM star_hot)),
       smp AS (SELECT band, bucket, id,
                      row_number() OVER (PARTITION BY band, bucket ORDER BY id) AS rn
               FROM hot),
       samp_members AS (SELECT band, bucket, id FROM smp WHERE rn <= {max_bucket}),
       samp_hot AS (SELECT a.id AS id_a, b.id AS id_b
                    FROM samp_members a JOIN samp_members b
                      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
       samp_pairs AS (SELECT DISTINCT id_a, id_b FROM
                      (SELECT * FROM cold_pairs UNION ALL SELECT * FROM samp_hot))
       SELECT 'star' AS policy, id_a, id_b FROM star_pairs
       UNION ALL
       SELECT 'sample' AS policy, id_a, id_b FROM samp_pairs"""


def lsh_bucket_stats_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 8,
) -> str:
    """DuckDB replay of :func:`lsh_bucket_stats` on the planted corpus:
    the per-(band, members) bucket histogram with over-cap flags — the
    no-silent-caps report the guard surfaces."""
    cte = _minhash_cte_sql("src", id_col, text_col, n, num_hashes, bands)
    return f"""WITH {_planted_src_sql(table, id_col, text_col)},
       {cte},
       per AS (SELECT band, bucket, count(*) AS members FROM bnd GROUP BY 1, 2)
       SELECT band, members, count(*) AS n_buckets,
              members > {max_bucket} AS over_cap
       FROM per GROUP BY band, members"""


def minhash_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.2,
) -> str:
    """DuckDB SQL reproducing ``minhash_neardup(portable=True)`` EXACTLY:
    the same md5-prefix hashes, the same 32 per-doc minima, the same band
    buckets and candidate join, the same exact-Jaccard rerank.  Lets the
    driver hash-check the approximate scale path, not just the brute one."""
    cte = _minhash_cte_sql(table, id_col, text_col, n, num_hashes, bands)
    return f"""WITH {cte},
       sizes AS (SELECT {id_col}, count(*) AS sz FROM sh GROUP BY {id_col}),
       shared AS (SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
                  GROUP BY 1, 2),
       jac AS (SELECT id_a, id_b,
                      CAST(inter AS DOUBLE)
                           / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
               FROM shared
               JOIN sizes sa ON sa.{id_col} = id_a
               JOIN sizes sb ON sb.{id_col} = id_b)
       SELECT j.id_a, j.id_b, j.jaccard
       FROM jac j JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
       WHERE j.jaccard >= {min_jaccard}"""


def editdist_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 64,
    max_dist: int = 16,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """Character-level near-dup pairs: MinHash-LSH candidates reranked by
    LEVENSHTEIN distance over a ``prefix_len``-char prefix — the
    modality Jaccard misses (small in-place edits barely move token-set
    overlap per shingle but show directly as edit operations; and
    conversely reordered paragraphs keep Jaccard high while edit
    distance explodes).

    Scale: candidate generation is the same band-bucket equi-join as
    every LSH family here (never all-pairs), and the O(prefix_len²) DP
    per pair runs JVM-side (built-in ``levenshtein``) on CANDIDATE
    pairs only, with the prefix cap bounding the per-pair cost no
    matter how long documents get."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, portable)
    cands = minhash_lsh_candidates(
        sigs, bands, num_hashes // bands, portable, max_bucket, hot_policy
    )
    pref = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("pref"),
    )
    return (
        cands.join(
            pref.select(F.col("id").alias("id_a"), F.col("pref").alias("__pa")),
            "id_a",
        )
        .join(
            pref.select(F.col("id").alias("id_b"), F.col("pref").alias("__pb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__pa", "__pb").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= F.lit(max_dist))
    )


def editdist_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 64,
    max_dist: int = 16,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> str:
    """DuckDB replay of ``editdist_neardup(portable=True)``: the shared
    minhash-LSH candidate CTEs + the identical levenshtein rerank."""
    cte = _minhash_cte_sql(table, id_col, text_col, n, num_hashes, bands)
    return f"""WITH {cte}
       SELECT c.id_a, c.id_b,
              CAST(levenshtein(substr(ta.{text_col}, 1, {prefix_len}),
                               substr(tb.{text_col}, 1, {prefix_len})) AS INT)
                  AS edit_dist
       FROM cand c
       JOIN {table} ta ON ta.{id_col} = c.id_a
       JOIN {table} tb ON tb.{id_col} = c.id_b
       WHERE levenshtein(substr(ta.{text_col}, 1, {prefix_len}),
                         substr(tb.{text_col}, 1, {prefix_len})) <= {max_dist}"""


def simhash_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> str:
    """DuckDB SQL reproducing ``simhash_neardup(portable=True)`` (60-bit
    md5-prefix token hash, 4×15-bit band pigeonhole, hamming rerank)."""
    bits = 60
    band_bits = 15
    mask = (1 << band_bits) - 1
    bit_sums = ",\n                 ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    sig_sum = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(bits)
    )
    band_selects = "\n         UNION ALL ".join(
        f"SELECT {id_col}, sig, {b} AS band, (sig >> {band_bits * b}) & {mask} AS key FROM sigs"
        for b in range(4)
    )
    return f"""WITH toks AS (SELECT {id_col},
                     unnest(list_distinct(string_split({text_col}, ' '))) AS tok
              FROM {table}),
       h AS (SELECT {id_col}, {_pt_hash_sql('tok')} AS h FROM toks),
       bs AS (SELECT {id_col},
                 {bit_sums}
              FROM h GROUP BY {id_col}),
       sigs AS (SELECT {id_col}, {sig_sum} AS sig FROM bs),
       bnd AS ({band_selects}),
       cand AS (SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
                       a.sig AS sig_a, b.sig AS sig_b
                FROM bnd a JOIN bnd b
                  ON a.band = b.band AND a.key = b.key
                 AND a.{id_col} < b.{id_col})
       SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
       FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}"""


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", portable: bool = False
) -> DataFrame:
    """SimHash per doc: each distinct token hashes to 64 bits (60 when
    `portable` — md5-prefix hash an external engine can recompute); bit i
    of the signature is the sign of sum(±1 over tokens) at position i.
    JVM-side: explode tokens, aggregate the conditional sums, reassemble."""
    bits = 60 if portable else 64
    df = spread_for_cpu(df)
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    hash_col = portable_hash60(F.col("tok")) if portable else F.xxhash64("tok")
    h = toks.select("id", hash_col.alias("h"))
    bit_sums = h.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", sig.alias("simhash"))


def simhash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    portable: bool = False,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= r, using the 4-band
    pigeonhole: any two signatures within hamming 3 agree exactly on at
    least one of four 16-bit (15-bit portable) bands — join per band,
    then verify.  Hot buckets follow the shared guard
    (:func:`guarded_band_self_join`)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the 4-band pigeonhole only "
            "guarantees recall for hamming <= 3 (r+1 bands cover radius r); "
            "larger radii would silently miss qualifying pairs"
        )
    band_bits = 15 if portable else 16
    mask = (1 << band_bits) - 1
    # one long per doc, materialized: the guard's count/tag/rep joins
    # consume the banded frame several times (see minhash_neardup)
    sigs = simhash64(df, id_col, text_col, portable).localCheckpoint(eager=True)
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", band_bits * b).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = guarded_band_self_join(
        bands,
        carry_cols=("simhash",),
        max_bucket=max_bucket,
        hot_policy=hot_policy,
        key_col="key",
    ).withColumnsRenamed({"simhash_a": "sig_a", "simhash_b": "sig_b"})
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    block_expr: Column | str,
    key_expr: Column | str,
    id_col: str = "doc_id",
    window: int = 5,
) -> DataFrame:
    """SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo 1995) — the
    classic entity-resolution candidate generator beside LSH banding:
    within each BLOCK, sort records by the key and compare each record
    only with its ``window−1`` successors.  Emits candidate pairs
    (id_a, id_b, key_a, key_b) for downstream exact rerank
    (editdist/jaccard); id_a is the sort-order predecessor.

    Deterministic: order within a block is (key, id) — total, so the
    pair set is engine-exact.  Candidates are O(n·window) by
    construction — the blocking guarantee itself; no hot-bucket mode
    beyond the block cardinality, which the caller picks (the paper's
    multi-pass discipline: run again with a different block/key to
    recover cross-block matches).

    Scale shape: ONE block-keyed shuffle, one ordered window pass
    holding ``window−1`` rows of state, explode bounded by window−1.
    Never corpus×corpus, never a single global sort partition."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from pyspark.sql import Window as W

    blk = F.expr(block_expr) if isinstance(block_expr, str) else block_expr
    k = F.expr(key_expr) if isinstance(key_expr, str) else key_expr
    base = df.select(
        F.col(id_col).alias("id"), blk.alias("__blk"), k.alias("__k")
    )
    w = W.partitionBy("__blk").orderBy(F.col("__k").asc(), F.col("id").asc())
    nbrs = base.select(
        "id",
        "__k",
        *[
            F.lead(F.struct(F.col("id").alias("id"), F.col("__k").alias("k")), j)
            .over(w)
            .alias(f"__n{j}")
            for j in range(1, window)
        ],
    )
    pairs = nbrs.select(
        F.col("id").alias("id_a"),
        F.col("__k").alias("key_a"),
        F.explode(
            F.filter(
                F.array(*[F.col(f"__n{j}") for j in range(1, window)]),
                lambda x: x.isNotNull(),
            )
        ).alias("__b"),
    )
    return pairs.select(
        "id_a",
        F.col("__b.id").alias("id_b"),
        "key_a",
        F.col("__b.k").alias("key_b"),
    )

