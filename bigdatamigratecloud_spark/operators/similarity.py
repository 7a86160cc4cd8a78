"""Approximate-nearest-neighbor similarity search over an embedding column
(north-star N2, SURVEY §2.12): brute-force cosine top-k as the exactness
baseline, random-hyperplane LSH bucketing as the scale path.

Scale design (100 TB of embeddings):
- brute force is O(|Q|·|N|) dot products — fine when |Q| is small
  (a broadcast of the query set against a full scan of the corpus; no
  shuffle at all, the top-k is a per-partition heap + final merge, which
  is exactly what Spark's window-rank over (query) with partial
  aggregation does);
- hyperplane LSH: sign-bit signature of d random hyperplanes buckets the
  corpus once (a narrow map + one shuffle to co-locate buckets); queries
  probe only their own bucket (+ optional multi-probe neighbors), turning
  full scans into bucket scans.  Random planes are seeded determinist-
  ically so signatures are reproducible.

The dot products run JVM-side via higher-order array functions
(zip_with + aggregate) — vectorized enough at 64-dim; for very wide
vectors swap in the pandas_udf kernel (`cosine_topk_pandas`), which moves
Arrow batches into numpy and is ~10× faster per row at 1024-dim.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_vector(df: DataFrame, vec_col: str = "embedding", out_col: str = "unit") -> DataFrame:
    from .dedup import spread_for_cpu

    # vector math (normalization, downstream dot-product joins) is the
    # CPU-heavy path; a small embeddings file that fits one scan partition
    # must not pin it to one core (see spread_for_cpu)
    df = spread_for_cpu(df)
    """Pre-normalize: cosine becomes a plain dot product, and norms are
    computed once per corpus row instead of once per (query, row) pair."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(out_col, F.when(n == 0, v).otherwise(F.transform(v, lambda x: x / n)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding self-matches on id).  Query side is
    broadcast — the corpus is scanned once regardless of |Q|."""
    c = with_unit_vector(corpus, vec_col, "cu").select(
        F.col(id_col).alias("nbr_id"), "cu"
    )
    q = with_unit_vector(queries, vec_col, "qu").select(
        F.col(query_id_col).alias("query_id"), "qu"
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", _dot(F.col("qu"), F.col("cu")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.col("cosine").alias("cosine"))
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force L2 top-k (round-8 item #5): for each query the
    k nearest corpus vectors by Euclidean distance, ascending, ties by
    nbr_id.  Same shape as :func:`cosine_topk` — broadcast query side,
    one corpus scan, per-query rank window — on RAW vectors (no
    normalization; L2 is not scale-invariant)."""
    c = corpus.withColumn(
        "cv", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).select(F.col(id_col).alias("nbr_id"), "cv")
    q = queries.withColumn(
        "qv", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).select(F.col(query_id_col).alias("query_id"), "qv")
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.sqrt(_l2sq(F.col("qv"), F.col("cv"))).alias("l2_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("nbr_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "l2_dist")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries_local: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy kernel for wide vectors: queries as a driver-side list
    (broadcast inside the closure), mapInPandas computes per-batch matrix
    products, then a global top-k merge."""
    import numpy as np
    import pandas as pd

    qids = [q[0] for q in queries_local]
    qmat = np.array([q[1] for q in queries_local], dtype="float64")
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)

    def kernel(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype="float64")
            if len(vecs) == 0:
                continue
            norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = (vecs / norms) @ qmat.T  # (batch, nq)
            out = []
            for qi, qid in enumerate(qids):
                order = np.argsort(-sims[:, qi])[: k + 1]
                for j in order:
                    if int(pdf[id_col].iloc[j]) == qid:
                        continue
                    out.append((qid, int(pdf[id_col].iloc[j]), float(sims[j, qi])))
            yield pd.DataFrame(out, columns=["query_id", "nbr_id", "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema="query_id long, nbr_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.col("cosine").alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-based so there is
    no numpy/random dependency in the plan and results are reproducible)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            # map to (-1, 1)
            row.append((state / 0x40000000) - 1.0)
        norm = math.sqrt(sum(x * x for x in row)) or 1.0
        planes.append([x / norm for x in row])
    return planes


def lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 16, vec_col: str = "embedding", out_col: str = "bucket", seed: int = 42
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i).  Vectors
    with small angle collide with probability (1 - θ/π)^bits."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(_dot(v, p) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, sig)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """ANN scale path: bucket corpus + queries by hyperplane signature,
    join on bucket (with multi-probe: also probe buckets within hamming
    `multiprobe_bits` of the query signature), rerank within buckets.

    Recall < 1.0 by construction; raise n_planes↓/multiprobe↑ to trade
    cost for recall.  At 100 TB the bucket join replaces the full scan."""
    c = lsh_bucket(with_unit_vector(corpus, vec_col, "cu"), dim, n_planes, vec_col, "bucket")
    q = lsh_bucket(with_unit_vector(queries, vec_col, "qu"), dim, n_planes, vec_col, "bucket")
    # multiprobe: probe every bucket within hamming `multiprobe_bits` of
    # the query signature (C(n,0)+C(n,1)+... buckets)
    from itertools import combinations

    probes = [F.col("bucket")]
    for r in range(1, multiprobe_bits + 1):
        for bits in combinations(range(n_planes), r):
            mask = 0
            for i in bits:
                mask |= 1 << i
            probes.append(F.col("bucket").bitwiseXOR(F.lit(mask)))
    qx = q.select(
        F.col(query_id_col).alias("query_id"),
        "qu",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    sim = (
        c.select(F.col(id_col).alias("nbr_id"), "cu", "bucket")
        .join(qx, "bucket")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", _dot(F.col("qu"), F.col("cu")).alias("cosine"))
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.col("cosine").alias("cosine"))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup (N2).  Brute self-join baseline; swap the join for
    lsh_bucket co-location at scale."""
    u = with_unit_vector(df, vec_col, "u").select(F.col(id_col).alias("id"), "u")
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _dot(F.col("a.u"), F.col("b.u")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.col("cosine").alias("cosine"))
    )


def cosine_neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 8,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Bucketed near-dup pairs — the SCALE path for cosine_neardup_pairs.

    Candidates are pairs whose hyperplane signatures differ in at most
    `max_hamming` of `n_planes` sign bits; only candidates get a dot
    product.  Realized as a bucket EQUI-join (one side explodes its
    signature's hamming-ball probes), never a cross product: a pair with
    signature xor = m (popcount(m) <= max_hamming) meets exactly once, at
    probe mask m.  Deterministic (seeded planes), so the oracle recomputes
    the identical candidate set in SQL; recall vs the brute baseline is
    pinned separately in tests."""
    from itertools import combinations

    s = lsh_bucket(with_unit_vector(df, vec_col, "u"), dim, n_planes, vec_col, "sig", seed)
    masks = [0]
    for r in range(1, max_hamming + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for i in bits:
                m |= 1 << i
            masks.append(m)
    a = s.select(
        F.col(id_col).alias("id_a"),
        F.col("u").alias("ua"),
        F.explode(
            F.array(*[F.col("sig").bitwiseXOR(F.lit(m)).cast("long") for m in masks])
        ).alias("probe"),
    )
    b = s.select(F.col(id_col).alias("id_b"), F.col("u").alias("ub"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, (F.col("probe") == F.col("sig_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", _dot(F.col("ua"), F.col("ub")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage scale path for
    embedding corpora (4x smaller than float32, 8x than float64; recall
    loss at int8 is typically <1% for cosine ANN).  scale = max|x|/127,
    q_i = round(x_i/scale).  Narrow map, no shuffle; quantized codes are
    emitted comma-joined so downstream (and the driver's row hash) see a
    scalar column."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.concat_ws(",", q.cast("array<string>")).alias("q_csv"),
    )


def lsh_signature_sql(dim: int, n_planes: int = 8, seed: int = 42, vec_expr: str = "v") -> str:
    """DuckDB SQL expression reproducing lsh_bucket's signature bit-exactly
    (plane literals embedded as strings -> correctly-rounded doubles; same
    left-fold dot product, same `> 0` sign test).  Lets the driver's
    oracle check the bucketed path EXACTLY, not just by recall."""
    planes = _hyperplanes(dim, n_planes, seed)
    terms = []
    for i, plane in enumerate(planes):
        lits = ",".join(repr(x) for x in plane)
        dot = (
            f"list_reduce(list_transform(list_zip({vec_expr}, "
            f"list_transform(string_split('{lits}', ','), s -> CAST(s AS DOUBLE))), "
            f"p -> p[1] * p[2]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _ordered_sample(corpus, id_col: str, vec_col: str, n: int):
    """Driver-side sample ordered by id: a bare limit() samples in
    PARTITION order, which changes with the session's parallelism — a
    quantizer (and any pinned recall/pin test built on it) must not
    depend on who runs the query.  Bounded by n, never the corpus."""
    return [
        r[1]
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(n).collect()
    ]


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path -------------

def _kmeans_fit(samples, k: int, iters: int = 10, seed: int = 42):
    """Spherical k-means on a driver-side SAMPLE (numpy).  Training an IVF
    coarse quantizer on a bounded sample is the standard recipe: the
    sample size, not the corpus size, bounds driver memory."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cents)
        for c in range(len(cents)):
            members = x[assign == c]
            new[c] = members.mean(axis=0) if len(members) else cents[c]
        n = np.linalg.norm(new, axis=1, keepdims=True)
        n[n == 0] = 1.0
        cents = new / n
    return cents


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cent_lit(cent):
    return F.array(*[F.lit(float(c)) for c in cent])


def ivf_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    metric: str = "cosine",
) -> DataFrame:
    """Assign every vector to its nearest centroid — JVM-side: one dot
    product (``cosine``/``ip``: argmax) or squared L2 distance
    (``l2``: argmin) per centroid via zip_with/aggregate, pick via
    array_position (ties to the LOWEST centroid index in every metric).
    The centroid list is a plan literal (broadcast by value); assignment
    is a narrow map, no shuffle.  ``cosine`` expects the caller to pass
    unit vectors/centroids (dot == cosine then); ``ip``/``l2`` operate
    on raw vectors."""
    if metric not in ("cosine", "ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if metric == "l2":
        d2s = F.array(*[_l2sq(v, _cent_lit(c)) for c in centroids])
        pick = F.array_position(d2s, F.array_min(d2s)) - 1
    else:
        sims = F.array(*[_dot(v, _cent_lit(c)) for c in centroids])
        pick = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn(out_col, pick.cast("int"))


def ivf_assign_broadcast(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    metric: str = "cosine",
    normalize_centroids: bool = False,
) -> DataFrame:
    """Broadcast-kernel variant of :func:`ivf_assign` for LARGE k·d
    (round-9 item #4): the centroid matrix ships ONCE as a Spark
    broadcast (k=4096, d=256 ≈ 8 MB) instead of k·d plan literals —
    the plan stays O(1) size at any quantizer scale — and one Arrow
    ``mapInPandas`` computes every (row, centroid) score vectorized.
    Zero shuffle, rows independent, exactly like the literal path.

    BIT-IDENTICAL to ``ivf_assign`` by construction: scores accumulate
    dimension-by-dimension (``acc += x_j * c_j`` / ``acc += (x_j -
    c_j)²``), the same left-to-right IEEE fold order as the
    zip_with/aggregate expressions, and ties pick the lowest centroid
    index (numpy's first-argmax == array_position's first match).
    ``normalize_centroids=True`` unit-normalizes the centroids with the
    same fold as ``_norm``/``unit_lit`` (sum of squares left-to-right,
    sqrt, per-component divide) — for cosine callers holding raw
    centroid means.  NULL vectors get NULL clusters (the literal
    path's null propagation)."""
    import numpy as np
    from pyspark.sql import types as T

    if metric not in ("cosine", "ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    if C.ndim != 2 or not C.size:
        raise ValueError("centroids must be a non-empty k x d matrix")
    if normalize_centroids:
        acc = np.zeros(len(C))
        for j in range(C.shape[1]):
            acc = acc + C[:, j] * C[:, j]
        if (acc == 0).any():
            raise ValueError("cannot unit-normalize a zero centroid")
        C = C / np.sqrt(acc)[:, None]
    bc = df.sparkSession.sparkContext.broadcast((C, metric))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def run(batches):
        Cw, met = bc.value
        k, d = Cw.shape
        for pdf in batches:
            vals = [
                None if v is None else np.asarray(v, dtype=np.float64)
                for v in pdf[vec_col]
            ]
            live = [i for i, v in enumerate(vals) if v is not None]
            picks = [None] * len(vals)
            if live:
                X = np.stack([vals[i] for i in live])
                if X.shape[1] != d:
                    raise ValueError(
                        f"ivf_assign_broadcast: vector dim {X.shape[1]} != "
                        f"centroid dim {d}"
                    )
                acc = np.zeros((len(live), k))
                if met == "l2":
                    for j in range(d):
                        dlt = X[:, j : j + 1] - Cw[:, j]
                        acc = acc + dlt * dlt
                    best = np.argmin(acc, axis=1)
                else:
                    for j in range(d):
                        acc = acc + X[:, j : j + 1] * Cw[:, j]
                    best = np.argmax(acc, axis=1)
                for i, b in zip(live, best):
                    picks[i] = int(b)
            out = pdf.copy()
            out[out_col] = picks
            yield out

    return df.mapInPandas(run, out_schema)


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (driver-fit on a sample) buckets
    the corpus into inverted lists; each query probes only its n_probe
    nearest lists and brute-forces within them.  Scan fraction ≈
    n_probe/n_centroids — at 100 TB with 4096 lists and 8 probes that is
    ~0.2% of the corpus per query, and the per-list scan parallelizes
    like any filtered columnar read (cluster id is a partition-prunable
    column when the index is written out partitioned by it)."""
    sample = _ordered_sample(corpus, id_col, vec_col, sample_size)
    cents = _kmeans_fit(sample, n_centroids, seed=seed)

    c = ivf_assign(with_unit_vector(corpus, vec_col, "cu"), cents, vec_col, "cluster").select(
        F.col(id_col).alias("nbr_id"), "cu", "cluster"
    )

    # per-query probe assignment runs DISTRIBUTED, JVM-side: the centroid
    # matrix is a plan literal (n_centroids × dim doubles, broadcast by
    # value), each query row computes its centroid sims and keeps the
    # n_probe best via an array sort over (−sim, idx) structs — no
    # driver-side collect of the query frame.  Struct sort breaks float
    # ties by centroid index, deterministically.
    sims = F.array(
        *[_dot(F.col("qu"), F.array(*[F.lit(float(x)) for x in cent])) for cent in cents]
    )
    pairs = F.transform(sims, lambda s, i: F.struct((-s).alias("neg_sim"), i.alias("idx")))
    probed = F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe), lambda p: p["idx"].cast("int")
    )
    # probe lists explode to (query, cluster) rows and the probe is a
    # plain EQUI-join on cluster — shuffle-partitionable, AQE-broadcast
    # when the query set is small, and skew-splittable when it is not.
    # Together with the distributed assignment above, a query-set-as-
    # dataset (millions of queries) runs without any driver or broadcast
    # bottleneck; candidates are identical to the array_contains form
    # (each corpus row has ONE cluster and probe lists are distinct).
    q = (
        with_unit_vector(queries, vec_col, "qu")
        .select(F.col(query_id_col).alias("query_id"), "qu")
        .withColumn("cluster", F.explode(probed))
    )

    sim = (
        c.join(q, "cluster")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", _dot(F.col("qu"), F.col("cu")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.col("cosine").alias("cosine"))
    )


# --- PQ (product quantization) ANN: the memory-compression scale path -----

def _unit_centroids(centroids) -> list[list[float]]:
    """Unit-normalize a centroid list driver-side: cosine assignment and
    probing need unit centroids; arbitrary quantizers (e.g. per-label
    means) are not unit-norm."""
    out = []
    for c in centroids:
        n = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        out.append([float(x) / n for x in c])
    return out


def ivf_index_write(
    df: DataFrame,
    centroids,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    metric: str = "cosine",
    assume_unit: bool = False,
) -> None:
    """Materialize an IVF index on disk: vectors (stored as ``cu``)
    partitioned by their nearest-centroid ``cluster`` — the layout that
    turns probing into STATIC partition pruning at the parquet source.
    Assignment is a narrow JVM map (centroid matrix as a plan literal);
    the write is one corpus pass, no shuffle beyond the partitioned
    sink.

    ``metric``: ``cosine`` (default) stores UNIT-normalized vectors and
    assigns by cosine argmax against unit centroids (correct for ANY
    quantizer, raw per-label means included); ``l2``/``ip`` store RAW
    double vectors and assign by squared-L2 argmin / dot argmax — the
    metrics embedding stores routinely serve (round-8 item #5).

    ``assume_unit`` (cosine only): the input vectors are ALREADY unit —
    pass them through bit-exactly instead of re-normalizing.  Used by
    :func:`ivf_index_retrain`, whose input is the stored index itself:
    re-normalizing an already-unit vector is not an IEEE no-op, and the
    retrain ≡ from-scratch-rebuild equality needs byte-identical cu."""
    raw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if metric == "cosine":
        cents_use = _unit_centroids(centroids)
        base = df.withColumn("cu", raw) if assume_unit else with_unit_vector(df, vec_col, "cu")
    else:
        cents_use = [[float(x) for x in c] for c in centroids]
        base = df.withColumn("cu", raw)
    assigned = ivf_assign(base, cents_use, "cu", "cluster", metric=metric).select(
        F.col(id_col).alias("vec_id"), "cu", "cluster"
    )
    # co-partition by cluster before the partitioned sink: without it
    # EVERY task writes one file per cluster it happens to see
    # (tasks × clusters small files at scale); after it, total file
    # count ≈ cluster count per write
    assigned.repartition(F.col("cluster")).write.partitionBy("cluster").mode(
        mode
    ).parquet(index_dir)


def ivf_index_append(
    batch: DataFrame,
    centroids,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> None:
    """Incremental IVF maintenance — the ANN twin of
    ``minhash_dedup_incremental``: a NEW batch of vectors is assigned to
    the EXISTING centroids (one narrow pass over the batch, the stored
    corpus is never read) and appended to the partitioned inverted
    lists.  Append cost scales with the batch, not the corpus; the
    resulting index is IDENTICAL to a from-scratch rebuild with the same
    centroids, because assignment is per-vector and centroid-only.

    The standard caveat applies (same as FAISS's add-after-train): the
    quantizer is NOT refit, so heavy drift in the incoming distribution
    degrades list balance until the next retrain — detectable by
    monitoring per-cluster counts (:func:`ivf_index_stats`) and fixed
    by :func:`ivf_index_retrain` — both round-8 additions."""
    ivf_index_write(
        batch, centroids, index_dir, id_col, vec_col, mode="append", metric=metric
    )


def ivf_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    centroids,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "cosine",
) -> DataFrame:
    """Query a disk-resident IVF index: per-query probe lists are chosen
    JVM-side against the plan-literal centroids, the probed clusters are
    collected (bounded: n_queries × n_probe ids) into a static partition
    filter, and only those cluster directories are scanned.

    ``metric`` must match the index's write metric: ``cosine`` emits
    (query_id, nbr_id, rank, cosine) ranked by cosine DESC; ``ip``
    emits ``ip`` (raw dot) DESC; ``l2`` emits ``l2_dist`` (sqrt of the
    exact squared distance) ASC.  Ties break by nbr_id in all three."""
    if metric not in ("cosine", "ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    if metric == "cosine":
        cents = _unit_centroids(centroids)
        q0 = with_unit_vector(queries, vec_col, "qu")
    else:
        cents = [[float(x) for x in c] for c in centroids]
        q0 = queries.withColumn(
            "qu", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
    if metric == "l2":
        keys = F.array(*[_l2sq(F.col("qu"), _cent_lit(c)) for c in cents])
        pairs = F.transform(keys, lambda s, i: F.struct(s.alias("key"), i.alias("idx")))
    else:
        keys = F.array(*[_dot(F.col("qu"), _cent_lit(c)) for c in cents])
        pairs = F.transform(
            keys, lambda s, i: F.struct((-s).alias("key"), i.alias("idx"))
        )
    probed = F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe), lambda p: p["idx"].cast("int")
    )
    q = (
        q0.select(F.col(query_id_col).alias("query_id"), "qu")
        .withColumn("cluster", F.explode(probed))
    )
    wanted = sorted(
        {r["cluster"] for r in q.select("cluster").distinct().collect()}
    )
    idx = spark.read.parquet(index_dir).where(F.col("cluster").isin(wanted))
    cand = idx.join(q, "cluster").filter(F.col("vec_id") != F.col("query_id"))
    if metric == "l2":
        score_col, asc = "l2_dist", True
        score = F.sqrt(_l2sq(F.col("qu"), F.col("cu")))
    else:
        score_col, asc = ("cosine" if metric == "cosine" else "ip"), False
        score = _dot(F.col("qu"), F.col("cu"))
    sim = cand.select("query_id", F.col("vec_id").alias("nbr_id"), score.alias(score_col))
    order = F.col(score_col).asc() if asc else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("int").alias("rank"), score_col)
    )


def ivf_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-cluster inverted-list sizes — the balance diagnostic that
    detects quantizer drift and triggers :func:`ivf_index_retrain`
    (round-8 items #2/#6).  One aggregation keyed by the PARTITION
    column: the scan reads no data columns (column pruning leaves only
    the directory-derived ``cluster``), so cost is row-count metadata
    work, not index bytes."""
    return (
        spark.read.parquet(index_dir)
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ivf_index_retrain(
    spark: SparkSession,
    index_dir: str,
    n_centroids: int | None = None,
    new_centroids=None,
    iters: int = 5,
    seed: int = 42,
    metric: str = "cosine",
):
    """Refit the coarse quantizer and REWRITE the index — the fix for
    the drift caveat :func:`ivf_index_append` documents (round-8 item
    #2): appends never refit centroids, so a drifting stream degrades
    list balance (visible in :func:`ivf_index_stats`) and recall until
    a retrain.

    Two modes: pass ``new_centroids`` explicitly (e.g. externally
    trained, or the deterministic per-label means the oracle entries
    use), or pass ``n_centroids`` to refit via the existing
    :func:`kmeans_distributed` over the STORED vectors (cosine metric —
    for l2/ip pass explicit centroids).  Either way the stored vectors
    are re-assigned in one pass (read straight from the old index —
    the raw corpus is never touched) and written to a staging dir,
    which then REPLACES the index via one atomic directory EXCHANGE
    (``renameat2(RENAME_EXCHANGE)`` — no instant where the index path
    is missing; readers holding the old DataFrame keep their snapshot
    since parquet files are immutable, new readers see strictly
    old-or-new).  Where exchange is unsupported the two-rename
    fallback applies — see :func:`_replace_index_tree` for its brief
    unavailability window and crash recovery.  On an object store,
    write under a versioned prefix and flip a pointer object instead —
    same shape as AcidTable's commit protocol.

    The rewritten index is IDENTICAL to a from-scratch
    ``ivf_index_write`` with the same centroids (assignment is
    per-vector and centroid-only; ``assume_unit`` passes the stored
    unit vectors through bit-exactly) — pinned by the
    ``ann_ivf_retrain`` oracle entry and the drift-recovery test.
    Returns the new centroids."""
    stored = spark.read.parquet(index_dir).select("vec_id", "cu")
    if new_centroids is None:
        if n_centroids is None:
            raise ValueError("pass n_centroids or new_centroids")
        if metric != "cosine":
            raise ValueError("kmeans refit is spherical: pass explicit centroids for l2/ip")
        _, cents, _ = kmeans_distributed(
            stored.select("vec_id", F.col("cu").alias("embedding")),
            k=n_centroids,
            iters=iters,
            seed=seed,
        )
        new_centroids = cents
    staging = index_dir.rstrip("/") + "__retrain_staging"
    backup = index_dir.rstrip("/") + "__retrain_old"
    ivf_index_write(
        stored,
        new_centroids,
        staging,
        id_col="vec_id",
        vec_col="cu",
        metric=metric,
        assume_unit=(metric == "cosine"),
    )
    _replace_index_tree(index_dir, staging, backup)
    return [[float(x) for x in c] for c in new_centroids]


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically SWAP two directories via Linux ``renameat2(...,
    RENAME_EXCHANGE)`` (one syscall, no instant where either path is
    absent).  Returns False when unavailable (non-Linux libc, old
    kernel, or a filesystem that rejects exchange — e.g. some network
    mounts return EINVAL) so callers can fall back to two renames."""
    import ctypes
    import ctypes.util
    import os

    try:
        libc = ctypes.CDLL(
            ctypes.util.find_library("c") or "libc.so.6", use_errno=True
        )
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    return (
        fn(
            AT_FDCWD,
            os.fsencode(a),
            AT_FDCWD,
            os.fsencode(b),
            RENAME_EXCHANGE,
        )
        == 0
    )


def _replace_index_tree(index_dir: str, staging: str, backup: str) -> None:
    """Publish ``staging`` as the new ``index_dir`` (retrain/compact
    swap).  Preferred path: one atomic ``renameat2(RENAME_EXCHANGE)``
    — new readers see strictly old-or-new, with NO window where
    ``index_dir`` does not exist (the old tree lands at the staging
    path and is removed after the ``_txn`` markers are carried over).

    Fallback (exchange unsupported): two sequential renames, which
    leave a brief window where ``index_dir`` is absent (a reader
    opening in that instant errors and should retry) and, if the
    process crashes between them, the old tree parked at ``backup`` —
    recovery is ``os.rename(backup, index_dir)``.  On an object store
    neither rename is atomic: write under a versioned prefix and flip
    a pointer object instead (AcidTable's commit shape)."""
    import os
    import shutil

    if _exchange_dirs(index_dir, staging):
        _carry_txn_markers(staging, index_dir)
        shutil.rmtree(staging)
        return
    os.rename(index_dir, backup)
    os.rename(staging, index_dir)
    _carry_txn_markers(backup, index_dir)
    shutil.rmtree(backup)


def _carry_txn_markers(old_root: str, new_root: str) -> None:
    """Swap-style rewrites (retrain/compact) rebuild the index tree from
    its ROWS — which silently discards the ``_txn`` batch markers
    :func:`~..streaming.events.ivf_index_sink` uses for exactly-once
    replay detection.  Carry them across the swap: a replayed streaming
    batch after a retrain/compaction must still be a no-op."""
    import os

    txn = os.path.join(old_root, "_txn")
    if os.path.isdir(txn):
        os.rename(txn, os.path.join(new_root, "_txn"))


def ivf_index_compact(spark: SparkSession, index_dir: str) -> None:
    """Compact the small files :func:`ivf_index_append` accumulates —
    the operational twin of AcidTable.compact (round 8): every append
    writes ≈1 file per touched cluster, so a long-running ingest leaves
    O(appends × clusters) files and each probe pays per-file open/
    footer cost.  One cluster-keyed repartition + partitioned rewrite
    coalesces each inverted list back to a single file (rows preserved
    exactly — this is a pure layout change), then the rewritten tree
    replaces the index with the same atomic-exchange swap as
    :func:`ivf_index_retrain` (:func:`_replace_index_tree`).  Run it on
    the stats trigger (file count, not row count) or on a schedule,
    like any LSM-ish store."""
    stored = spark.read.parquet(index_dir)
    staging = index_dir.rstrip("/") + "__compact_staging"
    backup = index_dir.rstrip("/") + "__compact_old"
    (
        stored.repartition(F.col("cluster"))
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(staging)
    )
    _replace_index_tree(index_dir, staging, backup)


def _kmeans_l2(samples, k: int, iters: int = 10, seed: int = 42):
    """Plain L2 k-means on a driver-side sample (numpy) — PQ codebooks
    quantize raw subvectors, so no spherical normalization here."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_fit(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    unit: bool = True,
):
    """Fit PQ codebooks on a bounded, scan-order-independent sample
    (ordered by id, like the IVF quantizer): the vector — UNIT-
    normalized for the cosine path (default), RAW for the L2 path
    (``unit=False``) — is split into ``m`` subvectors and each subspace
    gets its own ``k_codes``-entry L2 codebook.  Returns a list of m
    (k_codes x dsub) float arrays.  Driver memory is bounded by the
    sample, never the corpus."""
    if unit:
        base = with_unit_vector(corpus, vec_col, "u")
    else:
        base = corpus.withColumn(
            "u", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
    rows = (
        base
        .select(id_col, "u")
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    dim = len(rows[0]["u"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = [r["u"][j * dsub : (j + 1) * dsub] for r in rows]
        books.append(_kmeans_l2(sub, k_codes, seed=seed + j))
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
    unit: bool = True,
) -> DataFrame:
    """Encode every vector as ``m`` small codes (nearest codebook entry
    per subspace, L2, ties to the lower code).  64 floats -> 8 codes:
    the 32x memory compression that lets a 100 TB embedding corpus sit
    scan-resident.  All JVM expressions (slice + aggregate HOFs inside
    whole-stage codegen): a narrow map, no shuffle, no UDF."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    u = F.col("__pq_u")
    code_cols = []
    for j, book in enumerate(codebooks):
        sub = F.slice(u, j * dsub + 1, dsub)
        d2s = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in cent]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for cent in book
            ]
        )
        code_cols.append((F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"))
    if unit:
        base = with_unit_vector(df, vec_col, "__pq_u")
    else:
        base = df.withColumn(
            "__pq_u", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
    return base.withColumn(out_col, F.array(*code_cols)).drop("__pq_u")


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 16,
    k_codes: int = 32,
    sample_size: int = 2048,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC) + exact rerank:
    the corpus is scanned as codes only; each query precomputes a lookup
    table of dot(query_sub, codebook_entry) per (subspace, code) — a
    plan-literal m x k_codes grid — and a candidate's approximate cosine
    is the sum of m table hits, reconstructed JVM-side from its code
    array.  The top ``k * rerank_factor`` by ADC then fetch their full
    vectors for an exact cosine re-rank (the standard PQ recipe: the
    shortlist join touches k·factor rows per query, not the corpus).

    Scale shape: encoding and ADC scoring are narrow maps over the code
    column (16 bytes/vector instead of 256 — the corpus that did not fit
    in page cache now does); the query set broadcasts like brute force;
    the rerank is a semi-join-sized fetch.  For massive query sets
    compose with IVF (bucket first, ADC within the probed lists —
    IVF-PQ) rather than widening this scan.  ``rerank_factor=1``
    disables reranking (pure ADC ordering)."""
    books = pq_fit(corpus, m, k_codes, sample_size, id_col, vec_col, seed)
    dsub = len(books[0][0])
    enc = pq_encode(corpus, books, id_col, vec_col, "codes").select(
        F.col(id_col).alias("nbr_id"), "codes"
    )
    # per-query LUT: array over subspaces of array over codes of
    # dot(q_sub, code) — built from plan-literal codebooks, JVM-side
    qu = F.col("qu")
    lut = F.array(
        *[
            F.array(
                *[
                    _dot(
                        F.slice(qu, j * dsub + 1, dsub),
                        F.array(*[F.lit(float(x)) for x in cent]),
                    )
                    for cent in book
                ]
            )
            for j, book in enumerate(books)
        ]
    )
    q = (
        with_unit_vector(queries, vec_col, "qu")
        .select(F.col(query_id_col).alias("query_id"), lut.alias("__lut"))
    )
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda c, row: F.element_at(row, (c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", score.alias("adc_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("nbr_id").asc()
    )
    shortlist = (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank_factor))
        .select("query_id", "nbr_id", "rank", "adc_cosine")
    )
    if rerank_factor <= 1:
        return shortlist
    # exact rerank: fetch full vectors ONLY for the shortlist
    cu = with_unit_vector(corpus, vec_col, "cu").select(
        F.col(id_col).alias("nbr_id"), "cu"
    )
    qu2 = with_unit_vector(queries, vec_col, "qu2").select(
        F.col(query_id_col).alias("query_id"), "qu2"
    )
    exact = (
        shortlist.select("query_id", "nbr_id")
        .join(cu, "nbr_id")
        .join(F.broadcast(qu2), "query_id")
        .select("query_id", "nbr_id", _dot(F.col("qu2"), F.col("cu")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cosine")
    )


def pq_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 16,
    k_codes: int = 32,
    sample_size: int = 2048,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """PQ ANN under the L2 metric (round-8 item #5): the standard
    Jégou-et-al ADC — codebooks fit on RAW subvectors, each query
    precomputes a plan-literal m × k_codes table of SQUARED sub-
    distances ||q_j − c_{j,code}||², a candidate's approximate d² is
    the sum of m table hits reconstructed from its code array, and the
    top k·rerank_factor by ADC fetch full vectors for an exact L2
    rerank (ascending, ties by nbr_id).  Same scale shape as
    :func:`pq_cosine_topk` — narrow code-column scan, broadcast query
    LUTs, shortlist-sized rerank join; emits (query_id, nbr_id, rank,
    l2_dist)."""
    books = pq_fit(corpus, m, k_codes, sample_size, id_col, vec_col, seed, unit=False)
    dsub = len(books[0][0])
    enc = pq_encode(corpus, books, id_col, vec_col, "codes", unit=False).select(
        F.col(id_col).alias("nbr_id"), "codes"
    )
    qv = F.col("qv")
    lut = F.array(
        *[
            F.array(
                *[
                    _l2sq(F.slice(qv, j * dsub + 1, dsub), _cent_lit(cent))
                    for cent in book
                ]
            )
            for j, book in enumerate(books)
        ]
    )
    q = queries.withColumn(
        "qv", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).select(F.col(query_id_col).alias("query_id"), "qv", lut.alias("__lut"))
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda c, row: F.element_at(row, (c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = (
        enc.crossJoin(F.broadcast(q.select("query_id", "__lut")))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", score.alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("nbr_id").asc()
    )
    shortlist = (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank_factor))
        .select("query_id", "nbr_id", "rank", "adc_d2")
    )
    if rerank_factor <= 1:
        return shortlist
    cv = corpus.withColumn(
        "cv", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).select(F.col(id_col).alias("nbr_id"), "cv")
    exact = (
        shortlist.select("query_id", "nbr_id")
        .join(cv, "nbr_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .select(
            "query_id",
            "nbr_id",
            F.sqrt(_l2sq(F.col("qv"), F.col("cv"))).alias("l2_dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("nbr_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "l2_dist")
    )


def ivfpq_index_write(
    df: DataFrame,
    centroids,
    codebooks,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persistent IVF-PQ index (round 8) — the disk artifact FAISS's
    IVFx,PQy serves from: each row stores ONLY (vec_id, codes) — 16
    bytes of PQ codes instead of a 512-byte vector, a 32× smaller
    index — partitioned by the coarse cluster so probing is static
    partition pruning.  Full vectors stay in the source corpus and are
    touched only by the rerank's shortlist-sized id join
    (:func:`ivfpq_index_query`).  One corpus pass: encode (narrow,
    plan-literal codebooks) + assign (narrow, plan-literal centroids) +
    cluster-co-partitioned partitioned write."""
    ucents = _unit_centroids(centroids)
    enc = pq_encode(df, codebooks, id_col, vec_col, "codes")
    assigned = ivf_assign(
        with_unit_vector(enc, vec_col, "cu"), ucents, "cu", "cluster"
    ).select(F.col(id_col).alias("vec_id"), "codes", "cluster")
    assigned.repartition(F.col("cluster")).write.partitionBy("cluster").mode(
        mode
    ).parquet(index_dir)


def ivfpq_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    codebooks,
    k: int = 10,
    n_probe: int = 6,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve ANN from a disk-resident IVF-PQ index: probe lists chosen
    JVM-side, the probed cluster DIRECTORIES pruned statically, ADC
    scoring over the 16-byte code rows (per-query lookup table as a
    plan literal), then an exact cosine rerank that joins the top
    k·rerank_factor ids back to the FULL-vector corpus.  The scan cost
    is (probed fraction × code bytes); full vectors are read for
    shortlist rows only — the composition that keeps a 100 TB corpus
    servable."""
    cents = _unit_centroids(centroids)
    dsub = len(codebooks[0][0])
    sims = F.array(*[_dot(F.col("qu"), _cent_lit(c)) for c in cents])
    pairs = F.transform(sims, lambda s, i: F.struct((-s).alias("key"), i.alias("idx")))
    probed = F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe), lambda p: p["idx"].cast("int")
    )
    qu = F.col("qu")
    lut = F.array(
        *[
            F.array(
                *[
                    _dot(F.slice(qu, j * dsub + 1, dsub), _cent_lit(cent))
                    for cent in book
                ]
            )
            for j, book in enumerate(codebooks)
        ]
    )
    q = (
        with_unit_vector(queries, vec_col, "qu")
        .select(F.col(query_id_col).alias("query_id"), "qu", lut.alias("__lut"))
        .withColumn("cluster", F.explode(probed))
    )
    wanted = sorted({r["cluster"] for r in q.select("cluster").distinct().collect()})
    idx = spark.read.parquet(index_dir).where(F.col("cluster").isin(wanted))
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda c, row: F.element_at(row, (c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = (
        idx.join(q.select("query_id", "cluster", "__lut"), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("nbr_id"), score.alias("adc_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("nbr_id").asc()
    )
    shortlist = (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank_factor))
        .select("query_id", "nbr_id")
    )
    cu = with_unit_vector(corpus, vec_col, "cu").select(
        F.col(id_col).alias("nbr_id"), "cu"
    )
    qu2 = with_unit_vector(queries, vec_col, "qu2").select(
        F.col(query_id_col).alias("query_id"), "qu2"
    )
    exact = (
        shortlist.join(cu, "nbr_id")
        .join(F.broadcast(qu2), "query_id")
        .select("query_id", "nbr_id", _dot(F.col("qu2"), F.col("cu")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 6,
    m: int = 16,
    k_codes: int = 32,
    sample_size: int = 2048,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the composition that serves 100 TB ANN in practice
    (FAISS's IVFx,PQy).  The IVF coarse quantizer prunes the scan to
    ~n_probe/n_centroids of the corpus (cluster id is the partition
    key of the stored index); WITHIN the probed lists candidates are
    scored from their 16-byte PQ codes via the query's ADC lookup
    table, so the probed fraction is read as codes, not vectors; the
    top k*rerank_factor then fetch full vectors for an exact cosine
    rerank.  Every stage reuses the audited pieces: distributed probe
    assignment (no driver collect of queries), plan-literal codebooks,
    equi-join on cluster (AQE-broadcast/skew-splittable), shortlist-
    sized rerank join."""
    # coarse quantizer + corpus assignment (same recipe as ivf_cosine_topk)
    sample = _ordered_sample(corpus, id_col, vec_col, sample_size)
    cents = _kmeans_fit(sample, n_centroids, seed=seed)
    books = pq_fit(corpus, m, k_codes, sample_size, id_col, vec_col, seed)
    dsub = len(books[0][0])

    enc = pq_encode(corpus, books, id_col, vec_col, "codes")
    c = ivf_assign(enc, cents, vec_col, "cluster").select(
        F.col(id_col).alias("nbr_id"), "cluster", "codes"
    )

    # query side: probe lists + ADC lookup table, both JVM-side
    sims = F.array(
        *[_dot(F.col("qu"), F.array(*[F.lit(float(x)) for x in cent])) for cent in cents]
    )
    pairs = F.transform(sims, lambda s, i: F.struct((-s).alias("neg_sim"), i.alias("idx")))
    probed = F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe), lambda p: p["idx"].cast("int")
    )
    qu = F.col("qu")
    lut = F.array(
        *[
            F.array(
                *[
                    _dot(
                        F.slice(qu, j * dsub + 1, dsub),
                        F.array(*[F.lit(float(x)) for x in cent]),
                    )
                    for cent in book
                ]
            )
            for j, book in enumerate(books)
        ]
    )
    q = (
        with_unit_vector(queries, vec_col, "qu")
        .select(
            F.col(query_id_col).alias("query_id"),
            probed.alias("__probes"),
            lut.alias("__lut"),
        )
        .withColumn("cluster", F.explode("__probes"))
        .select("query_id", "cluster", "__lut")
    )

    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda cc, row: F.element_at(row, (cc + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = (
        c.join(q, "cluster")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", score.alias("adc_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("nbr_id").asc()
    )
    shortlist = (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank_factor))
        .select("query_id", "nbr_id")
    )
    cu = with_unit_vector(corpus, vec_col, "cu").select(
        F.col(id_col).alias("nbr_id"), "cu"
    )
    qu2 = with_unit_vector(queries, vec_col, "qu2").select(
        F.col(query_id_col).alias("query_id"), "qu2"
    )
    exact = (
        shortlist.join(cu, "nbr_id")
        .join(F.broadcast(qu2), "query_id")
        .select("query_id", "nbr_id", _dot(F.col("qu2"), F.col("cu")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cosine")
    )


# --- distributed k-means: the iterative-algorithm scale path --------------

def kmeans_distributed(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
):
    """Spherical k-means over the FULL corpus, distributed: unlike the
    sampled `_kmeans_fit` (which trains IVF quantizers on a driver-side
    sample), every iteration here is two corpus-wide Spark jobs —

      assign:  nearest-centroid argmax with the k x d centroid matrix
               as a plan literal (narrow map, no shuffle, codegen);
      update:  per-(cluster, dim) DECIMAL-exact mean via posexplode —
               one shuffle keyed by (cluster, dim), k x d result rows
               collected to the driver (bounded by k*d, never the data).

    Decimal sums make each centroid update order-independent, so the
    whole trajectory — and the final assignment — is deterministic on
    any cluster size, which is what the pinned tests rely on.  Empty
    clusters keep their previous centroid (the standard fix).  Returns
    (assignments DataFrame [id, cluster], centroids list, inertia list
    — mean cosine to own centroid per iteration, monotone
    non-decreasing for spherical k-means)."""
    from decimal import Decimal

    sample = _ordered_sample(corpus, id_col, vec_col, sample_size)
    if not sample:
        raise ValueError("kmeans_distributed on an empty corpus")
    cents = [[float(x) for x in row] for row in _kmeans_fit(sample, k, iters=0, seed=seed)]
    if len(cents) < k:
        # fewer vectors than requested clusters: shrink k instead of
        # indexing past the centroid list in the update loop
        k = len(cents)
    # iterated corpus-wide: normalize once, not once per job
    unit = with_unit_vector(corpus, vec_col, "__u").select(id_col, "__u").cache()
    inertia = []
    for _ in range(iters):
        assigned = ivf_assign(unit, cents, "__u", "cluster")
        # decimal-exact per-(cluster, dim) sums -> deterministic means
        cells = (
            assigned.select(
                "cluster", F.posexplode("__u").alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(28,18)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (r["s"], r["n"])
        new_cents = []
        for c in range(k):
            if c not in by_cluster:
                new_cents.append(cents[c])  # empty cluster: keep previous
                continue
            dims = by_cluster[c]
            mean = [float(Decimal(str(dims[d][0])) / dims[d][1]) for d in range(len(cents[c]))]
            norm = sum(x * x for x in mean) ** 0.5 or 1.0
            new_cents.append([x / norm for x in mean])
        cents = new_cents
        sims = F.array(
            *[_dot(F.col("__u"), F.array(*[F.lit(float(x)) for x in cent])) for cent in cents]
        )
        it = (
            unit.select(F.array_max(sims).alias("best"))
            .agg(
                (
                    F.sum(F.col("best").cast("decimal(28,18)"))
                    / F.count(F.lit(1))
                ).cast("double")
            )
            .first()[0]
        )
        inertia.append(float(it))
    assignments = ivf_assign(unit, cents, "__u", "cluster").select(id_col, "cluster")
    # materialize before releasing the cached normalization
    assignments = assignments.localCheckpoint(eager=True)
    unit.unpersist()
    return assignments, cents, inertia


# --- Johnson-Lindenstrauss random projection (dimensionality reduction) ---

def jl_project(
    df: DataFrame,
    dim: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    out_col: str = "jl",
    seed: int = 7,
) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    each output coordinate is the dot product with a seeded pseudo-random
    unit direction (the same LCG family as the LSH hyperplanes, so the
    matrix is a plan literal and an external engine replays every
    coordinate bit-for-bit).  Pairwise angles are approximately preserved
    at d_out = O(log n / eps^2); downstream cosine work re-normalizes in
    the projected space, so the (constant) JL scale factor cancels and is
    omitted.

    The 4x-16x narrower vectors are the cheap first pass for ANN /
    near-dup at 100 TB: project once (narrow map, zero shuffle, the
    matrix lives in the plan), shortlist in the small space, rerank the
    shortlist with full-width vectors — the full-width corpus is only
    touched for candidates.

    Guards (round-10 sweep, NULL case round-11): d_out must be >= 1 (a
    0-wide projection silently shortlists garbage); a row whose vector
    length is not ``dim`` raises at runtime instead of emitting the
    silently-NULL coordinates zip_with would produce on a length
    mismatch; a NULL vector projects to NULL (corpora legitimately
    carry rows with no embedding — the guard must not convert them
    into a job failure, and ``F.size(NULL)`` is NULL so the equality
    branch alone would route them to the error arm).
    """
    if d_out < 1:
        raise ValueError(f"d_out must be >= 1, got {d_out}")
    planes = _hyperplanes(dim, d_out, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    coords = [_dot(v, F.array(*[F.lit(x) for x in p])) for p in planes]
    return df.withColumn(
        out_col,
        F.when(F.col(vec_col).isNull(), F.lit(None).cast("array<double>"))
        .when(F.size(F.col(vec_col)) == dim, F.array(*coords))
        .otherwise(
            F.raise_error(
                F.lit(f"jl_project: vector length != dim={dim}")
            )
        ),
    )


def jl_project_broadcast(
    df: DataFrame,
    dim: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    out_col: str = "jl",
    seed: int = 7,
) -> DataFrame:
    """Broadcast-kernel twin of :func:`jl_project` for LARGE dim x d_out
    (the same plan-literal escape as :func:`ivf_assign_broadcast`): the
    seeded projection matrix ships once as a Spark broadcast and one
    Arrow kernel projects each batch, accumulating DIMENSION-BY-
    DIMENSION so every output double reproduces the zip_with/aggregate
    left-to-right IEEE fold bit-for-bit — pinned against the literal
    path in tests.  Zero shuffle, O(1) plan size at any matrix size."""
    import numpy as np
    from pyspark.sql import types as T

    P = np.asarray(_hyperplanes(dim, d_out, seed), dtype=np.float64)  # (d_out, dim)
    bc = df.sparkSession.sparkContext.broadcast(P)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run(batches):
        M = bc.value
        k, d = M.shape
        for pdf in batches:
            vals = [
                None if v is None else np.asarray(v, dtype=np.float64)
                for v in pdf[vec_col]
            ]
            live = [i for i, v in enumerate(vals) if v is not None]
            outs: list = [None] * len(vals)
            if live:
                X = np.stack([vals[i] for i in live])
                acc = np.zeros((len(live), k))
                for j in range(d):
                    acc = acc + X[:, j : j + 1] * M[:, j]
                for i, row in zip(live, acc):
                    outs[i] = [float(x) for x in row]
            out = pdf.copy()
            out[out_col] = outs
            yield out

    return df.mapInPandas(run, out_schema)


def jl_shortlist_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    shortlist_factor: int = 4,
    d_out: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage ANN: JL-project both sides to `d_out` dims, shortlist the
    top k*shortlist_factor per query by cosine in the projected space,
    then rerank the shortlist with FULL-width exact cosine and keep the
    top k.  Deterministic end-to-end (plan-literal projection matrix,
    row_number ties broken by nbr_id), so a DuckDB oracle replays it
    bit-for-bit — see `n2_jl_shortlist` in queries.py.

    100 TB shape: stage 1 touches only the d_out-wide projections (a
    narrow map over the corpus — 4-16x less data moved than full-width
    brute force), stage 2 touches full vectors for candidates only
    (k*shortlist_factor rows per query, joined by id).  The corpus is
    scanned once per stage; the query side broadcasts in both.
    """
    m = k * shortlist_factor
    c_jl = jl_project(corpus, dim, d_out, vec_col, "jl", seed)
    q_jl = jl_project(queries, dim, d_out, vec_col, "jl", seed)
    cu = with_unit_vector(c_jl, "jl", "cju").select(F.col(id_col).alias("nbr_id"), "cju")
    qu = with_unit_vector(q_jl, "jl", "qju").select(
        F.col(query_id_col).alias("query_id"), "qju"
    )
    sim = (
        cu.crossJoin(F.broadcast(qu))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", _dot(F.col("qju"), F.col("cju")).alias("jcos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("jcos").desc(), F.col("nbr_id").asc())
    cand = (
        sim.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= m)
        .select("query_id", "nbr_id")
    )
    cfull = with_unit_vector(corpus, vec_col, "cu").select(
        F.col(id_col).alias("nbr_id"), "cu"
    )
    qfull = with_unit_vector(queries, vec_col, "qu").select(
        F.col(query_id_col).alias("query_id"), "qu"
    )
    rer = (
        cand.join(cfull, "nbr_id")
        .join(F.broadcast(qfull), "query_id")
        .select("query_id", "nbr_id", _dot(F.col("qu"), F.col("cu")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cosine")
    )


def jl_project_sql(
    dim: int, d_out: int = 16, seed: int = 7, vec_expr: str = "embedding"
) -> list[str]:
    """DuckDB SQL expressions (one per output coordinate) replaying
    :func:`jl_project` bit-exactly — same literal directions, same
    left-fold dot product as `lsh_signature_sql`."""
    planes = _hyperplanes(dim, d_out, seed)
    out = []
    for p in planes:
        lits = ",".join(repr(x) for x in p)
        out.append(
            f"list_reduce(list_transform(list_zip({vec_expr}, "
            f"list_transform(string_split('{lits}', ','), s -> CAST(s AS DOUBLE))), "
            f"p -> p[1] * p[2]), (x, y) -> x + y)"
        )
    return out


def semantic_dedup(
    df: DataFrame,
    centroids,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, round 8): embedding-space NEAR-
    duplicate removal at corpus scale.  Brute pairwise cosine is
    O(n²·d) — dead at 100 TB; SemDeDup's observation is that near-
    duplicates land in the same k-means cell, so the pairwise pass runs
    ONLY inside each cluster: one narrow assignment pass (plan-literal
    centroids, argmax), then a cluster-keyed self-join — O(Σ nᵢ²) work
    and a shuffle keyed by cluster, nothing quadratic in the corpus.
    More clusters → tighter cells → less work and a stricter dedup, the
    paper's k knob.

    A row is DROPPED when some cluster-mate that PRECEDES it has cosine
    >= ``threshold``.  Precedence is the ``keep`` policy:

    - ``"min_id"``  — smaller id wins (deterministic baseline);
    - ``"far_from_centroid"`` — the paper's choice: lower
      centroid-similarity wins (keeps the cell's OUTLIER, dropping the
      redundant near-centroid copies), ties broken by id.

    The exists-a-predecessor rule is ORDER-INDEPENDENT (no sequential
    greedy state), so the result is identical on any executor count —
    and exactly replayable in SQL.  Output: every input row with
    ``cluster``, ``centroid_sim`` (exact fold), ``dup_of`` (smallest-id
    preceding duplicate, NULL when kept) and ``keep``."""
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"keep must be 'min_id' or 'far_from_centroid', got {keep!r}")
    ucents = _unit_centroids(centroids)
    u = with_unit_vector(df, vec_col, "__u")
    asg = ivf_assign(u, ucents, "__u", "__cluster")
    csim = F.element_at(
        F.array(*[_dot(F.col("__u"), _cent_lit(c)) for c in ucents]),
        F.col("__cluster") + 1,
    )
    base = asg.select(
        F.col(id_col),
        F.col("__cluster").cast("int").alias("cluster"),
        F.col("__u"),
        csim.alias("centroid_sim"),
    )
    a = base.select(
        F.col(id_col).alias("__aid"),
        F.col("cluster"),
        F.col("__u").alias("__au"),
        F.col("centroid_sim").alias("__acs"),
    )
    b = base.select(
        F.col(id_col).alias("__bid"),
        F.col("cluster"),
        F.col("__u").alias("__bu"),
        F.col("centroid_sim").alias("__bcs"),
    )
    if keep == "min_id":
        prec = F.col("__aid") < F.col("__bid")
    else:
        prec = (F.col("__acs") < F.col("__bcs")) | (
            (F.col("__acs") == F.col("__bcs")) & (F.col("__aid") < F.col("__bid"))
        )
    pairs = a.join(b, "cluster").where(
        prec & (_dot(F.col("__au"), F.col("__bu")) >= F.lit(float(threshold)))
    )
    dups = pairs.groupBy("__bid").agg(F.min("__aid").alias("dup_of"))
    return (
        base.join(dups, base[id_col] == dups["__bid"], "left")
        .select(
            id_col,
            "cluster",
            "centroid_sim",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def semantic_dedup_incremental(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    centroids,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup (round 8) — the embedding-space twin of
    ``minhash_dedup_incremental`` and the batch-ingest companion of
    :func:`semantic_dedup`: keep the BATCH rows that are neither a
    near-duplicate (cosine >= ``threshold``) of any STORED vector in
    their k-means cell nor of a lower-id batch row in the same cell.

    The stored corpus is the IVF index itself (:func:`ivf_index_write`
    / ``ivf_index_sink`` keep it current): the batch assigns to the
    existing centroids in one narrow pass, and only the inverted lists
    of the clusters the batch actually touches are read — partition
    pruning bounds the stored-side scan by the batch's cell footprint,
    never the corpus.  Work per batch: O(|batch| · cell_occupancy),
    with zero corpus×corpus terms — each arriving batch dedups against
    the whole history at batch-proportional cost.  Batch and stored
    ids must be disjoint.  Cosine metric (the index stores unit
    vectors); survivors return with their original batch schema."""
    ucents = _unit_centroids(centroids)
    u = with_unit_vector(batch, vec_col, "__u")
    asg = ivf_assign(u, ucents, "__u", "__cluster").select(
        F.col(id_col), F.col("__u"), F.col("__cluster").cast("int").alias("cluster")
    )
    wanted = sorted(r["cluster"] for r in asg.select("cluster").distinct().collect())
    stored = (
        spark.read.parquet(index_dir)
        .where(F.col("cluster").isin(wanted))
        .select(F.col("vec_id").alias("__sid"), "cu", F.col("cluster"))
    )
    b = asg.select(
        F.col(id_col).alias("__bid"), F.col("__u").alias("__bu"), "cluster"
    )
    cos_bs = _dot(F.col("__bu"), F.col("cu"))
    cross_drop = (
        b.join(stored, "cluster")
        .where(cos_bs >= F.lit(float(threshold)))
        .select(F.col("__bid").alias(id_col))
    )
    a = asg.select(
        F.col(id_col).alias("__aid"), F.col("__u").alias("__au"), "cluster"
    )
    intra_drop = (
        a.join(b, "cluster")
        .where(
            (F.col("__aid") < F.col("__bid"))
            & (_dot(F.col("__au"), F.col("__bu")) >= F.lit(float(threshold)))
        )
        .select(F.col("__bid").alias(id_col))
    )
    drops = cross_drop.unionByName(intra_drop).distinct()
    return batch.join(drops, id_col, "left_anti")


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_pairs: DataFrame | None = None,
    exclude_match_col: str | None = None,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training (round 8,
    DPR-style): for each query, the k most-similar corpus vectors that
    are NOT relevant — the negatives contrastive losses learn most
    from.  Two exclusion channels, composable:

    - ``exclude_pairs``: a (query_id, nbr_id) frame of known positives
      (qrels); excluded with a broadcast-able anti-join BEFORE ranking,
      so the k survivors are exact (no re-rank-after-filter gap);
    - ``exclude_match_col``: a column present on BOTH sides (e.g.
      ``label``, source, url-domain) whose equality marks relevance —
      negatives must differ on it ("hardest cross-class negatives").

    Scale shape = :func:`cosine_topk`'s: one corpus scan with the
    query block broadcast, per-query top-k window.  For corpora where
    brute force is off the table, mine candidates from the IVF index
    first (``ivf_index_query`` with a large k) and feed them here as
    the corpus."""
    ccols = [F.col(id_col).alias("nbr_id"), "cu"] + (
        [F.col(exclude_match_col).alias("__cm")] if exclude_match_col else []
    )
    qcols = [F.col(query_id_col).alias("query_id"), "qu"] + (
        [F.col(exclude_match_col).alias("__qm")] if exclude_match_col else []
    )
    c = with_unit_vector(corpus, vec_col, "cu").select(*ccols)
    q = with_unit_vector(queries, vec_col, "qu").select(*qcols)
    sim = c.crossJoin(F.broadcast(q)).filter(F.col("nbr_id") != F.col("query_id"))
    if exclude_match_col:
        # null-safe equality: a null class equals a null class (still
        # "same relevance bucket"), so negate eqNullSafe
        sim = sim.filter(~F.col("__cm").eqNullSafe(F.col("__qm")))
    sim = sim.select(
        "query_id", "nbr_id", _dot(F.col("qu"), F.col("cu")).alias("cosine")
    )
    if exclude_pairs is not None:
        pos = exclude_pairs.select(
            F.col(exclude_pairs.columns[0]).alias("query_id"),
            F.col(exclude_pairs.columns[1]).alias("nbr_id"),
        )
        sim = sim.join(F.broadcast(pos), ["query_id", "nbr_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cosine")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """CLASSIFICATION BY RETRIEVAL — the k-NN vote that powers
    embedding-space labelers (topic/language/quality transfer from a
    small labeled seed to an unlabeled corpus): each query's label is
    the MAJORITY label among its cosine top-k neighbors, ties broken
    by vote-count then smallest label — fully deterministic.

    Shape: :func:`cosine_topk` (broadcast query block, ONE corpus
    scan) → a k-row-per-query label join → a (query,label) count → a
    per-query rank window bounded by k.  At corpus sizes where brute
    force is off the table, feed IVF candidates
    (``ivf_index_query``) through the same vote instead.  Returns
    (query_id, pred_label, votes)."""
    top = cosine_topk(corpus, queries, k, id_col, vec_col, query_id_col)
    labeled = top.join(
        corpus.select(F.col(id_col).alias("nbr_id"), F.col(label_col)), "nbr_id"
    )
    votes = labeled.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col(label_col).alias("pred_label"), "votes")
    )


def pca_power(
    vecs: DataFrame,
    iters: int = 6,
    q_scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component by QUANTIZED POWER ITERATION — the
    whitening/decorrelation primitive embedding pipelines run before
    ANN or SemDeDup (project out the dominant direction, or inspect it
    for batch effects).  Returns (dim_idx, loading): the dominant
    eigenvector of the centered covariance, as integers in
    [-q_scale, q_scale].

    Engine-exact by the pagerank discipline, extended to the one spot
    integers cannot cover:

    - quantize: q = floor(x · q_scale) per coordinate (q_scale a power
      of two, so the scaling is exact and floor is engine-independent);
    - center WITHOUT division: c = n·q − Σq (bigint — exact);
    - covariance: C_ij = Σ_v c_i·c_j with products in DECIMAL(18,0)²
      → DECIMAL(37,0) and an order-independent integer SUM (the oracle
      uses HUGEINT — same integers);
    - matvec: w_i = Σ_j C_ij·v_j in the same exact integer arithmetic;
    - rescale (the one non-integer step): v'_i = floor((double(w_i) ·
      q_scale) / double(m)) with m = max|w| — ONE fixed IEEE chain on
      identical inputs, so every engine lands the identical integers
      even where true rational floor would differ by an ulp.

    Sign/direction follow deterministically from the all-ones start.
    Quantization makes this an approximation of the true eigenvector
    (cosine ≥ 0.99 on real embeddings, pinned in tests); the point is
    a bit-replayable distributed iteration, not float-perfect linalg.

    Scale shape: ONE corpus scan explodes (id, i, q); the d²-pair
    self-join keyed on id produces the covariance with map-side partial
    sums (d² = 4096 cells for d=64 — the shuffle is corpus-sized but
    each group is a cell, never a corpus×corpus pair set).  Everything
    after is d²-bounded: iterations touch only the 64-row vector and
    4096-row matrix (broadcast join), localCheckpoint-ed per round.
    For d ≳ 512 block the gram matrix per the PQ codebook pattern —
    documented, not implemented."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if q_scale < 2 or (q_scale & (q_scale - 1)) != 0:
        raise ValueError(f"q_scale must be a power of two >= 2, got {q_scale}")
    qs = F.lit(float(q_scale))
    ex = vecs.select(
        F.col(id_col).alias("__id"), F.posexplode(F.col(vec_col)).alias("i", "x")
    ).select(
        "__id",
        (F.col("i") + F.lit(1)).alias("i"),
        F.floor(F.col("x").cast("double") * qs).cast("long").alias("q"),
    )
    stats = ex.groupBy("i").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    c = ex.join(F.broadcast(stats), "i").select(
        "__id", "i", (F.col("n") * F.col("q") - F.col("s")).alias("c")
    )
    a = c.select(F.col("__id"), F.col("i"), F.col("c").cast("decimal(18,0)").alias("ci"))
    b = c.select(F.col("__id"), F.col("i").alias("j"), F.col("c").cast("decimal(18,0)").alias("cj"))
    cov = (
        a.join(b, "__id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("ci") * F.col("cj")).cast("decimal(38,0)").alias("cij"))
        .localCheckpoint(eager=True)
    )
    v = cov.select("i").distinct().select(
        "i", F.lit(1).cast("long").alias("v")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        w = (
            cov.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(
                F.sum(F.col("cij") * F.col("v").cast("decimal(18,0)"))
                .cast("decimal(38,0)")
                .alias("w")
            )
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                "i",
                F.when(F.col("m") == 0, F.lit(0))
                .otherwise(
                    F.floor(
                        (F.col("w").cast("double") * qs) / F.col("m").cast("double")
                    )
                )
                .cast("long")
                .alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select(F.col("i").cast("int").alias("dim_idx"), F.col("v").alias("loading"))


def pca_power_sql_steps(
    iters: int = 6,
    q_scale: int = 1024,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """CTE chain replaying :func:`pca_power` in DuckDB (iterations
    unrolled, HUGEINT where Spark uses DECIMAL(38,0) — the same exact
    integers).  Exposes the final vector as CTE ``pca_final(dim_idx,
    loading)``."""
    qs = float(q_scale)
    parts = [
        f"""pca_ex AS (SELECT {id_col} AS id,
                  unnest(range(1, len({vec_col})+1)) AS i,
                  unnest(list_transform({vec_col},
                      x -> CAST(FLOOR(CAST(x AS DOUBLE) * {qs!r}) AS BIGINT))) AS q
           FROM {table}),
       pca_st AS (SELECT i, SUM(q) AS s, COUNT(*) AS n FROM pca_ex GROUP BY 1),
       pca_c AS (SELECT e.id, e.i, st.n * e.q - st.s AS c
                 FROM pca_ex e JOIN pca_st st USING (i)),
       pca_cov AS (SELECT a.i AS i, b.i AS j,
                          SUM(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS cij
                   FROM pca_c a JOIN pca_c b USING (id) GROUP BY 1, 2),
       pca_v0 AS (SELECT DISTINCT i, CAST(1 AS BIGINT) AS v FROM pca_cov)"""
    ]
    prev = "pca_v0"
    for t in range(1, iters + 1):
        parts.append(
            f"""pca_w{t} AS (SELECT cov.i,
                          SUM(cov.cij * CAST(pv.v AS HUGEINT)) AS w
                   FROM pca_cov cov JOIN {prev} pv ON pv.i = cov.j
                   GROUP BY 1),
       pca_m{t} AS (SELECT MAX(ABS(w)) AS m FROM pca_w{t}),
       pca_v{t} AS (SELECT i,
                   CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(FLOOR((CAST(w AS DOUBLE) * {qs!r})
                                        / CAST(m AS DOUBLE)) AS BIGINT) END AS v
                   FROM pca_w{t} CROSS JOIN pca_m{t})"""
        )
        prev = f"pca_v{t}"
    parts.append(
        f"""pca_final AS (SELECT CAST(i AS INTEGER) AS dim_idx, v AS loading
                    FROM {prev})"""
    )
    return ",\n       ".join(parts)
