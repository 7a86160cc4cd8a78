"""Batched model-inference kernel (round 9, SURVEY §2.12 N2/N4): a
small MLP text encoder run as ONE Arrow ``mapInPandas`` matmul over
token-id arrays — the shape every production pipeline uses to attach
*learned* embeddings to a corpus (contrast ``text.text_embed_hashed``,
which is featurization, not a model).

Scale design:
- weights are broadcast ONCE per job (a few MB for a pooling encoder;
  never shipped per batch, never a plan literal — this is the
  broadcast-variant answer to the plan-literal k·d trade-off noted on
  ``ivf_assign``);
- each Arrow batch computes with two dense matmuls over the whole
  batch (vectorized: embedding-bag segment sum via ``np.add.reduceat``
  on the flattened id stream, then (B,d0)@(d0,d1)@(d1,d2)) — per-row
  Python never runs;
- rows are independent, so the operator is embarrassingly parallel and
  partition-invariant; no shuffle at all.

Exactness: with INTEGER weights (``deterministic_weights``) every
lookup/sum/matmul/ReLU is exact int64 arithmetic — order-free, so
numpy's blocked reductions cannot diverge from an SQL replay — and the
only floating steps are the final per-component division by an
IEEE-exact ``sqrt``.  That is what lets the oracle replay a real
inference chain bit-for-bit.  Float weights run the same kernel (cast
to float64) for production use; they are tested against a pure-Python
replica rather than an SQL oracle (float matmul order is engine
private).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def deterministic_weights(
    vocab: int, d0: int = 8, d1: int = 8, d2: int = 4
) -> dict[str, np.ndarray]:
    """Deterministic small-int MLP weights from closed-form formulas —
    replayable by ANY engine (the SQL twin is
    :func:`mlp_embed_sql_steps`), so oracle entries need no weight
    artifact.  E[v,j] = (v*31 + j*17) % 7 - 3; W1[j,k] = (j*13 + k*7)
    % 5 - 2; b1[k] = k % 3 - 1; W2[k,m] = (k*11 + m*29) % 5 - 2;
    b2[m] = m % 2."""
    v = np.arange(vocab, dtype=np.int64)[:, None]
    j = np.arange(d0, dtype=np.int64)[None, :]
    E = (v * 31 + j * 17) % 7 - 3
    jj = np.arange(d0, dtype=np.int64)[:, None]
    k = np.arange(d1, dtype=np.int64)[None, :]
    W1 = (jj * 13 + k * 7) % 5 - 2
    b1 = np.arange(d1, dtype=np.int64) % 3 - 1
    kk = np.arange(d1, dtype=np.int64)[:, None]
    m = np.arange(d2, dtype=np.int64)[None, :]
    W2 = (kk * 11 + m * 29) % 5 - 2
    b2 = np.arange(d2, dtype=np.int64) % 2
    return {"E": E, "W1": W1, "b1": b1, "W2": W2, "b2": b2}


def mlp_embed(
    df: DataFrame,
    weights: dict[str, np.ndarray],
    ids_col: str = "ids",
    out_col: str = "embedding",
    raw_col: str | None = None,
) -> DataFrame:
    """Append an L2-normalized ``array<double>`` embedding computed by
    the broadcast MLP: sum-pool the id embeddings (embedding bag), one
    hidden affine+ReLU, one output affine, normalize.  Ids index the
    table modulo its vocab (hash-bucket semantics, like every
    feature-hashing path here).  NULL id arrays yield NULL; empty
    arrays yield the bias-only embedding (a real encoder's [] output).
    ``raw_col`` additionally emits the PRE-normalization vector
    (exact int64 when the weights are integral — the hook the oracle
    entry pins its values on)."""
    for key in ("E", "W1", "b1", "W2", "b2"):
        if key not in weights:
            raise ValueError(f"mlp_embed: weights missing {key!r}")
    E = np.asarray(weights["E"])
    integral = all(
        np.issubdtype(np.asarray(weights[k]).dtype, np.integer)
        for k in ("E", "W1", "b1", "W2", "b2")
    )
    dt = np.int64 if integral else np.float64
    w = {k: np.asarray(v, dtype=dt) for k, v in weights.items()}
    if w["E"].shape[1] != w["W1"].shape[0] or w["W1"].shape[1] != w["W2"].shape[0]:
        raise ValueError("mlp_embed: weight shapes do not chain (E->W1->W2)")
    vocab = E.shape[0]
    d2 = w["W2"].shape[1]
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(w)

    fields = list(df.schema.fields) + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()))
    ]
    if raw_col:
        fields.append(
            T.StructField(
                raw_col,
                T.ArrayType(T.LongType() if integral else T.DoubleType()),
            )
        )
    out_schema = T.StructType(fields)

    def run(batches):
        ww = bc.value
        Ew, W1, b1, W2, b2 = (ww[k] for k in ("E", "W1", "b1", "W2", "b2"))
        for pdf in batches:
            col = pdf[ids_col]
            arrs = [
                None if ids is None else np.asarray(ids, dtype=np.int64)
                for ids in col
            ]
            lens = np.array([0 if a is None else len(a) for a in arrs])
            flat = (
                np.concatenate([a for a in arrs if a is not None and len(a)])
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            # embedding bag: one gather + segment sum over the flat stream
            looked = Ew[flat % vocab]
            x = np.zeros((len(arrs), Ew.shape[1]), dtype=dt)
            ends = np.cumsum(lens)
            starts = ends - lens
            nonempty = lens > 0
            if flat.size:
                segsums = np.add.reduceat(looked, starts[nonempty], axis=0)
                x[nonempty] = segsums
            h = np.maximum(x @ W1 + b1, 0)
            y = h @ W2 + b2
            yf = y.astype(np.float64)
            norm = np.sqrt((yf**2).sum(axis=1))
            emb = yf / np.where(norm == 0, 1.0, norm)[:, None]  # zero vec stays zero
            null_mask = np.array([a is None for a in arrs])
            out = pdf.copy()
            out[out_col] = [
                None if null_mask[i] else [float(v) for v in emb[i]]
                for i in range(len(arrs))
            ]
            if raw_col:
                caster = int if integral else float
                out[raw_col] = [
                    None if null_mask[i] else [caster(v) for v in y[i]]
                    for i in range(len(arrs))
                ]
            yield out

    return df.mapInPandas(run, out_schema)


def mlp_embed_sql_steps(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: int = 64,
    d0: int = 8,
    d1: int = 8,
    d2: int = 4,
) -> str:
    """DuckDB CTE chain replaying tokenize → portable-hash ids →
    :func:`deterministic_weights` → embedding-bag sum → affine+ReLU →
    affine, EXACTLY (all-integer arithmetic; the same closed-form
    weight formulas, fully unrolled over the small dims).  Exposes
    ``mlp_y(id, n_toks, y0..y{d2-1})``."""
    hash_id = (
        f"(('0x' || substr(md5(tok), 1, 15))::BIGINT % {vocab})"
    )
    x_cols = ",\n                 ".join(
        f"SUM((tid*31 + {j}*17) % 7 - 3) AS x{j}" for j in range(d0)
    )
    h_cols = ",\n                 ".join(
        "greatest(0, "
        + " + ".join(f"x{j} * (({j}*13 + {k}*7) % 5 - 2)" for j in range(d0))
        + f" + ({k} % 3 - 1)) AS h{k}"
        for k in range(d1)
    )
    y_cols = ",\n                 ".join(
        " + ".join(f"h{k} * (({k}*11 + {m}*29) % 5 - 2)" for k in range(d1))
        + f" + ({m} % 2) AS y{m}"
        for m in range(d2)
    )
    return f"""toks AS (SELECT {id_col} AS id,
                     unnest(string_split({text_col}, ' ')) AS tok
              FROM {docs_table}),
       tid AS (SELECT id, {hash_id} AS tid FROM toks),
       xs AS (SELECT id, count(*) AS n_toks,
                 {x_cols}
              FROM tid GROUP BY id),
       hs AS (SELECT id, n_toks,
                 {h_cols}
              FROM xs),
       mlp_y AS (SELECT id, n_toks,
                 {y_cols}
              FROM hs)"""
