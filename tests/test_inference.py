"""mlp_embed inference kernel (round 9): pure-Python replica equality,
partition invariance, null/empty semantics, float-weights path, and
loud shape/key failures."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators import inference as inf

V, D0, D1, D2 = 32, 8, 8, 4


def _replica(ids, w):
    """Row-at-a-time reference implementation in plain Python ints."""
    x = [0] * D0
    for t in ids:
        for j in range(D0):
            x[j] += int(w["E"][t % V][j])
    h = [
        max(0, sum(x[j] * int(w["W1"][j][k]) for j in range(D0)) + int(w["b1"][k]))
        for k in range(D1)
    ]
    y = [
        sum(h[k] * int(w["W2"][k][m]) for k in range(D1)) + int(w["b2"][m])
        for m in range(D2)
    ]
    n = math.sqrt(sum(v * v for v in y))
    return y, [v / n if n else 0.0 for v in y]


@pytest.fixture(scope="module")
def ids_df(spark):
    rows = [(i, [(i * 7 + j * 13) % 100 for j in range(3 + i % 9)]) for i in range(40)]
    rows += [(40, []), (41, None)]
    return spark.createDataFrame(rows, "doc_id long, ids array<long>"), rows


def test_matches_python_replica_and_semantics(spark, ids_df):
    df, rows = ids_df
    w = inf.deterministic_weights(V, D0, D1, D2)
    out = {
        r.doc_id: r
        for r in inf.mlp_embed(df, w, raw_col="y").collect()
    }
    for doc_id, ids in rows:
        if ids is None:
            assert out[doc_id].embedding is None and out[doc_id].y is None
            continue
        y, emb = _replica(ids, w)
        assert list(out[doc_id].y) == y, doc_id
        assert list(out[doc_id].embedding) == emb, doc_id
    # empty ids -> bias-only path (x = 0), still defined
    y_empty, _ = _replica([], w)
    assert list(out[40].y) == y_empty
    # unit norm wherever nonzero
    for doc_id, ids in rows:
        if ids is not None and any(v != 0 for v in out[doc_id].y):
            assert abs(sum(v * v for v in out[doc_id].embedding) - 1.0) < 1e-12


def test_partition_invariance(spark, ids_df):
    df, _ = ids_df
    w = inf.deterministic_weights(V, D0, D1, D2)
    a = sorted(
        (r.doc_id, tuple(r.y))
        for r in inf.mlp_embed(df.repartition(1), w, raw_col="y").collect()
        if r.y is not None
    )
    b = sorted(
        (r.doc_id, tuple(r.y))
        for r in inf.mlp_embed(df.repartition(13), w, raw_col="y").collect()
        if r.y is not None
    )
    assert a == b


def test_float_weights_path(spark, ids_df):
    df, rows = ids_df
    rng = np.random.default_rng(7)
    w = {
        "E": rng.normal(size=(V, D0)),
        "W1": rng.normal(size=(D0, D1)),
        "b1": rng.normal(size=D1),
        "W2": rng.normal(size=(D1, D2)),
        "b2": rng.normal(size=D2),
    }
    out = {r.doc_id: r for r in inf.mlp_embed(df, w, raw_col="y").collect()}
    ids = rows[5][1]
    x = w["E"][np.asarray(ids) % V].sum(axis=0)
    y = np.maximum(x @ w["W1"] + w["b1"], 0) @ w["W2"] + w["b2"]
    assert np.allclose(out[5].y, y, rtol=0, atol=1e-12)
    # raw dtype is double on the float path
    assert isinstance(out[5].y[0], float)


def test_loud_failures(spark, ids_df):
    df, _ = ids_df
    w = inf.deterministic_weights(V, D0, D1, D2)
    with pytest.raises(ValueError, match="missing 'b2'"):
        inf.mlp_embed(df, {k: v for k, v in w.items() if k != "b2"})
    bad = dict(w, W2=np.zeros((D1 + 1, D2), dtype=np.int64))
    with pytest.raises(ValueError, match="do not chain"):
        inf.mlp_embed(df, bad)
