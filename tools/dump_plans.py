"""Dump .explain('formatted') for declared queries (and the changed
mid-pipeline sub-stages that checkpoint boundaries hide from the final
plan) to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
       python tools/dump_plans.py r13 before q1_pricing_summary a5_pivot_roundtrip_orders

Queries are built UNCACHED over $SPARK_GRAFT_SF_DIR (default sf0.1) so
scan nodes show PushedFilters/ReadSchema.  Multi-stage pipelines with
localCheckpoint cuts execute their upstream stages while the DataFrame
is being BUILT; their dump shows the final-stage plan over LogicalRDD
inputs — the changed sub-stages are dumped separately (see SUBSTAGES).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _minhash_rerank_shingles(spark, sf_dir):
    """The rerank shingle stream of minhash_neardup, rebuilt standalone
    (it sits behind a localCheckpoint inside the pipeline, so the final
    query plan cannot show it): candidate ids semi-joined against the
    corpus, then shingled.  Mirrors operators/dedup.minhash_neardup."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.operators import dedup as _dedup

    docs = q.load_table(spark, sf_dir, "documents")
    sigs = _dedup.minhash_signatures(docs, portable=True).localCheckpoint(eager=True)
    cands = _dedup.minhash_lsh_candidates(sigs, 8, 4, True).localCheckpoint(eager=True)
    ids = cands.select(F.col("id_a").alias("doc_id")).unionByName(
        cands.select(F.col("id_b").alias("doc_id"))
    )
    return _dedup.shingles_df(docs.join(ids, "doc_id", "left_semi"), "doc_id", "text", 3)


def _minhash_lsh_stage(spark, sf_dir):
    """The LSH candidate stage of minhash_neardup, rebuilt standalone
    (it sits between two localCheckpoints inside the pipeline, so
    neither the final query plan nor the rerank dump can show it): the
    guarded band self-join over the checkpointed signatures.  Mirrors
    operators/dedup.minhash_lsh_candidates as minhash_neardup calls it."""
    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.operators import dedup as _dedup

    docs = q.load_table(spark, sf_dir, "documents")
    sigs = _dedup.minhash_signatures(docs, portable=True).localCheckpoint(eager=True)
    return _dedup.minhash_lsh_candidates(sigs, 8, 4, True)


SUBSTAGES = {
    "minhash_rerank_shingles": _minhash_rerank_shingles,
    "minhash_lsh_stage": _minhash_lsh_stage,
}


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    for name in names:
        if name in SUBSTAGES:
            df = SUBSTAGES[name](spark, SF_DIR)
        else:
            df = q.QUERIES[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(_explain_str(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
