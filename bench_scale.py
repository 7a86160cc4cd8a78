"""Scale-up probe: the minhash→clusters near-dup pipeline at ×1/×4/×16
corpus size — the repeatable form of the round-10 one-off probe, so the
linear-scaling claim is RE-CHECKED every round instead of asserted.

Builds multiplier corpora from $SPARK_GRAFT_SF_DIR's documents table
(replica doc_ids offset past the id space; replica text perturbed with
a per-replica suffix so signatures differ and the LSH candidate set
stays realistic instead of degenerate), then times the full pipeline
(signatures → banded LSH → exact rerank → connected components →
keep/drop) end-to-end with a noop write at each scale.

Prints ONE JSON line:
  {"metric": "minhash_clusters_scaleup", "walls": {"x1": s, ...},
   "docs": {...}, "per_1k_docs": {...}, "ratio_x16_x4": r, "sf": ...}

Budgets (BASELINE.md round-11 table): per-1k-docs must FALL or hold as
scale rises (linear shape with an amortizing constant); ratio_x16_x4
must stay ≤ 6 (a corpus-quadratic stage would show ≥ 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 4, 16)


def main() -> None:
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.session import get_spark

    spark = get_spark("bdmc-bench-scale")
    base = load_table(spark, SF_DIR, "documents")
    n_base = base.count()
    id_span = 10 ** len(str(n_base * max(SCALES)))  # clean replica offset
    root = tempfile.mkdtemp(prefix="bdmc_scale_")
    walls: dict[str, float] = {}
    docs: dict[str, int] = {}
    try:
        for mult in SCALES:
            sf_dir = os.path.join(root, f"x{mult}")
            os.makedirs(sf_dir)
            rep = None
            for i in range(mult):
                r = base.select(
                    (F.col("doc_id") + F.lit(i * id_span)).alias("doc_id"),
                    # per-replica perturbation: replicas are NEAR-dups of
                    # each other (realistic LSH load), not byte-dups
                    F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                rep = r if rep is None else rep.unionByName(r)
            rep.repartition(max(1, mult * 2)).write.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            # warm the input cache like bench.py does for its tables
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
            t0 = time.perf_counter()
            q.QUERIES["n1_dedup_clusters_minhash"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            walls[f"x{mult}"] = round(time.perf_counter() - t0, 3)
            docs[f"x{mult}"] = n_base * mult
    finally:
        shutil.rmtree(root, ignore_errors=True)
    per_1k = {
        k: round(walls[k] / (docs[k] / 1000.0), 3) for k in walls
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "minhash_clusters_scaleup",
                "walls": walls,
                "docs": docs,
                "per_1k_docs": per_1k,
                "ratio_x16_x4": round(walls["x16"] / walls["x4"], 2),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
