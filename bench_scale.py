"""Scale-up probe: the minhash→clusters near-dup pipeline at ×1/×4/×16
corpus size — the repeatable form of the round-10 one-off probe, so the
linear-scaling claim is RE-CHECKED every round instead of asserted.

Builds multiplier corpora from $SPARK_GRAFT_SF_DIR's documents table
(replica doc_ids offset past the id space; replica text perturbed with
a per-replica suffix so signatures differ and the LSH candidate set
stays realistic instead of degenerate), then times the full pipeline
(signatures → banded LSH → exact rerank → connected components →
keep/drop) end-to-end with a noop write at each scale.

Round 12 adds the ACID metadata-layer probe: an AcidTable built from
orders at ×1/×4/×16 rows (file count scaled with the data), then a
FIXED-SIZE narrow MERGE (its cost must track the churn, not the
table), the change feed for that merge, an apply_cdc replication
of it, and a stats-pruned range scan of a fixed key slice — the ops
whose 100 TB viability rests on file pruning and churn-sized
manifests.  Table build time is excluded; only the
operations are timed.

Prints ONE JSON line:
  {"metric": "minhash_clusters_scaleup", "walls": {"x1": s, ...},
   "docs": {...}, "per_1k_docs": {...}, "ratio_x16_x4": r,
   "acid": {"rows": {...}, "walls": {op: {"x1": s, ...}},
            "ratio_x16_x4": {op: r}}, "sf": ...}

Budgets (BASELINE.md round-11/12 tables): per-1k-docs must FALL or
hold as scale rises (linear shape with an amortizing constant);
minhash ratio_x16_x4 ≤ 6 (a corpus-quadratic stage would show ≥ 16);
each ACID op's ratio_x16_x4 ≤ 6 (churn-proportional ops over a ×16
table must not pay ×16 — a full-table read/rewrite would).
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

    # ---- ACID metadata-layer probe: fixed churn against a growing table
    from bigdatamigratecloud_spark.sources.acid_table import AcidTable

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_orders = orders.count()
    o_span = 10 ** len(str(n_orders * 40 * max(SCALES)))
    acid_walls: dict[str, dict[str, float]] = {
        "merge_narrow": {},
        "changes": {},
        "apply_cdc": {},
        "scan_prune": {},
    }
    acid_rows: dict[str, int] = {}
    aroot = tempfile.mkdtemp(prefix="bdmc_scale_acid_")
    try:
        for mult in SCALES:
            rep = None
            for i in range(mult):
                r = orders.select(
                    (F.col("o_orderkey") + F.lit(i * o_span)).alias("o_orderkey"),
                    "o_custkey",
                    "o_totalprice",
                )
                rep = r if rep is None else rep.unionByName(r)
            t = AcidTable.create(
                spark,
                os.path.join(aroot, f"x{mult}"),
                rep.repartitionByRange(8 * mult, "o_orderkey"),
                key_cols=["o_orderkey"],
            )
            r0 = AcidTable.create(
                spark,
                os.path.join(aroot, f"r{mult}"),
                t.snapshot(),
                key_cols=["o_orderkey"],
            )
            acid_rows[f"x{mult}"] = n_orders * mult
            # FIXED-size narrow delta regardless of scale: 256 keys from
            # one key-range neighborhood — the GDPR/point-update shape
            delta = (
                t.snapshot()
                .orderBy("o_orderkey")
                .limit(256)
                .select("o_orderkey", "o_custkey", (F.col("o_totalprice") * 2).alias("o_totalprice"))
            )
            delta = spark.createDataFrame(delta.collect(), delta.schema)
            t0 = time.perf_counter()
            t.merge(delta, ["o_orderkey"])
            acid_walls["merge_narrow"][f"x{mult}"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            feed = t.changes(0, 1)
            feed.write.format("noop").mode("overwrite").save()
            acid_walls["changes"][f"x{mult}"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            r0.apply_cdc(t.changes(0, 1))
            acid_walls["apply_cdc"][f"x{mult}"] = round(time.perf_counter() - t0, 3)
            # stats-pruned range scan of a FIXED key slice: the decision
            # job runs over the entries frame and the read touches the
            # same ~one file at every scale — "scan cost follows the
            # answer, not the table"
            bounds = delta.agg(
                F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
            ).first()
            t0 = time.perf_counter()
            sdf, _info = t.scan({"o_orderkey": (bounds["lo"], bounds["hi"])})
            sdf.write.format("noop").mode("overwrite").save()
            acid_walls["scan_prune"][f"x{mult}"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(aroot, ignore_errors=True)

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
                "acid": {
                    "rows": acid_rows,
                    "walls": acid_walls,
                    "ratio_x16_x4": {
                        op: round(w["x16"] / w["x4"], 2)
                        for op, w in acid_walls.items()
                    },
                },
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
