"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full physical
execution, no driver collect bottleneck), matching how a cluster job would
materialize results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: scan-heavy agg, join-heavy, shuffle-heavy reshape, dedup,
# FK sweep, window rollup, 7-way broadcast join, as-of join, skew-safe
# distinct — the engine's load-bearing shapes
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "a5_pivot_roundtrip_orders",
    "a7_dedup_pk_lineitem",
    "j5_fk_violation_counts",
    "events_hourly_rollup",
    "q8_market_share",
    "t1_asof_last_purchase",
    "x7_skew_salted_distinct",
]

# corpus / LLM-pipeline set: the expensive non-relational shapes
# (minhash->band->cluster dedup, the multi-stage curation chain,
# training-corpus assembly, batch BM25 retrieval, sequence packing,
# web-pipeline capstone) — timed separately so a regression in the
# 200+ non-headline registry entries shows up in BENCH_r*.json
# round-over-round, not only in BASELINE.md prose probes.  Reported
# under "corpus"/"corpus_total"; "value" stays headline-only so the
# baseline gate comparison is unchanged.
CORPUS = [
    "n1_dedup_clusters_minhash",
    "n5_curation_pipeline",
    "n5_training_corpus",
    "n6_bm25_batch",
    "n5_pack_chunks",
    "n5_web_pipeline",
]


def main() -> None:
    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.session import get_spark

    from bigdatamigratecloud_spark.catalog import register_views

    spark = get_spark("bdmc-bench")
    # steady-state measurement: register + cache the tables (the local
    # analogue of a warm cluster's buffer cache / DuckDB's buffer pool),
    # and warm the JVM so per-query numbers measure the plan
    register_views(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer", "supplier", "events", "part",
              "nation", "region", "documents"):
        spark.table(t).cache().count()
    q.QUERIES["q6_revenue_forecast"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def run_set(
        names: list[str], repeats: int
    ) -> tuple[dict[str, float], dict[str, float]]:
        """(best, median) seconds per query over ``repeats`` runs.

        Best of N: the first run pays codegen/JIT compilation of this
        query's operators (a per-plan constant, not a data cost) and
        the second often still catches tiered-compilation tail; the
        best measures the steady-state plan the cluster would run.
        The MEDIAN is emitted alongside (round-10 variance guard): a
        plan regression moves best and median together, host noise
        moves only the spread — recording both lets round-over-round
        comparison separate the two mechanically."""
        best_out: dict[str, float] = {}
        med_out: dict[str, float] = {}
        for name in names:
            fn = q.QUERIES[name]
            runs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            best_out[name] = round(runs[0], 3)
            mid = len(runs) // 2
            med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
            med_out[name] = round(med, 3)
        return best_out, med_out

    # headline queries are sub-second: host noise (demand-fault stalls,
    # scheduler jitter) swings single runs 1.5-3x, so best-of-5 instead
    # of best-of-3 — same methodology (noop sink, best + median), two
    # more samples for the minimum.  Round-13 measurement change, noted
    # in OPTIMIZATION_r13.md.
    times, times_median = run_set(HEADLINE, 5)
    # corpus shapes are seconds-each: best-of-2 keeps the whole bench
    # inside the driver's budget while still shedding first-run codegen
    corpus, corpus_median = run_set(CORPUS, 2)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "queries_median": times_median,
                "corpus": corpus,
                "corpus_median": corpus_median,
                "corpus_total": round(sum(corpus.values()), 3),
                "runs": {"headline": 5, "corpus": 2},
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
