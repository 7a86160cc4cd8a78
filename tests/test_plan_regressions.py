"""Physical-plan regression tests: the scale-critical plan properties the
engine depends on at 100 TB, asserted against the actual executed plan so
a refactor can't silently regress them.

- filters/projections reach the parquet scan (pushdown + pruning)
- dimension joins broadcast (no fact-side shuffle)
- the EAV melt is narrow (zero shuffles)
- the EAV pivot is exactly ONE shuffle (keyed by record id)
- PK dedup uses the WindowGroupLimit pushdown (partial top-1 before
  the shuffle)
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.operators.staging import (
    melt_to_staging,
    pivot_from_staging,
)
from bigdatamigratecloud_spark.operators.upsert import dedup_by_pk
from bigdatamigratecloud_spark import queries as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_filter_projection_pushdown(spark, sf_dir):
    df = q.QUERIES["s1_scan_filter_project"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:400]
    # column pruning: the FileScan's column list carries ONLY the 5
    # referenced columns (toString truncates ReadSchema, so assert on the
    # scan's bracketed output list instead)
    scan_cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scan_cols, plan
    cols = {c.split("#")[0] for c in scan_cols.group(1).split(",")}
    assert cols == {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    }


def test_multifile_layout_pushdown_and_no_repartition_guard(spark, sf_dir, tmp_path):
    """Round 10: the single-file fixture layout is a local-mode artifact;
    this pins the engine's behavior on the REAL multi-file shape.  A
    many-files copy of lineitem must (a) not trip load_table's
    parallelism guard (no repartition node over the scan), (b) keep
    filter pushdown + column pruning at the scan, (c) arrive already
    parallel (scan partitions > 1)."""
    import os

    from bigdatamigratecloud_spark.catalog import _scan_parallelism_deficit

    li = load_table(spark, sf_dir, "lineitem")
    mf_dir = str(tmp_path / "mf")
    out = os.path.join(mf_dir, "lineitem.parquet")
    # deterministic 8-file layout (write_sized_parquet would emit one
    # file at this tiny SF; its sizing behavior has its own tests)
    li.repartition(8).write.parquet(out)
    n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_files > 1  # genuinely multi-file
    assert not _scan_parallelism_deficit(out)  # guard no-ops on dirs

    df = load_table(spark, mf_dir, "lineitem").where(
        F.col("l_quantity") > 45
    ).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "Exchange" not in plan  # no guard repartition, no shuffle
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:200]
    scan_cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scan_cols and {
        c.split("#")[0] for c in scan_cols.group(1).split(",")
    } == {"l_orderkey", "l_quantity"}
    assert df.rdd.getNumPartitions() > 1  # scan-level parallelism


def test_dim_lookup_broadcasts_no_fact_shuffle(spark, sf_dir):
    plan = _plan(q.QUERIES["j1_dim_lookup"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # the only exchanges are broadcast-side; the fact (customer) side
    # reaches the joins without a hash-partition shuffle
    assert "Exchange hashpartitioning" not in plan


def test_melt_is_narrow(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer", parallelize_small=False)
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey")
    plan = _plan(staged)
    assert "Exchange" not in plan  # explode + project only: zero shuffles


def test_pivot_is_single_shuffle(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer", parallelize_small=False)
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey")
    wide = pivot_from_staging(staged, c.schema)
    plan = _plan(wide)
    assert plan.count("Exchange hashpartitioning") == 1  # groupBy(record_no) only
    assert "DataFrame.pivot" not in plan  # by construction, but keep explicit


def test_pk_dedup_uses_window_group_limit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", parallelize_small=False)
    deduped = dedup_by_pk(li, ["l_orderkey", "l_linenumber"], order_col="l_shipdate")
    assert "WindowGroupLimit" in _plan(deduped)  # partial top-1 pre-shuffle


def test_fused_fk_sweep_lineitem_scans_once(spark, sf_dir):
    df = q.QUERIES["j5_fk_violation_counts"](spark, sf_dir)
    plan = _plan(df)
    # one scan of lineitem feeds all 3 of its FK checks
    assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 8


def test_q5_joins_broadcast_dimensions(spark, sf_dir):
    df = q.QUERIES["q5_regional_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # nation, region, supplier at least


def test_q8_all_dims_broadcast_filters_pushed(spark, sf_dir):
    """The 7-way market-share join must plan as: every dim broadcast (no
    fact-side shuffle for any join), the two selective predicates pushed
    into their parquet scans, and exactly ONE hash exchange (the final
    year aggregation)."""
    plan = _plan(q.QUERIES["q8_market_share"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 7
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(p_type,PROMO)" in plan
    assert "EqualTo(r_name,ASIA)" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_lsh_neardup_is_bucket_equijoin_no_cross_product(spark, sf_dir):
    """The oracle-checked embedding near-dup scale path must pair via a
    bucket equi-join on the hyperplane signature — never a cross product
    (the brute baseline's crossJoin is the 100 TB scale-killer)."""
    plan = _plan(q.QUERIES["n2_cosine_neardup_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the probe==sig pairing is a hash-key equality join
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_embedding_dedup_consumes_lsh_candidates(spark, sf_dir):
    plan = _plan(q.QUERIES["n2_embedding_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_documents_is_narrow(spark, sf_dir):
    from bigdatamigratecloud_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents", parallelize_small=False)
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan  # tokens -> stride -> posexplode only


def test_sessionize_single_exchange(spark, sf_dir):
    from bigdatamigratecloud_spark.operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events", parallelize_small=False).select(
        "user_id", "event_id", "ts"
    )
    plan = _plan(sessionize(ev))
    # lag + running sum share one user-partitioned exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_zero_exchanges(spark, sf_dir, tmp_path):
    """Same-bucketed tables joined on the bucket key: no Exchange on
    either side, and the bucket-sorted single-file-per-bucket layout lets
    the sort-merge join skip its per-task sorts too."""
    import uuid

    from bigdatamigratecloud_spark.operators.bucketed import bucketed_join, write_bucketed

    tag = uuid.uuid4().hex[:8]
    t_o, t_l = f"tb_orders_{tag}", f"tb_lineitem_{tag}"
    write_bucketed(
        load_table(spark, sf_dir, "orders", parallelize_small=False).select(
            "o_orderkey", "o_orderpriority"
        ),
        t_o, ["o_orderkey"], n_buckets=4, path=str(tmp_path / "o"),
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem", parallelize_small=False).select(
            "l_orderkey", "l_quantity"
        ),
        t_l, ["l_orderkey"], n_buckets=4, path=str(tmp_path / "l"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, t_l, t_o, on=[F.col("l_orderkey") == F.col("o_orderkey")]
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: zero shuffles
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")


def test_partitioned_events_scan_prunes(spark, sf_dir, tmp_path):
    """Single-day read of a date-partitioned layout must prune to one
    partition directory (PartitionFilters on event_date, not a full scan
    + post-filter)."""
    ev = load_table(spark, sf_dir, "events", parallelize_small=False).withColumn(
        "event_date", F.col("ts").cast("date")
    )
    out = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    part = spark.read.parquet(out)
    day = part.agg(F.min("event_date")).first()[0]
    q = part.filter(F.col("event_date") == F.lit(day)).groupBy("event_type").count()
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]
    assert q.count() > 0


def test_colocated_melt_pivot_single_prejoin_exchange(spark, sf_dir):
    # colocate=True moves the one shuffle BEFORE the explode (wide rows,
    # no per-cell row overhead); the pivot aggregate itself then needs no
    # exchange and plans partial+final in one stage
    c = load_table(spark, sf_dir, "customer", parallelize_small=False)
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey", colocate=True)
    wide = pivot_from_staging(staged, c.schema)
    plan = _plan(wide)
    assert plan.count("Exchange hashpartitioning") == 1  # the pre-explode repartition
    # the exchange must sit below the Generate (explode), not above it
    gen_pos = plan.find("Generate explode")
    ex_pos = plan.find("Exchange hashpartitioning")
    assert gen_pos != -1 and ex_pos != -1 and ex_pos > gen_pos  # deeper in tree = later in text


def test_decontaminate_broadcasts_benchmark_no_cross_product(spark, sf_dir):
    from bigdatamigratecloud_spark.operators.dedup import ngram_decontaminate

    docs = load_table(spark, sf_dir, "documents", parallelize_small=False)
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    corpus = docs.filter(F.col("doc_id") % 53 != 0)
    plan = _plan(ngram_decontaminate(corpus, bench, n=8))
    assert "BroadcastHashJoin" in plan      # benchmark shingle set broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_training_corpus_pipeline_no_cartesian(spark, sf_dir):
    plan = _plan(q.QUERIES["n5_training_corpus"](spark, sf_dir))
    # the whole assembly (decontaminate + minhash/LSH + components join +
    # split) must stay equi-join only: no all-pairs stage anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_assignment_is_distributed(spark, sf_dir):
    """ivf_cosine_topk must not collect the QUERY frame to the driver for
    probe assignment (round-3 verdict item 4): the per-query probe list is
    computed as a narrow map with the centroid matrix as a plan literal.
    The only driver-side collect allowed is the bounded k-means SAMPLE.
    A collected query frame would surface as a LocalTableScan feeding the
    probe join; the distributed form keeps both join inputs on the scan."""
    from bigdatamigratecloud_spark.operators.similarity import ivf_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings", parallelize_small=False)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(ivf_cosine_topk(emb, queries, k=10, n_centroids=8, n_probe=3))
    assert "LocalTableScan" not in plan
    assert "CartesianProduct" not in plan


def test_domain_cap_window_group_limit(spark, sf_dir):
    """n5_domain_cap must compile to WindowGroupLimit with a PARTIAL pass
    BEFORE the exchange: map tasks prune every domain to its top-N first,
    so the shuffle moves O(domains x cap) rows, not the corpus."""
    plan = _plan(q.QUERIES["n5_domain_cap"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    partial_pos = plan.find("Partial")
    exchange_pos = plan.find("Exchange hashpartitioning")
    assert partial_pos != -1 and exchange_pos != -1
    # text order: Final ... Exchange ... Partial (deeper = later in text)
    assert plan.find("Final") < exchange_pos < partial_pos
    assert plan.count("Exchange hashpartitioning") == 1


def test_stratified_sample_exact_counts_and_plan(spark, sf_dir):
    """n5_stratified_sample: exactly min(n, |cell|) rows per stratum, the
    same ids regardless of input partitioning, and the WindowGroupLimit
    partial prune before the single shuffle (the domain_cap scale shape
    with a hash draw instead of a quality order)."""
    from bigdatamigratecloud_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    out = stratified_sample(docs, ["source", "lang"], 5, id_col="doc_id")
    plan = _plan(out)
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1

    got = out.groupBy("source", "lang").count()
    cells = docs.groupBy("source", "lang").count().withColumnRenamed("count", "n")
    joined = got.join(cells, ["source", "lang"]).collect()
    assert joined, "no strata produced"
    for r in joined:
        assert r["count"] == min(5, r["n"]), (r["source"], r["lang"], r["count"], r["n"])

    # partition invariance: a different physical layout selects the same ids
    reshuffled = stratified_sample(
        docs.repartition(7, "doc_id"), ["source", "lang"], 5, id_col="doc_id"
    )
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in reshuffled.select("doc_id").collect()}
    assert a == b


def test_quality_classifier_narrow_no_udf(spark, sf_dir):
    """The quality-classifier gate must stay entirely NARROW: the model
    is a plan-literal array folded JVM-side per row — no Python UDF
    (Arrow or row), no explode, no Exchange, no join anywhere in the
    executed plan.  At 100 TB this is one pass over the text column."""
    from bigdatamigratecloud_spark.operators.text import (
        classifier_weights,
        quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    w, b = classifier_weights(n_buckets=256, seed=7)
    plan = _plan(quality_classifier(docs, w, b))
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython",
                "MapInPandas", "Generate", "Join"):
        assert bad not in plan, f"{bad} leaked into the classifier plan"
    assert "Scan parquet" in plan or "FileScan" in plan


def test_funnel_never_self_crosses(spark, sf_dir):
    """Funnel stages must compose as user-keyed equi-joins of shrinking
    aggregates — no cartesian/nested-loop join of the events table."""
    from bigdatamigratecloud_spark.operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    plan = _plan(funnel(ev, ["view", "click", "purchase"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_url_blocklist_is_broadcast_anti_join(spark, sf_dir):
    """The domain gate must broadcast the blocklist and leave the corpus
    unshuffled: one BroadcastHashJoin LeftAnti, zero Exchanges on the
    probe side beyond the broadcast itself."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.operators.urls import url_blocklist_filter

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://h"), F.col("doc_id"), F.lit(".example.com/p")).alias(
            "target_uri"
        ),
    )
    bl = spark.createDataFrame([("example9.com",)], "domain string")
    plan = _plan(url_blocklist_filter(docs, bl))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_build_single_exchange_partial_agg(spark, sf_dir):
    """The sketch is one (row,bucket) aggregation: exactly one Exchange,
    with map-side partial aggregation collapsing to <= d*w cells."""
    from bigdatamigratecloud_spark.operators.bloom import cms_build

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    plan = _plan(cms_build(li, "l_suppkey", w=64, d=4))
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_mlp_embed_no_shuffle(spark, sf_dir):
    """Inference is embarrassingly parallel: no Exchange anywhere."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.inference import (
        deterministic_weights,
        mlp_embed,
    )

    ids = spark.createDataFrame(
        [(i, [i % 9, i % 7]) for i in range(50)], "doc_id long, ids array<long>"
    )
    plan = _plan(mlp_embed(ids, deterministic_weights(32)))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_temperature_mixture_rebalances(spark, sf_dir):
    """τ=1/2 law: rates are uniform-per-group, tails keep a HIGHER rate
    than heads, realized budget lands at/below the target (clipping),
    and the draw is deterministic across physical layouts."""
    from bigdatamigratecloud_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = temperature_mixture_sample(docs, "lang", "doc_id", budget_frac=0.5)
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    rates = {r.lang: r.mix_rate for r in kept.select("lang", "mix_rate").distinct().collect()}
    langs = sorted(sizes, key=sizes.get)
    for small, big in zip(langs, langs[1:]):
        if sizes[small] < sizes[big] and small in rates and big in rates:
            assert rates[small] >= rates[big], (small, big)
    total = sum(sizes.values())
    assert kept.count() <= 0.5 * total * 1.15  # at/below budget + draw noise
    again = temperature_mixture_sample(
        docs.repartition(13), "lang", "doc_id", budget_frac=0.5
    )
    assert {r.doc_id for r in again.select("doc_id").collect()} == {
        r.doc_id for r in kept.select("doc_id").collect()
    }


def test_write_sized_parquet_bounds_file_count(spark, sf_dir, tmp_path):
    """The sized writer lands near the target: a tiny target splits the
    table into several uniform files, a huge target collapses to one;
    rows roundtrip exactly."""
    import glob

    from bigdatamigratecloud_spark.operators.layout import write_sized_parquet

    li = spark.range(30_000).select(
        F.col("id"), F.concat(F.lit("x" * 990), F.col("id")).alias("pad")
    )
    small = str(tmp_path / "small")
    parts = write_sized_parquet(li, small, target_mb=1)
    files = glob.glob(small + "/*.parquet")
    assert parts > 1 and len(files) == parts
    sizes = [__import__("os").path.getsize(f) for f in files]
    assert max(sizes) < 8 * 1024 * 1024  # near 1MB target, never huge
    assert min(sizes) * 4 > max(sizes)  # round-robin => uniform
    big = str(tmp_path / "big")
    assert write_sized_parquet(li, big, target_mb=4096) == 1
    assert spark.read.parquet(small).count() == li.count()
    empty = str(tmp_path / "empty")
    assert write_sized_parquet(li.limit(0), empty) == 1
    assert spark.read.parquet(empty).count() == 0


def test_maxsim_broadcasts_query_tokens(spark, sf_dir):
    """MaxSim's corpus-token side must never shuffle: the query token
    set ships as a broadcast and both aggregations are keyed, so the
    only exchanges are the two (query,doc)-keyed aggs."""
    emb = load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        F.expr("vec_id DIV 5").alias("doc_id"),
        (F.col("vec_id") % 5).alias("tok_pos"),
        F.col("embedding").alias("vec"),
    )
    from bigdatamigratecloud_spark.operators.retrieval import maxsim_topk

    df = maxsim_topk(
        toks.filter(F.col("doc_id") >= 3),
        toks.filter(F.col("doc_id") < 3).withColumnRenamed("doc_id", "query_id"),
        k=5,
    )
    df.collect()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_ratio_model_broadcasts(spark, sf_dir):
    """DSIR's bucket-ratio model (B rows) must reach the corpus feature
    stream as a broadcast join — the corpus never shuffles to meet the
    model."""
    from bigdatamigratecloud_spark.operators.sampling import dsir_score

    docs = load_table(spark, sf_dir, "documents")
    df = dsir_score(docs, docs.filter(F.col("lang") == "en"), n_buckets=64)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_phrase_anchor_join_broadcasts_phrases(spark, sf_dir):
    """The phrase word set must broadcast onto the posting list; the
    posting list itself must never self-join."""
    from bigdatamigratecloud_spark.operators.retrieval import phrase_match_counts
    from bigdatamigratecloud_spark.operators.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    phrases = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("phrase_id"), F.slice(_toks("text"), 1, 4).alias("words")
    )
    df = phrase_match_counts(docs, phrases)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_write_range_sorted_parquet_global_order(spark, sf_dir, tmp_path):
    """File i's key range must sit strictly below file i+1's, and rows
    inside every file must be sorted — the stats-prunable layout."""
    from bigdatamigratecloud_spark.operators.layout import write_range_sorted_parquet
    import glob

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    p = str(tmp_path / "sorted")
    write_range_sorted_parquet(li, p, ["l_orderkey"], n_files=4)
    files = sorted(f for f in glob.glob(p + "/part-*") if f.endswith(".parquet"))
    assert len(files) >= 2
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        col = pq.read_table(f, columns=["l_orderkey"]).column(0).to_pylist()
        assert col == sorted(col), f  # sorted within file
        ranges.append((min(col), max(col)))
    # part-file name order IS range order for repartitionByRange output
    spans = sorted(ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans  # disjoint, globally ordered
    # nothing lost
    total = sum(
        pq.read_table(f, columns=["l_orderkey"]).num_rows for f in files
    )
    assert total == li.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_range_sorted_parquet(li, p, [])


# ------------------------------------------------- round-9 additions

def test_cusum_plan_one_group_shuffle(spark, sf_dir):
    """CUSUM is two window passes over ONE user-keyed exchange — the
    prefix-identity rewrite must not introduce a per-entity fold or a
    second shuffle."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.temporal import cusum_flags

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(cusum_flags(ev, target=50.0, slack=5.0, threshold=200.0))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_trend_ols_plan_broadcast_min_join(spark, sf_dir):
    """OLS trend: the per-group min joins back as a BROADCAST — the big
    frame shuffles only for its own aggregations."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.temporal import trend_ols_by_group

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").alias("h"), F.lit(1).alias("v")
    )
    plan = _plan(trend_ols_by_group(ev, "event_type", "h", "v"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rm3_plan_feedback_side_broadcasts(spark, sf_dir):
    """RM3's second corpus pass must probe the feedback docs as a
    broadcast — never shuffle the corpus token stream against a 10-row
    frame."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.retrieval import rm3_expand

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(rm3_expand(docs, ["join", "vector", "slow"]))
    assert "BroadcastHashJoin" in plan
    # top-k of expansion terms is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_bfs_frontier_join_no_cartesian(spark):
    from bigdatamigratecloud_spark.operators.cluster import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "src long, dst long"
    )
    src = spark.createDataFrame([(0,)], "node long")
    out = bfs_hops(edges, src, max_hops=3)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_power_gram_join_is_equi_join(spark):
    """The d²-cell covariance comes from an id-keyed EQUI-join of the
    exploded coordinate frame with itself — never a cartesian."""
    import random

    from bigdatamigratecloud_spark.operators.similarity import pca_power

    rng = random.Random(2)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    out = pca_power(df, iters=2)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_robots_gate_broadcasts_rules_corpus_unshuffled(spark, sf_dir):
    """The robots gate (wildcards included, round 11) must broadcast the
    per-host effective-rule arrays and leave the corpus side unshuffled:
    the only Exchanges in the plan belong to the (blocklist-sized) rules
    aggregation, never to the corpus scan -> filter chain."""
    from bigdatamigratecloud_spark.operators.urls import robots_gate, robots_rules

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), F.col("doc_id") % 5, F.lit(".example.com/p/"),
            F.col("doc_id"), F.lit("/"),
        ).alias("target_uri"),
    )
    rules = robots_rules(
        spark.createDataFrame(
            [(f"h{i}.example.com",
              "User-agent: *\nDisallow: /p/1\nAllow: /p/*3/$\n")
             for i in range(5)],
            "host string, robots_txt string",
        )
    )
    plan = _plan(robots_gate(docs, rules))
    assert "BroadcastHashJoin" in plan
    # documents scanned exactly once
    assert plan.count("FileScan parquet") == 1
    # the corpus PROBE branch (the ':-' subtree of the BroadcastHashJoin,
    # scan -> projections -> join) must contain no Exchange; the rules
    # side (blocklist-sized) may shuffle freely under its
    # BroadcastExchange
    lines = plan.splitlines()
    bhj = next(i for i, l in enumerate(lines) if "BroadcastHashJoin" in l)
    probe = []
    for l in lines[bhj + 1:]:
        if l.lstrip().startswith(":"):
            probe.append(l)
        else:
            break
    assert probe and not any("Exchange" in l for l in probe), "\n".join(probe)
    assert any("FileScan parquet" in l for l in probe)


def test_vector_free_snapshot_keeps_join_free_fast_path(spark, tmp_path):
    """Round 12: the deletion-vector machinery must cost a vector-free
    table NOTHING — its snapshot plan is a plain schema'd scan (no
    row-identity columns, no anti-join, one FileScan); after a masked
    delete exactly one anti-join appears; after compact the fast path
    returns."""
    from bigdatamigratecloud_spark.sources.acid_table import AcidTable

    base = spark.range(0, 2_000).withColumn("v", F.lit(0).cast("long")).coalesce(2)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    plan0 = _plan(t.snapshot())
    assert "LeftAnti" not in plan0 and "__pos" not in plan0
    assert plan0.count("FileScan parquet") == 1
    t.delete("id % 100 = 7")  # 20/2000 -> vectors
    plan1 = _plan(t.snapshot())
    # exactly one anti-join, and the tiny vector side BROADCASTS
    assert plan1.count("LeftAnti") == 1 and "__pos" in plan1
    assert "BroadcastHashJoin" in plan1
    t.compact(target_files=2)  # materializes vectors away
    plan2 = _plan(t.snapshot())
    assert "LeftAnti" not in plan2 and "__pos" not in plan2
