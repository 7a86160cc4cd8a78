"""Unit tests for the §2 coverage-completion operators: the fused
single-pass FK violation sweep and the stage-leveled toposort."""

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators.upsert import (
    fk_violation_counts_fused,
    fk_violations,
)
from bigdatamigratecloud_spark.plans.toposort import stages


def test_fused_fk_counts_match_per_relation_anti_joins(spark):
    child = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 999), (3, 77, 100), (4, 77, 999), (5, None, 100)],
        "id INT, fk_a INT, fk_b INT",
    )
    parent_a = spark.createDataFrame([(10,), (20,)], "pk INT")
    parent_b = spark.createDataFrame([(100,), (200,)], "pk INT")

    fused = {
        r["relation"]: r["violations"]
        for r in fk_violation_counts_fused(
            child, [("fk_a", parent_a, "pk"), ("fk_b", parent_b, "pk")], "child"
        ).collect()
    }
    # per-relation anti-joins (the reference's one-check-per-relation shape)
    expect = {
        "child.fk_a": fk_violations(child, "fk_a", parent_a, "pk").count(),
        "child.fk_b": fk_violations(child, "fk_b", parent_b, "pk").count(),
    }
    assert fused == expect == {"child.fk_a": 3, "child.fk_b": 2}


def test_fused_fk_counts_single_child_scan(spark):
    """The whole point of the fusion: ONE scan of the child feeds every
    relation check (broadcast hash joins stacked on one probe side)."""
    child = spark.createDataFrame([(1, 10, 100)], "id INT, fk_a INT, fk_b INT")
    pa = spark.createDataFrame([(10,)], "pk INT")
    pb = spark.createDataFrame([(100,)], "pk INT")
    plan = fk_violation_counts_fused(
        child, [("fk_a", pa, "pk"), ("fk_b", pb, "pk")], "child"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2


def test_stages_levels_are_longest_path_depth():
    edges = [("region", "nation"), ("nation", "customer"), ("customer", "orders"),
             ("orders", "lineitem"), ("part", "lineitem")]
    tabs = ["region", "nation", "customer", "part", "orders", "lineitem", "events"]
    lv = stages(tabs, edges)
    level_of = {t: i for i, names in enumerate(lv) for t in names}
    assert level_of == {
        "region": 0, "part": 0, "events": 0,
        "nation": 1, "customer": 2, "orders": 3, "lineitem": 4,
    }
    for parent, child in edges:
        assert level_of[parent] < level_of[child]


def test_stages_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        stages(["a", "b"], [("a", "b"), ("b", "a")])


def test_progress_reporter_observes_pipeline(spark, sf_dir, tmp_path):
    """X3: the ProgressReporter sees package/table start+finish milestones
    in dependency order with correct row counts."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.plans.pipeline import run_import
    from bigdatamigratecloud_spark.plans.progress import ProgressReporter
    from bigdatamigratecloud_spark.plans.spec import FieldSpec, PackageSpec, TableSpec
    from bigdatamigratecloud_spark.sources.xml_package import export_package_xml

    names = ("region", "nation")
    dfs = {t: load_table(spark, sf_dir, t) for t in names}
    spec = PackageSpec(
        package_code="PROG",
        tables=[
            TableSpec(table_name=t, fields=[FieldSpec(field_name=c) for c in dfs[t].columns])
            for t in names
        ],
    )
    pkg = str(tmp_path / "prog.rapidstart")
    export_package_xml(spark, spec, sf_dir, pkg)
    rep = ProgressReporter()
    run_import(
        spark, pkg, str(tmp_path / "tgt"), {t: dfs[t].schema for t in names},
        spec, expected_package_code="PROG", reporter=rep,
    )
    assert rep.package_code == "PROG"
    assert set(rep.tables) == {"region", "nation"}
    assert rep.tables["region"].rank < rep.tables["nation"].rank  # dependency order
    for t in names:
        assert rep.tables[t].finished_at is not None
        assert rep.tables[t].rows_applied == dfs[t].count()


def test_skip_validation_flag_bypasses_quarantine(spark, sf_dir, tmp_path):
    """X6: Skip Table Triggers — the validation stage is gated off, bad
    cells flow through (typed-parse nulls) instead of quarantining."""
    from pyspark.sql import functions as F

    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.operators.staging import melt_to_staging
    from bigdatamigratecloud_spark.plans.pipeline import apply_staged_table

    c = load_table(spark, sf_dir, "customer")
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey")
    corrupt = staged.withColumn(
        "value",
        F.when(
            (F.col("field_name") == "c_acctbal") & (F.col("record_no") == 1),
            F.lit("not-a-number"),
        ).otherwise(F.col("value")),
    )
    n = c.count()
    validated = apply_staged_table(
        spark, corrupt, c.schema, "customer", str(tmp_path / "v"), skip_validation=False
    )
    skipped = apply_staged_table(
        spark, corrupt, c.schema, "customer", str(tmp_path / "s"), skip_validation=True
    )
    assert validated.rows_quarantined == 1
    assert skipped.rows_quarantined == 0
    assert skipped.rows_applied == n  # rows survive; the bad cell parses to NULL


def test_schema_drift_merge_read(spark, tmp_path):
    """Corpus batches drift (a later batch adds a column): mergeSchema
    reads the union schema, earlier rows surface NULL for the new column —
    the S1-scan behavior a long-lived 100 TB table actually needs."""
    p1, p2 = f"{tmp_path}/drift/b1", f"{tmp_path}/drift/b2"
    spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 5.0)], "id long, x string, y double"
    ).write.parquet(p2)
    df = spark.read.option("mergeSchema", True).parquet(p1, p2)
    assert {f.name for f in df.schema.fields} == {"id", "x", "y"}
    rows = {r["id"]: (r["x"], r["y"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 5.0)}


def test_pipeline_acid_apply_and_transactional_reimport(spark, sf_dir, tmp_path):
    """acid=True lands pipeline targets as AcidTables: first import
    creates version 0, a RE-import of the same package REPLACES the
    contents as one atomic commit (version bumps, counts stable, stale
    rows absent from the package dropped — X5 parity with the plain
    path), and a reader that resolved the pre-reimport snapshot is
    never torn."""
    from bigdatamigratecloud_spark.catalog import load_table
    from bigdatamigratecloud_spark.plans.pipeline import run_import
    from bigdatamigratecloud_spark.plans.spec import FieldSpec, PackageSpec, TableSpec
    from bigdatamigratecloud_spark.sources.acid_table import AcidTable
    from bigdatamigratecloud_spark.sources.xml_package import export_package_xml

    names = ("region", "nation")
    dfs = {t: load_table(spark, sf_dir, t) for t in names}
    spec = PackageSpec(
        package_code="ACID",
        tables=[
            TableSpec(table_name=t, fields=[FieldSpec(field_name=c) for c in dfs[t].columns])
            for t in names
        ],
    )
    pkg = str(tmp_path / "acid.rapidstart")
    export_package_xml(spark, spec, sf_dir, pkg)
    tgt = str(tmp_path / "tgt")
    schemas = {t: dfs[t].schema for t in names}

    rep1 = run_import(spark, pkg, tgt, schemas, spec, expected_package_code="ACID", acid=True)
    for t in names:
        at = AcidTable(spark, f"{tgt}/{t}")
        assert at.latest_version() == 0
        assert at.snapshot().count() == dfs[t].count()
        assert rep1.tables[t].rows_applied == dfs[t].count()

    # reader resolves the v0 snapshot BEFORE the re-import
    pre = AcidTable(spark, f"{tgt}/nation").snapshot()

    # plant a stale row the re-imported package does not contain: X5
    # delete-before-processing parity requires the re-import to drop it
    nat = AcidTable(spark, f"{tgt}/nation")
    stale = spark.createDataFrame([(9999, "STALEROW", 0)], dfs["nation"].schema)
    nat.append(stale)

    rep2 = run_import(spark, pkg, tgt, schemas, spec, expected_package_code="ACID", acid=True)
    for t in names:
        at = AcidTable(spark, f"{tgt}/{t}")
        assert at._read_manifest(at.latest_version())["operation"] == "overwrite"
        assert at.snapshot().count() == dfs[t].count()  # replace, not append
        assert rep2.tables[t].rows_applied == dfs[t].count()
    post = AcidTable(spark, f"{tgt}/nation").snapshot()
    assert post.filter("n_nationkey = 9999").count() == 0  # stale row gone
    # pre-reimport reader still sees a consistent v0
    assert pre.count() == dfs["nation"].count()


def test_suppress_small_groups_complementary(spark):
    """Single small cell: its n/total must NOT be published under the
    SUPPRESSED label (differencing recovers it) — the smallest kept
    cell is withheld too, so the bucket mixes two cells and >= k
    members."""
    from bigdatamigratecloud_spark.operators.validation import suppress_small_groups

    rows = (
        [("a", float(i)) for i in range(10)]      # kept, n=10 (victim: smallest kept)
        + [("b", float(i)) for i in range(20)]    # kept, n=20
        + [("c", 7.0)]                            # the ONE small cell
    )
    df = spark.createDataFrame(rows, "grp string, val double")
    out = {
        r["grp"]: (r["n"], r["total"])
        for r in suppress_small_groups(
            df, ["grp"], k=5, sum_col="val",
            other_keys={"grp": "SUPPRESSED"},
        ).collect()
    }
    # 'c' never appears alone; bucket = c + victim 'a'
    assert set(out) == {"b", "SUPPRESSED"}
    assert out["SUPPRESSED"] == (11, sum(range(10)) + 7.0)
    assert out["b"] == (20, float(sum(range(20))))


def test_suppress_small_groups_no_trigger_unchanged(spark):
    """Two small cells whose union reaches k: plain roll-up, no victim."""
    from bigdatamigratecloud_spark.operators.validation import suppress_small_groups

    rows = (
        [("a", 1.0)] * 10 + [("b", 1.0)] * 3 + [("c", 1.0)] * 4
    )
    df = spark.createDataFrame(rows, "grp string, val double")
    out = {
        r["grp"]: (r["n"], r["total"])
        for r in suppress_small_groups(
            df, ["grp"], k=5, sum_col="val",
            other_keys={"grp": "SUPPRESSED"},
        ).collect()
    }
    assert out == {"a": (10, 10.0), "SUPPRESSED": (7, 7.0)}


def test_fused_fk_counts_duplicate_and_null_parent_keys(spark):
    """Round-13 guard for the key-as-marker form: duplicate parent keys
    must not multiply probe rows (the key set is deduped before the
    left join) and NULL parent keys must never match anything — counts
    must equal NOT EXISTS semantics exactly."""
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id INT, fk INT"
    )
    parent = spark.createDataFrame([(10,), (10,), (None,)], "pk INT")
    out = {
        r["relation"]: r["violations"]
        for r in fk_violation_counts_fused(
            child, [("fk", parent, "pk")], "child"
        ).collect()
    }
    # violations: 99 (no parent) and NULL fk (matches nothing) = 2
    assert out == {"child.fk": 2}


def test_fk_graph_counts_match_per_child_fused(spark):
    """Round-13 guard for fk_violation_counts_graph: the one-aggregate
    multi-child form must count exactly what per-child fused sweeps do,
    including a parent key set SHARED by object identity between two
    children and NULL/duplicate keys."""
    from bigdatamigratecloud_spark.operators.upsert import (
        fk_violation_counts_graph,
    )

    nation = spark.createDataFrame([(10,), (10,), (None,)], "pk INT")  # shared
    region = spark.createDataFrame([(100,)], "pk INT")
    cust = spark.createDataFrame([(1, 10), (2, 99), (3, None)], "id INT, fk INT")
    supp = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 999)], "id INT, fk INT, fk_r INT"
    )
    out = {
        r["relation"]: r["violations"]
        for r in fk_violation_counts_graph(
            [
                ("cust", cust, [("fk", nation, "pk")]),
                ("supp", supp, [("fk", nation, "pk"), ("fk_r", region, "pk")]),
            ]
        ).collect()
    }
    expect = {
        "cust.fk": fk_violations(cust, "fk", nation, "pk").count(),
        "supp.fk": fk_violations(supp, "fk", nation, "pk").count(),
        "supp.fk_r": fk_violations(supp, "fk_r", region, "pk").count(),
    }
    assert out == expect == {"cust.fk": 2, "supp.fk": 0, "supp.fk_r": 1}
