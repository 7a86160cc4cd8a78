"""Round-trip golden tests (SURVEY §5 item 2): table -> export XML.gz ->
import -> stage -> validate -> pivot -> apply -> table must be a fixed
point; plus the reference's error paths (§5 item 4)."""

from __future__ import annotations

import gzip
import os

import pytest

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import PRIMARY_KEYS, load_table
from bigdatamigratecloud_spark.plans.pipeline import dependency_ranks, run_import
from bigdatamigratecloud_spark.plans.spec import FieldSpec, PackageSpec, TableSpec
from bigdatamigratecloud_spark.sources.xml_package import (
    export_package_sharded,
    export_package_xml,
    import_package_to_staging,
    peek_package,
)


def make_spec(spark, sf_dir, tables, filters=None) -> PackageSpec:
    specs = []
    for i, t in enumerate(tables):
        df = load_table(spark, sf_dir, t)
        pks = set(PRIMARY_KEYS.get(t, ()))
        fields = [
            FieldSpec(field_name=c, primary_key=(c in pks), processing_order=j)
            for j, c in enumerate(df.columns)
        ]
        specs.append(
            TableSpec(table_name=t, processing_order=i, fields=fields, filters=(filters or {}).get(t, {}))
        )
    return PackageSpec(package_code="PKG1", package_name="roundtrip", tables=specs)


@pytest.fixture(scope="module")
def pkg_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pkg") / "PKG1.rapidstart")
    spec = make_spec(spark, sf_dir, ["region", "nation", "customer", "orders"])
    export_package_xml(spark, spec, sf_dir, path)
    return path


def test_peek_header_and_field_inference(pkg_path):
    h = peek_package(pkg_path)
    assert h.package_code == "PKG1"
    assert [t["table_name"] for t in h.tables] == ["region", "nation", "customer", "orders"]
    cust = next(t for t in h.tables if t["table_name"] == "customer")
    assert [f["field_name"] for f in cust["fields"]] == [
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ]
    # PK metadata attrs survive on the first record (ExportMetadata)
    assert next(f for f in cust["fields"] if f["field_name"] == "c_custkey")["primary_key"]


def test_full_roundtrip_fixed_point(spark, sf_dir, pkg_path, tmp_path):
    target = str(tmp_path / "applied")
    schemas = {
        t: load_table(spark, sf_dir, t).schema
        for t in ["region", "nation", "customer", "orders"]
    }
    report = run_import(spark, pkg_path, target, schemas, expected_package_code="PKG1")
    assert not report.errors
    # dependency order: region before nation before customer before orders
    flat = [t for rank in report.order for t in rank]
    assert flat.index("region") < flat.index("nation") < flat.index("customer") < flat.index("orders")
    for t in schemas:
        src = load_table(spark, sf_dir, t)
        dst = spark.read.parquet(os.path.join(target, t))
        assert dst.count() == src.count(), t
        assert dst.exceptAll(src).count() == 0, t
        assert src.exceptAll(dst).count() == 0, t
        assert report.tables[t].rows_quarantined == 0
        assert report.tables[t].fk_violations == 0


def test_package_code_mismatch_is_hard_error(spark, pkg_path):
    # XML:410-413
    with pytest.raises(ValueError, match="package code mismatch"):
        import_package_to_staging(spark, pkg_path, expected_package_code="OTHER")


def test_wrong_file_type_is_error(spark, tmp_path):
    # XML:1106-1107: not-a-package -> error
    bad = tmp_path / "bad.rapidstart"
    with gzip.open(bad, "wt") as fh:
        fh.write("<NotAPackage/>")
    with pytest.raises(ValueError, match="not a package file"):
        peek_package(str(bad))


def test_unknown_table_becomes_error_record(spark, sf_dir, pkg_path, tmp_path):
    # XML:543-547: unknown table id -> error record, import continues
    schemas = {"region": load_table(spark, sf_dir, "region").schema}
    report = run_import(spark, pkg_path, str(tmp_path / "t"), schemas, expected_package_code="PKG1")
    assert set(report.errors) == {"nation", "customer", "orders"}
    assert "region" in report.tables


def test_export_filter_pushdown(spark, sf_dir, tmp_path):
    # P2: package filters applied at the scan (XML:141-156)
    path = str(tmp_path / "filtered.rapidstart")
    spec = make_spec(spark, sf_dir, ["customer"], filters={"customer": {"c_mktsegment": "BUILDING"}})
    export_package_xml(spark, spec, sf_dir, path)
    _, staged = import_package_to_staging(spark, path)
    n_src = (
        load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").count()
    )
    n_staged_records = staged["customer"].select("record_no").distinct().count()
    assert n_staged_records == n_src


def test_sharded_export_matches_single_file(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sharded")
    spec = make_spec(spark, sf_dir, ["nation"])
    export_package_sharded(spark, spec, sf_dir, out)
    import json

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["package_code"] == "PKG1"
    lines = spark.read.text(os.path.join(out, "nation")).count()
    assert lines == load_table(spark, sf_dir, "nation").count()


def test_dependency_ranks_parallel_groups():
    ranks = dependency_ranks(["region", "nation", "customer", "supplier", "orders", "lineitem", "part"])
    flat = {t: i for i, rank in enumerate(ranks) for t in rank}
    assert flat["region"] < flat["nation"] < flat["customer"] < flat["orders"] < flat["lineitem"]
    # customer and supplier are independent -> same rank
    assert flat["customer"] == flat["supplier"]
    # part has no parents -> rank 0
    assert flat["part"] == 0


def test_sharded_import_roundtrip(spark, sf_dir, tmp_path):
    """Sharded export -> DISTRIBUTED sharded import (from_xml, no driver
    XML pass) -> pivot: equals the source table exactly."""
    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging
    from bigdatamigratecloud_spark.sources.xml_package import import_sharded_to_staging

    out = str(tmp_path / "sharded_rt")
    spec = make_spec(spark, sf_dir, ["customer"])
    export_package_sharded(spark, spec, sf_dir, out)

    manifest, staged = import_sharded_to_staging(spark, out, expected_package_code="PKG1")
    assert [t["table_name"] for t in manifest["tables"]] == ["customer"]

    src = load_table(spark, sf_dir, "customer")
    wide = pivot_from_staging(staged["customer"], src.schema)
    cols = src.columns
    assert wide.select(cols).exceptAll(src.select(cols)).count() == 0
    assert src.select(cols).exceptAll(wide.select(cols)).count() == 0


# --- robustness round-trips: values/names the TPC-H fixtures never hit ----

def _write_weird_table(spark, tmp_path, name="weird", field2="No."):
    """A tiny table with XML-hostile VALUES (newlines, &, <, quotes) and an
    XML-hostile FIELD NAME (sanitization changes it)."""
    df = spark.createDataFrame(
        [
            (1, "line1\nline2", "A&B <tag>"),
            (2, "quote'dq\"x", "plain"),
            (3, None, "r\r\nn"),
        ],
        f"id long, txt string, `{field2}` string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))
    return df


def _spec_for(df, table_name, pk=("id",)):
    fields = [
        FieldSpec(field_name=c, primary_key=(c in pk), processing_order=j)
        for j, c in enumerate(df.columns)
    ]
    return PackageSpec(
        package_code="WEIRD",
        package_name='Q&A "migration" <v1>',
        tables=[TableSpec(table_name=table_name, fields=fields)],
    )


def test_single_file_roundtrip_with_hostile_values_and_names(spark, tmp_path):
    """Newlines/&/< in values and a sanitized field name ('No.') must
    round-trip EXACTLY through export -> peek -> import -> validate ->
    pivot; before the FieldName-attribute fix the whole 'No.' column
    silently quarantined and landed NULL."""
    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging
    from bigdatamigratecloud_spark.operators.validation import split_quarantine, validate_staging

    src = _write_weird_table(spark, tmp_path)
    spec = _spec_for(src, "weird")
    pkg = str(tmp_path / "weird.rapidstart")
    export_package_xml(spark, spec, str(tmp_path), pkg)

    header = peek_package(pkg)
    assert header.package_name == 'Q&A "migration" <v1>'  # attr escaping
    assert [f["field_name"] for f in header.tables[0]["fields"]] == ["id", "txt", "No."]

    _, staged = import_package_to_staging(spark, pkg, expected_package_code="WEIRD")
    validated = validate_staging(staged["weird"], src.schema)
    good, quarantined = split_quarantine(validated)
    assert quarantined.count() == 0
    back = pivot_from_staging(good, src.schema)
    # NAV-has-no-NULL semantic (record_xml_col docstring): a NULL string
    # exports as an empty element and re-imports as '' — coerce the
    # expectation the same way the reference would
    want = {
        tuple("" if v is None else v for v in r) for r in src.collect()
    }
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_sharded_roundtrip_with_newlines(spark, tmp_path):
    """One record per text line: a value containing \\n used to split its
    record into two unparseable fragments that staged as all-NULL rows."""
    from bigdatamigratecloud_spark.sources.xml_package import import_sharded_to_staging
    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging

    src = _write_weird_table(spark, tmp_path, name="weirdsh")
    spec = _spec_for(src, "weirdsh")
    out_dir = str(tmp_path / "sharded_pkg")
    export_package_sharded(spark, spec, str(tmp_path), out_dir)
    _, staged = import_sharded_to_staging(spark, out_dir, expected_package_code="WEIRD")
    back = pivot_from_staging(staged["weirdsh"], src.schema)
    want = {
        tuple("" if v is None else v for v in r) for r in src.collect()
    }
    assert {tuple(r) for r in back.collect()} == want


def test_empty_table_roundtrip_has_zero_rows(spark, sf_dir, tmp_path):
    """The empty-table template record carries field METADATA only; before
    the template='1' marker it re-imported as one phantom all-null row."""
    spec = make_spec(spark, sf_dir, ["region"], filters={"region": {"r_regionkey": ">9999"}})
    pkg = str(tmp_path / "empty.rapidstart")
    export_package_xml(spark, spec, sf_dir, pkg)
    header = peek_package(pkg)
    # metadata still inferred from the template
    assert [f["field_name"] for f in header.tables[0]["fields"]][0] == "r_regionkey"
    assert header.tables[0]["fields"][0]["primary_key"]
    _, staged = import_package_to_staging(spark, pkg)
    assert staged["region"].count() == 0


def test_record_tag_collision_with_field_name(spark, tmp_path):
    """Table 'currency' with a field literally named 'Currency' would nest
    <Currency> inside <Currency>; the exporter dodges to CurrencyRecord
    and the importer follows the artifact's own tag."""
    df = spark.createDataFrame(
        [(1, "USD"), (2, "EUR")], "id long, Currency string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "currency.parquet"))
    spec = _spec_for(df, "currency")
    pkg = str(tmp_path / "cur.rapidstart")
    export_package_xml(spark, spec, str(tmp_path), pkg)
    header = peek_package(pkg)
    assert header.tables[0]["record_tag"] == "CurrencyRecord"
    _, staged = import_package_to_staging(spark, pkg)
    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging

    back = pivot_from_staging(staged["currency"], df.schema)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_validation_and_pivot_agree_on_fractionless_timestamps(spark):
    """A cell that PASSES validation must never silently become NULL at
    pivot: '2020-05-01 12:00:00' (no fractional seconds, as the Excel
    bridge or a foreign package writes) parses in both stages."""
    from pyspark.sql import types as T

    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging
    from bigdatamigratecloud_spark.operators.validation import split_quarantine, validate_staging

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    staged = spark.createDataFrame(
        [
            ("P", "t", 1, "id", "7", None),
            ("P", "t", 1, "ts", "2020-05-01 12:00:00", None),
        ],
        "package_code string, table_name string, record_no long, "
        "field_name string, value string, error string",
    )
    good, quarantined = split_quarantine(validate_staging(staged, schema))
    assert quarantined.count() == 0
    (row,) = pivot_from_staging(good, schema).collect()
    assert row.ts is not None and row.ts.hour == 12


def test_create_missing_codes_persists_to_parent_target(spark, sf_dir, tmp_path):
    """J5 create-missing-codes must land in the PARENT's written target
    (the reference inserts into the real table, XML:112-113, 690-692) —
    not just a transient in-memory frame.  Export region FILTERED (some
    region keys missing) + full nation with create_missing_codes on the
    FK: after run_import, the region parquet contains the auto-created
    parent keys and the report row count includes them."""
    spec = make_spec(
        spark, sf_dir, ["region", "nation"],
        filters={"region": {"r_regionkey": "0..2"}},  # drop regions 3,4
    )
    for f in spec.table("nation").fields:
        if f.field_name == "n_regionkey":
            f.create_missing_codes = True
    pkg = str(tmp_path / "cmc.rapidstart")
    export_package_xml(spark, spec, sf_dir, pkg)
    target = str(tmp_path / "cmc_target")
    schemas = {t: load_table(spark, sf_dir, t).schema for t in ("region", "nation")}
    report = run_import(spark, pkg, target, schemas, spec)
    back = spark.read.parquet(os.path.join(target, "region"))
    keys = {r.r_regionkey for r in back.select("r_regionkey").collect()}
    assert {0, 1, 2, 3, 4} <= keys  # 3,4 auto-created from nation FKs
    assert report.tables["region"].rows_applied == back.count()
    # auto-created parents carry NULL attributes
    created = back.filter(F.col("r_regionkey") == 3).collect()
    assert len(created) == 1 and created[0].r_name is None


def test_one_failing_table_becomes_error_record(spark, sf_dir, tmp_path):
    """A table whose apply throws must become a per-table error record
    (XML:543-547) while siblings still apply — not an aborted import."""
    from pyspark.sql import types as T

    spec = make_spec(spark, sf_dir, ["region", "nation"])
    pkg = str(tmp_path / "err.rapidstart")
    export_package_xml(spark, spec, sf_dir, pkg)
    target = str(tmp_path / "err_target")
    schemas = {
        "region": load_table(spark, sf_dir, "region").schema,
        # a schema referencing a column the staging never carries makes
        # nation's pivot/apply fail at execution
        "nation": T.StructType([T.StructField("definitely_missing", T.LongType())]),
    }
    report = run_import(spark, pkg, target, schemas, spec)
    assert "region" in report.tables and report.tables["region"].rows_applied == 5
    assert "nation" in report.errors and "apply failed" in report.errors["nation"]
