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
