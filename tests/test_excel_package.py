"""Excel bridge tests: xlsx codec roundtrip, worksheet layout parity,
preview manifest, one-ingest-path staging equality with the XML path, and
the reference's Excel error paths."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.catalog import load_table
from bigdatamigratecloud_spark.operators.staging import pivot_from_staging
from bigdatamigratecloud_spark.operators.validation import split_quarantine, validate_staging
from bigdatamigratecloud_spark.plans.spec import FieldSpec, PackageSpec, TableSpec
from bigdatamigratecloud_spark.sources.excel_package import (
    export_package_excel,
    import_package_excel,
    preview_workbook,
)
from bigdatamigratecloud_spark.sources.xlsx import Sheet, read_xlsx, write_xlsx


def test_xlsx_codec_roundtrip(tmp_path):
    s = Sheet(name="t1")
    s.set_row(1, ["PKG", None, "customer"])
    s.set_row(3, ["a", "b"])
    s.set_row(4, ["x & <y>", 42])
    s.set_row(5, [3.5, True])
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, [s])
    back = read_xlsx(path)
    assert len(back) == 1 and back[0].name == "t1"
    assert back[0].cells[(1, 1)] == "PKG"
    assert back[0].cells[(1, 3)] == "customer"
    assert back[0].cells[(4, 1)] == "x & <y>"
    assert back[0].cells[(4, 2)] == 42
    assert back[0].cells[(5, 1)] == 3.5
    assert back[0].cells[(5, 2)] is True


def _spec(spark, sf_dir, tables):
    out = []
    for i, t in enumerate(tables):
        df = load_table(spark, sf_dir, t)
        out.append(
            TableSpec(
                table_name=t,
                processing_order=i,
                fields=[FieldSpec(field_name=c, processing_order=j) for j, c in enumerate(df.columns)],
            )
        )
    return PackageSpec(package_code="XL1", tables=out)


@pytest.fixture(scope="module")
def wb_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xl") / "pkg.xlsx")
    export_package_excel(spark, _spec(spark, sf_dir, ["region", "nation"]), sf_dir, path)
    return path


def test_preview_manifest(wb_path):
    pv = preview_workbook(wb_path)
    assert [(p["sheet"], p["package_code"], p["table_name"]) for p in pv] == [
        ("region", "XL1", "region"),
        ("nation", "XL1", "nation"),
    ]
    assert pv[0]["n_rows"] == 5
    assert pv[1]["n_rows"] == 25


def test_excel_roundtrip_fixed_point(spark, sf_dir, wb_path):
    _spec_out, staged = import_package_excel(spark, wb_path, expected_package_code="XL1")
    for t in ["region", "nation"]:
        src = load_table(spark, sf_dir, t)
        validated = validate_staging(staged[t], src.schema)
        valid, quar = split_quarantine(validated)
        assert quar.count() == 0
        back = pivot_from_staging(valid, src.schema)
        assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_sheet_selection_filter(spark, wb_path):
    # P7: import only confirmed sheets (Codeunit 60001:251-256)
    _s, staged = import_package_excel(spark, wb_path, selected_tables={"nation"})
    assert set(staged) == {"nation"}


def test_code_mismatch_and_missing_header(spark, tmp_path, wb_path):
    with pytest.raises(ValueError, match="package code mismatch"):
        import_package_excel(spark, wb_path, expected_package_code="OTHER")
    # missing A1/C1 -> hard error (Codeunit 60000:648-657)
    bad = Sheet(name="bad")
    bad.set_row(3, ["a"])
    bad.set_row(4, ["1"])
    path = str(tmp_path / "bad.xlsx")
    write_xlsx(path, [bad])
    with pytest.raises(ValueError, match="missing Package Code"):
        import_package_excel(spark, path)


def test_blob_as_utf8_text_delta(spark, tmp_path):
    # the reference's custom delta: BLOB cells travel as UTF-8 text
    # (Codeunit 60000:855-858, 1280-1291), not Base64
    df = spark.createDataFrame(
        [(1, bytearray(b"hello blob")), (2, bytearray("unicode éß".encode()))],
        "id long, payload binary",
    )
    df.createOrReplaceTempView("blobtab")
    from bigdatamigratecloud_spark.sources.excel_package import excel_cell

    rendered = df.select(excel_cell(F.col("payload"), df.schema["payload"].dataType).alias("v")).collect()
    assert [r.v for r in rendered] == ["hello blob", "unicode éß"]
    # and back: encode on apply (S11 Excel mode)
    back = (
        df.select("id", excel_cell(F.col("payload"), df.schema["payload"].dataType).alias("v"))
        .select("id", F.encode("v", "UTF-8").alias("payload"))
    )
    assert back.exceptAll(df).count() == 0


def test_xlsx_autofilter_table_and_comments_roundtrip(tmp_path):
    from bigdatamigratecloud_spark.sources.xlsx import Sheet, read_xlsx, write_xlsx

    s = Sheet(name="t")
    s.set_row(3, ["a", "b"])
    s.set_row(4, ["x", 1])
    s.set_row(5, ["y", 2])
    s.autofilter = "A3:B5"
    s.table_range = "A3:B5"
    s.table_columns = ["a", "b"]
    s.comments[(4, 2)] = "value out of range"
    path = str(tmp_path / "deco.xlsx")
    write_xlsx(path, [s])
    back = read_xlsx(path)[0]
    assert back.autofilter == "A3:B5"
    assert back.table_range == "A3:B5"
    assert back.table_columns == ["a", "b"]
    assert back.comments == {(4, 2): "value out of range"}
    assert back.cells[(5, 2)] == 2


def test_export_package_excel_decorations(spark, sf_dir, tmp_path):
    from bigdatamigratecloud_spark.plans.spec import FieldSpec, PackageSpec, TableSpec
    from bigdatamigratecloud_spark.sources.excel_package import export_package_excel
    from bigdatamigratecloud_spark.sources.xlsx import read_xlsx

    spec = PackageSpec(
        package_code="DECO",
        tables=[
            TableSpec(
                table_name="region",
                fields=[
                    FieldSpec(field_name="r_regionkey", processing_order=0),
                    FieldSpec(field_name="r_name", processing_order=1),
                ],
            )
        ],
    )
    path = str(tmp_path / "deco_pkg.xlsx")
    export_package_excel(
        spark, spec, sf_dir, path,
        cell_comments={"region": {(0, "r_name"): "checked against dim set"}},
    )
    sheet = read_xlsx(path)[0]
    # autofilter + table over caption row .. last data row (5 regions)
    assert sheet.autofilter == "A3:B8"
    assert sheet.table_range == "A3:B8"
    assert sheet.table_columns == ["r_regionkey", "r_name"]
    # comment landed on data row 0 of r_name (= row 4, col 2)
    assert sheet.comments == {(4, 2): "checked against dim set"}


def test_read_xlsx_tolerates_error_cells(tmp_path):
    """Workbooks from real Excel can carry error cells (t="e", value like
    '#DIV/0!'); the reader must degrade them to their raw text instead of
    crashing the whole import on float()."""
    import zipfile

    from bigdatamigratecloud_spark.sources.xlsx import Sheet, read_xlsx, write_xlsx

    path = str(tmp_path / "err.xlsx")
    s = Sheet(name="S1")
    s.set_row(1, ["ok", 2])
    write_xlsx(path, [s])
    # splice an error cell into the sheet XML the way Excel writes it
    with zipfile.ZipFile(path) as z:
        names = {n: z.read(n) for n in z.namelist()}
    xml = names["xl/worksheets/sheet1.xml"].decode()
    xml = xml.replace(
        "</row>", '<c r="C1" t="e"><v>#DIV/0!</v></c></row>', 1
    )
    names["xl/worksheets/sheet1.xml"] = xml.encode()
    with zipfile.ZipFile(path, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)

    (back,) = read_xlsx(path)
    assert back.cells[(1, 1)] == "ok"
    assert back.cells[(1, 2)] == 2
    assert back.cells[(1, 3)] == "#DIV/0!"


def test_read_xlsx_converts_date_serials(tmp_path):
    """Real Excel stores dates as raw serial NUMBERS plus a number format;
    the reader must convert styled numeric cells to dates/datetimes so an
    Excel-edited date column re-imports as '2024-01-15', not '45306'."""
    import datetime as dt
    import zipfile

    from bigdatamigratecloud_spark.sources.xlsx import Sheet, read_xlsx, write_xlsx

    path = str(tmp_path / "dates.xlsx")
    s = Sheet(name="S1")
    s.set_row(1, ["plain", 45306])  # un-styled number must STAY a number
    write_xlsx(path, [s])

    with zipfile.ZipFile(path) as z:
        names = {n: z.read(n) for n in z.namelist()}
    # styles: xf 0 = general, xf 1 = builtin date 14 (m/d/yyyy),
    # xf 2 = custom datetime format
    names["xl/styles.xml"] = (
        '<?xml version="1.0"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy-mm-dd hh:mm"/></numFmts>'
        '<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs>'
        "</styleSheet>"
    ).encode()
    xml = names["xl/worksheets/sheet1.xml"].decode()
    # C1: serial 45306 styled as date; D1: serial with time fraction
    xml = xml.replace(
        "</row>",
        '<c r="C1" s="1" t="n"><v>45306</v></c>'
        '<c r="D1" s="2" t="n"><v>45306.5</v></c></row>',
        1,
    )
    names["xl/worksheets/sheet1.xml"] = xml.encode()
    with zipfile.ZipFile(path, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)

    (back,) = read_xlsx(path)
    assert back.cells[(1, 2)] == 45306  # un-styled stays numeric
    assert back.cells[(1, 3)] == dt.date(2024, 1, 15)
    assert back.cells[(1, 4)] == dt.datetime(2024, 1, 15, 12, 0, 0)


def test_import_excel_caption_gap_keeps_alignment(spark, tmp_path):
    """A workbook authored in Excel can have a BLANK caption cell; data
    under later captions must still map to the right fields (a positional
    read would shift everything one column left)."""
    from bigdatamigratecloud_spark.sources.excel_package import import_package_excel
    from bigdatamigratecloud_spark.sources.xlsx import Sheet, write_xlsx

    path = str(tmp_path / "gap.xlsx")
    s = Sheet(name="t1")
    s.set_row(1, ["PKGG", None, "gappy"])
    # captions in columns A and C; B is blank
    s.cells[(3, 1)] = "alpha"
    s.cells[(3, 3)] = "gamma"
    s.cells[(4, 1)] = "a1"
    s.cells[(4, 2)] = "IGNORED"  # data under the blank caption
    s.cells[(4, 3)] = "g1"
    write_xlsx(path, [s])

    spec, staged = import_package_excel(spark, path)
    cells = {
        (r.field_name): r.value for r in staged["gappy"].collect()
    }
    assert cells == {"alpha": "a1", "gamma": "g1"}


def test_import_excel_binary_fields_roundtrip_bytes(spark, tmp_path):
    """S11 Excel mode: BLOB columns exported as UTF-8 text must re-encode
    to BYTES through the shared validate/pivot path when declared in
    binary_fields (previously the parameter was accepted and ignored)."""
    from pyspark.sql import types as T

    from bigdatamigratecloud_spark.operators.staging import pivot_from_staging
    from bigdatamigratecloud_spark.sources.excel_package import import_package_excel
    from bigdatamigratecloud_spark.sources.xlsx import Sheet, write_xlsx

    path = str(tmp_path / "blob.xlsx")
    s = Sheet(name="t1")
    s.set_row(1, ["PKGB", None, "blobby"])
    s.set_row(3, ["id", "payload"])
    s.set_row(4, ["1", "hello bytes"])
    write_xlsx(path, [s])

    _, staged = import_package_excel(
        spark, path, binary_fields={"blobby": {"payload"}}
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    (row,) = pivot_from_staging(staged["blobby"], schema).collect()
    assert bytes(row.payload) == b"hello bytes"
