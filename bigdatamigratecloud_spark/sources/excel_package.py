"""Excel workbook package source/sink (S5/S6/S10, SURVEY §2.1): one
worksheet per table with the reference's layout, normalized into the SAME
long staging format as the XML path — one ingest path, exactly as the
reference re-serializes the workbook's DataSet back to XML and reuses the
XML importer (Codeunit 60001:359-363 -> 60000:419-530).

Worksheet layout (ExportExcel/ReadWorksheetData, Codeunit 60001:96-200,
369-462):
    A1 = Package Code     C1 = table name      (XLS:406-427: R1C1/R1C3)
    row 3 = column captions (field names)      (XLS:401, 566)
    rows 4.. = data                            (XLS:428-458)
Sheet names are clamped to Excel's 31-char limit with the id+caption
fallback (XLS:758-767).

Excel-mode type rendering differences vs XML mode (FormatFieldValue,
Codeunit 60000:845-858):
- BLOB columns are written as UTF-8 *text*, not Base64 — the reference's
  custom delta (XML:855-858, 1280-1291, marked `// >> ... // <<`);
- booleans render as TRUE/FALSE text rather than 0/1 index
  (option/boolean "as text in Excel", XML:848-849).

Workbooks are driver-bounded interchange artifacts (the reference's
DataSet path is equally single-node); the scale path is the XML/parquet
package.  Export streams rows via toLocalIterator so memory stays at one
row, not one table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.scalars import clamp_sheet_name
from ..operators.staging import serialize_cell, wide_to_staging
from ..plans.spec import FieldSpec, PackageSpec, TableSpec
from .xlsx import Sheet, read_xlsx, write_xlsx

HEADER_ROW = 1
CAPTION_ROW = 3
DATA_START_ROW = 4


def excel_cell(col: F.Column, data_type: T.DataType) -> F.Column:
    """Excel-mode rendering: BLOB -> UTF-8 text (the custom delta,
    XML:1280-1291); boolean -> TRUE/FALSE; everything else = XML-mode
    staging string."""
    if isinstance(data_type, T.BinaryType):
        return F.decode(col, "UTF-8")
    if isinstance(data_type, T.BooleanType):
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(col, F.lit("TRUE")).otherwise(F.lit("FALSE"))
        )
    return serialize_cell(col, data_type)


def export_package_excel(
    spark: SparkSession,
    spec: PackageSpec,
    sf_dir: str,
    out_path: str,
    cell_comments: dict[str, dict[tuple[int, str], str]] | None = None,
) -> list[str]:
    """One worksheet per package table; returns the sheet names written.

    Fidelity extras matching the reference's workbook decoration
    (XLS:528-598, 641-679): a header AUTOFILTER over the caption row, a
    structured TABLE part spanning the data region (one named column per
    caption — the XSD-mapped table-part analogue), and optional
    validation CELL COMMENTS via ``cell_comments``:
    {table_name: {(0-based data row, field name): comment text}}."""
    from ..operators.navfilter import nav_filter
    from .xlsx import col_letters

    cell_comments = cell_comments or {}
    sheets: list[Sheet] = []
    for idx, ts in enumerate(spec.tables):
        df = load_table(spark, sf_dir, ts.table_name)
        for fld, expr in ts.filters.items():
            df = df.filter(nav_filter(fld, expr))
        fields = ts.included_fields()
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        ser = df.select(
            *[excel_cell(F.col(c), dtypes[c]).alias(c) for c in fields]
        )
        sheet = Sheet(name=clamp_sheet_name(ts.table_name, idx))
        sheet.set_row(HEADER_ROW, [spec.package_code, None, ts.table_name])
        sheet.set_row(CAPTION_ROW, fields)
        r = DATA_START_ROW
        for row in ser.toLocalIterator():
            sheet.set_row(r, [row[c] for c in fields])
            r += 1
        region = f"A{CAPTION_ROW}:{col_letters(len(fields))}{max(r - 1, CAPTION_ROW)}"
        sheet.autofilter = region
        sheet.table_range = region
        sheet.table_columns = list(fields)
        col_of = {c: i + 1 for i, c in enumerate(fields)}
        for (data_row, fname), text in cell_comments.get(ts.table_name, {}).items():
            if fname in col_of:
                sheet.comments[(DATA_START_ROW + data_row, col_of[fname])] = text
        sheets.append(sheet)
    write_xlsx(out_path, sheets)
    return [s.name for s in sheets]


def preview_workbook(path: str) -> list[dict]:
    """Import preview: row-1 scan of every sheet -> (sheet, package code,
    table name) buffer the user confirms (Codeunit 60001:258-294)."""
    out = []
    for s in read_xlsx(path):
        vals = s.row_values(HEADER_ROW, 3)
        out.append(
            {
                "sheet": s.name,
                "package_code": vals[0] if vals else None,
                "table_name": vals[2] if len(vals) >= 3 else None,
                "n_rows": max(0, s.n_rows - DATA_START_ROW + 1),
            }
        )
    return out


def import_package_excel(
    spark: SparkSession,
    path: str,
    expected_package_code: str | None = None,
    selected_tables: set[str] | None = None,
    binary_fields: dict[str, set[str]] | None = None,
) -> tuple[PackageSpec, dict[str, DataFrame]]:
    """Workbook -> {table: long staging DataFrame} — the same staging
    contract as import_package_to_staging, so validate/pivot/apply are
    shared (one ingest path, §3.3).

    Missing Package Code / table name in a sheet is a hard error
    (Codeunit 60000:648-657); a code mismatch likewise (XML:410-413).
    `selected_tables` mirrors the preview-confirm gate (P7).
    `binary_fields` names BLOB columns whose text cells must be encoded
    back to bytes on apply (S11 Excel mode).
    """
    binary_fields = binary_fields or {}
    tables: list[TableSpec] = []
    staged: dict[str, DataFrame] = {}
    pkg_code: str | None = None
    for s in read_xlsx(path):
        hdr = s.row_values(HEADER_ROW, 3)
        code = hdr[0] if hdr else None
        tname = hdr[2] if len(hdr) >= 3 else None
        if not code or not tname:
            raise ValueError(
                f"sheet {s.name!r}: missing Package Code (A1) or table name (C1)"
            )
        code, tname = str(code), str(tname)
        if expected_package_code is not None and code != expected_package_code:
            raise ValueError(
                f"package code mismatch: sheet {s.name!r} has {code!r}, expected {expected_package_code!r}"
            )
        if pkg_code is None:
            pkg_code = code
        if selected_tables is not None and tname not in selected_tables:
            continue  # P7 worksheet-selection filter
        # keep each caption WITH its column index: a workbook authored in
        # Excel can have a gap in the caption row, and positional reads
        # would silently shift every later column's data one field left
        cap_cells = sorted(
            (c, v) for (r, c), v in s.cells.items()
            if r == CAPTION_ROW and v is not None
        )
        captions = [str(v) for _c, v in cap_cells]
        cap_cols = [c for c, _v in cap_cells]
        rows = []
        for r in range(DATA_START_ROW, s.n_rows + 1):
            vals = [s.cells.get((r, c)) for c in cap_cols]
            rows.append(tuple(None if v is None else str(v) for v in vals))
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in captions])
        wide = spark.createDataFrame(rows, schema)
        # S11 Excel mode: BLOB columns were exported as UTF-8 TEXT (the
        # reference's custom delta); re-encode them to the Base64 staging
        # rendering here so the SHARED validate/pivot path (which decodes
        # BinaryType via unbase64) round-trips the bytes
        for b in binary_fields.get(tname, set()):
            if b in captions:
                wide = wide.withColumn(
                    b, F.base64(F.encode(F.col(f"`{b}`"), "UTF-8"))
                )
        staged[tname] = wide_to_staging(wide, code, tname, captions)
        tables.append(
            TableSpec(
                table_name=tname,
                fields=[FieldSpec(field_name=c, processing_order=i) for i, c in enumerate(captions)],
            )
        )
    spec = PackageSpec(package_code=pkg_code or "", tables=tables)
    return spec, staged
