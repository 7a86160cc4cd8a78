"""Minimal xlsx codec (no external deps): write and read SpreadsheetML
zip packages with inline strings.

The container has no openpyxl/xlsxwriter, and the reference drives Excel
through raw OpenXML interop anyway (WorkbookWriter/WorkbookReader +
OpenXmlSpreadsheet, dotnet.txt_al:140-199), so a small standards-based
codec is the honest equivalent: xlsx = ZIP of SpreadsheetML parts
(ECMA-376).  Writer emits inline strings (`t="inlineStr"`) so no
sharedStrings table is needed; reader handles inline strings, shared
strings, and numeric cells, so workbooks from Excel itself also load.

Driver-side by design: workbooks are interchange artifacts for humans
(bounded size), exactly like the reference's DataSet-backed path
(Codeunit 60001:369-462).  The 100 TB path is the XML/parquet package,
never xlsx; export_package_excel shards one worksheet per table and
documents the bound.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from dataclasses import dataclass, field

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def col_letters(index: int) -> str:
    """1-based column index -> A1 letters (same math as scalars.a1_col_letters;
    local copy keeps this module dependency-free)."""
    out = ""
    while index:
        index, rem = divmod(index - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


@dataclass
class Sheet:
    name: str
    # sparse cell map: (row, col) 1-based -> value (str | int | float | None)
    cells: dict[tuple[int, int], object] = field(default_factory=dict)
    # A1-style range the header autofilter covers, e.g. "A3:H120"
    # (the reference sets an autofilter over the caption row, XLS:641-679)
    autofilter: str | None = None
    # validation cell comments: (row, col) -> text (XLS:528-598 writes the
    # per-cell validation error as a comment)
    comments: dict[tuple[int, int], str] = field(default_factory=dict)
    # structured table over the data region (A1 range); rendered as an
    # Excel table part with one typed column per caption — the XSD-mapped
    # table-part analogue (XLS:528-598)
    table_range: str | None = None
    table_columns: list[str] = field(default_factory=list)

    def set_row(self, row: int, values: list[object], start_col: int = 1) -> None:
        for i, v in enumerate(values):
            if v is not None:
                self.cells[(row, start_col + i)] = v

    def row_values(self, row: int, n_cols: int | None = None) -> list[object]:
        if n_cols is None:
            cols = [c for (r, c) in self.cells if r == row]
            n_cols = max(cols) if cols else 0
        return [self.cells.get((row, c)) for c in range(1, n_cols + 1)]

    @property
    def n_rows(self) -> int:
        return max((r for (r, _c) in self.cells), default=0)


def write_xlsx(path: str, sheets: list[Sheet]) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        for i, s in enumerate(sheets):
            if s.comments:
                overrides += (
                    f'<Override PartName="/xl/comments{i+1}.xml" '
                    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.comments+xml"/>'
                )
            if s.table_range:
                overrides += (
                    f'<Override PartName="/xl/tables/table{i+1}.xml" '
                    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.table+xml"/>'
                )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_PKG_REL}">'
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_tags = "".join(
            f'<sheet name="{_esc(s.name)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
            for i, s in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i+1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_PKG_REL}">{rels}</Relationships>',
        )
        for i, s in enumerate(sheets):
            n = i + 1
            z.writestr(f"xl/worksheets/sheet{n}.xml", _sheet_xml(s))
            sheet_rels = ""
            if s.comments:
                sheet_rels += (
                    '<Relationship Id="rIdComments" '
                    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/comments" '
                    f'Target="../comments{n}.xml"/>'
                )
                z.writestr(f"xl/comments{n}.xml", _comments_xml(s))
            if s.table_range:
                sheet_rels += (
                    '<Relationship Id="rIdTable" '
                    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/table" '
                    f'Target="../tables/table{n}.xml"/>'
                )
                z.writestr(f"xl/tables/table{n}.xml", _table_xml(s, n))
            if sheet_rels:
                z.writestr(
                    f"xl/worksheets/_rels/sheet{n}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<Relationships xmlns="{_NS_PKG_REL}">{sheet_rels}</Relationships>',
                )


def _comments_xml(s: Sheet) -> str:
    """Validation-error cell comments (XLS:528-598 attaches the error text
    to the offending cell).  Standards-valid comments part; the legacy VML
    needed for Excel's floating-box RENDERING is a declared simplification
    — the comment data round-trips through any OpenXML reader."""
    items = "".join(
        f'<comment ref="{col_letters(c)}{r}" authorId="0">'
        f'<text><t xml:space="preserve">{_esc(text)}</t></text></comment>'
        for (r, c), text in sorted(s.comments.items())
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<comments xmlns="{_NS}"><authors><author>bdmc</author></authors>'
        f"<commentList>{items}</commentList></comments>"
    )


def _table_xml(s: Sheet, n: int) -> str:
    """Structured table over the data region — one typed tableColumn per
    caption (the XSD-mapped table-part analogue, XLS:528-598)."""
    cols = "".join(
        f'<tableColumn id="{i+1}" name="{_esc(c)}"/>' for i, c in enumerate(s.table_columns)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<table xmlns="{_NS}" id="{n}" name="Table{n}" displayName="Table{n}" '
        f'ref="{s.table_range}" headerRowCount="1">'
        f'<autoFilter ref="{s.table_range}"/>'
        f'<tableColumns count="{len(s.table_columns)}">{cols}</tableColumns>'
        "</table>"
    )


def _sheet_xml(s: Sheet) -> str:
    rows: dict[int, list[tuple[int, object]]] = {}
    for (r, c), v in s.cells.items():
        rows.setdefault(r, []).append((c, v))
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}"><sheetData>',
    ]
    for r in sorted(rows):
        parts.append(f'<row r="{r}">')
        for c, v in sorted(rows[r]):
            ref = f"{col_letters(c)}{r}"
            if isinstance(v, bool):
                parts.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                parts.append(f'<c r="{ref}" t="n"><v>{v!r}</v></c>')
            else:
                parts.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'
                )
        parts.append("</row>")
    parts.append("</sheetData>")
    if s.autofilter:
        parts.append(f'<autoFilter ref="{s.autofilter}"/>')
    if s.table_range:
        parts.append(
            '<tableParts count="1"><tablePart '
            f'xmlns:r="{_NS_REL}" r:id="rIdTable"/></tableParts>'
        )
    parts.append("</worksheet>")
    return "".join(parts)


_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")

# builtin numFmtIds Excel renders as dates/times (ECMA-376 §18.8.30)
_DATE_NUMFMT_IDS = set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(range(50, 59))


def _is_date_format(code: str) -> bool:
    """Heuristic for CUSTOM format codes: date/time token outside quoted
    literals and [] sections (e.g. 'yyyy-mm-dd', 'h:mm AM/PM')."""
    bare = re.sub(r'"[^"]*"|\[[^\]]*\]', "", code)
    return bool(re.search(r"[ymdhs]", bare, re.IGNORECASE))


def _date_style_ids(z: zipfile.ZipFile) -> set[int]:
    """Style (xf) indexes whose number format renders as a date — real
    Excel stores dates as raw serial NUMBERS plus a format; without this,
    a date column re-imports as '45306' instead of '2024-01-15'."""
    if "xl/styles.xml" not in z.namelist():
        return set()
    try:
        st = ET.fromstring(z.read("xl/styles.xml"))
    except ET.ParseError:
        return set()
    custom_date = {
        int(nf.attrib["numFmtId"])
        for nf in st.iter(f"{{{_NS}}}numFmt")
        if _is_date_format(nf.attrib.get("formatCode", ""))
    }
    ids: set[int] = set()
    xfs = st.find(f"{{{_NS}}}cellXfs")
    if xfs is None:
        return set()
    for i, xf in enumerate(xfs.findall(f"{{{_NS}}}xf")):
        fmt = int(xf.attrib.get("numFmtId", "0"))
        if fmt in _DATE_NUMFMT_IDS or fmt in custom_date:
            ids.add(i)
    return ids


_EXCEL_EPOCH = None  # lazily built datetime(1899, 12, 30)


def _serial_to_datetime(serial: float):
    """Excel date serial -> datetime (1900 date system; the epoch is
    1899-12-30 because Excel's serial 60 is the fictitious 1900-02-29).
    Integral serials come back as date, fractional as datetime."""
    import datetime as dt

    global _EXCEL_EPOCH
    if _EXCEL_EPOCH is None:
        _EXCEL_EPOCH = dt.datetime(1899, 12, 30)
    out = _EXCEL_EPOCH + dt.timedelta(days=serial)
    # round sub-second float fuzz to the nearest second (Excel's own
    # resolution in date formats)
    if out.microsecond:
        out = (out + dt.timedelta(seconds=0.5)).replace(microsecond=0)
    if out.hour == 0 and out.minute == 0 and out.second == 0:
        return out.date()
    return out


def read_xlsx(path: str) -> list[Sheet]:
    """Parse workbook -> sheets with 1-based (row, col) cell maps.
    Numeric cells come back as int when integral else float; strings as
    str (inline or shared)."""
    with zipfile.ZipFile(path) as z:
        date_styles = _date_style_ids(z)
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            rel.attrib["Id"]: rel.attrib["Target"]
            for rel in rels.findall(f"{{{_NS_PKG_REL}}}Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        sheets: list[Sheet] = []
        for sh in wb.find(f"{{{_NS}}}sheets").findall(f"{{{_NS}}}sheet"):
            name = sh.attrib["name"]
            rid = sh.attrib[f"{{{_NS_REL}}}id"]
            target = rel_target[rid]
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            sheet = Sheet(name=name)
            root = ET.fromstring(z.read(target))
            for row_el in root.iter(f"{{{_NS}}}row"):
                for c_el in row_el.findall(f"{{{_NS}}}c"):
                    ref = c_el.attrib.get("r")
                    if not ref:
                        continue
                    m = _CELL_REF.match(ref)
                    col = 0
                    for ch in m.group(1):
                        col = col * 26 + ord(ch) - ord("A") + 1
                    r = int(m.group(2))
                    ctype = c_el.attrib.get("t", "n")
                    val: object = None
                    if ctype == "inlineStr":
                        is_el = c_el.find(f"{{{_NS}}}is")
                        val = "".join(t.text or "" for t in is_el.iter(f"{{{_NS}}}t"))
                    else:
                        v_el = c_el.find(f"{{{_NS}}}v")
                        if v_el is None or v_el.text is None:
                            continue
                        if ctype == "s":
                            val = shared[int(v_el.text)]
                        elif ctype == "b":
                            val = v_el.text == "1"
                        elif ctype == "str":
                            val = v_el.text
                        else:  # numeric (or unknown type, e.g. t="e" error
                            # cells from real Excel: '#DIV/0!' — degrade to
                            # the raw text rather than crash the import)
                            try:
                                f = float(v_el.text)
                                style = int(c_el.attrib.get("s", "-1"))
                                if style in date_styles:
                                    val = _serial_to_datetime(f)
                                else:
                                    val = int(f) if f.is_integer() else f
                            except ValueError:
                                val = v_el.text
                    sheet.cells[(r, col)] = val
            af = root.find(f"{{{_NS}}}autoFilter")
            if af is not None:
                sheet.autofilter = af.attrib.get("ref")
            _read_sheet_extras(z, target, sheet)
            sheets.append(sheet)
        return sheets


def _parse_ref(ref: str) -> tuple[int, int]:
    m = _CELL_REF.match(ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + ord(ch) - ord("A") + 1
    return int(m.group(2)), col


def _read_sheet_extras(z: zipfile.ZipFile, sheet_target: str, sheet: Sheet) -> None:
    """Round-trip comments and table parts via the worksheet's rels."""
    import posixpath

    base = posixpath.dirname(sheet_target)
    rels_path = posixpath.join(base, "_rels", posixpath.basename(sheet_target) + ".rels")
    if rels_path not in z.namelist():
        return
    rels = ET.fromstring(z.read(rels_path))
    for rel in rels.findall(f"{{{_NS_PKG_REL}}}Relationship"):
        target = posixpath.normpath(posixpath.join(base, rel.attrib["Target"]))
        rtype = rel.attrib["Type"]
        if rtype.endswith("/comments") and target in z.namelist():
            com = ET.fromstring(z.read(target))
            for c_el in com.iter(f"{{{_NS}}}comment"):
                text = "".join(t.text or "" for t in c_el.iter(f"{{{_NS}}}t"))
                sheet.comments[_parse_ref(c_el.attrib["ref"])] = text
        elif rtype.endswith("/table") and target in z.namelist():
            tbl = ET.fromstring(z.read(target))
            sheet.table_range = tbl.attrib.get("ref")
            sheet.table_columns = [
                tc.attrib["name"] for tc in tbl.iter(f"{{{_NS}}}tableColumn")
            ]
