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
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", _sheet_xml(s))


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
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def read_xlsx(path: str) -> list[Sheet]:
    """Parse workbook -> sheets with 1-based (row, col) cell maps.
    Numeric cells come back as int when integral else float; strings as
    str (inline or shared)."""
    with zipfile.ZipFile(path) as z:
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
                        else:  # numeric
                            f = float(v_el.text)
                            val = int(f) if f.is_integer() else f
                    sheet.cells[(r, col)] = val
            sheets.append(sheet)
        return sheets
