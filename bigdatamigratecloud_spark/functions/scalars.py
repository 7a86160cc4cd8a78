"""Scalar function library (SURVEY §2.8): the reference's string/type/codec
helpers re-expressed as Spark Column expressions (JVM-side; no Python UDFs)
plus the driver-side pure-Python helpers (name math, DateFormula).
"""

from __future__ import annotations

import datetime as _dt
import functools as _functools
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1: XML element-name sanitization (GetElementName, Codeunit 60000:925-939)
# Rules, in reference order:
#   1. first char not letter/underscore -> prefix '_'
#   2. delete  ? ' `
#   3. map  < > , . / \ + & ( ) % :  -> space
#   4. '-' -> '_'
#   5. delete all spaces
_DELETE_CHARS = "?'`"
_SPACE_CHARS = "<>,./\\+&()%:"


# XML 1.0 (5th ed) NameStartChar / NameChar ranges (':' excluded — the
# reference emits unprefixed element names)
_NAME_START_RANGES = (
    (0x41, 0x5A), (0x5F, 0x5F), (0x61, 0x7A), (0xC0, 0xD6), (0xD8, 0xF6),
    (0xF8, 0x2FF), (0x370, 0x37D), (0x37F, 0x1FFF), (0x200C, 0x200D),
    (0x2070, 0x218F), (0x2C00, 0x2FEF), (0x3001, 0xD7FF), (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD), (0x10000, 0xEFFFF),
)
_NAME_EXTRA_RANGES = (
    (0x2D, 0x2E), (0x30, 0x39), (0xB7, 0xB7), (0x300, 0x36F), (0x203F, 0x2040),
)


@_functools.lru_cache(maxsize=4096)
def _expat_accepts(fragment: str) -> bool:
    """True when the stdlib XML parser (expat — the same engine that writes
    and re-reads our packages) accepts `fragment` as a document.  expat
    implements XML 1.0 4th-edition name rules, slightly stricter than the
    5th-edition ranges; the parser itself is the authoritative oracle."""
    import xml.etree.ElementTree as ET

    try:
        ET.fromstring(fragment)
        return True
    except ET.ParseError:
        return False


def _is_name_start(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _NAME_START_RANGES) and _expat_accepts(f"<{ch}/>")


def _is_name_char(ch: str) -> bool:
    cp = ord(ch)
    if not (
        any(lo <= cp <= hi for lo, hi in _NAME_START_RANGES)
        or any(lo <= cp <= hi for lo, hi in _NAME_EXTRA_RANGES)
    ):
        return False
    return _expat_accepts(f"<_{ch}/>")


def sanitize_xml_name(name: str) -> str:
    """Driver-side variant (column *names* live on the driver).

    After the reference's mapping chain, any character that is still not
    an XML NameChar is dropped — the reference never hits these (NAV field
    names are already near-valid), but this engine accepts arbitrary
    schema names, so the output must be a VALID XML name unconditionally."""
    out = name
    for ch in _DELETE_CHARS:
        out = out.replace(ch, "")
    for ch in _SPACE_CHARS:
        out = out.replace(ch, " ")
    out = out.replace("-", "_")
    out = out.replace(" ", "")
    out = "".join(ch for ch in out if _is_name_char(ch))
    if not out or not _is_name_start(out[0]):
        out = "_" + out
    return out


def sanitize_xml_name_col(col: Column) -> Column:
    """Same rules as a Catalyst expression, for sanitizing name *data*.

    Parity with the driver version for all ASCII inputs: after the
    mapping chain, remaining ASCII non-NameChars are DROPPED (``a*b`` ->
    ``ab``, as the driver does) and only an ASCII non-start first char
    forces the ``_`` prefix.  Non-ASCII characters are kept and accepted
    as starts — the practical XML 1.0 5th-ed behavior; the driver's exact
    codepoint-range check is authoritative for exotic planes."""
    out = F.translate(col, _DELETE_CHARS, "")
    out = F.translate(out, _SPACE_CHARS, " " * len(_SPACE_CHARS))
    out = F.translate(out, "-", "_")
    out = F.replace(out, F.lit(" "), F.lit(""))
    out = F.regexp_replace(out, r"[\x00-\x2C\x2F\x3A-\x40\x5B-\x5E\x60\x7B-\x7F]", "")
    bad_start = out.rlike("^[0-9.]")
    return F.when(bad_start | (F.length(out) == 0), F.concat(F.lit("_"), out)).otherwise(out)


# F2: Field_/Table_ prefixing in Excel mode (Codeunit 60000:942-957)
def prefix_field(name: str) -> str:
    return f"Field_{name}"


def prefix_table(name: str) -> str:
    return f"Table_{name}"


# F3: bounded-string truncation (COPYSTR(v,1,MAXSTRLEN), e.g. XML:459-461)
def truncate(col: Column, max_len: int) -> Column:
    return F.substring(col, 1, max_len)


# P4: zero-FK suppression (Codeunit 60000:831-834): FK-typed zero exported
# as empty
def suppress_zero_fk(col: Column) -> Column:
    return F.when(col == 0, F.lit(None)).otherwise(col)


# F9/F10: BLOB codecs (Codeunit 60000:1135-1142 base64; 1280-1291 utf-8)
def blob_to_base64(col: Column) -> Column:
    return F.base64(col)


def base64_to_blob(col: Column) -> Column:
    return F.unbase64(col)


def blob_to_text(col: Column) -> Column:
    return F.decode(col, "UTF-8")


def text_to_blob(col: Column) -> Column:
    return F.encode(col, "UTF-8")


# F12: Spark type -> XSD type (GetXSDType, Codeunit 60000:1030-1051)
_XSD = {
    "tinyint": "xsd:integer",
    "smallint": "xsd:integer",
    "int": "xsd:integer",
    "bigint": "xsd:integer",
    "date": "xsd:date",
    "timestamp": "xsd:dateTime",
    "boolean": "xsd:boolean",
}


def xsd_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return "xsd:string"  # reference exports decimals as formatted text
    return _XSD.get(spark_type, "xsd:string")


# F13: Excel A1-reference math (Codeunit 60001:720-737, GetXLColumnID)
def a1_col_letters(index: int) -> str:
    """1-based column index -> letters (1->A, 27->AA)."""
    if index < 1:
        raise ValueError("column index is 1-based")
    out = ""
    while index:
        index, rem = divmod(index - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def a1_col_index(letters: str) -> int:
    out = 0
    for ch in letters.upper():
        if not "A" <= ch <= "Z":
            raise ValueError(f"bad column letters {letters!r}")
        out = out * 26 + (ord(ch) - ord("A") + 1)
    return out


_A1_RE = re.compile(r"^([A-Za-z]+)(\d+)$")


def parse_a1(ref: str) -> tuple[int, int]:
    """'B7' -> (row 7, col 2)."""
    m = _A1_RE.match(ref)
    if not m:
        raise ValueError(f"bad A1 ref {ref!r}")
    return int(m.group(2)), a1_col_index(m.group(1))


def parse_a1_range(ref: str) -> tuple[tuple[int, int], tuple[int, int]]:
    """'A3:E6' -> ((3,1),(6,5))."""
    lo, _, hi = ref.partition(":")
    return parse_a1(lo), parse_a1(hi if hi else lo)


# F15: worksheet-name clamp: Excel's 31-char limit; fallback to id+caption
# (Codeunit 60001:758-767)
def clamp_sheet_name(name: str, table_id: int | None = None) -> str:
    bad = set('[]:*?/\\')
    clean = "".join(ch for ch in name if ch not in bad)
    if len(clean) <= 31:
        return clean
    if table_id is not None:
        prefix = f"{table_id} "
        return (prefix + clean)[:31]
    return clean[:31]


# F7: locale-aware date render for Excel export (Codeunit 60000:850-853:
# `TypeHelper.FormatDate(DATE2DMY(...), ConfigPackage."Language ID")`).
# The package's Windows Language ID (LCID) picks the date shape; rendering
# stays JVM-side (date_format pattern per locale — no Python in the row
# path).  Coverage is two-tier: exact LCID overrides below, then a
# primary-language fallback (LCID & 0x3FF — the published Windows LCID
# structure), so ANY Language ID of a known language renders correctly
# and truly unknown ones fall back to ISO-8601 (the XML-mode rendering).
LOCALE_DATE_PATTERNS: dict[int, str] = {
    1033: "M/d/yyyy",    # en-US (the one English that leads with month)
    2057: "dd/MM/yyyy",  # en-GB
    3081: "d/MM/yyyy",   # en-AU
    4105: "yyyy-MM-dd",  # en-CA
    1049: "dd.MM.yyyy",  # ru-RU (the reference ships ru-RU translations)
    1031: "dd.MM.yyyy",  # de-DE
    2055: "dd.MM.yyyy",  # de-CH
    1036: "dd/MM/yyyy",  # fr-FR
    3084: "yyyy-MM-dd",  # fr-CA
    1053: "yyyy-MM-dd",  # sv-SE
}

# Primary language (low 10 bits of the LCID) -> short-date pattern.
# Public-knowledge Windows/CLDR short-date conventions.
PRIMARY_LANG_DATE_PATTERNS: dict[int, str] = {
    0x09: "dd/MM/yyyy",  # English (non-US variants)
    0x19: "dd.MM.yyyy",  # Russian
    0x07: "dd.MM.yyyy",  # German
    0x0C: "dd/MM/yyyy",  # French
    0x0A: "dd/MM/yyyy",  # Spanish
    0x10: "dd/MM/yyyy",  # Italian
    0x16: "dd/MM/yyyy",  # Portuguese
    0x13: "dd-MM-yyyy",  # Dutch
    0x15: "dd.MM.yyyy",  # Polish
    0x05: "dd.MM.yyyy",  # Czech
    0x0E: "yyyy. MM. dd.",  # Hungarian
    0x06: "dd-MM-yyyy",  # Danish
    0x14: "dd.MM.yyyy",  # Norwegian
    0x0B: "d.M.yyyy",    # Finnish
    0x1D: "yyyy-MM-dd",  # Swedish
    0x11: "yyyy/MM/dd",  # Japanese
    0x04: "yyyy/M/d",    # Chinese
    0x12: "yyyy-MM-dd",  # Korean
    0x1F: "d.MM.yyyy",   # Turkish
    0x08: "d/M/yyyy",    # Greek
    0x01: "dd/MM/yyyy",  # Arabic
    0x0D: "dd/MM/yyyy",  # Hebrew
    0x39: "dd-MM-yyyy",  # Hindi
    0x2A: "dd/MM/yyyy",  # Vietnamese
    0x1E: "d/M/yyyy",    # Thai
    0x22: "dd.MM.yyyy",  # Ukrainian
}


def locale_date_pattern(language_id: int) -> str:
    """Short-date pattern for a Windows Language ID: exact LCID override,
    else primary-language fallback, else ISO-8601."""
    if language_id in LOCALE_DATE_PATTERNS:
        return LOCALE_DATE_PATTERNS[language_id]
    return PRIMARY_LANG_DATE_PATTERNS.get(language_id & 0x3FF, "yyyy-MM-dd")


def localized_date(col: Column, language_id: int) -> Column:
    """Render a date/timestamp column in the package language's date shape;
    unknown Language IDs fall back to ISO-8601 (the XML-mode rendering)."""
    from pyspark.sql import functions as F

    return F.date_format(col, locale_date_pattern(language_id))


# F8: datetime -> filename stamp (Codeunit 60001:190-192)
def filename_stamp(dt: _dt.datetime | None = None) -> str:
    dt = dt or _dt.datetime.now()
    return dt.strftime("%d_%m_%y_%H_%M_%S")


# DateFormula (§1.2): NAV relative-date intervals like '<1M+CM>' — no Spark
# equivalent; a small exact parser/evaluator.
# two token shapes: count-before-unit (<3W>, <-1M>, <CM>) and NAV's
# canonical weekday digit-AFTER form (<WD4> = the coming Thursday)
_DF_TOKEN = re.compile(r"([+-]?)(\d*)(C?)(D|WD|W|M|Q|Y)", re.IGNORECASE)
_DF_WD_TOKEN = re.compile(r"([+-]?)WD(\d)", re.IGNORECASE)


def eval_dateformula(formula: str, base: _dt.date) -> _dt.date:
    """Evaluate a NAV DateFormula against a base date.

    Supported units: D(ay), W(eek), M(onth), Q(uarter), Y(ear), WD(weekday),
    C prefix = 'current' (snap to period end, e.g. CM = end of month).
    Examples: '<1M>' +1 month; '<CM>' end of current month; '<-1W>' -7 days;
    '<1M+CM>' end of next month.
    """
    s = formula.strip().strip("<>").replace(" ", "")
    if not s:
        return base
    d = base
    pos = 0
    while pos < len(s):
        wd = _DF_WD_TOKEN.match(s, pos)
        if wd:
            m, (sign, num, cur, unit) = wd, (wd.group(1), wd.group(2), "", "WD")
        else:
            m = _DF_TOKEN.match(s, pos)
            if not m:
                raise ValueError(f"bad DateFormula {formula!r} at {s[pos:]!r}")
            sign, num, cur, unit = m.groups()
        unit = unit.upper()
        n = int(num) if num else (0 if cur else 1)
        if sign == "-":
            n = -n
        if cur:  # snap to current-period boundary
            if unit == "D":
                pass
            elif unit == "W":
                d = d + _dt.timedelta(days=6 - d.weekday())
            elif unit == "M":
                d = _month_end(d)
            elif unit == "Q":
                qm = ((d.month - 1) // 3) * 3 + 3
                d = _month_end(d.replace(month=qm, day=1))
            elif unit == "Y":
                d = d.replace(month=12, day=31)
        elif unit == "D":
            d = d + _dt.timedelta(days=n)
        elif unit == "WD":
            # next weekday n (1=Mon..7=Sun)
            target = (abs(n) - 1) % 7
            delta = (target - d.weekday()) % 7 or 7
            d = d + _dt.timedelta(days=delta if n > 0 else delta - 7)
        elif unit == "W":
            d = d + _dt.timedelta(weeks=n)
        elif unit == "M":
            d = _add_months(d, n)
        elif unit == "Q":
            d = _add_months(d, 3 * n)
        elif unit == "Y":
            d = _add_months(d, 12 * n)
        pos = m.end()
    return d


def _add_months(d: _dt.date, n: int) -> _dt.date:
    month_index = d.month - 1 + n
    year = d.year + month_index // 12
    month = month_index % 12 + 1
    last = _month_end(_dt.date(year, month, 1)).day
    return _dt.date(year, month, min(d.day, last))


def _month_end(d: _dt.date) -> _dt.date:
    if d.month == 12:
        return _dt.date(d.year, 12, 31)
    return _dt.date(d.year, d.month + 1, 1) - _dt.timedelta(days=1)


def dateformula_expr(formula: str, base: Column) -> Column:
    """Compile a NAV DateFormula to a Spark Column expression (JVM-side,
    no UDF): the formula is package CONFIG (a literal, known driver-side),
    so each token becomes a native date function — ``add_months`` /
    ``date_add`` / ``last_day`` / ``trunc`` — and the whole evaluation
    stays inside whole-stage codegen.  ``eval_dateformula`` above is the
    reference evaluator; a property test pins the two to each other.

    ``base`` must be a DATE column (use ``F.to_date`` first).
    """
    s = formula.strip().strip("<>").replace(" ", "")
    d = base
    pos = 0
    while pos < len(s):
        wd = _DF_WD_TOKEN.match(s, pos)
        if wd:
            m, (sign, num, cur, unit) = wd, (wd.group(1), wd.group(2), "", "WD")
        else:
            m = _DF_TOKEN.match(s, pos)
            if not m:
                raise ValueError(f"bad DateFormula {formula!r} at {s[pos:]!r}")
            sign, num, cur, unit = m.groups()
        unit = unit.upper()
        n = int(num) if num else (0 if cur else 1)
        if sign == "-":
            n = -n
        if cur:  # snap to current-period end
            if unit == "D":
                pass
            elif unit == "W":
                d = F.date_add(d, F.lit(6) - F.weekday(d))  # -> Sunday
            elif unit == "M":
                d = F.last_day(d)
            elif unit == "Q":
                d = F.date_sub(F.add_months(F.trunc(d, "quarter"), 3), 1)
            elif unit == "Y":
                d = F.date_sub(F.add_months(F.trunc(d, "year"), 12), 1)
        elif unit == "D":
            d = F.date_add(d, n)
        elif unit == "WD":
            target = (abs(n) - 1) % 7
            delta = F.pmod(F.lit(target) - F.weekday(d), F.lit(7))
            delta = F.when(delta == 0, F.lit(7)).otherwise(delta)
            d = F.date_add(d, delta if n > 0 else delta - 7)
        elif unit == "W":
            d = F.date_add(d, 7 * n)
        elif unit == "M":
            d = F.add_months(d, n)
        elif unit == "Q":
            d = F.add_months(d, 3 * n)
        elif unit == "Y":
            d = F.add_months(d, 12 * n)
        pos = m.end()
    return d
