"""NAV-style filter expression parser -> Spark Column.

The reference applies per-field package filters as `FieldRef.SETFILTER`
before the scan (ApplyPackageFilter, Codeunit 60000:141-156), which the
NAV platform translates to a SQL WHERE — i.e. true predicate pushdown.
Here the same filter grammar compiles to a Catalyst expression, which
Catalyst pushes into the parquet scan (verify with
`.explain()` -> PushedFilters).

Grammar (the practically-used NAV subset):
    expr    := term ('|' term)*          -- OR
    term    := atom ('&' atom)*          -- AND
    atom    := range | relop | literal
    range   := lit '..' lit | lit '..' | '..' lit
    relop   := ('<>' | '<=' | '>=' | '<' | '>' | '=') lit
    literal := bare token (equality); '*' wildcard -> LIKE; '@' -> case-insensitive

Quoting: single-quoted literals protect the structural characters
(``'R&D'``, ``'A|B'``, ``'1..2'`` are VALUES, not operators), matching
NAV's quoting rule — the tokenizer splits on | & .. only OUTSIDE quotes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _split_outside_quotes(s: str, sep: str) -> list[str]:
    """Split on a single-char separator, ignoring separators inside
    single-quoted segments (quotes toggle; NAV escapes a literal quote by
    doubling it, which toggles twice and stays balanced)."""
    parts, buf, inq = [], [], False
    for ch in s:
        if ch == "'":
            inq = not inq
            buf.append(ch)
        elif not inq and ch == sep:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _find_range_sep(s: str) -> int:
    """Index of the first '..' outside quotes, or -1."""
    inq = False
    for i, ch in enumerate(s):
        if ch == "'":
            inq = not inq
        elif not inq and s.startswith("..", i):
            return i
    return -1


def _unquote(tok: str) -> str:
    tok = tok.strip()
    if tok.startswith("''") and tok.endswith("''") and len(tok) >= 4:
        return tok[2:-2]
    if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        return tok[1:-1]
    return tok


def _lit_predicate(col: Column, tok: str) -> Column:
    tok = tok.strip()
    ci = tok.startswith("@")
    if ci:
        tok = tok[1:]
    tok = _unquote(tok)
    target = F.lower(col) if ci else col
    if ci:
        tok = tok.lower()
    if "*" in tok or "?" in tok:
        pat = tok.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")
        return target.like(pat)
    return target == tok


def _atom_predicate(col: Column, atom: str) -> Column:
    atom = atom.strip()
    if atom == "''" or atom == "":
        return col.isNull() | (col.cast("string") == "")
    sep = _find_range_sep(atom)
    if sep != -1:
        lo, hi = _unquote(atom[:sep]), _unquote(atom[sep + 2 :])
        if lo and hi:
            return (col >= lo) & (col <= hi)
        if lo:
            return col >= lo
        return col <= hi
    for op in ("<>", "<=", ">=", "<", ">", "="):
        if atom.startswith(op):
            v = _unquote(atom[len(op):])
            if op == "<>":
                return col != v
            if op == "<=":
                return col <= v
            if op == ">=":
                return col >= v
            if op == "<":
                return col < v
            if op == ">":
                return col > v
            return col == v
    return _lit_predicate(col, atom)


def nav_filter(col: Column | str, expression: str) -> Column:
    """Compile a NAV filter expression (e.g. ``1000..2000``,
    ``BUILDING|AUTOMOBILE``, ``<>0&<100``, ``@a*``, ``'R&D'``) against a
    column."""
    if isinstance(col, str):
        col = F.col(col)
    or_terms = []
    for term in _split_outside_quotes(expression, "|"):
        and_atoms = [a for a in _split_outside_quotes(term, "&") if a.strip() != ""] or [term]
        pred = _atom_predicate(col, and_atoms[0])
        for a in and_atoms[1:]:
            pred = pred & _atom_predicate(col, a)
        or_terms.append(pred)
    out = or_terms[0]
    for p in or_terms[1:]:
        out = out | p
    return out
