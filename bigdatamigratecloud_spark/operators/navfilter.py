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
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit_predicate(col: Column, tok: str) -> Column:
    tok = tok.strip()
    ci = tok.startswith("@")
    if ci:
        tok = tok[1:]
    if tok.startswith("''") and tok.endswith("''") and len(tok) >= 4:
        tok = tok[2:-2]
    elif tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        tok = tok[1:-1]
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
    if ".." in atom:
        lo, _, hi = atom.partition("..")
        lo, hi = lo.strip(), hi.strip()
        if lo and hi:
            return (col >= lo) & (col <= hi)
        if lo:
            return col >= lo
        return col <= hi
    for op in ("<>", "<=", ">=", "<", ">", "="):
        if atom.startswith(op):
            v = atom[len(op):].strip().strip("'")
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
    ``BUILDING|AUTOMOBILE``, ``<>0&<100``, ``@a*``) against a column."""
    if isinstance(col, str):
        col = F.col(col)
    or_terms = []
    for term in expression.split("|"):
        and_atoms = [a for a in term.split("&") if a.strip() != ""] or [term]
        pred = _atom_predicate(col, and_atoms[0])
        for a in and_atoms[1:]:
            pred = pred & _atom_predicate(col, a)
        or_terms.append(pred)
    out = or_terms[0]
    for p in or_terms[1:]:
        out = out | p
    return out
