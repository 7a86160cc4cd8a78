"""Driver-mimicking oracle harness: run every ``queries()`` entry from
``__spark_entry__`` and compare against its ``oracle_sql()`` on DuckDB —
row count, sorted column names, and per-cell values (columns sorted by
name, rows sorted by all columns; decimals/floats compared exactly, with
a tiny tolerance fallback reported separately).

Usage:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v):
    if isinstance(v, Decimal):
        return ("num", float(v), str(v.normalize()))
    if isinstance(v, float):
        return ("num", v, repr(v))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    return (type(v).__name__, str(v))


def _sortkey(row):
    return tuple(str(c) for c in row)


def compare(spark_rows, duck_rows, spark_cols, duck_cols):
    """Return (ok, msg). Mirrors the driver: count, schema names, values."""
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted([tuple(r[i] for i in order) for r in spark_rows], key=_sortkey)
    d = sorted([tuple(r[i] for i in dorder) for r in duck_rows], key=_sortkey)
    n_approx = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if sv is None and dv is None:
                continue
            if isinstance(sv, (int, float, Decimal)) and isinstance(dv, (int, float, Decimal)):
                fs, fd = float(sv), float(dv)
                if fs == fd:
                    continue
                if math.isclose(fs, fd, rel_tol=1e-9, abs_tol=1e-9):
                    n_approx += 1
                    continue
                return False, (
                    f"value mismatch row {i} col {sorted(spark_cols)[j]}: "
                    f"spark={sv!r} duck={dv!r}"
                )
            if str(sv) != str(dv):
                return False, (
                    f"value mismatch row {i} col {sorted(spark_cols)[j]}: "
                    f"spark={sv!r} duck={dv!r}"
                )
    msg = "exact" if n_approx == 0 else f"APPROX ({n_approx} cells within 1e-9 only)"
    return True, msg


def main():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from bigdatamigratecloud_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark("oracle-harness", cpus=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle; rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok, msg = compare(spark_rows, duck_rows, spark_cols, duck_cols)
        status = "ok  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name}: {len(spark_rows)} rows — {msg}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
