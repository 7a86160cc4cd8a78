"""DecimalRenderPolicy gate (round-3 verdict item 2/5): no registered query
may EMIT a DECIMAL or HUGEINT column.

Exact decimal aggregation is the right internal representation (order-
independent, overflow-safe), but the driver's canonicalizer renders Spark
DECIMAL(28,6) and DuckDB DECIMAL(38,6)/HUGEINT differently, so every final
projection must cast sums to DOUBLE (or BIGINT for integer sums) on BOTH
sides.  Three rounds of hash-red rows came from exactly this; the gate
makes a regression impossible even if the driver rotates its query sample.

Two layers:
- DuckDB `DESCRIBE` of every oracle (binding only, no execution) — covers
  the oracle side of every oracle-checked entry cheaply.
- Spark output schema for every query whose construction is lazy (no
  side-effectful write/collect inside the builder) — covers the Spark
  side.  The side-effectful entries (package/Excel/media roundtrips,
  streams, bucketed/partitioned rewrites) are excluded here but their
  oracle side is still gated above, and shared-SQL entries use the same
  text on both engines anyway.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

# Builders that eagerly execute work (write temp data, run a stream, or
# collect) — too heavy for a schema-only gate.  Their ORACLE types are
# still checked below.
_EAGER = {
    "s3_s2_package_roundtrip",
    "s2b_sharded_roundtrip",
    "s5_s6_excel_roundtrip",
    "s7_s8_media_roundtrip",
    "s9_jsonl_roundtrip",
    "s10_orc_roundtrip",
    "s11_csv_roundtrip",
    "p5_p6_p7_selection_export",
    "x1_x5_pipeline_apply",
    "e2_partition_pruned_scan",
    "b1_bucketed_join_revenue",
    "stream_hourly_rollup",
    "stream_sessionize",
    "stream_interval_join",
    "stream_dedup_events",
    "stream_upsert_apply",
}


def test_no_oracle_emits_decimal_or_hugeint(sf_dir):
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (c[0], c[1])
            for c in cols
            if "DECIMAL" in c[1].upper() or "HUGEINT" in c[1].upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracle output must be DOUBLE/BIGINT at the edge: {offenders}"


def test_no_lazy_spark_query_emits_decimal(spark, sf_dir):
    offenders = {}
    for name, fn in entry.queries().items():
        if name in _EAGER:
            continue
        df = fn(spark, sf_dir)  # lazy: analysis only
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if "decimal" in f.dataType.simpleString()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"Spark output must be DOUBLE/BIGINT at the edge: {offenders}"


def test_eager_list_is_current():
    """Every name in _EAGER must still be a registered query (catch typos
    and renames that would silently skip the gate)."""
    qs = set(entry.queries())
    missing = _EAGER - qs
    assert not missing, f"_EAGER entries not registered: {missing}"
