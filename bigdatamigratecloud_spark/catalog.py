"""Table catalog: the Spark-side equivalent of the reference's reflective
table access + field metadata catalog.

The reference opens any table by integer ID via RecordRef
(Codeunit 60000:193 `RecRef.OPEN(ConfigPackageTable."Table ID")`) and reads
per-field metadata from the `Field` virtual table 2000000041
(Codeunit 60000:676-699).  Here, a table is a named parquet file under a
scale-factor directory, and the metadata catalog is derived from the
DataFrame schema (`fields_catalog`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The ten driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Primary keys per table (FIXTURES.md §A) — drives dedup/upsert/FK ops.
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# FK graph: child table -> [(child_col, parent_table, parent_col)].
# Mirrors the reference's Parent Table ID / table-relation metadata
# (Codeunit 60000:88-92, 690-692) for dependency ordering and
# create-missing-codes.
FOREIGN_KEYS: dict[str, list[tuple[str, str, str]]] = {
    "nation": [("n_regionkey", "region", "r_regionkey")],
    "customer": [("c_nationkey", "nation", "n_nationkey")],
    "supplier": [("s_nationkey", "nation", "n_nationkey")],
    "orders": [("o_custkey", "customer", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _scan_parallelism_deficit(path: str) -> bool:
    """True when the parquet layout cannot parallelize: a SINGLE file with
    very few row groups (Spark's split unit).  Cheap driver-side footer
    check, cached per path.  At real scale data arrives as many files /
    many row groups and this never fires — it exists because a 10 MB
    single-row-group file would otherwise pin a whole query to one task."""
    if path in _PARALLELISM_CACHE:
        return _PARALLELISM_CACHE[path]
    deficit = False
    try:
        if os.path.isfile(path) and 5_000_000 < os.path.getsize(path) < 512_000_000:
            import pyarrow.parquet as pq

            deficit = pq.ParquetFile(path).metadata.num_row_groups < 4
    except Exception:
        deficit = False
    _PARALLELISM_CACHE[path] = deficit
    return deficit


_PARALLELISM_CACHE: dict[str, bool] = {}


def _ensure_utc_session(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (runtime-settable).  The fixtures'
    timestamps are parquet `timestamp[us]` with isAdjustedToUTC=false —
    Spark 4 reads them as TIMESTAMP_NTZ.  We keep them NTZ end-to-end
    (naive wall values render identically to the DuckDB oracle's naive
    TIMESTAMP with zero timezone dependence), but any site that needs
    epoch arithmetic casts NTZ -> TIMESTAMP, and THAT cast interprets the
    wall clock in the session timezone.  Pinning UTC makes the cast
    instant-preserving, so `unix_micros(ts.cast('timestamp'))` equals
    DuckDB's `epoch_us(ts)` everywhere, even on a host with a non-UTC
    default timezone."""
    try:
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        # conf locked down (never happens on OSS Spark — this conf is
        # runtime-settable).  If it ever does AND the locked zone observes
        # DST, epoch differences spanning a transition would be off by the
        # DST shift; fixed-offset zones remain difference-preserving.
        pass


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """events.parquet carries INT64 TIMESTAMP(NANOS); without this legacy
    flag Spark raises PARQUET_TYPE_ILLEGAL at scan time.  The flag is
    runtime-settable, so set it here rather than relying on the session
    builder — callers (e.g. the correctness driver) hand us plain
    sessions built without our `session.py`."""
    try:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down (never on OSS Spark); scan will raise clearly


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize_small: bool = True
) -> DataFrame:
    # serve from the session's registered view when one exists for this
    # exact sf_dir (the local analogue of a metastore table): DataFrame-API
    # queries then share whatever caching the session has applied instead
    # of re-planning a cold parquet scan per call
    tag = spark.conf.get("spark.bdmc.registered_sf_dir", "")
    if tag == sf_dir and name in spark.conf.get("spark.bdmc.registered_tables", "").split(","):
        return spark.table(name)
    path = table_path(sf_dir, name)
    _ensure_nanos_readable(spark)
    _ensure_utc_session(spark)
    df = spark.read.parquet(path)
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as long nanoseconds.
    # Convert to a microsecond timestamp (floor), matching how DuckDB
    # truncates nanos to its µs TIMESTAMP — keeps oracle comparisons exact.
    # Must be integer division (`div`): `col / 1000` is DOUBLE division,
    # and epoch nanos (~1.7e18) exceed double's 53-bit mantissa, which
    # silently lands ±1 µs off after the cast.
    for f in df.schema.fields:
        if name == "events" and f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if parallelize_small and _scan_parallelism_deficit(path):
        # one mid-size file, ~one row group: pay one small shuffle to
        # unlock N-way aggregation/join parallelism (filters still push
        # through the repartition to the scan).  Never fires on real
        # multi-file/multi-row-group datasets.  Match the executor count
        # so downstream aggs use every core (8 partitions left 3/4 of a
        # 32-core box idle on the cached-scan bench path).
        df = df.repartition(min(32, int(spark.sparkContext.defaultParallelism)))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register the given tables as temp views so SQL entry points work.

    Idempotent per (session, sf_dir, table): repeated calls skip the
    parquet footer re-reads (every shared-SQL query calls this), and a
    different sf_dir invalidates everything previously registered."""
    tag = spark.conf.get("spark.bdmc.registered_sf_dir", "")
    done = set(spark.conf.get("spark.bdmc.registered_tables", "").split(",")) if tag == sf_dir else set()
    todo = [t for t in tables if t not in done]
    if not todo:
        return
    for name in todo:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.conf.set("spark.bdmc.registered_sf_dir", sf_dir)
    spark.conf.set("spark.bdmc.registered_tables", ",".join(sorted(done | set(todo))))


@dataclass(frozen=True)
class FieldInfo:
    """One row of the fields catalog (≈ virtual table 2000000041 'Field':
    number, name, type, length, ObsoleteState — Codeunit 60000:676-699)."""

    table_name: str
    field_id: int  # 1-based position, ≈ NAV field number
    field_name: str
    data_type: str  # Spark simpleString, e.g. 'bigint', 'string'
    nullable: bool
    is_primary_key: bool
    obsolete: bool = False  # hook for ExcludeRemovedFields (XML:800-814)


def fields_catalog(df: DataFrame, table_name: str) -> list[FieldInfo]:
    pks = set(PRIMARY_KEYS.get(table_name, ()))
    return [
        FieldInfo(
            table_name=table_name,
            field_id=i + 1,
            field_name=f.name,
            data_type=f.dataType.simpleString(),
            nullable=f.nullable,
            is_primary_key=f.name in pks,
        )
        for i, f in enumerate(df.schema.fields)
    ]


def fields_catalog_df(spark: SparkSession, df: DataFrame, table_name: str) -> DataFrame:
    """Catalog as a DataFrame, so metadata joins (J3 in SURVEY §2.3) are
    expressible as broadcast joins rather than driver loops."""
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType(), False),
            T.StructField("field_id", T.IntegerType(), False),
            T.StructField("field_name", T.StringType(), False),
            T.StructField("data_type", T.StringType(), False),
            T.StructField("nullable", T.BooleanType(), False),
            T.StructField("is_primary_key", T.BooleanType(), False),
            T.StructField("obsolete", T.BooleanType(), False),
        ]
    )
    rows = [
        (f.table_name, f.field_id, f.field_name, f.data_type, f.nullable, f.is_primary_key, f.obsolete)
        for f in fields_catalog(df, table_name)
    ]
    return spark.createDataFrame(rows, schema)
