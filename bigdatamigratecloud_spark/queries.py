"""Oracle-checkable query suite: one entry per implemented operator from
SURVEY.md §2 (+ north-star ops), each paired with ANSI SQL that DuckDB can
run over the same parquet tables.

Two registries:
- ``QUERIES``: name -> (spark, sf_dir) -> DataFrame  (the Spark impl)
- ``ORACLES``: name -> SQL string                    (the DuckDB oracle)

Queries whose semantics are pure ANSI SQL are declared ONCE in
``SHARED_SQL`` and executed verbatim by both engines — the Spark side goes
through ``spark.sql`` so Catalyst plans it (idiomatic: declare the logical
plan, let the optimizer pick the physical strategy).  Operator-shaped
queries (melt/pivot/dedup/anti-join/NAV filters) use the DataFrame API and
get a hand-written oracle.

Numeric policy for cross-engine equality: aggregates are computed over
per-row DOUBLE arithmetic (IEEE-exact and identical in both engines), cast
to DECIMAL(18,6) *before* summing so the sums are exact and order-
independent.  Averages are expressed as decimal sum / count.

Precision 18 (not 38) is deliberate: Spark stores precision<=18 decimals
as a compact unscaled Long (no Int128 path), measured ~30% faster on the
scan-agg headline; every per-row value here is <=12 integer digits, and
the SUM result type auto-widens to 28 digits, so overflow is impossible
even at 10^12-row scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import FOREIGN_KEYS, PRIMARY_KEYS as PRIMARY_KEYS_LOCAL, TABLES, load_table, register_views
from .operators.navfilter import nav_filter
from .operators.staging import melt_to_staging, pivot_from_staging
from .operators.upsert import fk_violations
from .functions.scalars import suppress_zero_fk

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
SHARED_SQL: dict[str, str] = {}


def _detach(df: DataFrame) -> DataFrame:
    """Materialize a registry wrapper's result so the returned frame
    cannot dangle on a temp dir the wrapper is about to delete.

    HARNESS ARTIFACT, bounded by fixture size: registry entries that
    roundtrip through the filesystem (WARC, ACID tables, IVF indexes)
    build their state under ``tempfile.mkdtemp`` and must clean it up
    before returning, but the driver collects the returned frame AFTER
    the callable exits.  The underlying operators are fully
    distributed — a production pipeline keeps the table/index alive
    and would persist-then-cleanup instead of collecting."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def shared_sql(name: str, sql: str) -> None:
    """Register a query whose Spark impl and DuckDB oracle are the same
    SQL text (ANSI subset both engines parse identically).

    Only the tables the SQL actually references are registered as views —
    a query that never touches a table must not pay (or fail on) its
    scan setup (round-1 lesson: one unreadable table took down every
    shared-SQL query through the eager 10-table registration)."""
    SHARED_SQL[name] = sql
    ORACLES[name] = sql
    import re as _re

    words = set(_re.findall(r"[a-z_]+", sql.lower()))
    referenced = tuple(t for t in TABLES if t in words) or TABLES

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, referenced)
        return spark.sql(sql)

    QUERIES[name] = fn


# ---------------------------------------------------------------------------
# §2.1/2.2 — scans, projection, predicate pushdown
# ---------------------------------------------------------------------------

@query(
    "s1_scan_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_quantity < 10""",
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1+P2: projection + predicates reach the parquet scan
    (ref: CreateRecordNodes XML:158-251, ApplyPackageFilter XML:141-156)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_quantity") < 10)
        ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "p2_nav_filter",
    """SELECT c_custkey, c_mktsegment, c_acctbal
       FROM customer
       WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
         AND c_custkey BETWEEN 100 AND 900""",
)
def p2_nav_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: NAV SETFILTER grammar compiled to Catalyst predicates
    (ref: XML:141-156)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        nav_filter("c_mktsegment", "BUILDING|AUTOMOBILE") & nav_filter("c_custkey", "100..900")
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "p4_zero_fk_suppression",
    """SELECT o_orderkey,
              CASE WHEN o_custkey = 0 THEN NULL ELSE o_custkey END AS o_custkey_fk
       FROM orders WHERE o_orderkey <= 1000""",
)
def p4_zero_fk_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: FK-typed zero exported as empty (ref: XML:831-834)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select("o_orderkey", suppress_zero_fk(F.col("o_custkey")).alias("o_custkey_fk"))


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------

@query(
    "j1_dim_lookup",
    """SELECT c.c_custkey, n.n_name AS nation_name, r.r_name AS region_name
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey""",
)
def j1_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: dimension lookup flattened to columns via broadcast joins
    (ref: GetDimValueFromTable XML:894-922) — dims are tiny, so broadcast
    avoids shuffling the fact side at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "j4_anti_customers_without_orders",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def j4_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: existence anti-join (ref: missing-table error path XML:543-547,
    1095-1100, generalized to data rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j5_fk_violation_counts",
    """SELECT 'nation.n_regionkey' AS relation,
              (SELECT count(*) FROM nation x WHERE NOT EXISTS
                 (SELECT 1 FROM region p WHERE p.r_regionkey = x.n_regionkey)) AS violations
       UNION ALL
       SELECT 'customer.c_nationkey',
              (SELECT count(*) FROM customer x WHERE NOT EXISTS
                 (SELECT 1 FROM nation p WHERE p.n_nationkey = x.c_nationkey))
       UNION ALL
       SELECT 'supplier.s_nationkey',
              (SELECT count(*) FROM supplier x WHERE NOT EXISTS
                 (SELECT 1 FROM nation p WHERE p.n_nationkey = x.s_nationkey))
       UNION ALL
       SELECT 'orders.o_custkey',
              (SELECT count(*) FROM orders x WHERE NOT EXISTS
                 (SELECT 1 FROM customer p WHERE p.c_custkey = x.o_custkey))
       UNION ALL
       SELECT 'lineitem.l_orderkey',
              (SELECT count(*) FROM lineitem x WHERE NOT EXISTS
                 (SELECT 1 FROM orders p WHERE p.o_orderkey = x.l_orderkey))
       UNION ALL
       SELECT 'lineitem.l_partkey',
              (SELECT count(*) FROM lineitem x WHERE NOT EXISTS
                 (SELECT 1 FROM part p WHERE p.p_partkey = x.l_partkey))
       UNION ALL
       SELECT 'lineitem.l_suppkey',
              (SELECT count(*) FROM lineitem x WHERE NOT EXISTS
                 (SELECT 1 FROM supplier p WHERE p.s_suppkey = x.l_suppkey))""",
)
def j5_fk_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: FK integrity sweep over the whole catalog FK graph (ref:
    TableRelation validation XML:17, 112-113, 690-692).  Fused per child
    table: ONE scan of each child probes every broadcast parent key set
    (see fk_violation_counts_fused) — lineitem's 3 FKs cost 1 scan, not 3.

    Latency note (sf0.1 bench): steady-state is ~0.6 s fresh-build /
    ~0.33 s with the plan reused; roughly 0.3 s of every fresh call is
    Catalyst analysis of the 8-join union tree — a constant independent
    of data volume (execution is 0.24 s), so it vanishes at real scale.
    Best-of-7 evidence in the round-4 log; not a shuffle problem."""
    from .operators.upsert import fk_violation_counts_graph

    # one DataFrame object per table: fk_violation_counts_graph dedups
    # parent key sets by object identity, so nation's key set is
    # projected/deduped/broadcast once for its two referencing children
    tables: dict[str, DataFrame] = {}

    def tbl(name: str) -> DataFrame:
        if name not in tables:
            tables[name] = load_table(spark, sf_dir, name)
        return tables[name]

    children = [
        (
            child_name,
            tbl(child_name),
            [
                (child_col, tbl(parent_name), parent_col)
                for child_col, parent_name, parent_col in fks
            ],
        )
        for child_name, fks in FOREIGN_KEYS.items()
    ]
    return fk_violation_counts_graph(children)


# ---------------------------------------------------------------------------
# §2.4 — counts, melt, pivot, dedup
# ---------------------------------------------------------------------------

@query(
    "a2_record_counts",
    """SELECT 'region' AS table_name, count(*) AS n FROM region
       UNION ALL SELECT 'nation', count(*) FROM nation
       UNION ALL SELECT 'customer', count(*) FROM customer
       UNION ALL SELECT 'supplier', count(*) FROM supplier
       UNION ALL SELECT 'part', count(*) FROM part
       UNION ALL SELECT 'orders', count(*) FROM orders
       UNION ALL SELECT 'lineitem', count(*) FROM lineitem
       UNION ALL SELECT 'events', count(*) FROM events
       UNION ALL SELECT 'documents', count(*) FROM documents
       UNION ALL SELECT 'embeddings', count(*) FROM embeddings""",
)
def a2_record_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: per-table record counts, the package manifest numbers
    (ref: No. of Records flowfields XML:441-444, 726-728)."""
    out = None
    for t in TABLES:
        c = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("table_name"), "n")
        )
        out = c if out is None else out.unionByName(c)
    return out


_MELT_SERIALIZE_SQL = {
    "c_custkey": "CAST(c_custkey AS VARCHAR)",
    "c_name": "c_name",
    "c_nationkey": "CAST(c_nationkey AS VARCHAR)",
    "c_acctbal": "CAST(CAST(c_acctbal AS DECIMAL(28,6)) AS VARCHAR)",
    "c_mktsegment": "c_mktsegment",
}

@query(
    "a4_melt_customer",
    "\nUNION ALL ".join(
        f"SELECT c_custkey AS record_key, '{f}' AS field_name, {expr} AS value FROM customer"
        for f, expr in _MELT_SERIALIZE_SQL.items()
    ),
)
def a4_melt_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: wide->long EAV melt, the staging model
    (ref: FillPackageDataFromXML XML:706-798, EAV insert XML:763-772)."""
    c = load_table(spark, sf_dir, "customer")
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey")
    return staged.select(
        F.col("record_no").alias("record_key"), "field_name", "value"
    )


@query("a5_pivot_roundtrip_orders", "SELECT * FROM orders")
def a5_pivot_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5 composed: melt orders into EAV staging then pivot back — must
    be a fixed point (ref: staging XML:763-772, apply XML:527).  The pivot
    is conditional aggregation, never DataFrame.pivot() (SURVEY §4);
    `colocate` pre-partitions the wide rows by record id so the pivot
    groupBy runs exchange-free (2.2× on the sf0.1 roundtrip)."""
    o = load_table(spark, sf_dir, "orders")
    staged = melt_to_staging(o, "orders", key_cols=("o_orderkey",), colocate=True)
    return pivot_from_staging(staged, o.schema)


shared_sql(
    "a6_row_number_orders",
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders) t
       WHERE rn <= 3""",
)

shared_sql(
    "a7_dedup_pk_lineitem",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM (
         SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                   ORDER BY l_partkey, l_suppkey, l_quantity,
                                            l_extendedprice, l_shipdate) AS rn
         FROM lineitem) t
       WHERE rn = 1""",
)

shared_sql(
    "n1_dedup_exact_lineitem",
    "SELECT DISTINCT * FROM lineitem",
)

shared_sql(
    "b2_basket_cosine",
    # Market-basket item affinity (round 9): cosine similarity of
    # part co-purchase counts — cij / (sqrt(ci)*sqrt(cj)), the classic
    # "bought together" signal.  Pairs come from a per-order self-join
    # (order baskets are <= 7 items, so the pair fan-out is a small
    # constant per order — never item x item); IEEE sqrt is correctly
    # rounded, so the shared SQL is bit-identical in both engines.
    """WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
              FROM lineitem),
       cnt AS (SELECT p, count(*) AS c FROM pp GROUP BY p),
       co AS (SELECT a.p AS p_a, b.p AS p_b, count(*) AS cij
              FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p
              HAVING count(*) >= 2)
       SELECT p_a, p_b, CAST(cij AS BIGINT) AS cij,
              CAST(cij AS DOUBLE)
                  / (sqrt(CAST(ca.c AS DOUBLE)) * sqrt(CAST(cb.c AS DOUBLE)))
                  AS cosine
       FROM co
       JOIN cnt ca ON ca.p = co.p_a
       JOIN cnt cb ON cb.p = co.p_b
       ORDER BY cosine DESC, p_a, p_b
       LIMIT 50""",
)

shared_sql(
    "o3_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 10""",
)


# ---------------------------------------------------------------------------
# Analytics (engine capabilities per SURVEY §2.4/§2.6 'free in Spark';
# these are also the bench headline queries)
# ---------------------------------------------------------------------------

shared_sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)

shared_sql(
    "q3_shipping_priority",
    """SELECT l_orderkey,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
              o_orderdate, o_orderpriority
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING'
         AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10""",
)

shared_sql(
    "q5_regional_revenue",
    """SELECT n_name,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey
         AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey
         AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name""",
)

shared_sql(
    "q6_revenue_forecast",
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)

shared_sql(
    "events_hourly_rollup",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY date_trunc('hour', ts), event_type""",
)


# §2.5 time-RANGE window frames (beyond the row-offset windows of
# w1/w4): per-user rolling 1-hour stats where the frame is defined by
# the ORDER-BY value, not a row count — the trailing-window feature
# aggregation shape (fraud scoring, rate limiting, session features).
# RANGE frames are tie-inclusive, so the result is deterministic under
# any within-tie ordering, and the DECIMAL-inside/DOUBLE-outside cast
# keeps both engines' sums bit-identical.  Scale: one hash exchange on
# user_id; the frame is evaluated with a sliding aggregate state, never
# by re-scanning the window per row.
shared_sql(
    "w9_rolling_interval_stats",
    """SELECT user_id, ts,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_sum_1h,
              CAST(COUNT(*) OVER w AS BIGINT) AS roll_n_1h,
              CAST(MAX(value) OVER w AS DOUBLE) AS roll_max_1h
       FROM events
       WHERE event_id < 20000
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)


@query(
    "events_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
       FROM events GROUP BY 1""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction JVM-side."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    ).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# North-star N1/N2/N4 — dedup, similarity search, text analysis
# (SURVEY §2.12; LLM training-data pipeline operators)
# ---------------------------------------------------------------------------

from .operators import dedup as _dedup  # noqa: E402
from .operators import similarity as _sim  # noqa: E402
from .operators import text as _text  # noqa: E402

_STOP_EN_SQL = "('the','a','of','and','to','in','is','that')"


@query(
    "n4_token_stats",
    f"""WITH t AS (SELECT doc_id, length(text) AS n_chars_measured,
                          string_split(text, ' ') AS sp FROM documents)
       SELECT doc_id,
              len(sp) AS n_tokens,
              len(list_distinct(sp)) AS n_uniq_tokens,
              n_chars_measured,
              CAST(list_sum(list_transform(sp, t -> length(t))) AS DOUBLE)
                   / CAST(len(sp) AS DOUBLE) AS avg_token_len,
              CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL})) AS DOUBLE)
                   / CAST(len(sp) AS DOUBLE) AS stopword_ratio
       FROM t""",
)
def n4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: per-document token statistics (counts, uniqueness, mean token
    length, stopword ratio) — all JVM-side higher-order array functions."""
    return _text.token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "n4_quality_score",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       x AS (SELECT doc_id,
                    CAST(len(sp) AS DOUBLE) AS n,
                    CAST(len(list_distinct(sp)) AS DOUBLE) AS nu,
                    CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL})) AS DOUBLE) AS ns
             FROM t)
       SELECT doc_id,
              (least(n, 100.0)/100.0*4.0 + nu/n*4.0
                    + least(ns/n*5.0, 1.0)*2.0)/10.0 AS quality
       FROM x""",
)
def n4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: composite quality score (length/diversity/stopword terms)."""
    return _text.quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "n4_lang_id",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       h AS (SELECT doc_id,
               len(list_filter(sp, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
               len(list_filter(sp, t -> t IN ('the','a','of','and','to','in','is','that'))) AS en,
               len(list_filter(sp, t -> t IN ('el','la','los','y','es','un','una','en'))) AS es,
               len(list_filter(sp, t -> t IN ('le','la','les','et','est','un','une','dans'))) AS fr,
               len(list_filter(sp, t -> t IN ('的','是','了','在','和','有','我','不'))) AS zh
             FROM t)
       SELECT doc_id,
              CASE WHEN greatest(de,en,es,fr,zh) <= 0 THEN 'und'
                   WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
                   WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
                   WHEN es >= fr AND es >= zh THEN 'es'
                   WHEN fr >= zh THEN 'fr'
                   ELSE 'zh' END AS detected_lang,
              greatest(de,en,es,fr,zh) AS lang_hits
       FROM h""",
)
def n4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: heuristic language ID (function-word hit argmax, deterministic
    tiebreak by language code)."""
    return _text.lang_id(load_table(spark, sf_dir, "documents"))


@query(
    "n4_fingerprint",
    "SELECT doc_id, sha256(text) AS fingerprint FROM documents",
)
def n4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N4: SHA-256 content fingerprint per document."""
    return _text.content_fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "n1_dedup_exact_documents",
    """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
       FROM documents GROUP BY sha256(text)""",
)
def n1_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: exact dedup by content hash — keep smallest id per group."""
    return _dedup.exact_dedup(load_table(spark, sf_dir, "documents"), ["text"], "doc_id")


@query(
    "n1_substring_dedup",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       w0 AS (SELECT doc_id, toks, unnest(range(1, len(toks)-8+2)) AS i
              FROM t WHERE len(toks) >= 8),
       w AS (SELECT doc_id, i,
                    ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')),
                                    1, 15))::BIGINT AS gh
             FROM w0),
       r AS (SELECT doc_id, i,
                    count(*) OVER (PARTITION BY gh) AS cnt,
                    row_number() OVER (PARTITION BY gh
                                       ORDER BY doc_id, i) AS rn
             FROM w),
       marked AS (SELECT doc_id, i AS s, i + 7 AS e
                  FROM r WHERE cnt > 1 AND rn > 1),
       pm AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS pmax
              FROM marked),
       br AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax + 1
                             THEN 1 ELSE 0 END AS brk FROM pm),
       gr AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS grp FROM br),
       spans AS (SELECT doc_id, min(s) AS s, max(e) AS e
                 FROM gr GROUP BY doc_id, grp),
       tok AS (SELECT doc_id, unnest(toks) AS tkn,
                      unnest(range(1, len(toks)+1)) AS p
               FROM t),
       kept AS (SELECT k.* FROM tok k
                WHERE NOT EXISTS (SELECT 1 FROM spans s
                                  WHERE s.doc_id = k.doc_id
                                    AND k.p BETWEEN s.s AND s.e)),
       cleaned AS (SELECT doc_id, string_agg(tkn, ' ' ORDER BY p) AS txt
                   FROM kept GROUP BY doc_id),
       rm AS (SELECT doc_id, sum(e - s + 1) AS rmv FROM spans GROUP BY doc_id)
       SELECT t.doc_id, coalesce(c.txt, '') AS text,
              CAST(len(t.toks) AS BIGINT) AS n_tokens,
              CAST(coalesce(rm.rmv, 0) AS BIGINT) AS n_removed
       FROM t
       LEFT JOIN cleaned c USING (doc_id)
       LEFT JOIN rm USING (doc_id)""",
)
def n1_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 EXACT SUBSTRING dedup (Lee et al. 2022): cut every >=8-token
    span that occurs elsewhere in the corpus, keeping the first
    occurrence by (doc_id, position).  One hash-keyed shuffle marks
    duplicated windows; gaps-and-islands merges them into maximal
    covered intervals per doc; survivors re-assemble ordered.  The
    md5-prefix window hash makes the marking decision replayable
    bit-for-bit in DuckDB.  Completes the span-dedup family —
    n5_hot_span_scrub removes every occurrence, n5_corpus_span_dedup
    thresholds on distinct docs; this is the paper's semantic, where a
    doc's own repeated boilerplate dedups against itself too
    (operators/text.py substring_dedup)."""
    from .operators.text import substring_dedup

    out = substring_dedup(load_table(spark, sf_dir, "documents"), min_len=8)
    return out.withColumn("n_tokens", F.col("n_tokens").cast("long"))


@query(
    "n2_jaccard_neardup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       sh AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(range(0, len(sp)-2),
                            i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]))) AS shingle
              FROM toks WHERE len(sp) >= 3),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
       SELECT id_a, id_b, jaccard FROM (
         SELECT id_a, id_b,
                CAST(inter AS DOUBLE)
                     / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
         FROM shared
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b) t
       WHERE jaccard >= 0.2""",
)
def n2_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: n-gram-Jaccard near-duplicate pairs (3-token shingles,
    threshold 0.2) — explode-join-aggregate, no cross product."""
    return _dedup.jaccard_pairs(load_table(spark, sf_dir, "documents"), min_jaccard=0.2)


@query(
    "n2_containment_pairs",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       sh AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(range(0, len(sp)-2),
                            i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]))) AS shingle
              FROM toks WHERE len(sp) >= 3),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
       sided AS (SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b
                 FROM shared
                 JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b),
       dirs AS (SELECT id_a AS contained_id, id_b AS container_id,
                       CAST(inter AS DOUBLE) / CAST(sz_a AS DOUBLE) AS containment
                FROM sided
                UNION ALL
                SELECT id_b, id_a,
                       CAST(inter AS DOUBLE) / CAST(sz_b AS DOUBLE)
                FROM sided)
       SELECT contained_id, container_id, containment
       FROM dirs WHERE containment >= 0.6""",
)
def n2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): DIRECTED shingle-containment near-dup pairs
    (|A∩B|/|A| >= 0.6, 3-token shingles) — the asymmetric subsumption
    relation Jaccard misses (a quoted snippet has tiny Jaccard but
    containment ≈ 1); the C4/RealNews contained-document dedup rule.
    Same explode-join-aggregate shape as jaccard_pairs, never a cross
    product (operators/dedup.containment_pairs)."""
    return _dedup.containment_pairs(
        load_table(spark, sf_dir, "documents"), min_containment=0.6
    )


@query(
    "n2_sorted_neighborhood",
    """WITH snb AS (SELECT doc_id AS id, lang AS blk,
                           substr(trim(text), 1, 16) AS k
               FROM documents),
       snn AS (SELECT id, blk, k,
                      LEAD(id, 1) OVER w AS i1, LEAD(k, 1) OVER w AS k1,
                      LEAD(id, 2) OVER w AS i2, LEAD(k, 2) OVER w AS k2,
                      LEAD(id, 3) OVER w AS i3, LEAD(k, 3) OVER w AS k3
               FROM snb
               WINDOW w AS (PARTITION BY blk ORDER BY k, id))
       SELECT id AS id_a, i1 AS id_b, k AS key_a, k1 AS key_b
       FROM snn WHERE i1 IS NOT NULL
       UNION ALL
       SELECT id, i2, k, k2 FROM snn WHERE i2 IS NOT NULL
       UNION ALL
       SELECT id, i3, k, k3 FROM snn WHERE i3 IS NOT NULL""",
)
def n2_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): SORTED-NEIGHBORHOOD blocking (Hernández-Stolfo) —
    the entity-resolution candidate generator beside LSH banding:
    within each lang block, docs sort by their 16-char text prefix and
    pair with their 3 successors (O(n·window) candidates by
    construction, for downstream editdist/jaccard rerank)
    (operators/dedup.sorted_neighborhood_pairs)."""
    from .operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs,
        block_expr=F.col("lang"),
        key_expr=F.substring(F.trim(F.col("text")), 1, 16),
        window=4,
    )


_UNIT_SQL = """
  u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
  nrm AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                     list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
          FROM u)
"""


@query(
    "n2_cosine_neardup",
    f"""WITH {_UNIT_SQL}
       SELECT a.vec_id AS id_a, b.vec_id AS id_b, cosine FROM (
         SELECT a.vec_id, b.vec_id,
                list_reduce(list_transform(list_zip(a.uv, b.uv),
                         p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
         FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id) t(vec_id_a, vec_id_b, cosine)
       JOIN nrm a ON a.vec_id = t.vec_id_a JOIN nrm b ON b.vec_id = t.vec_id_b
       WHERE cosine >= 0.4""",
)
def n2_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: embedding-cosine near-dup pairs (threshold 0.4)."""
    return _sim.cosine_neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


@query(
    "ann_cosine_topk",
    f"""WITH {_UNIT_SQL},
       q AS (SELECT vec_id AS query_id, uv AS qv FROM nrm WHERE vec_id < 5),
       s AS (SELECT q.query_id, c.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qv, c.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM nrm c CROSS JOIN q WHERE c.vec_id <> q.query_id)
       SELECT query_id, nbr_id, rank, cos AS cosine FROM (
         SELECT query_id, nbr_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, nbr_id) AS rank
         FROM s) r
       WHERE rank <= 10""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: brute-force cosine top-10 for 5 query vectors — the exactness
    baseline for ANN (query side broadcast; corpus scanned once)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.cosine_topk(emb, queries_df, k=10, query_id_col="query_id")


# JL shortlist ANN: project to 16 dims with a plan-literal seeded matrix,
# shortlist top-40 per query by projected cosine, exact full-width rerank
# to top-10.  Every stage is deterministic (literal matrix, fixed fold
# order, row_number ties on nbr_id), so the oracle replays it bit-exactly.
_JL_EXPRS = _sim.jl_project_sql(dim=64, d_out=16, seed=7, vec_expr="v")
_JL_LIST = "list_value(" + ", ".join(_JL_EXPRS) + ")"


@query(
    "n2_jl_shortlist",
    f"""WITH u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
       jl AS (SELECT vec_id, {_JL_LIST} AS j FROM u),
       jn AS (SELECT vec_id,
                     list_transform(j, x -> x / sqrt(list_reduce(
                         list_transform(j, y -> y * y), (a, b) -> a + b))) AS ju
              FROM jl),
       qj AS (SELECT vec_id AS query_id, ju AS qju FROM jn WHERE vec_id < 5),
       sj AS (SELECT q.query_id, c.vec_id AS nbr_id,
                     list_reduce(list_transform(list_zip(q.qju, c.ju),
                         p -> p[1] * p[2]), (x, y) -> x + y) AS jcos
              FROM jn c CROSS JOIN qj q WHERE c.vec_id <> q.query_id),
       cand AS (SELECT query_id, nbr_id FROM (
                  SELECT query_id, nbr_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY jcos DESC, nbr_id) AS r
                  FROM sj) t
                WHERE r <= 40),
       nrm AS (SELECT vec_id,
                      list_transform(v, x -> x / sqrt(list_reduce(
                          list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
               FROM u),
       qf AS (SELECT vec_id AS query_id, uv AS qv FROM nrm WHERE vec_id < 5),
       rer AS (SELECT c.query_id, c.nbr_id,
                      list_reduce(list_transform(list_zip(q.qv, n.uv),
                          p -> p[1] * p[2]), (x, y) -> x + y) AS cos
               FROM cand c JOIN nrm n ON n.vec_id = c.nbr_id
               JOIN qf q ON q.query_id = c.query_id)
       SELECT query_id, nbr_id, rank, cos AS cosine FROM (
         SELECT query_id, nbr_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, nbr_id) AS rank
         FROM rer) r
       WHERE rank <= 10""",
)
def n2_jl_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path: Johnson-Lindenstrauss shortlist ANN — project the
    64-dim embeddings to 16 dims with a seeded plan-literal matrix
    (similarity.jl_project), shortlist top-40 per query by projected
    cosine, then rerank the shortlist with full-width exact cosine and
    keep the top-10.  At 100 TB the first pass moves 4x less vector
    data and the full-width corpus is touched only for ~40 candidate
    rows per query.  Bit-exact vs the DuckDB oracle (literal matrix,
    fixed fold order, deterministic tie-breaks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.jl_shortlist_topk(emb, queries_df, dim=64, k=10)


# LSH-bucketed near-dup: the SCALE path, oracle-checked EXACTLY.  The
# hyperplanes are deterministic (seeded LCG), so the oracle embeds the
# same plane literals and recomputes the same signature bits; the
# candidate restriction (signature hamming <= 2) is expressed as
# bit_count(xor(sig_a, sig_b)) — identical pair set in both engines.
_LSH_SIG_SQL = _sim.lsh_signature_sql(dim=64, n_planes=8, seed=42, vec_expr="v")
_LSH_PAIRS_SQL = f"""
  u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
  sigs AS (SELECT vec_id, v, {_LSH_SIG_SQL} AS sig FROM u),
  snrm AS (SELECT vec_id, sig,
                  list_transform(v, x -> x / sqrt(list_reduce(
                      list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
           FROM sigs),
  lsh_pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_reduce(list_transform(list_zip(a.uv, b.uv),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
                FROM snrm a JOIN snrm b
                  ON a.vec_id < b.vec_id
                 AND bit_count(xor(a.sig, b.sig)) <= 2)
"""


@query(
    "n2_cosine_neardup_lsh",
    f"""WITH {_LSH_PAIRS_SQL}
       SELECT id_a, id_b, cosine FROM lsh_pairs WHERE cosine >= 0.4""",
)
def n2_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path: near-dup pairs from hyperplane-LSH bucket equi-join
    (signature hamming <= 2 of 8 bits) + dot-product rerank — no cross
    product anywhere in the plan (asserted in test_plan_regressions).
    Recall vs the brute baseline is pinned in test_northstar."""
    return _sim.cosine_neardup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"), dim=64, threshold=0.4
    )


from .operators.text import classifier_weights as _clf_weights  # noqa: E402
from .operators.text import quality_classifier_sql as _clf_sql  # noqa: E402

_CLF_W, _CLF_B = _clf_weights(n_buckets=256, seed=7)


@query("n4_quality_classifier", _clf_sql(_CLF_W, _CLF_B, threshold=0.0))
def n4_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round-7): quality-classifier INFERENCE — the standard LLM-
    curation gate the suite lacked.  A fastText-style linear model over
    hashed bag-of-token features (seeded plan-literal weights, 256
    buckets, engine-portable md5-prefix hash) scores every document in
    ONE narrow JVM aggregate fold: no Python UDF, no explode, no
    shuffle, no join (plan-asserted in test_plan_regressions).  DuckDB
    replays the identical literals and left-fold arithmetic, so margins
    match value-exactly (operators/text.py quality_classifier)."""
    from .operators.text import quality_classifier

    docs = load_table(spark, sf_dir, "documents")
    return quality_classifier(docs, _CLF_W, _CLF_B, threshold=0.0)


_HTML_WRAP_SQL = (
    "'<html><head><title>doc</title><script>var x=\"</div>\";</script></head>"
    "<body><p>' || text || '</p><a href=\"/a\">home</a> "
    "<a href=\"/b\">next &amp; prev</a></body></html>'"
)


def _html_strip_sql(expr: str) -> str:
    """DuckDB twin of text.html_to_text_col — same RE2-safe patterns,
    same order (entities after tags, &amp; last)."""
    c = expr
    for pat in (
        r"(?is)<script\b.*?</script>",
        r"(?is)<style\b.*?</style>",
        r"(?s)<!--.*?-->",
        r"(?s)<[^>]*>",
    ):
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "''"), ("&apos;", "''"), ("&amp;", "&"),
    ):
        c = f"replace({c}, '{ent}', '{rep}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


@query(
    "n4_html_extract",
    f"""WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents),
       anch AS (SELECT doc_id,
                       regexp_extract_all(html, '(?is)<a\\b[^>]*>(.*?)</a>', 1) AS al
                FROM h),
       ext AS (SELECT h.doc_id,
                      {_html_strip_sql('h.html')} AS text,
                      CAST(len(a.al) AS INT) AS n_links,
                      array_to_string(list_transform(a.al,
                          x -> {_html_strip_sql('x')}), ' ') AS atext
               FROM h JOIN anch a USING (doc_id))
       SELECT doc_id, text, n_links,
              CASE WHEN length(text) > 0
                   THEN least(CAST(length(atext) AS DOUBLE) / length(text), 1.0)
                   ELSE 0.0 END AS link_density
       FROM ext""",
)
def n4_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round-7): HTML→text extraction + boilerplate signals — the
    FIRST step of web-corpus curation the suite lacked.  Documents are
    deterministically wrapped in markup (script block containing a fake
    tag, comments, two anchors with an entity) and html_extract
    recovers plain text, anchor count, and LINK DENSITY (share of
    extracted characters inside <a> tags — the standard nav/boilerplate
    discriminator).  Entirely narrow JVM regexp chains restricted to
    syntax Java regex and DuckDB's RE2 share, so the oracle replays the
    extraction verbatim (operators/text.py html_to_text_col)."""
    from .operators.text import html_extract

    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>doc</title><script>var x="</div>";'
                "</script></head><body><p>"
            ),
            F.col("text"),
            F.lit(
                '</p><a href="/a">home</a> '
                '<a href="/b">next &amp; prev</a></body></html>'
            ),
        ).alias("html"),
    )
    return html_extract(wrapped)


@query(
    "n4_chunk_documents",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       s AS (SELECT doc_id, sp, unnest(range(0, len(sp), 48)) AS st
             FROM t WHERE len(sp) > 0)
       SELECT doc_id, CAST(st // 48 AS INT) AS chunk_idx,
              array_to_string(list_slice(sp, st + 1, st + 64), ' ') AS chunk_text,
              CAST(least(64, len(sp) - st) AS INT) AS n_tokens
       FROM s
       WHERE st = 0 OR st < len(sp) - 16""",
)
def n4_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: context-window chunking for training-sample prep — 64-token
    windows with 16-token overlap (stride 48).  Narrow Catalyst pipeline
    (tokens -> stride sequence -> posexplode), zero shuffles."""
    return _text.chunk_documents(
        load_table(spark, sf_dir, "documents"), window=64, overlap=16
    )


@query(
    "n4_pii_scrub",
    r"""SELECT doc_id,
              regexp_replace(
                  regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                  '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed_text,
              CAST(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
              CAST(len(regexp_extract_all(
                  regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                  '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS INT) AS n_phones
       FROM documents""",
)
def n4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: PII redaction (emails, phone-shaped numbers) with per-doc
    audit counts; patterns restricted to the Java/RE2-common regex
    subset so the oracle replays them verbatim."""
    return _text.pii_scrub(load_table(spark, sf_dir, "documents"))


@query(
    "n4_repetition_ratio",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       g AS (SELECT doc_id,
                    CASE WHEN len(sp) < 2 THEN []
                         ELSE list_transform(range(0, len(sp) - 1),
                              i -> sp[i+1] || chr(31) || sp[i+2]) END AS grams
             FROM t)
       SELECT doc_id,
              CAST(len(grams) AS INT) AS n_grams,
              CASE WHEN len(grams) = 0 THEN NULL
                   ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                            / CAST(len(grams) AS DOUBLE) END AS repetition
       FROM g""",
)
def n4_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: Gopher-style 2-gram repetition fraction (boilerplate/spam
    filter signal)."""
    return _text.repetition_ratio(load_table(spark, sf_dir, "documents"))


@query(
    "n5_curation_pipeline",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       x AS (SELECT doc_id, CAST(len(sp) AS DOUBLE) AS n,
                    CAST(len(list_distinct(sp)) AS DOUBLE) AS nu,
                    CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL})) AS DOUBLE) AS ns
             FROM t),
       qual AS (SELECT doc_id, (least(n, 100.0)/100.0*4.0 + nu/n*4.0
                                + least(ns/n*5.0, 1.0)*2.0)/10.0 AS quality FROM x),
       h AS (SELECT doc_id,
               len(list_filter(sp, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
               len(list_filter(sp, t -> t IN ('the','a','of','and','to','in','is','that'))) AS en,
               len(list_filter(sp, t -> t IN ('el','la','los','y','es','un','una','en'))) AS es,
               len(list_filter(sp, t -> t IN ('le','la','les','et','est','un','une','dans'))) AS fr,
               len(list_filter(sp, t -> t IN ('的','是','了','在','和','有','我','不'))) AS zh
             FROM t),
       lng AS (SELECT doc_id,
                 CASE WHEN greatest(de,en,es,fr,zh) <= 0 THEN 'und'
                      WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
                      WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
                      WHEN es >= fr AND es >= zh THEN 'es'
                      WHEN fr >= zh THEN 'fr'
                      ELSE 'zh' END AS detected_lang FROM h),
       g AS (SELECT doc_id,
                    CASE WHEN len(sp) < 2 THEN []
                         ELSE list_transform(range(0, len(sp) - 1),
                              i -> sp[i+1] || chr(31) || sp[i+2]) END AS grams
             FROM t),
       rep AS (SELECT doc_id,
                      CASE WHEN len(grams) = 0 THEN NULL
                           ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                    / CAST(len(grams) AS DOUBLE) END AS repetition
               FROM g),
       keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text))
       SELECT d.doc_id, q.quality, r.repetition
       FROM documents d
       JOIN qual q USING (doc_id)
       JOIN lng l USING (doc_id)
       JOIN rep r USING (doc_id)
       JOIN keep k USING (doc_id)
       WHERE q.quality >= 0.45 AND l.detected_lang = 'en' AND r.repetition <= 0.2""",
)
def n5_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The N-ops composed into the realistic training-data curation run:
    quality gate + language gate + repetition gate + exact-dedup
    keep-first, in ONE Spark job.  All three signals are column
    expressions evaluated in a SINGLE projection over ONE corpus scan
    (not one scan per signal joined back — the naive composition); the
    only shuffles are the dedup groupBy and one semi-join.  Oracle
    recomputes the identical pipeline as SQL CTEs."""
    docs = load_table(spark, sf_dir, "documents")
    base = _text.with_tokens(docs)  # tokenizer runs ONCE per row
    toks = F.col("__toks")
    sig = base.select(
        "doc_id",
        _text.quality_col("text", toks).alias("quality"),
        _text.detected_lang_col("text", toks).alias("detected_lang"),
        _text.repetition_col("text", toks=toks).alias("repetition"),
    )
    keep = _dedup.exact_dedup(docs, ["text"], "doc_id").select("doc_id")
    return (
        sig.join(keep, "doc_id", "left_semi")
        .filter(
            (F.col("quality") >= 0.45)
            & (F.col("detected_lang") == "en")
            & (F.col("repetition") <= 0.2)
        )
        .select("doc_id", "quality", "repetition")
    )


shared_sql(
    "n4_corpus_report",
    """SELECT lang, source,
              COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              MIN(doc_id) AS first_doc
       FROM documents
       GROUP BY ROLLUP (lang, source)""",
)


@query(
    "n2_quantize_embeddings",
    """WITH u AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
       s AS (SELECT vec_id, v,
                    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             FROM u)
       SELECT vec_id, scale,
              array_to_string(list_transform(v,
                  x -> CAST(CAST(round(x / scale) AS INT) AS VARCHAR)), ',') AS q_csv
       FROM s""",
)
def n2_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 storage scale path: symmetric per-vector int8 quantization
    (scale = max|x|/127).  8x smaller than float64 at <1% typical recall
    loss; a narrow map the oracle recomputes exactly."""
    return _sim.quantize_int8(load_table(spark, sf_dir, "embeddings"))


@query(
    "e1_sessionize",
    """WITH m AS (SELECT user_id, event_id, ts,
                         CASE WHEN lag(ts) OVER w IS NULL
                                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                   > 1800000000
                              THEN 1 ELSE 0 END AS ns
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id,
              CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
       FROM m""",
)
def e1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute gap): lag + running sum sharing
    ONE user-partitioned exchange — the batch twin of the streaming
    session_window rollup."""
    from .operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(ev, gap_us=1_800_000_000).select(
        "user_id", "event_id", "session_no"
    )


# --- approximate scale paths, oracle-checked EXACTLY via a portable
#     md5-prefix hash (DuckDB recomputes the same signatures/buckets;
#     the hot-path default stays xxhash64, same plan shape) ---

@query("n2_minhash_neardup", _dedup.minhash_pairs_sql())
def n2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path: MinHash(32) -> LSH(8 bands x 4) candidates ->
    exact-Jaccard rerank.  With the portable hash the whole approximate
    pipeline — signatures, band buckets, candidate set, rerank — is
    reproduced bit-for-bit by the DuckDB oracle; recall vs brute Jaccard
    is additionally pinned in tests."""
    return _dedup.minhash_neardup(
        load_table(spark, sf_dir, "documents"), min_jaccard=0.2, portable=True
    )


@query("n2_simhash_neardup", _dedup.simhash_pairs_sql())
def n2_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: SimHash near-dup pairs (hamming <= 3) via 15-bit band
    pigeonhole join — portable 60-bit signature, so the oracle recomputes
    the identical pair set and hamming distances in SQL."""
    return _dedup.simhash_neardup(load_table(spark, sf_dir, "documents"), portable=True)


def _planted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with every third doc replaced by identical boilerplate —
    the planted degenerate LSH bucket the hot-bucket-guard entries
    exercise (mirrors ``_dedup._planted_src_sql`` exactly)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.lit(_dedup.PLANTED_BOILERPLATE)
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


@query("n2_lsh_hot_bucket", _dedup.hot_bucket_pairs_sql())
def n2_lsh_hot_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale guard: minhash-LSH candidate pairs over a corpus with a
    PLANTED ~170-member degenerate bucket (every third doc identical),
    with the hot-bucket guard capped at 8 members — both policies
    exercised and tagged.  ``star`` emits rep-vs-member pairs (O(m) per
    hot bucket), ``sample`` self-joins the 8 lowest ids; cold buckets
    join exactly as the unguarded path.  The oracle replays counts,
    split, rep election, sampling and both unions bit-for-bit — the
    guard is a verified plan transformation, not a heuristic."""
    sigs = _dedup.minhash_signatures(_planted_documents(spark, sf_dir), portable=True)
    star = _dedup.minhash_lsh_candidates(
        sigs, portable=True, max_bucket=8, hot_policy="star"
    )
    samp = _dedup.minhash_lsh_candidates(
        sigs, portable=True, max_bucket=8, hot_policy="sample"
    )
    return star.select(F.lit("star").alias("policy"), "id_a", "id_b").unionByName(
        samp.select(F.lit("sample").alias("policy"), "id_a", "id_b")
    )


@query("n2_lsh_bucket_stats", _dedup.lsh_bucket_stats_sql())
def n2_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 no-silent-caps surfacing: the per-(band, members) LSH bucket
    histogram with over-cap flags on the planted corpus — what a
    production pipeline logs alongside any guarded dedup run so capped
    buckets are visible, not silent."""
    sigs = _dedup.minhash_signatures(_planted_documents(spark, sf_dir), portable=True)
    return _dedup.lsh_bucket_stats(sigs, portable=True, max_bucket=8)


_LSH4_SIG_SQL = _sim.lsh_signature_sql(dim=64, n_planes=4, seed=42, vec_expr="v")


@query(
    "ann_lsh_topk",
    f"""WITH u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
       sigs AS (SELECT vec_id, v, {_LSH4_SIG_SQL} AS sig FROM u),
       snrm AS (SELECT vec_id, sig,
                       list_transform(v, x -> x / sqrt(list_reduce(
                           list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
                FROM sigs),
       q AS (SELECT vec_id AS query_id, uv AS qu, sig AS qsig
             FROM snrm WHERE vec_id < 5),
       s AS (SELECT q.query_id, c.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qu, c.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM snrm c JOIN q
               ON c.vec_id <> q.query_id
              AND bit_count(xor(c.sig, q.qsig)) <= 2)
       SELECT query_id, nbr_id, rank, cos AS cosine FROM (
         SELECT query_id, nbr_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, nbr_id) AS rank
         FROM s) r
       WHERE rank <= 10""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path: random-hyperplane LSH bucketed cosine top-k with
    2-bit multiprobe.  The seeded planes make the candidate set (signature
    hamming <= 2 of 4 bits) deterministic, so the oracle reproduces the
    whole approximate result EXACTLY in SQL; recall vs brute force is
    additionally measured in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.lsh_cosine_topk(
        emb, queries_df, dim=64, k=10, n_planes=4, multiprobe_bits=2, query_id_col="query_id"
    )


@query(
    "n4_rolling_fingerprint",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       sh AS (SELECT doc_id,
                     CASE WHEN len(sp) < 5 THEN []
                          ELSE list_transform(range(0, len(sp)-4),
                               i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]
                                    || ' ' || sp[i+4] || ' ' || sp[i+5]) END AS shingles
              FROM toks)
       SELECT doc_id,
              array_to_string(
                list_slice(list_sort(list_distinct(list_transform(shingles,
                    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))), 1, 8),
                ',') AS fingerprint_set
       FROM sh""",
)
def n4_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: winnowing-style fingerprint set per document (8 smallest
    shingle hashes; portable md5-prefix hash, so the oracle recomputes
    the identical sets).  The set is emitted comma-joined so the driver's
    row hasher (which can't hash arrays) gets a scalar column."""
    fp = _text.rolling_hash_fingerprint(load_table(spark, sf_dir, "documents"), portable=True)
    return fp.select(
        "doc_id", F.concat_ws(",", F.col("fingerprint_set").cast("array<string>")).alias("fingerprint_set")
    )


# ---------------------------------------------------------------------------
# §2.1/§3 — the migration-package spine as an oracle-checked query:
# export customer to a gzipped XML package, import it back through
# staging -> validate -> pivot; result must equal the source table.
# ---------------------------------------------------------------------------

@query("s3_s2_package_roundtrip", "SELECT * FROM customer")
def s3_s2_package_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4 export -> S2 import -> A4 staging -> F11 validate -> A5 pivot
    (the reference's §3.1/§3.2 lifecycle, Codeunit 60000:267-302/419-530).
    Row serialization and parsing are distributed; only the gzip stream
    touches the driver."""
    import tempfile

    from .operators.staging import pivot_from_staging
    from .operators.validation import split_quarantine, validate_staging
    from .plans.spec import FieldSpec, PackageSpec, TableSpec
    from .sources.xml_package import export_package_xml, import_package_to_staging

    cust = load_table(spark, sf_dir, "customer")
    spec = PackageSpec(
        package_code="RT",
        tables=[
            TableSpec(
                table_name="customer",
                fields=[
                    FieldSpec(field_name=c, primary_key=(c == "c_custkey"), processing_order=j)
                    for j, c in enumerate(cust.columns)
                ],
            )
        ],
    )
    path = tempfile.mktemp(suffix=".rapidstart", prefix="bdmc_rt_")
    export_package_xml(spark, spec, sf_dir, path)
    _, staged = import_package_to_staging(spark, path, expected_package_code="RT")
    validated = validate_staging(staged["customer"], cust.schema)
    valid, _quar = split_quarantine(validated)
    return pivot_from_staging(valid, cust.schema)


@query("s2b_sharded_roundtrip", "SELECT * FROM customer")
def s2b_sharded_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHARDED package lifecycle (the 100 TB path): fully parallel
    gzip-text export per table, then fully distributed import — record
    parse via from_xml, no driver-side XML pass at all — through the same
    staging/validate/pivot spine.  Must equal the source exactly, like
    the single-file roundtrip."""
    import shutil
    import tempfile

    from .operators.staging import pivot_from_staging
    from .operators.validation import split_quarantine, validate_staging
    from .plans.spec import FieldSpec, PackageSpec, TableSpec
    from .sources.xml_package import export_package_sharded, import_sharded_to_staging

    cust = load_table(spark, sf_dir, "customer")
    spec = PackageSpec(
        package_code="RTS",
        tables=[
            TableSpec(
                table_name="customer",
                fields=[
                    FieldSpec(field_name=c, primary_key=(c == "c_custkey"), processing_order=j)
                    for j, c in enumerate(cust.columns)
                ],
            )
        ],
    )
    out_dir = tempfile.mkdtemp(prefix="bdmc_rts_")
    try:
        export_package_sharded(spark, spec, sf_dir, out_dir)
        _, staged = import_sharded_to_staging(spark, out_dir, expected_package_code="RTS")
        validated = validate_staging(staged["customer"], cust.schema)
        valid, _quar = split_quarantine(validated)
        wide = pivot_from_staging(valid, cust.schema)
        wide = _detach(wide)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return wide


@query("s5_s6_excel_roundtrip", "SELECT * FROM nation")
def s5_s6_excel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 Excel export -> S6 import -> shared staging/validate/pivot path
    (the reference's §3.3 bridge: workbook normalizes into the same ingest
    pipeline as XML, Codeunit 60001:359-363)."""
    import tempfile

    from .operators.staging import pivot_from_staging
    from .operators.validation import split_quarantine, validate_staging
    from .plans.spec import FieldSpec, PackageSpec, TableSpec
    from .sources.excel_package import export_package_excel, import_package_excel

    nat = load_table(spark, sf_dir, "nation")
    spec = PackageSpec(
        package_code="XLRT",
        tables=[
            TableSpec(
                table_name="nation",
                fields=[FieldSpec(field_name=c, processing_order=j) for j, c in enumerate(nat.columns)],
            )
        ],
    )
    path = tempfile.mktemp(suffix=".xlsx", prefix="bdmc_xl_")
    export_package_excel(spark, spec, sf_dir, path)
    _, staged = import_package_excel(spark, path, expected_package_code="XLRT")
    valid, _ = split_quarantine(validate_staging(staged["nation"], nat.schema))
    return pivot_from_staging(valid, nat.schema)


# ---------------------------------------------------------------------------
# J1/J2 — dimension-set lookup with default-dimension fallback
# (GetDimValueFromTable, Codeunit 60000:894-922).  Synthetic dim tables are
# derived deterministically from orders so the oracle can rebuild them.
# ---------------------------------------------------------------------------

@query(
    "j2_dim_fallback",
    """WITH fact AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 7 = 0 THEN NULL
                     ELSE o_orderkey % 97 END AS dim_set_id
         FROM orders WHERE o_orderkey <= 5000),
       dse AS (
         SELECT DISTINCT dim_set_id, 'DEPT' AS dim_code,
                'D' || CAST(dim_set_id % 5 AS VARCHAR) AS dim_value_code
         FROM fact WHERE dim_set_id IS NOT NULL),
       dd AS (
         SELECT DISTINCT 'orders' AS table_name, o_custkey AS master_no,
                'DEPT' AS dim_code,
                'DFLT' || CAST(o_custkey % 3 AS VARCHAR) AS dim_value_code
         FROM fact)
       SELECT f.o_orderkey,
              coalesce(s.dim_value_code, d.dim_value_code) AS dept
       FROM fact f
       LEFT JOIN dse s ON s.dim_set_id = f.dim_set_id
       LEFT JOIN dd d ON d.master_no = f.o_custkey""",
)
def j2_dim_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2: dimension value resolved from the dim-set entry, falling
    back to the (table, master no.) default dimension when the record has
    no set — broadcast joins on both lookup tables."""
    from .operators.dimensions import dim_value_with_fallback

    fact = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 5000)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_orderkey") % 97)
            .alias("dim_set_id"),
        )
    )
    dse = (
        fact.filter(F.col("dim_set_id").isNotNull())
        .select(
            "dim_set_id",
            F.lit("DEPT").alias("dim_code"),
            F.concat(F.lit("D"), (F.col("dim_set_id") % 5).cast("string")).alias("dim_value_code"),
        )
        .dropDuplicates()
    )
    dd = fact.select(
        F.lit("orders").alias("table_name"),
        F.col("o_custkey").alias("master_no"),
        F.lit("DEPT").alias("dim_code"),
        F.concat(F.lit("DFLT"), (F.col("o_custkey") % 3).cast("string")).alias("dim_value_code"),
    ).dropDuplicates()
    out = dim_value_with_fallback(
        fact, dse, dd, "DEPT", "orders", master_no_col="o_custkey", out_col="dept"
    )
    return out.select("o_orderkey", "dept")


@query(
    "f_option_duality",
    """SELECT o_orderkey,
              CASE o_orderpriority
                   WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                   WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                   WHEN '5-LOW' THEN 4 END AS priority_idx,
              CAST(CASE o_orderpriority
                   WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                   WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                   WHEN '5-LOW' THEN 4 END AS VARCHAR) AS xml_render,
              o_orderpriority AS excel_render
       FROM orders WHERE o_orderkey <= 2000""",
)
def f_option_duality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.2 Option duality: label -> index (storage), index rendered as
    the INDEX in XML mode (Codeunit 60000:837-838) and as the display
    TEXT in Excel mode (XML:848-849); both roundtrip."""
    from .functions.enums import ORDER_PRIORITY as P

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    idx = P.to_index("o_orderpriority")
    return o.select(
        "o_orderkey",
        idx.alias("priority_idx"),
        P.render(idx, "xml").alias("xml_render"),
        P.render(idx, "excel").alias("excel_render"),
    )


# ---------------------------------------------------------------------------
# §2 coverage completion: P3/P8/J3/J5-upsert/O2/F11/F12 + engine
# capabilities (window analytics, rollup, set ops) + S7/S8 media round-trip
# ---------------------------------------------------------------------------

@query(
    "p3_obsolete_prune",
    """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
       FROM customer WHERE c_custkey <= 500""",
)
def p3_obsolete_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: obsolete/removed fields forcibly excluded from the projection
    (ref: ExcludeRemovedFields XML:800-814).  The package manifest marks
    c_acctbal ObsoleteState=Removed; reconcile keeps only live catalog
    fields — column pruning reaches the parquet scan."""
    from .catalog import fields_catalog

    c = load_table(spark, sf_dir, "customer")
    removed = {"c_acctbal"}
    live = [f.field_name for f in fields_catalog(c, "customer") if f.field_name not in removed]
    return c.filter(F.col("c_custkey") <= 500).select(*live)


_GATE_PAYLOAD = {
    "region": "r_name",
    "nation": "n_name",
    "customer": "c_name",
    "supplier": "s_name",
    "part": "p_name",
    "orders": "o_orderstatus",
    "lineitem": "l_returnflag",
    "events": "event_type",
    "documents": "text",
    "embeddings": "embedding",
}

@query(
    "p8_nonempty_gate",
    "\nUNION ALL ".join(
        (
            f"SELECT '{t}' AS table_name, EXISTS(SELECT 1 FROM {t} "
            f"WHERE {c} IS NOT NULL AND len({c}) > 0) AS has_data"
        )
        if t == "embeddings"
        else (
            f"SELECT '{t}' AS table_name, EXISTS(SELECT 1 FROM {t} "
            f"WHERE {c} IS NOT NULL AND {c} <> '') AS has_data"
        )
        for t, c in _GATE_PAYLOAD.items()
    ),
)
def p8_nonempty_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: a table is imported only if ≥1 included field carries a
    non-empty value in some record (ref: PackageDataExistsInXML
    XML:553-588).  limit(1) short-circuits the scan — the gate costs one
    row per table no matter the table size."""
    out = None
    for t, c in _GATE_PAYLOAD.items():
        col = F.col(c)
        cond = col.isNotNull() & (
            (F.size(col) > 0) if t == "embeddings" else (col != "")
        )
        gate = (
            load_table(spark, sf_dir, t)
            .select(c)
            .filter(cond)
            .limit(1)
            .agg((F.count(F.lit(1)) > 0).alias("has_data"))
            .select(F.lit(t).alias("table_name"), "has_data")
        )
        out = gate if out is None else out.unionByName(gate)
    return out


@query(
    "j3_catalog_join",
    """SELECT v.field_id, v.field_name, v.data_type, v.xsd_type,
              v.is_primary_key, c.n_cells
       FROM (VALUES (1, 'c_custkey',    'bigint', 'xsd:integer', TRUE),
                    (2, 'c_name',       'string', 'xsd:string',  FALSE),
                    (3, 'c_nationkey',  'int',    'xsd:integer', FALSE),
                    (4, 'c_acctbal',    'double', 'xsd:string',  FALSE),
                    (5, 'c_mktsegment', 'string', 'xsd:string',  FALSE))
            AS v(field_id, field_name, data_type, xsd_type, is_primary_key),
            (SELECT count(*) AS n_cells FROM customer) c""",
)
def j3_catalog_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+F12: staged cells joined to the fields catalog (≈ virtual table
    2000000041 'Field', ref: XML:676-699) — broadcast metadata join, with
    the NAV→XSD type render of GetXSDType (XML:1030-1051)."""
    from .catalog import fields_catalog_df
    from .functions.scalars import xsd_type

    c = load_table(spark, sf_dir, "customer")
    cat = fields_catalog_df(spark, c, "customer")
    xsd_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in ("bigint", "string", "int", "double")]),
        F.array(*[F.lit(xsd_type(t)) for t in ("bigint", "string", "int", "double")]),
    )
    staged = melt_to_staging(c, "customer", record_key_col="c_custkey")
    counts = staged.groupBy("field_name").agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        counts.join(F.broadcast(cat), "field_name")
        .select(
            "field_id",
            "field_name",
            "data_type",
            xsd_map[F.col("data_type")].alias("xsd_type"),
            "is_primary_key",
            "n_cells",
        )
    )


@query(
    "j5b_create_missing_codes",
    """SELECT DISTINCT CAST(o_custkey + 1000000 AS BIGINT) AS c_custkey,
              CAST(NULL AS VARCHAR) AS c_name,
              CAST(NULL AS VARCHAR) AS c_mktsegment
       FROM orders WHERE o_orderkey % 1000 = 0""",
)
def j5b_create_missing_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 action half: Create Missing Codes auto-inserts absent FK parents
    instead of erroring (ref: XML:112-113, 690-692).  Orphans are injected
    deterministically (the fixtures are FK-clean); the query returns the
    parent rows the upsert created — key populated, attributes defaulted."""
    from .operators.upsert import create_missing_codes

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 1000 == 0, F.col("o_custkey") + 1000000).otherwise(
            F.col("o_custkey")
        ),
    )
    repaired = create_missing_codes(c, "c_custkey", o, "o_custkey")
    created = repaired.join(F.broadcast(c.select("c_custkey")), "c_custkey", "left_anti")
    return created.select("c_custkey", "c_name", "c_mktsegment")


@query(
    "o2_toposort_stages",
    """WITH RECURSIVE
         edges(parent, child) AS (
           VALUES ('region','nation'), ('nation','customer'),
                  ('nation','supplier'), ('customer','orders'),
                  ('orders','lineitem'), ('part','lineitem'),
                  ('supplier','lineitem')),
         tabs(t) AS (
           VALUES ('region'), ('nation'), ('customer'), ('supplier'),
                  ('part'), ('orders'), ('lineitem'), ('events'),
                  ('documents'), ('embeddings')),
         d(t, depth) AS (
           SELECT t, 0 FROM tabs
           UNION ALL
           SELECT e.child, d.depth + 1 FROM edges e JOIN d ON e.parent = d.t)
       SELECT t AS table_name, MAX(depth) AS stage FROM d GROUP BY t""",
)
def o2_toposort_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: FK-dependency-ordered execution stages (ref: Processing Order /
    Parent Table ID ordering XML:58-67, 88-92, 612-626).  Stage k tables
    depend only on stages < k (parents first; barrier between stages, the
    reference's WaitForAllToFinish).  Oracle recomputes the same levels as
    longest-path depth via a recursive CTE — a true differential check."""
    from pyspark.sql import types as T

    from .plans.toposort import stages

    edges = [
        (parent, child)
        for child, fks in FOREIGN_KEYS.items()
        for (_cc, parent, _pc) in fks
    ]
    levels = stages(TABLES, edges)
    rows = [(t, i) for i, names in enumerate(levels) for t in names]
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType(), False),
            T.StructField("stage", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "f11_parse_matrix",
    """WITH cells AS (
         SELECT 'o_totalprice' AS field_name,
                CASE WHEN o_orderkey % 97 = 0
                     THEN CAST(CAST(o_totalprice AS DECIMAL(28,6)) AS VARCHAR) || 'X'
                     ELSE CAST(CAST(o_totalprice AS DECIMAL(28,6)) AS VARCHAR) END AS value,
                'double' AS dt
         FROM orders
         UNION ALL
         SELECT 'o_orderdate',
                CASE WHEN o_orderkey % 101 = 0 THEN 'not-a-date'
                     ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END,
                'timestamp'
         FROM orders)
       SELECT field_name,
              COUNT(CASE WHEN (dt = 'double' AND TRY_CAST(value AS DOUBLE) IS NULL)
                           OR (dt = 'timestamp' AND TRY_CAST(value AS TIMESTAMP) IS NULL)
                         THEN 1 END) AS n_errors,
              COUNT(*) AS n_cells
       FROM cells GROUP BY field_name""",
)
def f11_parse_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: EVALUATE-style typed parse with error CAPTURE, never abort
    (ref: EvaluateValue XML:777-784; FieldError recorded XML:779).  Cells
    are corrupted deterministically, parsed with try_cast semantics, and
    failures counted per field — row counts preserved."""
    from .operators.validation import parse_error_expr

    o = load_table(spark, sf_dir, "orders")
    price_raw = F.col("o_totalprice").cast("decimal(28,6)").cast("string")
    price_val = F.when(
        F.col("o_orderkey") % 97 == 0, F.concat(price_raw, F.lit("X"))
    ).otherwise(price_raw)
    date_raw = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    date_val = F.when(F.col("o_orderkey") % 101 == 0, F.lit("not-a-date")).otherwise(date_raw)
    cells = o.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_totalprice").alias("field_name"),
                    price_val.alias("value"),
                    F.lit("double").alias("dt"),
                ),
                F.struct(
                    F.lit("o_orderdate").alias("field_name"),
                    date_val.alias("value"),
                    F.lit("timestamp").alias("dt"),
                ),
            )
        ).alias("cell")
    ).select("cell.*")
    err = F.when(
        F.col("dt") == "double",
        parse_error_expr(F.col("value"), "double", F.col("field_name")),
    ).otherwise(parse_error_expr(F.col("value"), "timestamp", F.col("field_name")))
    return (
        cells.withColumn("error", err)
        .groupBy("field_name")
        .agg(
            F.count(F.col("error")).alias("n_errors"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )


shared_sql(
    "w1_running_total",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_spend,
              LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
       FROM orders""",
)

shared_sql(
    "a8_rollup_pricing",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
              COUNT(*) AS n
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)

shared_sql(
    "u1_set_ops",
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       EXCEPT
       SELECT c_custkey FROM customer WHERE c_acctbal < 0""",
)


@query(
    "s7_s8_media_roundtrip",
    """WITH h AS (SELECT doc_id, sha256(text) AS hx,
                         octet_length(encode(text)) AS nb
                  FROM documents WHERE doc_id < 64)
       SELECT doc_id AS id,
              substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' ||
              substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-' ||
              substr(hx, 21, 12) AS guid,
              nb AS n_bytes,
              TRUE AS size_match
       FROM h""",
)
def s7_s8_media_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S8: media sink/source round-trip (ref: ExportMediaSet
    XML:1144-1169, media import XML:1221-1270).  Document payloads are
    written one file per row under a Media/ dir (executor-side, GUID-named
    — the reference's GUID manifest) and re-imported via the distributed
    binaryFile source.  The GUID is a deterministic content hash and the
    size column round-trips through the real files, so the whole pipeline
    IS oracle-checkable: DuckDB recomputes guid + byte size from the
    source text and pins size_match TRUE."""
    import shutil
    import tempfile

    from .sources.media import export_media, import_media

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
    )
    media_dir = tempfile.mkdtemp(prefix="bdmc_media_rt_")
    try:
        manifest = export_media(docs, media_dir, content_col="content", id_col="doc_id")
        back = import_media(spark, media_dir)
        joined = manifest.join(back.withColumnRenamed("size", "size_back"), "guid")
        out = joined.select(
            "id",
            "guid",
            F.col("size").cast("long").alias("n_bytes"),
            (F.col("size").cast("long") == F.col("size_back")).alias("size_match"),
        ).orderBy("id")
        out = _detach(out)
    finally:
        shutil.rmtree(media_dir, ignore_errors=True)
    return out


@query(
    "f7_locale_dates",
    """SELECT o_orderkey,
              strftime(o_orderdate, '%d/%m/%Y') AS date_en_gb,
              strftime(o_orderdate, '%d.%m.%Y') AS date_ru_ru,
              strftime(o_orderdate, '%Y-%m-%d') AS date_iso
       FROM orders WHERE o_orderkey <= 1000""",
)
def f7_locale_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: Excel-mode locale date render driven by the package Language ID
    (ref: TypeHelper.FormatDate, XML:850-853; the extension ships ru-RU
    translations).  Pure date_format — JVM-side, no Python in the row
    path; unknown Language ID falls back to the ISO XML rendering."""
    from .functions.scalars import localized_date

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        localized_date(F.col("o_orderdate"), 2057).alias("date_en_gb"),
        localized_date(F.col("o_orderdate"), 1049).alias("date_ru_ru"),
        localized_date(F.col("o_orderdate"), -1).alias("date_iso"),
    )


shared_sql(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority""",
)

shared_sql(
    "q10_returned_revenue",
    """SELECT c_custkey, c_name,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM customer, orders, lineitem
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
)

shared_sql(
    "a9_cube_counts",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem
       GROUP BY CUBE (l_returnflag, l_linestatus)""",
)


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path #2: IVF (inverted-file) ANN — k-means coarse
    quantizer fit on a driver-side sample, corpus bucketed into inverted
    lists (narrow map, no shuffle), queries probe their n_probe nearest
    lists only.  Recall measured against ann_cosine_topk in tests;
    approximate by construction, so rows-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.ivf_cosine_topk(
        emb, queries_df, k=10, n_centroids=16, n_probe=6, query_id_col="query_id"
    )


@query(
    "ann_ivf_recall",
    """SELECT 10 AS k, 5 AS n_queries, TRUE AS recall_ok""",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF path against the exact brute-force top-k,
    computed end-to-end in Spark.  The IVF candidate set is fully
    deterministic (seeded k-means on a fixed scan-order sample), but the
    measured recall is a property of the DATA, so pinning its exact value
    in the oracle only holds at one scale factor (0.68 at sf0.01, 0.74 at
    sf0.1).  The oracle therefore pins the scale-independent contract —
    recall >= 0.6 with 6/16 probes — and the exact sf0.01 scalar (34/50)
    stays pinned in tests/test_northstar.py against the oracle fixtures,
    so a quantizer regression still breaks a hard number."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = _sim.cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    ivf = _sim.ivf_cosine_topk(
        emb, queries_df, k=10, n_centroids=16, n_probe=6, query_id_col="query_id"
    ).select("query_id", "nbr_id")
    joined = brute.join(ivf.withColumn("__hit", F.lit(1)), ["query_id", "nbr_id"], "left")
    return joined.agg(
        F.lit(10).alias("k"),
        F.count_distinct("query_id").cast("int").alias("n_queries"),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)).cast("double"))
            >= F.lit(0.6)
        ).alias("recall_ok"),
    )


@query(
    "ann_pq_recall",
    """SELECT 10 AS k, 5 AS n_queries, TRUE AS recall_ok""",
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the product-quantization ANN path (16 subspaces x 32
    codes, ADC lookup-table scoring over 16-byte codes, exact rerank of
    the 10x shortlist) against brute force, end-to-end in Spark.  Like
    ann_ivf_recall, the candidate pipeline is fully deterministic
    (seeded per-subspace k-means on a fixed scan-order sample) but the
    achieved recall is a data property, so the oracle pins the scale-
    independent contract (>= 0.8: measured 0.92-0.96 at sf0.001/0.01/
    0.1) and tests/test_northstar.py pins the exact sf0.01 scalar.
    Scale: codes are a 16x memory compression of the corpus scan; the
    rerank fetches full vectors for k*factor rows per query only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = _sim.cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    pq = _sim.pq_cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    joined = brute.join(pq.withColumn("__hit", F.lit(1)), ["query_id", "nbr_id"], "left")
    return joined.agg(
        F.lit(10).alias("k"),
        F.count_distinct("query_id").cast("int").alias("n_queries"),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)).cast("double"))
            >= F.lit(0.8)
        ).alias("recall_ok"),
    )


@query(
    "ann_ivfpq_recall",
    """SELECT 10 AS k, 5 AS n_queries, TRUE AS recall_ok""",
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF-PQ composition (FAISS's IVFx,PQy — the
    architecture that actually serves 100 TB ANN): IVF prunes the scan
    to ~6/16 of the corpus, candidates inside the probed lists are
    scored from 16-byte PQ codes via the query's ADC table, and the 10x
    shortlist reranks exactly.  Measured 0.68-0.74 across fixture
    scales — equal to the IVF candidate bound, i.e. PQ scoring + rerank
    lose nothing inside the lists; the oracle pins the scale-
    independent >= 0.6 contract and tests/test_northstar.py pins the
    exact sf0.01 scalar (34/50, same as pure IVF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = _sim.cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    got = _sim.ivfpq_cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    joined = brute.join(got.withColumn("__hit", F.lit(1)), ["query_id", "nbr_id"], "left")
    return joined.agg(
        F.lit(10).alias("k"),
        F.count_distinct("query_id").cast("int").alias("n_queries"),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)).cast("double"))
            >= F.lit(0.6)
        ).alias("recall_ok"),
    )


@query(
    "n2_kmeans_contract",
    """SELECT 8 AS k, COUNT(*) AS n_assigned, TRUE AS inertia_monotone
       FROM embeddings""",
)
def n2_kmeans_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means over the FULL embedding corpus
    (iterative algorithm: per iteration one narrow plan-literal
    assignment pass + one (cluster, dim)-keyed decimal-exact centroid
    update whose collect is bounded by k x d, never the data).  The
    trajectory is deterministic on any cluster size, so the checkable
    contract is: every vector assigned, and the mean self-similarity
    (spherical inertia) monotone non-decreasing across iterations —
    the convergence guarantee of Lloyd's algorithm.  Exact cluster
    sizes at the oracle SF are pinned in tests/test_northstar.py."""
    from .operators.similarity import kmeans_distributed

    emb = load_table(spark, sf_dir, "embeddings")
    assignments, _cents, inertia = kmeans_distributed(emb, k=8, iters=4)
    monotone = all(inertia[i + 1] >= inertia[i] - 1e-12 for i in range(len(inertia) - 1))
    return assignments.agg(
        F.lit(8).alias("k"),
        F.count(F.lit(1)).alias("n_assigned"),
        F.lit(bool(monotone)).alias("inertia_monotone"),
    )


@query(
    "x1_x5_pipeline_apply",
    """SELECT 'region' AS table_name, count(*) AS rows_applied FROM region
       UNION ALL SELECT 'nation', count(*) FROM nation
       UNION ALL SELECT 'customer', count(*) FROM customer""",
)
def x1_x5_pipeline_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X2+X4+X5+O2 composed: export a 3-table package, then the full
    import lifecycle — staging, validate, pivot, FK pass, dependency-
    ranked apply with parallel driver threads and a barrier per rank
    (ref: ImportPackageXMLDocument XML:419-530, fan-out XML:482-493,
    WaitForAllToFinish XML:521-522, Delete Recs Before Processing
    XML:93-97).  Result: per-table applied row counts read back from the
    overwritten targets — equal to the source counts iff every stage
    preserved every record."""
    import shutil
    import tempfile

    from .plans.pipeline import run_import
    from .plans.spec import FieldSpec, PackageSpec, TableSpec

    from .sources.xml_package import export_package_xml

    names = ("region", "nation", "customer")
    dfs = {t: load_table(spark, sf_dir, t) for t in names}
    spec = PackageSpec(
        package_code="PIPE",
        tables=[
            TableSpec(
                table_name=t,
                fields=[
                    FieldSpec(field_name=c, primary_key=(c in PRIMARY_KEYS_LOCAL[t]))
                    for c in dfs[t].columns
                ],
            )
            for t in names
        ],
    )
    pkg = tempfile.mktemp(suffix=".rapidstart", prefix="bdmc_pipe_")
    target = tempfile.mkdtemp(prefix="bdmc_pipe_tgt_")
    try:
        export_package_xml(spark, spec, sf_dir, pkg)
        report = run_import(
            spark, pkg, target, {t: dfs[t].schema for t in names}, spec,
            expected_package_code="PIPE",
        )
        rows = [(t, report.tables[t].rows_applied) for t in names]
        out = spark.createDataFrame(rows, "table_name string, rows_applied long")
        out = _detach(out)
    finally:
        shutil.rmtree(target, ignore_errors=True)
        import os as _os

        if _os.path.exists(pkg):
            _os.remove(pkg)
    return out


@query(
    "stream_hourly_rollup",
    ORACLES["events_hourly_rollup"],
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: the hourly rollup executed as a STRUCTURED STREAM —
    events land as parquet files, readStream micro-batches them
    (availableNow), tumbling 1-hour windows with a watermark aggregate
    into a memory sink.  The finished stream must equal the batch oracle
    exactly (one availableNow pass drops nothing)."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import hourly_rollup_stream, run_stream_to_memory, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_rollup"  # suffix picks complete output mode
    try:
        # land files in CHRONOLOGICAL order (how a real ingest arrives):
        # micro-batches then see time-ordered files, so the 2-hour
        # watermark advances without ever classifying in-order data late
        ev = load_table(spark, sf_dir, "events")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 4
        for i in range(4):
            a = lo + i * span
            b = hi if i == 3 else lo + (i + 1) * span
            cond = (F.col("ts") >= a) & ((F.col("ts") <= b) if i == 3 else (F.col("ts") < b))
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        stream = stream_events(spark, landing, max_files_per_trigger=1)
        run_stream_to_memory(hourly_rollup_stream(stream), qname)
        out = spark.table(qname)
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "stream_sliding_topk",
    """WITH ex AS (SELECT date_trunc('hour', ts) AS s0, event_type, value
                   FROM events),
       wins AS (SELECT s0 AS wstart, event_type, value FROM ex
                UNION ALL
                SELECT s0 - INTERVAL 1 HOUR, event_type, value FROM ex),
       agg AS (SELECT wstart, event_type,
                      COUNT(*) AS n_events,
                      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                          AS sum_value
               FROM wins GROUP BY wstart, event_type),
       r AS (SELECT wstart, event_type, n_events, sum_value,
                    CAST(ROW_NUMBER() OVER (
                        PARTITION BY wstart
                        ORDER BY n_events DESC, event_type) AS INT) AS rk
             FROM agg)
       SELECT wstart, event_type, n_events, sum_value, rk
       FROM r WHERE rk <= 3""",
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: SLIDING 2h/1h windows per event_type as a
    structured stream (each event feeds two overlapping windows;
    watermark bounds state to open windows only), then top-3 types per
    window ranked as a tiny batch over the closed aggregates — rank
    inside the streaming agg would force complete-mode recomputation of
    every window each micro-batch, while the post-pass ranks
    windows x types rows, not events.  Oracle replays the overlap by
    exploding each event into its two windows."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import Window
    from .streaming.events import run_stream_to_memory, sliding_rollup_stream, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_rollup"  # suffix picks complete output mode
    try:
        ev = load_table(spark, sf_dir, "events")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 4
        for i in range(4):
            a = lo + i * span
            b = hi if i == 3 else lo + (i + 1) * span
            cond = (F.col("ts") >= a) & ((F.col("ts") <= b) if i == 3 else (F.col("ts") < b))
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        stream = stream_events(spark, landing, max_files_per_trigger=1)
        run_stream_to_memory(sliding_rollup_stream(stream), qname)
        agg = spark.table(qname)
        w = Window.partitionBy("wstart").orderBy(
            F.col("n_events").desc(), F.col("event_type").asc()
        )
        out = (
            agg.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= 3)
            .select("wstart", "event_type", "n_events", "sum_value", "rk")
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "e2_partition_pruned_scan",
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events
       WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) + 3 FROM events)
       GROUP BY CAST(ts AS DATE), event_type""",
)
def e2_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout op: events re-written PARTITIONED BY event_date, then a
    single-day query reads back through partition pruning — only that
    day's directory is scanned (plan-asserted in test_plan_regressions).
    At 100 TB this is the difference between scanning one day and
    scanning three years.  Oracle computes the same day's rollup off the
    unpartitioned source."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    target_day = ev.agg((F.min("event_date") + F.expr("INTERVAL 3 DAY")).cast("date")).first()[0]
    out = tempfile.mkdtemp(prefix="bdmc_events_part_")
    try:
        ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
        part = spark.read.parquet(out)
        res = (
            part.filter(F.col("event_date") == F.lit(target_day))
            .groupBy("event_date", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            )
            .select(F.col("event_date").alias("event_date"), "event_type", "n", "sum_value")
        )
        res = _detach(res)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return res


@query(
    "e6_seasonal_decompose",
    """WITH hc AS (SELECT event_type,
                          epoch_us(ts) // 3600000000 AS h,
                          count(*) AS v
               FROM events GROUP BY 1, 2),
       bounds AS (SELECT event_type, min(h) AS mn, max(h) AS mx
                  FROM hc GROUP BY 1),
       ax AS (SELECT event_type, unnest(range(mn, mx + 1)) AS h FROM bounds),
       dense AS (SELECT a.event_type, a.h, COALESCE(hc.v, 0) AS v
                 FROM ax a LEFT JOIN hc
                   ON hc.event_type = a.event_type AND hc.h = a.h),
       ws AS (SELECT event_type, h, v,
                     SUM(v) OVER (PARTITION BY event_type ORDER BY h
                                  ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
                         AS s,
                     COUNT(*) OVER (PARTITION BY event_type ORDER BY h
                                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
                         AS c
              FROM dense),
       f AS (SELECT event_type, h, v, CAST(s AS BIGINT) AS s,
                    25 * v - CAST(s AS BIGINT) AS d, h % 24 AS phase
             FROM ws WHERE c = 25),
       seas AS (SELECT event_type, phase, SUM(d) AS dn, COUNT(*) AS dc
                FROM f GROUP BY 1, 2)
       SELECT f.event_type, f.h, CAST(f.v AS BIGINT) AS v,
              CAST(f.s AS DOUBLE) / 25.0 AS trend,
              (CAST(s2.dn AS DOUBLE) / CAST(s2.dc AS DOUBLE)) / 25.0 AS seasonal,
              (CAST(f.d AS DOUBLE) / 25.0)
              - (CAST(s2.dn AS DOUBLE) / CAST(s2.dc AS DOUBLE)) / 25.0 AS residual
       FROM f JOIN seas s2 USING (event_type, phase)""",
)
def e6_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/temporal (round 9): classical additive SEASONAL
    DECOMPOSITION of the hourly event series per event_type — trend =
    centered 25-hour moving average (full windows only), seasonal =
    per-phase mean of detrended values, residual = remainder.  The
    detrended value is carried as the integer numerator 25·v − Σwindow
    so every aggregation is order-independent integer arithmetic and
    every emitted double is one fixed division chain — bit-replayable
    (operators/temporal.seasonal_decompose)."""
    from .operators.temporal import seasonal_decompose

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    axis = (
        hc.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("h"))
    )
    dense = axis.join(hc, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    return seasonal_decompose(dense, "event_type", "h", "v", period=24, half_window=12)


@query(
    "e7_cusum_changepoints",
    """WITH base AS (
         SELECT user_id, ts, event_id, value,
                CAST(value - CAST(55.0 AS DOUBLE) AS DECIMAL(18,6)) AS ip,
                CAST(CAST(45.0 AS DOUBLE) - value AS DECIMAL(18,6)) AS inn
         FROM events),
       pre AS (
         SELECT user_id, ts, event_id, value,
                SUM(ip) OVER w AS pp, SUM(inn) OVER w AS pn
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       mins AS (
         SELECT user_id, ts, event_id, value, pp, pn,
                MIN(pp) OVER w AS mp, MIN(pn) OVER w AS mn
         FROM pre
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       SELECT user_id, ts, event_id, value,
              CAST(pp - (CASE WHEN mp < 0 THEN mp
                              ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                  AS cusum_pos,
              CAST(pn - (CASE WHEN mn < 0 THEN mn
                              ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                  AS cusum_neg,
              (pp - (CASE WHEN mp < 0 THEN mp ELSE CAST(0 AS DECIMAL(38,6)) END)
                 > CAST(200.0 AS DECIMAL(18,6)))
              OR (pn - (CASE WHEN mn < 0 THEN mn ELSE CAST(0 AS DECIMAL(38,6)) END)
                 > CAST(200.0 AS DECIMAL(18,6))) AS alarm
       FROM mins""",
)
def e7_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/temporal (round 9): two-sided CUSUM drift detection (Page
    1954) over each user's event-value series — target 50, slack 5,
    alarm threshold 200.  The max(0, ...) recursion is rewritten as
    prefix-sum minus clamped prefix-min, so the whole statistic is two
    window functions over one group-keyed shuffle (no per-entity fold);
    increments are exact DECIMAL(18,6) per the numeric policy, so both
    cusum sides and the alarm are engine-exact
    (operators/temporal.cusum_flags)."""
    from .operators.temporal import cusum_flags

    ev = load_table(spark, sf_dir, "events")
    return cusum_flags(
        ev, group_col="user_id", ts_col="ts", value_col="value",
        order_cols=("event_id",), target=50.0, slack=5.0, threshold=200.0,
    ).select(
        "user_id", "ts", "event_id", "value",
        F.col("cusum_pos").cast("double").alias("cusum_pos"),
        F.col("cusum_neg").cast("double").alias("cusum_neg"),
        "alarm",
    )


@query(
    "e8_markov_transitions",
    """WITH seq AS (
         SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       pairs AS (SELECT prev_type AS from_type, event_type AS to_type,
                        count(*) AS n
                 FROM seq WHERE prev_type IS NOT NULL
                 GROUP BY 1, 2),
       tot AS (SELECT from_type, SUM(n) AS t FROM pairs GROUP BY 1)
       SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
              CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS prob
       FROM pairs p JOIN tot t USING (from_type)""",
)
def e8_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/temporal (round 9): first-order MARKOV TRANSITION MATRIX of
    the per-user event-type sequence — the path-analysis primitive
    behind funnel discovery and anomalous-flow detection.  One lag
    window over the (user, time)-ordered stream, one (from,to) count
    with map-side partials, one |types|²-bounded normalize join; prob
    is a single integer division, engine-exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type", "to_type", F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("t").cast("double")).alias("prob"),
    )


@query(
    "e9_acf_hourly",
    """WITH hc AS (SELECT event_type,
                          epoch_us(ts) // 3600000000 AS h,
                          count(*) AS v
               FROM events GROUP BY 1, 2),
       bounds AS (SELECT event_type, min(h) AS mn, max(h) AS mx
                  FROM hc GROUP BY 1),
       ax AS (SELECT event_type, unnest(range(mn, mx + 1)) AS h FROM bounds),
       dense AS (SELECT a.event_type, a.h, COALESCE(hc.v, 0) AS v
                 FROM ax a LEFT JOIN hc
                   ON hc.event_type = a.event_type AND hc.h = a.h),
       st AS (SELECT event_type, count(*) AS n, SUM(v) AS s
              FROM dense GROUP BY 1),
       c AS (SELECT d.event_type, d.h, st.n,
                    CAST(st.n AS HUGEINT) * d.v - st.s AS c
             FROM dense d JOIN st USING (event_type)),
       led AS (SELECT event_type, n, c,
                     LEAD(c, 1) OVER (PARTITION BY event_type ORDER BY h) AS l1,
                     LEAD(c, 2) OVER (PARTITION BY event_type ORDER BY h) AS l2,
                     LEAD(c, 3) OVER (PARTITION BY event_type ORDER BY h) AS l3,
                     LEAD(c, 4) OVER (PARTITION BY event_type ORDER BY h) AS l4,
                     LEAD(c, 5) OVER (PARTITION BY event_type ORDER BY h) AS l5,
                     LEAD(c, 6) OVER (PARTITION BY event_type ORDER BY h) AS l6,
                     LEAD(c, 7) OVER (PARTITION BY event_type ORDER BY h) AS l7,
                     LEAD(c, 8) OVER (PARTITION BY event_type ORDER BY h) AS l8,
                     LEAD(c, 9) OVER (PARTITION BY event_type ORDER BY h) AS l9,
                     LEAD(c, 10) OVER (PARTITION BY event_type ORDER BY h) AS l10,
                     LEAD(c, 11) OVER (PARTITION BY event_type ORDER BY h) AS l11,
                     LEAD(c, 12) OVER (PARTITION BY event_type ORDER BY h) AS l12,
                     LEAD(c, 13) OVER (PARTITION BY event_type ORDER BY h) AS l13,
                     LEAD(c, 14) OVER (PARTITION BY event_type ORDER BY h) AS l14,
                     LEAD(c, 15) OVER (PARTITION BY event_type ORDER BY h) AS l15,
                     LEAD(c, 16) OVER (PARTITION BY event_type ORDER BY h) AS l16,
                     LEAD(c, 17) OVER (PARTITION BY event_type ORDER BY h) AS l17,
                     LEAD(c, 18) OVER (PARTITION BY event_type ORDER BY h) AS l18,
                     LEAD(c, 19) OVER (PARTITION BY event_type ORDER BY h) AS l19,
                     LEAD(c, 20) OVER (PARTITION BY event_type ORDER BY h) AS l20,
                     LEAD(c, 21) OVER (PARTITION BY event_type ORDER BY h) AS l21,
                     LEAD(c, 22) OVER (PARTITION BY event_type ORDER BY h) AS l22,
                     LEAD(c, 23) OVER (PARTITION BY event_type ORDER BY h) AS l23,
                     LEAD(c, 24) OVER (PARTITION BY event_type ORDER BY h) AS l24
              FROM c),
       per AS (SELECT event_type, MAX(n) AS n, SUM(c * c) AS den,
                    SUM(c * l1) AS num1,
                    SUM(c * l2) AS num2,
                    SUM(c * l3) AS num3,
                    SUM(c * l4) AS num4,
                    SUM(c * l5) AS num5,
                    SUM(c * l6) AS num6,
                    SUM(c * l7) AS num7,
                    SUM(c * l8) AS num8,
                    SUM(c * l9) AS num9,
                    SUM(c * l10) AS num10,
                    SUM(c * l11) AS num11,
                    SUM(c * l12) AS num12,
                    SUM(c * l13) AS num13,
                    SUM(c * l14) AS num14,
                    SUM(c * l15) AS num15,
                    SUM(c * l16) AS num16,
                    SUM(c * l17) AS num17,
                    SUM(c * l18) AS num18,
                    SUM(c * l19) AS num19,
                    SUM(c * l20) AS num20,
                    SUM(c * l21) AS num21,
                    SUM(c * l22) AS num22,
                    SUM(c * l23) AS num23,
                    SUM(c * l24) AS num24
               FROM led GROUP BY 1)
       SELECT event_type, CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n, acf
       FROM (SELECT event_type, 1 AS lag, n, CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 2 AS lag, n, CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 3 AS lag, n, CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 4 AS lag, n, CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 5 AS lag, n, CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 6 AS lag, n, CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 7 AS lag, n, CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 8 AS lag, n, CAST(num8 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 9 AS lag, n, CAST(num9 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 10 AS lag, n, CAST(num10 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 11 AS lag, n, CAST(num11 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 12 AS lag, n, CAST(num12 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 13 AS lag, n, CAST(num13 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 14 AS lag, n, CAST(num14 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 15 AS lag, n, CAST(num15 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 16 AS lag, n, CAST(num16 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 17 AS lag, n, CAST(num17 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 18 AS lag, n, CAST(num18 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 19 AS lag, n, CAST(num19 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 20 AS lag, n, CAST(num20 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 21 AS lag, n, CAST(num21 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 22 AS lag, n, CAST(num22 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 23 AS lag, n, CAST(num23 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
         UNION ALL SELECT event_type, 24 AS lag, n, CAST(num24 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per)""",
)
def e9_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/temporal (round 9): sample AUTOCORRELATION (lags 1..24) of
    the hourly event-count series per event_type — the periodicity
    detector that picks seasonal_decompose's period (a daily cycle
    peaks at lag 24).  Centering scaled by n keeps every sum BIGINT
    and each acf one integer division — engine-exact
    (operators/temporal.acf_by_group)."""
    from .operators.temporal import acf_by_group

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    axis = (
        hc.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("h"))
    )
    dense = axis.join(hc, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    return acf_by_group(dense, "event_type", "h", "v", max_lag=24).select(
        "event_type", "lag", F.col("n").cast("long").alias("n"), "acf"
    )


@query(
    "e10_trend_ols",
    """WITH hc AS (SELECT event_type,
                          epoch_us(ts) // 3600000000 AS h,
                          count(*) AS v
               FROM events GROUP BY 1, 2),
       m AS (SELECT event_type, min(h) AS t0 FROM hc GROUP BY 1),
       base AS (SELECT hc.event_type, hc.h - m.t0 AS x, hc.v AS y
                FROM hc JOIN m USING (event_type)),
       per AS (SELECT event_type, count(*) AS n,
                      SUM(x) AS sx, SUM(y) AS sy,
                      SUM(x * y) AS sxy, SUM(x * x) AS sxx
               FROM base GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CASE WHEN n * sxx - sx * sx <> 0
                   THEN CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
              CASE WHEN n * sxx - sx * sx <> 0
                   THEN CAST(sy * sxx - sx * sxy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) END AS intercept
       FROM per""",
)
def e10_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/temporal (round 9): per-event_type OLS TREND of the hourly
    volume series — closed-form slope/intercept as ONE integer division
    each (all sums BIGINT), the drift detector beside cusum_flags'
    alarm view (operators/temporal.trend_ols_by_group)."""
    from .operators.temporal import trend_ols_by_group

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return trend_ols_by_group(hc, "event_type", "h", "v")


@query(
    "e4_resample_gapfill",
    """WITH sparse AS (
         SELECT event_type, date_trunc('hour', ts) AS bucket,
                COUNT(*) AS n,
                COUNT(value) AS n_vals,
                SUM(CAST(value AS DECIMAL(18,6))) AS s
         FROM events GROUP BY event_type, date_trunc('hour', ts)),
       span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                FROM sparse GROUP BY event_type),
       dense AS (SELECT event_type,
                        unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                            AS bucket
                 FROM span)
       SELECT d.event_type, d.bucket,
              COALESCE(sp.n, 0) AS n,
              COALESCE(sp.n_vals, 0) AS n_vals,
              COALESCE(CAST(sp.s AS DOUBLE), 0.0) AS sum_value
       FROM dense d LEFT JOIN sparse sp
         ON d.event_type = sp.event_type AND d.bucket = sp.bucket""",
)
def e4_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly resample per event_type with
    EVERY bucket of each group's span emitted — empty hours come back
    as n=0/sum=0 instead of silently disappearing (which corrupts any
    downstream lag/rolling-window computation).  The dense axis is
    generated per group from its own (min,max) aggregate via
    sequence+explode — no driver-side calendar, no global range — and
    joined back on the same (group, bucket) key.  See
    operators/temporal.resample_gapfill."""
    from .operators.temporal import resample_gapfill

    ev = load_table(spark, sf_dir, "events")
    out = resample_gapfill(ev, ts_col="ts", group_cols=["event_type"], value_col="value")
    return out.select("event_type", "bucket", "n", "n_vals", "sum_value")


@query(
    "e5_interpolate_linear",
    """WITH ev AS (SELECT * FROM events WHERE event_id % 7 = 0),
       sparse AS (
         SELECT event_type, date_trunc('hour', ts) AS bucket,
                COUNT(*) AS n, COUNT(value) AS n_vals,
                SUM(CAST(value AS DECIMAL(18,6))) AS s
         FROM ev GROUP BY event_type, date_trunc('hour', ts)),
       span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                FROM sparse GROUP BY event_type),
       dense AS (SELECT event_type,
                        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
                 FROM span),
       base AS (
         SELECT d.event_type, d.bucket,
                COALESCE(sp.n, 0) AS n,
                COALESCE(sp.n_vals, 0) AS n_vals,
                CASE WHEN COALESCE(sp.n_vals, 0) > 0
                     THEN CAST(sp.s AS DOUBLE) / CAST(sp.n_vals AS DOUBLE) END AS obs,
                CAST(epoch(d.bucket) AS DOUBLE) AS ep
         FROM dense d LEFT JOIN sparse sp
           ON d.event_type = sp.event_type AND d.bucket = sp.bucket),
       w AS (
         SELECT *,
           last_value(obs IGNORE NULLS) OVER
             (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           first_value(obs IGNORE NULLS) OVER
             (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           last_value(CASE WHEN obs IS NOT NULL THEN ep END IGNORE NULLS) OVER
             (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
           first_value(CASE WHEN obs IS NOT NULL THEN ep END IGNORE NULLS) OVER
             (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
         FROM base)
       SELECT event_type, bucket, n, n_vals,
              CASE WHEN obs IS NOT NULL THEN obs
                   ELSE pv + (nv - pv) * ((ep - pt) / (nt - pt)) END
                  AS value_interp
       FROM w""",
)
def e5_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauge-series linear interpolation over a sparsified event stream
    (1-in-7 events kept, so hourly gaps genuinely occur): empty buckets
    take the time-weighted blend of their nearest observed neighbors;
    edges stay NULL.  Anchors are decimal-exact sums cast to double, so
    the lerp is a deterministic IEEE expression both engines evaluate
    bit-for-bit.  One resample shuffle + two single-row-state ordered
    windows per group (see operators/temporal.interpolate_linear)."""
    from .operators.temporal import interpolate_linear

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    out = interpolate_linear(ev, "ts", ["event_type"], "value")
    return out.select("event_type", "bucket", "n", "n_vals", "value_interp")


def _e3_zorder_oracle() -> str:
    from .operators.layout import zorder_key_sql

    zsql = zorder_key_sql(
        [
            ("o_custkey", 0, 150000),
            ("(CAST(o_orderdate AS DATE) - DATE '1970-01-01')", 9100, 11600),
        ],
        bits=16,
    )
    return f"SELECT o_orderkey, {zsql} AS zkey FROM orders"


@query("e3_zorder_key", _e3_zorder_oracle())
def e3_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout op: the Morton (Z-order) clustering key over
    (o_custkey, order day) — the Delta/Iceberg OPTIMIZE ZORDER layout.
    Sorting files by this ONE key gives BOTH columns file-level
    locality, so min/max skipping (AcidTable.scan, parquet row-group
    stats) prunes a customer-range AND a date-range predicate; a linear
    sort only ever prunes its leading column.  Key construction is an
    unrolled shift/mask OR chain of built-in expressions — integer-exact,
    engine-portable (the oracle replays the identical bit math), narrow,
    inside whole-stage codegen.  Pruning effectiveness is asserted in
    test_acid_table (Z layout prunes both dimensions; linear layout
    fails the non-leading one)."""
    from .operators.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01")))
    key = zorder_key([(F.col("o_custkey"), 0, 150000), (days, 9100, 11600)], bits=16)
    return orders.select("o_orderkey", key.alias("zkey"))


@query(
    "w2_exact_percentiles",
    """SELECT l_returnflag,
              median(l_quantity) AS median_qty,
              quantile_cont(l_quantity, 0.9) AS p90_qty,
              quantile_cont(l_extendedprice, 0.5) AS median_price
       FROM lineitem GROUP BY l_returnflag""",
)
def w2_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percentiles (median, p90) per group via Spark's
    ``percentile`` aggregate — both engines sort-and-interpolate in IEEE
    doubles, so values match bit-for-bit.  Scale note: exact percentile
    buffers each group's values; at 100 TB switch to
    ``approx_percentile`` (t-digest, mergeable map-side) and accept the
    documented error bound — the exact form here is the oracle-checkable
    baseline of that scale path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


@query(
    "b1_bucketed_join_revenue",
    """SELECT o_orderpriority,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_items
       FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
)
def b1_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-to-fact join: orders and lineitem are
    written bucketed (and bucket-sorted) by order key, then joined with
    ZERO exchanges on either side (plan-asserted in
    test_plan_regressions) — the layout investment that stops a 100 TB
    pipeline re-shuffling both fact tables on every join.  Result equals
    the plain shuffled join, which is what the oracle computes."""
    import shutil
    import tempfile
    import uuid

    from .operators.bucketed import bucketed_join, write_bucketed

    tag = uuid.uuid4().hex[:8]
    warehouse = tempfile.mkdtemp(prefix="bdmc_buckets_")
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            t_orders, ["o_orderkey"], n_buckets=8, path=f"{warehouse}/orders",
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            t_lineitem, ["l_orderkey"], n_buckets=8, path=f"{warehouse}/lineitem",
        )
        joined = bucketed_join(
            spark, t_lineitem, t_orders,
            on=[F.col("l_orderkey") == F.col("o_orderkey")],  # type: ignore[list-item]
        )
        out = joined.groupBy("o_orderpriority").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        out = _detach(out)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
        shutil.rmtree(warehouse, ignore_errors=True)
    return out


@query(
    "stream_sessionize",
    """WITH m AS (SELECT user_id, ts,
                         CASE WHEN lag(ts) OVER w IS NULL
                                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                   > 1800000000
                              THEN 1 ELSE 0 END AS ns
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       s AS (SELECT user_id, ts,
                    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sn
             FROM m),
       agg AS (SELECT user_id, sn,
                      min(ts) AS session_start, max(ts) AS session_end,
                      CAST(count(*) AS INT) AS n_events
               FROM s GROUP BY user_id, sn)
       SELECT user_id, session_start, session_end, n_events
       FROM agg
       WHERE sn < (SELECT max(sn) FROM agg a2 WHERE a2.user_id = agg.user_id)""",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: the applyInPandasWithState custom stateful sessionizer run as
    a real stream over a chronologically-landed feed.  The operator emits
    CLOSED sessions only (a session closes when a later event proves the
    gap) — exactly the sessions that are NOT each user's last, which is
    what the batch oracle computes via lag/run-sum + anti-max filter.
    Matching the streaming state machine against an independent batch
    formulation is the strongest check this operator can get."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import run_stream_to_memory, sessionize, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_sess_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_sessions"
    try:
        ev = load_table(spark, sf_dir, "events")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 4
        for i in range(4):
            a = lo + i * span
            b = hi if i == 3 else lo + (i + 1) * span
            cond = (F.col("ts") >= a) & ((F.col("ts") <= b) if i == 3 else (F.col("ts") < b))
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        stream = stream_events(spark, landing, max_files_per_trigger=1)
        run_stream_to_memory(sessionize(stream), qname)
        out = spark.table(qname)
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "n4_bpe_token_count",
    r"""SELECT doc_id,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n]+'))
                  AS n_bpe_tokens
       FROM documents""",
)
def n4_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: BPE-style pre-tokenization count (word/number/punct boundary
    regex, the GPT-2 pre-tokenizer family) — the LLM-token estimator that
    complements whitespace counting in n4_token_stats.  Oracle recomputes
    the same boundaries with DuckDB's RE2."""
    from .operators.text import bpe_ish_tokens

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(bpe_ish_tokens(F.col("text"))).alias("n_bpe_tokens")
    )


# ---------------------------------------------------------------------------
# §2.3/§2.4 free capabilities, widened: TPC-H-style multi-join / correlated /
# semi-join queries over the fixture tables (no partsupp in the fixtures, so
# q2/q9/q11/q16/q20 are out of scope).  Shared ANSI text: Catalyst and DuckDB
# plan the identical logical query — the point is the PLAN (broadcast dims,
# partial aggs, semi-join pushdown), not the SQL.
# ---------------------------------------------------------------------------

shared_sql(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
              CAST(SUM(volume) AS DOUBLE) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
                    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume
             FROM supplier s
             JOIN lineitem l ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
       GROUP BY supp_nation, cust_nation, l_year""",
)

shared_sql(
    "q8_market_share",
    """SELECT o_year,
              CAST(COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume END) AS DOUBLE), 0.0)
                   / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
       FROM (SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume,
                    n2.n_name AS nation
             FROM part p
             JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
             JOIN region r ON n1.n_regionkey = r.r_regionkey
             JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
             WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO') all_nations
       GROUP BY o_year""",
)

shared_sql(
    "q13_cust_order_distribution",
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
             FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             GROUP BY c.c_custkey) c_orders
       GROUP BY c_count""",
)

shared_sql(
    "q14_promo_revenue",
    """SELECT CAST(CAST(100 AS DOUBLE)
                   * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                   THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                              END) AS DOUBLE)
                   / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
              AS DOUBLE) AS promo_revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'""",
)

shared_sql(
    "q15_top_supplier",
    """WITH revenue0 AS (
           SELECT l_suppkey AS supplier_no,
                  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name,
              CAST(r.total_revenue AS DOUBLE) AS total_revenue
       FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)""",
)

shared_sql(
    "q17_small_qty_revenue",
    """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(7 AS DOUBLE) AS DOUBLE) AS avg_yearly
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#1'
         AND l.l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                                           / COUNT(*))
                             FROM lineitem l2
                             WHERE l2.l_partkey = l.l_partkey)""",
)

shared_sql(
    "q18_large_volume_customers",
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
              CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
              CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
       GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice""",
)

# q12/q19/q21/q22 below are the TPC-H patterns RESHAPED onto the slimmed
# testdata schema (no shipmode/commitdate/receiptdate/phone columns):
# the operator shapes — conditional-count join, multi-OR pushdown join,
# correlated EXISTS/NOT-EXISTS pair, scalar-subquery filter + anti-join —
# are preserved on the available columns.

shared_sql(
    "q12_priority_linecounts",
    """SELECT l_returnflag,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate < o_orderdate + INTERVAL 90 DAY
       GROUP BY l_returnflag""",
)

shared_sql(
    "q19_discounted_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 20)""",
)

shared_sql(
    "q21_exists_antiexists",
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE o_orderstatus = 'F'
         AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY s_name""",
)

shared_sql(
    "q22_sales_opportunity",
    """WITH avg_bal AS (
         SELECT AVG(CAST(c_acctbal AS DECIMAL(18,6))) AS a
         FROM customer WHERE c_acctbal > 0.0
       )
       SELECT c_nationkey,
              COUNT(*) AS numcust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
       FROM customer, avg_bal
       WHERE c_acctbal > a
         AND (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) < 6
       GROUP BY c_nationkey""",
)


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) and skew-safe aggregation
# (operators/skew.py) — engine scale ops beyond the reference surface.
# ---------------------------------------------------------------------------

@query(
    "t1_asof_last_purchase",
    """SELECT c.event_id, c.user_id, c.ts,
              p.ts AS purchase_ts, p.value AS purchase_value
       FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN
            (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
       ON c.user_id = p.user_id AND p.ts <= c.ts""",
)
def t1_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event annotated with the user's most recent
    purchase at-or-before the click.  Spark side is the union-tag +
    running-last window implementation (one shuffle, no per-key cross
    product); oracle is DuckDB's native ASOF LEFT JOIN."""
    from .operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, on="user_id", right_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


@query(
    "t3_asof_next_purchase",
    """SELECT c.event_id, c.user_id, c.ts,
              p.ts AS purchase_ts, p.value AS purchase_value
       FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN
            (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
       ON c.user_id = p.user_id AND p.ts >= c.ts""",
)
def t3_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click annotated with the user's next
    purchase at-or-after the click — the attribution-window direction
    (did the click convert?).  Same union-tag single-sweep plan as t1,
    mirrored: first-over-[current, following] window, one shuffle, no
    per-key cross product; oracle is DuckDB's native forward ASOF
    (p.ts >= c.ts)."""
    from .operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, on="user_id", right_cols=["value"], direction="forward"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


@query(
    "p9_small_cell_suppression",
    """WITH g AS (SELECT CAST(c_nationkey AS INT) AS nationkey,
                         c_mktsegment AS segment, COUNT(*) AS n,
                         SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s
                  FROM customer GROUP BY 1, 2),
       kept_pre AS (SELECT * FROM g WHERE n >= 10),
       small AS (SELECT * FROM g WHERE n < 10),
       trig AS (SELECT COUNT(*) > 0
                       AND (COUNT(*) = 1 OR COALESCE(SUM(n), 0) < 10) AS t
                FROM small),
       victim AS (SELECT n AS vn, nationkey AS vkey, segment AS vseg
                  FROM kept_pre ORDER BY n, nationkey, segment LIMIT 1),
       dec AS (SELECT t.t, v.vn, v.vkey, v.vseg
               FROM trig t LEFT JOIN victim v ON TRUE),
       kept AS (SELECT k.* FROM kept_pre k CROSS JOIN dec d
                WHERE NOT (d.t AND k.n = d.vn AND k.nationkey = d.vkey
                           AND k.segment = d.vseg)),
       moved AS (SELECT k.* FROM kept_pre k CROSS JOIN dec d
                 WHERE d.t AND k.n = d.vn AND k.nationkey = d.vkey
                       AND k.segment = d.vseg),
       bucket_src AS (SELECT * FROM small UNION ALL SELECT * FROM moved)
       SELECT nationkey, segment, CAST(n AS BIGINT) AS n_customers,
              CAST(s AS DOUBLE) AS total_acctbal
       FROM kept
       UNION ALL
       SELECT CAST(-1 AS INT), 'SUPPRESSED', CAST(SUM(n) AS BIGINT),
              CAST(SUM(s) AS DOUBLE)
       FROM bucket_src HAVING COUNT(*) > 0""",
)
def p9_small_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 extended to aggregates: k-anonymity small-cell suppression —
    released (nation, segment) cells with fewer than 10 customers are
    withheld and rolled into one complementary SUPPRESSED bucket, so no
    re-identifiable group leaks through the report while grand totals
    still reconcile (the census small-cell rule; the reference's
    zero-FK blanking P4 is the row-level sibling).  One aggregation
    over the data; the k-filter and roll-up touch only the groups-sized
    frame."""
    from .operators.validation import suppress_small_groups

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
    )
    return suppress_small_groups(
        cust,
        group_cols=["nationkey", "segment"],
        k=10,
        sum_col="c_acctbal",
        other_keys={"nationkey": -1, "segment": "SUPPRESSED"},
        n_col="n_customers",
        sum_out="total_acctbal",
    )


@query(
    "j7_scd2_dimension_lookup",
    """WITH dimv AS (
         SELECT c_custkey, c_mktsegment AS segment,
                CAST('1992-01-01 00:00:00' AS TIMESTAMP) AS eff_from
         FROM customer
         UNION ALL
         SELECT c_custkey, 'UPGRADED',
                CAST('1995-01-01 00:00:00' AS TIMESTAMP)
         FROM customer WHERE c_custkey % 3 = 0),
       f AS (SELECT o_orderkey, o_custkey,
                    CAST(o_orderdate AS TIMESTAMP) AS ots
             FROM orders)
       SELECT f.o_orderkey, f.o_custkey, d.segment AS segment_at_order
       FROM f ASOF LEFT JOIN dimv d
         ON f.o_custkey = d.c_custkey AND d.eff_from <= f.ots""",
)
def j7_scd2_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension lookup: facts join the dimension VERSION in
    effect at the fact's own date — the temporal upgrade of the
    reference's J1 lookup (Codeunit 60000:894-922 always reads the
    current row, which silently rewrites history when a dimension
    changes).  The versioned dim here gives every customer a base
    version and upgrades a third of them in 1995; each order picks the
    version live at its order date via the as-of sweep (one shuffle, no
    per-key cross product, no effective-range blowup join).  Oracle:
    DuckDB native ASOF over the same versioned dim."""
    from .operators.temporal import asof_join

    cust = load_table(spark, sf_dir, "customer")
    base_v = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01 00:00:00").cast("timestamp").alias("eff_from"),
    )
    upg_v = (
        cust.where(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.lit("UPGRADED").alias("segment"),
            F.lit("1995-01-01 00:00:00").cast("timestamp").alias("eff_from"),
        )
    )
    dimv = base_v.unionByName(upg_v)
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
    )
    out = asof_join(
        facts,
        dimv.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        left_ts="ots",
        right_ts="eff_from",
        right_cols=["segment"],
    )
    return out.select(
        "o_orderkey", "o_custkey", F.col("segment_asof").alias("segment_at_order")
    )


@query(
    "t2_range_join_pairs",
    """SELECT a.event_id AS l_event, a.user_id AS user_id,
              b.event_id AS r_event,
              date_diff('microsecond', a.ts, b.ts) AS delta_us
       FROM events a JOIN events b ON a.user_id = b.user_id
       WHERE b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""",
)
def t2_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval self-join: same-user event pairs within the hour
    after each event.  Spark side is the time-bucketed equi-join (work
    bounded by pairs-in-window); oracle is the naive inequality join,
    affordable at sf0.01."""
    from .operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    pairs = range_join(ev, ev, on="user_id", lower_us=0, upper_us=3_600_000_000)
    return pairs.select(
        F.col("event_id").alias("l_event"),
        "user_id",
        F.col("event_id_r").alias("r_event"),
        "delta_us",
    )


@query(
    "x7_skew_salted_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_suppliers
       FROM lineitem GROUP BY l_returnflag""",
)
def x7_skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per skewed low-cardinality key via two-phase
    pair-dedup + partial-counted rollup (2 exchanges; a plain distinct-agg
    plans 3 and funnels each key's final dedup through one partition).
    The 3-value l_returnflag key is exactly the shape that straggles at
    100 TB."""
    from .operators.skew import skew_safe_count_distinct

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_suppkey")
    return skew_safe_count_distinct(li, "l_returnflag", "l_suppkey", out="n_suppliers")


@query(
    "x8_salted_sum",
    """SELECT l_returnflag,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
       FROM lineitem GROUP BY l_returnflag""",
)
def x8_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-salt two-phase sum for skewed grouping keys: the salt is
    derived from row CONTENT (xxhash64 of all columns), so replayed tasks
    after a shuffle-fetch failure land rows in the same (key, salt)
    partial groups — deterministic under fault recovery, unlike a
    monotonically_increasing_id salt.  Decimal-cast before summing keeps
    the result order-independent and cross-engine exact."""
    from .operators.skew import salted_sum

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum(
        li.select("l_returnflag", "l_quantity", "l_extendedprice"),
        "l_returnflag",
        {
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,6)")),
            "sum_price": F.sum(F.col("l_extendedprice").cast("decimal(18,6)")),
        },
    )
    # DecimalRenderPolicy: exact decimal inside, DOUBLE at the edge
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@query(
    "x9_heavy_hitters",
    """WITH t AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN -1
                              ELSE l_suppkey END AS skey
              FROM lineitem),
       tot AS (SELECT COUNT(*) AS n FROM t),
       g AS (SELECT skey, COUNT(*) AS cnt FROM t GROUP BY skey)
       SELECT skey, cnt FROM g, tot WHERE cnt >= CEIL(0.05 * n)""",
)
def x9_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale op: EXACT heavy hitters by sketch-then-verify.  A synthetic
    hot key (-1 absorbs ~30% of lineitem) stands in for the web-scale
    long tail; `frequent_keys` finds every key holding >= 5% of rows
    WITHOUT a full-key shuffle — Karp frequent-items sketch (superset
    guarantee, driver state <= 1/frac items) then an exact pushed-down
    recount of the candidates only.  The oracle computes the same set
    the expensive way (full GROUP BY + HAVING), proving the two-pass
    answer exact.  This is also the hot-key diagnosis that nominates
    salting candidates for x7/x8."""
    from .operators.skew import frequent_keys

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(-1))
        .otherwise(F.col("l_suppkey"))
        .alias("skey")
    )
    return frequent_keys(li, "skey", 0.05).select("skey", "cnt")


def _bloom_oracle_sql(m_bits: int, k: int, salt: str) -> str:
    """DuckDB replay of the portable Bloom semi-join (see operators/bloom):
    the set bits are DISTINCT positions over build keys x k, a candidate
    is a probe row whose k positions all land in that set, and the exact
    matches are re-counted among the candidates only — the same prune->
    verify shape the Spark side runs."""
    from .operators.bloom import hash_pair_sql, positions_sql

    bh1, bh2 = hash_pair_sql("key", salt)
    ph1, ph2 = hash_pair_sql("o_custkey", salt)
    pos = positions_sql("h1", "h2", m_bits, k)
    return f"""WITH bk AS (SELECT c_custkey AS key FROM customer
                     WHERE c_mktsegment = 'BUILDING'),
       bh AS (SELECT key, {bh1} AS h1, {bh2} AS h2 FROM bk),
       bpos AS (SELECT DISTINCT {pos} AS pos FROM bh, range({k}) t(i)),
       ph AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                     {ph1} AS h1, {ph2} AS h2 FROM orders),
       pp AS (SELECT o_orderkey, {pos} AS pos FROM ph, range({k}) t(i)),
       cand AS (SELECT o_orderkey
                FROM pp LEFT JOIN (SELECT pos, 1 AS hit FROM bpos) b
                     ON pp.pos = b.pos
                GROUP BY o_orderkey
                HAVING SUM(CASE WHEN b.hit IS NULL THEN 1 ELSE 0 END) = 0),
       c2 AS (SELECT ph.o_orderkey, ph.o_custkey, ph.o_orderpriority
              FROM ph JOIN cand USING (o_orderkey))
       SELECT o_orderpriority,
              COUNT(*) AS bloom_candidates,
              CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM bk
                                         WHERE bk.key = c2.o_custkey)
                            THEN 1 ELSE 0 END) AS BIGINT) AS exact_matches
       FROM c2 GROUP BY o_orderpriority"""


@query("x10_bloom_semijoin", _bloom_oracle_sql(4080, 3, "x10"))
def x10_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale op: semi-join through a CONSTANT-size runtime filter.  j5
    broadcasts exact parent-key sets — right while the parent fits in
    memory; when the build side is 10^9+ keys, the Bloom bitmap caps the
    shipped state at m_bits regardless of build cardinality, the probe
    stays a NARROW plan-literal filter folded into the scan (no join, no
    shuffle before the prune), and the exact verify join moves
    candidates only.  False negatives are impossible, so prune+verify is
    value-identical to the plain semi-join.  The filter here is sized
    small (m=4080, k=3) so false positives are OBSERVABLE: the result
    reports per-priority candidate counts next to exact-match counts,
    and the oracle replays the identical double-hash bit positions from
    portable md5 arithmetic — the candidate sets agree bit-for-bit
    across engines."""
    from .operators.bloom import bloom_build, bloom_member

    m_bits, k, salt = 4080, 3, "x10"
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    words = bloom_build(cust, "c_custkey", m_bits, k, salt)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cand = orders.where(bloom_member(F.col("o_custkey"), words, m_bits, k, salt))
    keys = cust.select("c_custkey").where(F.col("c_custkey").isNotNull())
    return (
        cand.join(
            F.broadcast(keys), cand["o_custkey"] == keys["c_custkey"], "left"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("bloom_candidates"),
            F.count("c_custkey").alias("exact_matches"),
        )
    )


@query(
    "n5_domain_cap",
    f"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS sp
                   FROM documents),
       x AS (SELECT doc_id, source,
                    CAST(len(sp) AS DOUBLE) AS n,
                    CAST(len(list_distinct(sp)) AS DOUBLE) AS nu,
                    CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL})) AS DOUBLE) AS ns
             FROM t),
       q AS (SELECT doc_id, source,
                    (least(n, 100.0)/100.0*4.0 + nu/n*4.0
                         + least(ns/n*5.0, 1.0)*2.0)/10.0 AS quality
             FROM x),
       r AS (SELECT doc_id, source, quality,
                    CAST(ROW_NUMBER() OVER (
                        PARTITION BY source
                        ORDER BY COALESCE(quality, -1.0) DESC, doc_id) AS INT)
                        AS domain_rank
             FROM q)
       SELECT doc_id, source, quality, domain_rank
       FROM r WHERE domain_rank <= 10""",
)
def n5_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: per-domain contribution cap (Gopher/FineWeb curation) — keep
    the 10 highest-quality documents per source so one over-crawled
    domain can't dominate the training mixture.  ROW_NUMBER + rank filter
    compiles to WindowGroupLimit: map tasks pre-prune each domain to its
    top 10 BEFORE the shuffle, so the exchange moves O(domains × cap)
    rows, not the corpus.  Quality is the shared all-double formula the
    oracle replays exactly (n4_quality_score)."""
    from .operators.sampling import domain_cap
    from .operators.text import quality_col, with_tokens

    # hoist the token array as a materialized attribute (with_tokens):
    # passing a raw tokens() expression re-runs the tokenizer regex at
    # every reference inside quality_col (see its docstring)
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", "source", quality_col("text", toks=F.col("__toks")).alias("quality")
    )
    capped = domain_cap(
        scored,
        domain_col="source",
        cap=10,
        order_cols=[F.coalesce(F.col("quality"), F.lit(-1.0)).desc()],
        id_col="doc_id",
    )
    return capped.select("doc_id", "source", "quality", "domain_rank")


@query(
    "n5_stratified_sample",
    """WITH r AS (
         SELECT doc_id, source, lang,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY source, lang
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 6),
                             doc_id) AS INT) AS strat_rank
         FROM documents)
       SELECT doc_id, source, lang, strat_rank
       FROM r WHERE strat_rank <= 5""",
)
def n5_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: exact-size stratified sample — exactly min(5, |cell|) documents
    per (source, lang) cell, chosen uniformly by a portable md5 draw and
    deterministic across engines/cluster sizes/reruns (the balanced
    eval-set builder; Bernoulli sampleBy can only promise an EXPECTED
    count and shifts with seed and partitioning).  ROW_NUMBER over the
    hash order compiles to WindowGroupLimit: map tasks pre-prune every
    cell to its top 5 before the shuffle, so the exchange moves
    O(cells x 5) rows, not the corpus."""
    from .operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs.select("doc_id", "source", "lang"),
        strata_cols=["source", "lang"],
        n_per_stratum=5,
        id_col="doc_id",
    )
    return out.select("doc_id", "source", "lang", "strat_rank")


def _n5_weighted_sample_oracle() -> str:
    from .operators.sampling import hash_unit_draw_sql

    u = hash_unit_draw_sql("doc_id", "wsamp")
    return f"""WITH tot AS (SELECT CAST(SUM(CAST(n_chars AS DECIMAL(18,6)))
                                        AS DOUBLE) AS W FROM documents)
       SELECT doc_id, source, n_chars FROM documents, tot
       WHERE {u} * W < 50.0 * CAST(n_chars AS DOUBLE)"""


@query("n5_weighted_sample", _n5_weighted_sample_oracle())
def n5_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: weight-proportional Poisson sample, expected 50 documents
    drawn with probability proportional to length (importance sampling
    for corpus mixtures — long/high-quality docs drawn more often).
    The draw is a NUMERIC portable hash (md5 prefix as an integer), so
    the per-row threshold can depend on the row's own weight and the
    oracle still replays the exact selected set via digit-expansion
    SQL.  One total-weight aggregate broadcast as a 1-row frame + a
    narrow filter folded into the scan — the data itself never
    shuffles."""
    from .operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", target_n=50.0)


@query(
    "n5_leakage_safe_split",
    """WITH s AS (SELECT doc_id, source,
                         CASE WHEN substr(md5(CAST(source AS VARCHAR) || 'gsplit'), 1, 6)
                                   < '0ccccd' THEN 'val'
                              WHEN substr(md5(CAST(source AS VARCHAR) || 'gsplit'), 1, 6)
                                   < '19999a' THEN 'test'
                              ELSE 'train' END AS split
                  FROM documents)
       SELECT source, split, COUNT(*) AS n_docs
       FROM s GROUP BY source, split""",
)
def n5_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: GROUP-keyed train/val/test split — the leakage guard: near-
    duplicate documents cluster within a source/domain, so splitting on
    doc_id would leak train material into eval; hashing the GROUP key
    instead sends every document of a source to the same split.  The
    invariant the oracle pins: each source maps to exactly one split
    (every (source, split) cell is a whole source).  Same narrow
    portable-md5 draw as deterministic_split — no shuffle for the
    assignment; one aggregation for the report."""
    from .operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = deterministic_split(
        docs,
        id_col="source",  # group key, not row key: the whole point
        weights={"val": 0.05, "test": 0.05, "train": 0.9},
        salt="gsplit",
    )
    return out.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n_docs"))


def _n5_token_budget_oracle() -> str:
    from .operators.sampling import hash_unit_draw_sql

    u = hash_unit_draw_sql("doc_id", "budget")
    return f"""WITH t AS (SELECT doc_id, source,
                                 len(string_split(text, ' ')) AS nt
                          FROM documents),
       tot AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS T
               FROM t GROUP BY source),
       j AS (SELECT t.doc_id, t.source, t.nt, tot.T,
                    CASE t.source WHEN 'src0' THEN 2000.0
                                  WHEN 'src1' THEN 600.0
                                  ELSE 400.0 END AS thr
             FROM t JOIN tot USING (source)),
       kept AS (SELECT * FROM j WHERE {u} * CAST(T AS DOUBLE) < thr)
       SELECT source,
              COUNT(*) AS kept_docs,
              CAST(SUM(nt) AS BIGINT) AS kept_tokens,
              MIN(LEAST(1.0, thr / CAST(T AS DOUBLE))) AS rate
       FROM kept GROUP BY source"""


@query("n5_token_budget_sample", _n5_token_budget_oracle())
def n5_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: per-source TOKEN-budget sampling — the mixture-curation op
    that turns "~2000 tokens of src0, ~600 of src1, ~400 of everything
    else" into keep decisions: each group keeps rows with probability
    min(1, target/T_group), so kept token mass lands on the target in
    expectation (src0's target exceeds its total, exercising the
    keep-everything cap).  The numeric portable draw lets the per-row
    threshold depend on a per-GROUP aggregate and still replay
    bit-for-bit in DuckDB (u*T < target: fixed operand order).  One
    groups-sized aggregation broadcast back + a narrow filter — the
    corpus never shuffles."""
    from .operators.sampling import token_budget_sample
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).alias("nt")
    )
    targets = {"src0": 2000.0, "src1": 600.0}
    kept = token_budget_sample(
        docs, "doc_id", "source", F.col("nt"), targets, default_target=400.0
    )
    tot = docs.groupBy("source").agg(F.sum(F.col("nt").cast("long")).alias("T"))
    thr = (
        F.when(F.col("source") == "src0", F.lit(2000.0))
        .when(F.col("source") == "src1", F.lit(600.0))
        .otherwise(F.lit(400.0))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(F.col("nt").cast("long")).alias("kept_tokens"),
        )
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            "kept_docs",
            "kept_tokens",
            F.least(F.lit(1.0), thr / F.col("T").cast("double")).alias("rate"),
        )
    )


@query(
    "n5_zscore_features",
    """WITH st AS (
         SELECT source, COUNT(*) AS n,
                SUM(CAST(n_chars AS DECIMAL(28,6))) AS s,
                SUM(CAST(n_chars AS DECIMAL(28,6))
                    * CAST(n_chars AS DECIMAL(28,6))) AS ss
         FROM documents GROUP BY source)
       SELECT d.doc_id, d.source,
              CASE WHEN st.n > 1
                        AND (CAST(st.ss AS DOUBLE)
                             - CAST(st.s AS DOUBLE)
                               * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
                            / (CAST(st.n AS DOUBLE) - 1.0) > 0
                   THEN (CAST(d.n_chars AS DOUBLE)
                         - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                        / sqrt((CAST(st.ss AS DOUBLE)
                                - CAST(st.s AS DOUBLE)
                                  * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
                               / (CAST(st.n AS DOUBLE) - 1.0))
              END AS zscore
       FROM documents d JOIN st ON d.source = st.source""",
)
def n5_zscore_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: per-source z-score of document length — feature
    normalization so a length/quality threshold is fair RELATIVE to
    each source's own distribution before mixing heterogeneous
    sources.  Moments aggregate in exact decimal; mean/variance/sqrt
    are a fixed IEEE sequence (sqrt is correctly rounded, unlike
    ln/pow), so the oracle replays the scores bit-for-bit.  One
    aggregation shuffle + a broadcast of the groups-sized stats."""
    from .operators.sampling import standardize_by_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = standardize_by_group(docs, "source", "n_chars")
    return out.select("doc_id", "source", "zscore")


@query(
    "n5_winsorize",
    """WITH b AS (SELECT source,
                         quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS lo,
                         quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS hi
                  FROM documents GROUP BY source)
       SELECT d.doc_id, d.source,
              CAST(LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), b.lo), b.hi)
                   AS DOUBLE) AS clipped_len
       FROM documents d JOIN b USING (source)""",
)
def n5_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: per-source winsorization of document length — clip each
    source's length feature to its own [p5, p95] before mixing, so one
    source's outliers can't dominate a shared threshold.  EXACT
    interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, the equality w2 pins), broadcast bounds, narrow
    clip folded into the scan."""
    from .operators.sampling import winsorize_by_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = winsorize_by_group(docs, "source", "n_chars", lo=0.05, hi=0.95, out="clipped_len")
    return out.select("doc_id", "source", "clipped_len")


@query(
    "w2b_approx_percentiles_bounded",
    """SELECT l_returnflag, TRUE AS median_in_bound, TRUE AS p90_in_bound
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def w2b_approx_percentiles_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of w2_exact_percentiles: ``approx_percentile``
    (Greenwald-Khanna sketch — bounded memory, mergeable map-side, one
    pass) instead of exact percentile (which buffers every group value).

    Oracle pattern (same as ann_ivf_recall): the approximate VALUE is not
    portable across engines, but its published guarantee IS — GK with
    ``accuracy`` a returns an element whose rank is within n/a of the
    target rank.  The query verifies that guarantee in rank space,
    tie-robust (an element's rank is the interval [count_lt+1, count_le],
    which must intersect target ± n/a), and emits per-group booleans the
    oracle pins to TRUE.  A sketch regression breaks the row, not just a
    tolerance feeling."""
    acc = 1000
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    approx = li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_quantity, 0.5, {acc})").alias("amed"),
        F.expr(f"approx_percentile(l_quantity, 0.9, {acc})").alias("ap90"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.count(F.when(F.col("l_quantity") < F.col("amed"), 1)).alias("lt_med"),
            F.count(F.when(F.col("l_quantity") <= F.col("amed"), 1)).alias("le_med"),
            F.count(F.when(F.col("l_quantity") < F.col("ap90"), 1)).alias("lt_p90"),
            F.count(F.when(F.col("l_quantity") <= F.col("ap90"), 1)).alias("le_p90"),
        )
    )
    # rank tolerance: n/acc from the GK guarantee PLUS 1 for the
    # rank-rounding ambiguity of the target itself (the p-th percentile
    # "rank" p*n is fractional; an exactly-correct answer sits at
    # ceil(p*n), up to 1 above p*n — without the +1, a group with
    # odd n (e.g. n=101, p=0.5: exact median has lt=50, bound 50.601)
    # flags a perfect sketch as out-of-bound)
    eps = F.col("n") / F.lit(acc) + F.lit(1.0)

    def in_bound(lt, le, p):
        target = F.col("n") * F.lit(p)
        return (F.col(lt) + 1 <= target + eps) & (F.col(le) >= target - eps)

    return ranks.select(
        "l_returnflag",
        in_bound("lt_med", "le_med", 0.5).alias("median_in_bound"),
        in_bound("lt_p90", "le_p90", 0.9).alias("p90_in_bound"),
    ).orderBy("l_returnflag")




@query(
    "s13_merge_upsert",
    """WITH delta AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                             o_totalprice * 2 AS o_totalprice,
                             o_orderdate, o_orderpriority
                      FROM orders WHERE o_orderkey % 100 = 0)
       SELECT * FROM delta
       UNION ALL
       SELECT o.* FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM delta d
                         WHERE d.o_orderkey = o.o_orderkey)""",
)
def s13_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/A7 upsert semantics as a pure DataFrame MERGE: a delta batch
    (every 100th order, repriced) replaces matching-PK rows and would
    insert unmatched ones.  The base side anti-joins only the delta's PK
    projection (broadcast for small deltas — the base never shuffles)."""
    from .operators.upsert import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    delta = o.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    return merge_upsert(o, delta, ["o_orderkey"])


@query(
    "s13c_acid_merge_timetravel",
    """WITH delta AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 100 = 0),
       v1 AS (SELECT o.o_orderkey,
                     COALESCE(d.o_totalprice, o.o_totalprice) AS p
              FROM orders o LEFT JOIN delta d ON d.o_orderkey = o.o_orderkey)
       SELECT CAST(0 AS INT) AS version,
              COUNT(*) AS num_rows,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
       FROM orders
       UNION ALL
       SELECT CAST(1 AS INT), COUNT(*),
              CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
       FROM v1
       ORDER BY version""",
)
def s13c_acid_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 with REAL transactional semantics: orders lands as an
    :class:`AcidTable` (manifest-log snapshots, atomic put-if-absent
    commits), a repriced delta MERGEs copy-on-write (only data files
    whose PK [min,max] stats can contain a delta key are rewritten —
    the untouched bulk of a 100 TB table is never read), and BOTH
    versions stay readable: the result is the per-version (count, sum)
    pair via time travel.  The oracle replays version 1 as a
    left-join reprice.  Reference parity: apply commits a package
    import as one transaction (Codeunit 60000:440-451); this adds the
    reader-isolation/time-travel the reference gets from SQL Server."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_acid_")
    try:
        o = load_table(spark, sf_dir, "orders")
        t = AcidTable.create(spark, root + "/orders", o, key_cols=["o_orderkey"])
        delta = o.where(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        t.merge(delta, ["o_orderkey"])
        per_version = []
        for v in (0, 1):
            per_version.append(
                t.snapshot(v).agg(
                    F.lit(v).cast("int").alias("version"),
                    F.count(F.lit(1)).alias("num_rows"),
                    # per-value decimal cast BEFORE the sum: exact,
                    # order-independent aggregation; DOUBLE only at the edge
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                    .cast("double")
                    .alias("total_price"),
                )
            )
        out = per_version[0].unionByName(per_version[1]).orderBy("version")
        # materialize before the temp table directory disappears
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13f_restore_rollback",
    """SELECT o_orderkey, o_custkey,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 7 = 0""",
)
def s13f_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 + RESTORE: the table takes a reprice MERGE and a DELETE, then
    rolls back to version 0 with a METADATA-ONLY restore commit (no
    data file read or written — the old file set is republished as a
    reset action).  The snapshot after restore must equal the original
    load exactly, which is what the oracle checks; the intermediate
    versions stay time-travelable."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_restore_")
    try:
        o = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 7 == 0)
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("o_totalprice").cast("double").alias("price"),
            )
        )
        t = AcidTable.create(spark, root + "/t", o, key_cols=["o_orderkey"])
        t.merge(
            o.where(F.col("o_orderkey") % 21 == 0).withColumn(
                "price", F.col("price") * 2
            ),
            ["o_orderkey"],
        )
        t.delete("o_custkey % 5 = 0")
        v = t.restore(0)
        assert t._read_manifest(v)["operation"] == "restore"
        out = t.snapshot()
        # materialize before the temp table directory disappears
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13d_change_feed",
    """WITH upd AS (SELECT * FROM customer WHERE c_custkey % 50 = 0),
       del AS (SELECT * FROM customer
               WHERE c_custkey % 97 = 3 AND c_custkey % 50 <> 0)
       SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
              'update_preimage' AS _change_type FROM upd
       UNION ALL
       SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0,
              c_mktsegment, 'update_postimage' FROM upd
       UNION ALL
       SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
              'delete' FROM del
       UNION ALL
       SELECT CAST(9000001 AS BIGINT), 'New Customer #1', CAST(7 AS INTEGER),
              CAST(123.45 AS DOUBLE), 'BUILDING', 'insert'
       UNION ALL
       SELECT CAST(9000002 AS BIGINT), 'New Customer #2', CAST(11 AS INTEGER),
              CAST(678.9 AS DOUBLE), 'MACHINERY', 'insert'""",
)
def s13d_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 change-data-feed: customer lands as an AcidTable, version 1
    MERGEs a reprice + two inserts, version 2 COW-DELETEs a slice, and
    ``changes(0, 2)`` emits the row-level logical diff tagged insert /
    update_preimage / update_postimage / delete (the Delta CDF read).
    Scale: files carried unchanged between the manifests are never
    opened — the diff job reads only files the two commits touched —
    and COW rewrite noise (unchanged rows sharing a rewritten file) is
    cancelled by a null-safe whole-row compare.  The oracle replays the
    same logical diff from the fixture."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_cdf_")
    try:
        cust = load_table(spark, sf_dir, "customer")
        t = AcidTable.create(spark, root + "/customer", cust, key_cols=["c_custkey"])
        upd = cust.filter("c_custkey % 50 = 0").withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
        )
        ins = spark.createDataFrame(
            [
                (9000001, "New Customer #1", 7, 123.45, "BUILDING"),
                (9000002, "New Customer #2", 11, 678.9, "MACHINERY"),
            ],
            cust.schema,
        )
        t.merge(upd.unionByName(ins), ["c_custkey"])
        t.delete("c_custkey % 97 = 3 AND c_custkey % 50 <> 0")
        out = t.changes(0, 2)
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13e_incremental_rollup",
    """WITH delta AS (SELECT o_orderkey, o_totalprice * 2 AS p
                      FROM orders WHERE o_orderkey % 100 = 0),
       v1 AS (SELECT o.o_orderkey, o.o_orderpriority,
                     COALESCE(d.p, o.o_totalprice) AS p
              FROM orders o LEFT JOIN delta d ON d.o_orderkey = o.o_orderkey
              UNION ALL
              SELECT 9000001, '1-URGENT', CAST(100.5 AS DOUBLE)
              UNION ALL
              SELECT 9000003, '5-LOW', CAST(7.25 AS DOUBLE)),
       v2 AS (SELECT * FROM v1 WHERE o_orderkey % 97 <> 5)
       SELECT o_orderpriority,
              COUNT(*) AS cnt,
              CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS total
       FROM v2 GROUP BY o_orderpriority""",
)
def s13e_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 incremental view maintenance: a per-priority SUM/COUNT rollup
    is maintained from the base table's CHANGE FEED instead of being
    recomputed — signed contributions (+post/+insert, −pre/−delete)
    aggregate over the feed (sized by what the commits touched, never
    the base), then MERGE into the stored rollup with COW file pruning.
    DECIMAL contributions make old+delta bit-equal to a full recompute,
    which is exactly what the oracle computes from scratch.  The base
    history replayed: a reprice+insert MERGE, then a COW DELETE."""
    import shutil
    import tempfile

    from .operators.incremental import refresh_rollup
    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_ivm_")
    try:
        o = load_table(spark, sf_dir, "orders")
        base = AcidTable.create(spark, root + "/orders", o, key_cols=["o_orderkey"])
        rollup0 = o.groupBy("o_orderpriority").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        rollup = AcidTable.create(
            spark, root + "/rollup", rollup0, key_cols=["o_orderpriority"]
        )
        upd = o.filter("o_orderkey % 100 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        ins = spark.createDataFrame(
            [
                (9000001, 1, "O", 100.5, None, "1-URGENT"),
                (9000003, 1, "O", 7.25, None, "5-LOW"),
            ],
            o.schema,
        )
        base.merge(upd.unionByName(ins), ["o_orderkey"])
        base.delete("o_orderkey % 97 = 5")
        refresh_rollup(
            rollup,
            base.changes(0, 2),
            ["o_orderpriority"],
            "o_totalprice",
            sum_col="total",
            cnt_col="cnt",
        )
        out = rollup.snapshot().select(
            "o_orderpriority",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("total").cast("double").alias("total"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13g_cdc_replicate",
    """WITH v1 AS (SELECT c_custkey, c_name, c_nationkey,
                          CASE WHEN c_custkey % 50 = 0
                               THEN c_acctbal + 1000.0 ELSE c_acctbal END
                              AS c_acctbal,
                          c_mktsegment
                   FROM customer
                   UNION ALL
                   SELECT CAST(9000001 AS BIGINT), 'New Customer #1',
                          CAST(7 AS INTEGER), CAST(123.45 AS DOUBLE),
                          'BUILDING'
                   UNION ALL
                   SELECT CAST(9000002 AS BIGINT), 'New Customer #2',
                          CAST(11 AS INTEGER), CAST(678.9 AS DOUBLE),
                          'MACHINERY')
       SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
       FROM v1 WHERE NOT (c_custkey % 97 = 3 AND c_custkey % 50 <> 0)""",
)
def s13g_cdc_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 replication: the change feed is not just reportable, it is
    APPLICABLE — a replica table at the source's version 0 consumes
    ``changes(0, 2)`` through :meth:`AcidTable.apply_cdc` (upserts +
    deletes in ONE commit, stats-range file pruning over the union of
    change keys, same adaptive recompute fallback as MERGE) and becomes
    row-identical to the source head, which is exactly what the oracle
    computes from the fixture.  At 100 TB this is the cross-region /
    dev-mirror story: the bytes moved are sized by the feed (what the
    commits touched), never the table, and an (app, batch) writer
    transaction makes replays no-ops so the exactly-once chain extends
    to downstream replicas."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_cdcrep_")
    try:
        cust = load_table(spark, sf_dir, "customer")
        t = AcidTable.create(spark, root + "/src", cust, key_cols=["c_custkey"])
        replica = AcidTable.create(
            spark, root + "/replica", t.snapshot(0), key_cols=["c_custkey"]
        )
        upd = cust.filter("c_custkey % 50 = 0").withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
        )
        ins = spark.createDataFrame(
            [
                (9000001, "New Customer #1", 7, 123.45, "BUILDING"),
                (9000002, "New Customer #2", 11, 678.9, "MACHINERY"),
            ],
            cust.schema,
        )
        t.merge(upd.unionByName(ins), ["c_custkey"])
        t.delete("c_custkey % 97 = 3 AND c_custkey % 50 <> 0")
        replica.apply_cdc(t.changes(0, 2), txn=("replicator", 2))
        out = replica.snapshot()
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13h_shallow_clone",
    """SELECT 'source' AS side, COUNT(*) AS num_rows,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS total_price
       FROM orders
       UNION ALL
       SELECT 'clone', COUNT(*),
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
       FROM orders WHERE o_orderkey % 10 <> 3
       ORDER BY side DESC""",
)
def s13h_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 shallow CLONE: fork the orders table metadata-only (version 0
    of the clone references the source's data files by absolute path —
    zero data copied, O(files) cost at any table size), then run a
    destructive DELETE on the fork.  The result juxtaposes both sides:
    the source must be bit-untouched while the clone diverged — the
    dev-sandbox / experiment-fork story at 100 TB.  The DELETE also
    exercises the absolute-entry COW path: rows living in source-owned
    files rewrite under the CLONE's root, never unlinking the source
    file."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_clone_")
    try:
        o = load_table(spark, sf_dir, "orders")
        src = AcidTable.create(spark, root + "/src", o, key_cols=["o_orderkey"])
        clone = src.clone_to(root + "/fork")
        clone.delete("o_orderkey % 10 = 3")

        def side(tag: str, t: AcidTable) -> DataFrame:
            return t.snapshot().agg(
                F.lit(tag).alias("side"),
                F.count(F.lit(1)).alias("num_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_price"),
            )

        out = side("source", src).unionByName(side("clone", clone)).orderBy(
            F.col("side").desc()
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13i_column_mapping",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                            o_totalprice
                     FROM orders WHERE o_orderkey % 7 = 0),
       delta AS (SELECT o_orderkey, o_custkey,
                        o_totalprice * 2 AS price
                 FROM base WHERE o_orderkey % 3 = 0)
       SELECT b.o_orderkey, b.o_custkey,
              CAST(COALESCE(d.price, b.o_totalprice) AS DOUBLE) AS price
       FROM base b LEFT JOIN delta d ON d.o_orderkey = b.o_orderkey""",
)
def s13i_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 COLUMN MAPPING (round 10): rename and drop as metadata-only
    commits on an :class:`AcidTable` (the Delta/Iceberg pattern: files
    store stable PHYSICAL names; the logical->physical map lives in the
    manifest schema).  o_totalprice renames to ``price`` and
    o_orderstatus drops — zero files rewritten — then a post-rename
    MERGE writes new-generation files; the final read resolves BOTH
    file generations through the mapping.  The oracle replays the
    reprice as a left join.  At 100 TB a rename is an O(1) log append
    instead of a full-table rewrite (sources/acid_table.py
    rename_column/drop_column)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_acid_")
    try:
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderkey") % 7 == 0
        ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        t = AcidTable.create(spark, root + "/orders", o, key_cols=["o_orderkey"])
        t.rename_column("o_totalprice", "price")
        t.drop_column("o_orderstatus")
        delta = (
            t.snapshot()
            .where(F.col("o_orderkey") % 3 == 0)
            .withColumn("price", F.col("price") * 2)
        )
        # materialize the delta before merging (it reads the files the
        # COW merge is about to replace)
        delta = _detach(delta)
        t.merge(delta, ["o_orderkey"])
        out = t.snapshot().select(
            "o_orderkey", "o_custkey", F.col("price").cast("double").alias("price")
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13j_convert_in_place",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice
                     FROM orders WHERE o_orderkey % 5 = 0),
       delta AS (SELECT o_orderkey, o_custkey,
                        o_totalprice * 2 AS price
                 FROM base WHERE o_orderkey % 3 = 0),
       merged AS (SELECT b.o_orderkey, b.o_custkey,
                         CAST(COALESCE(d.price, b.o_totalprice) AS DOUBLE)
                             AS price
                  FROM base b LEFT JOIN delta d
                    ON d.o_orderkey = b.o_orderkey)
       SELECT o_orderkey, o_custkey, price FROM merged
       WHERE o_orderkey BETWEEN 1000 AND 20000""",
)
def s13j_convert_in_place(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 CONVERT-in-place (round 11): adopt a plain parquet directory
    as an :class:`AcidTable` version 0 with a METADATA-ONLY commit — no
    data file moved or rewritten, per-file key stats collected by ONE
    distributed job and written straight to the version-0 checkpoint
    (the file list never enters the Python driver) — then run the
    post-migration lifecycle on it: a COW MERGE (rewrites land under
    the table's own root, adopted references drop), and a stats-PRUNED
    scan() range read of the result.  The oracle replays the reprice as
    a left join + BETWEEN.  At 100 TB this is the first operation a
    real migration performs: adopting a petabyte parquet lake costs one
    metadata job, not a rewrite (sources/acid_table.py
    import_existing)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_convert_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 5 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice")
        )
        # the pre-migration lake: a plain range-partitioned parquet dir
        base.repartitionByRange(4, "o_orderkey").write.parquet(root + "/lake")
        t = AcidTable.import_existing(
            spark, root + "/lake", key_cols=["o_orderkey"]
        )
        t.rename_column("o_totalprice", "price")
        delta = (
            t.snapshot()
            .where(F.col("o_orderkey") % 3 == 0)
            .withColumn("price", F.col("price") * 2)
        )
        # materialize the delta before merging (it reads the files the
        # COW merge is about to replace)
        delta = _detach(delta)
        t.merge(delta, ["o_orderkey"])
        pruned, _info = t.scan({"o_orderkey": (1000, 20000)})
        out = pruned.select(
            "o_orderkey", "o_custkey", F.col("price").cast("double").alias("price")
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13k_partitioned_convert",
    """SELECT o_orderkey, o_custkey, o_orderpriority,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders
       WHERE o_orderkey % 3 = 0
         AND o_orderpriority IN ('2-HIGH', '4-NOT SPECIFIED')""",
)
def s13k_partitioned_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 CONVERT of a HIVE-PARTITIONED lake (round 11): adopt a
    directory partitioned by o_orderpriority — the values live in
    ``col=val`` directory names, not the files — metadata-only.  The
    manifest marks the column ``partition_from_path``; every read
    re-derives the value from the file path per row (files the table
    writes itself later carry it physically and win the coalesce), and
    each file gets min=max stats on the partition column in the same
    one-pass job, so the scan() range read below does hive-style
    PARTITION PRUNING on the adopted layout (strictly fewer files than
    the table, pinned in test_acid_table).  '4-NOT SPECIFIED' makes the
    dir name carry a space — URI-encoded by input_file_name, decoded
    exactly (sources/acid_table.py import_existing/_read_data)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_pconvert_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 3 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        )
        base.write.partitionBy("o_orderpriority").parquet(root + "/lake")
        t = AcidTable.import_existing(
            spark, root + "/lake", key_cols=["o_orderkey"]
        )
        hi, _ = t.scan({"o_orderpriority": ("2-HIGH", "2-HIGH")})
        ns, _ = t.scan(
            {"o_orderpriority": ("4-NOT SPECIFIED", "4-NOT SPECIFIED")}
        )
        out = hi.unionByName(ns).select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13m_deletion_vectors",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice
                     FROM orders WHERE o_orderkey % 4 = 1),
       afterdel AS (SELECT * FROM base WHERE NOT (o_orderkey % 1000 = 1)),
       delta AS (SELECT o_orderkey, o_totalprice * 3 AS p3
                 FROM afterdel WHERE o_orderkey % 500 = 9)
       SELECT a.o_orderkey AS o_orderkey, a.o_custkey AS o_custkey,
              CAST(COALESCE(d.p3, a.o_totalprice) AS DOUBLE) AS price
       FROM afterdel a LEFT JOIN delta d ON d.o_orderkey = a.o_orderkey""",
)
def s13m_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 MERGE-ON-READ (round 12): a point DELETE and a narrow MERGE
    both land as DELETION VECTORS — position-bitmap sidecars masking
    rows at read time — with ZERO base data files rewritten (asserted
    on the manifests: no ``remove`` actions, only ``dv`` actions; the
    merge's delta rows land as new files).  The 100 TB GDPR-delete
    path: a 10-row delete costs a KB sidecar, not a GB rewrite
    (sources/acid_table.py `_mor_split`; Delta/Iceberg v2 position
    deletes).  The oracle replays delete+merge as WHERE + LEFT JOIN."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_dv_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 4 == 1)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(4, "o_orderkey")
        )
        t = AcidTable.create(spark, root + "/orders", base, key_cols=["o_orderkey"])
        t.delete("o_orderkey % 1000 = 1")
        m1 = t._read_manifest(1)
        if m1["remove"] or m1["add"] or not m1["dv"]:
            raise AssertionError(
                "point delete should be pure deletion-vector actions, got "
                f"remove={m1['remove']} add={len(m1['add'])} dv={len(m1['dv'])}"
            )
        delta = (
            t.snapshot()
            .where(F.col("o_orderkey") % 500 == 9)
            .withColumn("o_totalprice", F.col("o_totalprice") * 3)
        )
        # materialize before the merge masks the rows it reads from
        delta = _detach(delta)
        # recompute_frac=1.0: the delta spans every file's range; force
        # the per-file MOR decision instead of the reset recompute
        t.merge(delta, ["o_orderkey"], recompute_frac=1.0)
        m2 = t._read_manifest(2)
        if m2["remove"] or not m2["dv"]:
            raise AssertionError(
                "narrow merge should mask via deletion vectors, got "
                f"remove={m2['remove']} dv={len(m2['dv'])}"
            )
        out = t.snapshot().select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "stream_cdc_follow",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                            o_totalprice
                     FROM orders WHERE o_orderkey % 3 = 0),
       merged AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                         CASE WHEN o_orderkey % 900 = 0
                              THEN o_totalprice * 2
                              ELSE o_totalprice END AS p
                  FROM base),
       afterdel AS (SELECT * FROM merged WHERE NOT (o_orderkey % 500 = 0))
       SELECT o_orderkey, o_custkey, o_orderpriority,
              CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN p * 1.5
                        ELSE p END AS DOUBLE) AS price
       FROM afterdel""",
)
def stream_cdc_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + S13 (round 12): the STREAMING CHANGE-FEED SOURCE — a
    replica follows the source AcidTable's commit log as micro-batches
    (one idempotent ``apply_cdc`` commit per source version,
    streaming/events.follow_changes), staying row-identical through a
    MERGE, a masked point DELETE (deletion vectors on the source), and
    an atomic ``overwrite_where`` backfill.  The txn ledger is the
    stream offset: a replayed batch no-ops, a fresh follower resumes
    from the ledger (both re-asserted inline here).  This is the Delta
    ``readStream``-on-a-table primitive over the engine's own log; the
    oracle replays the three operations as CASE/WHERE algebra."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable
    from .streaming.events import follow_changes

    root = tempfile.mkdtemp(prefix="bdmc_cdcf_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 3 == 0)
            .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
            .repartitionByRange(4, "o_orderkey")
        )
        src = AcidTable.create(spark, root + "/src", base, key_cols=["o_orderkey"])
        rep = AcidTable.create(spark, root + "/rep", base, key_cols=["o_orderkey"])
        delta = (
            src.snapshot()
            .where(F.col("o_orderkey") % 900 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        src.merge(_detach(delta), ["o_orderkey"])
        src.delete("o_orderkey % 500 = 0")
        repl = (
            src.snapshot()
            .where(F.col("o_orderpriority") == "1-URGENT")
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.5)
        )
        src.overwrite_where(
            _detach(repl),
            "o_orderpriority = '1-URGENT'",
        )
        applied = follow_changes(src, rep, "cdc", base_version=0)
        if applied != [1, 2, 3]:
            raise AssertionError(f"expected one micro-batch per commit, got {applied}")
        # replay + drained-followup must both no-op (exactly-once)
        v = rep.latest_version()
        rep.apply_cdc(src.changes(1, 2), txn=("cdc", 2))
        if rep.latest_version() != v or follow_changes(src, rep, "cdc") != []:
            raise AssertionError("replayed/drained batch was not a no-op")
        out = rep.snapshot().select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "stream_agg_follow",
    """WITH base AS (
         SELECT o_orderkey, o_custkey,
                CAST(o_totalprice AS DECIMAL(18,2)) AS price
         FROM orders WHERE o_orderkey % 3 = 0),
       merged AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 600 = 0
                     THEN CAST(price * 2 AS DECIMAL(18,2))
                     ELSE price END AS price
         FROM base),
       afterdel AS (SELECT * FROM merged WHERE NOT (o_orderkey % 450 = 0)),
       appended AS (
         SELECT * FROM afterdel
         UNION ALL
         SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
                CAST(price + 10 AS DECIMAL(18,2)) AS price
         FROM (SELECT o_orderkey, o_custkey,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS price
               FROM orders WHERE o_orderkey % 3 = 1))
       SELECT o_custkey, COUNT(*) AS cnt,
              CAST(SUM(price) AS DOUBLE) AS total
       FROM appended GROUP BY o_custkey""",
)
def stream_agg_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED VIEW over the change feed (round 12):
    a per-customer count/sum view is SEEDED once, then maintained
    through a merge + delete + append on the source by
    ``follow_aggregate`` — each batch signs that commit's row-level
    diff (+insert/postimage, -delete/preimage), reduces it to
    per-group deltas, and lands ONE idempotent apply_cdc commit; a
    replayed batch no-ops via the txn ledger.  O(churn) per commit at
    100 TB, never a source rescan; sums ride an exact decimal so the
    incremental state is BIT-equal to a from-scratch GROUP BY, which
    is asserted inline (symmetric difference) before the oracle
    re-derives the same end state in SQL (streaming/events.py
    follow_aggregate; Delta Live Tables / Materialize semantics)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable
    from .streaming.events import follow_aggregate, seed_aggregate

    root = tempfile.mkdtemp(prefix="bdmc_mv_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        base = (
            orders.where(F.col("o_orderkey") % 3 == 0)
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            )
            .repartitionByRange(4, "o_orderkey")
        )
        src = AcidTable.create(spark, root + "/src", base, key_cols=["o_orderkey"])
        agg = seed_aggregate(src, root + "/mv", "mv", ["o_custkey"], ["price"])
        delta = (
            src.snapshot()
            .where(F.col("o_orderkey") % 600 == 0)
            .withColumn("price", (F.col("price") * 2).cast("decimal(18,2)"))
        )
        src.merge(_detach(delta), ["o_orderkey"])
        src.delete("o_orderkey % 450 = 0")
        src.append(
            orders.where(F.col("o_orderkey") % 3 == 1).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_custkey",
                (F.col("o_totalprice").cast("decimal(18,2)") + 10)
                .cast("decimal(18,2)")
                .alias("price"),
            )
        )
        if follow_aggregate(src, agg, "mv", ["o_custkey"], ["price"]) != [1, 2, 3]:
            raise AssertionError("follower must drain exactly versions 1..3")
        if follow_aggregate(src, agg, "mv", ["o_custkey"], ["price"]) != []:
            raise AssertionError("replay must be a no-op")
        mv = agg.snapshot()
        direct = (
            src.snapshot()
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("price").alias("sum_price"))
        )
        if mv.exceptAll(direct).count() or direct.exceptAll(mv).count():
            raise AssertionError("incremental view diverged from direct GROUP BY")
        out = mv.select(
            "o_custkey",
            "cnt",
            F.col("sum_price").cast("double").alias("total"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "stream_agg_follow_windowed",
    """WITH base AS (
         SELECT event_id, event_type,
                date_trunc('hour', ts) AS bucket,
                CAST(FLOOR(value * 1000) AS BIGINT) AS val_m
         FROM events WHERE event_id % 2 = 0),
       merged AS (
         SELECT event_id, event_type, bucket,
                CASE WHEN event_id % 700 = 0 THEN val_m * 3
                     ELSE val_m END AS val_m
         FROM base),
       afterdel AS (SELECT * FROM merged WHERE NOT (event_id % 500 = 0)),
       appended AS (
         SELECT * FROM afterdel
         UNION ALL
         SELECT event_id + 100000000 AS event_id, event_type,
                date_trunc('hour', ts) AS bucket,
                CAST(FLOOR(value * 1000) AS BIGINT) + 7 AS val_m
         FROM events WHERE event_id % 2 = 1)
       SELECT event_type, bucket, COUNT(*) AS cnt,
              CAST(SUM(val_m) AS BIGINT) AS total_m
       FROM appended GROUP BY event_type, bucket""",
)
def stream_agg_follow_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME WINDOWED incremental rollup (round 12): the same
    O(churn) materialized-view maintenance as ``stream_agg_follow``,
    parameterized the way a streaming pipeline actually uses it —
    grouped by (event_type, hourly bucket), the bucket being an
    event-time truncation stored ON the source rows, so the follower
    maintains a time-series rollup table through merge/delete/append
    churn without ever rescanning the source.  Sums ride
    ``floor(value*1000)`` as BIGINT: floor is bit-identical across
    engines where a double->decimal cast's rounding is not, keeping
    the incremental state value-exact vs DuckDB
    (streaming/events.py follow_aggregate)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable
    from .streaming.events import follow_aggregate, seed_aggregate

    root = tempfile.mkdtemp(prefix="bdmc_wmv_")
    try:
        ev = load_table(spark, sf_dir, "events")

        def _rows(parity: int) -> DataFrame:
            out = ev.where(F.col("event_id") % 2 == parity).select(
                "event_id",
                "event_type",
                F.date_trunc("hour", F.col("ts")).alias("bucket"),
                F.floor(F.col("value") * 1000).cast("bigint").alias("val_m"),
            )
            return out.repartitionByRange(4, "event_id")

        src = AcidTable.create(
            spark, root + "/src", _rows(0), key_cols=["event_id"]
        )
        agg = seed_aggregate(
            src, root + "/mv", "wmv", ["event_type", "bucket"], ["val_m"]
        )
        delta = (
            src.snapshot()
            .where(F.col("event_id") % 700 == 0)
            .withColumn("val_m", F.col("val_m") * 3)
        )
        src.merge(_detach(delta), ["event_id"])
        src.delete("event_id % 500 = 0")
        src.append(
            ev.where(F.col("event_id") % 2 == 1).select(
                (F.col("event_id") + 100_000_000).alias("event_id"),
                "event_type",
                F.date_trunc("hour", F.col("ts")).alias("bucket"),
                (F.floor(F.col("value") * 1000).cast("bigint") + 7).alias(
                    "val_m"
                ),
            )
        )
        drained = follow_aggregate(
            src, agg, "wmv", ["event_type", "bucket"], ["val_m"]
        )
        if drained != [1, 2, 3] or follow_aggregate(
            src, agg, "wmv", ["event_type", "bucket"], ["val_m"]
        ):
            raise AssertionError("windowed follower must drain 1..3 then no-op")
        mv = agg.snapshot()
        direct = (
            src.snapshot()
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("val_m").alias("sum_val_m"))
        )
        if mv.exceptAll(direct).count() or direct.exceptAll(mv).count():
            raise AssertionError("windowed view diverged from direct GROUP BY")
        out = mv.select(
            "event_type",
            "bucket",
            "cnt",
            F.col("sum_val_m").alias("total_m"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13n_point_lookup_bloom",
    """SELECT o_orderkey, o_custkey,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders
       WHERE o_orderkey IN (SELECT o_orderkey FROM orders
                            WHERE o_orderkey % 5000 = 1
                            ORDER BY o_orderkey LIMIT 3)""",
)
def s13n_point_lookup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 BLOOM FILE STATS (round 12): orders keyed by an md5 hash —
    the hash-scattered layout where every file's [min,max] spans the
    whole key space and stats pruning is useless — gets per-file Bloom
    membership bitmaps (``compute_bloom_stats``, the portable md5
    double-hash from operators/bloom.py), and a point lookup of ~12
    keys then reads only the files whose bitmap can contain a probe
    (asserted inline: files_read < files_total).  False positives cost
    a wasted read; false negatives cannot happen, so the result equals
    the plain IN filter — which is exactly what the oracle checks
    (the md5 key roundtrip is internal; DuckDB replays the keyset)."""
    import hashlib
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_bl_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        base = orders.select(
            F.md5(F.col("o_orderkey").cast("string")).alias("k"),
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
        ).repartition(8, "k")
        t = AcidTable.create(spark, root + "/orders", base, key_cols=["k"])
        # auto-sized bitmap (~10 bits/row of the largest file): a fixed
        # size saturates as SF grows and silently stops pruning
        t.compute_bloom_stats(["k"], k=5)
        # FIXED probe count regardless of SF: a point lookup is a few
        # keys by definition — probing O(table) keys would legitimately
        # occupy every file and prove nothing about pruning
        keys = sorted(
            r["o_orderkey"]
            for r in orders.where(F.col("o_orderkey") % 5000 == 1)
            .select("o_orderkey")
            .collect()
        )[:3]
        probe = [hashlib.md5(str(x).encode()).hexdigest() for x in keys]
        df, info = t.point_lookup("k", probe)
        if not info["files_read"] < info["files_total"]:
            raise AssertionError(
                f"bloom stats should prune hash-scattered files: {info}"
            )
        out = df.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13o_schema_evolution",
    """WITH base AS (SELECT o_orderkey,
                            CAST(o_orderkey % 1000 AS INT) AS cents
                     FROM orders WHERE o_orderkey % 2 = 0),
       delta AS (SELECT o_orderkey,
                        o_orderkey * 10000000000 AS cents_wide,
                        'repriced' AS tag
                 FROM base WHERE o_orderkey % 600 = 0)
       SELECT b.o_orderkey AS o_orderkey,
              CAST(COALESCE(d.cents_wide, b.cents) AS BIGINT) AS cents,
              d.tag AS tag
       FROM base b LEFT JOIN delta d ON d.o_orderkey = b.o_orderkey""",
)
def s13o_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 SCHEMA EVOLUTION + TYPE WIDENING (round 12), both
    metadata-only: ``widen_column`` upgrades an int column to bigint
    without rewriting a file (old int32 pages upcast at scan), then a
    MERGE with ``schema_evolution=True`` lands values beyond int range
    AND auto-adds a new ``tag`` column in the same commit — existing
    files NULL-backfill it through a fresh physical name
    (sources/acid_table.py widen_column/_evolve_schema; Delta's
    type-widening + mergeSchema).  Zero-rewrite is asserted inline; the
    oracle replays widen+merge as CAST + LEFT JOIN."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_se_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 2 == 0)
            .select(
                "o_orderkey",
                (F.col("o_orderkey") % 1000).cast("int").alias("cents"),
            )
            .repartitionByRange(4, "o_orderkey")
        )
        t = AcidTable.create(spark, root + "/t", base, key_cols=["o_orderkey"])
        t.widen_column("cents", "bigint")
        m1 = t._read_manifest(1)
        if m1["add"] or m1["remove"]:
            raise AssertionError("widen_column must be metadata-only")
        delta = (
            t.snapshot()
            .where(F.col("o_orderkey") % 600 == 0)
            .select(
                "o_orderkey",
                (F.col("o_orderkey") * 10_000_000_000).alias("cents"),
                F.lit("repriced").alias("tag"),
            )
        )
        delta = _detach(delta)
        t.merge(delta, ["o_orderkey"], schema_evolution=True)
        out = t.snapshot().select("o_orderkey", "cents", "tag")
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13p_incremental_optimize",
    """SELECT o_orderkey, o_custkey,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 5 = 2
       UNION ALL
       SELECT o_orderkey + 100000000, o_custkey,
              CAST(o_totalprice * 1.5 AS DOUBLE)
       FROM orders WHERE o_orderkey % 5 = 2 AND o_orderkey % 3 = 0""",
)
def s13p_incremental_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 INCREMENTAL OPTIMIZE (round 12): after a full compaction
    sets the maintenance watermark, later appends compact with
    ``compact(incremental=True)`` — ONLY the post-watermark files are
    read and rewritten (asserted inline: every pre-watermark file
    carries, the remove set is exactly the fresh files), and the
    logical snapshot is byte-identical, which is what the oracle
    checks.  At 100 TB this is each maintenance window compacting its
    own churn in O(churn) instead of re-clustering the bulk
    (sources/acid_table.py compact, `last_optimize` watermark)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_io_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        base = (
            orders.where(F.col("o_orderkey") % 5 == 2)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(4, "o_orderkey")
        )
        t = AcidTable.create(spark, root + "/t", base, key_cols=["o_orderkey"])
        t.compact(target_files=4)  # watermark
        bulk = {e["path"] for e in t.entries(t.latest_version())}
        churn = (
            orders.where(
                (F.col("o_orderkey") % 5 == 2) & (F.col("o_orderkey") % 3 == 0)
            )
            .select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_custkey",
                (F.col("o_totalprice") * 1.5).alias("o_totalprice"),
            )
        )
        t.append(churn.repartition(6))
        v = t.compact(target_files=1, incremental=True)
        m = t._read_manifest(v)
        if m["operation"] != "optimize-incremental" or (set(m["remove"]) & bulk):
            raise AssertionError(
                "incremental optimize must touch only post-watermark files"
            )
        if not bulk <= {e["path"] for e in t.entries(v)}:
            raise AssertionError("pre-watermark files must carry unchanged")
        out = t.snapshot().select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13q_time_travel_ts",
    """SELECT o_orderkey, o_custkey,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 4 IN (0, 2)""",
)
def s13q_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 TIMESTAMP TIME TRAVEL (round 12): every commit carries a
    monotone IN-COMMIT TIMESTAMP (Delta 3.x in-commit timestamps,
    stamped and clock-skew-clamped at the publish choke point), and
    ``snapshot(timestamp=)`` / ``restore(timestamp=)`` /
    ``changes(from_timestamp=)`` resolve instants to versions via
    ``version_at`` — the audit/debug primitive ("the table as of
    yesterday 09:00") that version numbers alone can't give an
    operator.  Here: create + append + delete, then read back AS OF
    the append's commit instant — the later delete must be invisible
    (the oracle is the pre-delete state); the change feed FROM that
    instant must be pure deletes; and RESTORE TO TIMESTAMP must
    reproduce the travelled snapshot exactly (asserted by symmetric
    difference).  Reference analogue: package re-export against a
    prior state (XML:774-798), keyed by time instead of version."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_ts_")
    try:
        orders = load_table(spark, sf_dir, "orders")

        def _slice(mod: int) -> DataFrame:
            return (
                orders.where(F.col("o_orderkey") % 4 == mod)
                .select("o_orderkey", "o_custkey", "o_totalprice")
                .repartitionByRange(4, "o_orderkey")
            )

        t = AcidTable.create(spark, root + "/t", _slice(0), key_cols=["o_orderkey"])
        t.append(_slice(2))
        t.delete("o_orderkey % 600 = 0")
        ts1 = t.commit_timestamp(1)
        if t.version_at(ts1) != 1 or t.version_at(t.commit_timestamp(2)) != 2:
            raise AssertionError("version_at must resolve each commit instant")
        feed = t.changes(from_timestamp=ts1)
        bad = feed.where(F.col("_change_type") != "delete").count()
        if bad or feed.count() == 0:
            raise AssertionError("feed from the append instant must be pure deletes")
        tv = t.snapshot(timestamp=ts1).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        tv = _detach(tv)
        t.restore(timestamp=ts1)
        head = t.snapshot().select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        if head.exceptAll(tv).count() or tv.exceptAll(head).count():
            raise AssertionError("RESTORE TO TIMESTAMP must equal the travelled snapshot")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return tv


@query(
    "s13r_generated_columns",
    """SELECT event_id, user_id, value,
              CAST(ts AS DATE) AS event_date
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10 06:00:00'
         AND ts <= TIMESTAMP '2024-01-14 18:00:00'""",
)
def s13r_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 GENERATED COLUMNS + derived-predicate pruning (round 12,
    Delta GENERATED ALWAYS AS): ``event_date`` is declared as
    ``CAST(ts AS DATE)`` at create — computed on every write,
    validated when supplied, and carrying per-file stats.  A scan
    whose range touches only the SOURCE column ``ts`` then prunes on
    the DERIVED ``event_date`` interval (the expression is on the
    monotone whitelist; bounds are evaluated by Spark itself so they
    match the stats' semantics exactly) — asserted inline: the table
    has NO ts stats (key stats are event_id), yet files_read <
    files_total.  This is how a 100 TB event table partitioned by a
    generated date column answers raw-timestamp range queries without
    the caller knowing the partitioning exists
    (sources/acid_table.py create/_apply_generated/scan)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_gc_")
    try:
        ev = (
            load_table(spark, sf_dir, "events")
            .select("event_id", "ts", "user_id", "value")
            .repartitionByRange(8, "ts")
        )
        t = AcidTable.create(
            spark,
            root + "/t",
            ev,
            key_cols=["event_id"],
            generated={"event_date": "CAST(ts AS DATE)"},
        )
        out, info = t.scan(
            {"ts": ("2024-01-10 06:00:00", "2024-01-14 18:00:00")}
        )
        if info["files_read"] >= info["files_total"]:
            raise AssertionError(
                f"derived-predicate pruning must skip files, got {info}"
            )
        out = _detach(out.select("event_id", "user_id", "value", "event_date"))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13s_identity_columns",
    """WITH a AS (SELECT o_orderkey, o_custkey FROM orders
                  WHERE o_orderkey % 3 = 0),
       b AS (SELECT o_orderkey, o_custkey FROM orders
             WHERE o_orderkey % 3 = 1),
       na AS (SELECT count(*) AS n FROM a)
       SELECT o_orderkey, o_custkey,
              CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rid
       FROM a
       UNION ALL
       SELECT b.o_orderkey, b.o_custkey,
              CAST((SELECT n FROM na)
                   + row_number() OVER (ORDER BY b.o_orderkey) AS BIGINT)
                   AS rid
       FROM b""",
)
def s13s_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 IDENTITY COLUMNS (round 12, Delta GENERATED BY DEFAULT AS
    IDENTITY made deterministic): ``rid`` is allocated hwm+1..hwm+n
    densely per insert batch, ordered by the batch-unique key — the
    create takes 1..n, the append CONTINUES from the latched
    high-water mark, and the whole allocation is the hierarchical
    distributed prefix sum (operators/sampling.global_running_sum:
    no single-partition window over anything batch-sized), so DuckDB
    replays it as row_number() OVER (ORDER BY key) exactly.  Restore
    latches the mark (rolled-back ids never re-issue) and a racing
    allocation aborts as a metadata conflict — both pinned in
    test_acid_table (sources/acid_table.py _assign_identity)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_id_")
    try:
        orders = load_table(spark, sf_dir, "orders")

        def _slice(mod: int) -> DataFrame:
            return (
                orders.where(F.col("o_orderkey") % 3 == mod)
                .select("o_orderkey", "o_custkey")
                .repartition(4)
            )

        t = AcidTable.create(
            spark,
            root + "/t",
            _slice(0),
            key_cols=["o_orderkey"],
            identity={"rid": "o_orderkey"},
        )
        t.append(_slice(1))
        out = _detach(t.snapshot().select("o_orderkey", "o_custkey", "rid"))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "s13l_overwrite_where",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                            o_totalprice
                     FROM orders WHERE o_orderkey % 4 = 0)
       SELECT o_orderkey, o_custkey, o_orderpriority,
              CAST(CASE WHEN o_orderpriority = '2-HIGH'
                        THEN o_totalprice * 2 ELSE o_totalprice END
                   AS DOUBLE) AS price
       FROM base""",
)
def s13l_overwrite_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 replaceWhere (round 11): ATOMIC slice backfill — recompute
    the '2-HIGH' priority slice (price doubled) and swap it in with ONE
    ``overwrite_where`` commit; every other row carries forward through
    untouched files (COW: only files straddling the predicate rewrite).
    The backfill primitive at 100 TB — readers see the old slice or the
    new one, never a mix, unlike a rewrite-in-place.  Replacement rows
    are validated against the predicate (a stray row would silently
    survive alongside what it replaced).  The oracle replays the
    backfill as a CASE (sources/acid_table.py overwrite_where)."""
    import shutil
    import tempfile

    from .sources.acid_table import AcidTable

    root = tempfile.mkdtemp(prefix="bdmc_rw_")
    try:
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 4 == 0)
            .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        )
        t = AcidTable.create(
            spark, root + "/orders", base.repartition(4), key_cols=["o_orderkey"]
        )
        repl = (
            t.snapshot()
            .where(F.col("o_orderpriority") == "2-HIGH")
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        # materialize before the COW swap reads the files it replaces
        repl = _detach(repl)
        t.overwrite_where(repl, "o_orderpriority = '2-HIGH'")
        out = t.snapshot().select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "stream_acid_backfill",
    """WITH base AS (SELECT o_orderkey, o_custkey,
                            (o_orderkey // 6) % 4 AS day, o_totalprice
                     FROM orders WHERE o_orderkey % 6 = 0)
       SELECT o_orderkey, o_custkey, day,
              CAST(CASE WHEN day = 0 THEN o_totalprice * 2
                        WHEN day = 1 THEN o_totalprice * 3
                        ELSE o_totalprice END AS DOUBLE) AS price
       FROM base
       WHERE day <> 3 AND NOT (day = 0 AND o_orderkey % 5 = 0)""",
)
def stream_acid_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + S13 composed (round 11): the streaming RECOMPUTE-AND-SWAP
    pattern — each micro-batch carries whole corrected SLICES (days),
    and the exactly-once sink lands it via one atomic
    ``overwrite_where`` per batch (streaming/events.acid_backfill_sink)
    instead of a row MERGE: rows DELETED from a corrected slice
    disappear (batch 2 drops day-0 orders divisible by 5 — an upsert
    can never do that), later corrections override earlier state, and a
    replayed batch is a txn no-op.  Batch order is pinned with explicit
    file mtimes (the file source orders by modification time); the
    final snapshot must equal the batch CASE/WHERE oracle."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from .sources.acid_table import AcidTable
    from .streaming.events import acid_backfill_sink

    base = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 6 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            ((F.col("o_orderkey") / 6).cast("long") % 4).alias("day"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    rounds = [
        base.where(F.col("day").isin(0, 1)),  # original days 0+1
        base.where(F.col("day") == 2).unionByName(  # day 2 + corrected day 0
            base.where(
                (F.col("day") == 0) & (F.col("o_orderkey") % 5 != 0)
            ).withColumn("price", F.col("price") * 2)
        ),
        base.where(F.col("day") == 1).withColumn(  # corrected day 1
            "price", F.col("price") * 3
        ),
    ]
    landing = tempfile.mkdtemp(prefix="bdmc_sbf_landing_")
    troot = tempfile.mkdtemp(prefix="bdmc_sbf_target_")
    target = troot + "/t"
    try:
        seen: set[str] = set()
        for i, r in enumerate(rounds):
            r.coalesce(1).write.mode("append").parquet(landing)
            fresh = set(glob.glob(landing + "/*.parquet")) - seen
            # pin batch ORDER: the file source sorts by mtime, and
            # sequential writes can land inside one clock tick
            for f in fresh:
                os.utime(f, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
            seen |= fresh
        sink = acid_backfill_sink(
            target, "day", app_id="stream_acid_backfill", key_cols=["o_orderkey"]
        )
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        t = AcidTable(spark, target)
        head = t.latest_version()
        # replay the last batch: exactly-once means NO new commit
        sink(rounds[2], t.last_txn("stream_acid_backfill"))
        assert t.latest_version() == head, "replayed batch must be a no-op"
        out = t.snapshot().select("o_orderkey", "o_custkey", "day", "price")
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(troot, ignore_errors=True)
    return out


@query(
    "n2_embedding_dedup",
    f"""WITH {_LSH_PAIRS_SQL}
       SELECT e.vec_id, e.label FROM embeddings e
       WHERE NOT EXISTS (SELECT 1 FROM lsh_pairs p
                         WHERE p.id_b = e.vec_id AND p.cosine >= 0.4)""",
)
def n2_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 completion: embedding-space near-dup REMOVAL (not just pair
    listing) with greedy keep-first semantics — a row is dropped iff a
    lower-id row sits within cosine >= 0.4 among LSH CANDIDATES
    (hyperplane-signature hamming <= 2): the scale path consumes bucketed
    candidate pairs, never an all-pairs cross join.  The seeded planes
    make the candidate set deterministic, so the oracle reproduces it
    exactly; recall of the candidate stage vs brute force is pinned in
    test_northstar."""
    from .operators.similarity import cosine_neardup_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    drops = (
        cosine_neardup_pairs_lsh(emb, dim=64, threshold=0.4)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return emb.join(drops, "vec_id", "left_anti").select("vec_id", "label")


@query(
    "stream_dedup_events",
    """SELECT event_id, user_id, event_type FROM events""",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: streaming exactly-once dedup.  Every event file
    lands TWICE (at-least-once delivery); ``dropDuplicates(event_id)``
    state dedups across micro-batches, so the finished stream equals the
    batch DISTINCT exactly.  The availableNow replay here keeps unbounded
    dedup state for exactness; a 24/7 pipeline would bound it with
    ``dropDuplicatesWithinWatermark`` at the delivery-delay SLA."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import run_stream_to_memory, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_dedup_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_dedup"
    try:
        ev = load_table(spark, sf_dir, "events")
        for _ in range(2):  # duplicate delivery of the whole feed
            ev.coalesce(1).write.mode("append").parquet(landing)
        stream = stream_events(spark, landing, max_files_per_trigger=1)
        deduped = stream.dropDuplicates(["event_id"]).select(
            "event_id", "user_id", "event_type"
        )
        run_stream_to_memory(deduped, qname)
        out = spark.table(qname)
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "stream_enrich_dim",
    """SELECT c.c_mktsegment AS segment,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def stream_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: stream-STATIC dimension enrichment — the J1
    lookup join in streaming form.  Each micro-batch of events joins
    the customer dim as a broadcast hash join (the dim is read once and
    shipped once; no stream-side shuffle and no state store — unlike a
    stream-stream join this is stateless and latency-flat), and the
    enriched stream lands in append mode; the per-segment totals are a
    post-stream batch rollup the oracle recomputes relationally.  At
    100 TB/day the same topology holds: the dim refreshes per batch via
    broadcast, and only a dim too large to broadcast would force the
    stateful redesign."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import run_stream_to_memory, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_enrich_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_enrich"
    try:
        ev = load_table(spark, sf_dir, "events")
        ev.coalesce(2).write.mode("append").parquet(landing)
        dim = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        stream = stream_events(spark, landing, max_files_per_trigger=1)
        enriched = stream.join(
            F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "inner"
        ).select("event_id", "value", F.col("c_mktsegment").alias("segment"))
        run_stream_to_memory(enriched, qname)
        out = (
            spark.table(qname)
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "f_dateformula_eval",
    """SELECT o_orderkey,
              CAST(last_day(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH) AS DATE) AS eom_next,
              CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus_week,
              CAST(last_day(date_trunc('quarter', CAST(o_orderdate AS DATE))
                            + INTERVAL 2 MONTH) AS DATE) AS quarter_end
       FROM orders WHERE o_orderkey <= 2000""",
)
def f_dateformula_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateFormula (§1.2) evaluated DISTRIBUTED: each formula is config
    (a literal), so it compiles driver-side to native date expressions
    (add_months/last_day/trunc — whole-stage codegen, no UDF).  Oracle
    recomputes '<1M+CM>', '<-1W>', '<CQ>' with DuckDB interval math."""
    from .functions.scalars import dateformula_expr

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        dateformula_expr("<1M+CM>", d).alias("eom_next"),
        dateformula_expr("<-1W>", d).alias("minus_week"),
        dateformula_expr("<CQ>", d).alias("quarter_end"),
    )


@query(
    "stream_interval_join",
    """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
              p.ts AS purchase_ts, p.value AS purchase_value
       FROM events c JOIN events p ON c.user_id = p.user_id
       WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension: STREAM-STREAM interval join — clicks joined to
    same-user purchases within the preceding hour, both sides watermarked
    so join state stays bounded.  Events land chronologically (as a real
    ingest arrives); the finished stream must equal the batch interval
    join exactly."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import interval_join_stream, run_stream_to_memory, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_sjoin_landing_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_ivjoin"
    try:
        ev = load_table(spark, sf_dir, "events")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 4
        for i in range(4):
            a = lo + i * span
            b = hi if i == 3 else lo + (i + 1) * span
            cond = (F.col("ts") >= a) & ((F.col("ts") <= b) if i == 3 else (F.col("ts") < b))
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        clicks = stream_events(spark, landing, max_files_per_trigger=1)
        purchases = stream_events(spark, landing, max_files_per_trigger=1)
        run_stream_to_memory(interval_join_stream(clicks, purchases), qname)
        out = spark.table(qname)
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# §2.3 free joins, remaining TPC-H shapes reshaped onto the slimmed schema
# (no partsupp table: supply facts derive from lineitem).  Shared ANSI text,
# planned by Catalyst on the Spark side.
# ---------------------------------------------------------------------------

shared_sql(
    "q2_min_unit_price_supplier",
    # q2 pattern: min-per-group via CORRELATED scalar subquery — for each
    # qualifying part, the EUROPE supplier(s) with the lowest observed
    # unit price (unit price derived from lineitem; the slim schema has
    # no partsupp.ps_supplycost)
    """WITH offers AS (
         SELECT l_partkey, l_suppkey,
                MIN(CAST(l_extendedprice AS DOUBLE)
                    / CAST(l_quantity AS DOUBLE)) AS unit_price
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE' AND l_quantity > 0
         GROUP BY l_partkey, l_suppkey)
       SELECT p.p_partkey, p.p_name, s.s_name, o.unit_price
       FROM part p
       JOIN offers o ON p.p_partkey = o.l_partkey
       JOIN supplier s ON s.s_suppkey = o.l_suppkey
       WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
         AND o.unit_price = (SELECT MIN(o2.unit_price) FROM offers o2
                             WHERE o2.l_partkey = p.p_partkey)""",
)

shared_sql(
    "q9_product_profit",
    # q9 pattern: multi-join profit rollup by supplier nation and year;
    # cost term uses p_retailprice in place of the absent ps_supplycost
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       FROM (SELECT n_name AS nation,
                    EXTRACT(YEAR FROM o_orderdate) AS o_year,
                    CAST(l_extendedprice * (1 - l_discount)
                         - 0.01 * l_quantity * p_retailprice
                         AS DECIMAL(18,6)) AS amount
             FROM lineitem
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE p_name LIKE '%gear%') profit
       GROUP BY nation, o_year""",
)

shared_sql(
    "q11_important_parts",
    # q11 pattern: GROUP BY + HAVING against a scalar subquery over the
    # same aggregate (per-part stock value vs a fraction of the total)
    """SELECT l_partkey,
              CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS value
       FROM lineitem
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_3'
       GROUP BY l_partkey
       HAVING CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
              > (SELECT CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) * 0.002
                 FROM lineitem
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_3')""",
)

shared_sql(
    "q16_supplier_cnt",
    # q16 pattern: COUNT(DISTINCT) per attribute group with a NOT IN
    # anti-subquery (suppliers in bad standing excluded)
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM part
       JOIN lineitem ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#3'
         AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size""",
)

shared_sql(
    "q20_excess_stock_suppliers",
    # q20 pattern: nested IN subquery with HAVING — suppliers that moved
    # more than a threshold quantity of pattern-matched parts in a year
    """SELECT s_name, n_name
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name IN ('NATION_7', 'NATION_8')
         AND s_suppkey IN (
           SELECT l_suppkey
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           WHERE p_name LIKE '%widget%'
             AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           GROUP BY l_suppkey
           HAVING SUM(l_quantity) > 50)""",
)


# ---------------------------------------------------------------------------
# N1/N2 closure — duplicate CLUSTERS (connected components over the
# near-dup pair graph) and the per-cluster keep/drop decision.  The oracle
# recomputes the same Jaccard pair graph in DuckDB SQL and closes it with a
# recursive CTE (transitive reachability -> min reachable id = component).
# ---------------------------------------------------------------------------

@query(
    "n1_dedup_clusters",
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       sh AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(range(0, len(sp)-2),
                            i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]))) AS shingle
              FROM toks WHERE len(sp) >= 3),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
       pairs AS (SELECT id_a, id_b FROM (
                   SELECT id_a, id_b,
                          CAST(inter AS DOUBLE)
                               / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
                   FROM shared
                   JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b) t
                 WHERE jaccard >= 0.2),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(src, dst) AS (SELECT a, b FROM edges
                           UNION
                           SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
       comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
                FROM reach GROUP BY src)
       SELECT d.doc_id,
              CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
              CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
                        THEN 1 ELSE 0 END AS INT) AS is_kept
       FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""",
)
def n1_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N2 closure: near-dup PAIRS (3-gram Jaccard >= 0.2) resolved into
    duplicate CLUSTERS via distributed connected components (min-label
    propagation, O(diameter) shuffle rounds — see operators/cluster.py),
    then one representative kept per cluster.  This is the op that turns a
    similarity stage into an actual corpus dedup pass."""
    from .operators.cluster import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.jaccard_pairs(docs, min_jaccard=0.2)
    return dedup_clusters(docs, pairs, id_col="doc_id").select(
        "doc_id", "component", "is_kept"
    )


# ---------------------------------------------------------------------------
# N5 — training-corpus assembly ops: deterministic split, mixture
# sampling, sequence packing, benchmark decontamination, vocabulary.
# All keyed on a PORTABLE md5 prefix hash (see operators/sampling.py), so
# the oracles recompute the identical assignment in DuckDB.
# ---------------------------------------------------------------------------

from .operators.sampling import rate_threshold_hex as _rth  # noqa: E402

_T80 = _rth(0.8)
_T90 = _rth(0.9)
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1


@query(
    "n5_train_split",
    f"""SELECT doc_id,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6) < '{_T80}'
                        THEN 'train'
                   WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6) < '{_T90}'
                        THEN 'val'
                   ELSE 'test' END AS split
       FROM documents""",
)
def n5_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: deterministic 80/10/10 train/val/test assignment from a
    portable md5 prefix of the doc id — same id => same split on any
    engine, any cluster size, any day.  Pure narrow map (no shuffle);
    the oracle recomputes the identical hash in DuckDB."""
    from .operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "n5_mixture_sample",
    f"""SELECT doc_id, source FROM documents
       WHERE CASE source
               WHEN 'src0' THEN substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 6) < '{_rth(1.0)}'
               WHEN 'src1' THEN substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 6) < '{_rth(0.5)}'
               WHEN 'src2' THEN substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 6) < '{_rth(0.25)}'
               ELSE substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 6) < '{_rth(0.1)}'
             END""",
)
def n5_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: weighted corpus mixture — keep 100% of src0, 50% of src1, 25%
    of src2, 10% of everything else, deterministically per doc id (no
    Bernoulli sampleBy, whose draws depend on seed and partitioning).
    Narrow map; the filter pushes to the scan."""
    from .operators.sampling import weighted_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_mixture_sample(
        docs, "doc_id", "source", _MIX_RATES, default_rate=_MIX_DEFAULT
    ).select("doc_id", "source")


@query(
    "n5_pack_chunks",
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                  FROM documents),
       c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS start_offset
             FROM t)
       SELECT doc_id, n_tokens, start_offset,
              start_offset // 512 AS first_chunk,
              (CASE WHEN n_tokens > 0 THEN start_offset + n_tokens - 1
                    ELSE start_offset END) // 512 AS last_chunk
       FROM c""",
)
def n5_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: concat-and-chunk sequence packing — documents concatenated in
    doc_id order into one token stream cut into 512-token training
    windows; each doc reports its chunk span.  The running offset is a
    DISTRIBUTED two-phase prefix sum (per-shard window + broadcast shard
    offsets — operators/sampling.py), not the single-partition global
    window the naive formulation plans; the oracle states the same thing
    as the global window, which is fine for DuckDB."""
    from .operators.sampling import pack_chunks
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return pack_chunks(
        docs, "doc_id", F.size(tokens("text")), chunk_tokens=512
    ).select("doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk")


@query(
    "n5_pack_bins",
    """WITH RECURSIVE
       t AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    doc_id // 128 AS shard
             FROM documents),
       d AS (SELECT doc_id, n_tokens, shard,
                    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
             FROM t),
       s(shard, rn, doc_id, n_tokens, bin, fill) AS (
         SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
         FROM d WHERE rn = 1
         UNION ALL
         SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
                CASE WHEN s.fill + d.n_tokens <= 512 THEN s.bin ELSE s.bin + 1 END,
                CASE WHEN s.fill + d.n_tokens <= 512 THEN s.fill + d.n_tokens
                     ELSE d.n_tokens END
         FROM s JOIN d ON d.shard = s.shard AND d.rn = s.rn + 1),
       counts AS (SELECT shard, MAX(bin) + 1 AS nb FROM s GROUP BY shard),
       offs AS (SELECT shard,
                       CAST(COALESCE(SUM(nb) OVER (ORDER BY shard
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS off
                FROM counts)
       SELECT s.doc_id, s.n_tokens, s.bin + o.off AS bin
       FROM s JOIN offs o ON o.shard = s.shard""",
)
def n5_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: greedy NO-SPLIT sequence packing (512-token bins, docs never
    straddle) — per-shard stateful Arrow kernel (applyInPandas) + the
    broadcast prefix-sum bin renumbering; the oracle replays the exact
    greedy recursion per shard with a recursive CTE."""
    from .operators.sampling import pack_bins
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return pack_bins(docs, "doc_id", F.size(tokens("text")), capacity=512, shard_size=128)


@query(
    "n5_length_buckets",
    """WITH t AS (SELECT doc_id,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents)
       SELECT CAST(length(bin(n_tokens + 1)) - 1 AS INT) AS bucket,
              COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              MIN(n_tokens) AS min_tokens,
              MAX(n_tokens) AS max_tokens
       FROM t GROUP BY 1""",
)
def n5_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: power-of-two length bucketing — batch documents of similar
    token count together so fixed-shape training batches waste minimal
    padding.  Bucket = bit_length(n+1)-1 == floor(log2(n+1)) computed
    via the binary-string length, which is INTEGER-exact in both engines
    (libm log2 is not guaranteed correctly rounded at power-of-two
    boundaries).  One narrow map + one aggregation."""
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return t.groupBy(
        (F.length(F.bin(F.col("n_tokens") + 1)) - 1).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@query(
    "n5_decontaminate",
    """WITH bench AS (SELECT * FROM documents WHERE doc_id % 53 = 0),
       corpus AS (SELECT * FROM documents WHERE doc_id % 53 <> 0),
       bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT string_split(text, ' ') AS sp FROM bench)
              WHERE len(sp) >= 8),
       csh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM corpus)
              WHERE len(sp) >= 8),
       hit AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.shingle = b.shingle)
       SELECT doc_id, source FROM corpus
       WHERE doc_id NOT IN (SELECT doc_id FROM hit)""",
)
def n5_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: benchmark decontamination — drop every corpus doc sharing any
    8-token shingle with the held-out benchmark subset (here: doc_id
    divisible by 53).  Benchmark shingles broadcast; corpus scanned once;
    no pairwise blowup (operators/dedup.py ngram_decontaminate)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    corpus = docs.filter(F.col("doc_id") % 53 != 0)
    return _dedup.ngram_decontaminate(corpus, bench, n=8).select("doc_id", "source")


def _x11_register():
    # identical result contract to n5_decontaminate (bloom prune + exact
    # verify ≡ broadcast semi-join), so the oracle SQL is shared verbatim
    oracle = ORACLES["n5_decontaminate"]

    @query("x11_bloom_decontaminate", oracle)
    def x11_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Scale op: decontamination when the BENCHMARK shingle set
        outgrows the broadcast budget (multi-benchmark suites at n=8..13
        reach 10^8+ distinct shingles).  A constant-size Bloom bitmap
        prunes the corpus shingle stream with a narrow filter, and only
        surviving candidates enter the exact shuffled semi-join — the
        result is identical to n5_decontaminate by construction, which
        is exactly what the shared oracle checks.  The same composition
        x10 proves at the key level, applied to the n-gram
        decontamination pipeline."""
        docs = load_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") % 53 == 0)
        corpus = docs.filter(F.col("doc_id") % 53 != 0)
        return _dedup.ngram_decontaminate(
            corpus, bench, n=8, via="bloom", bloom_bits=61_440
        ).select("doc_id", "source")


_x11_register()


@query(
    "n5_contamination_report",
    """WITH bench AS (SELECT * FROM documents WHERE doc_id % 53 = 0),
       corpus AS (SELECT * FROM documents WHERE doc_id % 53 <> 0),
       bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT string_split(text, ' ') AS sp FROM bench)
              WHERE len(sp) >= 8),
       csh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM corpus)
              WHERE len(sp) >= 8)
       SELECT c.doc_id,
              COUNT(*) AS n_shingles,
              COUNT(b.shingle) AS n_contaminated,
              CAST(COUNT(b.shingle) AS DOUBLE) / COUNT(*) AS contamination
       FROM csh c LEFT JOIN bsh b ON c.shingle = b.shingle
       GROUP BY c.doc_id""",
)
def n5_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: graded contamination audit — per corpus doc, the fraction of
    its distinct 8-token shingles found in the benchmark subset.  The
    boolean decontaminate filter (n5_decontaminate) drops on ANY overlap;
    this measures HOW MUCH, which is what you inspect before choosing a
    threshold.  Same scale shape: broadcast benchmark shingles, one
    corpus shingle scan, one doc-id shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    corpus = docs.filter(F.col("doc_id") % 53 != 0)
    return _dedup.contamination_report(corpus, bench, n=8)


@query(
    "n5_vocab_topk",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
       r AS (SELECT token, n,
                    ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
             FROM cnt)
       SELECT CAST(rank AS INT) AS rank, token, n FROM r WHERE rank <= 100""",
)
def n5_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: corpus vocabulary — top-100 tokens by frequency (ties broken
    by token).  explode -> count (one shuffle with map-side partials) ->
    orderBy+limit, which Spark plans as TakeOrderedAndProject: each
    partition keeps its local top-100, the driver merges — no global
    sort at any scale.  The rank column is re-derived over the final 100
    rows only."""
    from .operators.text import tokens
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = cnt.orderBy(F.col("n").desc(), F.col("token").asc()).limit(100)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "token", "n"
    )


@query(
    "n5_tfidf_topterms",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM documents),
       tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
       dft AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (SELECT tf.doc_id, tf.token,
                         CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dft.df AS DOUBLE) AS tfidf
                  FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN n)
       SELECT doc_id, token, tfidf, CAST(rank AS INT) AS rank FROM (
         SELECT doc_id, token, tfidf,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rank
         FROM scored) r
       WHERE rank <= 3""",
)
def n5_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: top-3 characteristic terms per document by TF-IDF.  The idf is
    the RATIONAL form tf·N/df — integer-derived IEEE division, so both
    engines produce bit-identical scores (ln() is libm-dependent and
    engine-specific; the ranking it induces is identical).  Two shuffles
    (tf and df aggregations), df side joined back on token; the 1-row
    corpus count broadcasts."""
    from .operators.text import tokens
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dft = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double")).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
    )


@query(
    "n4_bigram_rarity",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       big AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
               FROM toks, UNNEST(range(1, len(t))) r(i)),
       cnt AS (SELECT bigram, count(*) AS freq FROM big GROUP BY bigram),
       per AS (SELECT b.doc_id, count(*) AS n_bigrams,
                      count(*) FILTER (freq <= 2) AS n_rare,
                      sum(freq) AS sum_freq
               FROM big b JOIN cnt USING (bigram) GROUP BY b.doc_id)
       SELECT d.doc_id,
              COALESCE(p.n_bigrams, 0) AS n_bigrams,
              CAST(p.n_rare AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE) AS rare_frac,
              CAST(p.sum_freq AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE) AS mean_bigram_freq
       FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""",
)
def n4_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4/N5: corpus-LM quality scoring — rare-bigram fraction + mean
    corpus bigram frequency per document (the rational-form CCNet
    perplexity filter; see operators/text.bigram_rarity for the scale
    shape: model never collected, one bigram-key shuffle join)."""
    from .operators.text import bigram_rarity

    docs = load_table(spark, sf_dir, "documents")
    return bigram_rarity(docs)


@query(
    "n5_hot_span_scrub",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       tp AS (SELECT doc_id, i - 1 AS tpos, t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) r(i)),
       sh AS (SELECT doc_id, i - 1 AS pos,
                     list_aggregate(t[i:i+7], 'string_agg', ' ') AS span
              FROM toks, UNNEST(range(1, len(t) - 6)) r(i)),
       hot AS (SELECT span FROM sh GROUP BY span HAVING count(*) >= 2),
       cov AS (SELECT DISTINCT sh.doc_id, sh.pos + k AS tpos
               FROM sh JOIN hot USING (span), UNNEST(range(0, 8)) rk(k)),
       kept AS (SELECT tp.doc_id, tp.tpos, tp.tok
                FROM tp LEFT JOIN cov
                  ON tp.doc_id = cov.doc_id AND tp.tpos = cov.tpos
                WHERE cov.doc_id IS NULL),
       re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS scrubbed_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
       SELECT t.doc_id,
              COALESCE(re.scrubbed_text, '') AS scrubbed_text,
              CAST(len(t.t) - COALESCE(re.n_kept, 0) AS INT) AS n_tokens_removed
       FROM toks t LEFT JOIN re ON t.doc_id = re.doc_id""",
)
def n5_hot_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: repeated-span removal — n-gram approximation of exact-
    substring dedup (Lee et al., arXiv:2107.06499): every token covered
    by an 8-token span that occurs >= 2 times anywhere in the corpus is
    scrubbed; documents reassemble from the surviving tokens in order.
    Catches the planted near-dup documents' shared spans without any
    all-pairs comparison (see operators/text.hot_span_scrub)."""
    from .operators.text import hot_span_scrub

    docs = load_table(spark, sf_dir, "documents")
    return hot_span_scrub(docs, n=8, min_count=2)


@query(
    "n1_corpus_passage_dedup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       tp AS (SELECT doc_id, i - 1 AS tpos, t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) r(i)),
       sh AS (SELECT doc_id, i - 1 AS pos,
                     ('0x' || substr(md5(list_aggregate(t[i:i+7], 'string_agg', ' ')), 1, 15))::BIGINT AS fp
              FROM toks, UNNEST(range(1, len(t) - 6)) r(i)),
       hot AS (SELECT fp FROM sh GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
       hits AS (SELECT sh.doc_id, sh.pos,
                       ROW_NUMBER() OVER (PARTITION BY sh.fp
                                          ORDER BY sh.doc_id, sh.pos) AS rn
                FROM sh JOIN hot USING (fp)),
       cov AS (SELECT DISTINCT doc_id, pos + k AS tpos
               FROM hits, UNNEST(range(0, 8)) rk(k) WHERE rn > 1),
       kept AS (SELECT tp.doc_id, tp.tpos, tp.tok
                FROM tp LEFT JOIN cov
                  ON tp.doc_id = cov.doc_id AND tp.tpos = cov.tpos
                WHERE cov.doc_id IS NULL),
       re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS scrubbed_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
       SELECT t.doc_id,
              COALESCE(re.scrubbed_text, '') AS scrubbed_text,
              CAST(len(t.t) - COALESCE(re.n_kept, 0) AS INT) AS n_tokens_removed
       FROM toks t LEFT JOIN re ON t.doc_id = re.doc_id""",
)
def n1_corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 (round 8, verdict item #3): CORPUS-WIDE repeated-passage
    removal — the cross-document n-gram form of Lee et al.'s
    exact-substring training-data dedup.  8-token spans whose portable
    rolling fingerprint appears in >= 2 DISTINCT documents are trimmed
    from every occurrence EXCEPT the lexicographically-first
    (doc_id, pos) canonical copy, which survives.  Differs from
    n5_hot_span_scrub in all three ways that matter at 100 TB: the
    shuffle keys are fixed-width 60-bit hashes (not ~50-byte span
    text), the threshold counts distinct DOCUMENTS (cross-document
    duplication, not within-doc repetition), and one canonical copy is
    kept (dedup, not deletion).  The DuckDB oracle replays the
    identical fingerprint chain, distinct-doc count, canonical-pick
    window and rebuild (operators/text.corpus_span_dedup)."""
    from .operators.text import corpus_span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return corpus_span_dedup(docs, n=8, min_docs=2, keep="first")


@query(
    "n1_line_dedup",
    """WITH base AS (
         SELECT d.doc_id,
                substr(d.text, 1, 120) || chr(10) || substr(r.text, 1, 120)
                  || chr(10) || 'FOOTER-' || CAST(d.doc_id % 7 AS VARCHAR) AS text
         FROM documents d JOIN documents r ON r.doc_id = d.doc_id % 50),
       ln AS (SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     unnest(range(0, len(string_split(text, chr(10))))) AS pos
              FROM base),
       hot AS (SELECT ('0x' || substr(md5(line), 1, 15))::BIGINT AS h
               FROM ln WHERE length(line) >= 1
               GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5),
       kept AS (SELECT l.doc_id, l.pos, l.line FROM ln l
                WHERE length(l.line) < 1
                   OR ('0x' || substr(md5(l.line), 1, 15))::BIGINT
                      NOT IN (SELECT h FROM hot)),
       re AS (SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS scrubbed_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
       SELECT b.doc_id,
              COALESCE(re.scrubbed_text, '') AS scrubbed_text,
              CAST(len(string_split(b.text, chr(10))) - COALESCE(re.n_kept, 0)
                   AS INT) AS n_lines_removed
       FROM base b LEFT JOIN re ON b.doc_id = re.doc_id""",
)
def n1_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 (round 9): LINE-level boilerplate removal — the CCNet /
    RefinedWeb per-line dedup modality n-gram passage dedup misses:
    a line occurring in >= 5 DISTINCT documents (footers, banners,
    navigation) is dropped from every document, survivors reassemble
    in order.  The entry PLANTS the boilerplate deterministically so
    both engines see the same corpus: each document becomes three
    lines — its own 120-char prefix, the prefix of document
    (doc_id % 50) (shared by exactly the ~10 documents that alias onto
    it), and a FOOTER-(doc_id % 7) line shared by ~71 documents — so
    removal must fire on the planted lines and nothing else.  Shuffle
    keys are 60-bit portable line hashes the oracle replays verbatim
    (operators/text.line_dedup)."""
    from .operators.text import line_dedup

    d = load_table(spark, sf_dir, "documents")
    r = d.select(F.col("doc_id").alias("rid"), F.col("text").alias("rtext"))
    base = (
        d.join(r, r["rid"] == d["doc_id"] % 50)
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.substring(F.col("text"), 1, 120),
                F.substring(F.col("rtext"), 1, 120),
                F.concat(F.lit("FOOTER-"), (F.col("doc_id") % 7).cast("string")),
            ).alias("text"),
        )
    )
    return line_dedup(base, min_doc_freq=5, keep="none")


@query(
    "n2_knn_classify",
    f"""WITH {_UNIT_SQL},
       q AS (SELECT vec_id AS query_id, uv AS qv FROM nrm WHERE vec_id < 10),
       s AS (SELECT q.query_id, c.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qv, c.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM nrm c CROSS JOIN q WHERE c.vec_id <> q.query_id),
       top AS (SELECT query_id, nbr_id FROM (
                 SELECT query_id, nbr_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, nbr_id) AS rank
                 FROM s) r WHERE rank <= 10),
       votes AS (SELECT t.query_id, e.label, count(*) AS votes
                 FROM top t JOIN embeddings e ON e.vec_id = t.nbr_id
                 GROUP BY 1, 2)
       SELECT query_id, label AS pred_label, votes FROM (
         SELECT query_id, label, votes,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label) AS rn
         FROM votes) v
       WHERE rn = 1""",
)
def n2_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): k-NN CLASSIFICATION by retrieval — the label of
    each query vector is the majority label among its cosine top-10
    neighbors (ties → most votes, then smallest label).  The
    embedding-space labeler that transfers topic/quality labels from a
    seed set to a corpus; feed IVF candidates through the same vote at
    real scale (operators/similarity.knn_classify)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.knn_classify(emb, qs, k=10)


@query(
    "n2_label_centroids",
    """SELECT label, CAST(i AS INT) AS dim,
              CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_val
       FROM (SELECT label,
                    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
                    unnest(range(0, len(embedding))) AS i
             FROM embeddings)
       GROUP BY label, i""",
)
def n2_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: per-label embedding centroid, computed DISTRIBUTED as an
    element-wise aggregation: posexplode the vectors, aggregate each
    (label, dim) cell — one shuffle with map-side partials, never a
    collect of vectors to the driver.  Sums go through DECIMAL(18,6) so
    they are order-independent and cross-engine exact; the mean is then
    one IEEE division.  (Long/narrow output: the driver's row hasher
    can't hash array columns.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return cells.groupBy("label", F.col("pos").cast("int").alias("dim")).agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_val")
    )


@query("n2_editdist_neardup", None)
def n2_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: character-level near-dup pairs — MinHash-LSH candidates
    reranked by Levenshtein distance on a 64-char prefix, the modality
    token-set Jaccard misses (in-place edits vs paragraph reorders).
    Candidates come from the same band-bucket equi-join as every LSH
    family (no all-pairs stage); the O(prefix²) DP runs JVM-side on
    candidates only.  Oracle: the shared minhash CTE chain + DuckDB's
    own levenshtein — identical pair set and distances."""
    from .operators import dedup as _d

    docs = load_table(spark, sf_dir, "documents")
    return _d.editdist_neardup(docs, portable=True)


ORACLES["n2_editdist_neardup"] = _dedup.editdist_pairs_sql()


@query(
    "n1_dedup_incremental",
    f"""WITH pairs AS (SELECT * FROM ({_dedup.minhash_pairs_sql()}) fp),
       drops AS (SELECT id_b AS did FROM pairs WHERE id_b % 5 = 0
                 UNION
                 SELECT id_a FROM pairs
                 WHERE id_a % 5 = 0 AND id_b % 5 <> 0)
       SELECT doc_id, source FROM documents
       WHERE doc_id % 5 = 0
         AND doc_id NOT IN (SELECT did FROM drops)""",
)
def n1_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: INCREMENTAL near-dup dedup — an arriving batch (doc_id % 5
    = 0) dedups against the already-indexed corpus (the rest) plus its
    own lower ids, WITHOUT re-processing the corpus: corpus minhash
    signatures are the stored index (precomputed here to model that),
    only the batch runs shingle->minhash, candidate joins are
    band-bucket equi-joins (batch x corpus, batch x batch — never
    corpus x corpus), and exact Jaccard reranks candidates only.  The
    oracle derives the same answer from the full-table pair list
    restricted to pairs touching the batch — valid because per-doc
    signatures are independent, so the incremental candidate set equals
    the full-table one filtered to batch-touching pairs."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # the stored index is MATERIALIZED (a real deployment reads it from
    # storage): left lazy, the op's two index consumers (bucket stats +
    # hot-guard tag) would each re-run the whole corpus shingle->minhash
    # pipeline — the exact recompute the incremental path exists to avoid
    corpus_sigs = _dedup.minhash_signatures(corpus, portable=True).localCheckpoint(
        eager=True
    )
    return _dedup.minhash_dedup_incremental(
        batch, corpus, portable=True, corpus_sigs=corpus_sigs
    ).select("doc_id", "source")


_IVF_PART_SQL = """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  nrm AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                     list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
          FROM u),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i FROM u)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                 list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
            FROM cents),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM (SELECT n.vec_id, cn.cid,
                       list_reduce(list_transform(list_zip(n.uv, cn.uc),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS sim
                FROM nrm n CROSS JOIN cnorm cn)),
  assigned AS (SELECT vec_id, cid AS cluster FROM asg WHERE rn = 1),
  q AS (SELECT vec_id AS query_id, uv AS qu FROM nrm WHERE vec_id < 3),
  qp AS (SELECT query_id, cid,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, cid) AS rn
         FROM (SELECT q.query_id, cn.cid,
                      list_reduce(list_transform(list_zip(q.qu, cn.uc),
                          p -> p[1] * p[2]), (x, y) -> x + y) AS sim
               FROM q CROSS JOIN cnorm cn)),
  probes AS (SELECT query_id, cid FROM qp WHERE rn <= 3),
  scored AS (SELECT q.query_id, n.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qu, n.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
             FROM q JOIN probes p USING (query_id)
             JOIN assigned a ON a.cluster = p.cid
             JOIN nrm n ON n.vec_id = a.vec_id
             WHERE n.vec_id <> q.query_id)
  SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, cosine FROM (
    SELECT query_id, nbr_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, nbr_id) AS rank
    FROM scored) r
  WHERE rank <= 10"""


@query("ann_ivf_partitioned", _IVF_PART_SQL)
def ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: IVF with the index WRITTEN PARTITIONED BY CLUSTER — the disk
    layout that turns 'probe 3 of 10 lists' into static partition
    pruning at the parquet source: only the probed cluster directories
    are listed or read, so the per-query scan fraction is enforced by
    the FILESYSTEM, not a post-scan filter.  The coarse quantizer here
    is the per-label centroid set (decimal-exact means, deterministic),
    which makes the whole pipeline — assignment argmax, probe choice,
    pruned candidate set, rerank top-10 — bit-replayable in DuckDB,
    unlike the sampled-k-means IVF (rows-only by design).  Driver state
    is bounded: k x d centroid cells and n_queries x n_probe probe ids.
    test_northstar asserts PartitionFilters actually appear in the
    pruned scan's plan."""
    import shutil
    import tempfile

    from .operators.similarity import _dot, _norm, with_unit_vector

    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cellrows = cells.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mv")
    ).collect()  # bounded: k labels x d dims
    by_label: dict[int, dict[int, float]] = {}
    for r in cellrows:
        by_label.setdefault(r["label"], {})[r["pos"]] = r["mv"]
    cents = [
        (cid, [by_label[cid][i] for i in range(len(by_label[cid]))])
        for cid in sorted(by_label)
    ]

    def unit_lit(vals):
        arr = F.array(*[F.lit(float(x)) for x in vals])
        n = _norm(arr)
        return F.transform(arr, lambda x: x / n)

    cid_arr = F.array(*[F.lit(int(cid)) for cid, _ in cents])

    def sims_for(ucol):
        return F.array(*[_dot(ucol, unit_lit(c)) for _, c in cents])

    uemb = with_unit_vector(emb, "embedding", "cu").select("vec_id", "cu")
    s = sims_for(F.col("cu"))
    assigned = uemb.withColumn(
        "cluster",
        F.element_at(cid_arr, (F.array_position(s, F.array_max(s))).cast("int")),
    )
    d = tempfile.mkdtemp(prefix="bdmc_ivfidx_")
    try:
        assigned.write.partitionBy("cluster").parquet(d, mode="overwrite")
        qs = sims_for(F.col("qu"))
        probe_pairs = F.transform(
            qs, lambda sim, i: F.struct((-sim).alias("neg"), i.alias("idx"))
        )
        probes = F.transform(
            F.slice(F.array_sort(probe_pairs), 1, 3),
            lambda p: F.element_at(cid_arr, p["idx"].cast("int") + 1),
        )
        q = (
            with_unit_vector(emb.filter(F.col("vec_id") < 3), "embedding", "qu")
            .select(F.col("vec_id").alias("query_id"), "qu")
            .withColumn("probes", probes)
        )
        # bounded collect (n_queries x n_probe ids) -> STATIC partition
        # pruning: the scan lists only the probed cluster directories
        probe_rows = q.select(F.explode("probes").alias("cluster"), "query_id", "qu")
        wanted = sorted(
            {r["cluster"] for r in probe_rows.select("cluster").distinct().collect()}
        )
        idx = spark.read.parquet(d).where(F.col("cluster").isin(wanted))
        cand = idx.join(probe_rows, "cluster").filter(
            F.col("vec_id") != F.col("query_id")
        )
        from pyspark.sql import Window

        scored = cand.select(
            "query_id",
            F.col("vec_id").alias("nbr_id"),
            _dot(F.col("qu"), F.col("cu")).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("nbr_id").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "nbr_id", F.col("rank").cast("int").alias("rank"), "cosine")
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


_IVF_INCR_SQL = """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  nrm AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                     list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
          FROM u),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i
                  FROM u WHERE vec_id % 5 <> 0)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                 list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
            FROM cents),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM (SELECT n.vec_id, cn.cid,
                       list_reduce(list_transform(list_zip(n.uv, cn.uc),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS sim
                FROM nrm n CROSS JOIN cnorm cn)),
  assigned AS (SELECT vec_id, cid AS cluster FROM asg WHERE rn = 1),
  q AS (SELECT vec_id AS query_id, uv AS qu FROM nrm WHERE vec_id < 3),
  qp AS (SELECT query_id, cid,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, cid) AS rn
         FROM (SELECT q.query_id, cn.cid,
                      list_reduce(list_transform(list_zip(q.qu, cn.uc),
                          p -> p[1] * p[2]), (x, y) -> x + y) AS sim
               FROM q CROSS JOIN cnorm cn)),
  probes AS (SELECT query_id, cid FROM qp WHERE rn <= 3),
  scored AS (SELECT q.query_id, n.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qu, n.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
             FROM q JOIN probes p USING (query_id)
             JOIN assigned a ON a.cluster = p.cid
             JOIN nrm n ON n.vec_id = a.vec_id
             WHERE n.vec_id <> q.query_id)
  SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, cosine FROM (
    SELECT query_id, nbr_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, nbr_id) AS rank
    FROM scored) r
  WHERE rank <= 10"""


@query("ann_ivf_incremental", _IVF_INCR_SQL)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: INCREMENTAL IVF index maintenance (round-7, the ANN twin of
    n1_dedup_incremental): the cluster-partitioned index is built from
    the CORPUS slice (vec_id % 5 != 0) with corpus-trained centroids;
    the remaining vectors arrive later as a batch and are APPENDED via
    ivf_index_append — one narrow pass over the batch assigning it to
    the EXISTING centroids, zero corpus reads, zero rebuild.  Queries
    over the combined index then equal a from-scratch rebuild with the
    same quantizer exactly (assignment is per-vector and centroid-only),
    which is what the oracle replays: corpus-only centroid cells,
    all-vector assignment, probe-3, rerank top-10 — bit-identical
    because the quantizer is the decimal-exact per-label mean, as in
    ann_ivf_partitioned (similarity.py ivf_index_write/append/query)."""
    import shutil
    import tempfile

    from .operators.similarity import (
        ivf_index_append,
        ivf_index_query,
        ivf_index_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    # deterministic quantizer: decimal-exact per-label means of the
    # CORPUS ONLY — the batch arrives after training, as in production
    cellrows = (
        corpus.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mv")
        )
        .collect()
    )  # bounded: k labels x d dims
    by_label: dict[int, dict[int, float]] = {}
    for r in cellrows:
        by_label.setdefault(r["label"], {})[r["pos"]] = r["mv"]
    cents = [
        [by_label[cid][i] for i in range(len(by_label[cid]))]
        for cid in sorted(by_label)
    ]
    d = tempfile.mkdtemp(prefix="bdmc_ivfincr_")
    try:
        ivf_index_write(corpus, cents, d)
        ivf_index_append(batch, cents, d)
        out = ivf_index_query(
            spark,
            d,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            cents,
            k=10,
            n_probe=3,
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _label_mean_centroids(emb: DataFrame) -> list[list[float]]:
    """Decimal-exact per-label mean vectors, sorted by label — the
    deterministic quantizer the oracle-exact IVF entries share (labels
    are contiguous 0..k-1 in the fixture, so list index == label ==
    oracle cid).  Driver state bounded by k labels × d dims."""
    cellrows = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mv")
        )
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in cellrows:
        by_label.setdefault(r["label"], {})[r["pos"]] = r["mv"]
    return [
        [by_label[cid][i] for i in range(len(by_label[cid]))]
        for cid in sorted(by_label)
    ]


_IVF_STATS_SQL = """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  nrm AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                     list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
          FROM u),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i
                  FROM u)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                 list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
            FROM cents),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM (SELECT n.vec_id, cn.cid,
                       list_reduce(list_transform(list_zip(n.uv, cn.uc),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS sim
                FROM nrm n CROSS JOIN cnorm cn))
  SELECT CAST(cid AS INT) AS cluster, COUNT(*) AS n_vectors
  FROM asg WHERE rn = 1 GROUP BY cid"""


@query("ann_ivf_stats", _IVF_STATS_SQL)
def ann_ivf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8, item #6): per-cluster inverted-list sizes of a
    disk-resident IVF index — the balance diagnostic that detects
    quantizer drift and triggers ivf_index_retrain.  The stats read
    touches only the PARTITION column (column pruning leaves no data
    columns), so at 100 TB the cost is metadata work.  Quantizer =
    decimal-exact per-label means, so the oracle replays the exact
    assignment argmax and per-cluster counts."""
    import shutil
    import tempfile

    from .operators.similarity import ivf_index_stats, ivf_index_write

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _label_mean_centroids(emb)
    d = tempfile.mkdtemp(prefix="bdmc_ivfstats_")
    try:
        ivf_index_write(emb, cents, d)
        out = ivf_index_stats(spark, d)
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


@query("ann_ivf_retrain", _IVF_PART_SQL)
def ann_ivf_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8, item #2): quantizer RETRAIN + atomic index rewrite
    — the fix for ivf_index_append's documented drift caveat.  The
    index is first written with a STALE 2-centroid quantizer (every
    list fat and unbalanced); ivf_index_retrain reassigns the stored
    vectors to the full per-label quantizer in one pass over the OLD
    INDEX (the raw corpus is never re-read) and swaps the rewritten
    tree in via two directory renames.  Queries over the retrained
    index must equal a from-scratch ivf_index_write with the same new
    centroids EXACTLY — which is precisely what the oracle replays
    (the same SQL as ann_ivf_partitioned: all-vector per-label
    assignment, probe-3, top-10), so any retrain-path drift (double
    normalization, wrong tie-break, stale rows surviving the swap)
    hash-mismatches."""
    import shutil
    import tempfile

    from .operators.similarity import (
        ivf_index_query,
        ivf_index_retrain,
        ivf_index_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents_all = _label_mean_centroids(emb)
    d = tempfile.mkdtemp(prefix="bdmc_ivfretrain_")
    try:
        # stale quantizer: only the first two labels' centroids
        ivf_index_write(emb, cents_all[:2], d)
        new_cents = ivf_index_retrain(spark, d, new_centroids=cents_all)
        out = ivf_index_query(
            spark,
            d,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            new_cents,
            k=10,
            n_probe=3,
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


_IVF_L2_SQL = """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i
                  FROM u)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY d2 ASC, cid) AS rn
          FROM (SELECT un.vec_id, ct.cid,
                       list_reduce(list_transform(list_zip(un.v, ct.c),
                           p -> (p[1] - p[2]) * (p[1] - p[2])),
                           (x, y) -> x + y) AS d2
                FROM u un CROSS JOIN cents ct)),
  assigned AS (SELECT vec_id, cid AS cluster FROM asg WHERE rn = 1),
  q AS (SELECT vec_id AS query_id, v AS qv FROM u WHERE vec_id < 3),
  qp AS (SELECT query_id, cid,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2 ASC, cid) AS rn
         FROM (SELECT q.query_id, ct.cid,
                      list_reduce(list_transform(list_zip(q.qv, ct.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2])),
                          (x, y) -> x + y) AS d2
               FROM q CROSS JOIN cents ct)),
  probes AS (SELECT query_id, cid FROM qp WHERE rn <= 3),
  scored AS (SELECT q.query_id, un.vec_id AS nbr_id,
                    sqrt(list_reduce(list_transform(list_zip(q.qv, un.v),
                        p -> (p[1] - p[2]) * (p[1] - p[2])),
                        (x, y) -> x + y)) AS l2_dist
             FROM q JOIN probes p USING (query_id)
             JOIN assigned a ON a.cluster = p.cid
             JOIN u un ON un.vec_id = a.vec_id
             WHERE un.vec_id <> q.query_id)
  SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, l2_dist FROM (
    SELECT query_id, nbr_id, l2_dist,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY l2_dist ASC, nbr_id) AS rank
    FROM scored) r
  WHERE rank <= 10"""


@query("ann_ivf_l2", _IVF_L2_SQL)
def ann_ivf_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8, item #5): the IVF index family under the L2 metric
    — embedding stores routinely serve Euclidean, not cosine.  RAW
    vectors stored (L2 is not scale-invariant, so no normalization
    anywhere), assignment and probe choice by squared-distance ARGMIN
    (ties to the lowest centroid index), candidates reranked by exact
    distance ascending.  Quantizer = decimal-exact per-label RAW means,
    so the DuckDB oracle replays assignment, probe-3 and the top-10
    rerank bit-exactly (same left-fold (a-b)^2 accumulation, same
    IEEE sqrt)."""
    import shutil
    import tempfile

    from .operators.similarity import ivf_index_query, ivf_index_write

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _label_mean_centroids(emb)
    d = tempfile.mkdtemp(prefix="bdmc_ivfl2_")
    try:
        ivf_index_write(emb, cents, d, metric="l2")
        out = ivf_index_query(
            spark,
            d,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            cents,
            k=10,
            n_probe=3,
            metric="l2",
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


@query(
    "ann_ivfpq_index_recall",
    """SELECT 10 AS k, 5 AS n_queries, TRUE AS recall_ok""",
)
def ann_ivfpq_index_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 served from the PERSISTENT IVF-PQ index (round 8):
    the disk artifact stores ONLY 16-byte PQ codes partitioned by
    coarse cluster (32× smaller than the vectors); queries prune to
    the probed cluster directories, ADC-score the codes, and rerank a
    10× shortlist against the full-vector CORPUS by id join.  The
    candidate pipeline is deterministic (seeded quantizer + codebooks
    on ordered samples), recall is a data property: the oracle pins
    the scale-independent >= 0.6 contract; tests pin the exact sf0.01
    scalar AND that the disk path equals the in-memory ivfpq_cosine_topk
    bit-for-bit with the same quantizer."""
    import shutil
    import tempfile

    from .operators.similarity import (
        _kmeans_fit,
        _ordered_sample,
        cosine_topk,
        ivfpq_index_query,
        ivfpq_index_write,
        pq_fit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = _kmeans_fit(_ordered_sample(emb, "vec_id", "embedding", 2048), 16)
    books = pq_fit(emb, 16, 32, 2048)
    d = tempfile.mkdtemp(prefix="bdmc_ivfpqidx_")
    try:
        ivfpq_index_write(emb, cents, books, d)
        got = ivfpq_index_query(
            spark, d, queries_df, emb, cents, books, k=10, n_probe=6
        ).select("query_id", "nbr_id")
        brute = cosine_topk(emb, queries_df, k=10, query_id_col="query_id").select(
            "query_id", "nbr_id"
        )
        joined = brute.join(
            got.withColumn("__hit", F.lit(1)), ["query_id", "nbr_id"], "left"
        )
        out = joined.agg(
            F.lit(10).alias("k"),
            F.count_distinct("query_id").cast("int").alias("n_queries"),
            (
                (F.count("__hit").cast("double") / F.count(F.lit(1)).cast("double"))
                >= F.lit(0.6)
            ).alias("recall_ok"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


_IVF_IP_SQL = """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i
                  FROM u)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY dp DESC, cid) AS rn
          FROM (SELECT un.vec_id, ct.cid,
                       list_reduce(list_transform(list_zip(un.v, ct.c),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS dp
                FROM u un CROSS JOIN cents ct)),
  assigned AS (SELECT vec_id, cid AS cluster FROM asg WHERE rn = 1),
  q AS (SELECT vec_id AS query_id, v AS qv FROM u WHERE vec_id < 3),
  qp AS (SELECT query_id, cid,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dp DESC, cid) AS rn
         FROM (SELECT q.query_id, ct.cid,
                      list_reduce(list_transform(list_zip(q.qv, ct.c),
                          p -> p[1] * p[2]), (x, y) -> x + y) AS dp
               FROM q CROSS JOIN cents ct)),
  probes AS (SELECT query_id, cid FROM qp WHERE rn <= 3),
  scored AS (SELECT q.query_id, un.vec_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qv, un.v),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS ip
             FROM q JOIN probes p USING (query_id)
             JOIN assigned a ON a.cluster = p.cid
             JOIN u un ON un.vec_id = a.vec_id
             WHERE un.vec_id <> q.query_id)
  SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, ip FROM (
    SELECT query_id, nbr_id, ip,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ip DESC, nbr_id) AS rank
    FROM scored) r
  WHERE rank <= 10"""


@query("ann_ivf_ip", _IVF_IP_SQL)
def ann_ivf_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8, item #5): the IVF index family under the INNER-
    PRODUCT metric — the MIPS setting recommendation embeddings use
    (magnitude carries signal, so neither normalization nor distance
    applies).  Raw vectors stored, assignment and probes by raw dot
    ARGMAX (ties to the lowest centroid index), candidates ranked by
    exact dot descending.  Quantizer = per-label raw means, so the
    oracle replays everything bit-exactly, completing the oracle-exact
    metric matrix (cosine: ann_ivf_partitioned, l2: ann_ivf_l2)."""
    import shutil
    import tempfile

    from .operators.similarity import ivf_index_query, ivf_index_write

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _label_mean_centroids(emb)
    d = tempfile.mkdtemp(prefix="bdmc_ivfip_")
    try:
        ivf_index_write(emb, cents, d, metric="ip")
        out = ivf_index_query(
            spark,
            d,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            cents,
            k=10,
            n_probe=3,
            metric="ip",
        )
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


@query(
    "ann_l2_topk",
    """WITH u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM u WHERE vec_id < 5),
       scored AS (SELECT q.query_id, u.vec_id AS nbr_id,
                         sqrt(list_reduce(list_transform(list_zip(q.qv, u.v),
                             p -> (p[1] - p[2]) * (p[1] - p[2])),
                             (x, y) -> x + y)) AS l2_dist
                  FROM u CROSS JOIN q WHERE u.vec_id <> q.query_id)
       SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, l2_dist FROM (
         SELECT query_id, nbr_id, l2_dist,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY l2_dist ASC, nbr_id) AS rank
         FROM scored) r
       WHERE rank <= 10""",
)
def ann_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8, item #5): exact brute-force L2 top-k — the metric
    baseline the L2 ANN paths (ann_ivf_l2, ann_pq_l2_recall) are
    measured against.  Broadcast query side, one raw-vector corpus
    scan, per-query rank window; the oracle recomputes every distance
    with the identical left-fold."""
    from .operators.similarity import l2_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = l2_topk(emb, queries_df, k=10, query_id_col="query_id")
    return out.select(
        "query_id", "nbr_id", F.col("rank").cast("int").alias("rank"), "l2_dist"
    )


@query(
    "ann_pq_l2_recall",
    """SELECT 10 AS k, 5 AS n_queries, TRUE AS recall_ok""",
)
def ann_pq_l2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the L2 product-quantization path (round 8, item #5:
    codebooks fit on RAW subvectors, squared-distance ADC lookup
    tables, exact-L2 rerank of the 10x shortlist) against the exact L2
    brute force.  Like its cosine twin ann_pq_recall the candidate
    pipeline is fully deterministic but achieved recall is a data
    property: the oracle pins the scale-independent >= 0.8 contract and
    tests pin the exact sf0.01 scalar."""
    from .operators.similarity import l2_topk, pq_l2_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = l2_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    pq = pq_l2_topk(emb, queries_df, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id"
    )
    joined = brute.join(pq.withColumn("__hit", F.lit(1)), ["query_id", "nbr_id"], "left")
    return joined.agg(
        F.lit(10).alias("k"),
        F.count_distinct("query_id").cast("int").alias("n_queries"),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)).cast("double"))
            >= F.lit(0.8)
        ).alias("recall_ok"),
    )


def _roundtrip_docs(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Shared S-family round-trip driver: documents -> <fmt> files in a
    temp dir -> read back with the declared schema -> must equal source."""
    import shutil
    import tempfile

    from .sources import textfiles as tf

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    schema = docs.schema
    d = tempfile.mkdtemp(prefix=f"bdmc_{fmt}_rt_")
    try:
        if fmt == "jsonl":
            tf.write_jsonl(docs, d)
            back = tf.read_jsonl(spark, d, schema).drop("_corrupt_record")
        elif fmt == "jsonl_bz2":
            tf.write_jsonl(docs, d, compression="bzip2")
            back = tf.read_jsonl(spark, d, schema).drop("_corrupt_record")
        elif fmt == "csv":
            tf.write_csv(docs, d)
            back = tf.read_csv(spark, d, schema)
        else:
            tf.write_orc(docs, d)
            back = tf.read_orc(spark, d, schema)
        out = back.select("doc_id", "text", "lang", "source", "n_chars")
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


_DOCS_RT_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"


@query("s9_jsonl_roundtrip", _DOCS_RT_SQL)
def s9_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: gzipped JSON-Lines corpus sink/source — the
    interchange format of public LLM corpora — distributed write + schema-
    enforced read (no inference pass; malformed lines quarantine into
    _corrupt_record rather than failing the job).  Round-trip must equal
    the source table exactly."""
    return _roundtrip_docs(spark, sf_dir, "jsonl")


@query("s15_bz2_jsonl_roundtrip", _DOCS_RT_SQL)
def s15_bz2_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension (round 9): bzip2 JSONL corpus sink/source.
    bzip2 is the one Hadoop text codec that is both pure-Java (no
    native-lib dependency, so it works on any executor image) and
    SPLITTABLE (SplittableCompressionCodec): a single multi-TB .bz2
    text file fans out across executors at bzip2-block granularity,
    where a gzip file of any size pins its whole decode to ONE task —
    the difference between a 1000-way and a 1-way scan of a monolithic
    crawl dump.  Same quarantine-on-corrupt read contract as s9.
    Splittability is plan-asserted in tests/test_textfiles.py."""
    return _roundtrip_docs(spark, sf_dir, "jsonl_bz2")


@query("s10_orc_roundtrip", _DOCS_RT_SQL)
def s10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: ORC columnar sink/source (Spark-native reader
    with predicate pushdown/column pruning, like parquet)."""
    return _roundtrip_docs(spark, sf_dir, "orc")


@query("s11_csv_roundtrip", _DOCS_RT_SQL)
def s11_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: fully-quoted CSV sink/source (multiLine quoted
    newlines survive; declared schema, no inference)."""
    return _roundtrip_docs(spark, sf_dir, "csv")


@query("s14_warc_roundtrip", _DOCS_RT_SQL)
def s14_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension (round 9): WARC (ISO 28500) web-archive
    sink/source — the Common Crawl first mile (SURVEY §2.12).  The
    documents table becomes ``resource`` records (doc_id in the target
    URI, text as the payload bytes, the remaining columns as custom
    WARC headers), written as per-record gzip members and read back by
    streaming record-boundary splitting (one file = one task, one
    record resident at a time); every column reconstructs exactly.
    sources/warc.py."""
    import shutil
    import tempfile

    from .sources import warc as wsrc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = docs.select(
        F.concat(F.lit("http://corpus.local/doc/"), F.col("doc_id")).alias(
            "target_uri"
        ),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("X-Lang"), F.col("lang"),
            F.lit("X-Source"), F.col("source"),
            F.lit("X-N-Chars"), F.col("n_chars").cast("string"),
        ).alias("headers"),
    )
    d = tempfile.mkdtemp(prefix="bdmc_warc_rt_")
    try:
        wsrc.write_warc(
            out, d, headers_col="headers",
            warc_type="resource", content_type="text/plain",
        )
        back = wsrc.read_warc(spark, d).select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
            F.col("headers")["x-lang"].alias("lang"),
            F.col("headers")["x-source"].alias("source"),
            F.col("headers")["x-n-chars"].cast("long").alias("n_chars"),
        )
        return _detach(back)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "n4_warc_html_extract",
    f"""WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents),
       anch AS (SELECT doc_id,
                       regexp_extract_all(html, '(?is)<a\\b[^>]*>(.*?)</a>', 1) AS al
                FROM h),
       ext AS (SELECT h.doc_id,
                      {_html_strip_sql('h.html')} AS text,
                      CAST(len(a.al) AS INT) AS n_links,
                      array_to_string(list_transform(a.al,
                          x -> {_html_strip_sql('x')}), ' ') AS atext
               FROM h JOIN anch a USING (doc_id))
       SELECT doc_id, 200 AS http_status, text, n_links,
              CASE WHEN length(text) > 0
                   THEN least(CAST(length(atext) AS DOUBLE) / length(text), 1.0)
                   ELSE 0.0 END AS link_density
       FROM ext""",
)
def n4_warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4+S14 composed (round 9): the full web-archive first mile —
    documents wrapped as HTTP responses inside real WARC files, read
    back by the streaming record splitter, the HTTP envelope stripped
    JVM-side (``http_parts``: status line, headers, body — no Python in
    the hot path), and the body fed to the proven html_extract chain.
    The oracle replays wrap → strip → extract and pins status 200 on
    every record."""
    import shutil
    import tempfile

    from .operators.text import html_extract
    from .sources import warc as wsrc

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>doc</title><script>var x="</div>";'
            "</script></head><body><p>"
        ),
        F.col("text"),
        F.lit(
            '</p><a href="/a">home</a> '
            '<a href="/b">next &amp; prev</a></body></html>'
        ),
    )
    out = docs.select(
        F.concat(F.lit("http://corpus.local/doc/"), F.col("doc_id")).alias(
            "target_uri"
        ),
        F.encode(
            F.concat(
                F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
            ),
            "UTF-8",
        ).alias("payload"),
    )
    d = tempfile.mkdtemp(prefix="bdmc_warc_hx_")
    try:
        wsrc.write_warc(out, d)
        back = wsrc.read_warc(spark, d).select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            wsrc.http_parts(F.col("payload")).alias("p"),
        ).select("doc_id", "p.http_status", F.col("p.body").alias("html"))
        ext = html_extract(back, keep_cols=("http_status",))
        return _detach(ext)
    finally:
        shutil.rmtree(d, ignore_errors=True)


shared_sql(
    "w4_lag_lead_ntile",
    """SELECT o_custkey, o_orderkey,
              lag(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS prev_price,
              lead(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS next_price,
              CAST(NTILE(4) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile
       FROM orders""",
)


@query(
    "n1_dedup_clusters_minhash",
    f"""WITH RECURSIVE pairs AS (
         {_dedup.minhash_pairs_sql()}
       ),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(src, dst) AS (SELECT a, b FROM edges
                           UNION
                           SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
       comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
                FROM reach GROUP BY src)
       SELECT d.doc_id,
              CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
              CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
                        THEN 1 ELSE 0 END AS INT) AS is_kept
       FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""",
)
def n1_dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE scale-path dedup pipeline in one job: MinHash
    signatures -> LSH band candidates -> exact-Jaccard rerank ->
    connected components -> one representative kept per cluster.  This is
    the shape a 100 TB corpus dedup actually runs (no all-pairs stage
    anywhere); with the portable hash the oracle replays every step in
    SQL, closing the pair graph with a recursive CTE."""
    from .operators.cluster import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.minhash_neardup(docs, min_jaccard=0.2, portable=True)
    return dedup_clusters(docs, pairs, id_col="doc_id").select(
        "doc_id", "component", "is_kept"
    )


@query(
    "n1_dedup_keep_best",
    f"""WITH RECURSIVE pairs AS (
         {_dedup.minhash_pairs_sql()}
       ),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(src, dst) AS (SELECT a, b FROM edges
                           UNION
                           SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
       comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
                FROM reach GROUP BY src),
       qual AS (SELECT doc_id,
                       (least(n, 100.0)/100.0*4.0 + nu/n*4.0
                            + least(ns/n*5.0, 1.0)*2.0)/10.0 AS quality
                FROM (SELECT doc_id,
                             CAST(len(sp) AS DOUBLE) AS n,
                             CAST(len(list_distinct(sp)) AS DOUBLE) AS nu,
                             CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL}))
                                  AS DOUBLE) AS ns
                      FROM (SELECT doc_id, string_split(text, ' ') AS sp
                            FROM documents))),
       lab AS (SELECT d.doc_id,
                      CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
                      q.quality
               FROM documents d
               LEFT JOIN comp c ON c.doc_id = d.doc_id
               JOIN qual q ON q.doc_id = d.doc_id)
       SELECT doc_id, component, quality,
              CAST(CASE WHEN ROW_NUMBER() OVER (
                       PARTITION BY component
                       ORDER BY quality DESC, doc_id) = 1
                   THEN 1 ELSE 0 END AS INT) AS is_kept
       FROM lab""",
)
def n1_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 (round 9): near-dup clustering with the PRODUCTION keep rule
    — each MinHash/LSH duplicate family keeps its highest-QUALITY
    member (RefinedWeb/Gopher semantics), not an arbitrary smallest
    id.  The full scale chain (signatures → bands → rerank →
    components) plus the quality join and a per-component rank window;
    the oracle replays everything including the recursive closure and
    the quality doubles (operators/cluster.dedup_clusters_best)."""
    from .operators.cluster import dedup_clusters_best
    from .operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.minhash_neardup(docs, min_jaccard=0.2, portable=True)
    scored = docs.join(quality_score(docs), "doc_id").select("doc_id", "quality")
    return dedup_clusters_best(scored, pairs, "quality").select(
        "doc_id", "component", "quality", "is_kept"
    )


@query(
    "n5_training_corpus",
    f"""WITH RECURSIVE
       bench AS (SELECT * FROM documents WHERE doc_id % 53 = 0),
       corpus AS (SELECT * FROM documents WHERE doc_id % 53 <> 0),
       bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT string_split(text, ' ') AS sp FROM bench)
              WHERE len(sp) >= 8),
       csh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                     range(0, len(sp) - 7),
                     i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3] || ' ' ||
                          sp[i+4] || ' ' || sp[i+5] || ' ' || sp[i+6] || ' ' ||
                          sp[i+7] || ' ' || sp[i+8]))) AS shingle
              FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM corpus)
              WHERE len(sp) >= 8),
       hit AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.shingle = b.shingle),
       clean AS (SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
       pairs AS (
         {_dedup.minhash_pairs_sql(table="clean")}
       ),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(src, dst) AS (SELECT a, b FROM edges
                           UNION
                           SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
       comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
                FROM reach GROUP BY src),
       kept AS (SELECT c.doc_id, c.text
                FROM clean c LEFT JOIN comp k ON k.doc_id = c.doc_id
                WHERE COALESCE(k.component, c.doc_id) = c.doc_id)
       SELECT doc_id,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6) < '{_rth(0.9)}'
                   THEN 'train' ELSE 'val' END AS split,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       FROM kept""",
)
def n5_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus ASSEMBLY pipeline end-to-end in one Spark job:
    benchmark decontamination (8-gram broadcast probe) -> near-dup
    removal via the full MinHash/LSH scale path closed into clusters
    (connected components, keep the representative) -> deterministic
    90/10 train/val split -> per-doc token counts.  No all-pairs stage,
    no driver loop, no nondeterminism: the oracle replays every stage in
    SQL, including the recursive-CTE closure, and hash-matches."""
    from .operators.cluster import dedup_clusters
    from .operators.sampling import deterministic_split
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    corpus = docs.filter(F.col("doc_id") % 53 != 0)
    # materialize the decontaminated survivors once: the frame feeds the
    # near-dup signatures, the rerank shingles, and the cluster join —
    # without the cut each consumer re-runs the 8-gram probe join
    clean = _dedup.ngram_decontaminate(corpus, bench, n=8).localCheckpoint(
        eager=True
    )
    pairs = _dedup.minhash_neardup(clean, min_jaccard=0.2, portable=True)
    kept = dedup_clusters(clean, pairs, id_col="doc_id").filter(F.col("is_kept") == 1)
    split = deterministic_split(kept, "doc_id", {"train": 0.9, "val": 0.1})
    return split.select(
        "doc_id", "split", F.size(tokens("text")).cast("long").alias("n_tokens")
    )


@query(
    "p5_p6_p7_selection_export",
    """SELECT 'customer' AS table_name, 'c_custkey' AS field_name,
              1 AS field_pos,
              (SELECT count(*) FROM customer WHERE c_custkey BETWEEN 1 AND 1000) AS n_rows
       UNION ALL SELECT 'customer', 'c_name', 2,
              (SELECT count(*) FROM customer WHERE c_custkey BETWEEN 1 AND 1000)
       UNION ALL SELECT 'customer', 'c_mktsegment', 3,
              (SELECT count(*) FROM customer WHERE c_custkey BETWEEN 1 AND 1000)
       UNION ALL SELECT 'orders', 'o_orderkey', 1,
              (SELECT count(*) FROM orders WHERE o_orderstatus = 'F' OR o_orderstatus = 'O')
       UNION ALL SELECT 'orders', 'o_custkey', 2,
              (SELECT count(*) FROM orders WHERE o_orderstatus = 'F' OR o_orderstatus = 'O')
       UNION ALL SELECT 'orders', 'o_totalprice', 3,
              (SELECT count(*) FROM orders WHERE o_orderstatus = 'F' OR o_orderstatus = 'O')""",
)
def p5_p6_p7_selection_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6+P7+O1 composed as a hard-checked export manifest: a package
    spec selects 2 of 4 declared tables (P5/P7 `isin` selection — ref
    SetSelectedTables/IsTableSelected XLS:235-256), applies each table's
    NAV-grammar range filter (P6 MakeTableFilter XLS:52-56), orders the
    included fields by Processing Order (O1, XML:204), and reports one
    manifest row per exported (table, field) with the post-filter row
    count.  The oracle restates the selection as SQL constants and
    recomputes the counts."""
    from .operators.navfilter import nav_filter
    from .plans.spec import FieldSpec, PackageSpec, TableSpec

    spec = PackageSpec(
        package_code="SEL",
        tables=[
            TableSpec(
                "customer",
                filters={"c_custkey": "1..1000"},
                fields=[
                    FieldSpec("c_custkey", primary_key=True, processing_order=1),
                    FieldSpec("c_name", processing_order=2),
                    FieldSpec("c_mktsegment", processing_order=3),
                    FieldSpec("c_acctbal", include=False),  # excluded field
                ],
            ),
            TableSpec(
                "orders",
                filters={"o_orderstatus": "F|O"},
                fields=[
                    FieldSpec("o_orderkey", primary_key=True, processing_order=1),
                    FieldSpec("o_custkey", processing_order=2),
                    FieldSpec("o_totalprice", processing_order=3),
                ],
            ),
            TableSpec("part"),      # declared but NOT selected
            TableSpec("lineitem"),  # declared but NOT selected
        ],
    )
    selected = {"customer", "orders"}  # P5/P7: user selection set
    out = None
    for t in spec.tables:
        if t.table_name not in selected:
            continue
        df = load_table(spark, sf_dir, t.table_name)
        for col, expr in t.filters.items():
            df = df.filter(nav_filter(col, expr))
        n = df.count()
        rows = [(t.table_name, f, i + 1, n) for i, f in enumerate(t.included_fields())]
        part = spark.createDataFrame(
            rows, "table_name string, field_name string, field_pos int, n_rows long"
        )
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "stream_upsert_apply",
    """SELECT event_id, user_id, event_type, value FROM events
       WHERE event_id < 4000""",
)
def stream_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + S13 composed: a stream drives the MERGE sink — each
    micro-batch upserts into a date-partitioned parquet target via
    foreachBatch + dynamic partition overwrite (apply_to_target), the
    streaming analogue of the reference's apply step (Codeunit
    60000:440-451).  Batches overlap on event_id (at-least-once
    delivery), so the upsert's PK semantics are what make the final
    table exact: it must equal the plain batch SELECT."""
    import shutil
    import tempfile
    import uuid

    from .operators.upsert import apply_to_target
    from .streaming.events import stream_events

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 4000)
        .select("event_id", "user_id", "event_type", "value", F.to_date("ts").alias("event_date"))
    )
    landing = tempfile.mkdtemp(prefix="bdmc_supsert_landing_")
    target = tempfile.mkdtemp(prefix="bdmc_supsert_target_") + "/t"
    try:
        # 3 overlapping id-range files: replayed rows exercise PK dedup
        for lo, hi in ((0, 2000), (1500, 3000), (2500, 4000)):
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
                1
            ).write.mode("append").parquet(landing)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            apply_to_target(
                batch_df,
                target,
                mode="upsert",
                pk_cols=["event_id"],
                partition_by=["event_date"],
            )

        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        # surface a wedged stream as the real failure, not a
        # downstream partial-table mismatch; stop the query BEFORE the
        # finally-block deletes its dirs (and never rely on `assert`,
        # which -O strips)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        out = spark.read.parquet(target).select(
            "event_id", "user_id", "event_type", "value"
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(target.rsplit("/", 1)[0], ignore_errors=True)
    return out


@query(
    "stream_acid_upsert",
    """SELECT event_id, user_id, event_type, value FROM events
       WHERE event_id < 4000""",
)
def stream_acid_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + S13 + ACID composed: the stream's foreachBatch lands each
    micro-batch in an AcidTable via the EXACTLY-ONCE sink
    (streaming/events.acid_merge_sink): every commit carries an
    (app, batch) txn record, so a replayed batch — simulated here by
    re-invoking the sink with an already-committed batch id after the
    stream finishes — is a no-op instead of a second merge.  Batches
    overlap on event_id, so PK upsert semantics are still exercised;
    the final snapshot must equal the plain batch SELECT."""
    import shutil
    import tempfile
    import uuid

    from .sources.acid_table import AcidTable
    from .streaming.events import acid_merge_sink

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 4000)
        .select("event_id", "user_id", "event_type", "value")
    )
    landing = tempfile.mkdtemp(prefix="bdmc_sacid_landing_")
    troot = tempfile.mkdtemp(prefix="bdmc_sacid_target_")
    target = troot + "/t"
    try:
        for lo, hi in ((0, 2000), (1500, 3000), (2500, 4000)):
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
                1
            ).write.mode("append").parquet(landing)
        sink = acid_merge_sink(target, ["event_id"], app_id="stream_acid_upsert")
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        # surface a wedged stream as the real failure, not a
        # downstream partial-table mismatch; stop the query BEFORE the
        # finally-block deletes its dirs (and never rely on `assert`,
        # which -O strips)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        t = AcidTable(spark, target)
        head = t.latest_version()
        # replay the last batch: exactly-once means NO new commit
        sink(ev.filter(F.col("event_id") >= 2500), t.last_txn("stream_acid_upsert"))
        assert t.latest_version() == head, "replayed batch must be a no-op"
        out = t.snapshot().select("event_id", "user_id", "event_type", "value")
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(troot, ignore_errors=True)
    return out


@query(
    "stream_minhash_index",
    "WITH "
    + _dedup._minhash_cte_sql("documents", "doc_id", "text", 3, 32, 8)
    + """
       SELECT doc_id,
              concat_ws(',', """
    + ", ".join(f"CAST(h{i} AS VARCHAR)" for i in range(32))
    + """) AS sig_str
       FROM mins""",
)
def stream_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + N1 composed (round-7): a document STREAM maintains the
    MinHash signature index exactly-once — streaming/events.py
    minhash_index_sink signs each micro-batch (batch-proportional work)
    and MERGEs it into the signature AcidTable with (app, batch) txn
    stamping; a replayed batch (re-invoked after the stream, same
    batch id) must be a no-op.  Batches OVERLAP on doc_id, so upsert
    re-signs some docs to identical values.  The final index must equal
    a batch minhash_signatures over all documents — which is exactly
    what the DuckDB oracle recomputes from scratch (portable md5-prefix
    hashes), so the maintained index is value-exact, not just
    row-consistent."""
    import shutil
    import tempfile
    import uuid

    from .sources.acid_table import AcidTable
    from .streaming.events import minhash_index_sink

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    landing = tempfile.mkdtemp(prefix="bdmc_smhidx_landing_")
    troot = tempfile.mkdtemp(prefix="bdmc_smhidx_target_")
    target = troot + "/t"
    try:
        hi_id = docs.agg(F.max("doc_id")).first()[0] + 1
        cuts = (
            (0, int(hi_id * 0.5)),
            (int(hi_id * 0.4), int(hi_id * 0.8)),
            (int(hi_id * 0.7), hi_id),
        )
        for lo, hi in cuts:
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
                1
            ).write.mode("append").parquet(landing)
        sink = minhash_index_sink(
            target, app_id="stream_minhash_index", portable=True
        )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        t = AcidTable(spark, target)
        head = t.latest_version()
        # replay the last batch: exactly-once means NO new commit
        lo, hi = cuts[-1]
        sink(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            t.last_txn("stream_minhash_index"),
        )
        if t.latest_version() != head:
            raise AssertionError("replayed batch must be a no-op")
        out = t.snapshot().select(
            "doc_id",
            F.concat_ws(
                ",", F.transform(F.col("sig"), lambda x: x.cast("string"))
            ).alias("sig_str"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(troot, ignore_errors=True)
    return out


@query(
    "w3_approx_distinct_bounded",
    """SELECT l_returnflag,
              COUNT(DISTINCT l_partkey) AS exact_nd,
              TRUE AS approx_within_5pct
       FROM lineitem GROUP BY l_returnflag""",
)
def w3_approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 scale extension: HyperLogLog++ approximate distinct per group
    next to the exact count.  The sketch value itself is engine-specific,
    so the hard-checked contract is the HLL ERROR BOUND: the oracle pins
    `approx_within_5pct` TRUE and recomputes the exact counts.  At 100 TB
    the approx path is one narrow pass + tiny sketch merge (no
    per-group value dedup shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_nd"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_nd"),
    )
    return g.select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("approx_within_5pct"),
    )


@query(
    "w8_hll_mergeable",
    """SELECT COUNT(DISTINCT l_partkey) AS exact_nd,
              TRUE AS merged_within_5pct,
              TRUE AS merge_agrees_1pct
       FROM lineitem""",
)
def w8_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 scale extension: MERGEABLE distinct-count sketch state (the
    Apache DataSketches HLL surface, Spark 3.5+).  Per-group sketches
    are materializable columns — the primitive behind incremental
    distinct-count rollups (store a sketch per partition/day, union on
    read) where plain approx_count_distinct forces a full re-scan.
    Contracts checked: the union of per-returnflag sketches agrees
    with sketching the whole column in one pass to within 1% of exact
    (the union gadget accumulates at HLL_8, so it is marginally MORE
    accurate than the direct HLL_4 pass — measured merged=2000/20063 vs
    direct=2003/20141 vs exact=2000/20000 at sf0.01/0.1), and the
    merged estimate lands within 5% of the exact count.  The sketch
    bytes are engine-specific, so — like w2b/w3 — the bound, not the
    bits, is the oracle contract."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", F.lit(14)).alias("sk")
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_nd")
    )
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(14))).alias("direct_nd"),
        F.count_distinct("l_partkey").alias("exact_nd"),
    )
    return merged.crossJoin(direct).select(
        "exact_nd",
        (
            F.abs(F.col("merged_nd") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("merged_within_5pct"),
        (
            F.abs(F.col("merged_nd") - F.col("direct_nd"))
            <= 0.01 * F.col("exact_nd")
        ).alias("merge_agrees_1pct"),
    )


@query(
    "w10_equidepth_histogram",
    """WITH b AS (SELECT quantile_cont(l_extendedprice,
                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs
              FROM lineitem)
       SELECT bucket, count(*) AS n_rows,
              min(v) AS min_value, max(v) AS max_value
       FROM (SELECT l_extendedprice AS v,
                    CAST(len(list_filter(b.qs, q -> l_extendedprice > q))
                         AS INT) AS bucket
             FROM lineitem CROSS JOIN b
             WHERE l_extendedprice IS NOT NULL) t
       GROUP BY bucket""",
)
def w10_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extension (round 9): EQUI-DEPTH histogram of
    l_extendedprice over 8 buckets — boundaries at the exact j/8
    percentiles (Spark percentile ≡ DuckDB quantile_cont, the
    winsorize-pinned equivalence), bucket = count of anchors strictly
    below the value.  The skew-robust histogram optimizers and
    profilers actually use (operators/sampling.equidepth_histogram)."""
    from .operators.sampling import equidepth_histogram

    li = load_table(spark, sf_dir, "lineitem")
    return equidepth_histogram(li, "l_extendedprice", buckets=8)


shared_sql(
    "w5_price_histogram",
    # fixed-width value histogram: bucket = floor((v - lo) / width); all
    # arithmetic integer-exact in both engines
    """SELECT CAST(floor((o_totalprice - 0.0) / 50000.0) AS BIGINT) AS bucket,
              COUNT(*) AS n,
              MIN(o_totalprice) AS lo,
              MAX(o_totalprice) AS hi
       FROM orders
       GROUP BY 1""",
)

shared_sql(
    "w6_corr_stats",
    # correlation from decimal-exact moment sums (corr()/covar() built-ins
    # sum doubles in engine-specific order — not reproducible; the moment
    # sums ARE, and the final formula is a handful of IEEE ops on exact
    # inputs)
    """SELECT l_returnflag,
              CAST(n AS BIGINT) AS n,
              CAST(round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                   / sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                        * (CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
                   9) AS DOUBLE) AS corr_qty_price
       FROM (SELECT l_returnflag,
                    COUNT(*) AS n,
                    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
                    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
                    SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS sxy,
                    SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS sx2,
                    SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS sy2
             FROM lineitem GROUP BY l_returnflag) m""",
)


shared_sql(
    "a10_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
              COUNT(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                               (l_returnflag), ())""",
)


_BM25_TERMS = ["join", "vector", "slow"]

from .operators import retrieval as _retrieval  # noqa: E402


@query("n6_bm25_search", _retrieval.bm25_topk_sql(_BM25_TERMS))
def n6_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (beyond-reference retrieval): BM25 top-10 documents for a
    fixed query-term bag — the lexical retriever behind targeted data
    selection ("pull the docs about X out of the corpus").  One
    token-scan shuffle produces (dl, tf per term) per document via
    conditional aggregation; the 1-row corpus-stats frame broadcasts;
    top-k plans as TakeOrderedAndProject.  Rational Robertson idf and a
    fixed-order term sum make the scores bit-equal to the DuckDB
    oracle (see operators/retrieval.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return _retrieval.bm25_topk(docs, _BM25_TERMS)


@query(
    "n6_rm3_expansion",
    _retrieval.rm3_expand_sql(_BM25_TERMS, fb_docs=10, fb_terms=20, orig_weight=0.6),
)
def n6_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 9): RM3 pseudo-relevance-feedback query expansion —
    BM25's top-10 feedback docs vote a relevance-weighted term
    distribution, interpolated 0.6/0.4 with the uniform original query;
    top-20 expansion terms out.  The targeted-data-selection amplifier:
    a seed query pulls topic vocabulary from the corpus itself, feeding
    bm25_topk_multi for the wide sweep.  Rank-ordered IEEE folds make
    every weight bit-equal to the oracle's explicit chains
    (operators/retrieval.rm3_expand)."""
    docs = load_table(spark, sf_dir, "documents")
    return _retrieval.rm3_expand(
        docs, _BM25_TERMS, fb_docs=10, fb_terms=20, orig_weight=0.6
    )


from .operators import bpe as _bpe  # noqa: E402


@query(
    "n5_bpe_train",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2)
    + "\n       SELECT rank, lhs, rhs, merged, pair_count FROM bpe_merges",
)
def n5_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (beyond reference): distributed BPE tokenizer training — 12
    merge rounds of the published argmax loop (count adjacent symbol
    pairs weighted by word frequency, merge the most frequent, repeat)
    over the documents corpus.  ONE corpus pass builds the word-count
    table; every round after that touches only the vocab-sized frame.
    Deterministic ties (count desc, pair lexicographic) make the merge
    sequence engine-independent: the unrolled DuckDB oracle replays all
    12 rounds value-exact — the package's second iterative algorithm
    with an exact oracle, after PageRank (operators/bpe.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.bpe_train(docs, num_merges=12, min_pair_count=2, incremental=False)


@query(
    "n5_bpe_segment",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2)
    + """,
       dtoks AS (SELECT doc_id,
                        unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS word
                 FROM documents
                 WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0)
       SELECT d.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(len(w.syms)) AS BIGINT) AS n_subwords
       FROM dtoks d JOIN bw12 w ON d.word = w.word
       GROUP BY d.doc_id""",
)
def n5_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: BPE encode path — segment every document with the merges
    learned by n5_bpe_train and report (n_words, n_subwords) per doc.
    The oracle needs no separate apply machinery: after the unrolled
    training rounds, the final round's per-word symbol lists ARE the
    segmentation, so it joins document tokens back to that vocab frame.
    Spark side: merges collect (12 rows) -> chained JVM folds per word
    (bpe_segment), zero Python UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in _bpe.bpe_train(docs, num_merges=12, min_pair_count=2).collect()
    ]
    from .operators.text import tokens as _tokens

    seg = _bpe.bpe_segment(docs, merges)
    return (
        seg.where(F.size(_tokens("text")) > 0)
        .select(
            "doc_id",
            F.size(_tokens("text")).cast("long").alias("n_words"),
            F.size("bpe_tokens").cast("long").alias("n_subwords"),
        )
    )


@query(
    "n5_bpe_train_incremental",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2)
    + "\n       SELECT rank, lhs, rhs, merged, pair_count FROM bpe_merges",
)
def n5_bpe_train_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: the delta-maintained BPE trainer (operators/bpe.py) — keeps
    the pair-count table as a persistent frame and, per merge, updates
    only the words that CONTAIN the merged pair instead of re-exploding
    the whole vocabulary.  Value-identical to n5_bpe_train (same
    unrolled DuckDB oracle); the scale path for production vocab
    sizes, where late rounds touch a vanishing slice of the vocab and
    the recount path's flat per-round cost becomes the bottleneck."""
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.bpe_train(docs, num_merges=12, min_pair_count=2, incremental=True)


@query(
    "n5_bpe_train_local",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2)
    + "\n       SELECT rank, lhs, rhs, merged, pair_count FROM bpe_merges",
)
def n5_bpe_train_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): the word-count-bounded LOCAL BPE trainer fast path
    — the round-7 verdict's top item.  The one corpus pass still runs
    distributed (word counts, map-side combined); the vocab-sized
    (word, count) table is then collected ONCE and the exact sequential
    argmax loop runs in-process (heap argmax + incremental pair deltas,
    operators/bpe.py _train_local), emitting the IDENTICAL merge table
    the Θ(merges)-Spark-jobs strategies produce — same counts, same
    (count desc, lhs, rhs) tie-break — against the SAME unrolled DuckDB
    oracle as n5_bpe_train.  32k merges take seconds-to-minutes instead
    of ~6.5 h of per-merge job launches (BASELINE.md round-8 probe);
    the distributed delta path remains for vocabularies past the
    budget."""
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.bpe_train(docs, num_merges=12, min_pair_count=2)


@query(
    "n5_bpe_segment_kernel",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2)
    + """,
       dtoks AS (SELECT doc_id,
                        unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS word
                 FROM documents
                 WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0)
       SELECT d.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(len(w.syms)) AS BIGINT) AS n_subwords
       FROM dtoks d JOIN bw12 w ON d.word = w.word
       GROUP BY d.doc_id""",
)
def n5_bpe_segment_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: the Arrow-kernel BPE encoder (operators/bpe.py) — a broadcast
    merge-rank dict applied in ONE mapInPandas pass, O(1) plan depth at
    any vocab size (the Catalyst fold sibling n5_bpe_segment nests one
    aggregate per rule — exact but plan-explosive at a production 32k
    vocab).  Same rules, same per-doc (n_words, n_subwords) oracle —
    the driver cross-checks the kernel's subword math end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in _bpe.bpe_train(docs, num_merges=12, min_pair_count=2).collect()
    ]
    from .operators.text import tokens as _tokens

    seg = _bpe.bpe_segment(docs, merges, impl="kernel")
    return (
        seg.where(F.size(_tokens("text")) > 0)
        .select(
            "doc_id",
            F.size(_tokens("text")).cast("long").alias("n_words"),
            F.size("bpe_tokens").cast("long").alias("n_subwords"),
        )
    )


_BYTE_NORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_BYTE_WORDS_SQL = f"""SELECT replace(tok, ' ', chr(288)) AS word, count(*) AS cnt
          FROM (SELECT unnest(regexp_extract_all({_BYTE_NORM},
                       '( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+)', 1)) AS tok
                FROM documents WHERE length({_BYTE_NORM}) > 0)
          GROUP BY 1"""


@query(
    "n5_bpe_byte_train",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2, words_sql=_BYTE_WORDS_SQL)
    + "\n       SELECT rank, lhs, rhs, merged, pair_count FROM bpe_merges",
)
def n5_bpe_byte_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8, item #4): BYTE-LEVEL BPE training over GPT-2-style
    pretokens — the production tokenizer shape: a shared Java∩RE2∩re
    pre-tokenization regex, each pretoken split into UTF-8 byte symbols
    through the GPT-2 byte-unicode bijection (space = 'Ġ'), zero
    out-of-vocabulary bytes by construction.  The corpus pass
    (pretoken counts) is distributed; training runs the exact local
    argmax loop over the bounded vocab (operators/bpe.py
    bpe_train_bytes).  The oracle reuses the SAME unrolled CTE rounds
    as n5_bpe_train with only the word CTE swapped: on this ASCII
    corpus the byte split IS the char split after space→Ġ, so DuckDB
    replays the full byte-level merge sequence value-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.bpe_train_bytes(docs, num_merges=12, min_pair_count=2)


@query(
    "n5_bpe_byte_segment",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2, words_sql=_BYTE_WORDS_SQL)
    + f""",
       dtoks AS (SELECT doc_id, replace(tok, ' ', chr(288)) AS word
                 FROM (SELECT doc_id,
                              unnest(regexp_extract_all({_BYTE_NORM},
                              '( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+)', 1)) AS tok
                       FROM documents WHERE length({_BYTE_NORM}) > 0))
       SELECT d.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_pretokens,
              CAST(SUM(len(w.syms)) AS BIGINT) AS n_subwords
       FROM dtoks d JOIN bw12 w ON d.word = w.word
       GROUP BY d.doc_id""",
)
def n5_bpe_byte_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8, item #4): byte-level BPE ENCODE — the Arrow kernel
    generalized with pre-tokenization, byte-fallback symbols and
    special-token passthrough (operators/bpe.py bpe_segment_bytes):
    ONE mapInPandas over the scan, broadcast rank dict, O(1) plan
    depth.  Reports (n_pretokens, n_subwords) per document; the oracle
    derives the same counts by joining mapped pretokens to the final
    unrolled training round's vocab frame, so the kernel's min-rank
    encode is cross-checked end-to-end (it equals the fold on trained
    tables — see _fold_equivalent)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in _bpe.bpe_train_bytes(docs, num_merges=12, min_pair_count=2).collect()
    ]
    seg = _bpe.bpe_segment_bytes(docs, merges)
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    pretoks = F.regexp_extract_all(norm, F.lit(f"({_bpe.PRETOK_RE})"), 1)
    return (
        seg.where(F.size(pretoks) > 0)
        .select(
            "doc_id",
            F.size(pretoks).cast("long").alias("n_pretokens"),
            F.size("bpe_tokens").cast("long").alias("n_subwords"),
        )
    )


@query(
    "n5_bpe_byte_ids",
    "WITH "
    + _bpe.bpe_sql_steps(num_merges=12, min_pair_count=2, words_sql=_BYTE_WORDS_SQL)
    + f""",
       darr AS (SELECT doc_id,
                       regexp_extract_all({_BYTE_NORM},
                       '( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+)', 1) AS arr
                FROM documents WHERE length({_BYTE_NORM}) > 0),
       dtoks AS (SELECT doc_id, i AS pos, replace(arr[i], ' ', chr(288)) AS word
                 FROM darr, UNNEST(range(1, len(arr) + 1)) r(i)),
       dsyms AS (SELECT d.doc_id, d.pos, j AS spos, w.syms[j] AS s
                 FROM dtoks d JOIN bw12 w ON d.word = w.word,
                      UNNEST(range(1, len(w.syms) + 1)) rr(j)),
       dids AS (SELECT doc_id, pos, spos,
                       CASE WHEN s = chr(288) THEN 32
                            WHEN length(s) = 1 THEN ascii(s)
                            ELSE 255 + m.rank END AS tid
                FROM dsyms LEFT JOIN bpe_merges m ON m.merged = dsyms.s)
       SELECT doc_id,
              string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos, spos) AS ids_csv
       FROM dids GROUP BY doc_id""",
)
def n5_bpe_byte_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): TOKEN-ID emission — the artifact a training
    pipeline actually materializes.  The id space is fully determined
    by the merge table (bpe_vocab_ids: a single-byte symbol's id IS its
    byte value, merges get 256+rank-1, specials follow), so the DuckDB
    oracle reconstructs the exact per-document id SEQUENCE from the
    unrolled training rounds: document pretokens join to the final
    vocab frame, symbols explode with position, ids come from the byte
    value / merge rank, and the sequence is compared comma-joined in
    (pretoken, symbol) order.  Spark side: the same mapInPandas kernel
    with emit='ids' — ids add zero plan depth."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in _bpe.bpe_train_bytes(docs, num_merges=12, min_pair_count=2).collect()
    ]
    seg = _bpe.bpe_segment_bytes(docs, merges, emit="ids")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    pretoks = F.regexp_extract_all(norm, F.lit(f"({_bpe.PRETOK_RE})"), 1)
    return (
        seg.where(F.size(pretoks) > 0)
        .select(
            "doc_id",
            F.concat_ws(",", F.col("bpe_tokens").cast("array<string>")).alias(
                "ids_csv"
            ),
        )
    )


_BM25_BATCH = {
    "q_join": ["join", "broadcast", "shuffle"],
    "q_vec": ["vector", "embedding"],
    "q_slow": ["slow", "join", "vector"],
}


@query("n6_bm25_batch", _retrieval.bm25_topk_multi_sql(_BM25_BATCH))
def n6_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6: batch BM25 — top-10 docs for THREE queries out of ONE corpus
    scan (the decontamination-sweep shape: hundreds of benchmark queries
    against a 100 TB corpus must not mean hundreds of corpus scans).
    The union of all query terms drives a single conditional-agg token
    scan; the per-doc frame is materialized once and every query scores
    off it with a fixed-order chain over its own terms, so each query's
    scores are bit-equal to bm25_topk run alone (and to the DuckDB
    oracle).  Per-query top-k is one rank window -> WindowGroupLimit."""
    docs = load_table(spark, sf_dir, "documents")
    return _retrieval.bm25_topk_multi(docs, _BM25_BATCH)


@query(
    "n6_ir_metrics",
    f"""WITH runt AS (
         SELECT * FROM ({_retrieval.bm25_topk_multi_sql(_BM25_BATCH)})
       ),
       dtoks AS (SELECT doc_id,
                        list_distinct(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS st
                 FROM documents
                 WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       qrels AS (
         SELECT 'q_join' AS query_id, doc_id FROM dtoks
         WHERE list_contains(st, 'join')
         UNION ALL
         SELECT 'q_vec', doc_id FROM dtoks
         WHERE list_contains(st, 'vector')
         UNION ALL
         SELECT 'q_slow', doc_id FROM dtoks
         WHERE list_contains(st, 'slow')),
       judged AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1),
       hits AS (SELECT r.query_id, r.doc_id, r.rank
                FROM runt r JOIN qrels USING (query_id, doc_id)),
       per AS (SELECT query_id, MIN(rank) AS first_rel_rank,
                      SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS hk
               FROM hits GROUP BY 1)
       SELECT j.query_id, CAST(j.n_rel AS BIGINT) AS n_rel,
              CAST(p.first_rel_rank AS INTEGER) AS first_rel_rank,
              CAST(1.0 AS DOUBLE) / CAST(p.first_rel_rank AS DOUBLE) AS rr,
              CAST(COALESCE(p.hk, 0) AS DOUBLE) / CAST(j.n_rel AS DOUBLE)
                  AS recall_at_k
       FROM judged j LEFT JOIN per p USING (query_id)""",
)
def n6_ir_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 9): retrieval EVALUATION — reciprocal rank and
    recall@10 of the batch BM25 run against deterministic qrels (docs
    containing the query's HEAD term — the only corpus-present term in
    every batch query; the synthetic vocab lacks the tail terms, so an
    all-terms qrel set would be empty).  Both metrics are single
    integer divisions — engine-exact; nDCG's libm log2 is deliberately
    out of the oracle contract (operators/retrieval.ir_metrics)."""
    from .operators.retrieval import ir_metrics

    docs = load_table(spark, sf_dir, "documents")
    run = _retrieval.bm25_topk_multi(docs, _BM25_BATCH, k=10)
    toks = docs.select(
        "doc_id", F.array_distinct(_text.tokens("text")).alias("st")
    )
    # relevance proxy: membership of the query's HEAD term (the only
    # corpus-present term in every batch query — the synthetic vocab
    # lacks the tail terms entirely)
    parts = []
    for qid, terms in _BM25_BATCH.items():
        parts.append(
            toks.where(F.array_contains(F.col("st"), terms[0])).select(
                F.lit(qid).alias("query_id"), F.col("doc_id")
            )
        )
    qrels = parts[0]
    for pdf in parts[1:]:
        qrels = qrels.union(pdf)
    return ir_metrics(run, qrels, k=10)


@query(
    "n6_pagerank_links",
    """WITH b AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                         CAST(1000000 + l_partkey AS BIGINT) AS p
                  FROM lineitem),
       """
    + _retrieval.pagerank_sql_steps(
        "SELECT s AS src, p AS dst FROM b UNION ALL SELECT p AS src, s AS dst FROM b"
    )
    + """,
       top AS (SELECT node, rank_scaled FROM prfinal
               ORDER BY rank_scaled DESC, node ASC LIMIT 20)
       SELECT node, rank_scaled,
              CASE WHEN node >= 1000000 THEN 'part' ELSE 'supplier' END AS node_type,
              CAST(ROW_NUMBER() OVER (ORDER BY rank_scaled DESC, node ASC) AS INT)
                  AS rank_pos
       FROM top""",
)
def n6_pagerank_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (beyond-reference graph scoring): 5-iteration fixed-point
    PageRank over the undirected supplier<->part co-occurrence graph
    from lineitem (parts namespaced at +1e6), top-20 nodes.  All
    arithmetic is scaled-integer (see operators/retrieval.pagerank), so
    the DuckDB unrolled-CTE oracle replays every iteration bit-for-bit
    — an iterative algorithm with a value-exact oracle, not a
    rows-only check.  Each round: one join keyed on the rank frame +
    one dst-keyed integer sum; rank frames localCheckpoint-ed so plan
    depth stays O(1)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.select(
            F.col("l_suppkey").cast("long").alias("s"),
            (F.col("l_partkey") + 1000000).cast("long").alias("p"),
        )
        .distinct()
    )
    edges = b.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionAll(
        b.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    pr = _retrieval.pagerank(edges, iters=5)
    top = pr.orderBy(F.col("rank_scaled").desc(), F.col("node").asc()).limit(20)
    w = Window.orderBy(F.col("rank_scaled").desc(), F.col("node").asc())
    return top.select(
        "node",
        "rank_scaled",
        F.when(F.col("node") >= 1000000, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.row_number().over(w).cast("int").alias("rank_pos"),
    )


from .operators import lm as _lm  # noqa: E402


@query(
    "n4_bigram_lm_score",
    """WITH norm AS (SELECT doc_id,
                trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
         FROM documents),
       toks AS (SELECT doc_id, list_prepend('<s>', string_split(t, ' ')) AS a
                FROM norm WHERE length(t) > 0),
       bg AS (SELECT doc_id, i AS pos, a[i] AS w1, a[i + 1] AS w2
              FROM toks, UNNEST(range(1, len(a))) r(i)),
       lm AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
       ctx AS (SELECT w1, SUM(c) AS c_ctx FROM lm GROUP BY w1),
       v AS (SELECT COUNT(DISTINCT w2) AS vs FROM lm),
       scored AS (SELECT b.doc_id, b.pos,
                         (l.c + 1.0)
                         / (CAST(cx.c_ctx AS DOUBLE) + CAST(v.vs AS DOUBLE)) AS p
                  FROM bg b JOIN lm l USING (w1, w2)
                  JOIN ctx cx USING (w1) CROSS JOIN v),
       per AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
                      list_reduce(list(p ORDER BY pos), (x, y) -> x + y) AS sp
               FROM scored GROUP BY doc_id)
       SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
              per.sp / per.n_bigrams AS mean_prob
       FROM documents d LEFT JOIN per USING (doc_id)""",
)
def n4_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 8): CCNet-style LM quality scoring — train an add-1
    bigram model ON the corpus (one groupBy shuffle; the model stays a
    distributed frame, never collected/broadcast), then score every
    document's mean smoothed conditional probability P(w2|w1).  The
    oracle-checked column is the RATIONAL form: integer counts, IEEE
    divisions, per-doc sum folded in explicit position order — so
    DuckDB replays it bit-exactly.  The same operator also emits true
    log-space cross_entropy/perplexity (libm-dependent; pinned in
    tests with tolerance, excluded here — see operators/lm.py)."""
    docs = load_table(spark, sf_dir, "documents")
    lm = _lm.train_bigram_lm(docs)
    v = _lm.lm_vocab_size(lm)
    return _lm.score_bigram_lm(docs, lm, v, k=1.0).select(
        "doc_id", "n_bigrams", "mean_prob"
    )


@query(
    "n4_link_extract",
    r"""WITH h AS (SELECT doc_id,
              '<html><body><p>' || substr(text, 1, 40)
              || '</p><a href="https://ex.com/p/' || CAST(doc_id AS VARCHAR)
              || '">go <b>' || CAST(doc_id % 5 AS VARCHAR)
              || '</b></a> <a href="/rel?x=' || CAST(doc_id % 3 AS VARCHAR)
              || '">more links</a></body></html>' AS html
         FROM documents),
       ex AS (SELECT doc_id,
                     regexp_extract_all(html,
                         '(?is)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 0) AS els
              FROM h),
       pe AS (SELECT doc_id, CAST(i - 1 AS INT) AS link_pos, els[i] AS a
              FROM ex, UNNEST(range(1, len(els) + 1)) r(i))
       SELECT doc_id, link_pos,
              regexp_extract(a,
                  '(?is)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1) AS href,
              trim(regexp_replace(regexp_replace(
                  regexp_extract(a,
                      '(?is)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 2),
                  '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS anchor_text
       FROM pe""",
)
def n4_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): HTML LINK extraction — (doc, position, href,
    anchor text) — the link-graph first mile feeding pagerank / k-core
    / label propagation, plus the anchor-text relevance signal.  HTML
    is wrapped deterministically around each document (two anchors:
    absolute href with markup inside the anchor, relative href with
    query string) so both engines see identical input; the Java∩RE2
    regex chain replays verbatim (operators/text.extract_links)."""
    from .operators.text import extract_links

    docs = load_table(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><p>'),
            F.substring("text", 1, 40),
            F.lit('</p><a href="https://ex.com/p/'),
            F.col("doc_id").cast("string"),
            F.lit('">go <b>'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('</b></a> <a href="/rel?x='),
            (F.col("doc_id") % 3).cast("string"),
            F.lit('">more links</a></body></html>'),
        ).alias("html"),
    )
    return extract_links(html)


@query(
    "n4_readability",
    r"""WITH x AS (SELECT doc_id,
                CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0
                     THEN 0
                     ELSE len(string_split(
                          trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
                END AS n_words,
                greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
                len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
         FROM documents)
       SELECT doc_id, CAST(n_words AS INT) AS n_words,
              CAST(n_sent AS INT) AS n_sentences,
              CAST(n_syll AS INT) AS n_syllable_groups,
              CASE WHEN n_words > 0 THEN
                   206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
                   - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
              END AS flesch_score
       FROM x""",
)
def n4_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): Flesch reading-ease — the classic readability
    quality gate: 206.835 − 1.015·(words/sentences) −
    84.6·(vowel_groups/words), sentence count floored at 1, syllables
    by the dictionary-free vowel-group proxy.  Narrow regexp
    aggregates + one fixed IEEE chain (operators/text.readability)."""
    from .operators.text import readability

    return readability(load_table(spark, sf_dir, "documents"))


@query(
    "n5_deterministic_shuffle",
    """SELECT doc_id,
              CAST(ROW_NUMBER() OVER (
                  ORDER BY ('0x' || substr(md5('epoch-0:'
                            || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                           doc_id) - 1 AS BIGINT) AS shuffle_pos
       FROM documents""",
)
def n5_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 9): reproducible training-order shuffle — position =
    dense rank of the portable md5 draw of ('epoch-0', doc_id), a pure
    function of (salt, id): any engine, partitioning, or rerun gives
    the identical permutation; change the salt per epoch.  Positions come
    from hash-bucketed per-bucket ranks plus parameter-bounded bucket
    offsets — no unpartitioned window over anything data-sized
    (operators/sampling.deterministic_shuffle)."""
    from .operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", salt="epoch-0")


@query(
    "n4_char_stats",
    """WITH b AS (SELECT doc_id, text AS t, length(text) AS n_chars
              FROM documents),
       ch AS (SELECT doc_id,
                     unnest(list_transform(range(1, length(t) + 1),
                         i -> substr(t, CAST(i AS INT), 1))) AS ch
              FROM b WHERE n_chars > 0),
       hist AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
       tot AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY 1),
       per AS (SELECT h.doc_id, count(*) AS nd,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                          list((CAST(h.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                               * (CAST(h.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                               ORDER BY h.ch)),
                          (a, b) -> a + b) AS gini
               FROM hist h JOIN tot t USING (doc_id)
               GROUP BY h.doc_id)
       SELECT b.doc_id, b.n_chars,
              CAST(COALESCE(per.nd, 0) AS BIGINT) AS n_distinct_chars,
              per.gini AS char_gini,
              CASE WHEN b.n_chars > 0 THEN
                   CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS DOUBLE)
                   / CAST(b.n_chars AS DOUBLE) END AS digit_ratio,
              CASE WHEN b.n_chars > 0 THEN
                   CAST(length(regexp_replace(t, '[^ ]', '', 'g')) AS DOUBLE)
                   / CAST(b.n_chars AS DOUBLE) END AS space_ratio
       FROM b LEFT JOIN per USING (doc_id)""",
)
def n4_char_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): character-distribution quality signals — the
    gibberish/binary-junk detector: distinct-char count, Gini/Simpson
    concentration Σ(cᵢ/n)² folded in codepoint order (the rational
    stand-in for character entropy, zero libm), digit and space
    ratios.  Per-doc fold state is bounded by the alphabet, not
    document length (operators/text.char_stats)."""
    from .operators.text import char_stats

    docs = load_table(spark, sf_dir, "documents")
    return char_stats(docs)


@query(
    "n4_collocations",
    r"""WITH norm AS (SELECT doc_id,
                trim(regexp_replace(text, '\s+', ' ', 'g')) AS s
         FROM documents),
       toks AS (SELECT doc_id, string_split(s, ' ') AS t
                FROM norm WHERE length(s) > 0),
       uni AS (SELECT w, count(*) AS c
               FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
       nt AS (SELECT SUM(c) AS n FROM uni),
       bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
              FROM toks, UNNEST(range(1, len(t))) r(i)),
       pairs AS (SELECT w1, w2, count(*) AS pair_count
                 FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
       scored AS (SELECT p.w1, p.w2, p.pair_count,
                         (CAST(p.pair_count AS DOUBLE) * CAST(nt.n AS DOUBLE))
                         / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS score
                  FROM pairs p
                  JOIN uni u1 ON u1.w = p.w1
                  JOIN uni u2 ON u2.w = p.w2
                  CROSS JOIN nt)
       SELECT w1, w2, pair_count, score, rank FROM (
         SELECT w1, w2, pair_count, score,
                CAST(ROW_NUMBER() OVER (ORDER BY score DESC, w1, w2) AS INT)
                    AS rank
         FROM scored) q
       WHERE rank <= 50""",
)
def n4_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): top-50 COLLOCATIONS by the rational PMI kernel
    c(w1,w2)·N/(c(w1)·c(w2)) with a min-count-5 floor — phrase mining
    for tokenizer seeds and domain lexicons.  Exactly PMI's ranking
    with every score one fixed IEEE chain over integer counts (no
    libm); one token pass feeds both count frames, top-k via partial
    top-k (operators/text.collocations)."""
    from .operators.text import collocations

    docs = load_table(spark, sf_dir, "documents")
    return collocations(docs, min_count=5, k=50)


@query(
    "n4_kn_lm_score",
    """WITH norm AS (SELECT doc_id,
                trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
         FROM documents),
       toks AS (SELECT doc_id, list_prepend('<s>', string_split(t, ' ')) AS a
                FROM norm WHERE length(t) > 0),
       bg AS (SELECT doc_id, i AS pos, a[i] AS w1, a[i + 1] AS w2
              FROM toks, UNNEST(range(1, len(a))) r(i)),
       lm AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
       ctx AS (SELECT w1, SUM(c) AS c_ctx, COUNT(*) AS n_follow
               FROM lm GROUP BY w1),
       cont AS (SELECT w2, COUNT(*) AS n_prec FROM lm GROUP BY w2),
       tt AS (SELECT COUNT(*) AS tt FROM lm),
       scored AS (SELECT b.doc_id, b.pos,
                         (CASE WHEN l.c IS NULL THEN 0.0
                               ELSE (CAST(l.c AS DOUBLE) - 0.75)
                                    / CAST(cx.c_ctx AS DOUBLE) END)
                         + ((0.75 * CAST(cx.n_follow AS DOUBLE))
                            / CAST(cx.c_ctx AS DOUBLE))
                           * (CAST(COALESCE(cn.n_prec, 0) AS DOUBLE)
                              / CAST(tt.tt AS DOUBLE)) AS p
                  FROM bg b LEFT JOIN lm l USING (w1, w2)
                  JOIN ctx cx USING (w1)
                  LEFT JOIN cont cn ON cn.w2 = b.w2
                  CROSS JOIN tt),
       per AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
                      list_reduce(list(p ORDER BY pos), (x, y) -> x + y) AS sp
               FROM scored GROUP BY doc_id)
       SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
              per.sp / per.n_bigrams AS mean_prob
       FROM documents d LEFT JOIN per USING (doc_id)""",
)
def n4_kn_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): interpolated KNESER-NEY bigram scoring — the
    smoothing family KenLM (and therefore CCNet's production filter)
    actually uses: seen mass discounted by d=0.75, backoff to the
    CONTINUATION probability (distinct contexts a word follows) rather
    than add-k's uniform prior.  Model trained on the corpus in one
    shuffle, three marginal frames all distributed; every probability
    is one fixed IEEE chain over integer counts folded in position
    order, so the oracle replays mean_prob bit-for-bit
    (operators/lm.score_kneser_ney)."""
    docs = load_table(spark, sf_dir, "documents")
    lm = _lm.train_bigram_lm(docs)
    return _lm.score_kneser_ney(docs, lm, discount=0.75)


_PACK_SEQ_SQL = """WITH norm AS (SELECT doc_id,
                trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t FROM documents),
       ids AS (SELECT doc_id,
                      list_append(list_transform(range(1, length(t) + 1),
                                                 i -> ascii(substr(t, i, 1))), 0) AS v
               FROM norm WHERE length(t) > 0),
       offs AS (SELECT doc_id, v, len(v) AS n,
                       CAST(COALESCE(SUM(len(v)) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS strt
                FROM ids),
       pieces AS (SELECT s.seq, o.strt,
                         list_slice(o.v,
                             greatest(0, s.seq * 128 - o.strt) + 1,
                             least(o.strt + o.n, (s.seq + 1) * 128) - o.strt) AS piece
                  FROM offs o,
                       UNNEST(range(o.strt // 128,
                                    (o.strt + o.n - 1) // 128 + 1)) s(seq)),
       seqs AS (SELECT seq, CAST(COUNT(*) AS INT) AS n_docs,
                       flatten(list(piece ORDER BY strt)) AS idsarr
                FROM pieces GROUP BY seq)
       SELECT CAST(seq AS BIGINT) AS seq_id, n_docs,
              array_to_string(list_transform(idsarr, x -> CAST(x AS VARCHAR)),
                              ',') AS ids_csv
       FROM seqs WHERE len(idsarr) = 128"""


@query("n5_pack_sequences", _PACK_SEQ_SQL)
def n5_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): materialized fixed-length TRAINING SEQUENCES —
    every non-blank document becomes a char-code id stream + EOS 0,
    concatenated in doc order and cut into exact 128-id sequences
    (drop_last).  The oracle replays the whole pipeline: per-doc ids,
    the exclusive prefix sum (window form — Spark runs the equivalent
    HIERARCHICAL prefix sum with no global window), the per-(doc,seq)
    slice algebra, and the start-ordered flatten; sequences compare as
    ordered CSV.  See operators/sampling.pack_token_sequences."""
    from .operators.sampling import pack_token_sequences

    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    pre = docs.select(
        "doc_id", F.transform(F.split(norm, ""), lambda c: F.ascii(c)).alias("cids")
    ).where(F.length(norm) > 0)
    packed = pack_token_sequences(
        pre, "doc_id", "cids", seq_len=128, eos_id=0, drop_last=True
    )
    return packed.select(
        "seq_id",
        "n_docs",
        F.concat_ws(",", F.col("ids").cast("array<string>")).alias("ids_csv"),
    )


@query(
    "n2_semantic_dedup",
    """WITH corpus AS (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings
         UNION ALL
         SELECT vec_id + 10000, label,
                list_transform(
                    list_prepend(CAST(CAST(embedding[1] AS DOUBLE) + 0.25 AS FLOAT),
                                 embedding[2:]),
                    x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE vec_id < 25),
       uo AS (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
       cellc AS (SELECT label AS cid, i AS dim,
                        CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                             / COUNT(*) AS DOUBLE) AS mv
                 FROM (SELECT label, unnest(v) AS v,
                              unnest(range(0, len(v))) AS i
                       FROM uo)
                 GROUP BY label, i),
       cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
       cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                      list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
                 FROM cents),
       nrm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_reduce(
                      list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
               FROM corpus),
       asg AS (SELECT vec_id, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cid) AS rn
               FROM (SELECT n.vec_id, cn.cid,
                            list_reduce(list_transform(list_zip(n.uv, cn.uc),
                                p -> p[1] * p[2]), (x, y) -> x + y) AS sim
                     FROM nrm n CROSS JOIN cnorm cn)),
       base AS (SELECT a2.vec_id, a2.cid AS cluster, n.uv,
                       list_reduce(list_transform(list_zip(n.uv, cn.uc),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS centroid_sim
                FROM (SELECT vec_id, cid FROM asg WHERE rn = 1) a2
                JOIN nrm n USING (vec_id) JOIN cnorm cn ON cn.cid = a2.cid),
       pairs AS (SELECT x.vec_id AS aid, y.vec_id AS bid
                 FROM base x JOIN base y
                   ON x.cluster = y.cluster AND x.vec_id < y.vec_id
                 WHERE list_reduce(list_transform(list_zip(x.uv, y.uv),
                           p -> p[1] * p[2]), (s, t) -> s + t) >= 0.9),
       dups AS (SELECT bid, MIN(aid) AS dup_of FROM pairs GROUP BY bid)
       SELECT b.vec_id, CAST(b.cluster AS INT) AS cluster, b.centroid_sim,
              d.dup_of, d.dup_of IS NULL AS keep
       FROM base b LEFT JOIN dups d ON d.bid = b.vec_id""",
)
def n2_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8): SemDeDup — embedding-space near-dup removal with
    the pairwise pass confined to k-means cells (O(Σ nᵢ²), never
    corpus-quadratic; see operators/similarity.semantic_dedup).  The
    fixture has no natural near-dups (max within-label cosine ≈ 0.47),
    so the entry PLANTS 25 deterministic ones — copies with +0.25 on
    the first component, float-rounded identically in both engines —
    and dedups the planted corpus at cosine >= 0.9 under the
    decimal-exact per-label quantizer.  Every column (assignment,
    centroid_sim, dup_of witness, keep) replays bit-exactly."""
    from .operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        "label",
        F.concat(
            F.array(
                (F.element_at("embedding", 1).cast("double") + F.lit(0.25)).cast(
                    "float"
                )
            ),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "label", "embedding").unionByName(planted)
    cents = _label_mean_centroids(emb)
    return semantic_dedup(corpus, cents, threshold=0.9, keep="min_id")


@query("stream_ivf_index", _IVF_PART_SQL)
def stream_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + N2 composed (round 8): an embedding STREAM maintains the
    disk-resident IVF ANN index exactly-once — streaming/events.py
    ivf_index_sink assigns each micro-batch to the existing centroids
    (batch-proportional work, the stored index never re-read) and
    publishes it with deterministic segment names + a _txn marker, so
    a REPLAYED batch (re-invoked after the stream with its batch id)
    adds nothing.  The full corpus arrives as 3 disjoint micro-batches;
    queries over the streamed index must equal a from-scratch
    ivf_index_write with the same quantizer — which is exactly what
    the shared ann_ivf_partitioned oracle replays (decimal-exact
    per-label means, probe-3, rerank top-10)."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from .streaming.events import ivf_index_sink

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cents = _label_mean_centroids(emb)
    landing = tempfile.mkdtemp(prefix="bdmc_sivf_landing_")
    iroot = tempfile.mkdtemp(prefix="bdmc_sivf_index_")
    index_dir = iroot + "/idx"
    try:
        for m in range(3):
            emb.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        sink = ivf_index_sink(index_dir, cents, app_id="stream_ivf_index")
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        n_files = len(glob.glob(os.path.join(index_dir, "cluster=*", "*.parquet")))
        # replay the last batch: exactly-once means zero new segments
        sink(emb.filter(F.col("vec_id") % 3 == 2), 2)
        n_after = len(glob.glob(os.path.join(index_dir, "cluster=*", "*.parquet")))
        if n_after != n_files:
            raise AssertionError("replayed batch must publish no segments")
        from .operators.similarity import ivf_index_query

        out = ivf_index_query(
            spark,
            index_dir,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            cents,
            k=10,
            n_probe=3,
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(iroot, ignore_errors=True)
    return out


@query(
    "n2_semantic_dedup_incr",
    """WITH corpus AS (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE vec_id % 5 <> 0),
       batch AS (
         SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE vec_id % 5 = 0
         UNION ALL
         SELECT vec_id + 10000, label,
                list_transform(
                    list_prepend(CAST(CAST(embedding[1] AS DOUBLE) + 0.25 AS FLOAT),
                                 embedding[2:]), x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id < 10
         UNION ALL
         SELECT vec_id + 20000, label,
                list_transform(
                    list_prepend(CAST(CAST(embedding[1] AS DOUBLE) + 0.25 AS FLOAT),
                                 embedding[2:]), x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 10),
       cellc AS (SELECT label AS cid, i AS dim,
                        CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                             / COUNT(*) AS DOUBLE) AS mv
                 FROM (SELECT label, unnest(v) AS v,
                              unnest(range(0, len(v))) AS i FROM corpus)
                 GROUP BY label, i),
       cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
       cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                      list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
                 FROM cents),
       snrm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_reduce(
                       list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
                FROM corpus),
       bnrm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_reduce(
                       list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
                FROM batch),
       sasg AS (SELECT vec_id, cid AS cluster FROM (
                  SELECT n.vec_id, cn.cid,
                         ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY list_reduce(list_transform(
                                 list_zip(n.uv, cn.uc), p -> p[1] * p[2]),
                                 (x, y) -> x + y) DESC, cn.cid) AS rn
                  FROM snrm n CROSS JOIN cnorm cn) WHERE rn = 1),
       basg AS (SELECT vec_id, cid AS cluster FROM (
                  SELECT n.vec_id, cn.cid,
                         ROW_NUMBER() OVER (PARTITION BY n.vec_id
                             ORDER BY list_reduce(list_transform(
                                 list_zip(n.uv, cn.uc), p -> p[1] * p[2]),
                                 (x, y) -> x + y) DESC, cn.cid) AS rn
                  FROM bnrm n CROSS JOIN cnorm cn) WHERE rn = 1),
       cross_drop AS (SELECT b.vec_id
                      FROM basg b JOIN bnrm bn USING (vec_id)
                      JOIN sasg s ON s.cluster = b.cluster
                      JOIN snrm sn ON sn.vec_id = s.vec_id
                      WHERE list_reduce(list_transform(list_zip(bn.uv, sn.uv),
                                p -> p[1] * p[2]), (x, y) -> x + y) >= 0.9),
       intra_drop AS (SELECT b.vec_id
                      FROM basg b JOIN bnrm bn USING (vec_id)
                      JOIN basg a ON a.cluster = b.cluster
                                 AND a.vec_id < b.vec_id
                      JOIN bnrm an ON an.vec_id = a.vec_id
                      WHERE list_reduce(list_transform(list_zip(an.uv, bn.uv),
                                p -> p[1] * p[2]), (x, y) -> x + y) >= 0.9)
       SELECT vec_id, label FROM batch
       WHERE vec_id NOT IN (SELECT vec_id FROM cross_drop
                            UNION SELECT vec_id FROM intra_drop)""",
)
def n2_semantic_dedup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 8): INCREMENTAL SemDeDup — each arriving batch dedups
    against the STORED corpus via the IVF index (partition pruning
    bounds the stored-side read to the batch's cells; zero
    corpus×corpus work) and against its own lower-id rows, then
    survivors would append.  Stored corpus = vec_id %% 5 != 0 under
    corpus-trained per-label centroids; the batch carries 8 planted
    near-dups of STORED vectors (cross-dropped) and 2 planted
    near-dups of lower-id BATCH vectors (intra-dropped), all
    float-rounded identically in both engines.  The oracle replays
    assignment, both drop rules, and the anti-join exactly.  See
    operators/similarity.semantic_dedup_incremental."""
    import shutil
    import tempfile

    from .operators.similarity import ivf_index_write, semantic_dedup_incremental

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch_raw = emb.filter(F.col("vec_id") % 5 == 0)

    def perturb(df, off):
        return df.select(
            (F.col("vec_id") + off).alias("vec_id"),
            "label",
            F.concat(
                F.array(
                    (F.element_at("embedding", 1).cast("double") + F.lit(0.25)).cast(
                        "float"
                    )
                ),
                F.slice("embedding", 2, 63),
            ).alias("embedding"),
        )

    batch = batch_raw.unionByName(
        perturb(corpus.filter(F.col("vec_id") < 10), 10000)
    ).unionByName(perturb(batch_raw.filter(F.col("vec_id") < 10), 20000))
    cents = _label_mean_centroids(corpus)
    d = tempfile.mkdtemp(prefix="bdmc_semincr_")
    try:
        ivf_index_write(corpus, cents, d)
        out = semantic_dedup_incremental(spark, batch, d, cents, threshold=0.9)
        out = out.select("vec_id", "label")
        out = _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


@query(
    "n6_hard_negatives",
    """WITH u AS (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       nrm AS (SELECT vec_id, label, list_transform(v, x -> x / sqrt(
                      list_reduce(list_transform(v, y -> y * y),
                                  (a, b) -> a + b))) AS uv
               FROM u),
       q AS (SELECT vec_id AS query_id, label AS qlabel, uv AS qu
             FROM nrm WHERE vec_id < 5),
       scored AS (SELECT q.query_id, n.vec_id AS nbr_id,
                         list_reduce(list_transform(list_zip(q.qu, n.uv),
                             p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
                  FROM q JOIN nrm n
                    ON n.vec_id <> q.query_id AND n.label <> q.qlabel)
       SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, cosine FROM (
         SELECT query_id, nbr_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, nbr_id) AS rank
         FROM scored) r
       WHERE rank <= 5""",
)
def n6_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 8): hard-negative mining for contrastive retrieval
    training — for each query, the 5 most-cosine-similar vectors whose
    LABEL differs (relevance by class: the hardest cross-class
    negatives, the rows a DPR-style loss learns most from).  One
    corpus scan with the query block broadcast; the oracle replays the
    class-exclusion filter, exact dot products, and the rank window
    bit-for-bit.  See operators/similarity.hard_negatives (which also
    takes an explicit positives frame — qrels — as the exclusion)."""
    from .operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return hard_negatives(emb, q, k=5, exclude_match_col="label")


from .operators import wordpiece as _wp  # noqa: E402


@query(
    "n5_wordpiece_train",
    "WITH "
    + _wp.wordpiece_sql_steps(vocab_size=60, max_piece_len=4, max_word_len=12)
    + """
       SELECT piece, raw, is_cont, CAST(cnt AS BIGINT) AS cnt FROM wp_vocab""",
)
def n5_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): WordPiece vocab training — frequency-ranked
    (substring, position) candidates with the single-char alphabet
    always included and the budget filled by (count DESC, piece ASC,
    initial-first); one word-count shuffle + one bounded substring
    explode + a distributed TakeOrdered, no driver loops.  The oracle
    replays candidate counting and the rank cut exactly.  See
    operators/wordpiece.py."""
    docs = load_table(spark, sf_dir, "documents")
    return _wp.wordpiece_train(docs, vocab_size=60, max_piece_len=4).select(
        "piece", "raw", "is_cont", F.col("cnt").cast("long").alias("cnt")
    )


@query(
    "n5_wordpiece_segment",
    "WITH "
    + _wp.wordpiece_sql_steps(vocab_size=60, max_piece_len=4, max_word_len=12)
    + """,
       darr AS (SELECT doc_id,
                       string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                    ' ') AS arr
                FROM documents
                WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       dtok AS (SELECT doc_id, i AS pos, arr[i] AS word
                FROM darr, UNNEST(range(1, len(arr) + 1)) r(i))
       SELECT doc_id, string_agg(sg.pieces, ' ' ORDER BY pos) AS wp_str
       FROM dtok JOIN wp_seg sg USING (word)
       GROUP BY doc_id""",
)
def n5_wordpiece_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): WordPiece segmentation — BERT's greedy longest-
    match-first against the trained vocab, ## continuations, wholesale
    [UNK] on no-match/overlong words; ONE broadcast-dict Arrow kernel
    (O(1) plan depth).  The oracle replays the greedy walk with one
    unrolled CTE per consumed piece (bounded because every step
    consumes >= 1 char)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = [
        (r["raw"], r["is_cont"])
        for r in _wp.wordpiece_train(docs, vocab_size=60, max_piece_len=4).collect()
    ]
    seg = _wp.wordpiece_segment(docs, vocab, max_word_len=12)
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return seg.where(F.length(norm) > 0).select(
        "doc_id", F.concat_ws(" ", "wp_tokens").alias("wp_str")
    )


from .operators import unigram as _ug  # noqa: E402


@query(
    "n5_unigram_train",
    "WITH "
    + _ug.unigram_sql_steps(vocab_size=40, max_piece_len=4, em_rounds=2,
                            max_word_len=12)
    + """
       SELECT piece, CAST(cnt AS BIGINT) AS cnt, cost FROM ug_vocab""",
)
def n5_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): unigram-LM tokenizer training (SentencePiece
    family, hard-EM variant — operators/unigram.py documents the
    simplifications): seed substring counts -> 2 rounds of (scaled-
    integer-log costs -> per-word Viterbi E-step -> usage M-step with
    the alphabet always retained) -> rank shrink.  One distributed
    word-count pass; the EM loop runs exact and local over the vocab-
    bounded table (the BPE-fast-path argument).  The oracle replays
    every round: cost derivation, the position-unrolled Viterbi DP,
    usage re-count, and the final cut — counts AND integer costs are
    value-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return _ug.unigram_train(
        docs, vocab_size=40, max_piece_len=4, em_rounds=2
    )


@query(
    "n5_unigram_segment",
    "WITH "
    + _ug.unigram_sql_steps(vocab_size=40, max_piece_len=4, em_rounds=2,
                            max_word_len=12)
    + """,
       darr AS (SELECT doc_id,
                       string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                    ' ') AS arr
                FROM documents
                WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       dtok AS (SELECT doc_id, i AS pos, arr[i] AS word
                FROM darr, UNNEST(range(1, len(arr) + 1)) r(i))
       SELECT doc_id, string_agg(sg.pieces, ' ' ORDER BY pos) AS ug_str
       FROM dtok JOIN ug_seg sg USING (word)
       GROUP BY doc_id""",
)
def n5_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 8): Viterbi segmentation under the trained unigram LM
    — SentencePiece's inference path: each word's single best split by
    (integer cost sum, piece count, lexicographic) — all-integer
    comparisons, so the distributed kernel and the unrolled-DP oracle
    cannot drift.  ONE broadcast-dict Arrow kernel over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = [
        (r["piece"], r["cost"])
        for r in _ug.unigram_train(
            docs, vocab_size=40, max_piece_len=4, em_rounds=2
        ).collect()
    ]
    seg = _ug.unigram_segment(docs, vocab, max_piece_len=4)
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return seg.where(F.length(norm) > 0).select(
        "doc_id", F.concat_ws(" ", "ug_tokens").alias("ug_str")
    )


@query("stream_pack_sequences", _PACK_SEQ_SQL)
def stream_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + N5 composed (round 8): documents STREAM through the
    exactly-once packing sink — each micro-batch's token-id stream is
    packed into exact 128-id sequences with the < seq_len carry buffer
    bridging batch boundaries (no token dropped or duplicated, global
    seq ids monotone), published with deterministic segment names +
    _txn markers.  Three ordered micro-batches over the corpus must
    reproduce the BATCH pack_token_sequences result exactly — the SAME
    oracle as n5_pack_sequences replays it; a replayed batch publishes
    zero segments (asserted in-entry)."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from .streaming.events import pack_sequences_sink

    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    pre = docs.select(
        "doc_id", F.transform(F.split(norm, ""), lambda c: F.ascii(c)).alias("cids")
    ).where(F.length(norm) > 0)
    landing = tempfile.mkdtemp(prefix="bdmc_spack_landing_")
    oroot = tempfile.mkdtemp(prefix="bdmc_spack_out_")
    out_dir = oroot + "/pk"
    try:
        hi = pre.agg(F.max("doc_id")).first()[0] + 1
        cuts = [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi)]
        for lo, h2 in cuts:
            pre.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < h2)).coalesce(
                1
            ).write.mode("append").parquet(landing)
        sink = pack_sequences_sink(
            out_dir, app_id="stream_pack", seq_len=128,
            id_col="doc_id", ids_col="cids", eos_id=0,
        )
        stream = (
            spark.readStream.schema(pre.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        files = sorted(glob.glob(os.path.join(out_dir, "data", "*.parquet")))
        lo, h2 = cuts[-1]
        sink(pre.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < h2)), 2)
        if sorted(glob.glob(os.path.join(out_dir, "data", "*.parquet"))) != files:
            raise AssertionError("replayed batch must publish no segments")
        out = spark.read.parquet(out_dir + "/data").select(
            "seq_id",
            "n_docs",
            F.concat_ws(",", F.col("ids").cast("array<string>")).alias("ids_csv"),
        )
        out = _detach(out)
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(oroot, ignore_errors=True)
    return out


@query(
    "n3_image_dedup",
    """WITH base AS (SELECT doc_id AS img FROM documents WHERE doc_id < 100),
       imgs AS (SELECT img, FALSE AS planted FROM base
                UNION ALL
                SELECT img + 1000, TRUE FROM base WHERE img < 10),
       samp AS (SELECT i.img, r.r, c.c,
                       CASE WHEN i.planted AND r.r = 0 AND c.c = 0
                            THEN ((7 * 0 + 11 * 0
                                   + 13 * (i.img - 1000)) % 256 + 64) % 256
                            ELSE (7 * (2 * r.r) + 11 * ((c.c * 16) // 9)
                                  + 13 * (CASE WHEN i.planted THEN i.img - 1000
                                               ELSE i.img END)) % 256
                       END AS v
                FROM imgs i, UNNEST(range(0, 8)) r(r), UNNEST(range(0, 9)) c(c)),
       bits AS (SELECT s1.img, s1.r, s1.c, (s2.v > s1.v) AS bit
                FROM samp s1 JOIN samp s2
                  ON s2.img = s1.img AND s2.r = s1.r AND s2.c = s1.c + 1
                WHERE s1.c < 8),
       nib AS (SELECT img, (r * 8 + c) // 4 AS j,
                      SUM(CASE WHEN bit
                               THEN 1 << CAST((r * 8 + c) % 4 AS INT)
                               ELSE 0 END) AS nv
               FROM bits GROUP BY img, (r * 8 + c) // 4),
       hx AS (SELECT img,
                     string_agg(substr('0123456789abcdef', CAST(nv AS INT) + 1, 1),
                                '' ORDER BY j DESC) AS hx
              FROM nib GROUP BY img),
       bands AS (SELECT img, hx, b.b AS band,
                        substr(hx, CAST(2 * b.b + 1 AS INT), 2) AS key
                 FROM hx, UNNEST(range(0, 8)) b(b)),
       cand AS (SELECT DISTINCT a.img AS id_a, bb.img AS id_b,
                       a.hx AS hx_a, bb.hx AS hx_b
                FROM bands a JOIN bands bb
                  ON a.band = bb.band AND a.key = bb.key AND a.img < bb.img),
       ham AS (SELECT id_a, id_b,
                      CAST(list_reduce(list_transform(range(1, 17), i ->
                          bit_count(xor(
                              CAST(instr('0123456789abcdef',
                                   substr(hx_a, CAST(i AS INT), 1)) - 1 AS INT),
                              CAST(instr('0123456789abcdef',
                                   substr(hx_b, CAST(i AS INT), 1)) - 1 AS INT)))),
                          (x, y) -> x + y) AS INT) AS hamming
               FROM cand)
       SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 4""",
)
def n3_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3+N1 composed (round 8): perceptual IMAGE near-dup pairs by
    dHash — the visual member of the dedup family (exact/MinHash/
    SimHash/edit-distance/embedding/dHash).  Deterministic 16×16
    grayscale GIFs are synthesized per doc id (luma = (7x+11y+13·img)
    mod 256; 10 planted near-dups perturb one sampled pixel), REALLY
    encoded and decoded through the from-scratch GIF codec, dHashed
    (integer luma → 8×9 nearest sample → gradient bits → hex), and
    paired via the 8-band pigeonhole join + exact hex-fold hamming.
    The oracle replays luma→samples→bits→hex→bands→hamming CLOSED-FORM
    — so the codec roundtrip is verified against pure arithmetic.  See
    operators/multimodal.dhash64 / dhash_neardup."""
    from .operators.multimodal import dhash64, dhash_neardup, encode_gif

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 100)
    )
    ids = docs.select(
        F.col("doc_id").alias("img"), F.lit(False).alias("planted")
    ).unionByName(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000).alias("img"), F.lit(True).alias("planted")
        )
    )
    palette = [(g, g, g) for g in range(256)]

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for img, planted in zip(pdf["img"], pdf["planted"]):
                b = int(img) - 1000 if planted else int(img)
                grid = [
                    [(7 * x + 11 * y + 13 * b) % 256 for y in range(16)]
                    for x in range(16)
                ]
                if planted:
                    grid[0][0] = (grid[0][0] + 64) % 256
                payloads.append(
                    encode_gif(np.array(grid, dtype=np.uint8), palette)
                )
            yield pdf.assign(payload=payloads)

    media = ids.mapInPandas(gen, schema="img long, planted boolean, payload binary")
    hashes = dhash64(media, "payload", "img")
    return dhash_neardup(hashes, "img", max_hamming=4)


@query(
    "n3_image_resize",
    """WITH imgs AS (SELECT doc_id AS img FROM documents WHERE doc_id < 100),
       px AS (SELECT img, r.r, c.c, (7 * r.r + 11 * c.c + 13 * img) % 256 AS v
              FROM imgs, UNNEST(range(0, 16)) r(r), UNNEST(range(0, 16)) c(c)),
       box AS (SELECT img, 'box' AS method,
                      CAST(r // 4 AS INT) AS y, CAST(c // 4 AS INT) AS x,
                      CAST(SUM(v) // 16 AS INT) AS v
               FROM px GROUP BY img, r // 4, c // 4),
       nst AS (SELECT img, 'nearest' AS method,
                      CAST(y.y AS INT) AS y, CAST(x.x AS INT) AS x,
                      CAST((7 * (4 * y.y) + 11 * (4 * x.x) + 13 * img) % 256
                           AS INT) AS v
               FROM imgs, UNNEST(range(0, 4)) y(y), UNNEST(range(0, 4)) x(x))
       SELECT img, method, y, x, v FROM box
       UNION ALL
       SELECT img, method, y, x, v FROM nst""",
)
def n3_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 (round 9): INTEGER-EXACT image resize — the mandate's
    'resize' stage made oracle-checkable.  Deterministic 16×16
    grayscale GIFs (luma = (7·row + 11·col + 13·img) mod 256) are
    REALLY encoded and decoded through the from-scratch GIF codec,
    then downsampled to 4×4 both ways: 'box' (floor mean over each
    4×4 source block — SUM // 16) and 'nearest' (dHash's
    floor-index sampling rule).  One row per output pixel; the oracle
    replays every value closed-form, so the encode→decode→resize
    chain is verified against pure arithmetic.  See
    operators/multimodal.image_resize_pixels."""
    from .operators.multimodal import encode_gif, image_resize_pixels

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 100)
    )
    palette = [(g, g, g) for g in range(256)]

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for img in pdf["doc_id"]:
                grid = [
                    [(7 * r + 11 * c + 13 * int(img)) % 256 for c in range(16)]
                    for r in range(16)
                ]
                payloads.append(encode_gif(np.array(grid, dtype=np.uint8), palette))
            yield pdf.assign(payload=payloads)

    media = docs.mapInPandas(gen, schema="doc_id long, payload binary").withColumnRenamed(
        "doc_id", "img"
    )
    box = image_resize_pixels(media, 4, 4, "box", "payload", "img").withColumn(
        "method", F.lit("box")
    )
    nst = image_resize_pixels(media, 4, 4, "nearest", "payload", "img").withColumn(
        "method", F.lit("nearest")
    )
    return box.unionByName(nst).select("img", "method", "y", "x", "v")


@query(
    "n3_audio_resample",
    """WITH clips AS (SELECT doc_id AS clip FROM documents WHERE doc_id < 60),
       samp AS (SELECT clip, i.i,
                       CAST(((i.i * i.i * 7 + i.i * 13 + 997 * clip) % 4096)
                            - 2048 AS BIGINT) AS s
                FROM clips, UNNEST(range(0, 2080)) i(i)),
       mn AS (SELECT clip, 'mean' AS method, CAST(i // 64 AS INT) AS i,
                     CAST(SUM(s) // 64 AS BIGINT) AS v
              FROM samp WHERE i < 2048 GROUP BY clip, i // 64),
       dc AS (SELECT clip, 'decimate' AS method, CAST(i // 64 AS INT) AS i, s AS v
              FROM samp WHERE i % 64 = 0 AND i < 2048)
       SELECT clip, method, i, v FROM mn
       UNION ALL
       SELECT clip, method, i, v FROM dc""",
)
def n3_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 (round 9): INTEGER-EXACT audio downsample — the resample
    stage of the multimodal mandate, oracle-checkable.  Deterministic
    PCM-16 clips (the n3_audio_dedup sample formula, 2080 samples) are
    REALLY encoded and decoded through the stdlib-wave codec path and
    reduced 64× both ways: block mean with TRUNCATING integer
    division (SQL div semantics) and plain decimation.  One row per
    output sample; the oracle replays the formula and both reductions
    closed-form (operators/multimodal.audio_resample_samples)."""
    from .operators.multimodal import audio_resample_samples

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 60)
    )

    def gen(batches):
        import io
        import struct
        import wave

        for pdf in batches:
            payloads = []
            for img in pdf["doc_id"]:
                b = int(img)
                s = [((i * i * 7 + i * 13 + 997 * b) % 4096) - 2048
                     for i in range(2080)]
                bio = io.BytesIO()
                with wave.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(struct.pack(f"<{len(s)}h", *s))
                payloads.append(bio.getvalue())
            yield pdf.assign(payload=payloads)

    media = docs.mapInPandas(gen, schema="doc_id long, payload binary").withColumnRenamed(
        "doc_id", "clip"
    )
    mn = audio_resample_samples(media, 64, "mean", "payload", "clip").withColumn(
        "method", F.lit("mean")
    )
    dc = audio_resample_samples(media, 64, "decimate", "payload", "clip").withColumn(
        "method", F.lit("decimate")
    )
    return mn.unionByName(dc).select("clip", "method", "i", "v")


@query(
    "n3_audio_dedup",
    """WITH base AS (SELECT doc_id AS img FROM documents WHERE doc_id < 60),
       clips AS (SELECT img, FALSE AS planted FROM base
                 UNION ALL
                 SELECT img + 1000, TRUE FROM base WHERE img < 10),
       samp AS (SELECT c.img, i.i,
                       ((i.i * i.i * 7 + i.i * 13
                         + 997 * (CASE WHEN c.planted THEN c.img - 1000
                                       ELSE c.img END)) % 4096) - 2048
                       + (CASE WHEN c.planted AND i.i = 0 THEN 500 ELSE 0 END)
                           AS s
                FROM clips c, UNNEST(range(0, 2080)) i(i)),
       en AS (SELECT img, i // 32 AS f, SUM(s * s) AS e
              FROM samp GROUP BY img, i // 32),
       bits AS (SELECT a.img, a.f AS i, (b.e > a.e) AS bit
                FROM en a JOIN en b ON b.img = a.img AND b.f = a.f + 1
                WHERE a.f < 64),
       nib AS (SELECT img, i // 4 AS j,
                      SUM(CASE WHEN bit THEN 1 << CAST(i % 4 AS INT)
                               ELSE 0 END) AS nv
               FROM bits GROUP BY img, i // 4),
       hx AS (SELECT img,
                     string_agg(substr('0123456789abcdef', CAST(nv AS INT) + 1, 1),
                                '' ORDER BY j DESC) AS hx
              FROM nib GROUP BY img),
       bands AS (SELECT img, hx, b.b AS band,
                        substr(hx, CAST(2 * b.b + 1 AS INT), 2) AS key
                 FROM hx, UNNEST(range(0, 8)) b(b)),
       cand AS (SELECT DISTINCT a.img AS id_a, bb.img AS id_b,
                       a.hx AS hx_a, bb.hx AS hx_b
                FROM bands a JOIN bands bb
                  ON a.band = bb.band AND a.key = bb.key AND a.img < bb.img),
       ham AS (SELECT id_a, id_b,
                      CAST(list_reduce(list_transform(range(1, 17), i ->
                          bit_count(xor(
                              CAST(instr('0123456789abcdef',
                                   substr(hx_a, CAST(i AS INT), 1)) - 1 AS INT),
                              CAST(instr('0123456789abcdef',
                                   substr(hx_b, CAST(i AS INT), 1)) - 1 AS INT)))),
                          (x, y) -> x + y) AS INT) AS hamming
               FROM cand)
       SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 4""",
)
def n3_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3+N1 composed (round 8): perceptual AUDIO near-dup pairs by the
    energy-envelope fingerprint — completing the dedup family across
    modalities (text, embedding, image, audio).  Deterministic PCM-16
    WAV clips are synthesized per doc id (s[i] = ((7i²+13i+997·img) mod
    4096) − 2048, 65 frames × 32 samples; 10 planted near-dups bump
    one sample in frame 0), REALLY encoded and decoded through the
    stdlib-wave codec path, fingerprinted (integer frame energies →
    envelope-gradient bits → hex), and paired via the same 8-band
    pigeonhole + hex-fold hamming as dHash.  The oracle replays
    samples→energies→bits→hex→bands→hamming closed-form — the WAV
    roundtrip verified against pure arithmetic.  See
    operators/multimodal.audio_fingerprint / dhash_neardup."""
    from .operators.multimodal import audio_fingerprint, dhash_neardup

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 60)
    )
    ids = docs.select(
        F.col("doc_id").alias("img"), F.lit(False).alias("planted")
    ).unionByName(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000).alias("img"), F.lit(True).alias("planted")
        )
    )

    def gen(batches):
        import io
        import struct
        import wave

        for pdf in batches:
            payloads = []
            for img, planted in zip(pdf["img"], pdf["planted"]):
                b = int(img) - 1000 if planted else int(img)
                s = [((i * i * 7 + i * 13 + 997 * b) % 4096) - 2048
                     for i in range(2080)]
                if planted:
                    s[0] += 500
                bio = io.BytesIO()
                with wave.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(struct.pack(f"<{len(s)}h", *s))
                payloads.append(bio.getvalue())
            yield pdf.assign(payload=payloads)

    media = ids.mapInPandas(gen, schema="img long, planted boolean, payload binary")
    hashes = audio_fingerprint(media, "payload", "img")
    return dhash_neardup(hashes, "img", hash_col="afp_hex", max_hamming=4)


@query(
    "n6_hybrid_rrf",
    f"""WITH lex AS (SELECT * FROM (
         {_retrieval.bm25_topk_sql(["spark", "merge", "window"], k=20)}
       )),
       {_UNIT_SQL.strip()},
       q0 AS (SELECT uv AS qv FROM nrm WHERE vec_id = 0),
       s AS (SELECT c.vec_id AS doc_id,
                    list_reduce(list_transform(list_zip(q0.qv, c.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM nrm c CROSS JOIN q0 WHERE c.vec_id <> 0),
       sem AS (SELECT doc_id, rank FROM (
                 SELECT doc_id,
                        CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                             AS INT) AS rank
                 FROM s) WHERE rank <= 20),
       fused AS (SELECT doc_id,
                        COALESCE(1.0 / (60.0 + CAST(l.rank AS DOUBLE)), 0.0)
                        + COALESCE(1.0 / (60.0 + CAST(sem.rank AS DOUBLE)), 0.0)
                            AS rrf_score
                 FROM lex l FULL OUTER JOIN sem USING (doc_id))
       SELECT doc_id, rrf_score, CAST(rank AS INT) AS rank FROM (
         SELECT doc_id, rrf_score,
                ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
         FROM fused) WHERE rank <= 10""",
)
def n6_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 8): HYBRID retrieval by Reciprocal Rank Fusion — the
    production-standard combiner for lexical + vector search: BM25
    top-20 (rational Robertson idf) fused with cosine top-20 for the
    vec_id-0 query embedding by score(d) = Σ 1/(60 + rank), fixed-order
    coalesced sum so the fused doubles replay bit-exactly.  Rank-based
    fusion needs no score calibration between the two signal families
    — the reason RRF wins in practice.  See
    operators/retrieval.rrf_fuse."""
    from .operators.retrieval import bm25_topk, rrf_fuse
    from .operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "merge", "window"], k=20).select(
        "doc_id", "rank"
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = cosine_topk(emb, q0, k=20, query_id_col="query_id").select(
        F.col("nbr_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, sem], k=10)


@query(
    "n6_maxsim_topk",
    """WITH u AS (SELECT vec_id // 5 AS doc_id, vec_id % 5 AS tok_pos,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
       n AS (SELECT doc_id, tok_pos,
                    list_transform(v, x -> x / sqrt(list_reduce(
                        list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
             FROM u),
       q AS (SELECT doc_id AS query_id, tok_pos AS qpos, uv AS qu
             FROM n WHERE doc_id < 3),
       d AS (SELECT doc_id, uv AS du FROM n WHERE doc_id >= 3),
       s AS (SELECT q.query_id, q.qpos, d.doc_id,
                    list_reduce(list_transform(list_zip(q.qu, d.du),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM d CROSS JOIN q),
       mx AS (SELECT query_id, qpos, doc_id, max(cos) AS m
              FROM s GROUP BY 1, 2, 3),
       sc AS (SELECT query_id, doc_id,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list(m ORDER BY qpos)), (a, b) -> a + b) AS score
              FROM mx GROUP BY 1, 2)
       SELECT query_id, doc_id, rank, score FROM (
         SELECT query_id, doc_id, score,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS INT) AS rank
         FROM sc) r
       WHERE rank <= 5""",
)
def n6_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 9): ColBERT-style MaxSim late-interaction retrieval —
    documents as BAGS of token vectors, score(q,d) = Σ_{q tokens}
    max_{d tokens} cosine.  Token embeddings are carved
    deterministically from the embeddings table (doc_id = vec_id DIV 5,
    tok_pos = vec_id % 5 → 5-token documents); the first 3 documents
    are the queries, the rest the corpus.  Query tokens broadcast, one
    corpus-token scan, the per-doc sum folds maxes in query-token order
    so scores replay bit-for-bit (operators/retrieval.maxsim_topk)."""
    from .operators.retrieval import maxsim_topk

    emb = load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        F.expr("vec_id DIV 5").alias("doc_id"),
        (F.col("vec_id") % 5).alias("tok_pos"),
        F.col("embedding").alias("vec"),
    )
    return maxsim_topk(
        toks.filter(F.col("doc_id") >= 3),
        toks.filter(F.col("doc_id") < 3).withColumnRenamed("doc_id", "query_id"),
        k=5,
    )


@query(
    "n4_text_embed_ann",
    """WITH norm0 AS (SELECT doc_id,
                trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
         FROM documents),
       toksl AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok
                 FROM norm0 WHERE length(t) > 0),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toksl GROUP BY 1, 2),
       dfreq AS (SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY 1),
       nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toksl),
       wts AS (SELECT f.doc_id, f.tok,
                      ('0x' || substr(md5(f.tok), 1, 15))::BIGINT AS h,
                      (CASE WHEN ((('0x' || substr(md5(f.tok), 1, 15))::BIGINT
                                   // 32) % 2) = 0
                            THEN 1.0 ELSE -1.0 END)
                      * (CAST(f.tf AS DOUBLE)
                         * ((CAST(nd.n AS DOUBLE) - CAST(d.dfc AS DOUBLE) + 0.5)
                            / (CAST(d.dfc AS DOUBLE) + 0.5))) AS w
               FROM tf f JOIN dfreq d USING (tok) CROSS JOIN nd),
       bk AS (SELECT doc_id, CAST(h % 32 AS INT) AS b,
                     list_reduce(list(w ORDER BY tok), (x, y) -> x + y) AS val
              FROM wts GROUP BY doc_id, CAST(h % 32 AS INT)),
       vec AS (SELECT dd.doc_id,
                      list(COALESCE(bk.val, 0.0) ORDER BY g.b) AS v
               FROM (SELECT DISTINCT doc_id FROM toksl) dd
               CROSS JOIN UNNEST(range(0, 32)) g(b)
               LEFT JOIN bk ON bk.doc_id = dd.doc_id AND bk.b = g.b
               GROUP BY dd.doc_id),
       nrm AS (SELECT doc_id, list_transform(v, x -> x / sqrt(list_reduce(
                      list_transform(v, y -> y * y), (a, c) -> a + c))) AS uv
               FROM vec),
       q AS (SELECT doc_id AS query_id, uv AS qv FROM nrm WHERE doc_id < 3),
       s AS (SELECT q.query_id, c.doc_id AS nbr_id,
                    list_reduce(list_transform(list_zip(q.qv, c.uv),
                        p -> p[1] * p[2]), (x, y) -> x + y) AS cos
             FROM nrm c CROSS JOIN q WHERE c.doc_id <> q.query_id)
       SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, cos AS cosine FROM (
         SELECT query_id, nbr_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, nbr_id) AS rank
         FROM s) r
       WHERE rank <= 5""",
)
def n4_text_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4+N2 composed (round 8): similarity search over RAW TEXT with
    no neural encoder — feature-hashing TF-IDF embeddings (portable
    md5 buckets, ± sign trick, Robertson rational idf, explicit-order
    folds) feed the standard cosine top-k: top-5 neighbors for 3 query
    documents.  The oracle replays tokenize → tf/df → hash/sign/idf →
    bucket folds → dense assembly → normalize → rank bit-exactly —
    the full text→vector→ANN loop value-checked end to end.  See
    operators/text.text_embed_hashed."""
    from .operators.similarity import cosine_topk
    from .operators.text import text_embed_hashed

    docs = load_table(spark, sf_dir, "documents")
    emb = text_embed_hashed(docs, dim=32)
    q = emb.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    return cosine_topk(
        emb, q, k=5, id_col="doc_id", query_id_col="query_id"
    )


from .operators import inference as _inf  # noqa: E402


def _mlp_token_ids(spark: SparkSession, sf_dir: str, vocab: int = 64) -> DataFrame:
    """documents tokenized to portable-hash ids mod vocab — the
    tokenizer-output shape the inference kernel consumes, replayable in
    any engine (md5-prefix hash, mirrored in mlp_embed_sql_steps)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tid = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % vocab
    )
    return docs.select(
        "doc_id", F.transform(F.split("text", " "), tid).alias("ids")
    )


@query(
    "n2_mlp_embed",
    "WITH "
    + _inf.mlp_embed_sql_steps()
    + """
       SELECT id AS doc_id, CAST(n_toks AS INT) AS n_toks,
              array_to_string([CAST(y0 AS VARCHAR), CAST(y1 AS VARCHAR),
                               CAST(y2 AS VARCHAR), CAST(y3 AS VARCHAR)],
                              ',') AS y_csv
       FROM mlp_y""",
)
def n2_mlp_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): batched MODEL-INFERENCE embeddings — a small MLP
    encoder (embedding-bag sum pool → affine+ReLU → affine) run as one
    broadcast-weights Arrow matmul kernel over token-id arrays
    (operators/inference.mlp_embed).  Deterministic integer weights
    make every lookup/sum/matmul/ReLU exact int64 arithmetic, so the
    oracle replays the ENTIRE inference chain value-for-value (the
    pre-normalization vectors pinned as integer csv)."""
    ids = _mlp_token_ids(spark, sf_dir)
    emb = _inf.mlp_embed(ids, _inf.deterministic_weights(64), raw_col="y")
    return emb.select(
        "doc_id",
        F.size("ids").cast("int").alias("n_toks"),
        F.concat_ws(",", F.transform("y", lambda v: v.cast("string"))).alias(
            "y_csv"
        ),
    )


@query(
    "n2_mlp_embed_ann",
    "WITH "
    + _inf.mlp_embed_sql_steps()
    + """,
       vecs AS (SELECT id, y0, y1, y2, y3,
                       y0*y0 + y1*y1 + y2*y2 + y3*y3 AS nsq
                FROM mlp_y),
       pairs AS (SELECT q.id AS query_id, d.id AS nbr_id,
                        q.y0*d.y0 + q.y1*d.y1 + q.y2*d.y2 + q.y3*d.y3 AS dot,
                        CAST(q.y0*d.y0 + q.y1*d.y1 + q.y2*d.y2 + q.y3*d.y3
                             AS DOUBLE) / (sqrt(CAST(q.nsq AS DOUBLE))
                                           * sqrt(CAST(d.nsq AS DOUBLE))) AS cos
                 FROM vecs q JOIN vecs d ON q.id < 5 AND d.id <> q.id
                 WHERE q.nsq > 0 AND d.nsq > 0),
       ranked AS (SELECT query_id, nbr_id, dot, cos,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, nbr_id ASC) AS rank
                  FROM pairs)
       SELECT query_id, nbr_id, CAST(rank AS INT) AS rank,
              CAST(dot AS BIGINT) AS dot, cos
       FROM ranked WHERE rank <= 3""",
)
def n2_mlp_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 composed (round 9): the learned-embedding ANN loop — MLP
    inference output feeds cosine top-3 neighbors for the first 5
    docs.  Integer dot products and IEEE-exact sqrt/division keep even
    the cosine DOUBLES bit-identical to the oracle; ordering ties
    break on nbr_id."""
    from pyspark.sql import Window

    ids = _mlp_token_ids(spark, sf_dir)
    emb = _inf.mlp_embed(ids, _inf.deterministic_weights(64), raw_col="y")
    nsq = F.aggregate(
        F.transform("y", lambda v: v * v), F.lit(0).cast("long"), lambda a, x: a + x
    )
    vecs = emb.select("doc_id", "y", nsq.alias("nsq")).filter(F.col("nsq") > 0)
    q = vecs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("y").alias("qy"),
        F.col("nsq").alias("qnsq"),
    )
    dot = F.aggregate(
        F.zip_with("qy", "y", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    pairs = (
        vecs.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("nbr_id"),
            dot.alias("dot"),
            (
                dot.cast("double")
                / (F.sqrt(F.col("qnsq").cast("double")) * F.sqrt(F.col("nsq").cast("double")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "nbr_id", "rank", "dot", "cos")
    )


@query(
    "ann_ivf_assign_broadcast",
    """WITH u AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
  nrm AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_reduce(
                     list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
          FROM u),
  cellc AS (SELECT label AS cid, i AS dim,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS mv
            FROM (SELECT label, unnest(v) AS v,
                         unnest(range(0, len(v))) AS i FROM u)
            GROUP BY label, i),
  cents AS (SELECT cid, list(mv ORDER BY dim) AS c FROM cellc GROUP BY cid),
  cnorm AS (SELECT cid, list_transform(c, x -> x / sqrt(list_reduce(
                 list_transform(c, y -> y * y), (a, b) -> a + b))) AS uc
            FROM cents),
  asg AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM (SELECT n.vec_id, cn.cid,
                       list_reduce(list_transform(list_zip(n.uv, cn.uc),
                           p -> p[1] * p[2]), (x, y) -> x + y) AS sim
                FROM nrm n CROSS JOIN cnorm cn))
  SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM asg WHERE rn = 1""",
)
def ann_ivf_assign_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): quantizer assignment through the BROADCAST kernel
    (similarity.ivf_assign_broadcast) — the large-k·d answer to the
    plan-literal trade-off `ivf_assign` documents: centroids ship once
    as a Spark broadcast and one Arrow kernel scores every (row,
    centroid) pair with the IDENTICAL left-to-right IEEE fold, so the
    oracle's cross-join argmax replays the assignment exactly.  Same
    deterministic per-label centroids (decimal-exact means) as the
    ann_ivf_partitioned family."""
    from .operators.similarity import ivf_assign_broadcast, with_unit_vector

    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cellrows = cells.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mv")
    ).collect()  # bounded: k labels x d dims
    by_label: dict[int, dict[int, float]] = {}
    for r in cellrows:
        by_label.setdefault(r["label"], {})[r["pos"]] = r["mv"]
    labels = sorted(by_label)
    cents = [[by_label[cid][i] for i in range(len(by_label[cid]))] for cid in labels]
    uemb = with_unit_vector(emb, "embedding", "cu").select("vec_id", "cu")
    assigned = ivf_assign_broadcast(
        uemb, cents, vec_col="cu", metric="cosine", normalize_centroids=True
    )
    lab_arr = F.array(*[F.lit(int(c)) for c in labels])
    return assigned.select(
        "vec_id",
        F.element_at(lab_arr, F.col("cluster") + 1).cast("bigint").alias("cluster"),
    )


@query(
    "stream_warc_ingest",
    f"""WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents),
       anch AS (SELECT doc_id,
                       regexp_extract_all(html, '(?is)<a\\b[^>]*>(.*?)</a>', 1) AS al
                FROM h),
       ext AS (SELECT h.doc_id,
                      {_html_strip_sql('h.html')} AS text,
                      CAST(len(a.al) AS INT) AS n_links,
                      array_to_string(list_transform(a.al,
                          x -> {_html_strip_sql('x')}), ' ') AS atext
               FROM h JOIN anch a USING (doc_id))
       SELECT doc_id, 200 AS http_status, text, n_links,
              CASE WHEN length(text) > 0
                   THEN least(CAST(length(atext) AS DOUBLE) / length(text), 1.0)
                   ELSE 0.0 END AS link_density
       FROM ext""",
)
def stream_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+S14+N4 composed (round 9): CONTINUOUS crawl ingestion —
    WARC archives land in a directory and stream through parse → HTTP
    strip → html_extract as micro-batches (one archive per trigger,
    exactly-once file tracking), into a memory sink.  The finished
    stream must equal the batch n4_warc_html_extract oracle exactly:
    nothing dropped or duplicated across archive boundaries, and every
    curation op downstream of the parser is stateless so the streaming
    plan IS the batch plan."""
    import shutil
    import tempfile
    import uuid

    from .operators.text import html_extract
    from .sources import warc as wsrc
    from .streaming.events import run_stream_to_memory

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>doc</title><script>var x="</div>";'
            "</script></head><body><p>"
        ),
        F.col("text"),
        F.lit(
            '</p><a href="/a">home</a> '
            '<a href="/b">next &amp; prev</a></body></html>'
        ),
    )
    out = docs.select(
        F.concat(F.lit("http://corpus.local/doc/"), F.col("doc_id")).alias(
            "target_uri"
        ),
        F.encode(
            F.concat(
                F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
            ),
            "UTF-8",
        ).alias("payload"),
    )
    landing = tempfile.mkdtemp(prefix="bdmc_warc_stream_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_warc"
    try:
        # 4 archive shards = 4 micro-batches (maxFilesPerTrigger=1)
        wsrc.write_warc(out.repartition(4), landing)
        recs = wsrc.stream_warc(spark, landing).select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            wsrc.http_parts(F.col("payload")).alias("p"),
        ).select("doc_id", "p.http_status", F.col("p.body").alias("html"))
        # keep_cols passthrough keeps this ONE stateless narrow select —
        # a re-join here would be a stateful stream-stream join
        ext = html_extract(recs, keep_cols=("http_status",))
        run_stream_to_memory(ext, qname)
        got = spark.table(qname)
        return _detach(got)
    finally:
        shutil.rmtree(landing, ignore_errors=True)


@query(
    "n3_gif_frames",
    """WITH px AS (SELECT doc_id, r, c
               FROM documents, range(8) t1(r), range(8) t2(c)),
       lay AS (SELECT doc_id, r, c,
                      (r + c + doc_id) % 4 AS i0,
                      CASE WHEN r BETWEEN 2 AND 5 AND c BETWEEN 2 AND 5
                           THEN ((r-2)*(c-2) + doc_id) % 4 END AS i1,
                      (2*r + c + doc_id) % 4 AS i2,
                      (r BETWEEN 2 AND 5 AND c BETWEEN 2 AND 5) AS reg
               FROM px),
       -- palette component sums: idx0=(0,0,0)->0, 1->60, 2->330, 3->630;
       -- background index 3 (630); transparency index 0 everywhere
       c0 AS (SELECT *, CASE WHEN i0 = 0 THEN 630  -- transparent -> bg
                             WHEN i0 = 1 THEN 60
                             WHEN i0 = 2 THEN 330 ELSE 630 END AS v0
              FROM lay),
       c1 AS (SELECT *, CASE WHEN i1 IS NULL OR i1 = 0 THEN v0
                             WHEN i1 = 1 THEN 60
                             WHEN i1 = 2 THEN 330 ELSE 630 END AS v1
              FROM c0),
       c2 AS (SELECT *, CASE WHEN i2 = 1 THEN 60
                             WHEN i2 = 2 THEN 330
                             WHEN i2 = 3 THEN 630
                             WHEN reg THEN 630   -- disposal-2 bg restore
                             ELSE v1 END AS v2
              FROM c1),
       uni AS (SELECT doc_id, 0 AS frame_index, v0 AS v FROM c2
               UNION ALL SELECT doc_id, 1, v1 FROM c2
               UNION ALL SELECT doc_id, 2, v2 FROM c2)
       SELECT doc_id, CAST(frame_index AS INT) AS frame_index,
              8 AS width, 8 AS height,
              CAST(SUM(v) AS BIGINT) AS pix_sum
       FROM uni GROUP BY doc_id, frame_index""",
)
def n3_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 (round 9): ANIMATED-GIF frame fan-out with full composition —
    per-doc three-frame animations (full base frame; a transparent 4x4
    overlay at (2,2) with DISPOSAL 2; a full final frame painted over
    the background-restored canvas) are REALLY encoded through the
    from-scratch animated encoder, decoded frame-by-frame by
    ``gif_frames`` (offsets, GCE transparency, disposal restore), and
    fanned out one row per composed frame.  The oracle replays the
    whole composition closed-form (palette component sums per pixel),
    so codec, composition and fan-out are all value-checked."""
    from pyspark.sql import types as T

    from .operators.multimodal import encode_gif_animation, gif_frame_fanout

    pal = [(0, 0, 0), (10, 20, 30), (100, 110, 120), (200, 210, 220)]
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                f0 = [[(r + c + d) % 4 for c in range(8)] for r in range(8)]
                f1 = [[(r * c + d) % 4 for c in range(4)] for r in range(4)]
                f2 = [[(2 * r + c + d) % 4 for c in range(8)] for r in range(8)]
                payloads.append(
                    encode_gif_animation(
                        [f0, f1, f2],
                        pal,
                        offsets=[(0, 0), (2, 2), (0, 0)],
                        disposals=[1, 2, 1],
                        transparent_idx=0,
                        background_idx=3,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    blobs = docs.mapInPandas(build, "doc_id long, content binary")
    frames = gif_frame_fanout(blobs, id_col="doc_id")

    def summarize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "frame_index": pdf["frame_index"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "pix_sum": [
                        int(np.frombuffer(b, dtype=np.uint8).astype(np.int64).sum())
                        for b in pdf["frame_rgb"]
                    ],
                }
            )

    return frames.mapInPandas(
        summarize,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("frame_index", T.IntegerType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("pix_sum", T.LongType()),
            ]
        ),
    )


def _web_pipeline_sql() -> str:
    """The end-to-end web-curation oracle: quality/lang/repetition gates
    + exact-dedup keep-first (the n5_curation_pipeline CTEs) -> portable
    minhash near-dup keep-first drop among the survivors (the
    _minhash_cte_sql chain re-rooted at the survivor set) -> char-id
    sequence packing (the _PACK_SEQ_SQL algebra re-rooted likewise)."""
    mh = _dedup._minhash_cte_sql("surv0", "doc_id", "text", 3, 32, 8)
    return f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       x AS (SELECT doc_id, CAST(len(sp) AS DOUBLE) AS n,
                    CAST(len(list_distinct(sp)) AS DOUBLE) AS nu,
                    CAST(len(list_filter(sp, t -> t IN {_STOP_EN_SQL})) AS DOUBLE) AS ns
             FROM t),
       qual AS (SELECT doc_id, (least(n, 100.0)/100.0*4.0 + nu/n*4.0
                                + least(ns/n*5.0, 1.0)*2.0)/10.0 AS quality FROM x),
       h AS (SELECT doc_id,
               len(list_filter(sp, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
               len(list_filter(sp, t -> t IN ('the','a','of','and','to','in','is','that'))) AS en,
               len(list_filter(sp, t -> t IN ('el','la','los','y','es','un','una','en'))) AS es,
               len(list_filter(sp, t -> t IN ('le','la','les','et','est','un','une','dans'))) AS fr,
               len(list_filter(sp, t -> t IN ('的','是','了','在','和','有','我','不'))) AS zh
             FROM t),
       lng AS (SELECT doc_id,
                 CASE WHEN greatest(de,en,es,fr,zh) <= 0 THEN 'und'
                      WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
                      WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
                      WHEN es >= fr AND es >= zh THEN 'es'
                      WHEN fr >= zh THEN 'fr'
                      ELSE 'zh' END AS detected_lang FROM h),
       g AS (SELECT doc_id,
                    CASE WHEN len(sp) < 2 THEN []
                         ELSE list_transform(range(0, len(sp) - 1),
                              i -> sp[i+1] || chr(31) || sp[i+2]) END AS grams
             FROM t),
       rep AS (SELECT doc_id,
                      CASE WHEN len(grams) = 0 THEN NULL
                           ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                    / CAST(len(grams) AS DOUBLE) END AS repetition
               FROM g),
       keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
       surv0 AS (SELECT d.doc_id, d.text
                 FROM documents d
                 JOIN qual q USING (doc_id)
                 JOIN lng l USING (doc_id)
                 JOIN rep r USING (doc_id)
                 JOIN keep k USING (doc_id)
                 WHERE q.quality >= 0.45 AND l.detected_lang = 'en'
                   AND r.repetition <= 0.2),
       {mh},
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle
                                     AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
       neardup AS (SELECT j.id_b
                   FROM (SELECT id_a, id_b,
                                CAST(inter AS DOUBLE)
                                / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jac
                         FROM shared
                         JOIN sizes sa ON sa.doc_id = id_a
                         JOIN sizes sb ON sb.doc_id = id_b) j
                   JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
                   WHERE j.jac >= 0.2),
       surv AS (SELECT * FROM surv0
                WHERE doc_id NOT IN (SELECT id_b FROM neardup)),
       norm AS (SELECT doc_id,
                trim(regexp_replace(text, '\\s+', ' ', 'g')) AS tx FROM surv),
       pids AS (SELECT doc_id,
                      list_append(list_transform(range(1, length(tx) + 1),
                                                 i -> ascii(substr(tx, i, 1))), 0) AS v
               FROM norm WHERE length(tx) > 0),
       offs AS (SELECT doc_id, v, len(v) AS n,
                       CAST(COALESCE(SUM(len(v)) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS strt
                FROM pids),
       pieces AS (SELECT s.seq, o.strt,
                         list_slice(o.v,
                             greatest(0, s.seq * 128 - o.strt) + 1,
                             least(o.strt + o.n, (s.seq + 1) * 128) - o.strt) AS piece
                  FROM offs o,
                       UNNEST(range(o.strt // 128,
                                    (o.strt + o.n - 1) // 128 + 1)) s(seq)),
       seqs AS (SELECT seq, CAST(COUNT(*) AS INT) AS n_docs,
                       flatten(list(piece ORDER BY strt)) AS idsarr
                FROM pieces GROUP BY seq)
       SELECT CAST(seq AS BIGINT) AS seq_id, n_docs,
              array_to_string(list_transform(idsarr, x -> CAST(x AS VARCHAR)),
                              ',') AS ids_csv
       FROM seqs WHERE len(idsarr) = 128"""


@query("n5_web_pipeline", _web_pipeline_sql())
def n5_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END WEB PIPELINE (round 9 capstone): raw corpus →
    real WARC archives on disk → streamed-shape record parse → quality
    + language + repetition gates and exact-dedup keep-first (one scan,
    one projection) → portable-minhash NEAR-dup keep-first drop among
    the survivors → fixed-length training sequences via the
    hierarchical-prefix-sum packer.  Every stage is the proven
    production operator; the oracle replays ingestion (identity by the
    s14 roundtrip pin), all three gates, both dedup rules, and the
    packing algebra in one CTE chain — a user's whole curation run
    value-checked end to end."""
    import shutil
    import tempfile

    from .operators.sampling import pack_token_sequences
    from .sources import warc as wsrc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="bdmc_webpipe_")
    try:
        # archive count = write AND read parallelism (the gzip
        # member-per-record writes are Python-side CPU, and read_warc
        # parallelizes per file): derive it from the session's core
        # count instead of a constant so the stage fills the machine at
        # any SPARK_GRAFT_CPUS (guide §2: scale-adaptive partitioning;
        # 16 archives left half of local[32] idle, 4 left 3/4 idle).
        # Capped at 512: on a large cluster defaultParallelism is in
        # the thousands and uncapped one-archive-per-core would shred
        # the corpus into tiny files (guide §6 small-files pressure);
        # past the cap, per-file read tasks are still plentiful enough
        # to fill any executor wave this fixture-scale stage can use.
        n_arch = min(max(16, spark.sparkContext.defaultParallelism), 512)
        wsrc.write_warc(
            docs.select(
                F.concat(F.lit("http://corpus.local/doc/"), F.col("doc_id")).alias(
                    "target_uri"
                ),
                F.encode(F.col("text"), "UTF-8").alias("payload"),
            ).repartition(n_arch),
            d,
            warc_type="resource",
            content_type="text/plain",
        )
        corpus = wsrc.read_warc(spark, d).select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
        # materialize the PARSED corpus once: it feeds two consumers
        # (the gate projection and the exact-dedup groupBy), and the
        # parse is a Python mapInPandas gzip+framing pass — without the
        # cut each consumer re-runs the whole WARC read (guide §1/§5:
        # one full pass of the heavy opaque stage, not one per consumer).
        # localCheckpoint pins the frame in executor storage and is not
        # recomputable on executor loss — right for this fixture-scale
        # bench; a 100 TB deployment swaps it for
        # persist(StorageLevel.DISK_ONLY) or a reliable checkpoint.
        corpus = corpus.localCheckpoint(eager=True)
        base = _text.with_tokens(corpus)
        toks = F.col("__toks")
        sig = base.select(
            "doc_id",
            "text",
            _text.quality_col("text", toks).alias("quality"),
            _text.detected_lang_col("text", toks).alias("detected_lang"),
            _text.repetition_col("text", toks=toks).alias("repetition"),
        )
        keep = _dedup.exact_dedup(corpus, ["text"], "doc_id").select("doc_id")
        surv0 = (
            sig.join(keep, "doc_id", "left_semi")
            .filter(
                (F.col("quality") >= 0.45)
                & (F.col("detected_lang") == "en")
                & (F.col("repetition") <= 0.2)
            )
            .select("doc_id", "text")
            # materialize the gate survivors ONCE: this frame feeds the
            # near-dup signatures, the rerank shingles, and the final
            # anti-join — without the cut each consumer re-runs the
            # whole WARC parse + gate chain (a Python mapInPandas scan)
            .localCheckpoint(eager=True)
        )
        pairs = _dedup.minhash_neardup(surv0, min_jaccard=0.2, portable=True)
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        # materialize the near-dup SURVIVORS once: the packer's offsets
        # builder runs a plan-build-time max() over this frame and the
        # final write consumes it again — without the cut the whole
        # exact-Jaccard rerank join chain re-executes for each (guide
        # §1/§5, the surv0 discipline; survivor-sized, safe at scale)
        surv = surv0.join(drops, "doc_id", "left_anti").localCheckpoint(eager=True)
        norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
        pre = surv.select(
            "doc_id",
            F.transform(F.split(norm, ""), lambda c: F.ascii(c)).alias("cids"),
        ).where(F.length(norm) > 0)
        packed = pack_token_sequences(
            pre, "doc_id", "cids", seq_len=128, eos_id=0, drop_last=True
        )
        out = packed.select(
            "seq_id",
            "n_docs",
            F.concat_ws(",", F.col("ids").cast("array<string>")).alias("ids_csv"),
        )
        return _detach(out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


from .operators import urls as _urls  # noqa: E402


def _url_fixture_sql() -> str:
    """The deterministic URL construction both sides build from
    documents (scheme/userinfo/port/path/query/fragment variants keyed
    off doc_id) — string concat only, identical in Spark and DuckDB."""
    return (
        "(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://' || "
        "(CASE WHEN doc_id % 11 = 0 THEN 'u:p@' ELSE '' END) || "
        "'WWW.example' || CAST(doc_id % 7 AS STRING) || '.' || "
        "(CASE WHEN doc_id % 3 = 0 THEN 'example.co.uk' ELSE 'com' END) || "
        "(CASE WHEN doc_id % 5 = 0 THEN "
        "  (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8080' END) ELSE '' END) || "
        "(CASE WHEN doc_id % 4 = 0 THEN '' "
        "      ELSE '/p/' || CAST(doc_id AS STRING) || '/' END) || "
        "'?utm_source=t&q=' || CAST(doc_id AS STRING) || "
        "(CASE WHEN doc_id % 2 = 0 THEN '&fbclid=ff' ELSE '' END) || '#sec'"
    )


@query(
    "n4_url_curation",
    f"""WITH u AS (SELECT doc_id, {_url_fixture_sql()} AS url FROM documents),
       p AS (SELECT doc_id, url,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS scheme,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth
             FROM u),
       hp AS (SELECT *, regexp_extract(auth, '^(?:[^@]*@)?(.*)$', 1) AS hostport
              FROM p),
       parts AS (SELECT doc_id, url, scheme,
                   lower(regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
                                        '\\.+$', '')) AS host,
                   regexp_extract(hostport, ':(\\d+)$', 1) AS port_s,
                   regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                   regexp_extract(url, '\\?([^#]*)', 1) AS query
                 FROM hp),
       dom AS (SELECT *, {_urls.registered_domain_sql('host')} AS domain
               FROM parts),
       nq AS (SELECT *, array_to_string(list_filter(string_split(query, '&'),
                  kv -> kv <> '' AND NOT regexp_matches(lower(kv),
                        '^(utm_[a-z]+|fbclid|gclid)=')), '&') AS q
              FROM dom),
       norm AS (SELECT doc_id, scheme, host,
                  CASE WHEN port_s <> '' THEN CAST(port_s AS INT) END AS port,
                  domain,
                  scheme || '://' || host ||
                  (CASE WHEN port_s <> '' AND NOT ((scheme = 'http' AND port_s = '80')
                          OR (scheme = 'https' AND port_s = '443'))
                        THEN ':' || port_s ELSE '' END) ||
                  (CASE WHEN (CASE WHEN path = '' THEN '/'
                              ELSE regexp_replace(path, '/$', '') END) = ''
                        THEN '/'
                        ELSE (CASE WHEN path = '' THEN '/'
                              ELSE regexp_replace(path, '/$', '') END) END) ||
                  (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS norm_url
                FROM nq)
       SELECT doc_id, scheme, host, port, domain, norm_url
       FROM norm
       WHERE domain NOT IN ('example2.com', 'example5.co.uk')""",
)
def n4_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): the URL curation stage between WARC ingestion and
    the text gates — parse (scheme/host/port/path/query, userinfo
    stripped, host lowercased), REGISTERED-domain extraction
    (multi-label public suffixes), tracking-param/default-port/
    fragment-stripping normalization for URL-level dedup, and the
    UT1/Gopher-style domain blocklist broadcast anti-join.  All narrow
    JVM regexp chains restricted to Java/RE2-shared syntax, replayed
    verbatim by the oracle over deterministically constructed URLs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select("doc_id", F.expr(_url_fixture_sql()).alias("url"))
    p = _urls.url_parts(F.col("url"))
    parsed = urls.select(
        "doc_id",
        "url",
        p["scheme"].alias("scheme"),
        p["host"].alias("host"),
        p["port"].alias("port"),
        _urls.registered_domain(p["host"]).alias("domain"),
        _urls.normalize_url(F.col("url")).alias("norm_url"),
    )
    bl = spark.createDataFrame(
        [("example2.com",), ("example5.co.uk",)], "domain string"
    )
    kept = _urls.url_blocklist_filter(parsed, bl, url_col="url")
    return kept.select("doc_id", "scheme", "host", "port", "domain", "norm_url")




_ROBOTS_COM = """# .com policy
User-agent: *
Disallow: /p/1
Allow: /p/12
Disallow: /p/*7/$
Allow: /p/*77/$
Crawl-delay: 2

User-agent: ccbot
Disallow: /
Crawl-delay: 10

Sitemap: https://www.example.com/sitemap.xml
"""

_ROBOTS_COUK = """User-agent: ccbot
User-agent: gptbot
Disallow: /p/
Allow: /p/*0/$
Crawl-delay: 1.5

User-agent: *
Disallow:

Sitemap: https://www.example.co.uk/sitemap_index.xml
"""


def _robots_parse_sql() -> str:
    """DuckDB CTE chain replaying operators/urls.robots_rules over the
    per-host robots fixtures (lockstep unnest for line positions, the
    rule-count window for UA runs, last_value IGNORE NULLS for the
    governing run) — exposes CTE ``rb_rules(host, agent, rule,
    path_prefix)``."""
    return f"""rb AS (SELECT host,
               CASE WHEN host LIKE '%.co.uk' THEN '{_ROBOTS_COUK}'
                    ELSE '{_ROBOTS_COM}' END AS txt
          FROM (SELECT DISTINCT host FROM parts)),
       rb_lines AS (SELECT host,
               unnest(range(1, len(string_split_regex(txt, '\\r?\\n')) + 1)) AS pos,
               unnest(string_split_regex(txt, '\\r?\\n')) AS raw
          FROM rb),
       rb_typed AS (SELECT host, pos,
               lower(trim(regexp_extract(l, '^([^:]+):', 1))) AS field,
               trim(regexp_extract(l, '^[^:]+:(.*)$', 1)) AS value
          FROM (SELECT host, pos, trim(regexp_replace(raw, '#.*$', '')) AS l
                FROM rb_lines)
          WHERE lower(trim(regexp_extract(l, '^([^:]+):', 1)))
                IN ('user-agent', 'allow', 'disallow')),
       rb_runs AS (SELECT host, pos, field, value,
               CASE WHEN field = 'user-agent' THEN COALESCE(SUM(
                 CASE WHEN field IN ('allow','disallow') THEN 1 END)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               END AS ua_run
          FROM rb_typed),
       rb_gov AS (SELECT *, last_value(ua_run IGNORE NULLS)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gov_run
          FROM rb_runs),
       rb_uas AS (SELECT DISTINCT host, ua_run AS run, lower(value) AS agent
          FROM rb_gov WHERE field = 'user-agent' AND value <> ''),
       rb_rules AS (
          SELECT r.host, u.agent, r.field AS rule, r.value AS path_prefix
          FROM rb_gov r JOIN rb_uas u ON u.host = r.host AND u.run = r.gov_run
          WHERE r.field <> 'user-agent' AND r.value <> ''
          UNION
          SELECT host, agent, 'allow', '' FROM rb_uas)"""


def _robots_gate_sql(agent: str) -> str:
    """DuckDB replay of operators/urls.robots_gate for one agent over
    CTEs ``parts`` (doc_id, host, path) and ``rb_rules`` — emits the
    kept doc_ids (group exclusivity via EXISTS, RFC 9309 ``*``/``$``
    wildcard compilation via operators/urls.compile_robots_pattern_sql,
    longest raw pattern wins, allow beats disallow on ties)."""
    wild, rx = _urls.compile_robots_pattern_sql("path_prefix")
    return f"""SELECT doc_id FROM (
         SELECT p.doc_id,
                ROW_NUMBER() OVER (PARTITION BY p.doc_id
                    ORDER BY len(e.path_prefix) DESC,
                             CASE WHEN e.rule = 'allow' THEN 0 ELSE 1 END) AS rn,
                e.rule
         FROM (SELECT doc_id, host,
                      CASE WHEN path = '' THEN '/' ELSE path END AS path
               FROM parts) p
         LEFT JOIN (
             SELECT host, rule, path_prefix, {wild} AS wild, {rx} AS rx
             FROM (
               SELECT host, rule, path_prefix FROM rb_rules
               WHERE agent = '{agent}'
                 AND EXISTS (SELECT 1 FROM rb_rules r2
                             WHERE r2.host = rb_rules.host AND r2.agent = '{agent}')
               UNION ALL
               SELECT host, rule, path_prefix FROM rb_rules
               WHERE agent = '*'
                 AND NOT EXISTS (SELECT 1 FROM rb_rules r2
                                 WHERE r2.host = rb_rules.host AND r2.agent = '{agent}')
             )
         ) e ON e.host = p.host
            AND (CASE WHEN e.wild THEN regexp_matches(p.path, e.rx)
                      ELSE starts_with(p.path, e.path_prefix) END))
       WHERE rn = 1 AND (rule IS NULL OR rule = 'allow')"""


@query(
    "n4_robots_gate",
    f"""WITH u AS (SELECT doc_id, {_url_fixture_sql()} AS url FROM documents),
       hp AS (SELECT doc_id, url,
               regexp_extract(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                 '^(?:[^@]*@)?(.*)$', 1) AS hostport
          FROM u),
       parts AS (SELECT doc_id,
               lower(regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
                                    '\\.+$', '')) AS host,
               regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
          FROM hp),
       {_robots_parse_sql()}
       SELECT 'star' AS gate_agent, doc_id FROM ({_robots_gate_sql('*')})
       UNION ALL
       SELECT 'ccbot', doc_id FROM ({_robots_gate_sql('ccbot')})
       ORDER BY gate_agent, doc_id""",
)
def n4_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (rounds 10-11): robots.txt PARSE + GATE — the crawl-politeness
    stage between URL extraction and fetch/filter (RFC 9309:
    User-agent/Allow/Disallow, comments, CRLF, contiguous multi-agent
    runs, empty-Disallow allow-all groups; group exclusivity,
    longest-raw-pattern match with allow winning ties, and full
    ``*``/``$`` WILDCARD patterns — round 11).  Two agents gate the
    same deterministic URL fixture against per-host robots fixtures:
    '*' exercises the longest-match allow override (/p/12 re-allowed
    under a /p/1 disallow), wildcard-over-literal precedence
    (/p/*7/$ len-7 disallow beats the /p/12 len-5 allow for id 127)
    and a wildcard-vs-wildcard override (/p/*77/$ re-allows);
    'ccbot' exercises exclusive groups (full block on .com hosts,
    /p/ block on .co.uk with an anchored /p/*0/$ re-allow).  Parse is
    one posexplode + one window pass; the gate compiles each pattern
    once pre-broadcast (plain rules keep the regex-free startswith
    path) — both replayed verbatim in SQL
    (operators/urls.robots_rules/robots_gate/compile_robots_pattern)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    us = docs.select("doc_id", F.expr(_url_fixture_sql()).alias("url"))
    host = _urls.url_parts(F.col("url"))["host"]
    robots = (
        us.select(host.alias("host"))
        .distinct()
        .select(
            "host",
            F.when(F.col("host").endswith(".co.uk"), F.lit(_ROBOTS_COUK))
            .otherwise(F.lit(_ROBOTS_COM))
            .alias("robots_txt"),
        )
    )
    rules = _urls.robots_rules(robots)
    out = None
    for label, agent in (("star", "*"), ("ccbot", "ccbot")):
        kept = _urls.robots_gate(us, rules, agent, url_col="url").select(
            F.lit(label).alias("gate_agent"), "doc_id"
        )
        out = kept if out is None else out.unionByName(kept)
    return out.orderBy("gate_agent", "doc_id")


def _robots_directives_sql() -> str:
    """DuckDB CTE chain replaying operators/urls.robots_directives over
    the per-host robots fixtures — crawl-delay group attribution where
    EVERY non-UA, non-sitemap line advances the run counter, sitemaps
    host-global with a NULL agent."""
    return f"""rb AS (SELECT host,
               CASE WHEN host LIKE '%.co.uk' THEN '{_ROBOTS_COUK}'
                    ELSE '{_ROBOTS_COM}' END AS txt
          FROM (SELECT DISTINCT host FROM parts)),
       rb_lines AS (SELECT host,
               unnest(range(1, len(string_split_regex(txt, '\\r?\\n')) + 1)) AS pos,
               unnest(string_split_regex(txt, '\\r?\\n')) AS raw
          FROM rb),
       rb_typed AS (SELECT host, pos,
               lower(trim(regexp_extract(l, '^([^:]+):', 1))) AS field,
               trim(regexp_extract(l, '^[^:]+:(.*)$', 1)) AS value
          FROM (SELECT host, pos, trim(regexp_replace(raw, '#.*$', '')) AS l
                FROM rb_lines)
          WHERE lower(trim(regexp_extract(l, '^([^:]+):', 1)))
                IN ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')),
       rb_site AS (SELECT DISTINCT host, CAST(NULL AS VARCHAR) AS agent,
                          'sitemap' AS directive, value
          FROM rb_typed WHERE field = 'sitemap' AND value <> ''),
       rb_g AS (SELECT * FROM rb_typed WHERE field <> 'sitemap'),
       rb_runs AS (SELECT host, pos, field, value,
               CASE WHEN field = 'user-agent' THEN COALESCE(SUM(
                 CASE WHEN field <> 'user-agent' THEN 1 END)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               END AS ua_run
          FROM rb_g),
       rb_gov AS (SELECT *, last_value(ua_run IGNORE NULLS)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gov_run
          FROM rb_runs),
       rb_uas AS (SELECT DISTINCT host, ua_run AS run, lower(value) AS agent
          FROM rb_gov WHERE field = 'user-agent' AND value <> ''),
       rb_delays AS (SELECT DISTINCT r.host, u.agent,
                            'crawl-delay' AS directive, r.value
          FROM rb_gov r JOIN rb_uas u ON u.host = r.host AND u.run = r.gov_run
          WHERE r.field = 'crawl-delay' AND r.value <> '')"""


@query(
    "n4_robots_directives",
    f"""WITH u AS (SELECT doc_id, {_url_fixture_sql()} AS url FROM documents),
       hp AS (SELECT doc_id, url,
               regexp_extract(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                 '^(?:[^@]*@)?(.*)$', 1) AS hostport
          FROM u),
       parts AS (SELECT doc_id,
               lower(regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
                                    '\\.+$', '')) AS host,
               regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
          FROM hp),
       {_robots_directives_sql()}
       SELECT host, agent, directive, value FROM rb_delays
       UNION ALL
       SELECT host, agent, directive, value FROM rb_site
       ORDER BY host, directive, agent NULLS FIRST, value""",
)
def n4_robots_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 11): the NON-RULE robots.txt directives — per-group
    ``Crawl-delay`` (the politeness knob a distributed fetcher feeds
    its per-host rate limiter) and host-global ``Sitemap`` URLs (agent
    NULL) — parsed with the same one-window-pass shape as the rules,
    over the same per-host fixtures the gate uses.  Crawl-delay
    attribution counts EVERY non-UA, non-sitemap line as a group
    boundary, so a delay following another group's rules can never
    leak to an earlier agent (operators/urls.robots_directives)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    us = docs.select("doc_id", F.expr(_url_fixture_sql()).alias("url"))
    host = _urls.url_parts(F.col("url"))["host"]
    robots = (
        us.select(host.alias("host"))
        .distinct()
        .select(
            "host",
            F.when(F.col("host").endswith(".co.uk"), F.lit(_ROBOTS_COUK))
            .otherwise(F.lit(_ROBOTS_COM))
            .alias("robots_txt"),
        )
    )
    return _urls.robots_directives(robots).orderBy(
        "host", "directive", F.col("agent").asc_nulls_first(), "value"
    )



@query(
    "stream_url_gate",
    f"""WITH u AS (SELECT doc_id, {_url_fixture_sql()} AS url FROM documents),
       hp AS (SELECT doc_id, url,
               regexp_extract(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                 '^(?:[^@]*@)?(.*)$', 1) AS hostport
          FROM u),
       parts0 AS (SELECT doc_id,
               lower(regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
                                    '\\.+$', '')) AS host,
               regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
          FROM hp),
       parts AS (SELECT * FROM parts0
                 WHERE {_urls.registered_domain_sql('host')}
                       NOT IN ('example2.com', 'example5.co.uk')),
       {_robots_parse_sql()}
       SELECT doc_id FROM ({_robots_gate_sql('*')})
       ORDER BY doc_id""",
)
def stream_url_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+N4 composed (round 11): the URL-POLITENESS stage of the
    crawl chain running CONTINUOUSLY — WARC archives land in a
    directory, stream through parse → domain-blocklist anti-join →
    robots.txt gate (RFC 9309, incl. the round-11 wildcard rules) as
    micro-batches, into a memory sink.  Both gates are STATELESS over
    the stream: the blocklist and the per-host effective-rule arrays
    are static frames broadcast into every micro-batch (stream-static
    joins), so the streaming plan IS the batch plan and the finished
    stream must equal the batch oracle exactly — the last batch gate in
    the curation chain without a streaming twin, closing §2.9 parity
    for the web pipeline (operators/urls.url_blocklist_filter/
    robots_gate over sources/warc.stream_warc)."""
    import shutil
    import tempfile
    import uuid

    from .sources import warc as wsrc
    from .streaming.events import run_stream_to_memory

    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        F.expr(_url_fixture_sql()).alias("target_uri"),
        F.encode(F.lit("x"), "UTF-8").alias("payload"),
    )
    # static frames for the gates: blocklist + per-host robots rules
    # (hosts enumerated from the static fixture, like n4_robots_gate)
    bl = spark.createDataFrame(
        [("example2.com",), ("example5.co.uk",)], "domain string"
    )
    host = _urls.url_parts(F.expr(_url_fixture_sql()))["host"]
    robots = (
        docs.select(host.alias("host"))
        .distinct()
        .select(
            "host",
            F.when(F.col("host").endswith(".co.uk"), F.lit(_ROBOTS_COUK))
            .otherwise(F.lit(_ROBOTS_COM))
            .alias("robots_txt"),
        )
    )
    rules = _urls.robots_rules(robots)
    landing = tempfile.mkdtemp(prefix="bdmc_urlgate_stream_")
    qname = f"stream_{uuid.uuid4().hex[:8]}_urlgate"
    try:
        # 4 archive shards = 4 micro-batches (maxFilesPerTrigger=1)
        wsrc.write_warc(out.repartition(4), landing)
        recs = wsrc.stream_warc(spark, landing).select("target_uri")
        kept = _urls.url_blocklist_filter(recs, bl, url_col="target_uri")
        gated = _urls.robots_gate(kept, rules, "*", url_col="target_uri")
        ids = gated.select(
            F.regexp_extract("target_uri", r"[?&]q=(\d+)", 1)
            .cast("long")
            .alias("doc_id")
        )
        run_stream_to_memory(ids, qname)
        got = spark.table(qname)
        return _detach(got)
    finally:
        shutil.rmtree(landing, ignore_errors=True)


@query(
    "n1_url_dedup",
    """WITH u AS (SELECT doc_id,
              'https://www.example' || CAST(doc_id % 7 AS STRING) || '.com' ||
              '/page/' || CAST(doc_id % 50 AS STRING) || '/' ||
              '?utm_source=s' || CAST(doc_id AS STRING) ||
              '&id=' || CAST(doc_id % 50 AS STRING) || '#frag' AS url
       FROM documents),
       p AS (SELECT doc_id, url,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) ||
               '://' ||
               lower(regexp_extract(regexp_extract(
                   regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                   '^(?:[^@]*@)?(.*)$', 1), '^([^:]*)', 1)) ||
               regexp_replace(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/$', '') ||
               '?' || array_to_string(list_filter(
                   string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   kv -> kv <> '' AND NOT regexp_matches(lower(kv),
                         '^(utm_[a-z]+|fbclid|gclid)=')), '&') AS norm_url
             FROM u)
       SELECT norm_url, min(doc_id) AS keep_doc_id,
              CAST(count(*) AS BIGINT) AS n_dups
       FROM p GROUP BY norm_url""",
)
def n1_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1+N4 composed (round 9): URL-LEVEL dedup — raw crawl URLs that
    differ only by tracking parameters and fragments collapse onto one
    canonical form (``normalize_url``) and keep-first wins; the crawl
    dedup every pipeline runs BEFORE content dedup (one groupBy on the
    canonical string, no text touched).  The fixture plants 10-way
    collisions that exist ONLY after normalization (every raw URL is
    unique), so the entry verifies the canonicalization is what creates
    the dedup key.  Simplified expectations in the oracle hold by
    construction here (path always present, query never fully empty:
    '&id=' survives)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    url = F.expr(
        "'https://www.example' || CAST(doc_id % 7 AS STRING) || '.com' || "
        "'/page/' || CAST(doc_id % 50 AS STRING) || '/' || "
        "'?utm_source=s' || CAST(doc_id AS STRING) || "
        "'&id=' || CAST(doc_id % 50 AS STRING) || '#frag'"
    )
    with_urls = docs.select("doc_id", url.alias("url"))
    canon = with_urls.select(
        "doc_id", _urls.normalize_url(F.col("url")).alias("norm_url")
    )
    return canon.groupBy("norm_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


@query(
    "e2_funnel_steps",
    """WITH s1 AS (SELECT user_id AS u, min(epoch_us(ts)) AS t1
              FROM events WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id AS u, s1.t1, min(epoch_us(e.ts)) AS tprev
              FROM events e JOIN s1 ON s1.u = e.user_id
              WHERE e.event_type = 'click'
                AND epoch_us(e.ts) > s1.t1
                AND epoch_us(e.ts) <= s1.t1 + 259200000000
              GROUP BY 1, 2),
       s3 AS (SELECT e.user_id AS u, s2.t1, min(epoch_us(e.ts)) AS tprev
              FROM events e JOIN s2 ON s2.u = e.user_id
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) > s2.tprev
                AND epoch_us(e.ts) <= s2.t1 + 259200000000
              GROUP BY 1, 2)
       SELECT 1 AS step, 'view' AS event_type,
              CAST(count(*) AS BIGINT) AS users FROM s1
       UNION ALL
       SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
       UNION ALL
       SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3""",
)
def e2_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 events family (round 9): the sequential conversion funnel —
    view → click → purchase within 72 h of the user's first view,
    strictly time-ordered (each stage's earliest qualifying event).
    k-1 user-keyed joins of shrinking per-stage aggregates, never an
    event self-cross; the oracle replays each stage's min-chain
    verbatim."""
    from .operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(ev, ["view", "click", "purchase"])


@query(
    "e2b_funnel_retry",
    """WITH s1 AS (SELECT DISTINCT user_id AS u, epoch_us(ts) AS t1
              FROM events WHERE event_type = 'view'),
       s2 AS (SELECT e.user_id AS u, s1.t1, min(epoch_us(e.ts)) AS tprev
              FROM events e JOIN s1 ON s1.u = e.user_id
              WHERE e.event_type = 'click'
                AND epoch_us(e.ts) > s1.t1
                AND epoch_us(e.ts) <= s1.t1 + 259200000000
              GROUP BY 1, 2),
       s3 AS (SELECT e.user_id AS u, s2.t1, min(epoch_us(e.ts)) AS tprev
              FROM events e JOIN s2 ON s2.u = e.user_id
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) > s2.tprev
                AND epoch_us(e.ts) <= s2.t1 + 259200000000
              GROUP BY 1, 2)
       SELECT 1 AS step, 'view' AS event_type,
              CAST(count(DISTINCT u) AS BIGINT) AS users FROM s1
       UNION ALL
       SELECT 2, 'click', CAST(count(DISTINCT u) AS BIGINT) FROM s2
       UNION ALL
       SELECT 3, 'purchase', CAST(count(DISTINCT u) AS BIGINT) FROM s3""",
)
def e2b_funnel_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 events family (round 10): the RE-ATTEMPT funnel — a chain may
    start at ANY view occurrence (production funnel-tool attribution),
    so a user whose first attempt expires but who later converts from a
    fresh view still counts; users = distinct users with SOME start
    completing the stage.  Greedy earliest-next-step per start is exact
    for the existence question; chain rows fan out by the user's
    step-1 occurrence count only (operators/temporal.funnel
    per_occurrence=True)."""
    from .operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(ev, ["view", "click", "purchase"], per_occurrence=True)


@query(
    "e3_cohort_retention",
    """WITH first AS (SELECT user_id AS u,
                date_trunc('week', min(ts)) AS cohort_week
              FROM events GROUP BY user_id),
       active AS (SELECT DISTINCT user_id AS u,
                date_trunc('week', ts) AS aweek FROM events)
       SELECT cohort_week,
              CAST((epoch_us(aweek) - epoch_us(cohort_week))
                   // 604800000000 AS INT) AS week_offset,
              CAST(count(DISTINCT u) AS BIGINT) AS active_users
       FROM active JOIN first USING (u)
       GROUP BY 1, 2""",
)
def e3_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 events family (round 9): the weekly retention triangle —
    users cohort by first-event week, cells count the cohort's active
    users per week offset.  Two user-keyed aggregations + one join;
    week boundaries and integer-µs offsets replay exactly."""
    from .operators.temporal import cohort_retention

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    out = cohort_retention(ev)
    # DATE on both sides (DuckDB's date_trunc on a timestamp column
    # yields DATE-valued weeks in the comparator)
    return out.select(
        F.to_date("cohort_week").alias("cohort_week"),
        "week_offset",
        "active_users",
    )


@query(
    "n7_data_profile",
    """SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
              count(*) - count(o_orderkey) AS n_nulls,
              count(DISTINCT o_orderkey) AS n_distinct,
              CAST(min(o_orderkey) AS VARCHAR) AS min_value,
              CAST(max(o_orderkey) AS VARCHAR) AS max_value
       FROM orders
       UNION ALL
       SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
              count(DISTINCT o_custkey),
              CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
       FROM orders
       UNION ALL
       SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
              count(DISTINCT o_orderstatus),
              CAST(min(o_orderstatus) AS VARCHAR),
              CAST(max(o_orderstatus) AS VARCHAR)
       FROM orders
       UNION ALL
       SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
              count(DISTINCT o_orderpriority),
              CAST(min(o_orderpriority) AS VARCHAR),
              CAST(max(o_orderpriority) AS VARCHAR)
       FROM orders""",
)
def n7_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N7/§2.8 (round 9): single-scan COLUMN PROFILER — the discovery
    half of the expectations workflow: per column (n_rows, n_nulls,
    exact n_distinct, min, max), all metrics compiled into ONE
    aggregation over ONE scan of orders and unpivoted in-engine with
    stack (no driver collect).  The oracle recomputes every metric
    per column independently (operators/quality_checks.profile_frame)."""
    from .operators.quality_checks import profile_frame

    orders = load_table(spark, sf_dir, "orders")
    return profile_frame(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@query(
    "stream_data_profile",
    """WITH s AS (SELECT (max(event_id) + 3) // 3 AS step FROM events),
       ev AS (SELECT e.*, CAST(e.event_id // s.step AS INT) AS slice
              FROM events e CROSS JOIN s)
       SELECT slice, 'user_id' AS column_name, count(*) AS n_rows,
              count(*) - count(user_id) AS n_nulls,
              count(DISTINCT user_id) AS n_distinct,
              CAST(min(user_id) AS VARCHAR) AS min_value,
              CAST(max(user_id) AS VARCHAR) AS max_value
       FROM ev GROUP BY slice
       UNION ALL
       SELECT slice, 'event_type', count(*), count(*) - count(event_type),
              count(DISTINCT event_type),
              CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
       FROM ev GROUP BY slice
       UNION ALL
       SELECT slice, 'event_id', count(*), count(*) - count(event_id),
              count(DISTINCT event_id),
              CAST(min(event_id) AS VARCHAR), CAST(max(event_id) AS VARCHAR)
       FROM ev GROUP BY slice""",
)
def stream_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+§2.8 (round 9): STREAMING DATA OBSERVABILITY — the
    single-scan column profiler run per micro-batch (the landed-data
    monitoring every production stream carries next to its business
    logic).  Events land as 3 contiguous event-id slices streamed one
    file per trigger; each micro-batch profiles its columns in ONE
    stateless aggregation and tags the result with a slice id derived
    from the BATCH'S OWN DATA (min event_id // step — file arrival
    order cannot perturb the output).  The oracle recomputes every
    slice's profile relationally
    (operators/quality_checks.profile_frame over stream_events)."""
    import shutil
    import tempfile
    import uuid

    from .operators.quality_checks import profile_frame
    from .streaming.events import stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_sprofile_landing_")
    try:
        ev = load_table(spark, sf_dir, "events")
        step = (ev.agg(F.max("event_id")).first()[0] + 3) // 3
        for i in range(3):
            ev.filter(
                (F.col("event_id") >= i * step) & (F.col("event_id") < (i + 1) * step)
            ).coalesce(1).write.mode("append").parquet(landing)
        rows = []
        cols = ["user_id", "event_type", "event_id"]

        def sink(batch, _bid):
            if batch.isEmpty():
                return
            sl = int(batch.agg(F.min("event_id")).first()[0] // step)
            prof = profile_frame(batch, cols).withColumn(
                "slice", F.lit(sl).cast("int")
            )
            rows.extend(prof.collect())

        q = (
            stream_events(spark, landing, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}"
            )
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        out_schema = (
            "slice int, column_name string, n_rows bigint, n_nulls bigint, "
            "n_distinct bigint, min_value string, max_value string"
        )
        out = spark.createDataFrame(
            [
                (
                    r["slice"], r["column_name"], r["n_rows"], r["n_nulls"],
                    r["n_distinct"], r["min_value"], r["max_value"],
                )
                for r in rows
            ],
            out_schema,
        ).select(
            "slice", "column_name", "n_rows", "n_nulls", "n_distinct",
            "min_value", "max_value",
        )
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "stream_cusum",
    """WITH base AS (
         SELECT user_id, ts, event_id, value,
                CAST(value - CAST(55.0 AS DOUBLE) AS DECIMAL(18,6)) AS ip,
                CAST(CAST(45.0 AS DOUBLE) - value AS DECIMAL(18,6)) AS inn
         FROM events),
       pre AS (
         SELECT user_id, ts, event_id, value,
                SUM(ip) OVER w AS pp, SUM(inn) OVER w AS pn
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       mins AS (
         SELECT user_id, ts, event_id, value, pp, pn,
                MIN(pp) OVER w AS mp, MIN(pn) OVER w AS mn
         FROM pre
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       SELECT user_id, ts, event_id, value,
              CAST((pp - (CASE WHEN mp < 0 THEN mp
                               ELSE CAST(0 AS DECIMAL(38,6)) END))
                   * 1000000 AS BIGINT) AS cusum_pos_u,
              CAST((pn - (CASE WHEN mn < 0 THEN mn
                               ELSE CAST(0 AS DECIMAL(38,6)) END))
                   * 1000000 AS BIGINT) AS cusum_neg_u,
              (pp - (CASE WHEN mp < 0 THEN mp
                          ELSE CAST(0 AS DECIMAL(38,6)) END)
                 > CAST(200.0 AS DECIMAL(18,6)))
              OR (pn - (CASE WHEN mn < 0 THEN mn
                             ELSE CAST(0 AS DECIMAL(38,6)) END)
                 > CAST(200.0 AS DECIMAL(18,6))) AS alarm
       FROM mins""",
)
def stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 (round 9): STREAMING two-sided CUSUM drift alarms — the
    stateful stream twin of e7_cusum_changepoints.  Events land as 3
    event-time slices streamed one file per trigger;
    applyInPandasWithState carries 4 micro-unit integers per user and
    folds each micro-batch on top of the carried prefix.  The oracle is
    the BATCH statistic over the whole table — stream ≡ batch, every
    micro-unit integer and alarm bit (streaming/events.cusum_stream)."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import cusum_stream, stream_events

    landing = tempfile.mkdtemp(prefix="bdmc_scusum_landing_")
    try:
        ev = load_table(spark, sf_dir, "events")
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        cuts = (
            ev.select(us.alias("u"))
            .selectExpr("percentile(u, array(0.3333, 0.6667)) AS c")
            .first()["c"]
        )
        c1, c2 = int(cuts[0]), int(cuts[1])
        slices = [us < c1, (us >= c1) & (us < c2), us >= c2]
        for cond in slices:
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        rows = []

        def sink(batch, _bid):
            rows.extend(batch.collect())

        q = (
            cusum_stream(stream_events(spark, landing, max_files_per_trigger=1))
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        from .streaming.events import CUSUM_OUT_SCHEMA

        out = spark.createDataFrame(
            [
                (
                    r["user_id"], r["ts"], r["event_id"], r["value"],
                    r["cusum_pos_u"], r["cusum_neg_u"], r["alarm"],
                )
                for r in rows
            ],
            CUSUM_OUT_SCHEMA,
        )
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "stream_trend",
    """WITH b AS (SELECT event_type,
                  (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
                  CAST(value AS DECIMAL(18,6)) AS y
           FROM events),
       per AS (SELECT event_type, count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                      SUM(x * y) AS sxy, SUM(x * x) AS sxx
               FROM b GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CASE WHEN n * sxx - sx * sx <> 0
                   THEN CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
              CASE WHEN n * sxx - sx * sx <> 0
                   THEN CAST(sy * sxx - sx * sxy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) END AS intercept
       FROM per""",
)
def stream_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 (round 9): STREAMING OLS trend via sufficient statistics —
    the algebraic-aggregate pattern: n/Σx/Σy/Σxy/Σx² are mergeable
    sums, so the whole regression is ONE ordinary streaming aggregation
    in complete mode (no custom state operator); the closed form runs
    as a tiny batch over the final 5-row table.  x rebases to a FIXED
    epoch constant so the aggregation stays single-level; the oracle is
    the batch closed form — stream ≡ batch
    (streaming/events.trend_sums_stream / trend_from_sums)."""
    import shutil
    import tempfile
    import uuid

    from .streaming.events import stream_events, trend_from_sums, trend_sums_stream

    landing = tempfile.mkdtemp(prefix="bdmc_strend_landing_")
    try:
        ev = load_table(spark, sf_dir, "events")
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        cuts = (
            ev.select(us.alias("u"))
            .selectExpr("percentile(u, array(0.3333, 0.6667)) AS c")
            .first()["c"]
        )
        c1, c2 = int(cuts[0]), int(cuts[1])
        for cond in [us < c1, (us >= c1) & (us < c2), us >= c2]:
            ev.filter(cond).coalesce(1).write.mode("append").parquet(landing)
        name = f"strend_{uuid.uuid4().hex[:8]}"
        q = (
            trend_sums_stream(stream_events(spark, landing, max_files_per_trigger=1))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", landing + f"/_ckpt_{uuid.uuid4().hex[:8]}")
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream did not finish in 300s")
        final = trend_from_sums(spark.table(name)).collect()
        out = spark.createDataFrame(
            final, "event_type string, n long, slope double, intercept double"
        )
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return out


@query(
    "n7_quality_checks",
    """WITH m AS (SELECT
         CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS DOUBLE) AS m0,
         CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS m1,
         min(CAST(o_totalprice AS DOUBLE)) AS m2,
         max(CAST(o_totalprice AS DOUBLE)) AS m3,
         CAST(count(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O','F','P')
                         THEN 1 END) AS DOUBLE) AS m4,
         CAST(count(CASE WHEN o_orderpriority IS NOT NULL
                          AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                         THEN 1 END) AS DOUBLE) AS m5,
         CAST(count(*) AS DOUBLE) AS m6
       FROM orders)
       SELECT 0 AS rule_id, 'not_null' AS rule, 'o_orderkey' AS "column",
              m0 AS metric, CAST(0.0 AS DOUBLE) AS threshold, m0 = 0 AS passed FROM m
       UNION ALL SELECT 1, 'unique', 'o_orderkey', m1, CAST(0.0 AS DOUBLE), m1 = 0 FROM m
       UNION ALL SELECT 2, 'min_ge', 'o_totalprice', m2, CAST(0.0 AS DOUBLE), m2 >= 0.0 FROM m
       UNION ALL SELECT 3, 'max_le', 'o_totalprice', m3, CAST(1000.0 AS DOUBLE), m3 <= 1000.0 FROM m
       UNION ALL SELECT 4, 'accepted_values', 'o_orderstatus', m4, CAST(0.0 AS DOUBLE), m4 = 0 FROM m
       UNION ALL SELECT 5, 'matches_regex', 'o_orderpriority', m5, CAST(0.0 AS DOUBLE), m5 = 0 FROM m
       UNION ALL SELECT 6, 'row_count_between', '', m6, CAST(1000000000000.0 AS DOUBLE),
                        m6 BETWEEN 1 AND 1000000000000.0 FROM m""",
)
def n7_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 frame-level validation (round 9): the Deequ-style
    expectation suite — completeness, key uniqueness, value bounds,
    accepted values, regex conformance, row-count bounds — ALL compiled
    into ONE aggregation over ONE scan (never a job per rule), exploded
    to per-rule verdicts.  The deliberately-failing max_le rule proves
    failures surface as rows, not exceptions.  The oracle recomputes
    every metric and verdict."""
    from .operators.quality_checks import check_suite

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        {"type": "not_null", "col": "o_orderkey"},
        {"type": "unique", "cols": ["o_orderkey"]},
        {"type": "min_ge", "col": "o_totalprice", "value": 0.0},
        {"type": "max_le", "col": "o_totalprice", "value": 1000.0},
        {"type": "accepted_values", "col": "o_orderstatus", "values": ["O", "F", "P"]},
        {"type": "matches_regex", "col": "o_orderpriority", "pattern": "^[1-5]-"},
        {"type": "row_count_between", "min": 1, "max": 1_000_000_000_000},
    ]
    return check_suite(orders, rules)


@query(
    "a11_count_min",
    """WITH h AS (SELECT l_suppkey AS k,
              ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || 'cms'), 1, 15))::BIGINT AS h1,
              ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || 'cms'), 16, 15))::BIGINT AS h2
       FROM lineitem WHERE l_suppkey IS NOT NULL),
       cells AS (SELECT i AS row, (h1 % 64 + i * ((h2 % 63) + 1)) % 64 AS bucket,
                        CAST(count(*) AS BIGINT) AS cnt
                 FROM h, UNNEST(range(0, 4)) t(i)
                 GROUP BY 1, 2),
       kh AS (SELECT DISTINCT s_suppkey AS k,
              ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'cms'), 1, 15))::BIGINT AS h1,
              ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'cms'), 16, 15))::BIGINT AS h2
              FROM supplier),
       probes AS (SELECT k, i AS row,
                         (h1 % 64 + i * ((h2 % 63) + 1)) % 64 AS bucket
                  FROM kh, UNNEST(range(0, 4)) t(i)),
       est AS (SELECT k, min(COALESCE(c.cnt, CAST(0 AS BIGINT))) AS est
               FROM probes p LEFT JOIN cells c USING (row, bucket)
               GROUP BY k),
       tru AS (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS true_cnt
               FROM lineitem GROUP BY 1)
       SELECT e.k AS suppkey, e.est,
              COALESCE(t.true_cnt, CAST(0 AS BIGINT)) AS true_cnt,
              e.est >= COALESCE(t.true_cnt, CAST(0 AS BIGINT)) AS never_under
       FROM est e LEFT JOIN tru t ON t.k = e.k""",
)
def a11_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 sketch family (round 9): COUNT-MIN frequency sketch
    (Cormode-Muthukrishnan) — d=4 rows x w=64 counters deliberately
    undersized so collisions overestimate visibly; estimates for every
    supplier key probe the sketch only (never the fact table), and the
    never-undercount law is emitted as a column.  The sketch is a
    (row, bucket) groupBy — mergeable cell-wise, map-side combined, at
    most d*w rows shuffled regardless of corpus size.  Portable md5
    double-hash: the oracle replays every cell and every min."""
    from .operators.bloom import cms_build, cms_estimate

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    sketch = cms_build(li, "l_suppkey", w=64, d=4)
    keys = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"))
        .distinct()
    )
    est = cms_estimate(sketch, keys, "l_suppkey", w=64, d=4)
    true = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(true, "l_suppkey", "left")
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "est",
            F.coalesce(F.col("true_cnt"), F.lit(0).cast("long")).alias("true_cnt"),
            (
                F.col("est")
                >= F.coalesce(F.col("true_cnt"), F.lit(0).cast("long"))
            ).alias("never_under"),
        )
    )


@query(
    "n6_phrase_search",
    r"""WITH toks AS (SELECT doc_id,
                     string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
       tp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) r(i)),
       ph AS (SELECT doc_id AS phrase_id, i - 1 AS i, t[i] AS word
              FROM toks, UNNEST(range(1, 5)) r(i)
              WHERE doc_id < 3 AND len(t) >= 4),
       starts AS (SELECT p.phrase_id, tp.doc_id, tp.pos - p.i AS start
                  FROM tp JOIN ph p ON tp.tok = p.word
                  WHERE tp.pos - p.i >= 0
                  GROUP BY 1, 2, 3
                  HAVING count(DISTINCT p.i) = 4)
       SELECT phrase_id, doc_id, count(*) AS n_matches
       FROM starts GROUP BY 1, 2""",
)
def n6_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 (round 9): exact PHRASE search through a positional posting
    list — the phrase-level decontamination primitive.  The first 4
    tokens of each of the first 3 documents become the phrase set
    (guaranteed hits, derived identically by both engines); the corpus
    explodes once into (doc, pos, token) postings, the broadcast
    phrase words anchor candidate starts, and a start matches iff all
    4 offsets anchor there.  One pass resolves the whole phrase set
    (operators/retrieval.phrase_match_counts)."""
    from .operators.retrieval import phrase_match_counts
    from .operators.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    phrases = (
        docs.filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("phrase_id"),
            F.slice(_toks("text"), 1, 4).alias("words"),
        )
        .filter(F.size("words") >= 4)
    )
    return phrase_match_counts(docs, phrases)


_LINKGRAPH_EDGES_SQL = r"""
  SELECT src, dst FROM (
    SELECT u.doc_id AS src,
           CAST(regexp_extract(u.a, 'p/([0-9]+)', 1) AS BIGINT) AS dst
    FROM (SELECT hh.doc_id,
                 unnest(regexp_extract_all(hh.html,
                     '(?is)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 0)) AS a
          FROM (SELECT doc_id,
                       '<p>x</p><a href="https://ex.com/p/'
                       || CAST(doc_id % 50 AS VARCHAR)
                       || '">a</a> <a href="https://ex.com/p/'
                       || CAST(doc_id % 97 AS VARCHAR) || '">b</a>' AS html
                FROM documents) hh) u)
  WHERE src <> dst
"""


@query(
    "n6_link_graph_rank",
    "WITH "
    + _retrieval.pagerank_sql_steps(_LINKGRAPH_EDGES_SQL)
    + """,
       top AS (SELECT node, rank_scaled FROM prfinal
               ORDER BY rank_scaled DESC, node ASC LIMIT 20)
       SELECT node, rank_scaled,
              CAST(ROW_NUMBER() OVER (ORDER BY rank_scaled DESC, node ASC)
                   AS INT) AS rank_pos
       FROM top""",
)
def n6_link_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4+N6 capstone (round 9): the WEB-GRAPH loop end-to-end —
    deterministic HTML wrapped around every document, anchors REALLY
    extracted with extract_links, target doc ids parsed from the
    hrefs, self-loops dropped, and the resulting link graph ranked by
    the scaled-integer PageRank (5 synchronous rounds, bit-identical
    on any engine).  The oracle replays the HTML construction, the
    regex extraction, AND the unrolled integer iterations — top-20
    central documents value-exact."""
    from .operators.retrieval import pagerank
    from .operators.text import extract_links

    docs = load_table(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit('<p>x</p><a href="https://ex.com/p/'),
            (F.col("doc_id") % 50).cast("string"),
            F.lit('">a</a> <a href="https://ex.com/p/'),
            (F.col("doc_id") % 97).cast("string"),
            F.lit('">b</a>'),
        ).alias("html"),
    )
    links = extract_links(html)
    edges = links.select(
        F.col("doc_id").alias("src"),
        F.regexp_extract("href", r"p/([0-9]+)", 1).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    pr = pagerank(edges, iters=5)
    top = pr.orderBy(F.col("rank_scaled").desc(), F.col("node").asc()).limit(20)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rank_scaled").desc(), F.col("node").asc())
    return top.withColumn("rank_pos", F.row_number().over(w).cast("int"))


@query(
    "n6_kcore",
    """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
              FROM lineitem WHERE l_orderkey % 20 = 0),
       e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
              FROM sp a JOIN sp b ON a.o = b.o AND a.s < b.s),
       b0 AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       d1 AS (SELECT u, count(*) AS c FROM b0 GROUP BY 1),
       k1 AS (SELECT u FROM d1 WHERE c >= 3),
       b1 AS (SELECT b.u, b.v FROM b0 b
              JOIN k1 x ON x.u = b.u JOIN k1 y ON y.u = b.v),
       d2 AS (SELECT u, count(*) AS c FROM b1 GROUP BY 1),
       k2 AS (SELECT u FROM d2 WHERE c >= 3),
       b2 AS (SELECT b.u, b.v FROM b1 b
              JOIN k2 x ON x.u = b.u JOIN k2 y ON y.u = b.v),
       d3 AS (SELECT u, count(*) AS c FROM b2 GROUP BY 1),
       k3 AS (SELECT u FROM d3 WHERE c >= 3),
       b3 AS (SELECT b.u, b.v FROM b2 b
              JOIN k3 x ON x.u = b.u JOIN k3 y ON y.u = b.v),
       d4 AS (SELECT u, count(*) AS c FROM b3 GROUP BY 1),
       k4 AS (SELECT u FROM d4 WHERE c >= 3),
       b4 AS (SELECT b.u, b.v FROM b3 b
              JOIN k4 x ON x.u = b.u JOIN k4 y ON y.u = b.v)
       SELECT u AS node, count(*) AS degree FROM b4 GROUP BY 1""",
)
def n6_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 graph family (round 9): 3-core of the co-supplier graph
    after 4 synchronous peeling rounds — the graph-density curation
    filter (leaves of leaves fall out; link farms live in deep cores).
    Fixed round budget so any engine replays the surviving subgraph
    exactly; the oracle unrolls all four peels
    (operators/cluster.kcore)."""
    from .operators.cluster import kcore

    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.where(F.col("l_orderkey") % 20 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return kcore(edges, k=3, rounds=4)


@query(
    "n6_label_propagation",
    """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
              FROM lineitem WHERE l_orderkey % 20 = 0),
       e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
              FROM sp a JOIN sp b ON a.o = b.o AND a.s < b.s),
       bi AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       l0 AS (SELECT DISTINCT u AS node, u AS label FROM bi),
       c1 AS (SELECT b.u AS node, l.label, count(*) AS c
              FROM bi b JOIN l0 l ON l.node = b.v GROUP BY 1, 2),
       l1 AS (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM c1) q WHERE rn = 1),
       c2 AS (SELECT b.u AS node, l.label, count(*) AS c
              FROM bi b JOIN l1 l ON l.node = b.v GROUP BY 1, 2),
       l2 AS (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM c2) q WHERE rn = 1),
       c3 AS (SELECT b.u AS node, l.label, count(*) AS c
              FROM bi b JOIN l2 l ON l.node = b.v GROUP BY 1, 2),
       l3 AS (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM c3) q WHERE rn = 1),
       c4 AS (SELECT b.u AS node, l.label, count(*) AS c
              FROM bi b JOIN l3 l ON l.node = b.v GROUP BY 1, 2),
       l4 AS (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM c4) q WHERE rn = 1)
       SELECT node, label AS community FROM l4""",
)
def n6_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 graph family (round 9): synchronous label-propagation
    community detection over the co-supplier graph — 4 deterministic
    rounds (most-frequent neighbor label, ties to the smallest), the
    near-linear community signal connected components cannot give.
    The oracle unrolls all four rounds as CTEs and must agree
    node-for-node (operators/cluster.label_propagation)."""
    from .operators.cluster import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.where(F.col("l_orderkey") % 20 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return label_propagation(edges, rounds=4)


@query(
    "n6_triangle_counts",
    """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
              FROM lineitem WHERE l_orderkey % 20 = 0),
       e AS (SELECT DISTINCT a.s AS u, b.s AS v
             FROM sp a JOIN sp b ON a.o = b.o AND a.s < b.s),
       deg AS (SELECT node, count(*) AS deg FROM
               (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
               GROUP BY 1),
       t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
             FROM e e1
             JOIN e e2 ON e2.u = e1.v
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       corners AS (SELECT x AS node FROM t
                   UNION ALL SELECT y FROM t
                   UNION ALL SELECT z FROM t),
       pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
              FROM corners GROUP BY 1)
       SELECT d.node, CAST(d.deg AS BIGINT) AS degree,
              COALESCE(pn.triangles, CAST(0 AS BIGINT)) AS triangles
       FROM deg d LEFT JOIN pn USING (node)""",
)
def n6_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 graph family (round 9): per-node TRIANGLE counts over the
    co-supplier graph (suppliers sharing an order, 1-in-20 order
    sample) — the local-density signal behind link-farm/community
    detection on web graphs.  Spark runs the DEGREE-ORIENTED wedge
    algorithm (out-degrees bounded by O(sqrt(m)), so a hub can never
    explode the wedge join — the naive three-way edge self-join shape
    is structurally impossible); the oracle brute-forces the same
    x<y<z triangles and must agree node-for-node."""
    from .operators.cluster import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.where(F.col("l_orderkey") % 20 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


@query(
    "n6_ppr_seeds",
    "WITH "
    + _retrieval.ppr_sql_steps(
        """SELECT u AS src, v AS dst FROM (
             WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
                    FROM lineitem WHERE l_orderkey % 20 = 0),
             e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
                    FROM sp a JOIN sp b ON a.o = b.o AND a.s < b.s)
             SELECT u, v FROM e0 UNION SELECT v, u FROM e0)""",
        "SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 50 = 0",
        iters=5,
    )
    + "\n       SELECT node, rank_scaled FROM pprfinal",
)
def n6_ppr_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 graph family (round 9): PERSONALIZED PageRank from the same
    seed set as n6_bfs_hops — teleport and dangling mass return to the
    seeds, scoring every supplier by weighted-path proximity (BFS
    gives hop distance; PPR weights all paths).  Scaled-integer
    arithmetic end-to-end; the oracle unrolls all 5 rounds
    (operators/retrieval.pagerank_personalized)."""
    from .operators.retrieval import pagerank_personalized

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    sp = (
        li.where(F.col("l_orderkey") % 20 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    e0 = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    seeds = sup.where(F.col("s_suppkey") % 50 == 0).select(
        F.col("s_suppkey").alias("node")
    )
    return pagerank_personalized(edges, seeds, iters=5)


@query(
    "n6_bfs_hops",
    """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
              FROM lineitem WHERE l_orderkey % 20 = 0),
       e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
              FROM sp a JOIN sp b ON a.o = b.o AND a.s < b.s),
       bi AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       f0 AS (SELECT DISTINCT s_suppkey AS node FROM supplier
              WHERE s_suppkey % 50 = 0),
       d0 AS (SELECT node, 0 AS hop FROM f0),
       f1 AS (SELECT DISTINCT b.v AS node FROM bi b
              JOIN f0 f ON f.node = b.u
              WHERE NOT EXISTS (SELECT 1 FROM d0 WHERE d0.node = b.v)),
       d1 AS (SELECT node, hop FROM d0
              UNION ALL SELECT node, 1 FROM f1),
       f2 AS (SELECT DISTINCT b.v AS node FROM bi b
              JOIN f1 f ON f.node = b.u
              WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.node = b.v)),
       d2 AS (SELECT node, hop FROM d1
              UNION ALL SELECT node, 2 FROM f2),
       f3 AS (SELECT DISTINCT b.v AS node FROM bi b
              JOIN f2 f ON f.node = b.u
              WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.node = b.v)),
       d3 AS (SELECT node, hop FROM d2
              UNION ALL SELECT node, 3 FROM f3)
       SELECT node, CAST(hop AS INTEGER) AS hop FROM d3""",
)
def n6_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 graph family (round 9): multi-source BFS shortest-hop
    distances over the co-supplier graph from a deterministic seed set
    (every 50th supplier) — the crawl-depth / seed-distance feature web
    curation pipelines weight pages by.  Min-hop is order-independent,
    so the unrolled frontier-expansion oracle must agree node-for-node
    (operators/cluster.bfs_hops)."""
    from .operators.cluster import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    sp = (
        li.where(F.col("l_orderkey") % 20 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    sources = sup.where(F.col("s_suppkey") % 50 == 0).select(
        F.col("s_suppkey").alias("node")
    )
    return bfs_hops(edges, sources, max_hops=3, directed=False)


@query(
    "n2_pca_power",
    """WITH pca_feats AS (
         SELECT ROW_NUMBER() OVER () AS vec_id,
                [l_quantity / 64.0, l_extendedprice / 131072.0,
                 l_discount, l_tax,
                 (l_quantity / 64.0 + l_extendedprice / 131072.0) / 2.0]
                    AS embedding
         FROM lineitem),
       """
    + _sim.pca_power_sql_steps(iters=6, table="pca_feats")
    + "\n       SELECT dim_idx, loading FROM pca_final",
)
def n2_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): top principal component by QUANTIZED POWER
    ITERATION over a 5-feature lineitem matrix (power-of-two scalings
    keep the feature construction IEEE-exact; the qty/price axes carry
    a real spectral gap, ratio ~1.5, so 6 rounds converge to
    cosine > 0.9999 of the true eigenvector — pinned in tests).  All
    covariance/matvec arithmetic is exact integer (DECIMAL(38,0) /
    HUGEINT); the per-round rescale is one fixed IEEE chain — the
    unrolled oracle lands identical integers
    (operators/similarity.pca_power)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity") / F.lit(64.0)
    price = F.col("l_extendedprice") / F.lit(131072.0)
    feats = li.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.array(
            qty, price, F.col("l_discount"), F.col("l_tax"),
            (qty + price) / F.lit(2.0),
        ).alias("embedding"),
    )
    return _sim.pca_power(feats, iters=6)


@query(
    "n4_nb_margin",
    """WITH nb_toks AS (
         SELECT doc_id, lang,
                unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
         FROM documents
         WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       nb_counts AS (SELECT lang AS label, token, count(*) AS cnt
                     FROM nb_toks GROUP BY 1, 2),
       nb_v AS (SELECT count(DISTINCT token) AS v FROM nb_counts),
       nb_tot AS (SELECT label, SUM(cnt) AS total FROM nb_counts GROUP BY 1),
       nb_dc AS (SELECT lang AS label, count(DISTINCT doc_id) AS n
                 FROM nb_toks GROUP BY 1),
       nb_nd AS (SELECT SUM(n) AS n_docs FROM nb_dc),
       nb_model AS (SELECT c.label, c.token,
                      CAST(floor(-ln(CAST(c.cnt + 1 AS DOUBLE)
                                     / CAST(t.total + nb_v.v AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS cost
                    FROM nb_counts c JOIN nb_tot t USING (label)
                    CROSS JOIN nb_v),
       nb_stats AS (SELECT t.label,
                      CAST(floor(-ln(CAST(d.n AS DOUBLE)
                                     / CAST(nd.n_docs AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS prior_cost,
                      CAST(floor(-ln(CAST(1 AS DOUBLE)
                                     / CAST(t.total + nb_v.v AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS unk_cost
                    FROM nb_tot t JOIN nb_dc d USING (label)
                    CROSS JOIN nb_v CROSS JOIN nb_nd nd),
       nb_dtok AS (SELECT doc_id, token, count(*) AS tf
                   FROM nb_toks GROUP BY 1, 2),
       nb_lab AS (SELECT d.doc_id, d.token, d.tf,
                         s.label, s.prior_cost, s.unk_cost
                  FROM nb_dtok d CROSS JOIN nb_stats s),
       nb_seen AS (SELECT l.doc_id, l.label, l.prior_cost,
                          SUM(l.tf * COALESCE(m.cost, l.unk_cost)) AS s
                   FROM nb_lab l LEFT JOIN nb_model m
                     ON m.label = l.label AND m.token = l.token
                   GROUP BY 1, 2, 3),
       nb_rk2 AS (SELECT doc_id, label, prior_cost + s AS cost,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY prior_cost + s ASC,
                                                    label ASC) AS rn
                 FROM nb_seen),
       nb_best AS (SELECT doc_id, label AS pred_label,
                          CAST(cost AS BIGINT) AS cost
                   FROM nb_rk2 WHERE rn = 1),
       nb_snd AS (SELECT doc_id, CAST(cost AS BIGINT) AS c2
                  FROM nb_rk2 WHERE rn = 2)
       SELECT b.doc_id, b.pred_label, b.cost,
              CAST(s.c2 - b.cost AS BIGINT) AS margin
       FROM nb_best b LEFT JOIN nb_snd s USING (doc_id)""",
)
def n4_nb_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): Naive Bayes CONFIDENCE margins — runner-up cost
    minus best cost per document (scaled-integer log units), the
    confidence-thresholded routing signal (low-margin docs escalate to
    a heavier classifier).  Shares one scoring pass with classify
    (operators/lm.naive_bayes_margin)."""
    from .operators.lm import naive_bayes_margin, naive_bayes_train

    docs = load_table(spark, sf_dir, "documents")
    model, stats = naive_bayes_train(docs, label_col="lang", text_col="text")
    return naive_bayes_margin(docs, model, stats)


@query(
    "n4_nb_langid",
    """WITH nb_toks AS (
         SELECT doc_id, lang,
                unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
         FROM documents
         WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       nb_counts AS (SELECT lang AS label, token, count(*) AS cnt
                     FROM nb_toks GROUP BY 1, 2),
       nb_v AS (SELECT count(DISTINCT token) AS v FROM nb_counts),
       nb_tot AS (SELECT label, SUM(cnt) AS total FROM nb_counts GROUP BY 1),
       nb_dc AS (SELECT lang AS label, count(DISTINCT doc_id) AS n
                 FROM nb_toks GROUP BY 1),
       nb_nd AS (SELECT SUM(n) AS n_docs FROM nb_dc),
       nb_model AS (SELECT c.label, c.token,
                      CAST(floor(-ln(CAST(c.cnt + 1 AS DOUBLE)
                                     / CAST(t.total + nb_v.v AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS cost
                    FROM nb_counts c JOIN nb_tot t USING (label)
                    CROSS JOIN nb_v),
       nb_stats AS (SELECT t.label,
                      CAST(floor(-ln(CAST(d.n AS DOUBLE)
                                     / CAST(nd.n_docs AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS prior_cost,
                      CAST(floor(-ln(CAST(1 AS DOUBLE)
                                     / CAST(t.total + nb_v.v AS DOUBLE))
                                 * 10000000.0) AS BIGINT) AS unk_cost
                    FROM nb_tot t JOIN nb_dc d USING (label)
                    CROSS JOIN nb_v CROSS JOIN nb_nd nd),
       nb_dtok AS (SELECT doc_id, token, count(*) AS tf
                   FROM nb_toks GROUP BY 1, 2),
       nb_lab AS (SELECT d.doc_id, d.token, d.tf,
                         s.label, s.prior_cost, s.unk_cost
                  FROM nb_dtok d CROSS JOIN nb_stats s),
       nb_seen AS (SELECT l.doc_id, l.label, l.prior_cost,
                          SUM(l.tf * COALESCE(m.cost, l.unk_cost)) AS s
                   FROM nb_lab l LEFT JOIN nb_model m
                     ON m.label = l.label AND m.token = l.token
                   GROUP BY 1, 2, 3),
       nb_rk AS (SELECT doc_id, label, prior_cost + s AS cost,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY prior_cost + s ASC,
                                                    label ASC) AS rn
                 FROM nb_seen)
       SELECT doc_id, label AS pred_label, CAST(cost AS BIGINT) AS cost
       FROM nb_rk WHERE rn = 1""",
)
def n4_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): multinomial NAIVE BAYES language ID — trained
    in-engine on the labeled documents corpus and self-classified (the
    supervised counterpart of the n-gram-heuristic lang_id).  Costs are
    scaled-integer logs computed once on the driver (model-bounded,
    the unigram/bpe-local discipline; driver libm == DuckDB ln), so
    scoring is pure order-independent integer arithmetic — prediction
    AND total cost are engine-exact (operators/lm.naive_bayes_train /
    naive_bayes_classify)."""
    from .operators.lm import naive_bayes_classify, naive_bayes_train

    docs = load_table(spark, sf_dir, "documents")
    model, stats = naive_bayes_train(docs, label_col="lang", text_col="text")
    return naive_bayes_classify(docs, model, stats)


@query(
    "n2_pca_project",
    """WITH pca_feats AS (
         SELECT ROW_NUMBER() OVER () AS vec_id,
                [l_quantity / 64.0, l_extendedprice / 131072.0,
                 l_discount, l_tax,
                 (l_quantity / 64.0 + l_extendedprice / 131072.0) / 2.0]
                    AS embedding
         FROM lineitem),
       """
    + _sim.pca_power_sql_steps(iters=6, table="pca_feats")
    + """,
       prj AS (SELECT c.id, SUM(CAST(c.c AS HUGEINT) * CAST(f.loading AS HUGEINT)) AS p
               FROM pca_c c JOIN pca_final f ON f.dim_idx = c.i
               GROUP BY 1),
       agg AS (SELECT MIN(p) AS mn, MAX(p) AS mx,
                      SUM(CASE WHEN p >= 0 THEN 1 ELSE 0 END) AS n_pos,
                      SUM(CASE WHEN p < 0 THEN 1 ELSE 0 END) AS n_neg,
                      COUNT(*) AS n FROM prj)
       SELECT CAST(mn AS DOUBLE) AS min_proj,
              CAST(mx AS DOUBLE) AS max_proj,
              CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
              CAST(n AS BIGINT) AS n
       FROM agg""",
)
def n2_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): PROJECTION onto the learned top principal
    component — the whitening step itself: every row's centered
    quantized feature vector dotted with pca_power's integer loadings
    (exact BIGINT/HUGEINT arithmetic end-to-end).  Row ids are
    engine-local, so the oracle pins the projection DISTRIBUTION
    (extremes, sign split, count) — all exact integers
    (operators/similarity.pca_power + one join)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity") / F.lit(64.0)
    price = F.col("l_extendedprice") / F.lit(131072.0)
    feats = li.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.array(
            qty, price, F.col("l_discount"), F.col("l_tax"),
            (qty + price) / F.lit(2.0),
        ).alias("embedding"),
    )
    loadings = _sim.pca_power(feats, iters=6)
    qs = F.lit(1024.0)
    ex = feats.select(
        F.col("vec_id").alias("__id"), F.posexplode(F.col("embedding")).alias("i", "x")
    ).select(
        "__id", (F.col("i") + F.lit(1)).alias("i"),
        F.floor(F.col("x").cast("double") * qs).cast("long").alias("q"),
    )
    stats = ex.groupBy("i").agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
    c = ex.join(F.broadcast(stats), "i").select(
        "__id", "i", (F.col("n") * F.col("q") - F.col("s")).alias("c")
    )
    prj = (
        c.join(F.broadcast(loadings.withColumnRenamed("dim_idx", "i")), "i")
        .groupBy("__id")
        .agg(
            F.sum(F.col("c").cast("decimal(18,0)") * F.col("loading").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("p")
        )
    )
    return prj.agg(
        F.min("p").cast("double").alias("min_proj"),
        F.max("p").cast("double").alias("max_proj"),
        F.sum(F.when(F.col("p") >= 0, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("p") < 0, 1).otherwise(0)).cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


from .operators import sampling as _sampling  # noqa: E402


@query(
    "n5_kcenter_select",
    "WITH "
    + _sampling.kcenter_sql_steps(k=6)
    + "\n       SELECT sel_rank, vec_id, dist FROM kc_final",
)
def n5_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 9): greedy k-CENTER coreset selection over the
    embeddings table — 6 maximally-spread representatives (Gonzalez
    farthest-point, the diversity-sampling dual of semantic_dedup).
    Quantized integer squared-L2 and id tiebreaks make the whole
    selection sequence engine-exact; the oracle unrolls all rounds
    (operators/sampling.kcenter_select)."""
    from .operators.sampling import kcenter_select

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_select(emb, k=6)


@query(
    "n4_chi2_keywords",
    """WITH x2toks AS (
         SELECT doc_id, lang,
                unnest(list_distinct(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))) AS token
         FROM documents
         WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       lt AS (SELECT lang AS label, token, count(*) AS a
              FROM x2toks GROUP BY 1, 2),
       tt AS (SELECT token, SUM(a) AS tokdocs FROM lt GROUP BY 1),
       lb AS (SELECT lang AS label, count(DISTINCT doc_id) AS labdocs
              FROM x2toks GROUP BY 1),
       nn AS (SELECT SUM(labdocs) AS n FROM lb),
       full_t AS (SELECT lt.label, lt.token, lt.a,
                         tt.tokdocs - lt.a AS b,
                         lb.labdocs - lt.a AS c,
                         nn.n - tt.tokdocs - lb.labdocs + lt.a AS d,
                         nn.n
                  FROM lt JOIN tt USING (token) JOIN lb USING (label)
                  CROSS JOIN nn
                  WHERE tt.tokdocs >= 2),
       sc AS (SELECT label, token,
                     CAST(CAST(n AS HUGEINT)
                          * (CAST(a AS HUGEINT) * CAST(d AS HUGEINT)
                             - CAST(b AS HUGEINT) * CAST(c AS HUGEINT))
                          * (CAST(a AS HUGEINT) * CAST(d AS HUGEINT)
                             - CAST(b AS HUGEINT) * CAST(c AS HUGEINT)) AS DOUBLE)
                     / CAST(CAST(a + b AS HUGEINT) * CAST(c + d AS HUGEINT)
                            * CAST(a + c AS HUGEINT) * CAST(b + d AS HUGEINT)
                            AS DOUBLE) AS chi2
              FROM full_t
              WHERE CAST(a AS HUGEINT) * CAST(d AS HUGEINT)
                    > CAST(b AS HUGEINT) * CAST(c AS HUGEINT))
       SELECT label, token, chi2, rank FROM (
         SELECT label, token, chi2,
                CAST(ROW_NUMBER() OVER (PARTITION BY label
                                        ORDER BY chi2 DESC, token ASC) AS INT)
                    AS rank
         FROM sc) q
       WHERE rank <= 10""",
)
def n4_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 (round 9): χ² KEYWORD extraction per language — the classic
    supervised feature selector (which tokens distinguish this label):
    2×2 document-presence contingency per (label, token), the rational
    χ² closed form as ONE integer division, positive-association filter,
    top-10 per label (operators/text.chi2_keywords)."""
    from .operators.text import chi2_keywords

    docs = load_table(spark, sf_dir, "documents")
    return chi2_keywords(docs, label_col="lang", top_k=10, min_doc_freq=2)


@query(
    "n5_oov_rate",
    """WITH ovt AS (SELECT doc_id,
                      unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS token
               FROM documents
               WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
       cnt AS (SELECT token, count(*) AS c FROM ovt GROUP BY 1),
       voc AS (SELECT token FROM cnt ORDER BY c DESC, token ASC LIMIT 500),
       per AS (SELECT t.doc_id,
                      count(*) AS n_tokens,
                      SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
               FROM ovt t LEFT JOIN voc v ON v.token = t.token
               GROUP BY 1)
       SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(n_oov AS BIGINT) AS n_oov,
              CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
       FROM per""",
)
def n5_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 9): tokenizer COVERAGE — per-document out-of-vocabulary
    rate against the corpus's own top-500 token vocabulary (the metric
    that sizes a vocab / flags domain drift before training).  One
    token shuffle for counts, top-k via TakeOrderedAndProject,
    broadcast vocab anti-probe, one per-doc count; oov_rate is one
    integer division — engine-exact."""
    from .operators.text import tokens as _tk

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tk("text")).alias("token"))
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    voc = (
        cnt.orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(500)
        .select("token", F.lit(True).alias("__in"))
    )
    per = (
        toks.join(F.broadcast(voc), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias("oov_rate"),
    )


@query(
    "n5_target_encode",
    """WITH per AS (SELECT o_orderpriority,
                    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s,
                    count(*) AS n_rows
             FROM orders WHERE o_totalprice IS NOT NULL
             GROUP BY 1),
       tot AS (SELECT SUM(s) AS st, SUM(n_rows) AS nt FROM per)
       SELECT o_orderpriority, n_rows,
              (CAST(s AS DOUBLE)
               + 10.0 * (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)))
              / (CAST(n_rows AS DOUBLE) + 10.0) AS encoded
       FROM per CROSS JOIN tot""",
)
def n5_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 9): m-ESTIMATE target encoding (Micci-Barreca 2001) —
    the standard high-cardinality categorical feature: each category's
    code is its target mean shrunk toward the global mean by prior
    weight m=10, so rare categories fall back to the prior.  Exact
    decimal sums + one fixed IEEE chain per category
    (operators/sampling.target_encode)."""
    from .operators.sampling import target_encode

    orders = load_table(spark, sf_dir, "orders")
    return target_encode(orders, "o_orderpriority", "o_totalprice", m=10.0)


@query(
    "n5_dsir_select",
    r"""WITH toks AS (SELECT doc_id, lang,
                     string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
              FROM documents
              WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0),
       feats AS (
         SELECT doc_id, lang, i - 1 AS pos, t[i] AS feat
         FROM toks, UNNEST(range(1, len(t) + 1)) r(i)
         UNION ALL
         SELECT doc_id, lang, len(t) + i - 1 AS pos, t[i] || ' ' || t[i + 1] AS feat
         FROM toks, UNNEST(range(1, len(t))) r(i)),
       fb AS (SELECT doc_id, lang, pos,
                     ('0x' || substr(md5(feat), 1, 15))::BIGINT % 64 AS bucket
              FROM feats),
       rc AS (SELECT bucket, count(*) AS rc FROM fb GROUP BY 1),
       tc AS (SELECT bucket, count(*) AS tc FROM fb WHERE lang = 'en' GROUP BY 1),
       tot AS (SELECT (SELECT count(*) FROM fb) AS R,
                      (SELECT count(*) FROM fb WHERE lang = 'en') AS T),
       ratio AS (SELECT rc.bucket,
                        ((CAST(COALESCE(tc.tc, 0) AS DOUBLE) + 1.0)
                         * (CAST(R AS DOUBLE) + 64.0))
                      / ((CAST(rc.rc AS DOUBLE) + 1.0)
                         * (CAST(T AS DOUBLE) + 64.0)) AS ratio
                 FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot),
       sc AS (SELECT f.doc_id, count(*) AS nf,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list(ratio ORDER BY pos)), (a, b) -> a + b) AS s
              FROM fb f JOIN ratio USING (bucket)
              GROUP BY f.doc_id)
       SELECT doc_id, CAST(nf AS INT) AS n_features,
              s / CAST(nf AS DOUBLE) AS mean_ratio, rank
       FROM (SELECT doc_id, nf, s,
                    CAST(ROW_NUMBER() OVER (ORDER BY s / CAST(nf AS DOUBLE) DESC,
                                            doc_id) AS INT) AS rank
             FROM sc) q
       WHERE rank <= 100""",
)
def n5_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 (round 9): DSIR data selection (Xie et al. 2023) — pick the
    100 corpus documents most like the ENGLISH target slice by hashed
    unigram+bigram importance ratios with add-1 smoothing over 64
    buckets.  Every stage is engine-portable: md5-prefix bucket
    hashing, one fixed IEEE chain per bucket ratio, per-document sums
    folded in feature-position order, top-n via partial top-k (never a
    global sort).  The oracle replays features → buckets → both
    bag-of-bucket models → ratios → ordered folds → ranking
    bit-for-bit (operators/sampling.dsir_select)."""
    from .operators.sampling import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, docs.filter(F.col("lang") == "en"), n=100, n_buckets=64)


@query(
    "n5_temperature_mixture",
    """WITH stats AS (SELECT lang AS g, count(*) AS n FROM documents GROUP BY lang),
       tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS N,
                      list_reduce(list_transform(list(n ORDER BY g),
                          x -> sqrt(CAST(x AS DOUBLE))), (a, b) -> a + b) AS S
               FROM stats),
       rates AS (SELECT stats.g, least(1.0, (0.5 * t.N / t.S)
                        / sqrt(CAST(stats.n AS DOUBLE))) AS mix_rate
                 FROM stats, tot t)
       SELECT d.doc_id, d.lang, r.mix_rate
       FROM documents d JOIN rates r ON r.g = d.lang
       WHERE (CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 1, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 2, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 3, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 4, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 5, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'temp-mix'), 6, 1)) - 1) * 1 AS DOUBLE) / 16777216.0) < r.mix_rate""",
)
def n5_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    '''N5 (round 9): temperature-based multilingual rebalancing at
    tau = 1/2 (the mT5/XLM-R recipe): per-language rates derive
    IN-FRAME from sqrt-weighted shares with an explicit-order fold
    (Σ√n is float — a plain SUM would be partial-agg-order dependent),
    then a portable per-doc unit draw keeps rows.  Tail languages
    up-sample, head languages down-sample; the oracle replays counts,
    fold, rates and every draw bit-for-bit.'''
    from .operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mixture_sample(
        docs, "lang", "doc_id", budget_frac=0.5
    ).select("doc_id", "lang", "mix_rate")


@query(
    "e4_ema_user_value",
    """WITH seq AS (SELECT user_id,
                list(struct_pack(ts := ts, event_id := event_id,
                                 v := CAST(value AS DOUBLE))
                     ORDER BY ts, event_id) AS s
         FROM events GROUP BY user_id),
       idx AS (SELECT user_id, s, unnest(range(1, len(s) + 1)) AS i FROM seq)
       SELECT user_id,
              s[i].ts AS ts,
              s[i].event_id AS event_id,
              s[i].v AS value,
              list_reduce(list_transform(list_slice(s, 1, i), x -> x.v),
                          (a, b) -> 0.5 * b + 0.5 * a) AS ema
       FROM idx""",
)
def e4_ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 events family (round 9): per-user EMA of event values
    (α = 1/2) — the recursive per-entity fold window functions cannot
    express, run as one group-keyed collect + a single array fold.
    The oracle re-folds every prefix with the identical IEEE op chain,
    so all doubles match bit-for-bit."""
    from .operators.temporal import ema_by_group

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return ema_by_group(ev, "user_id", "ts", "value", ("event_id",), alpha=0.5)


@query(
    "n2_ppjoin_exact",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
       sh AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(range(0, len(sp)-2),
                            i -> sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]))) AS shingle
              FROM toks WHERE len(sp) >= 3),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
       SELECT id_a, id_b, jaccard FROM (
         SELECT id_a, id_b,
                CAST(inter AS DOUBLE)
                     / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
         FROM shared
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b) t
       WHERE jaccard >= 0.2""",
)
def n2_ppjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 (round 9): EXACT set-similarity join via PREFIX FILTERING
    (AllPairs/PPJoin) — recall 1.0 by construction, the deterministic
    alternative to MinHash-LSH: candidates join only on each doc's
    rarest-first prefix shingles (prefix length |A|−⌈t·|A|⌉+1
    guarantees no qualifying pair is missed), then the exact rerank
    touches candidates only.  The oracle is deliberately the BRUTE-
    FORCE definition: the scale algorithm must equal naive all-shared-
    shingle Jaccard at the same threshold, pair for pair, double for
    double."""
    return _dedup.jaccard_join_prefix(
        load_table(spark, sf_dir, "documents"), min_jaccard=0.2
    )
