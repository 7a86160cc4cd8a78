"""URL operators for web-corpus curation (round 9, SURVEY §2.12 N4):
parse, normalize, registered-domain extraction, and blocklist
filtering — the stage every crawl pipeline runs between WARC ingestion
(``sources/warc.py`` provides ``target_uri``) and the text gates.

Scale design: everything is a narrow JVM regexp/string chain over one
scan — no UDFs, no shuffle; the blocklist join broadcasts (blocklists
are thousands-to-millions of rows, dwarfed by the corpus).  All
expressions are restricted to regexp syntax Java regex and DuckDB RE2
share, so every derivation is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes the small built-in heuristic recognizes.
# A production deployment swaps in the full Mozilla Public Suffix List
# (one broadcast frame, same join shape); the heuristic is DETERMINISTIC
# and documented so the oracle can replay it — never silently wrong,
# just coarser (unknown multi-label suffixes fall back to the last two
# labels).
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.tr",
)


def url_parts(url: Column | str) -> Column:
    """Struct(scheme, host, port, path, query) from a URL string —
    one regexp family, entirely JVM-side.  Host is lowercased and
    trailing dots are stripped (``example.com.`` is the same authority
    as ``example.com``; without the strip a trailing-dot FQDN would
    defeat :func:`registered_domain` — whose label regexes cannot match
    an empty final label — and therefore BYPASS the blocklist filter).
    Missing parts are empty strings (port NULL when absent).  Userinfo
    (``user:pass@``) is stripped from the host."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    authority = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_extract(authority, r"^(?:[^@]*@)?(.*)$", 1)
    host = F.lower(
        F.regexp_replace(F.regexp_extract(hostport, r"^([^:]*)", 1), r"\.+$", "")
    )
    port_s = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        F.when(port_s != "", port_s.cast("int")).alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def registered_domain(host: Column | str) -> Column:
    """The registrable domain of a host (``maps.google.co.uk`` ->
    ``google.co.uk``, ``a.b.example.com`` -> ``example.com``): last two
    labels, or last three when the two-label tail is a known multi-label
    public suffix (:data:`MULTI_LABEL_SUFFIXES`).  Bare hosts (no dot)
    and IPv4 literals pass through unchanged."""
    h = F.col(host) if isinstance(host, str) else host
    is_ip = h.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    tail_is_suffix = two.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(is_ip | ~h.contains("."), h)
        .when(tail_is_suffix & (three != ""), three)
        .otherwise(two)
    )


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of :func:`registered_domain`."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    two = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    three = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return (
        f"CASE WHEN regexp_matches({host_expr}, '^\\d+\\.\\d+\\.\\d+\\.\\d+$')"
        f" OR NOT contains({host_expr}, '.') THEN {host_expr}"
        f" WHEN {two} IN ({suffixes}) AND {three} <> '' THEN {three}"
        f" ELSE {two} END"
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host, strip
    default ports (80/443), strip fragment, strip trailing slash on a
    bare path, drop common tracking params (utm_*, fbclid, gclid) while
    preserving the remaining query order."""
    u = F.col(url) if isinstance(url, str) else url
    p = url_parts(u)
    # rebuild query without tracking params (split/filter/rejoin — all
    # JVM array ops; empty -> '')
    kept = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "")
        & ~F.lower(kv).rlike(r"^(utm_[a-z]+|fbclid|gclid)="),
    )
    q = F.array_join(kept, "&")
    port = F.when(
        p["port"].isNotNull()
        & ~(
            ((p["scheme"] == "http") & (p["port"] == 80))
            | ((p["scheme"] == "https") & (p["port"] == 443))
        ),
        F.concat(F.lit(":"), p["port"].cast("string")),
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(
        F.regexp_replace(p["path"], r"/$", "")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        port,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "target_uri",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose REGISTERED DOMAIN appears in ``blocklist``
    (one column, ``domain_col``) — the UT1/Gopher-style domain gate.
    Broadcast anti-join: one corpus scan, no shuffle of the corpus.
    Blocklist entries are normalized like hosts (lowercase, trailing
    dots stripped) so ``Example.COM.`` still blocks ``example.com``."""
    dom = registered_domain(url_parts(F.col(url_col))["host"])
    bl = blocklist.select(
        F.regexp_replace(F.lower(F.col(domain_col)), r"\.+$", "").alias("__bl_dom")
    ).distinct()
    return (
        df.withColumn("__dom", dom)
        .join(
            F.broadcast(bl), F.col("__dom") == F.col("__bl_dom"), "left_anti"
        )
        .drop("__dom")
    )


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt documents into a RULES frame
    ``(host, agent, rule, path_prefix)`` with rule in
    {'allow', 'disallow'} — the crawl-politeness stage every web
    pipeline runs between URL extraction and fetch/filter (RFC 9309).

    Grammar handled: ``User-agent`` / ``Allow`` / ``Disallow`` lines,
    ``#`` comments (full-line and trailing), case-insensitive field
    names, CRLF, and the contiguous-User-agent-run rule (several
    ``User-agent`` lines immediately above a rule block ALL govern it).
    Empty ``Disallow:`` lines (the classic allow-all idiom) parse to no
    rule.  ``path_prefix`` carries the RAW pattern including ``*`` /
    ``$`` wildcards; :func:`robots_gate` compiles and matches them
    (RFC 9309 §2.2.3, round 11).

    Shape + exactness: posexplode the line array, ONE window pass —
    a rule line's governing User-agent run is
    ``last(ua_run_id) IGNORE NULLS`` over line position (ua_run_id =
    the count of rule lines before the UA line, so contiguous UA lines
    share a run) — then an equi-join of rule lines to UA lines on
    (host, run).  Windows are per-host (a robots.txt is KB-sized);
    everything is engine-shared string/window ops, so the oracle
    replays the parse verbatim."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    field = F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
    value = F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1))
    typed = lines.select(
        "host",
        "pos",
        field.alias("field"),
        value.alias("value"),
    ).where(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    is_rule = F.col("field").isin("allow", "disallow")
    n_rules_before = F.coalesce(
        F.sum(is_rule.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    runs = typed.select(
        "host",
        "pos",
        "field",
        "value",
        F.when(F.col("field") == "user-agent", n_rules_before).alias("ua_run"),
    ).withColumn(
        "gov_run", F.last("ua_run", ignorenulls=True).over(w)
    )
    uas = (
        runs.where(F.col("field") == "user-agent")
        .select("host", F.col("ua_run").alias("run"), F.lower("value").alias("agent"))
        .where(F.col("agent") != "")
        .distinct()
    )
    rules = runs.where(
        (F.col("field") != "user-agent") & (F.col("value") != "") & F.col("gov_run").isNotNull()
    ).select("host", F.col("gov_run").alias("run"), F.col("field").alias("rule"), F.col("value").alias("path_prefix"))
    # every DECLARED group also emits a zero-length allow: it matches
    # every path but loses every longest-match tie, so it changes no
    # verdict — it exists to record group existence, making an
    # empty-Disallow (allow-all) group still govern its agent
    # exclusively instead of falling back to the '*' group (RFC 9309
    # group selection)
    declared = uas.select(
        "host", "agent", F.lit("allow").alias("rule"), F.lit("").alias("path_prefix")
    ).distinct()
    return (
        rules.join(uas, ["host", "run"])
        .select("host", "agent", "rule", "path_prefix")
        .unionByName(declared)
    )


def robots_directives(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse the NON-RULE robots.txt directives into
    ``(host, agent, directive, value)``:

    - ``crawl-delay`` (the de-facto politeness extension every major
      crawler honors): GROUP-scoped — attributed to the contiguous
      ``User-agent`` run governing it, exactly like Allow/Disallow in
      :func:`robots_rules`.  Here EVERY non-UA, non-sitemap line
      advances the run counter (a ``Disallow`` between two UA lines
      ends the first group), so a crawl-delay after another group's
      rules is never mis-attributed to an earlier agent.
    - ``sitemap`` (group-INDEPENDENT per the sitemaps.org protocol and
      RFC 9309 §2.2.4's treatment of other records): emitted with
      ``agent = NULL`` — it applies to the whole host.

    Values stay strings (crawl-delay casts cleanly downstream).  Same
    shape as the rules parse: one posexplode + ONE per-host window
    pass, engine-shared ops only, so the oracle replays it verbatim."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    field = F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
    value = F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1))
    typed = lines.select(
        "host", "pos", field.alias("field"), value.alias("value")
    ).where(
        F.col("field").isin(
            "user-agent", "allow", "disallow", "crawl-delay", "sitemap"
        )
    )
    sitemaps = (
        typed.where((F.col("field") == "sitemap") & (F.col("value") != ""))
        .select(
            "host",
            F.lit(None).cast("string").alias("agent"),
            F.lit("sitemap").alias("directive"),
            F.col("value").alias("value"),
        )
        .distinct()
    )
    grouped = typed.where(F.col("field") != "sitemap")
    w = Window.partitionBy("host").orderBy("pos")
    is_rule = F.col("field") != "user-agent"
    n_rules_before = F.coalesce(
        F.sum(is_rule.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    runs = grouped.select(
        "host",
        "pos",
        "field",
        "value",
        F.when(F.col("field") == "user-agent", n_rules_before).alias("ua_run"),
    ).withColumn("gov_run", F.last("ua_run", ignorenulls=True).over(w))
    uas = (
        runs.where(F.col("field") == "user-agent")
        .select("host", F.col("ua_run").alias("run"), F.lower("value").alias("agent"))
        .where(F.col("agent") != "")
        .distinct()
    )
    delays = (
        runs.where(
            (F.col("field") == "crawl-delay")
            & (F.col("value") != "")
            & F.col("gov_run").isNotNull()
        )
        .select("host", F.col("gov_run").alias("run"), F.col("value"))
        .join(uas, ["host", "run"])
        .select(
            "host", "agent", F.lit("crawl-delay").alias("directive"), "value"
        )
        .distinct()
    )
    return delays.unionByName(sitemaps)


def compile_robots_pattern(pattern: Column | str) -> Column:
    """Compile one robots.txt path pattern (RFC 9309 §2.2.3) to
    ``struct(wild int, rx string)``:

    - ``*`` matches any character sequence; a trailing ``$`` anchors
      the end of the path (a ``$`` anywhere else is a literal octet —
      the behavior of Google's reference matcher);
    - ``wild`` = 1 iff the pattern contains ``*`` or ends with ``$``
      (plain patterns keep the cheap ``startswith`` fast path in
      :func:`robots_gate`);
    - ``rx`` = ``^`` + the pattern with regex metacharacters escaped
      and ``*`` -> ``.*`` (+ ``$`` when anchored), restricted to
      syntax Java regex and DuckDB RE2 share so the oracle replays the
      compilation verbatim (:func:`compile_robots_pattern_sql`).

    Pure string expressions — at gate time this runs once per RULE on
    the broadcast-bound rules frame, never per corpus row."""
    p = F.col(pattern) if isinstance(pattern, str) else pattern
    anchored = p.endswith("$")
    body = F.when(anchored, p.substr(F.lit(1), F.length(p) - F.lit(1))).otherwise(p)
    escaped = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(escaped, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.struct(
        (p.contains("*") | anchored).cast("int").alias("wild"),
        rx.alias("rx"),
    )


def compile_robots_pattern_sql(p: str) -> tuple[str, str]:
    """DuckDB twin of :func:`compile_robots_pattern` — returns the
    ``(wild, rx)`` SQL expression pair over pattern expression ``p``.
    RE2 replacement syntax differs from Java's (``\\1`` + 'g' flag vs
    ``$1`` global-by-default) but both produce the identical compiled
    regex, which itself uses only shared syntax."""
    wild = f"(contains({p}, '*') OR {p} LIKE '%$')"
    body = f"CASE WHEN {p} LIKE '%$' THEN substr({p}, 1, len({p}) - 1) ELSE {p} END"
    rx = (
        "'^' || replace(regexp_replace(" + body + ", "
        r"'([.\[\]{}()+?^$|\\])', '\\\1', 'g'), '*', '.*') "
        f"|| CASE WHEN {p} LIKE '%$' THEN '$' ELSE '' END"
    )
    return wild, rx


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "target_uri",
) -> DataFrame:
    """Keep the rows of ``urls`` that ``agent`` may fetch under
    ``rules`` (:func:`robots_rules` output) — RFC 9309 group selection
    and longest-match evaluation, with full ``*`` / ``$`` wildcard
    pattern support (round 11):

    - group: a host's rules for the EXACT agent govern exclusively when
      any exist; otherwise the ``*`` group; a host with neither (or no
      robots.txt at all) allows everything;
    - match: among the group's rules whose pattern matches the URL path
      (prefix for plain patterns; compiled regex for patterns with
      ``*`` / trailing ``$`` — :func:`compile_robots_pattern`; empty
      path matches as '/'), the rule with the LONGEST raw pattern wins
      (RFC 9309 "most specific match" measured in pattern octets,
      wildcards counted as written — Google's reference behavior);
      allow beats disallow on equal length; no match = allowed.

    Shape (100 TB): the per-host effective rule set is aggregated into
    ONE array per host (rules frames are blocklist-sized) and
    BROADCAST-joined onto the corpus; the verdict is a narrow
    filter + sort over that per-row array — the corpus is scanned once
    and NEVER shuffled (the earlier rank-window form shuffled on the
    full row).  Patterns compile once per rule pre-broadcast; plain
    rules (the overwhelming majority in real robots.txt) keep the
    regex-free ``startswith`` path, so only (row x wildcard-rule)
    pairs pay a regex evaluation.  All string/array ops engine-shared,
    so the gate is oracle-replayable."""
    a = str(agent).lower()
    parts = url_parts(F.col(url_col))
    base = urls.withColumn("__host", parts["host"]).withColumn(
        "__path", F.when(parts["path"] == "", F.lit("/")).otherwise(parts["path"])
    )
    grp = rules.withColumn("__agent", F.lower("agent"))
    # exclusive group selection: exact-agent rules win the whole host
    hosts_with_exact = grp.where(F.col("__agent") == a).select("host").distinct()
    exact = grp.where(F.col("__agent") == a).join(
        hosts_with_exact, "host", "left_semi"
    )
    star = grp.where(F.col("__agent") == "*").join(
        hosts_with_exact, "host", "left_anti"
    )
    # one row per host: its rules as an array of (sort_key, rule)
    # structs — sort_key = (-len(raw pattern), allow-first) so the
    # array min IS the longest-match verdict with allow winning length
    # ties; wild/rx carry the compiled pattern for the match test
    compiled = compile_robots_pattern(F.col("path_prefix"))
    eff = (
        exact.unionByName(star)
        .groupBy(F.col("host").alias("__rhost"))
        .agg(
            F.collect_list(
                F.struct(
                    (-F.length("path_prefix")).alias("nlen"),
                    F.when(F.col("rule") == "allow", 0)
                    .otherwise(1)
                    .alias("kind"),
                    F.col("path_prefix").alias("prefix"),
                    compiled["wild"].alias("wild"),
                    compiled["rx"].alias("rx"),
                )
            ).alias("__rules")
        )
    )
    joined = base.join(
        F.broadcast(eff), F.col("__host") == F.col("__rhost"), "left"
    )
    path = F.col("__path")
    matches = F.filter(
        F.coalesce(F.col("__rules"), F.array().cast(
            "array<struct<nlen:int,kind:int,prefix:string,wild:int,rx:string>>"
        )),
        lambda r: F.when(r["wild"] == 1, F.rlike(path, r["rx"])).otherwise(
            path.startswith(r["prefix"])
        ),
    )
    # F.get (0-based) is NULL on an empty array even under ANSI mode,
    # where element_at would throw INVALID_ARRAY_INDEX
    best = F.get(F.array_sort(matches), 0)
    allowed = best.isNull() | (best["kind"] == 0)
    return joined.where(allowed).select(*urls.columns)
