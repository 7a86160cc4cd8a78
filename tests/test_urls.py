"""URL curation operators (round 9): parse edge cases, registered
domains, normalization idempotence, blocklist semantics."""

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators import urls


def _parse(spark, *url_list):
    df = spark.createDataFrame([(u,) for u in url_list], "url string")
    p = urls.url_parts(F.col("url"))
    rows = df.select(
        "url", p["scheme"].alias("s"), p["host"].alias("h"),
        p["port"].alias("po"), p["path"].alias("pa"), p["query"].alias("q"),
        urls.registered_domain(p["host"]).alias("d"),
        urls.normalize_url(F.col("url")).alias("n"),
    ).collect()
    return {r.url: r for r in rows}

def test_url_parse_edges(spark):
    got = _parse(
        spark,
        "HTTPS://User:Pw@WWW.Example.CO.UK:8443/A/b/?q=1&utm_source=t#x",
        "http://10.0.0.1:80/x",
        "https://localhost",
        "http://sub.a.example.com/p?utm_campaign=z&gclid=1",
        "ftp://files.example.org/pub/",
    )
    r = got["HTTPS://User:Pw@WWW.Example.CO.UK:8443/A/b/?q=1&utm_source=t#x"]
    assert (r.s, r.h, r.po, r.pa, r.q) == (
        "https", "www.example.co.uk", 8443, "/A/b/", "q=1&utm_source=t"
    )
    assert r.d == "example.co.uk"
    assert r.n == "https://www.example.co.uk:8443/A/b?q=1"
    r = got["http://10.0.0.1:80/x"]
    assert r.d == "10.0.0.1" and r.n == "http://10.0.0.1/x"  # default port gone
    r = got["https://localhost"]
    assert r.d == "localhost" and r.n == "https://localhost/"
    r = got["http://sub.a.example.com/p?utm_campaign=z&gclid=1"]
    assert r.d == "example.com" and r.n == "http://sub.a.example.com/p"
    r = got["ftp://files.example.org/pub/"]
    assert r.s == "ftp" and r.d == "example.org" and r.n == "ftp://files.example.org/pub"


def test_normalize_idempotent(spark):
    raw = [
        "HTTPS://A.Example.COM:443/x/?utm_source=1&k=v#f",
        "http://b.example.co.uk",
        "https://c.example.com/deep/path?z=1&utm_medium=m&y=2",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    once = df.select(urls.normalize_url(F.col("url")).alias("url"))
    twice = once.select(urls.normalize_url(F.col("url")).alias("url"))
    assert [r.url for r in once.collect()] == [r.url for r in twice.collect()]
    # query order of surviving params is preserved
    assert once.collect()[2].url == "https://c.example.com/deep/path?z=1&y=2"


def test_blocklist_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.keep.example.com/a"),
            (2, "https://evil.blocked.net/x"),
            (3, "http://sub.deep.Blocked.NET:8080/y"),  # case-insensitive
            (4, "https://blocked.net.example.com/z"),  # NOT the blocked domain
        ],
        "id long, target_uri string",
    )
    bl = spark.createDataFrame([("Blocked.net",)], "domain string")
    kept = urls.url_blocklist_filter(df, bl)
    assert sorted(r.id for r in kept.collect()) == [1, 4]
    assert "target_uri" in kept.columns and "__dom" not in kept.columns


def test_trailing_dot_fqdn_cannot_bypass_blocklist(spark):
    """Round-10 adversarial fix: 'http://blocked.net./x' is the same
    authority as blocked.net (RFC 1034 root-dot form), but the label
    regexes in registered_domain cannot match an empty final label, so
    before the host normalization the domain came back '' and the row
    sailed through the blocklist."""
    df = spark.createDataFrame(
        [
            (1, "https://evil.blocked.net./x"),     # trailing-dot FQDN
            (2, "http://blocked.net.../y"),          # pathological multi-dot
            (3, "https://keep.example.com./ok"),     # trailing dot, not blocked
        ],
        "id long, target_uri string",
    )
    bl = spark.createDataFrame([("blocked.net.",)], "domain string")  # dotted entry too
    kept = urls.url_blocklist_filter(df, bl)
    assert sorted(r.id for r in kept.collect()) == [3]
    # parse side: host has no trailing dot, registered domain resolves
    p = df.select(urls.url_parts(F.col("target_uri")).alias("p")).collect()
    assert [r.p.host for r in p] == ["evil.blocked.net", "blocked.net", "keep.example.com"]
    doms = df.select(
        urls.registered_domain(urls.url_parts(F.col("target_uri"))["host"]).alias("d")
    ).collect()
    assert [r.d for r in doms] == ["blocked.net", "blocked.net", "example.com"]


def test_robots_rules_grammar(spark):
    """robots.txt parse: comments, CRLF, multi-UA runs, empty Disallow
    (group existence without rules), case-insensitive fields."""
    txt = (
        "# header comment\r\n"
        "User-Agent: *\r\n"
        "Disallow: /a/  # trailing comment\r\n"
        "ALLOW: /a/b/\r\n"
        "\r\n"
        "User-agent: BotOne\r\n"
        "User-agent: bottwo\r\n"
        "Disallow: /\r\n"
        "\r\n"
        "User-agent: freebot\r\n"
        "Disallow:\r\n"
    )
    rules = urls.robots_rules(
        spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    )
    got = {(r.agent, r.rule, r.path_prefix) for r in rules.collect()}
    assert ("*", "disallow", "/a/") in got
    assert ("*", "allow", "/a/b/") in got
    assert ("botone", "disallow", "/") in got and ("bottwo", "disallow", "/") in got
    # empty Disallow parses to NO path rule, but the group still exists
    assert ("freebot", "allow", "") in got
    assert not any(a == "freebot" and p != "" for a, _, p in got)


def test_robots_gate_semantics(spark):
    """Longest-match allow override, exclusive groups, allow-all group,
    hosts without robots, and the no-rules default."""
    txt = (
        "User-agent: *\n"
        "Disallow: /p/1\n"
        "Allow: /p/12\n"
        "\n"
        "User-agent: ccbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: freebot\n"
        "Disallow:\n"
    )
    rules = urls.robots_rules(
        spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    )
    us = spark.createDataFrame(
        [
            (1, "http://h.example/p/1x"),    # disallowed for *
            (2, "http://h.example/p/12y"),   # longest-match allow wins
            (3, "http://h.example/ok"),      # no rule matches -> allowed
            (4, "http://other.example/p/1"), # no robots -> allowed
        ],
        "id long, target_uri string",
    )
    assert sorted(r.id for r in urls.robots_gate(us, rules, "*").collect()) == [2, 3, 4]
    # exclusive group: ccbot ignores the * rules entirely
    assert sorted(r.id for r in urls.robots_gate(us, rules, "CCBot").collect()) == [4]
    # allow-all group governs exclusively (does NOT fall back to *)
    assert sorted(r.id for r in urls.robots_gate(us, rules, "freebot").collect()) == [1, 2, 3, 4]
    # unknown agent uses the * group
    assert sorted(r.id for r in urls.robots_gate(us, rules, "nobody").collect()) == [2, 3, 4]


def _ref_robots_match(pattern: str, path: str) -> bool:
    """Pure-Python RFC 9309 pattern matcher (greedy leftmost token
    walk, the algorithm of Google's reference matcher) — deliberately
    NOT regex-based so the property test checks the regex compilation
    in compile_robots_pattern against independent semantics."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    segs = body.split("*")
    if not path.startswith(segs[0]):
        return False
    if len(segs) == 1:
        return path == segs[0] if anchored else True
    pos = len(segs[0])
    for s in segs[1:-1]:
        i = path.find(s, pos)
        if i < 0:
            return False
        pos = i + len(s)
    last = segs[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def test_robots_gate_wildcards(spark):
    """RFC 9309 * / $ patterns (round 11): mid-pattern *, trailing $
    anchor, literal mid-pattern $, regex-metachar escaping, and
    longest-RAW-pattern precedence between wildcard and plain rules."""
    txt = (
        "User-agent: *\n"
        "Disallow: /p/1\n"
        "Allow: /p/12\n"
        "Disallow: /p/*7/$\n"
        "Allow: /p/*77/$\n"
        "Disallow: /exact$\n"
        "Disallow: /a.b\n"
        "Disallow: /lit$eral\n"
    )
    rules = urls.robots_rules(
        spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    )
    us = spark.createDataFrame(
        [
            (1, "http://h.example/p/127/"),   # /p/*7/$ (7) beats Allow /p/12 (5)
            (2, "http://h.example/p/177/"),   # /p/*77/$ (8) re-allows
            (3, "http://h.example/p/7/"),     # wildcard matches zero chars
            (4, "http://h.example/p/70/"),    # $ anchor: not .../7/<end>
            (5, "http://h.example/exact"),    # anchored exact hit
            (6, "http://h.example/exactly"),  # anchor prevents prefix block
            (7, "http://h.example/aXb"),      # '.' escaped: must NOT match
            (8, "http://h.example/a.b"),      # literal '.' hit
            (9, "http://h.example/lit$eral"), # mid-pattern $ is literal
            (10, "http://h.example/ok"),
        ],
        "id long, target_uri string",
    )
    kept = sorted(r.id for r in urls.robots_gate(us, rules, "*").collect())
    assert kept == [2, 4, 6, 7, 10]


def test_robots_wildcard_property(spark):
    """Batched randomized property: for seeded random (pattern, path)
    pairs over a nasty alphabet (wildcards, anchors, regex metachars),
    the Spark gate verdict, the DuckDB oracle compilation
    (compile_robots_pattern_sql + regexp_matches), and the independent
    pure-Python token-walk matcher all agree."""
    import random

    import duckdb

    rng = random.Random(1109)
    pat_alpha = "/ab7*$.[()|\\"
    path_alpha = "/ab7.[()|\\"
    cases = []
    for i in range(300):
        pattern = "/" + "".join(rng.choice(pat_alpha) for _ in range(rng.randint(0, 6)))
        path = "/" + "".join(rng.choice(path_alpha) for _ in range(rng.randint(0, 6)))
        cases.append((i, pattern, path))
    # one gate call: one host per case, a single disallow rule each ->
    # kept iff the pattern does NOT match the path
    rules = spark.createDataFrame(
        [(f"h{i}.example", "*", "disallow", p) for i, p, _ in cases],
        "host string, agent string, rule string, path_prefix string",
    )
    us = spark.createDataFrame(
        [(i, f"http://h{i}.example{path}") for i, _, path in cases],
        "id long, target_uri string",
    )
    kept = {r.id for r in urls.robots_gate(us, rules, "*").collect()}
    wild, rx = urls.compile_robots_pattern_sql("p")
    con = duckdb.connect()
    for i, pattern, path in cases:
        want = _ref_robots_match(pattern, path)
        assert (i not in kept) == want, (pattern, path, i in kept)
        (duck,) = con.execute(
            f"SELECT CASE WHEN {wild} THEN regexp_matches(?, {rx})"
            f" ELSE starts_with(?, p) END FROM (SELECT ? AS p)",
            [path, path, pattern],
        ).fetchone()
        assert duck == want, ("duckdb", pattern, path, duck, want)


def test_robots_duplicate_and_conflicting_agent_groups(spark):
    """Round-11 sweep (judge task 3): the same agent declared in TWO
    separate groups (RFC 9309: rules combine — union of both groups),
    a duplicate User-agent line within one run (no rule duplication),
    and directly conflicting rules of equal length (allow wins the
    tie, the least-restrictive RFC reading)."""
    txt = (
        "User-agent: dupbot\n"
        "User-agent: dupbot\n"        # duplicate line, same run
        "Disallow: /x\n"
        "\n"
        "User-agent: other\n"
        "Disallow: /\n"
        "\n"
        "User-agent: dupbot\n"        # SECOND group for the same agent
        "Allow: /x\n"                 # conflicts at equal length
        "Disallow: /y\n"
    )
    rules = urls.robots_rules(
        spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    )
    rows = {
        (r["agent"], r["rule"], r["path_prefix"])
        for r in rules.collect()
    }
    # union of both dupbot groups, no duplicates from the repeated line
    assert ("dupbot", "disallow", "/x") in rows
    assert ("dupbot", "allow", "/x") in rows
    assert ("dupbot", "disallow", "/y") in rows
    us = spark.createDataFrame(
        [(1, "http://h.example/x1"), (2, "http://h.example/y2"),
         (3, "http://h.example/z")],
        "id long, target_uri string",
    )
    kept = sorted(r.id for r in urls.robots_gate(us, rules, "dupbot").collect())
    # /x: allow beats disallow on the length tie; /y blocked; /z unmatched
    assert kept == [1, 3]


def test_robots_directives_attribution(spark):
    """Crawl-delay is GROUP-scoped with strict run boundaries — a delay
    after another group's rules never leaks to an earlier agent — and
    sitemaps are host-global (agent NULL), deduplicated."""
    txt = (
        "User-agent: a\n"
        "Disallow: /x\n"          # ends a's UA run
        "User-agent: b\n"
        "Crawl-delay: 5\n"        # belongs to b ONLY
        "Sitemap: https://h.example/s1.xml\n"
        "\n"
        "User-agent: c\n"
        "User-agent: d\n"         # contiguous run: both get the delay
        "Crawl-delay: 2.5\n"
        "Sitemap: https://h.example/s1.xml\n"  # duplicate -> one row
    )
    got = {
        (r["host"], r["agent"], r["directive"], r["value"])
        for r in urls.robots_directives(
            spark.createDataFrame(
                [("h.example", txt)], "host string, robots_txt string"
            )
        ).collect()
    }
    assert got == {
        ("h.example", "b", "crawl-delay", "5"),
        ("h.example", "c", "crawl-delay", "2.5"),
        ("h.example", "d", "crawl-delay", "2.5"),
        ("h.example", None, "sitemap", "https://h.example/s1.xml"),
    }
