"""Registry-count single source of truth: the counts stated in
README.md and BASELINE.md must equal the live registry (two silent
drift incidents in two rounds — this pins them to code)."""

import re

import __spark_entry__ as entry


def test_readme_counts_match_registry():
    qs, os_ = entry.queries(), entry.oracle_sql()
    with open("README.md") as f:
        readme = f.read()
    m = re.search(r"`queries\(\)` \((\d+) operators\), `oracle_sql\(\)` \((\d+) DuckDB-checked", readme)
    assert m, "README.md no longer states the registry counts in the expected form"
    assert int(m.group(1)) == len(qs), (
        f"README says {m.group(1)} queries; registry has {len(qs)} — update README.md"
    )
    assert int(m.group(2)) == len(os_), (
        f"README says {m.group(2)} oracles; registry has {len(os_)} — update README.md"
    )


def test_baseline_suite_count_matches_registry():
    qs = entry.queries()
    with open("BASELINE.md") as f:
        baseline = f.read()
    m = re.search(r"registered query suite \((\d+) entries", baseline)
    assert m, "BASELINE.md no longer states the suite size in the expected form"
    assert int(m.group(1)) == len(qs), (
        f"BASELINE.md says {m.group(1)} entries; registry has {len(qs)} — update BASELINE.md"
    )


def test_every_query_has_oracle_or_documented_exception():
    """Exactly one rows-only entry is allowed (ann_ivf_topk — sampled
    k-means nondeterminism is inherent; its recall is pinned by
    ann_ivf_recall).  Anything else missing an oracle is a regression."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(os_))
    assert missing == ["ann_ivf_topk"], f"unexpected rows-only entries: {missing}"
    assert not set(os_) - set(qs), "oracle without a query"
