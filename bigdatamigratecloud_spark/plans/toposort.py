"""Dependency-ordered table execution (O2 in SURVEY §2.6).

The reference imports/applies tables ordered by Processing Order and
Parent Table ID (Codeunit 60000:58-67, 88-92, 612-626): parents before
children so FK relations resolve.  Catalyst never orders separate writes,
so this is driver-side: Kahn's topological sort with Processing Order as
the tie-break, cycles reported (not silently broken).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterable


def toposort_tables(
    tables: Iterable[str],
    edges: Iterable[tuple[str, str]],
    priority: dict[str, int] | None = None,
) -> list[str]:
    """Order `tables` so every (parent, child) edge has parent first.

    `priority` (≈ Processing Order) breaks ties: lower runs earlier.
    Raises ValueError on a dependency cycle, naming its members.
    """
    priority = priority or {}
    nodes = list(dict.fromkeys(tables))
    nodeset = set(nodes)
    children: dict[str, list[str]] = {n: [] for n in nodes}
    indeg: dict[str, int] = {n: 0 for n in nodes}
    for parent, child in edges:
        if parent not in nodeset or child not in nodeset or parent == child:
            continue
        children[parent].append(child)
        indeg[child] += 1

    heap = [(priority.get(n, 0), i, n) for i, n in enumerate(nodes) if indeg[n] == 0]
    heapq.heapify(heap)
    out: list[str] = []
    while heap:
        _, _, n = heapq.heappop(heap)
        out.append(n)
        for c in children[n]:
            indeg[c] -= 1
            if indeg[c] == 0:
                heapq.heappush(heap, (priority.get(c, 0), nodes.index(c), c))
    if len(out) != len(nodes):
        cyc = sorted(n for n in nodes if n not in set(out))
        raise ValueError(f"dependency cycle among tables: {cyc}")
    return out


def stages(tables: Iterable[str], edges: Iterable[tuple[str, str]]) -> list[list[str]]:
    """Group into parallel stages: every table in stage k depends only on
    stages < k.  Tables within a stage run concurrently (driver threads /
    scheduler pools), with a barrier between stages — the reference's
    background-session fan-out + WaitForAllToFinish
    (Codeunit 60000:482-493, 521-522)."""
    nodes = list(dict.fromkeys(tables))
    nodeset = set(nodes)
    parents: dict[str, set[str]] = {n: set() for n in nodes}
    for parent, child in edges:
        if parent in nodeset and child in nodeset and parent != child:
            parents[child].add(parent)
    placed: dict[str, int] = {}
    remaining = set(nodes)
    level = 0
    while remaining:
        ready = sorted(n for n in remaining if parents[n] <= set(placed))
        if not ready:
            raise ValueError(f"dependency cycle among tables: {sorted(remaining)}")
        for n in ready:
            placed[n] = level
        remaining -= set(ready)
        level += 1
    out: list[list[str]] = [[] for _ in range(level)]
    for n in nodes:
        out[placed[n]].append(n)
    return out
