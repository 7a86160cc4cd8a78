"""Duplicate-cluster resolution: connected components over a near-dup
pair graph, and the keep/drop decision per cluster (north-star N1/N2 —
beyond the reference, which has no grouping op; its closest analogue is
the per-PK "apply replaces matching rows" semantics, Codeunit 60000:440-451).

A near-dup stage (Jaccard / MinHash-LSH / SimHash / embedding cosine)
emits PAIRS, but a curation pipeline needs GROUPS: if A~B and B~C, all
three are one duplicate cluster and exactly one representative survives.
That closure is connected components on the pair graph.

Scale design (100 TB):
- Iterative min-label propagation, entirely as DataFrame joins: each
  round every node adopts the smallest label among itself and its
  neighbors.  Rounds needed = graph diameter.  Dedup-pair graphs are
  dense near-cliques (every member of a duplicate cluster pairs with
  most others), so diameters are tiny — 2-4 rounds in practice, each
  round one shuffle-join keyed by node id + one min-aggregate with
  map-side partials.  For adversarial long-chain graphs the
  alternating large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") converges in O(log² n); the loop
  below is the right trade for dedup workloads and stays O(E) per round.
- `localCheckpoint()` per round truncates lineage — without it the plan
  doubles every iteration and Catalyst re-optimizes an exponentially
  growing tree.
- Convergence is detected with one tiny count() action per round on the
  changed-label set (bounded driver work; the data never collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al.): every node u connects its
    strictly-LARGER neighbors to m = min(Γ(u) ∪ {u}).  Output edges are
    already oriented big→small and loop-free (m ≤ u < v)."""
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mn = sym.groupBy("a").agg(F.min("b").alias("_nb")).select(
        "a", F.least(F.col("_nb"), F.col("a")).alias("m")
    )
    return (
        sym.join(mn, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node u connects its ≤-neighbors AND
    itself to their minimum.  Operates on the big→small orientation."""
    c = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return _small_star_canonical(c)


def _small_star_canonical(c: DataFrame) -> DataFrame:
    """Small-star over an ALREADY canonical edge frame (distinct,
    strictly big→small oriented, loop-free) — exactly what
    :func:`_large_star` emits.  Skipping the re-canonicalization
    (greatest/least + distinct = one full exchange per round) on that
    path cuts a round from ~6 exchanges to ~5 with identical output."""
    mn = c.groupBy("a").agg(F.min("b").alias("m"))
    return (
        c.join(mn, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .unionByName(mn.select(F.col("a"), F.col("m").alias("b")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    `component` is the minimum node id reachable from `node`.

    Two algorithms, value-identical, both pure DataFrame joins:

    - ``"star"`` (default): alternating large-star/small-star (Kiveris
      et al., "Connected Components in MapReduce and Beyond").
      Converges in O(log n) rounds on ANY graph shape — an adversarial
      length-L chain (a slightly-mutated document series) needs ~log L
      rounds where min-label needs L.  Each round is two grouped
      aggregations + joins over the (shrinking) edge set.
    - ``"label"``: min-label propagation — each round every node adopts
      the smallest label among itself and its neighbors; rounds = graph
      diameter.  Near-dup clusters are near-cliques (diameter 2-4), so
      this is marginally cheaper per round there; it is the wrong tool
      for chains.
    """
    if algorithm not in ("star", "label"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    numeric = {"tinyint", "smallint", "int", "bigint"}
    dt = dict(edges.dtypes)
    for c in (src, dst):
        if dt.get(c) not in numeric:
            # a silent cast of string/UUID ids to NULL would make every
            # edge (NULL, NULL) and the label join a no-op — fail loudly
            raise ValueError(
                f"connected_components needs integral node ids; {c!r} is "
                f"{dt.get(c)!r} — hash or dictionary-encode ids to long first"
            )
    e = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    if algorithm == "star":
        return _connected_components_star(e, max_iter)
    # materialize the edge list ONCE: its lineage is typically a whole
    # near-dup pipeline (shingles -> signatures -> LSH join -> rerank),
    # and every propagation round joins against it — without the
    # checkpoint each round would re-execute that pipeline from the scan
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # LAZY checkpoints: the per-round `changed` count is the first action
    # over each new label frame, so it materializes the checkpoint as a
    # side effect — one job per round instead of two (the lineage cut is
    # identical; see the star loop)
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("component", F.col("node"))
    ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        # each node receives its neighbors' current labels...
        msgs = sym.join(
            labels.select(F.col("node").alias("a"), "component"), "a"
        ).select(F.col("b").alias("node"), "component")
        # ...and keeps the minimum of {own label} ∪ {received labels}
        new_labels = (
            labels.unionByName(msgs).groupBy("node").agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # unconverged labels are silently WRONG (a component would come
        # back split); the caller must raise max_iter for graphs whose
        # diameter exceeds it (e.g. long similarity chains)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (label needs one round per hop of graph diameter)"
        )
    return labels


def _connected_components_star(e: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star loop (see
    :func:`connected_components`).  At the fixed point the edge set IS
    the answer: a star forest {(v, c)} whose centers c are their
    components' minimum ids."""
    # materialize the edge list ONCE: its lineage is typically a whole
    # near-dup pipeline (signatures -> LSH join -> rerank), and both the
    # node universe and the canonical edge set below would otherwise
    # re-execute it (the label algorithm's `sym` discipline)
    e = e.localCheckpoint(eager=True)
    # the node universe: self-loop-only and isolated-edge nodes must
    # still appear in the output even though canonicalization drops
    # their edges.  NOT materialized here — it derives from the already-
    # checkpointed `e` and is consumed exactly once (the final join), so
    # an upfront eager cut would only add a job.
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    # LAZY checkpoint + immediate count: the count action materializes
    # the checkpoint, so each frame costs ONE job instead of two
    # (materialize + count) — the lineage cut is identical either way
    cur = (
        e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # remember the edge count across rounds: cur's count is last round's
    # nxt count, so equality needs ONE count job per round, not two
    cur_n = cur.count()
    for _ in range(max_iter):
        # _large_star's output is already canonical (distinct, strictly
        # big→small), so the small-star round skips re-canonicalizing it
        nxt = _small_star_canonical(_large_star(cur)).localCheckpoint(eager=False)
        nxt_n = nxt.count()
        # set equality on two canonical distinct frames: same size and
        # nothing in nxt outside cur (a tiny anti-join action on
        # edge-sized frames — cheaper than exceptAll's generate+agg plan
        # and equivalent on distinct inputs; the data never collects)
        if nxt_n == cur_n and nxt.join(cur, ["a", "b"], "left_anti").isEmpty():
            cur = nxt
            break
        cur, cur_n = nxt, nxt_n
    else:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            "rounds; raise max_iter (star needs O(log n) rounds)"
        )
    labels = cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every row of `df` to its duplicate cluster: rows linked
    (transitively) through `pairs` share a `component` (= min member id);
    unpaired rows are their own singleton component.  `is_kept` = 1 for
    the cluster representative (smallest id), 0 for rows a dedup pass
    drops.

    The join back to the corpus is keyed on the id — broadcastable when
    the pair graph is small relative to the corpus (the common case:
    duplicates are a few percent), else a plain hash join; either way the
    100 TB corpus is scanned once.
    """
    labels = connected_components(pairs, src=src, dst=dst)
    out = df.join(
        labels.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).withColumn("component", F.coalesce(F.col("component"), F.col(id_col).cast("long")))
    return out.withColumn(
        "is_kept", (F.col(id_col).cast("long") == F.col("component")).cast("int")
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node TRIANGLE counts over an undirected graph (round 9 —
    the local clustering signal: spam/link-farm detection on web
    graphs, community density on co-occurrence graphs).  Returns
    (node, degree, triangles).

    Scale design — the degree-oriented wedge algorithm (Schank; Cohen's
    MapReduce formulation), never the naive three-way self-join of raw
    edges: every undirected edge is ORIENTED from the (degree, id)-
    smaller endpoint to the larger, which bounds every out-degree by
    O(sqrt(m)); wedges (two out-edges of one node) are then a self-join
    whose per-key fan-out is that bounded out-degree squared — the
    worst case a hub node creates in the naive join simply cannot
    occur — and each wedge closes iff its (b, c) pair is itself an
    oriented edge (one more equi-join against the edge set).  Each
    triangle is found exactly once; per-node counts come from
    exploding the triangle's three corners (map-side combinable).

    Self-loops are dropped; parallel edges collapse; direction of the
    input is ignored (the graph is treated as undirected)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # total order for orientation: (deg, id) ascending
    ranked = sym.join(deg.withColumnsRenamed({"u": "u", "deg": "du"}), "u").join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("dv")), "v"
    )
    oriented = ranked.where(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    # wedges: two out-neighbors of a, kept once via the same total order
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(o2, F.col("o1.u") == F.col("o2.u")).where(
        F.col("o1.v") < F.col("o2.v")
    ).select(
        F.col("o1.u").alias("a"), F.col("o1.v").alias("b"), F.col("o2.v").alias("c")
    )
    # close the wedge: (b, c) must be an oriented edge in EITHER rank
    # direction (b<c by construction here, but rank order may differ)
    closer = oriented.select(F.col("u").alias("b"), F.col("v").alias("c")).unionByName(
        oriented.select(F.col("v").alias("b"), F.col("u").alias("c"))
    )
    tris = wedges.join(closer, ["b", "c"], "left_semi")
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("b").alias("node")))
        .unionByName(tris.select(F.col("c").alias("node")))
    )
    per_node = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        deg.select(F.col("u").alias("node"), "deg")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
    )


def label_propagation(
    edges: DataFrame, rounds: int = 4, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007) over an undirected graph — the near-linear
    community signal for web/link graphs that connected components
    cannot give (components only answer reachability; LPA splits a
    connected graph into densely-linked groups — link rings, topic
    clusters, template families).

    Semantics, fully deterministic so any engine replays the final
    labels: every node starts labeled with its own id; each ROUND every
    node simultaneously adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label (a node with no
    neighbors cannot occur here — the node set is induced by the edge
    list).  The round budget is a fixed parameter: classic async LPA
    converges but is order-dependent; fixed-round synchronous LPA is
    the reproducible variant (oscillation on bipartite-ish structures
    is bounded by the budget and the same in every engine).

    Scale shape: per round ONE neighbor join (edges x node-sized label
    frame, key-partitioned), one (node, label) count with map-side
    partials, one per-node rank window bounded by the node's distinct
    neighbor-label count.  The label frame is localCheckpoint-ed per
    round so the plan stays O(1) deep; the bidirectional edge list is
    checkpointed once and reused every round (the pagerank discipline).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from pyspark.sql import Window

    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
    )
    bi = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        bi.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(rounds):
        nbr = bi.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def kcore(
    edges: DataFrame, k: int = 3, rounds: int = 8, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """k-CORE peeling over an undirected graph — the density filter
    behind web-graph curation (a page outside the 2-core is a leaf of
    leaves; link farms live in unusually deep cores).  Each round
    SIMULTANEOUSLY removes every node whose degree in the current
    subgraph is < k, plus its edges; after ``rounds`` rounds the
    surviving nodes and their subgraph degrees are returned as
    (node, degree).

    The round budget is a FIXED parameter (the label_propagation
    discipline): the fixpoint iteration count is data-dependent, so a
    bounded synchronous schedule is what an external engine can replay
    exactly — callers wanting the true core run with a generous budget
    and check convergence via the returned degrees (all >= k iff
    converged, asserted in tests).  Each round is one degree count
    (map-side partials) + two semi-joins of the edge list against the
    shrinking keep set; the edge frame is localCheckpoint-ed per round
    so the plan stays O(1) deep.  Rows only ever shrink — the peeled
    subgraph never exceeds the input."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
    )
    bi = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = bi.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
        keep = deg.filter(F.col("__d") >= k).select("u")
        bi = (
            bi.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        bi.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("u").alias("node"), "degree")
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    directed: bool = True,
) -> DataFrame:
    """Multi-source breadth-first shortest-hop distances — the
    "crawl-depth from seed set" signal web curation uses to weight
    pages (OPIC/seed-distance features) and the reachability primitive
    behind link-graph audits.  Returns (node, hop) for every node
    reachable from ``sources`` within ``max_hops`` edges, where hop is
    the MINIMUM number of edges from any source (sources themselves are
    hop 0).  Unreachable nodes are absent.

    Deterministic by construction (min-hop is order-independent), so
    any engine replays it exactly; the oracle unrolls the same frontier
    expansion as CTEs.

    Scale shape: textbook BSP frontier BFS — each round is ONE join of
    the current frontier against the src-partitioned edge list plus one
    anti-join against the visited set, both key-partitioned shuffles of
    frontier-sized frames (the edge list is localCheckpoint-ed once and
    reused, the pagerank discipline).  The visited set only grows by
    newly discovered nodes, and a round with an empty frontier stops
    early — the loop never does work proportional to anything but the
    discovered subgraph.  No collect of node lists; the only driver
    action per round is the 1-row emptiness probe.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().localCheckpoint(eager=True)
    dist = (
        sources.select(F.col(node).cast("long").alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def dedup_clusters_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate clustering that keeps the BEST row per cluster instead
    of the smallest id — the production keep rule (RefinedWeb/Gopher
    keep the highest-QUALITY copy of a near-dup family, not an
    arbitrary one): rows linked through ``pairs`` share a component
    (min member id, as in :func:`dedup_clusters`), and ``is_kept`` = 1
    for the member with the highest ``score_col`` (ties to the
    smallest id — deterministic).

    Same scale shape as dedup_clusters (components + one id-keyed join
    back) plus one component-keyed rank window bounded by cluster
    size."""
    from pyspark.sql import Window

    labels = connected_components(pairs, src=src, dst=dst)
    out = df.join(
        labels.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col).cast("long"))
    )
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "is_kept", (F.row_number().over(w) == 1).cast("int")
    )
