"""Connected-components unit tests: convergence beyond one propagation
round (chains), merge of overlapping clusters, and orientation invariance."""

from __future__ import annotations

from mapreduceindexer_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    return {
        (r.doc_id, r.cluster_id) for r in connected_components(df).collect()
    }


def test_chain_converges_to_single_min_label(spark):
    # 0-1-2-3-4-5: diameter 5 forces several propagation rounds.
    edges = [(i, i + 1) for i in range(5)]
    assert _cc(spark, edges) == {(i, 0) for i in range(6)}


def test_disjoint_clusters_keep_separate_labels(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)]
    got = _cc(spark, edges)
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_orientation_invariance(spark):
    # Same component however the pair was emitted (a<b or b<a).
    assert _cc(spark, [(5, 9), (9, 5), (9, 12)]) == {(5, 5), (9, 5), (12, 5)}


def test_pagerank_conserves_mass_and_ranks_hub_highest(spark):
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.graph import pagerank

    # Star graph (hub 0 <-> spokes 1..4), undirected = both directions.
    und = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = spark.createDataFrame(und, "src BIGINT, dst BIGINT")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    # Probability mass is conserved (no dangling nodes in this graph).
    assert abs(sum(got.values()) - 1.0) < 1e-4, got
    # The hub dominates every spoke; spokes are symmetric.
    assert all(got[0] > got[i] for i in range(1, 5)), got
    spoke = {round(got[i], 6) for i in range(1, 5)}
    assert len(spoke) == 1, got


def test_pagerank_uniform_on_cycle(spark):
    from mapreduceindexer_spark.operators.graph import pagerank

    # Directed 4-cycle: perfectly symmetric, so rank stays uniform at 1/4.
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src BIGINT, dst BIGINT"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=7).collect()}
    assert all(abs(v - 0.25) < 1e-9 for v in got.values()), got


def _cc_star(spark, edges, max_rounds=16):
    from mapreduceindexer_spark.operators.graph import (
        connected_components_logstar,
    )

    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    return {
        (r.doc_id, r.cluster_id)
        for r in connected_components_logstar(df, max_rounds=max_rounds).collect()
    }


def test_logstar_matches_label_propagation_on_blobs(spark):
    # The dedup-shaped graph: several short-diameter blobs + overlap merge.
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21), (21, 22), (22, 20),
             (3, 4), (4, 10)]
    assert _cc_star(spark, edges) == _cc(spark, edges)


def test_logstar_converges_on_long_path_in_log_rounds(spark):
    # Diameter 200: min-label propagation would need 200 rounds; star
    # contraction must close it within the 16-round budget — the exact
    # adversarial case the algorithm exists for.
    edges = [(i, i + 1) for i in range(200)]
    assert _cc_star(spark, edges, max_rounds=16) == {
        (i, 0) for i in range(201)
    }


def test_logstar_clique_and_star_and_orientation(spark):
    import itertools

    clique = list(itertools.combinations(range(5, 10), 2))
    star = [(50, x) for x in range(51, 60)]
    flipped = [(v, u) for u, v in clique] + star
    got = _cc_star(spark, flipped)
    assert got == {(i, 5) for i in range(5, 10)} | {
        (x, 50) for x in range(50, 60)
    }


def test_logstar_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    assert _cc_star(spark, edges) == _cc(spark, edges)


def test_logstar_raises_on_exhausted_round_budget(spark):
    """A round budget too small for the fixpoint must raise, never
    silently return non-minimal labels (advisor finding, round 5)."""
    import pytest
    from pyspark.sql import functions as F
    from mapreduceindexer_spark.operators.graph import (
        connected_components_logstar,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "u int, v int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_logstar(edges, max_rounds=1)


def test_logstar_default_budget_scales_from_node_count(spark):
    # max_rounds=None: budget derived from n (3*ceil(log2 n)+8), enough
    # for the 200-diameter path that defeats fixed-round propagation.
    got = _cc_star(spark, [(i, i + 1) for i in range(200)], max_rounds=None)
    assert got == {(i, 0) for i in range(201)}


def test_bfs_distances_on_path_and_disconnected(spark):
    from mapreduceindexer_spark.operators.graph import bfs_distances

    # Path 0-1-2-3 plus a disconnected edge 10-11: BFS from min node (0)
    # must settle exact hop counts and never reach the other component.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "u int, v int"
    )
    got = {(r["node"], r["dist"]) for r in bfs_distances(edges).collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3)}
    # Explicit source + cycle: distances are shortest, not first-found.
    edges2 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "u int, v int"
    )
    got2 = {(r["node"], r["dist"]) for r in bfs_distances(edges2, source=1).collect()}
    assert got2 == {(1, 0), (0, 1), (2, 1), (3, 2)}
