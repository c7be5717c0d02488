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
