"""Incremental ANN-index maintenance as a stream: the KNN-graph edge
relation (the substrate of the graph-ANN tier, ``similarity.knn_graph``)
kept up to date while embedding vectors arrive in microbatches.

A production embedding pipeline never rebuilds its vector index per
ingest; it assigns new vectors to cells and refreshes ONLY the touched
cells' neighborhoods. This module is that shape on Structured Streaming:

- state = two ``TransactionalTable``s (sources/transact.py): MEMBERS
  (vec_id, cell, embedding) and EDGES (cell, vec_id, nbr_id, cos_sim,
  rn — the in-cell KNN edges);
- per microbatch (``foreachBatch``): assign the new vectors to their
  IVF cells (broadcast centroid config), APPEND them to members (one
  snapshot dir — the append-heavy pattern ``compact`` exists for),
  recompute the KNN edges of the AFFECTED CELLS ONLY from the members
  state, and REPLACE only those cells' sub-dirs in the cell-partitioned
  edge state (``replace_partitions`` — round 8; both the compute AND
  the write are now O(delta): Σ|touched cell|² + |batch| compute,
  O(touched cells) write, untouched cells carried manifest-only);
- exactly-once: both commits gate on ``batch_id`` manifest meta (the
  ``table_sink`` / CDC discipline). A retry after a crash between the
  two commits skips the members append (its batch_id already landed),
  DEDUPES the already-appended batch rows out of the state it reads
  (anti-join on vec_id — otherwise the recompute would rank duplicate
  neighbors into the top-k), and deterministically recomputes the same
  edge overwrite;
- determinism: assignment and scoring reuse the EXACT batch operators
  (``assign_to_centroids``, ``_knn_topk_within_cells``), so the final
  edge state is bit-identical to a cold ``knn_graph`` over the full
  corpus — the batch ≡ stream contract, pinned by
  tests/test_streaming.py and surfaced as the rows-only driver query
  ``q_knn_stream``.

Centroids are index CONFIGURATION (the ``n_centroids`` lowest vec_ids,
as everywhere in the similarity tier); they ride the members state, so
every batch after the first reads them from the committed table rather
than any side channel.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindexer_spark.sources.transact import TransactionalTable


def _apply_batch(
    members: TransactionalTable,
    edges: TransactionalTable,
    batch_df: DataFrame,
    batch_id: int,
    k: int,
    n_centroids: int,
) -> None:
    from mapreduceindexer_spark.operators.similarity import (
        _knn_topk_within_cells,
        assign_to_centroids,
    )

    spark = batch_df.sparkSession
    ecur = edges.current_version()
    if ecur > 0 and edges.meta_of(ecur).get("batch_id", -1) >= batch_id:
        return  # retried microbatch, fully committed
    batch = batch_df.select("vec_id", "embedding").localCheckpoint()
    if batch.isEmpty():
        return

    mcur = members.current_version()
    state = (
        members.read(spark, mcur).select("vec_id", "cell", "embedding")
        if mcur > 0
        else None
    )
    # Centroid config: the n_centroids lowest vec_ids — in the committed
    # state from batch 2 on, in the batch itself on batch 1.
    seed_pool = (
        state.select("vec_id", "embedding").unionByName(batch)
        if state is not None
        else batch
    )
    cents = (
        seed_pool.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        .localCheckpoint()
    )
    new_members = (
        batch.join(assign_to_centroids(batch, cents), "vec_id")
        .select("vec_id", "cell", "embedding")
        .localCheckpoint()
    )
    if mcur == 0 or members.meta_of(mcur).get("batch_id", -1) < batch_id:
        members.commit(
            new_members,
            mode="append" if mcur > 0 else "overwrite",
            expected_version=mcur,
            meta={"batch_id": batch_id},
        )
    affected = new_members.select("cell").distinct()
    # A retried batch whose MEMBERS append already landed (crash between
    # the two commits) has its rows in ``state`` too — union would
    # double-count them and the edge recompute would rank duplicate
    # neighbors into the top-k (round-7 review finding). The anti-join
    # dedup is the identity on the no-crash path (state and batch ids
    # are disjoint) and exactly removes the overlap on replay.
    all_members = (
        state.join(new_members, "vec_id", "left_anti").unionByName(new_members)
        if state is not None
        else new_members
    )
    touched = all_members.join(F.broadcast(affected), "cell", "left_semi")
    new_edges = (
        _knn_topk_within_cells(
            touched.select("vec_id", "embedding"),
            touched.select("vec_id", "cell"),
            k,
        )
        .join(all_members.select("vec_id", "cell"), "vec_id")
        .select("cell", "vec_id", "nbr_id", "cos_sim", "rn")
    )
    # Both the RECOMPUTE and the STATE WRITE are delta-driven: the edge
    # state is cell-partitioned (one sub-dir per cell), so the batch
    # replaces ONLY the touched cells' sub-dirs; every other cell's
    # data is carried into the new manifest untouched — zero read, zero
    # write (replace_partitions; this closes the round-7 docstring's
    # "whole-table rewrite per batch" caveat). The affected-cell id
    # collect is bounded by the cell dial (n/200 cells at production
    # scale, of which a batch touches its own spread) — manifest-plane,
    # not data-plane.
    affected_vals = [r["cell"] for r in affected.collect()]
    if ecur > 0:
        edges.replace_partitions(
            spark,
            new_edges,
            affected_vals,
            expected_version=ecur,
            meta={"batch_id": batch_id},
        )
    else:
        edges.commit_partitioned(
            spark,
            new_edges,
            "cell",
            expected_version=ecur,
            meta={"batch_id": batch_id},
        )


def streaming_knn_graph(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    k: int = 3,
    n_centroids: int = 8,
) -> DataFrame:
    """Replay the embeddings table as ``n_slices`` microbatches,
    incrementally maintain the in-cell KNN edge relation, and return
    the final committed edges (vec_id, nbr_id, cos_sim, rn) — exactly
    ``similarity.knn_graph``'s output for the full corpus."""
    from mapreduceindexer_spark.sources.tables import load_table

    from mapreduceindexer_spark.streaming.index_stream import _write_doc_slices

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp_dir = tempfile.mkdtemp(prefix="mri_ann_stream_")
    try:
        stream_dir = os.path.join(tmp_dir, "stream")
        # Shared replay mechanics (vec_id-range slices, mtime-ordered,
        # fsync'd) — slice 1 therefore carries the centroid seed ids.
        _write_doc_slices(emb, stream_dir, n_slices, id_col="vec_id")
        members = TransactionalTable(os.path.join(tmp_dir, "members"))
        edges = TransactionalTable(os.path.join(tmp_dir, "edges"))
        src = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, bid: _apply_batch(
                    members, edges, df, bid, k, n_centroids
                )
            )
            .queryName(f"ann_stream_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise RuntimeError(
                    "ANN index maintenance replay did not finish within 300 s"
                )
        finally:
            q.stop()
        from mapreduceindexer_spark.streaming.table_sink import read_result

        out_schema = (
            "cell bigint, vec_id bigint, nbr_id bigint,"
            " cos_sim double, rn bigint"
        )
        # Materialize before tmp cleanup deletes the snapshots.
        return (
            read_result(edges, spark, out_schema)
            .select("vec_id", "nbr_id", "cos_sim", "rn")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


def _apply_hnsw_batch(
    members: TransactionalTable,
    edges: TransactionalTable,
    batch_df: DataFrame,
    batch_id: int,
    k_edges: int,
    n_centroids: int,
    n_coarse: int,
) -> None:
    """One microbatch of full-hierarchy HNSW maintenance. The
    corpus-sized layer 0 (in-cell KNN pairs) is maintained DELTA-DRIVEN
    exactly like ``_apply_batch`` — only touched cells recompute. The
    upper layers (hub KNN, coarse mesh, member<->hub stars) are O(hubs),
    not O(corpus), so they are REBUILT from the members state each batch
    via the same ``_hnsw_upper_edges`` body the cold build runs — that
    is the production trade (linear tiny rebuild beats tracking hub
    turnover), and it guarantees the committed index equals the cold
    ``hnsw_graph_edges`` after every batch, not just the last. Edge
    state rows are layer-tagged: ``cell`` is the L0 replace key,
    NULL-cell rows are the per-batch upper rebuild. Exactly-once via
    ``batch_id`` manifest meta on both tables (the ``_apply_batch``
    crash-retry discipline, including the members-landed dedup)."""
    from mapreduceindexer_spark.operators.similarity import (
        _hnsw_upper_edges,
        _knn_topk_within_cells,
        assign_to_centroids,
        min_id_coarse_picker,
    )

    spark = batch_df.sparkSession
    ecur = edges.current_version()
    if ecur > 0 and edges.meta_of(ecur).get("batch_id", -1) >= batch_id:
        return  # retried microbatch, fully committed
    batch = batch_df.select("vec_id", "embedding").localCheckpoint()
    if batch.isEmpty():
        return

    mcur = members.current_version()
    state = (
        members.read(spark, mcur).select("vec_id", "cell", "embedding")
        if mcur > 0
        else None
    )
    seed_pool = (
        state.select("vec_id", "embedding").unionByName(batch)
        if state is not None
        else batch
    )
    cents = (
        seed_pool.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        .localCheckpoint()
    )
    new_members = (
        batch.join(assign_to_centroids(batch, cents), "vec_id")
        .select("vec_id", "cell", "embedding")
        .localCheckpoint()
    )
    if mcur == 0 or members.meta_of(mcur).get("batch_id", -1) < batch_id:
        members.commit(
            new_members,
            mode="append" if mcur > 0 else "overwrite",
            expected_version=mcur,
            meta={"batch_id": batch_id},
        )
    affected = new_members.select("cell").distinct()
    all_members = (
        state.join(new_members, "vec_id", "left_anti").unionByName(new_members)
        if state is not None
        else new_members
    ).localCheckpoint()
    touched = all_members.join(F.broadcast(affected), "cell", "left_semi")
    l0_new = (
        _knn_topk_within_cells(
            touched.select("vec_id", "embedding"),
            touched.select("vec_id", "cell"),
            k_edges,
        )
        .select("vec_id", "nbr_id")
        .join(all_members.select("vec_id", "cell"), "vec_id")
        .select("cell", "vec_id", "nbr_id")
    )
    upper = _hnsw_upper_edges(
        all_members.select("vec_id", "embedding", "cell"),
        min_id_coarse_picker(n_coarse),
        k_edges,
    ).select(
        F.lit(None).cast("bigint").alias("cell"), "vec_id", "nbr_id"
    )
    # O(delta) state write: the edge state is cell-partitioned, so the
    # batch replaces only the touched cells' sub-dirs plus the NULL
    # partition (the per-batch upper-layer rebuild); untouched cells'
    # sub-dirs carry into the new manifest with zero read or write.
    updates = l0_new.unionByName(upper)
    affected_vals = [r["cell"] for r in affected.collect()]
    if ecur > 0:
        edges.replace_partitions(
            spark,
            updates,
            affected_vals + [None],
            expected_version=ecur,
            meta={"batch_id": batch_id},
        )
    else:
        edges.commit_partitioned(
            spark,
            updates,
            "cell",
            expected_version=ecur,
            meta={"batch_id": batch_id},
        )


def streaming_hnsw_index(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    k_edges: int = 3,
    n_centroids: int = 8,
    n_coarse: int = 3,
    serving_table: TransactionalTable | None = None,
) -> DataFrame:
    """Replay the embeddings table as ``n_slices`` microbatches,
    incrementally maintain the FULL three-layer HNSW edge relation
    (L0 delta-driven, hub layers rebuilt per batch — see
    ``_apply_hnsw_batch``), and return the final payload-joined edges
    (vec_id, nbr_id, nbr_vec, nbr_nrm) — exactly
    ``similarity.hnsw_graph_edges`` over the full corpus (pinned by
    tests/test_streaming.py). When ``serving_table`` is given, the
    final edge relation is additionally PERSISTED through
    ``similarity.persist_graph_index`` (range-clustered, Bloom-statted)
    — the full composition: streaming ingest -> incremental index ->
    transactional serving table, build-once/probe-many across
    sessions."""
    from mapreduceindexer_spark.operators.similarity import (
        hnsw_payload_join,
        persist_graph_index,
    )
    from mapreduceindexer_spark.sources.tables import load_table
    from mapreduceindexer_spark.streaming.index_stream import _write_doc_slices
    from mapreduceindexer_spark.streaming.table_sink import read_result

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp_dir = tempfile.mkdtemp(prefix="mri_hnsw_stream_")
    try:
        stream_dir = os.path.join(tmp_dir, "stream")
        _write_doc_slices(emb, stream_dir, n_slices, id_col="vec_id")
        members = TransactionalTable(os.path.join(tmp_dir, "members"))
        edges = TransactionalTable(os.path.join(tmp_dir, "edges"))
        src = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, bid: _apply_hnsw_batch(
                    members, edges, df, bid, k_edges, n_centroids, n_coarse
                )
            )
            .queryName(f"hnsw_stream_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise RuntimeError(
                    "HNSW index maintenance replay did not finish within 300 s"
                )
        finally:
            q.stop()
        pairs = (
            read_result(edges, spark, "cell bigint, vec_id bigint, nbr_id bigint")
            .select("vec_id", "nbr_id")
            .distinct()
        )
        vecs = read_result(
            members, spark, "vec_id bigint, cell bigint, embedding array<float>"
        ).select("vec_id", "embedding")
        final = hnsw_payload_join(vecs, pairs).localCheckpoint()
        if serving_table is not None:
            persist_graph_index(spark, final, serving_table)
        return final
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


__all__ = ["streaming_knn_graph", "streaming_hnsw_index"]
