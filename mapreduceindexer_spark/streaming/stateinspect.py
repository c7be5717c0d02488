"""State-store reader (Spark 4 ``statestore`` data source): offline
inspection of a Structured Streaming query's checkpointed state.

Why this is a first-class surface and not a debugging trick: at
production scale the state store IS the database a streaming pipeline
maintains (session machines, running totals, the incremental index's
merge state), and operating it needs the same auditability as any
table — is the state growing without bound? is one grouping key hot? did
the last deploy corrupt a value? The ``statestore`` source answers those
with a plain batch DataFrame over the checkpoint — no stream restart, no
state-machine surgery.

Scale notes: the source reads the state files for ONE (operator, store)
of the checkpoint's latest (or a chosen) batch; rows come back
partitioned exactly as the state is (``partition_id`` column), so the
skew census below is a faithful picture of hot-key concentration in the
actual store, not a resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_aggregation_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """State of a streaming aggregation as ``(key struct, value struct,
    partition_id)`` — one row per live grouping key. ``batch_id`` pins a
    historical batch (default: latest committed)."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint_dir)


def streaming_totals_state(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> DataFrame:
    """Run a NATIVE streaming aggregation (JVM hash-agg state, not a
    Python kernel) over the multi-microbatch events backlog, then read
    its RAW STATE STORE back through the ``statestore`` source — the
    returned relation is the store's own rows (one per live key), not
    the sink's output. The contract: after the full replay, state ==
    the batch aggregate, for any slicing — the store is the database.
    Complements ``q_tws_totals`` (typed-state Python kernel): together
    they driver-check both halves of the stateful-streaming surface
    the environment-gated transformWithState path uses (round-9
    verdict item 4).

    The scaled-sum is SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1e6 AS
    BIGINT)) — the catalog's decimal discipline (round-11 fix: no
    double ``round()`` whose half-way semantics engines may disagree
    on; the decimal cast is exact for ≤6-fractional-digit values).
    Exact int64 adds, so cross-batch accumulation is
    order-independent and the DuckDB oracle replays it verbatim."""
    import os
    import shutil
    import tempfile

    from mapreduceindexer_spark.sources.tables import load_table
    from mapreduceindexer_spark.streaming.twstate import _write_sliced_events

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    tmp = tempfile.mkdtemp(prefix="mri_stateq_")
    try:
        stream_dir = _write_sliced_events(events, tmp, n_slices)
        ckpt = os.path.join(tmp, "ckpt")
        src = (
            spark.readStream.schema(
                "user_id bigint, event_id bigint, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        agg = src.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(
                (
                    F.col("value").cast("decimal(18,6)")
                    * F.lit(1_000_000).cast("decimal(7,0)")
                ).cast("bigint")
            ).alias("sum_scaled"),
        )
        from mapreduceindexer_spark.streaming.twstate import _rocksdb_provider

        with _rocksdb_provider(spark):
            q = (
                agg.writeStream.outputMode("update")
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # A timed-out replay must FAIL, not silently return the
            # store mid-replay (partial totals) while the finally
            # block deletes the checkpoint under a running query —
            # same contract as table_sink.run_stream_to_table. The
            # stop() lives in a finally like every sibling module:
            # ANY exit (timeout, Py4J error, interrupt) must not
            # leave the query running over a checkpoint the outer
            # finally is about to delete.
            try:
                done = q.awaitTermination(300)
            finally:
                if q.isActive:
                    q.stop()
            if not done:
                raise RuntimeError(
                    "streaming_totals_state: backlog replay did not "
                    "finish within 300s; state read aborted"
                )
        return (
            read_aggregation_state(spark, ckpt)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.count").alias("n_events"),
                F.col("value.sum").alias("sum_scaled"),
            )
            # Materialize before the checkpoint dir is removed: the
            # statestore read is lazy over the checkpoint files.
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def state_skew_census(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition state population: (partition_id, n_keys) — the
    hot-partition meter for a running stateful query. A healthy store
    spreads keys ~uniformly; one partition holding an outsized share
    means a skewed grouping key and is the signal to salt or re-key."""
    return (
        read_aggregation_state(spark, checkpoint_dir, operator_id=operator_id)
        .groupBy("partition_id")
        .agg(F.count("*").cast("bigint").alias("n_keys"))
    )
