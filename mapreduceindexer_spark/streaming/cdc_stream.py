"""Streaming CDC apply: a change stream merged into the transactional
table format with exactly-once semantics.

The missing piece between the streaming surface and a queryable table:
microbatches of updates (here: events as per-user profile changes)
arrive via ``foreachBatch``; each batch upserts latest-wins into a
``TransactionalTable`` (sources/transact.py) and COMMITS a new snapshot
whose manifest records the ``batch_id``. Exactly-once falls out of two
properties:

- **idempotence**: a retried microbatch sees its own ``batch_id`` in the
  current manifest's meta and returns without re-applying;
- **atomic publication**: the commit is the manifest link — a reader
  either sees the previous complete version or the new complete
  version, never a half-merged table, and a crash mid-batch leaves an
  orphan snapshot that vacuum reclaims.

The final table state equals the BATCH latest-event-per-user relation
exactly (pinned by tests/test_streaming.py) — the CDC-apply identity
``apply(b1); apply(b2) == apply(b1 ∪ b2)`` for time-ordered batches.

Scale: each batch's merge is a full-outer join between the current
state and the batch delta keyed on user_id — delta-sized work plus one
state rewrite per batch (the append-only variant would log deltas and
compact; same table format, different mode dial). The reference has no
streaming or table surface; north-star extension coverage.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindexer_spark.sources.transact import TransactionalTable


def latest_per_user(events: DataFrame) -> DataFrame:
    """Batch twin: each user's latest (ts, event_id)-ordered event value
    — what the CDC-applied table must equal exactly."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
    )


def _apply_batch(
    table: TransactionalTable, batch_df: DataFrame, batch_id: int
) -> None:
    spark = batch_df.sparkSession
    cur = table.current_version()
    if cur > 0 and table.meta_of(cur).get("batch_id", -1) >= batch_id:
        return  # retried microbatch: its effect is already committed
    delta = latest_per_user(
        batch_df.select("user_id", "ts", "event_id", "value")
    )
    if cur > 0:
        state = table.read(spark, cur)
        merged = (
            state.unionByName(delta)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("last_ts"), F.desc("last_event_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    else:
        merged = delta
    # localCheckpoint before committing: the merged plan reads the
    # CURRENT snapshot's files, and commit() writes a NEW snapshot dir —
    # safe — but materializing first keeps the write independent of the
    # read path (and is what a real engine's shuffle boundary gives).
    table.commit(
        merged.localCheckpoint(),
        mode="overwrite",
        expected_version=cur,
        meta={"batch_id": batch_id},
    )


def streaming_cdc_apply(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> DataFrame:
    """Replay the events backlog as ``n_slices`` chronological
    microbatches, CDC-apply each into a TransactionalTable, and return
    the final committed state (user_id, last_ts, last_event_id,
    last_value)."""
    from mapreduceindexer_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    tmp_dir = tempfile.mkdtemp(prefix="mri_cdc_")
    try:
        stream_dir = os.path.join(tmp_dir, "stream")
        os.makedirs(stream_dir)
        w = Window.orderBy("ts", "event_id")
        sliced = events.withColumn("slice", F.ntile(n_slices).over(w))
        for i in range(1, n_slices + 1):
            part_dir = os.path.join(tmp_dir, f"w{i}")
            sliced.filter(F.col("slice") == i).drop("slice").coalesce(
                1
            ).write.mode("overwrite").parquet(part_dir)
            src = next(
                os.path.join(part_dir, f)
                for f in os.listdir(part_dir)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            dst = os.path.join(stream_dir, f"slice_{i:03d}.parquet")
            shutil.move(src, dst)
            os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))

        table = TransactionalTable(os.path.join(tmp_dir, "profile"))
        src_stream = (
            spark.readStream.schema(
                "user_id bigint, ts timestamp, event_id bigint, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        q = (
            src_stream.writeStream.foreachBatch(
                lambda df, bid: _apply_batch(table, df, bid)
            )
            .queryName(f"cdc_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise RuntimeError("CDC replay did not finish within 300 s")
        finally:
            q.stop()
        # Materialize before tmp cleanup deletes the backing snapshot.
        # read_result: an EMPTY backlog commits no version at all, and a
        # bare table.read would raise on version 0 instead of returning
        # the empty typed result (round-7 review finding — the same
        # empty-stream class fixed in the table_sink consumers).
        from mapreduceindexer_spark.streaming.table_sink import read_result

        return read_result(
            table,
            spark,
            "user_id bigint, last_ts timestamp,"
            " last_event_id bigint, last_value double",
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
