"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

Spark's built-in ``session_window`` covers the batch case
(``operators/events.user_sessions``); this module is the *custom stateful
operator* pattern for semantics the built-ins can't express: an arbitrary
per-key state machine advanced incrementally across microbatches.

Execution shape:

- the ``events`` backlog is replayed as a real multi-microbatch stream
  (time-sliced parquet files + ``maxFilesPerTrigger=1``), so per-user
  session state genuinely carries across batch boundaries — sessions that
  span two slices are stitched by the state store, not by a single batch
  seeing all rows;
- state per user is three numbers (session_start, last_ts, n_events) —
  O(keys), bounded regardless of stream length;
- an event-time timeout at ``last_ts + gap`` closes idle sessions when the
  watermark passes (the production path); a final per-user flush marker
  closes the remaining open sessions at end-of-backlog so the bounded
  replay emits *exactly* the batch result (the test pins stream ≡ batch);
- at 100 TB the same query runs unchanged against kafka with the timeout
  path doing all the closing; the marker trick is only the bounded-replay
  equivalent of "the stream ended".

The reference engine has no streaming surface; this is north-star
extension coverage (SURVEY §2.3 streaming family).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from datetime import timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

GAP_SECONDS = 600  # matches the batch q_events_session gap of 10 minutes

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session state machine.

    Emits one row per *closed* session; open sessions stay in state with an
    event-time timeout at ``last_ts + gap``.
    """
    gap_us = GAP_SECONDS * 1_000_000
    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int]] = []

    if state.hasTimedOut:
        # Watermark passed last_ts + gap: the session is closed by time.
        if start_us is not None:
            closed.append((start_us, n))
        state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], na_position="last")
        for ts, is_marker in zip(rows["ts"], rows["is_marker"]):
            if bool(is_marker):
                # End-of-backlog flush: close the open session, start none.
                if start_us is not None:
                    closed.append((start_us, n))
                    start_us, last_us, n = None, None, 0
                continue
            ts_us = int(pd.Timestamp(ts).value // 1_000)
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us < gap_us:  # strict <, like session_window
                last_us, n = ts_us, n + 1
            else:
                closed.append((start_us, n))
                start_us, last_us, n = ts_us, ts_us, 1
        if start_us is None:
            state.remove()
        else:
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp((last_us // 1_000) + GAP_SECONDS * 1_000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _ in closed
                ],
                "n_events": [c for _, c in closed],
            }
        )


def _write_sliced_backlog(
    events: DataFrame, tmp_dir: str, n_slices: int, gap_seconds: int
) -> str:
    """Materialize events as ``n_slices`` chronological parquet files plus a
    final per-user marker file, mtime-ordered so ``maxFilesPerTrigger=1``
    replays them as an ordered multi-microbatch stream."""
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)
    w = Window.orderBy("ts", "event_id")
    sliced = events.withColumn("slice", F.ntile(n_slices).over(w))
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    marker_ts = max_ts + timedelta(seconds=3 * gap_seconds)

    def emit(df: DataFrame, idx: int) -> None:
        part_dir = os.path.join(tmp_dir, f"w{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = next(
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(stream_dir, f"slice_{idx:03d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_000_000_000 + idx * 10, 1_000_000_000 + idx * 10))

    for i in range(1, n_slices + 1):
        emit(
            sliced.filter(F.col("slice") == i).select(
                "user_id", "event_id", "ts", F.lit(False).alias("is_marker")
            ),
            i,
        )
    emit(
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(None).cast(dict(events.dtypes)["event_id"]).alias("event_id"),
            F.lit(marker_ts).alias("ts"),
            F.lit(True).alias("is_marker"),
        ),
        n_slices + 1,
    )
    return stream_dir


def streaming_user_sessions(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> DataFrame:
    """Run gap-based sessionization as a stateful stream over the ``events``
    backlog and return the emitted sessions as a batch DataFrame —
    (user_id, session_start, n_events), exactly the batch
    ``user_sessions`` result (pinned by tests/test_streaming.py)."""
    from mapreduceindexer_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out_schema = StructType(
        [
            events.schema["user_id"],
            StructField("session_start", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    tmp_dir = tempfile.mkdtemp(prefix="mri_stream_sessions_")
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    try:
        stream_dir = _write_sliced_backlog(events, tmp_dir, n_slices, GAP_SECONDS)
        src = (
            spark.readStream.schema(
                "user_id "
                + dict(events.dtypes)["user_id"]
                + ", event_id "
                + dict(events.dtypes)["event_id"]
                + ", ts timestamp, is_marker boolean"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        sessions = (
            src.withWatermark("ts", "10 minutes")
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn,
                outputStructType=out_schema,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        # Production sink: per-batch append-commits into a transactional
        # table, result = a read of the committed snapshot — no memory
        # sink, no collect (round-6 verdict item; the driver stops being
        # the cardinality ceiling).
        from mapreduceindexer_spark.streaming.table_sink import (
            TransactionalTable,
            read_result,
            run_stream_to_table,
        )

        table = TransactionalTable(os.path.join(tmp_dir, name))
        run_stream_to_table(sessions, table, output_mode="append")
        # localCheckpoint before tmp cleanup deletes the snapshot files.
        return (
            read_result(table, spark, out_schema)
            .select("user_id", "session_start", "n_events")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


__all__ = ["streaming_user_sessions", "GAP_SECONDS"]
