"""Streaming sketch maintenance: per-key HyperLogLog registers as
stream state, advanced incrementally across microbatches with
``applyInPandasWithState``.

The batch engine builds HLL registers open-box (catalog ``q_hll`` /
``q_hll_merge``: bucket = low bits of the portable hash, rho = first-set
-bit rank, register = max(rho) per bucket). This module maintains the
SAME registers on a stream: the hash/bucket/rho columns are computed
with the identical Spark expressions *before* the stateful operator (so
the stream and batch share one definition), and the state machine per
key is elementwise ``max`` over a 256-long register array — O(m) state
per key regardless of stream length, the mergeability that makes HLL
the standard sketch for distributed distinct counts applied in time
rather than in space.

End-of-backlog markers (one per key, in a final mtime-ordered slice)
flush the register state as rows, so the bounded replay emits exactly
the batch-built registers — pinned bit-for-bit by
tests/test_streaming.py. On an unbounded stream the flush would instead
be periodic emission (update mode); the state transition is identical.

Reference has no streaming surface; north-star extension coverage
(SURVEY §2.3 streaming family + sketches tier).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HLL_M = 256

STATE_SCHEMA = StructType([StructField("regs", ArrayType(LongType()))])
OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", LongType()),
        StructField("rho", LongType()),
    ]
)


def hll_columns(df: DataFrame, value_col: str) -> DataFrame:
    """(event_type, bucket, rho) from ``value_col`` — the SAME portable
    hash60 / low-bits bucket / first-set-bit rho definition as the batch
    q_hll family (functions/hashing.py), computed as Spark expressions
    so stream and batch cannot drift."""
    from mapreduceindexer_spark.functions.hashing import hash60, hll_bucket_rho

    bucket, rho = hll_bucket_rho("_mri_h", HLL_M)
    return (
        df.withColumn("_mri_h", hash60(F.col(value_col).cast("string")))
        .select(
            "event_type",
            bucket.cast("long").alias("bucket"),
            rho.cast("long").alias("rho"),
        )
    )


def _hll_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    flush = False
    for pdf in pdfs:
        for bucket, rho, marker in zip(
            pdf["bucket"], pdf["rho"], pdf["is_marker"]
        ):
            if bool(marker):
                flush = True
                continue
            b, r = int(bucket), int(rho)
            if r > regs[b]:
                regs[b] = r
    if flush:
        state.remove()
        nz = [(b, r) for b, r in enumerate(regs) if r > 0]
        if nz:
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(nz),
                    "bucket": [b for b, _ in nz],
                    "rho": [r for _, r in nz],
                }
            )
    else:
        state.update((regs,))


def hll_registers_batch(events: DataFrame, value_col: str = "user_id") -> DataFrame:
    """Batch twin: (event_type, bucket, rho) register relation — what the
    stream's end state must equal exactly."""
    return (
        hll_columns(events, value_col)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def streaming_hll_registers(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> DataFrame:
    """Maintain per-event-type HLL registers over the sliced events
    backlog replayed as a multi-microbatch stream; returns the flushed
    register rows (event_type, bucket, rho) as a batch DataFrame."""
    from mapreduceindexer_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    tmp_dir = tempfile.mkdtemp(prefix="mri_stream_hll_")
    try:
        return _run_hll_stream(spark, events, tmp_dir, n_slices)
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


def _run_hll_stream(spark, events, tmp_dir, n_slices):
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)

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

    # Slice on the DETERMINISTIC (ts, event_id) key — ntile over
    # monotonically_increasing_id is recomputed independently per write
    # action and can move a row between slices mid-run, silently
    # dropping a register update (review finding; cdc_stream.py slices
    # the same way).
    w = Window.orderBy("ts", "event_id")
    sliced = events.withColumn("slice", F.ntile(n_slices).over(w))
    for i in range(1, n_slices + 1):
        emit(
            hll_columns(
                sliced.filter(F.col("slice") == i), "user_id"
            ).select(
                "event_type", "bucket", "rho", F.lit(False).alias("is_marker")
            ),
            i,
        )
    emit(
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.lit(0).cast("long").alias("bucket"),
            F.lit(0).cast("long").alias("rho"),
            F.lit(True).alias("is_marker"),
        ),
        n_slices + 1,
    )

    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    src = (
        spark.readStream.schema(
            "event_type string, bucket long, rho long, is_marker boolean"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    regs = src.groupBy("event_type").applyInPandasWithState(
        _hll_state_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # Production sink: per-batch append-commits into a transactional
    # table, result = a read of the committed snapshot — no memory sink,
    # no collect (round-6 verdict item). The timeout-raises discipline
    # (a partial replay must never pass for final registers) lives in
    # run_stream_to_table.
    from mapreduceindexer_spark.streaming.table_sink import (
        TransactionalTable,
        read_result,
        run_stream_to_table,
    )

    table = TransactionalTable(os.path.join(tmp_dir, name))
    run_stream_to_table(regs, table, output_mode="append")
    return (
        read_result(table, spark, OUT_SCHEMA)
        .select("event_type", "bucket", "rho")
        .localCheckpoint()
    )
