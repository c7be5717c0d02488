"""statestore data source (Spark 4): a streaming aggregation's
checkpointed state, read back as a batch DataFrame, must equal the batch
twin of the same aggregation — state IS the incremental result."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _run_bounded_stream(spark, tmp_path, name: str):
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "events.jsonl"), "w") as fh:
        for i in range(40):
            fh.write(json.dumps({"user": i % 5, "v": i}) + "\n")
    ckpt = str(tmp_path / "ckpt")
    agg = (
        spark.readStream.schema("user bigint, v bigint")
        .json(src)
        .groupBy("user")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = (
        spark.read.schema("user bigint, v bigint")
        .json(src)
        .groupBy("user")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    return ckpt, batch


def test_state_reader_equals_batch_aggregate(spark, tmp_path):
    from mapreduceindexer_spark.streaming.stateinspect import (
        read_aggregation_state,
    )

    ckpt, batch = _run_bounded_stream(spark, tmp_path, "state_reader_t1")
    st = read_aggregation_state(spark, ckpt).select(
        F.col("key.user").alias("user"),
        F.col("value.count").alias("n"),
        F.col("value.sum").alias("s"),
    )
    assert sorted(map(tuple, st.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_state_skew_census_covers_all_keys(spark, tmp_path):
    from mapreduceindexer_spark.streaming.stateinspect import (
        state_skew_census,
    )

    ckpt, batch = _run_bounded_stream(spark, tmp_path, "state_reader_t2")
    census = state_skew_census(spark, ckpt).collect()
    assert sum(r["n_keys"] for r in census) == batch.count()
    assert all(r["n_keys"] >= 0 for r in census)


def test_state_reader_time_travels_to_earlier_batch(spark, tmp_path):
    """State TIME TRAVEL: reading the store at an earlier batchId must
    equal the batch aggregate of exactly the files that had arrived by
    that batch — checkpointed state is versioned history, not just the
    latest snapshot (the audit surface for "did batch N corrupt the
    store?")."""
    from mapreduceindexer_spark.streaming.stateinspect import (
        read_aggregation_state,
    )

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for b in range(2):
        with open(os.path.join(src, f"slice_{b}.jsonl"), "w") as fh:
            for i in range(20):
                fh.write(json.dumps({"user": i % 4, "v": b * 100 + i}) + "\n")
        # mtime-order the slices so maxFilesPerTrigger=1 replays them
        # as two microbatches in a fixed order.
        os.utime(
            os.path.join(src, f"slice_{b}.jsonl"),
            (1_000_000_000 + b * 10, 1_000_000_000 + b * 10),
        )
    ckpt = str(tmp_path / "ckpt")
    agg = (
        spark.readStream.schema("user bigint, v bigint")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .groupBy("user")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def batch_twin(paths):
        return (
            spark.read.schema("user bigint, v bigint")
            .json(paths)
            .groupBy("user")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )

    def state_rows(batch_id=None):
        st = read_aggregation_state(spark, ckpt, batch_id=batch_id).select(
            F.col("key.user").alias("user"),
            F.col("value.count").alias("n"),
            F.col("value.sum").alias("s"),
        )
        return sorted(map(tuple, st.collect()))

    # Batch 0 state == aggregate of slice 0 alone; latest == both.
    want0 = sorted(
        map(tuple, batch_twin([os.path.join(src, "slice_0.jsonl")]).collect())
    )
    want_all = sorted(map(tuple, batch_twin([src]).collect()))
    assert state_rows(batch_id=0) == want0
    assert state_rows() == want_all
    assert want0 != want_all  # the travel actually distinguishes batches
