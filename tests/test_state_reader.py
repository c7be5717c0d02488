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
