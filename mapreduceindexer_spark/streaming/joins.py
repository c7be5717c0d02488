"""Stream-stream join: watermarked view -> purchase attribution.

The batch twin (``operators/events.view_purchase_attribution``) is the
DuckDB-checked oracle; this module runs the IDENTICAL join condition as a
Structured Streaming stream-stream inner join. The event-time range
constraint plus both watermarks is what makes unbounded state impossible:
Spark derives that a buffered view can be evicted once the purchase-side
watermark passes view_ts + horizon, so state is bounded by (rate x
horizon), not stream length — the requirement for an always-on 100 TB/day
attribution pipeline.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindexer_spark.streaming.windows import _streaming_events


def streaming_attribution(
    spark: SparkSession, sf_dir: str, horizon_min: int = 30
) -> DataFrame:
    src = _streaming_events(spark, sf_dir)
    v = (
        src.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr(f"interval {horizon_min} minutes")
            ),
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("view_ts"))
            .alias("gap_us"),
        )
    )


def run_streaming_attribution(
    spark: SparkSession, sf_dir: str, horizon_min: int = 30
) -> DataFrame:
    """Execute the stream-stream join over the full backlog (availableNow,
    append-mode memory sink) and return the joined rows as a batch frame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_attribution(spark, sf_dir, horizon_min)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # Raise on timeout instead of reading the sink: a partial
        # backlog replay must fail loudly, never return short rows
        # (these queries are value-hash-checked since round 9).
        if not q.awaitTermination(300):
            raise RuntimeError(
                "streaming backlog replay did not finish within 300 s"
            )
    finally:
        q.stop()
    return spark.table(name)
