"""Structured Streaming window aggregations over the ``events`` table.

Same logical shapes as ``operators/events.py`` (the batch twins that the
DuckDB oracle checks), expressed against a ``readStream`` source with a
watermark. Batch/stream parity is the design point: Structured Streaming
runs the identical ``groupBy(window(...))`` plan incrementally, so a
correct batch query IS the streaming query — only the source/sink and the
watermark policy differ.

Scale notes:

- the watermark bounds state: hourly windows + 2h watermark keep at most
  ~3 windows of partial aggregates per key in the state store, regardless
  of stream length;
- ``availableNow`` trigger processes a backlog as a bounded stream with
  the same state-machine semantics — the pattern for backfill jobs;
- sinks at 100 TB would be kafka/delta; the memory sink here is for tests
  and the driver's rows-only check.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as a file stream. The parquet stores ts as TIMESTAMP(NANOS)
    (read as long + truncated to µs, exactly like the batch loader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")  # schema only
    # The file-stream source requires a directory basePath; point it at the
    # sf dir and glob-filter to the events file.
    src = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(src.dtypes).get("ts")
    if ts_type == "bigint":
        src = src.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type == "timestamp_ntz":
        # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
        # TIMESTAMP_NTZ; withWatermark() requires TimestampType. Session tz
        # is pinned UTC (sources/tables.py), so the cast is wall-clock
        # preserving — identical instants to the batch loader's handling.
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-hour tumbling counts/sums with a 2-hour watermark —
    the incremental twin of ``operators/events.tumbling_hourly``."""
    src = _streaming_events(spark, sf_dir)
    return (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            # Decimal-first rounding, matching relational._dsum (the batch
            # twin): double-side ROUND is engine/path-dependent at halves.
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def streaming_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-hour windows sliding every 30 minutes, 2-hour watermark —
    the incremental twin of ``operators/events.sliding_hourly``. Each event
    lands in 2 overlapping windows; watermark bounds state to ~5 open
    windows per key."""
    src = _streaming_events(spark, sf_dir)
    return (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def run_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the sliding-window stream over the full backlog (availableNow
    + complete-mode memory sink) and return the result as a batch frame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_sliding_hourly(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
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


def run_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the streaming aggregation over the full backlog
    (``availableNow`` + complete-mode memory sink) and return the result
    as a batch DataFrame — used by the harness's rows-only check and by
    the batch-vs-stream parity test."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_tumbling_hourly(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
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


__all__ = [
    "streaming_tumbling_hourly",
    "run_streaming_tumbling",
    "streaming_sliding_hourly",
    "run_streaming_sliding",
    "streaming_dedup",
    "run_streaming_dedup",
]


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: ``dropDuplicatesWithinWatermark`` on
    the event key — the ingest-side dedup an at-least-once transport (kafka
    replays, retried batches) makes mandatory for a training-data feed.

    The source is doubled (each event emitted twice) to simulate replay;
    the watermark bounds dedup state to the 2-hour horizon, so state size
    tracks the duplication window, not stream length — the property that
    lets this run forever at 100 TB/day.
    """
    src = _streaming_events(spark, sf_dir)
    replayed = src.withColumn(
        "copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("copy")
    return replayed.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the streaming dedup over the full (doubled) backlog and
    return the deduplicated rows as a batch DataFrame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_dedup(spark, sf_dir)
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
