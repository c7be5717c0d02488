"""Streaming CONSUMPTION of the transactional table: a Structured
Streaming query whose SOURCE is the table's commit log
(``sources/table_stream.py``, ``format("mri_table")``) — the read-side
twin of ``streaming/table_sink.py``. The table is committed in three
append slices; the stream materializes each appended dir as its own
input partition, exactly the incremental feed a downstream training-
data job would tail. Values are fully deterministic (the stream
transports every committed row exactly once — offsets are durable
table versions), so unlike the stateful-sink stream queries this one
is ORACLE-BACKED: the per-language aggregate of the streamed rows must
equal the same aggregate computed by DuckDB over the source parquet.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_table_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, total_chars) of the documents table, transported
    through commit-log streaming: three transactional appends, one
    ``mri_table`` stream draining them (availableNow), aggregated from
    the sink. Returns a materialized DataFrame."""
    from mapreduceindexer_spark.sources.table_stream import (
        register_table_stream_source,
    )
    from mapreduceindexer_spark.sources.transact import TransactionalTable

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tmp_dir = tempfile.mkdtemp(prefix="mri_table_feed_")
    try:
        table = TransactionalTable(os.path.join(tmp_dir, "docs"))
        n = docs.count()
        b1, b2 = n // 3, (2 * n) // 3
        table.commit(docs.filter(F.col("doc_id") < b1), stats_cols=["doc_id"])
        table.commit(
            docs.filter((F.col("doc_id") >= b1) & (F.col("doc_id") < b2)),
            mode="append",
            stats_cols=["doc_id"],
        )
        table.commit(
            docs.filter(F.col("doc_id") >= b2),
            mode="append",
            stats_cols=["doc_id"],
        )
        register_table_stream_source(spark)
        sink = os.path.join(tmp_dir, "sink")
        q = (
            spark.readStream.format("mri_table")
            .option("path", table.path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(tmp_dir, "cp"))
            .queryName(f"table_feed_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise RuntimeError(
                    "table-feed stream did not finish within 300 s"
                )
        finally:
            q.stop()
        return (
            spark.read.parquet(sink)
            .groupBy("lang")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
            .localCheckpoint()  # materialize before tmp cleanup
        )
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
