"""Incremental inverted-index maintenance as a stream.

The reference's entire pipeline (``src/functions.cpp:48-168``) is a batch
build; this module is its Structured Streaming twin: documents arrive in
microbatches, each batch's postings DELTA is built with the normal batch
operator (``operators/index.build_postings``) and merged into the
maintained index state with ``operators/index.merge_postings`` inside
``foreachBatch`` — the ingest-side shape of a production index that must
absorb new documents without re-scanning the corpus.

Design:

- ``foreachBatch`` is the documented Structured Streaming escape hatch
  for stateful sinks that need arbitrary batch logic: each invocation is
  a normal batch job with exactly-once semantics per microbatch id.
- State is a versioned parquet directory (``v0, v1, …``): merge reads
  version N, merges the delta (ONE shuffle on term), writes version N+1.
  Versioned-dir-then-swap is the plain-parquet stand-in for a table
  format's atomic commit (Delta/Iceberg at production scale — identical
  query, transactional state).
- The merge identity ``merge(build(A), build(B)) == build(A ∪ B)`` for
  disjoint doc sets (pinned by q_postings_merge's oracle) is what makes
  the incremental result EXACTLY the full rebuild — asserted by the
  regression test for this module.
- At 100 TB both sides of the merge are bucketed by term, making the
  merge co-located (zero shuffle; see tests/test_bucketing.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.index import build_postings, merge_postings


def _write_doc_slices(docs: DataFrame, stream_dir: str, n_slices: int) -> None:
    """Materialize documents as n_slices parquet files (doc_id-range
    sliced, mtime-ordered) so ``maxFilesPerTrigger=1`` replays them as an
    ordered multi-microbatch stream."""
    os.makedirs(stream_dir, exist_ok=True)
    bounds = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    lo, hi = bounds[0], bounds[1]
    span = (hi - lo + 1 + n_slices - 1) // n_slices
    for i in range(n_slices):
        part = docs.filter(
            (F.col("doc_id") >= lo + i * span) & (F.col("doc_id") < lo + (i + 1) * span)
        )
        tmp = os.path.join(stream_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            os.path.join(tmp, f)
            for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(stream_dir, f"slice_{i:03d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))


def streaming_index_build(
    spark: SparkSession, sf_dir: str, n_slices: int = 3, salt_buckets: int = 4
) -> DataFrame:
    """Run the incremental index build over a sliced documents backlog and
    return the final postings relation (term, letter, doc_ids, df) — which
    equals the batch ``build_postings`` over the whole corpus."""
    from mapreduceindexer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp_dir = tempfile.mkdtemp(prefix="mri_stream_index_")
    stream_dir = os.path.join(tmp_dir, "in")
    state_dir = os.path.join(tmp_dir, "state")
    os.makedirs(state_dir)
    try:
        _write_doc_slices(docs, stream_dir, n_slices)
        schema = "doc_id " + dict(docs.dtypes)["doc_id"] + ", text string"
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        versions = {"n": 0}

        def upsert(batch: DataFrame, batch_id: int) -> None:
            delta = build_postings(batch, salt_buckets=salt_buckets)
            n = versions["n"]
            if n == 0:
                merged = delta
            else:
                prev = batch.sparkSession.read.parquet(
                    os.path.join(state_dir, f"v{n}")
                )
                merged = merge_postings(prev, delta)
            merged.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"v{n + 1}")
            )
            versions["n"] = n + 1

        q = (
            src.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(tmp_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        final = spark.read.parquet(os.path.join(state_dir, f"v{versions['n']}"))
        # Materialize before the backing tmp dir is deleted.
        return spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


__all__ = ["streaming_index_build"]
