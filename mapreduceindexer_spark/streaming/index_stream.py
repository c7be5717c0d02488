"""Incremental inverted-index maintenance as a stream.

The reference's entire pipeline (``src/functions.cpp:48-168``) is a batch
build; this module is its Structured Streaming twin: documents arrive in
microbatches, each batch's postings DELTA is built with the normal batch
operator (``operators/index.build_postings``) and merged into the
maintained index state inside ``foreachBatch`` — the ingest-side shape of
a production index that must absorb new documents without re-scanning the
corpus.

Design:

- ``foreachBatch`` is the documented Structured Streaming escape hatch
  for stateful sinks that need arbitrary batch logic; exactly-once comes
  from making the batch body IDEMPOTENT in ``batch_id``: the state
  version for a batch is derived from ``batch_id`` itself (batch N reads
  version vN, overwrites version v(N+1)), so a microbatch retry rebuilds
  the same version from the same unchanged predecessor instead of
  double-merging the delta.
- State is a sequence of versioned BUCKETED-BY-TERM tables
  (``…_v0, _v1, …`` in the session warehouse): merge reads version N,
  merges the delta, writes version N+1. Versioned-table-then-advance is
  the plain-parquet stand-in for a table format's atomic commit
  (Delta/Iceberg at production scale — identical query, transactional
  state).
- Each delta is also written bucketed by term before merging, so the
  merge (``operators/index.merge_postings_colocated``, a full-outer join
  on term) is CO-LOCATED: zero exchanges in the merge plan — the big
  maintained index is never re-shuffled to absorb a delta. Pinned by
  tests/test_streaming.py. The per-batch delta write is the price, and
  it is linear in the delta, not the state.
- The merge identity ``merge(build(A), build(B)) == build(A ∪ B)`` for
  disjoint doc sets (pinned by q_postings_merge's oracle) is what makes
  the incremental result EXACTLY the full rebuild — asserted by the
  regression test for this module.
- The returned DataFrame is BACKED BY the final state table — never
  collected to the driver (at 100 TB the index is cluster-sized). The
  final table outlives this call; intermediate versions and deltas are
  dropped before returning (on timeout too). Callers that want to
  reclaim the state pass ``state_table=[]`` and drop the table name
  appended there (same out-param convention as ``merge_plans``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.index import (
    build_postings,
    merge_postings_colocated,
)


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


def _write_bucketed(df: DataFrame, name: str, n_buckets: int) -> None:
    (
        df.write.bucketBy(n_buckets, "term")
        .sortBy("term")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def streaming_index_build(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 3,
    salt_buckets: int = 4,
    n_buckets: int = 8,
    merge_plans: list | None = None,
    state_table: list | None = None,
) -> DataFrame:
    """Run the incremental index build over a sliced documents backlog and
    return the final postings relation (term, letter, doc_ids, df) — which
    equals the batch ``build_postings`` over the whole corpus.

    The result is backed by a bucketed warehouse table (see module
    docstring) — no driver materialization. ``merge_plans``, if given, is
    appended with the physical plan string of every co-located merge the
    stream performs (used by tests to pin the zero-exchange contract on
    the ACTUAL stream path, not a reconstruction). ``state_table``, if
    given, receives the final state table's name so the caller can DROP
    it when done with the result.
    """
    from mapreduceindexer_spark.plans import explain_str
    from mapreduceindexer_spark.sources.tables import load_table

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = f"mri_stream_index_{uuid.uuid4().hex[:8]}"
    tmp_dir = tempfile.mkdtemp(prefix="mri_stream_index_")
    stream_dir = os.path.join(tmp_dir, "in")
    seen = {"max_version": 0}
    try:
        _write_doc_slices(docs, stream_dir, n_slices)
        schema = "doc_id " + dict(docs.dtypes)["doc_id"] + ", text string"
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )

        def upsert(batch: DataFrame, batch_id: int) -> None:
            # Version derived from batch_id: batch N reads vN, overwrites
            # v(N+1). A foreachBatch RETRY of batch N re-reads the same
            # (unchanged) vN and overwrites the same v(N+1) — idempotent,
            # never a double merge or a skipped/duplicated version.
            bid = int(batch_id)
            ss = batch.sparkSession
            delta = build_postings(batch, salt_buckets=salt_buckets)
            if bid == 0:
                _write_bucketed(delta, f"{prefix}_v1", n_buckets)
            else:
                d_tbl = f"{prefix}_d{bid}"
                _write_bucketed(delta, d_tbl, n_buckets)
                merged = merge_postings_colocated(
                    ss.table(f"{prefix}_v{bid}"), ss.table(d_tbl)
                )
                if merge_plans is not None:
                    merge_plans.append(explain_str(merged, "simple"))
                _write_bucketed(merged, f"{prefix}_v{bid + 1}", n_buckets)
            seen["max_version"] = max(seen["max_version"], bid + 1)

        q = (
            src.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(tmp_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(300)
        finally:
            q.stop()
        n = seen["max_version"]
        if not finished:
            # Partial backlog: drop EVERY version/delta, including the
            # one an interrupted in-flight batch may have written AFTER
            # its _write_bucketed but BEFORE updating the counter
            # (hence n + 1) — a partial index must not outlive the error.
            for v in range(1, n + 2):
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_v{v}")
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_d{v}")
            raise TimeoutError(
                "streaming index build did not finish its backlog within "
                "300 s — refusing to return a partial index"
            )
        if n == 0:  # empty backlog: typed empty postings relation
            return build_postings(docs.limit(0), salt_buckets=salt_buckets)
        # Keep only the final version; drop intermediates and deltas.
        for v in range(1, n):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_v{v}")
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_d{v}")
        if state_table is not None:
            state_table.append(f"{prefix}_v{n}")
        return spark.table(f"{prefix}_v{n}")
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


__all__ = ["streaming_index_build"]
