"""State-store reader (Spark 4 ``statestore`` data source): offline
inspection of a Structured Streaming query's checkpointed state.

Why this is a first-class surface and not a debugging trick: at
production scale the state store IS the database a streaming pipeline
maintains (session machines, running totals, the incremental index's
merge state), and operating it needs the same auditability as any
table — is the state growing without bound? is one grouping key hot? did
the last deploy corrupt a value? The ``statestore`` source answers those
with a plain batch DataFrame over the checkpoint — no stream restart, no
state-machine surgery.

Scale notes: the source reads the state files for ONE (operator, store)
of the checkpoint's latest (or a chosen) batch; rows come back
partitioned exactly as the state is (``partition_id`` column), so the
skew census below is a faithful picture of hot-key concentration in the
actual store, not a resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_aggregation_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """State of a streaming aggregation as ``(key struct, value struct,
    partition_id)`` — one row per live grouping key. ``batch_id`` pins a
    historical batch (default: latest committed)."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint_dir)


def state_skew_census(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition state population: (partition_id, n_keys) — the
    hot-partition meter for a running stateful query. A healthy store
    spreads keys ~uniformly; one partition holding an outsized share
    means a skewed grouping key and is the signal to salt or re-key."""
    return (
        read_aggregation_state(spark, checkpoint_dir, operator_id=operator_id)
        .groupBy("partition_id")
        .agg(F.count("*").cast("bigint").alias("n_keys"))
    )
