"""REPx load test for the round-10 stateful-state surfaces — the
"billions of keys" claim behind q_tws_totals / q_state_reader, measured.

Both queries maintain per-user state on the RocksDB state store
provider across a multi-microbatch replay. What must scale is the KEY
COUNT: replicas offset user_id into disjoint ranges, so Nx replicas =
Nx live state keys with the same per-key update density. Expected
linear-ish: the stream's per-batch cost is (rows in batch) hash-agg
updates + state-store point writes; the statestore read back is one
scan of the final store.

Usage: python scripts/loadtest_state_store.py [REP] (default 50);
JSON lines to stdout. Harness: scripts/_loadtest_common.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure, stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="state-loadtest")

    big = stage_dir(src, "events", "stateload_")
    ev = spark.read.parquet(f"{src}/events.parquet")
    reps = spark.range(rep).select(F.col("id").alias("r"))
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("r") * 100_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("r") * 10_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(64).write.mode("overwrite").parquet(f"{big}/events.parquet")
    emit(stage="replicate_events", rep=rep)

    measure(spark, "q_state_reader", src, big, rep, rows_key="keys")
    measure(spark, "q_tws_totals", src, big, rep, rows_key="keys")

    spark.stop()


if __name__ == "__main__":
    main()
