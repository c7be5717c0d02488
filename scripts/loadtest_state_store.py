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

KEY-CARDINALITY phase (round-11, verdict item 5): the REPx phase
scales ROWS with a fixed per-key density; the claim that needs its own
number is live KEY COUNT on RocksDB. ``--keys N`` (default ladder
100k → 1M when passed without a value) synthesizes an events backlog
with N DISTINCT user_ids (2 events per key, split across microbatches
so every key's state is written in one batch and UPDATED in another),
then times (a) the shared Python kernel via
streaming_user_totals_apws(rocksdb=True) — exactly q_tws_totals' path
here — and (b) the native JVM streaming agg + statestore read back —
q_state_reader's path. Reported: wall seconds and keys/sec.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure, stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402


def _stage_synthetic_events(spark, src: str, n_keys: int) -> str:
    """A staged sf-dir whose events table has ``n_keys`` distinct
    user_ids, 2 events per key, event_ids interleaved so the default
    4-slice replay writes each key's state in one microbatch and
    updates it in a later one (cross-batch RocksDB point updates, not
    one bulk insert)."""
    import time as _time

    big = stage_dir(src, "events", f"stateload_keys{n_keys}_")
    base = spark.range(n_keys).select(F.col("id").alias("user_id"))
    first = base.select(
        F.col("user_id").alias("event_id"),  # slices 1-2: first touch
        "user_id",
        (F.col("user_id") % 97).cast("double").alias("value"),
    )
    second = base.select(
        (F.col("user_id") + n_keys).alias("event_id"),  # slices 3-4
        "user_id",
        ((F.col("user_id") + 13) % 89).cast("double").alias("value"),
    )
    t0 = _time.perf_counter()
    first.unionAll(second).repartition(32).write.mode("overwrite").parquet(
        f"{big}/events.parquet"
    )
    emit(
        stage="synthesize_keys",
        keys=n_keys,
        sec=round(_time.perf_counter() - t0, 2),
    )
    return big


def keys_phase(
    spark, src: str, n_keys: int, bundled_only: bool = False
) -> None:
    """Time the state-store surfaces at ``n_keys`` live RocksDB keys.
    ``bundled_only`` skips the slow per-key kernel (its 100k/1M numbers
    are already on record) and measures just the bundled kernel +
    native path."""
    import time as _time

    from mapreduceindexer_spark.streaming.stateinspect import (
        streaming_totals_state,
    )
    from mapreduceindexer_spark.streaming.twstate import (
        streaming_user_totals_apws,
        streaming_user_totals_bundled,
    )

    big = _stage_synthetic_events(spark, src, n_keys)
    if not bundled_only:
        t0 = _time.perf_counter()
        n = streaming_user_totals_apws(
            spark, big, n_slices=4, rocksdb=True
        ).count()
        dt = _time.perf_counter() - t0
        assert n == n_keys, (n, n_keys)
        emit(
            query="tws_kernel_rocksdb",
            keys=n_keys,
            sec=round(dt, 2),
            keys_per_sec=int(n_keys / dt),
        )
    # The r12 state-bundled kernel: bucket-keyed array state, dial
    # n_buckets ~ keys/1000 (see twstate._apws_bundled_fn docstring).
    n_buckets = max(64, n_keys // 1000)
    t0 = _time.perf_counter()
    n = streaming_user_totals_bundled(
        spark, big, n_slices=4, n_buckets=n_buckets, rocksdb=True
    ).count()
    dt = _time.perf_counter() - t0
    assert n == n_keys, (n, n_keys)
    emit(
        query="tws_kernel_bundled_rocksdb",
        keys=n_keys,
        buckets=n_buckets,
        sec=round(dt, 2),
        keys_per_sec=int(n_keys / dt),
    )
    t0 = _time.perf_counter()
    n = streaming_totals_state(spark, big, n_slices=4).count()
    dt = _time.perf_counter() - t0
    assert n == n_keys, (n, n_keys)
    emit(
        query="native_agg_state_read_rocksdb",
        keys=n_keys,
        sec=round(dt, 2),
        keys_per_sec=int(n_keys / dt),
    )


def main() -> None:
    if "--keys" in sys.argv:
        i = sys.argv.index("--keys")
        ladder = (
            [int(sys.argv[i + 1])]
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("--")
            else [100_000, 1_000_000]
        )
        src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        spark = get_spark(app_name="state-keys-loadtest")
        for n_keys in ladder:
            keys_phase(
                spark, src, n_keys, bundled_only="--bundled" in sys.argv
            )
        spark.stop()
        return
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
