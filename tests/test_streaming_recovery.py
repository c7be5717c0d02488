"""Checkpoint recovery + exactly-once sink: the fault-tolerance contract.

A watermarked streaming aggregation is run over half the backlog, STOPPED,
then restarted from its checkpoint over the rest. The parquet sink must
end up with exactly the batch answer — every window once, none duplicated,
none lost — which is precisely Spark's checkpointed exactly-once claim,
pinned here as a test.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

FLUSH = "__flush"


def _write_slice(df, stream_dir: str, idx: int, tmp: str) -> None:
    part_dir = os.path.join(tmp, f"w{idx}")
    df.coalesce(1).write.mode("overwrite").parquet(part_dir)
    src = next(
        os.path.join(part_dir, f)
        for f in os.listdir(part_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    dst = os.path.join(stream_dir, f"slice_{idx:03d}.parquet")
    os.replace(src, dst)
    os.utime(dst, (1_000_000_000 + idx * 10, 1_000_000_000 + idx * 10))


def _run_stream(spark, stream_dir: str, out_dir: str, ckpt_dir: str) -> None:
    src = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,10)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    from datetime import timedelta

    from mapreduceindexer_spark.sources.tables import load_table

    events = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    from pyspark.sql import Window

    sliced = events.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts", "event_type", "value"))
    )
    stream_dir = str(tmp_path / "stream")
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)

    # Phase A: half the backlog, then STOP (simulated failure point).
    for i in (1, 2):
        _write_slice(
            sliced.filter(F.col("slice") == i).drop("slice"), stream_dir, i, str(tmp_path)
        )
    _run_stream(spark, stream_dir, out_dir, ckpt_dir)

    # Phase B: rest of the backlog + a far-future flush row (pushes the
    # watermark past every real window), restart from the SAME checkpoint.
    for i in (3, 4):
        _write_slice(
            sliced.filter(F.col("slice") == i).drop("slice"), stream_dir, i, str(tmp_path)
        )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [(max_ts + timedelta(days=2), FLUSH, 0.0)], "ts timestamp, event_type string, value double"
    )
    _write_slice(flush, stream_dir, 5, str(tmp_path))
    _run_stream(spark, stream_dir, out_dir, ckpt_dir)

    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out_dir)
        .filter(F.col("event_type") != FLUSH)
        .collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.round(
                    F.sum(F.col("value").cast("decimal(38,10)")).cast("double"), 4
                ).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
            )
            .collect()
        )
    }
    # Exactly-once: no window lost across the restart, none duplicated.
    n_rows = (
        spark.read.parquet(out_dir).filter(F.col("event_type") != FLUSH).count()
    )
    assert n_rows == len(got), "duplicate (window, type) rows in sink"
    assert got == want


def test_manifest_commit_survives_kill_mid_batch(spark, tmp_path):
    """Crash-consistency of the manifest-atomic index state: a failure
    injected in the EXACT window the old version-counter protocol could
    not close (version table written, manifest not yet renamed) must
    (a) leave the previous committed version current, (b) leave no orphan
    tables after recovery, and (c) resume idempotently to a final index
    equal to the batch rebuild."""
    import pytest

    from mapreduceindexer_spark.operators.index import build_postings
    from mapreduceindexer_spark.sources.tables import load_table
    from mapreduceindexer_spark.streaming.index_stream import (
        read_manifest,
        recover_index_state,
        streaming_index_build,
    )
    from tests.conftest import SF_SMOKE

    state_dir = str(tmp_path / "idx_state")
    prefix = "mri_crash_test_idx"

    # Crash in batch 1 (the first MERGE batch) after its v2 table write,
    # before the manifest rename.
    with pytest.raises(Exception, match="injected crash"):
        streaming_index_build(
            spark,
            SF_SMOKE,
            n_slices=3,
            state_dir=state_dir,
            prefix=prefix,
            fail_after_write_batch=1,
        )

    # (a) The manifest still points at v1 — the version committed by
    # batch 0; the half-done v2 never became current.
    manifest = read_manifest(state_dir)
    assert manifest is not None
    assert manifest["version"] == 1 and manifest["table"] == f"{prefix}_v1"
    # (b) No orphans: the failure path already ran recovery; every
    # prefix-named table in the warehouse is manifest-referenced.
    live = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(prefix)
    ]
    assert sorted(live) == sorted(manifest["tables"]), live
    # recover_index_state is idempotent on a clean state.
    assert recover_index_state(spark, state_dir, prefix) == 1

    # (c) Resume with the same (state_dir, prefix): the checkpoint skips
    # batch 0, replays batch 1 against committed v1, and finishes.
    state_tables: list[str] = []
    result = streaming_index_build(
        spark,
        SF_SMOKE,
        n_slices=3,
        state_dir=state_dir,
        prefix=prefix,
        state_table=state_tables,
    )
    got = {r.term: (r.letter, list(r.doc_ids), r.df) for r in result.collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    want = {
        r.term: (r.letter, list(r.doc_ids), r.df)
        for r in build_postings(docs, salt_buckets=4).collect()
    }
    assert got == want
    # Final state: exactly one live table (the final version), manifest
    # narrowed to it.
    manifest = read_manifest(state_dir)
    assert manifest["tables"] == [manifest["table"]]
    live = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(prefix)
    ]
    assert live == [manifest["table"]], live
    for t in state_tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_rocksdb_kernel_state_survives_query_restart(spark, tmp_path):
    """RESTART RECOVERY for the round-11 state-store surfaces: the
    Python stateful kernel (applyInPandasWithState, the q_tws_totals
    path here) runs on the RocksDB provider over HALF the backlog, the
    query STOPS, the rest of the backlog arrives, and a NEW query run
    resumes from the same checkpoint. The raw RocksDB state read back
    through the statestore source must equal the batch aggregate over
    the WHOLE backlog — state written by run 1 was reloaded from
    RocksDB files by run 2 and folded exactly once (the complement of
    test_checkpoint_restart_is_exactly_once, which pins the native-agg
    + parquet-sink path)."""
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    from mapreduceindexer_spark.sources.tables import load_table
    from mapreduceindexer_spark.streaming.stateinspect import (
        read_aggregation_state,
    )
    from mapreduceindexer_spark.streaming.twstate import (
        OUT_SCHEMA,
        STATE_SCHEMA,
        _apws_totals_fn,
        _rocksdb_provider,
        _write_sliced_events,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "value"
    )
    stream_dir = _write_sliced_events(events, str(tmp_path), 4)
    side = str(tmp_path / "held_back")
    os.makedirs(side)
    held = ["slice_003.parquet", "slice_004.parquet"]
    for f in held:
        shutil.move(os.path.join(stream_dir, f), os.path.join(side, f))
    ckpt = str(tmp_path / "ckpt")

    def run_query() -> None:
        src = (
            spark.readStream.schema(
                "user_id bigint, event_id bigint, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        totals = src.groupBy("user_id").applyInPandasWithState(
            _apws_totals_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            totals.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()

    with _rocksdb_provider(spark):
        run_query()  # slices 1-2 only
        for f in held:  # the rest of the backlog arrives
            dst = os.path.join(stream_dir, f)
            shutil.move(os.path.join(side, f), dst)
            os.utime(dst)
        run_query()  # restart from the SAME checkpoint

    state = read_aggregation_state(spark, ckpt).select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.n").alias("n"),
        F.col("value.groupState.s").alias("s"),
    )
    scaled = (
        F.col("value").cast("decimal(18,6)")
        * F.lit(1_000_000).cast("decimal(7,0)")
    ).cast("bigint")
    # Coalesce: a group whose every value is dropped (NULL/NaN/overflow)
    # sums to NULL in batch but accumulates s=0 in the kernel's state —
    # the twin must model the kernel's zero-start, or a future data
    # change would read as a recovery bug (r11 third review).
    batch = events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.coalesce(F.sum(scaled), F.lit(0)).alias("s"),
    )
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, batch.collect())
    )
