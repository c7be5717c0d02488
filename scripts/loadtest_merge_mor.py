"""Loadtest: equality-delete vs merge-on-read vs copy-on-write MERGE
(and CDC) write cost (round 12).

The claim merge_rows_mor exists for: an upsert batch touching a few
rows per snapshot dir should cost O(update batch + matched positions)
to WRITE, not O(rows in every may-match dir). On a table whose every
dir overlaps the batch's key range (worst case for the CoW prune), the
CoW merge rewrites the full table while the MOR merge writes one small
vector + the batch. The read tax is measured too (the DV anti-join),
plus bytes written per path, so the trade is recorded honestly.

Run: python scripts/loadtest_merge_mor.py
Results land in PLANS.md by hand (the round-7 loadtest discipline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduceindexer_spark.session import get_spark
from mapreduceindexer_spark.sources.transact import TransactionalTable

N_DIRS = 8
BATCH = 1_000  # upsert rows, spread so every dir is may-match


def build(spark, n_rows: int) -> TransactionalTable:
    """N_DIRS snapshot dirs, each covering the FULL key range
    (id % N_DIRS slicing): range stats prune nothing, so the CoW merge
    must rewrite every dir — the honest worst case both paths face on
    an unclustered table."""
    t = TransactionalTable(tempfile.mkdtemp(prefix="loadtest_mor_"))
    df = spark.range(n_rows).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    for i in range(N_DIRS):
        t.commit(
            df.filter(F.col("id") % N_DIRS == i),
            mode="overwrite" if i == 0 else "append",
            stats_cols=["id"],
        )
    return t


def updates_for(spark, n_rows: int):
    step = max(1, n_rows // BATCH)
    return (
        spark.range(0, n_rows, step)
        .withColumn(
            "payload",
            F.md5(F.concat(F.lit("v2"), F.col("id").cast("string"))),
        )
        .localCheckpoint()
    )


def tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def cdc_changes_for(spark, n_rows: int):
    """The CDC twin of ``updates_for``: same 1k spread keys, every
    other one a tombstone (payload NULL) and the rest upserts — the
    Debezium trickle shape both apply_cdc paths must handle."""
    step = max(1, n_rows // BATCH)
    return (
        spark.range(0, n_rows, step)
        .select(
            F.col("id"),
            F.when(
                F.col("id") % (2 * step) == 0, F.lit(None).cast("string")
            )
            .otherwise(
                F.md5(F.concat(F.lit("v2"), F.col("id").cast("string")))
            )
            .alias("payload"),
            (F.col("id") % (2 * step) == 0).alias("_deleted"),
        )
        .localCheckpoint()
    )


def main() -> None:
    spark = get_spark(app_name="loadtest_merge_mor")
    for n_rows in (100_000, 1_000_000):
        upd = updates_for(spark, n_rows)
        out = {"op": "merge", "rows": n_rows, "batch": upd.count(),
               "dirs": N_DIRS}
        for label, method in (
            ("eq", "upsert_eq"),
            ("mor", "merge_rows_mor"),
            ("cow", "merge_rows"),
        ):
            t = build(spark, n_rows)
            before = tree_bytes(t.path)
            t0 = time.perf_counter()
            v = getattr(t, method)(spark, upd, "id", stats_cols=["id"])
            out[f"{label}_write_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{label}_bytes_written"] = tree_bytes(t.path) - before
            t0 = time.perf_counter()
            out[f"{label}_read_rows"] = t.read(spark, v).count()
            out[f"{label}_read_sec"] = round(time.perf_counter() - t0, 3)
            shutil.rmtree(t.path, ignore_errors=True)
        assert (
            out["eq_read_rows"]
            == out["mor_read_rows"]
            == out["cow_read_rows"]
            == n_rows
        )
        print(json.dumps(out), flush=True)

        # CDC twin (round 12): half tombstones, half upserts; the MOR
        # path kills every change key's positions via one vector and
        # appends only live rows. Final row count = n_rows - tombstone
        # count on both paths (tombstoned keys vanish).
        ch = cdc_changes_for(spark, n_rows)
        n_tomb = ch.filter("_deleted").count()
        out = {"op": "cdc", "rows": n_rows, "batch": ch.count(),
               "tombstones": n_tomb, "dirs": N_DIRS}
        for label, method in (("mor", "apply_cdc_mor"), ("cow", "apply_cdc")):
            t = build(spark, n_rows)
            before = tree_bytes(t.path)
            t0 = time.perf_counter()
            v = getattr(t, method)(spark, ch, "id", stats_cols=["id"])
            out[f"{label}_write_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{label}_bytes_written"] = tree_bytes(t.path) - before
            t0 = time.perf_counter()
            out[f"{label}_read_rows"] = t.read(spark, v).count()
            out[f"{label}_read_sec"] = round(time.perf_counter() - t0, 3)
            shutil.rmtree(t.path, ignore_errors=True)
        assert out["mor_read_rows"] == out["cow_read_rows"] == n_rows - n_tomb
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
