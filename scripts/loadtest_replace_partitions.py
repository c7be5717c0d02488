"""Loadtest: partition-level replace cost vs table size (round 8).

The claim replace_partitions exists for: a maintenance batch touching a
FIXED set of partitions costs the same whether the untouched remainder
is 10x or 100x bigger — the write is O(delta), where the pre-round-8
whole-table overwrite was O(table). This script measures both paths on
a synthetic cell-partitioned relation at two scales and prints one JSON
line per (scale, path).

Run: python scripts/loadtest_replace_partitions.py
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

N_CELLS = 50
TOUCHED = [3, 17]


def build(spark, n_rows: int) -> TransactionalTable:
    df = (
        spark.range(n_rows)
        .withColumn("cell", (F.col("id") % N_CELLS).cast("bigint"))
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    t = TransactionalTable(tempfile.mkdtemp(prefix="loadtest_repl_"))
    t.commit_partitioned(spark, df, "cell", stats_cols=["id"])
    return t


def updates_for(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .withColumn("cell", (F.col("id") % N_CELLS).cast("bigint"))
        .filter(F.col("cell").isin(TOUCHED))
        .withColumn(
            "payload", F.md5(F.concat(F.lit("v2"), F.col("id").cast("string")))
        )
    )


def main() -> None:
    spark = get_spark(app_name="loadtest_replace_partitions")
    for n_rows in (100_000, 1_000_000):
        upd = updates_for(spark, n_rows).localCheckpoint()
        # O(delta) path: replace only the touched partitions.
        t = build(spark, n_rows)
        t0 = time.perf_counter()
        t.replace_partitions(spark, upd, TOUCHED, stats_cols=["id"])
        dt_replace = time.perf_counter() - t0
        # Legacy path: read-everything + overwrite-everything.
        t2 = build(spark, n_rows)
        t0 = time.perf_counter()
        kept = t2.read(spark).filter(~F.col("cell").isin(TOUCHED))
        t2.commit(kept.unionByName(upd), mode="overwrite")
        dt_rewrite = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "rows": n_rows,
                    "cells": N_CELLS,
                    "touched": len(TOUCHED),
                    "replace_sec": round(dt_replace, 3),
                    "full_rewrite_sec": round(dt_rewrite, 3),
                }
            ),
            flush=True,
        )
        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(t2.path, ignore_errors=True)


if __name__ == "__main__":
    main()
