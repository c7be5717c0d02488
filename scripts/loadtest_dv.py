"""Loadtest: merge-on-read (deletion vector) vs copy-on-write delete
cost as the table grows (round 8 continuation).

The claim delete_where_dv exists for: deleting a FIXED small row set
costs the same whether the containing snapshot is 10x or 100x bigger
(the write is O(rows deleted) — a tiny position file), while the
copy-on-write path rewrites every may-match dir (O(rows in matching
dirs)). This script measures both paths deleting the same 1k-row range
out of a single snapshot at two scales, plus the read-side tax the
vector costs until compaction, and prints one JSON line per
measurement.

Run: python scripts/loadtest_dv.py
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

DELETE_LO, DELETE_HI = 500, 1499  # 1k doomed rows at every scale


def build(spark, n_rows: int) -> TransactionalTable:
    df = spark.range(n_rows).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    t = TransactionalTable(tempfile.mkdtemp(prefix="loadtest_dv_"))
    t.commit(df, stats_cols=["id"])
    return t


def main() -> None:
    spark = get_spark(app_name="loadtest_dv")
    for n_rows in (100_000, 1_000_000, 10_000_000):
        # Merge-on-read: position vector only.
        t = build(spark, n_rows)
        t0 = time.time()
        t.delete_where_dv(spark, "id", lo=DELETE_LO, hi=DELETE_HI)
        dv_sec = time.time() - t0
        t0 = time.time()
        n_after_dv = t.read(spark).count()
        dv_read_sec = time.time() - t0
        shutil.rmtree(t.path, ignore_errors=True)

        # Copy-on-write: rewrite the may-match dir.
        t = build(spark, n_rows)
        t0 = time.time()
        t.delete_where(
            spark, "id", lo=DELETE_LO, hi=DELETE_HI, stats_cols=["id"]
        )
        cow_sec = time.time() - t0
        t0 = time.time()
        n_after_cow = t.read(spark).count()
        cow_read_sec = time.time() - t0
        shutil.rmtree(t.path, ignore_errors=True)

        assert n_after_dv == n_after_cow == n_rows - 1000
        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "dv_delete_sec": round(dv_sec, 3),
                    "cow_delete_sec": round(cow_sec, 3),
                    "dv_read_sec": round(dv_read_sec, 3),
                    "cow_read_sec": round(cow_read_sec, 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
