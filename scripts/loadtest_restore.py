"""Loadtest: RESTORE cost vs table size (round 9).

The claim restore() exists for: rolling a table back to a pre-incident
version costs ONE manifest copy regardless of how much data the table
holds — the 100 TB rollback is a small JSON write, where re-ingesting
or copy-reverting would be O(table). This script builds the same
commit/delete/restore sequence at two scales (10x apart), measures the
restore call alone plus a full read-back at each, and prints one JSON
line per scale.

Expected shape: restore_s flat (milliseconds, scale-independent) while
readback_s grows with the data — the restore itself never touches
bytes.

Run: python scripts/loadtest_restore.py
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


def run_scale(spark, n_rows: int) -> dict:
    df = spark.range(n_rows).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    t = TransactionalTable(tempfile.mkdtemp(prefix="loadtest_rst_"))
    try:
        third = n_rows // 3
        t.commit(df.filter(F.col("id") < third), stats_cols=["id"])
        t.commit(
            df.filter((F.col("id") >= third) & (F.col("id") < 2 * third)),
            mode="append",
            stats_cols=["id"],
        )
        t.commit(
            df.filter(F.col("id") >= 2 * third),
            mode="append",
            stats_cols=["id"],
        )
        pre = t.current_version()
        t.delete_where(spark, "id", lo=0, hi=third // 2, stats_cols=["id"])
        t0 = time.perf_counter()
        v = t.restore(pre)
        restore_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = t.read(spark, v).count()
        readback_s = time.perf_counter() - t0
        assert n == n_rows, (n, n_rows)
        return {
            "n_rows": n_rows,
            "restore_s": round(restore_s, 4),
            "readback_s": round(readback_s, 3),
        }
    finally:
        shutil.rmtree(t.path, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="loadtest-restore")
    for n_rows in (200_000, 2_000_000):
        print(json.dumps(run_scale(spark, n_rows)), flush=True)


if __name__ == "__main__":
    main()
