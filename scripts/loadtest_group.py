"""Loadtest: TableGroup pin cost vs member size (round 9, third session).

The claim group.commit() exists for: publishing a cross-table
consistent snapshot costs one tag write per member plus one manifest
CAS — independent of how much data the members hold. This script builds
a two-member group (docs + derived index) at two scales 10x apart,
measures the group commit alone and a group-pinned read-back, and
prints one JSON line per scale.

Expected shape: commit_s flat (milliseconds) while readback_s tracks
the data — the pin never touches member bytes.

Run: python scripts/loadtest_group.py
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
from mapreduceindexer_spark.sources.group import TableGroup
from mapreduceindexer_spark.sources.transact import TransactionalTable


def run_scale(spark, n_rows: int) -> dict:
    root = tempfile.mkdtemp(prefix="loadtest_group_")
    try:
        docs = spark.range(n_rows).withColumn(
            "payload", F.md5(F.col("id").cast("string"))
        )
        agg = docs.groupBy((F.col("id") % 1000).alias("k")).count()
        dt = TransactionalTable(os.path.join(root, "docs"))
        it = TransactionalTable(os.path.join(root, "idx"))
        dv = dt.commit(docs)
        iv = it.commit(agg)
        grp = TableGroup(os.path.join(root, "grp"))

        t0 = time.perf_counter()
        grp.commit({"docs": (dt, dv), "idx": (it, iv)})
        commit_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        n = grp.read(spark, "docs").count()
        readback_s = time.perf_counter() - t0
        assert n == n_rows, (n, n_rows)
        return {
            "n_rows": n_rows,
            "group_commit_s": round(commit_s, 4),
            "readback_s": round(readback_s, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="loadtest-group")
    for n_rows in (200_000, 2_000_000):
        print(json.dumps(run_scale(spark, n_rows)), flush=True)


if __name__ == "__main__":
    main()
