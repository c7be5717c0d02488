"""Table-maintenance operators: small-file compaction.

A long-lived ingest pipeline (streaming sinks, frequent small upserts)
fragments a table into thousands of tiny files; at 100 TB the resulting
task explosion and per-file open cost dominate scan time. Compaction
rewrites a directory into ~target-sized files, optionally range-clustered
on a key so parquet min/max footer statistics (and any later
partition-range pruning) stay effective after the rewrite.

The reference engine has no table layer at all (its sink writes 26 fixed
per-letter files, ``src/functions.cpp:146-164``); this is part of the
pipeline-maintenance family (see also q_upsert / q_scd2 in catalog.py).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def plan_target_files(total_bytes: int, target_file_bytes: int) -> int:
    """Number of output files for a compaction: ceil(bytes / target),
    never zero."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_files(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: str | None = None,
) -> int:
    """Rewrite ``in_dir`` (parquet) into ``out_dir`` as ~target-sized
    files; returns the file count written.

    Sizing uses the *source* byte footprint (driver-side listing here; on
    an object store the same numbers come from the table manifest or
    listing API — one metadata call, not a data read). Without
    ``cluster_by`` the rewrite is a plain ``repartition(n)`` — one round-
    robin shuffle, perfectly balanced output. With ``cluster_by`` it is
    ``repartitionByRange(n, key).sortWithinPartitions(key)``: output files
    cover disjoint key ranges, so every file's parquet min/max footer
    prunes key-predicate scans — compaction then *improves* data skipping
    instead of destroying it. Range boundaries come from Spark's reservoir
    sample of the key, so skewed keys still yield balanced files.
    """
    n = plan_target_files(_dir_bytes(in_dir), target_file_bytes)
    df: DataFrame = spark.read.parquet(in_dir)
    if cluster_by is None:
        out = df.repartition(n)
    else:
        out = df.repartitionByRange(n, cluster_by).sortWithinPartitions(cluster_by)
    out.write.mode("overwrite").parquet(out_dir)
    return n
