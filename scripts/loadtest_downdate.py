"""Loadtest: index DOWNDATE cost vs corpus size (round 9, third session).

The claim delete_from_postings exists for: retracting a fixed-size batch
of documents from a maintained index costs O(|index| passthrough +
|delta terms| array work) — ONE term-keyed join — while the alternative
(rebuild over survivors) re-scans and re-shuffles the whole surviving
corpus. This script builds a synthetic corpus at two scales 10x apart,
materializes the index once (setup, untimed), then times (a) the
downdate of a FIXED 1k-document batch and (b) the full rebuild over the
survivors, printing one JSON line per scale.

Expected shape: downdate_s grows far slower than rebuild_s (the join
passthrough grows with the index, but there is no corpus re-tokenize /
re-shuffle); the gap widens with scale.

Run: python scripts/loadtest_downdate.py
Results land in PLANS.md by hand (the round-7 loadtest discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.index import (
    build_postings,
    delete_from_postings,
)
from mapreduceindexer_spark.session import get_spark

DELETE_BATCH = 1_000


def _docs(spark, n_docs: int):
    # ~12 pseudo-words per doc from a vocabulary PROPORTIONAL to the
    # corpus (n/20 terms) so the index itself grows with scale — a
    # fixed vocabulary would cap the index at |vocab| rows and hide the
    # passthrough cost the test exists to measure.
    vocab = max(5_000, n_docs // 20)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    ((F.col("id") * (i * 2 + 3) + i * i) % vocab).cast("string"),
                )
                for i in range(12)
            ],
        ).alias("text"),
    )


def run_scale(spark, n_docs: int) -> dict:
    docs = _docs(spark, n_docs).localCheckpoint()
    base = build_postings(docs).localCheckpoint()  # the maintained index
    gone_docs = docs.filter(F.col("doc_id") < DELETE_BATCH).localCheckpoint()

    t0 = time.perf_counter()
    gone = build_postings(gone_docs)
    n_down = delete_from_postings(base, gone).count()
    downdate_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_rebuild = build_postings(
        docs.filter(F.col("doc_id") >= DELETE_BATCH)
    ).count()
    rebuild_s = time.perf_counter() - t0
    assert n_down == n_rebuild, (n_down, n_rebuild)
    return {
        "n_docs": n_docs,
        "delete_batch": DELETE_BATCH,
        "downdate_s": round(downdate_s, 3),
        "rebuild_s": round(rebuild_s, 3),
    }


def main() -> None:
    spark = get_spark(app_name="loadtest-downdate")
    run_scale(spark, 20_000)  # JVM/codegen warmup, discarded
    for n_docs in (1_000_000, 10_000_000):
        print(json.dumps(run_scale(spark, n_docs)), flush=True)


if __name__ == "__main__":
    main()
