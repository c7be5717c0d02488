"""Loadtest: ingest-dedup batch cost vs corpus (state) size.

The claim ingest_dedup_against exists for: probing a FIXED batch
against the persisted signature state costs the same whether the
corpus behind that state is 10x or 100x bigger — per-batch work is
O(batch + bucket collisions), never O(corpus), because the state
carries only ~n_hashes small rows per admitted document and the probe
is a bucket equi-join. This script builds signature state for
synthetic corpora at three sizes, probes the SAME 500-doc batch, and
prints one JSON line per scale.

Run: python scripts/loadtest_ingest.py
Results land in PLANS.md by hand (the round-7 loadtest discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.dedup import (
    ingest_dedup_against,
    ingest_signatures,
)
from mapreduceindexer_spark.session import get_spark

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon",
]


def synth_docs(spark, n: int, id_offset: int = 0, text_offset: int = 0):
    """n synthetic documents of 30 hash-picked words each; the text is
    a pure function of ``id + text_offset``, so two calls with the
    same text_offset produce duplicate TEXTS under distinct doc_ids —
    exactly what a dup-rate probe needs."""
    w = F.array(*[F.lit(x) for x in WORDS])
    key = F.col("id") + F.lit(text_offset)
    word_at = lambda i: F.element_at(  # noqa: E731
        w, ((F.xxhash64(key * 31 + i) % 20 + 20) % 20 + 1).cast("int")
    )
    return (
        spark.range(n)
        .withColumn("doc_id", F.col("id") + id_offset)
        .withColumn("text", F.concat_ws(" ", *[word_at(i) for i in range(30)]))
        .select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("synth").alias("source"),
            F.length("text").alias("n_chars"),
        )
    )


def main() -> None:
    spark = get_spark(app_name="loadtest_ingest")
    # 250 exact duplicates of corpus docs 0..249 + 250 novel texts —
    # the probe must flag ~the first half and pass the second.
    dup_half = synth_docs(spark, 250, id_offset=20_000_000)
    novel_half = synth_docs(
        spark, 250, id_offset=30_000_000, text_offset=50_000_000
    )
    batch = ingest_signatures(
        dup_half.unionByName(novel_half)
    ).localCheckpoint()
    for n_corpus in (10_000, 100_000, 1_000_000):
        state = ingest_signatures(synth_docs(spark, n_corpus)).localCheckpoint()
        t0 = time.time()
        n_flagged = ingest_dedup_against(state, batch, threshold=0.5).count()
        probe_sec = time.time() - t0
        print(
            json.dumps(
                {
                    "corpus_docs": n_corpus,
                    "batch_docs": 500,
                    "probe_sec": round(probe_sec, 3),
                    "flagged": n_flagged,
                }
            ),
            flush=True,
        )
        state.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
