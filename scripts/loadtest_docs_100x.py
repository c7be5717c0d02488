"""100x document-pipeline load test (round-5 twin of round 4's embedding
scaling table — PLANS.md "Measured 100x embedding scaling").

Method: sf0.1 documents (5,000) replicated REP times with disjoint
doc_ids; every replica's text is per-word SUFFIXED with a replica tag
(two letters derived from the replica number), so:

- replicas are NOT near-duplicates of each other or the original (token
  vocabularies are disjoint across replicas -> shingle/minhash/window
  hashes all differ), so the dedup tiers' verify stage is not overloaded
  by construction — this is "more data", not "more duplicates";
- WITHIN a replica the original corpus's duplicate structure is
  preserved EXACTLY (the word->word||tag map is a bijection on shingle
  sets, so every within-replica Jaccard equals the original pair's) —
  the verified-pair count at REPx should be ~REP x the 1x count, which
  the script logs as a built-in correctness signal.

Non-document tables are symlinked. Queries run with the builder-inclusive
timer and a cleared staging registry per run (bench.py semantics). The 1x
reference numbers are measured in the SAME JVM (1 warm-up, best of 2);
the REPx numbers are single cold-ish runs — at this scale a quadratic
cliff is orders of magnitude, not noise.

Usage: python scripts/loadtest_docs_100x.py [REP] [query ...]
(default REP=100 and the round-5 dedup/curation set); writes progress as
JSON lines to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure, stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402

QUERY_NAMES = [
    "q_near_dup",
    "q_substring_dup",
    "q_curation_pipeline",
    "q_bpe_train",
]


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or QUERY_NAMES
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="docs-loadtest")

    out_dir = stage_dir(src, "documents", f"docs{rep}x_")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    reps = spark.range(rep).select(F.col("id").alias("r"))
    tag = F.concat(
        F.expr("char(97 + r div 26)"), F.expr("char(97 + r % 26)")
    )
    perturbed = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+)"), F.concat(F.lit("$1"), tag)
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    t0 = time.perf_counter()
    perturbed.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    emit(stage="replicate", rep=rep, out_dir=out_dir,
         sec=round(time.perf_counter() - t0, 1))

    for name in names:
        measure(spark, name, src, out_dir, rep)
    spark.stop()


if __name__ == "__main__":
    main()
