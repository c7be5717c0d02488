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

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceindexer_spark import staging  # noqa: E402
from mapreduceindexer_spark.catalog import QUERIES  # noqa: E402
from mapreduceindexer_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()
QUERY_NAMES = [
    "q_near_dup",
    "q_substring_dup",
    "q_curation_pipeline",
    "q_bpe_train",
]


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def run_once(spark, name: str, sf_dir: str) -> tuple[float, int]:
    staging.clear()
    t0 = time.perf_counter()
    df = QUERIES[name][0](spark, sf_dir)
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or QUERY_NAMES
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="docs-loadtest")

    out_dir = tempfile.mkdtemp(prefix=f"docs{rep}x_")
    for t in TABLES:
        os.symlink(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")
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

    results = {}
    for name in names:
        run_once(spark, name, src)  # warm-up
        t1, n1 = run_once(spark, name, src)
        t1b, _ = run_once(spark, name, src)
        t1 = min(t1, t1b)
        emit(query=name, scale="1x", sec=round(t1, 2), rows=n1)
        tN, nN = run_once(spark, name, out_dir)
        emit(query=name, scale=f"{rep}x", sec=round(tN, 2), rows=nN,
             ratio=round(tN / max(t1, 1e-9), 1))
        results[name] = {"t1": round(t1, 2), "tN": round(tN, 2),
                         "rows1": n1, "rowsN": nN}
    emit(stage="done", rep=rep, results=results)
    spark.stop()


if __name__ == "__main__":
    main()
