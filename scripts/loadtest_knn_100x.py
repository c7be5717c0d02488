"""REPx embedding load test for the KNN-graph / ANN-recall family
(round-5 session 2; same rolled-replica method as round 4's "Measured
100x embedding scaling" table in PLANS.md).

Method: sf0.1 embeddings (2,000 x 64 float) replicated REP times with
disjoint vec_ids; each replica's array is ROLLED by ``r % dim`` positions
so replicas point in genuinely different directions (new data, not
near-duplicates — replica 0 keeps the original vectors so the fixed
probe ids of q_ann_recall still exist). Non-embedding tables symlinked.

Queries measured (builder-inclusive timer, 1 warm-up + best-of-2 at 1x
in the same JVM, single run at REPx):

- q_knn_graph         (FIXED 8 cells — the documented quadratic cliff:
                       per-cell population n/8, pairs ~ n^2/8)
- q_knn_graph_scaled  (cells = max(8, n // 200) — bounded per-cell pop)
- q_ann_recall        (brute side linear: |probes| dots per row)

Usage: python scripts/loadtest_knn_100x.py [REP] [query ...]
(default REP=100, all three queries); JSON lines to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure, stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = ["q_knn_graph", "q_knn_graph_scaled", "q_ann_recall"]


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or DEFAULT_QUERIES
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="knn-loadtest")

    out_dir = stage_dir(src, "embeddings", f"knn{rep}x_")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    reps = spark.range(rep).select(F.col("id").alias("r"))
    rolled = F.expr(
        f"concat(slice(embedding, CAST(r % {dim} AS INT) + 1,"
        f" {dim} - CAST(r % {dim} AS INT)),"
        f" slice(embedding, 1, CAST(r % {dim} AS INT)))"
    )
    perturbed = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("r") * 10_000_000).alias("vec_id"),
        rolled.alias("embedding"),
        "label",
    )
    t0 = time.perf_counter()
    perturbed.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    emit(stage="replicate", rep=rep, out_dir=out_dir,
         sec=round(time.perf_counter() - t0, 1))

    for name in names:
        measure(spark, name, src, out_dir, rep)
    spark.stop()


if __name__ == "__main__":
    main()
