"""REPx load test for the round-9-born operators (same rolled/offset-
replica method as the round-4/6/7 tables in PLANS.md) — round-9 verdict
item 6.

- q_winnowing          documents tier. Rolling k-gram hashes + one
                       window-min pick per w-window: rows explode as
                       tokens x 1 (k-grams) + tokens/w (picks) — linear
                       in corpus tokens; the pair-count join is bounded
                       by shared-fingerprint collisions.
- q_boilerplate_removal documents tier. Token-window explode (C4-style
                       passage hashing): linear in tokens; the
                       cross-doc window-frequency agg shuffles one row
                       per window occurrence.
- q_quality_classifier documents tier. hash60 feature explode (one row
                       per token) + a broadcast-size Rocchio centroid
                       pair: linear in tokens, train/apply both.
- q_diverse_sample     embeddings tier. m fully-relational k-center
                       rounds: each round is one corpus pass (argmax
                       d2), so cost = m x n — linear in corpus for
                       fixed m; the selected set stays in the cluster.

Replicas perturb text (documents) / roll dimensions (embeddings) so no
digest dedup collapses the scale; IDs are offset to disjoint ranges.

Usage: python scripts/loadtest_r9_100x.py [REP_DOCS] [REP_EMB]
(defaults 10 and 100); JSON lines to stdout. Harness:
scripts/_loadtest_common.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure, stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    rep_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rep_emb = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r9-loadtest")

    # --- documents tier: winnowing / boilerplate / classifier ------------
    doc_dir = stage_dir(src, "documents", "r9load_documents_")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    reps_d = spark.range(rep_docs).select(F.col("id").alias("r"))
    docs.crossJoin(reps_d).select(
        (F.col("doc_id") + F.col("r") * 10_000_000).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("r")))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    ).repartition(64).write.mode("overwrite").parquet(
        f"{doc_dir}/documents.parquet"
    )
    emit(stage="replicate_documents", rep=rep_docs)
    for q in ("q_winnowing", "q_boilerplate_removal", "q_quality_classifier"):
        measure(spark, q, src, doc_dir, rep_docs)

    # --- embeddings tier: k-center diversity sample -----------------------
    emb_dir = stage_dir(src, "embeddings", "r9load_embeddings_")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    reps = spark.range(rep_emb).select(F.col("id").alias("r"))
    rolled = F.expr(
        f"concat(slice(embedding, CAST(r % {dim} AS INT) + 1,"
        f" {dim} - CAST(r % {dim} AS INT)),"
        f" slice(embedding, 1, CAST(r % {dim} AS INT)))"
    )
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("r") * 10_000_000).alias("vec_id"),
        rolled.alias("embedding"),
        "label",
    ).repartition(64).write.mode("overwrite").parquet(
        f"{emb_dir}/embeddings.parquet"
    )
    emit(stage="replicate_embeddings", rep=rep_emb)
    measure(spark, "q_diverse_sample", src, emb_dir, rep_emb)

    spark.stop()


if __name__ == "__main__":
    main()
