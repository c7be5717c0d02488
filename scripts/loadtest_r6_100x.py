"""REPx load test for the round-6 operators (same rolled/offset-replica
method as the round-4/5 tables in PLANS.md).

- q_pq_ann        100x embeddings (rolled replicas, disjoint vec_ids).
                  Expected linear: encode = n * ksub * m narrow rows;
                  ADC = broadcast m x ksub table against the code
                  relation.
- q_interval_join 100x events (replicas get disjoint user_id/event_id
                  ranges, timestamps unchanged → same per-user interval
                  density, 100x keys). Expected linear: candidates
                  bounded per (user, bin).
- q_multimodal_gif 10x documents (text perturbed per replica so blob
                  dims/pixels differ). Expected linear: per-row decode,
                  Arrow-batched; pure-Python LZW is the kernel cost.
- q_shortest_path 100x documents: the pruned graph is top-30 terms by
                  construction, so BFS itself is bounded; what scales is
                  the co-occurrence edge build (audited for the
                  triangles family in round 5) — measured here on the
                  same replicas as the GIF tier.

Usage: python scripts/loadtest_r6_100x.py [REP_EMB] [REP_DOCS]
(defaults 100 and 10); JSON lines to stdout.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._loadtest_common import emit, measure  # noqa: E402
from scripts._loadtest_common import stage_dir as _stage_dir  # noqa: E402

from mapreduceindexer_spark.session import get_spark  # noqa: E402


def stage_dir(src: str, replaced: str) -> str:
    return _stage_dir(src, replaced, f"r6load_{replaced}_")


def main() -> None:
    rep_emb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rep_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r6-loadtest")

    # --- embeddings tier: PQ ANN ------------------------------------------
    emb_dir = stage_dir(src, "embeddings")
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
    measure(spark, "q_pq_ann", src, emb_dir, rep_emb)

    # --- events tier: interval join ---------------------------------------
    ev_dir = stage_dir(src, "events")
    ev = spark.read.parquet(f"{src}/events.parquet")
    reps_e = spark.range(rep_emb).select(F.col("id").alias("r"))
    ev.crossJoin(reps_e).select(
        (F.col("event_id") + F.col("r") * 100_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("r") * 10_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(64).write.mode("overwrite").parquet(
        f"{ev_dir}/events.parquet"
    )
    emit(stage="replicate_events", rep=rep_emb)
    measure(spark, "q_interval_join", src, ev_dir, rep_emb)

    # --- documents tier: GIF decode + BFS edge build ----------------------
    doc_dir = stage_dir(src, "documents")
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
    measure(spark, "q_multimodal_gif", src, doc_dir, rep_docs)
    measure(spark, "q_shortest_path", src, doc_dir, rep_docs)

    spark.stop()


if __name__ == "__main__":
    main()
