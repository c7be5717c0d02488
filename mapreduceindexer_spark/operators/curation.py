"""End-to-end training-data curation: the LLM-pipeline operators composed
into one auditable program.

Stage order (cheapest filter first is NOT optimal here — dedup must see
the full corpus, so it leads):

1. **Exact dedup** — one survivor (min doc_id) per content hash
   (``dedup.exact_duplicates``). Shuffle carries 128-bit digests.
2. **Near-dup removal** — MinHash-LSH candidates verified with exact
   Jaccard (``dedup.near_duplicates``); the higher doc_id of every
   verified pair is dropped (deterministic keep-the-lower convention).
   Never all-pairs: cost is linear + bucket collisions.
3. **Quality gate** — stopword-ratio/length score >= threshold
   (``textstats.quality_scores``), a narrow per-doc aggregate.
4. **Stratified sampling** — per-language permille rates via the
   content-independent ``hash60(doc_id)`` threshold: reproducible across
   engines, partitionings, and retries (the property that makes 100 TB
   curation auditable; ``df.sample`` is none of those).

Each stage's survivor set joins back as a semi/anti join on ``doc_id`` —
slim key relations, so at scale each is a broadcast or a well-partitioned
hash join, and document text is scanned exactly twice (once for shingles,
once for quality tokens), never carried through the shuffles.

Reference seed: the per-document distinct of ``src/functions.cpp:75,86``
generalizes to stage 1; everything else is north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduceindexer_spark.operators import dedup
from mapreduceindexer_spark.operators import textstats as ts


def curation_summary(
    docs: DataFrame,
    sample_rates: dict[str, int],
    default_rate: int = 100,
    quality_threshold: float = 0.3,
    k: int = 3,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    near_dup_threshold: float = 0.2,
) -> DataFrame:
    """Run the 4-stage curation pipeline; return (lang, n_kept) per language.

    The aggregate output keeps the harness result small and deterministic;
    a production caller would take ``kept_doc_ids`` (the pre-aggregation
    relation) and semi-join it against the corpus instead.
    """
    from mapreduceindexer_spark.functions.hashing import hash60

    keepers = dedup.exact_duplicates(docs).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    near_pairs = dedup.near_duplicates(
        docs, k=k, n_hashes=n_hashes, rows_per_band=rows_per_band,
        threshold=near_dup_threshold,
    )
    drop_b = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    after_dedup = keepers.join(drop_b, "doc_id", "left_anti")

    good = (
        ts.quality_scores(docs)
        .filter(F.col("quality") >= quality_threshold)
        .select("doc_id")
    )

    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(permille))
            for lang, permille in sample_rates.items()
        ],
        F.lit(default_rate),
    )
    sampled = docs.select("doc_id", "lang").filter(
        hash60(F.col("doc_id").cast("string")) % 1000 < rate
    )

    kept = sampled.join(after_dedup, "doc_id", "left_semi").join(
        good, "doc_id", "left_semi"
    )
    return kept.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_kept"))


def weighted_sample(docs: DataFrame, k: int = 20) -> DataFrame:
    """Deterministic weighted bottom-k sample per language stratum,
    weight-proportional WITHOUT transcendental keys.

    The classic A-ES/exponential-rank key (``-ln(u)/w``) makes the sample
    an order statistic of a libm function — a 1-ulp ``ln`` difference
    between engines can flip the k-th boundary. Instead integer weights
    are realized by TICKET REPLICATION (the standard reduction of
    weighted to uniform sampling): row i gets ``w_i`` tickets, each
    hashed with the portable ``hash60(t, doc_id)``, and the row's sort
    key is its minimum ticket hash — first-draw inclusion probability
    ∝ w_i, every arithmetic step exact and replayable in SQL.

    Weights here are the repetition-factor shape real LLM mixtures use
    (small integers): ``1 + floor(n_chars/128)``.

    Scale: the min ticket is computed PER ROW as ``array_min(transform(
    sequence(0, w-1), t -> hash60(t, doc_id)))`` — a narrow codegen
    expression, no explode and no per-doc aggregate shuffle. The only
    exchange in the whole plan is the per-lang window, and Spark's
    WindowGroupLimit computes the bottom-k partially map-side before it
    (rank-limit pushdown), so the shuffle carries at most k rows per
    (lang, task). The oracle deliberately uses the exploded-tickets
    formulation instead, making parity a check of the semantics.
    """
    from mapreduceindexer_spark.functions.hashing import hash60
    from pyspark.sql import Window

    min_ticket = F.array_min(
        F.transform(
            F.sequence(F.lit(0), (F.col("weight") - 1).cast("int")),
            lambda t: hash60(F.col("doc_id").cast("string"), seed=t),
        )
    )
    keyed = docs.select(
        "lang",
        "doc_id",
        (1 + F.floor(F.col("n_chars") / 128)).cast("bigint").alias("weight"),
    ).withColumn("skey", min_ticket)
    w = Window.partitionBy("lang").orderBy(F.asc("skey"), F.asc("doc_id"))
    return keyed.select(
        "lang",
        "doc_id",
        "weight",
        "skey",
        F.row_number().over(w).cast("bigint").alias("rank"),
    ).filter(F.col("rank") <= k)
