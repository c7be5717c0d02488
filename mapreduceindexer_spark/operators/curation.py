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
    near_pairs: DataFrame | None = None,
) -> DataFrame:
    """Run the 4-stage curation pipeline; return (lang, n_kept) per language.

    The aggregate output keeps the harness result small and deterministic;
    a production caller would take ``kept_doc_ids`` (the pre-aggregation
    relation) and semi-join it against the corpus instead.

    ``near_pairs`` lets the caller pass an already-staged verified-pair
    relation (the output of ``dedup.near_duplicates`` with the SAME
    dials) instead of rebuilding the LSH staging inside the composite —
    the staging-table reuse a production pipeline gets for free. When
    omitted, the composite stays self-contained and builds it here.
    """
    from mapreduceindexer_spark.functions.hashing import hash60

    keepers = dedup.exact_duplicates(docs).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    if near_pairs is None:
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


def domain_cap(docs: DataFrame, k: int = 10) -> DataFrame:
    """Per-domain document cap — the crawl-curation rule that no single
    source may contribute more than ``k`` documents (per-domain caps are
    how production pipelines stop a few giant hosts from dominating the
    mixture after dedup).

    Survivors are the k documents with the smallest content-independent
    ``hash60("cap:" + doc_id)`` per source — a deterministic uniform
    draw, reproducible across engines, partitionings, and retries (the
    same auditability contract as the stratified sampler; taking "first
    k by doc_id" would bias toward old documents).

    Scale: one hash exchange (the per-source window); WindowGroupLimit
    computes the bottom-k per task map-side, so the shuffle carries at
    most k rows per (source, task) — never a source's full population.
    Skew-immune: a 100M-doc domain still ships only k·tasks rows.
    """
    from mapreduceindexer_spark.functions.hashing import hash60
    from pyspark.sql import Window

    keyed = docs.select(
        "source",
        "doc_id",
        hash60(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))).alias("skey"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("skey"), F.asc("doc_id"))
    return keyed.select(
        "source",
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("rank"),
    ).filter(F.col("rank") <= k)


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-shape importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram features are, for
    importance resampling toward a target distribution (here: the
    corpus's own ``target_lang`` slice; in production a curated
    high-quality corpus — same plan, different input).

    Model: word-bigram features hashed into ``n_buckets`` buckets; both
    the target and raw bag-of-features models are add-one-smoothed bucket
    frequencies. Where the paper scores log p_t(b) − log p_r(b), this
    implementation keeps the per-bucket likelihood RATIO as an exact
    scaled integer — floor(S·(c_t+1)(N_r+B) / ((c_r+1)(N_t+B))) — pure
    int64 both engines replay bit-for-bit (same discipline as lm_score;
    log would drag a libm seam into the oracle). A document's weight is
    the exact integer SUM of its feature ratios; ranking by mean ratio
    selects the same kind of target-like documents, and ``selected``
    (mean ratio > S ⇔ more target-like than raw on average) is the
    resampling gate. int64 headroom: each term ≤ S·(N_r+B) ≈ 10^6·N_r —
    scale the factor down (or go DECIMAL(38)) past ~10^12 features.

    Plan: features are a narrow per-row construction; the model is ONE
    conditional aggregate over the feature stream (c_r = count, c_t =
    count of target rows — one pass, 1024 groups, no skew); totals ride
    a broadcast single-row aggregate; the scoring join broadcasts the
    1024-row model back onto the feature stream; one doc_id shuffle
    aggregates per-document sums. The feature stream feeds the model
    pass and the scoring pass — two corpus scans; a production run
    persists the hashed features (spill-to-disk, the near_duplicates
    convention) to make it one.
    """
    from mapreduceindexer_spark.functions.hashing import hash60

    bg = ts.doc_2grams(docs)
    feats = bg.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select(
        "doc_id",
        (F.col("lang") == target_lang).cast("bigint").alias("is_t"),
        (
            hash60(F.concat(F.lit("dsir:"), F.col("g"))) % n_buckets
        ).alias("b"),
    )
    model = feats.groupBy("b").agg(
        F.count("*").alias("c_r"), F.sum("is_t").alias("c_t")
    )
    totals = model.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr(
            f"(c_t + 1) * (n_r + {n_buckets}) * CAST({scale} AS BIGINT)"
            f" div ((c_r + 1) * (n_t + {n_buckets}))"
        ).alias("r_s"),
    )
    # The mean ratio stays a 10^6-scaled exact integer (sum div n): a
    # rounded double mean would hit the half-way seam whenever n_feats is
    # a power of two (observed live: sum 33673818, n 32 → quotient
    # terminates at ...8125 and the two engines round the boundary
    # differently).
    return (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("r_s").cast("bigint").alias("sum_ratio"),
            F.expr("sum(r_s) div count(*)").cast("bigint").alias(
                "mean_ratio_scaled"
            ),
            (F.sum("r_s") > F.count("*") * scale).alias("selected"),
        )
    )


def kcenter_sample(embeddings: DataFrame, m: int = 8) -> DataFrame:
    """DIVERSITY-AWARE SUBSET SELECTION: greedy k-center (farthest-point
    traversal) over the embedding column — pick ``m`` points such that
    each new pick is the point FARTHEST from everything already picked.
    The classic 2-approximation to the k-center objective, and the
    standard diversity pass of a training-data pipeline: where
    stratified/weighted sampling balances metadata and SemDeDup removes
    redundancy, k-center picks maximally-SPREAD exemplars (coreset
    seeds, eval-panel selection, annotation budgets).

    Deterministic by construction so the DuckDB oracle replays every
    round: seed = lowest vec_id; distance = squared L2 rounded to 6
    digits (engine-exact); argmax ties break to the lowest vec_id.
    Fully relational — the selected set stays a DataFrame (the
    ``lloyd_rounds`` discipline, no driver-side collect): each round is
    one anti-join (drop already-selected), one broadcast of the ≤ m
    selected vectors, a per-candidate MIN aggregate, and a
    deterministic LIMIT 1 argmax. Rounds are a driver loop, checkpointed
    per round like the graph walks (the result feeds the next round and
    the final output).

    Output: (vec_id, sel_rank 0..m-1, d2) — ``d2`` is the point's
    max-min squared distance AT SELECTION TIME, i.e. the coverage
    radius the selection guarantees after that round (monotonically
    non-increasing; the round-r radius bounds the k-center cost of the
    first r+1 picks). Seed row carries d2 = 0.

    Scale: each round is one corpus pass with a broadcast of ≤ m rows —
    m passes total, the known cost of exact greedy k-center; at 100 TB
    production runs it on a uniform pre-sample (same plan, smaller
    input), exactly like k-means training.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = embeddings.select("vec_id", v.alias("v")).localCheckpoint()

    def _d2(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
            6,
        )

    sel = (
        e.orderBy(F.asc("vec_id"))
        .limit(1)
        .select(
            "vec_id",
            F.lit(0).cast("bigint").alias("sel_rank"),
            F.lit(0.0).alias("d2"),
        )
        .localCheckpoint()
    )
    for r in range(1, m):
        sel_vecs = e.join(sel.select("vec_id"), "vec_id").select(
            F.col("v").alias("sv")
        )
        dmin = (
            e.join(sel.select("vec_id"), "vec_id", "left_anti")
            .crossJoin(F.broadcast(sel_vecs))
            .select("vec_id", _d2("v", "sv").alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("dmin"))
        )
        pick = (
            dmin.orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .select(
                "vec_id",
                F.lit(r).cast("bigint").alias("sel_rank"),
                F.col("dmin").alias("d2"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel
