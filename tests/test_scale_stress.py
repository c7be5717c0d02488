"""Scale-behavior tests: invariants that must hold as the corpus grows.

These don't measure speed (bench.py does); they pin the *algebra* that
makes scale-out safe — replicating the corpus transforms the index in a
fully predictable way, and extreme key skew changes nothing but timing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from mapreduceindexer_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def test_postings_of_replicated_corpus_are_derived_postings(spark, docs):
    """build(docs ∪ shift(docs, K)) must equal the 1× postings with every
    posting list unioned with its +K shift and df doubled — replication
    never changes which terms exist or their relative ranking."""
    from mapreduceindexer_spark.operators.index import build_postings

    k = 1_000_000
    shifted = docs.select((F.col("doc_id") + k).alias("doc_id"), "text")
    base = {r.term: list(r.doc_ids) for r in build_postings(docs, salt_buckets=16).collect()}
    got = {
        r.term: (list(r.doc_ids), r.df)
        for r in build_postings(docs.unionByName(shifted), salt_buckets=16).collect()
    }
    assert set(got) == set(base)
    for term, ids in base.items():
        want_ids = ids + [i + k for i in ids]
        assert got[term] == (want_ids, 2 * len(ids)), term


def test_postings_identical_across_parallelism(spark, docs):
    """The reference's determinism grid (same output for every (M,R) in
    {1,2,4}², checker.sh:141-247) translated to Spark: identical postings
    for any shuffle-partition count."""
    from mapreduceindexer_spark.operators.index import build_postings

    results = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                sorted(
                    (r.term, list(r.doc_ids), r.df)
                    for r in build_postings(docs, salt_buckets=4).collect()
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert results[0] == results[1] == results[2]


def test_lsh_finds_every_exact_replica(spark, docs):
    """Identical documents have identical shingle sets, hence identical
    minhash signatures in every band — LSH recall for exact replicas is
    exactly 1, not probabilistic. Replicate the corpus and require every
    (doc, replica) pair at jaccard 1.0."""
    from mapreduceindexer_spark.operators.dedup import near_duplicates

    k = 1_000_000
    both = docs.unionByName(
        docs.select((F.col("doc_id") + k).alias("doc_id"), "text")
    )
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_duplicates(both, threshold=0.99).collect()
    }
    doc_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    missing = [d for d in doc_ids if (d, d + k) not in pairs]
    assert not missing, f"{len(missing)} replica pairs missed: {missing[:5]}"
    assert all(abs(pairs[(d, d + k)] - 1.0) < 1e-9 for d in doc_ids)


def test_salted_aggregation_under_extreme_skew(spark):
    """A term present in EVERY document (the 100 TB stopword scenario,
    maximally skewed) must aggregate correctly through the salted two-level
    path and the segmented variant must reassemble to the same postings."""
    from mapreduceindexer_spark.operators.index import build_postings

    n = 20_000
    # Unique term must survive normalization ([^A-Za-z] stripped), so spell
    # the doc number in letters.
    docs = spark.range(1, n + 1).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(
            F.lit("common unique"),
            F.translate(F.col("id").cast("string"), "0123456789", "abcdefghij"),
        ).alias("text"),
    )
    postings = build_postings(docs, salt_buckets=16)
    hot = postings.filter(F.col("term") == "common").collect()
    assert len(hot) == 1
    assert hot[0].df == n
    assert list(hot[0].doc_ids) == list(range(1, n + 1))
    # Segmenting caps row width; reassembly over segments is exact.
    seg = build_postings(docs, salt_buckets=16, segment_size=1000).filter(
        F.col("term") == "common"
    )
    rows = sorted((r.segment, list(r.doc_ids)) for r in seg.collect())
    assert len(rows) == n // 1000
    assert all(len(ids) == 1000 for _, ids in rows)
    flattened = [i for _, ids in rows for i in ids]
    assert flattened == list(range(1, n + 1))
    # Distinct-term count is intact: one hot term + n unique terms.
    assert postings.count() == n + 1


def test_lsh_bucket_guard_bounds_degenerate_corpus(spark):
    """1k IDENTICAL documents collapse into one (band, sig) bucket per
    band; without the guard that is ~500k candidate pairs per band. The
    star-pattern guard must (a) bound candidates to O(n), (b) still link
    every document to the cluster via the verify stage at jaccard 1.0."""
    from mapreduceindexer_spark.operators.dedup import (
        doc_shingles,
        lsh_band_signatures,
        lsh_candidates,
        minhash_signatures,
        near_duplicates,
    )

    n = 1000
    docs = spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("the same exact document body repeated verbatim everywhere").alias(
            "text"
        ),
    )
    sigs = lsh_band_signatures(minhash_signatures(doc_shingles(docs, k=3), 16), 2)
    cands = lsh_candidates(sigs, max_bucket=64)
    n_cands = cands.count()
    # Star pattern: n-1 pairs total (same min doc in every band, distinct-ed),
    # vs n*(n-1)/2 = 499500 unguarded.
    assert n_cands == n - 1, n_cands
    # End-to-end: every doc still joins doc 0's duplicate cluster.
    pairs = near_duplicates(docs, threshold=0.99).collect()
    assert len(pairs) == n - 1
    assert all(r.doc_a == 0 and abs(r.jaccard - 1.0) < 1e-9 for r in pairs)


def test_lsh_bucket_guard_inactive_below_cap(spark):
    """Buckets at or below max_bucket keep exact all-pairs generation —
    the guard must not change results for sane corpora (oracle parity)."""
    from mapreduceindexer_spark.operators.dedup import (
        doc_shingles,
        lsh_band_signatures,
        lsh_candidates,
        minhash_signatures,
    )

    n = 10
    docs = spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("identical tiny cluster body for the guard boundary test").alias(
            "text"
        ),
    )
    sigs = lsh_band_signatures(minhash_signatures(doc_shingles(docs, k=3), 16), 2)
    got = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidates(sigs, max_bucket=64).collect()
    )
    want = sorted((a, b) for a in range(n) for b in range(a + 1, n))
    assert got == want


def test_containment_scores_full_inclusion_as_one(spark):
    """A document fully embedded in a longer one must score containment
    1.0 on its side (and < 1.0 on the long side) — the asymmetric signal
    the metric exists for. Verify stage driven directly with an explicit
    pair (candidate recall for tiny-inside-huge is the documented LSH
    caveat, not what this pins)."""
    from mapreduceindexer_spark.operators.dedup import (
        containment_for_pairs,
        doc_shingles,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " eta theta iota kappa lambda mu nu xi"
    docs = spark.createDataFrame(
        [(0, short), (1, long)], "doc_id int, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "doc_a int, doc_b int")
    rows = containment_for_pairs(doc_shingles(docs, 3), pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert abs(r.cont_a - 1.0) < 1e-9          # all of A inside B
    assert r.cont_b < 1.0                      # B only partially covered


def test_lm_score_identical_across_parallelism(spark):
    """The scaled-integer probability contract must make the LM score
    bit-identical for any shuffle-partition count — no float accumulates
    across rows, so parallelism cannot perturb a single output value."""
    from mapreduceindexer_spark.operators.textstats import lm_score
    from mapreduceindexer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    results = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                sorted(tuple(r) for r in lm_score(docs).collect())
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert results[0] == results[1] == results[2]
