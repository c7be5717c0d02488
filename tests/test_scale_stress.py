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
