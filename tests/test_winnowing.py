"""Winnowing fingerprint invariants (MOSS, Schleimer et al. 2003) —
value parity is covered by test_oracle_parity; these pin the selection
GUARANTEE the algorithm exists for."""

from __future__ import annotations

from mapreduceindexer_spark.operators.textstats import winnowing_fingerprints

K, W = 3, 4


def test_shared_run_of_guarantee_length_forces_shared_fingerprint(spark):
    # Docs share exactly w+k-1 = 6 consecutive tokens in otherwise
    # disjoint text -> the winnowing theorem forces >= 1 shared print.
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, f"one two three {shared} four five six"),
            (1, f"seven eight nine {shared} ten eleven twelve"),
            (2, "totally unrelated content with different words here"),
        ],
        "doc_id: bigint, text: string",
    )
    out = {r.doc_id: r for r in winnowing_fingerprints(docs, k=K, w=W).collect()}
    assert out[0].n_docs_sharing >= 1
    assert out[1].n_docs_sharing >= 1
    assert out[2].n_docs_sharing == 0


def test_density_and_short_doc_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"tok{i}" for i in range(50))),  # all-unique grams
            (1, "a b"),            # shorter than k -> zero counts
            (2, "a b c d"),        # 2 kgrams < w -> single global min
        ],
        "doc_id: bigint, text: string",
    )
    out = {r.doc_id: r for r in winnowing_fingerprints(docs, k=K, w=W).collect()}
    assert out[0].n_kgrams == 48
    # Winnowing density: selected ~2/(w+1) of hashes; never more than
    # the window count, never fewer than ceil(m - w + 1 >= 1).
    assert 1 <= out[0].n_fps <= 48 - W + 1
    assert out[0].n_fps <= out[0].n_kgrams
    assert (out[1].n_kgrams, out[1].n_fps, out[1].n_docs_sharing) == (0, 0, 0)
    assert (out[2].n_kgrams, out[2].n_fps) == (2, 1)


def test_position_jitter_changes_nothing_shared(spark):
    # The same shared run at DIFFERENT offsets still collides: the
    # selection is content-anchored (hash minima), not offset-anchored.
    shared = "p q r s t u v w"
    docs = spark.createDataFrame(
        [(0, f"{shared} filler1 filler2"), (1, f"x y z {shared}")],
        "doc_id: bigint, text: string",
    )
    out = {r.doc_id: r for r in winnowing_fingerprints(docs, k=K, w=W).collect()}
    assert out[0].n_docs_sharing == 1 and out[1].n_docs_sharing == 1
