"""Semantic pins for the ExactSubstr operator (Lee et al. 2022 criterion):
hand-computed coverage on a corpus whose duplicated spans are known, so the
gaps-and-islands interval union is verified against arithmetic done on
paper, not against another engine. Cross-engine value parity at sf0.01 is
covered by test_oracle_parity (q_substring_dup).
"""

from mapreduceindexer_spark.operators.dedup import substring_duplicates


def _rows(spark, texts, w):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: r.asDict() for r in substring_duplicates(docs, w=w).collect()
    }


def test_cross_document_shared_window(spark):
    # "a b c" appears in both docs (doc0 pos1, doc1 pos2); nothing else
    # repeats. Coverage = exactly the 3 tokens of the shared window.
    out = _rows(spark, ["a b c d e f", "x a b c y z"], w=3)
    for doc_id in (0, 1):
        r = out[doc_id]
        assert r["n_tokens"] == 6
        assert r["n_windows"] == 4
        assert r["n_dup_windows"] == 1
        assert r["dup_tokens"] == 3
        assert r["dup_frac_ppm"] == 500_000


def test_within_document_repeat_counts_as_duplicate(spark):
    # "p q r" occurs twice INSIDE one doc (pos 1 and pos 5) — ExactSubstr
    # marks self-repetition too. Intervals [1,3] and [5,7] do not touch
    # (gap at 4), so two islands: 6 covered tokens of 8.
    out = _rows(spark, ["p q r s p q r t"], w=3)
    r = out[0]
    assert r["n_dup_windows"] == 2
    assert r["dup_tokens"] == 6
    assert r["dup_frac_ppm"] == 750_000


def test_overlapping_windows_merge_into_one_island(spark):
    # Both docs share the 4-token run "a b c d", giving two overlapping
    # duplicated 3-windows (pos1 "a b c", pos2 "b c d") that must union to
    # ONE 4-token interval, not 6 tokens.
    out = _rows(spark, ["a b c d x y", "a b c d z w"], w=3)
    for doc_id in (0, 1):
        r = out[doc_id]
        assert r["n_dup_windows"] == 2
        assert r["dup_tokens"] == 4
        assert r["dup_frac_ppm"] == 666_666  # 4*1e6 DIV 6, integer floor


def test_adjacent_islands_merge_but_gapped_do_not(spark):
    # doc0 carries two copies of a 6-token run separated by one unique
    # token: spans [1,6] and [8,13] stay two islands; total 12 of 13.
    run = "m n o p q r"
    out = _rows(spark, [f"{run} u {run}", f"{run} v {run}"], w=6)
    r = out[0]
    # windows: pos1 (the run) duplicated in 4 places (2 docs x 2 copies);
    # doc0's windows at pos 8 likewise; middle windows straddling 'u' are
    # unique to doc0 and appear once.
    assert r["n_tokens"] == 13
    assert r["dup_tokens"] == 12
    assert r["n_dup_windows"] == 2


def test_whole_document_duplicate_is_fully_covered(spark):
    out = _rows(spark, ["h i j k l", "h i j k l"], w=5)
    for doc_id in (0, 1):
        r = out[doc_id]
        assert r["n_windows"] == 1
        assert r["dup_tokens"] == 5
        assert r["dup_frac_ppm"] == 1_000_000


def test_short_and_clean_documents_report_zero(spark):
    # doc0 shorter than the window -> zero windows; doc1/doc2 unique.
    out = _rows(spark, ["tiny doc", "all fresh text here one", "two other words walk by"], w=4)
    assert out[0]["n_windows"] == 0
    for doc_id in (0, 1, 2):
        assert out[doc_id]["n_dup_windows"] == 0
        assert out[doc_id]["dup_tokens"] == 0
        assert out[doc_id]["dup_frac_ppm"] == 0
