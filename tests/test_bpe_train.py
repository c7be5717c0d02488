"""BPE trainer: Spark fold vs an independent Python reference, on corpora
crafted to hit the merge edge cases (overlapping sites, consecutive merge
sites sharing a delimiter, merged-token adjacency in later rounds)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from mapreduceindexer_spark.operators.textstats import bpe_train


def _ref_bpe(word_freq: dict[str, int], rounds: int):
    """Reference greedy BPE: explicit left-to-right scan (not a fold)."""
    words = {w: list(w) for w in word_freq}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((rnd, l, r, l + r, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _spark_bpe(spark, texts: list[str], rounds: int):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = bpe_train(docs, rounds=rounds).collect()
    return sorted(
        (r["merge_round"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in rows
    )


def _freqs(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in t.split():
            if w.isalpha():
                c[w.lower()] += 1
    return dict(c)


def test_overlapping_run_merges_left_to_right(spark):
    # 'aaaa' with dominant pair (a,a): greedy non-overlap -> 2 sites, not 3.
    texts = ["aaaa aaaa aaaa baca"]
    assert _spark_bpe(spark, texts, 2) == sorted(_ref_bpe(_freqs(texts), 2))


def test_consecutive_merge_sites(spark):
    # 'abab': both (a,b) sites merge in round 1 (they share a delimiter in
    # the oracle's string form); round 2 then merges (ab, ab).
    texts = ["abab abab abab xyz"]
    got = _spark_bpe(spark, texts, 2)
    assert got == sorted(_ref_bpe(_freqs(texts), 2))
    assert got[0][1:4] == ("a", "b", "ab")
    assert got[1][1:4] == ("ab", "ab", "abab")


def test_merged_token_meets_single(spark):
    # Round 2 must pair a merged token with a remaining single char.
    texts = ["the the the them them rest"]
    assert _spark_bpe(spark, texts, 3) == sorted(_ref_bpe(_freqs(texts), 3))


def test_tie_break_is_lexicographic(spark):
    # 'cd' and 'ab' tie on count: lexicographically smaller pair wins.
    texts = ["ab cd ab cd"]
    got = _spark_bpe(spark, texts, 1)
    assert got[0][1:4] == ("a", "b", "ab")


def test_bpe_exhausted_corpus_emits_no_null_merges(spark):
    """Degenerate corpus: every term is a single character, so NO round
    has adjacent pairs. bpe_train must emit ZERO merge rows (not one
    all-NULL row per round — matching the oracle's empty LIMIT-1 CTE),
    and bpe_encode must still encode every document (identity: pieces ==
    tokens), never crossJoin-empty its vocabulary. The registered DuckDB
    oracles replay the same corpus to the same answers (guard CTE g{i})."""
    import duckdb
    import pandas as pd

    from mapreduceindexer_spark.catalog import QUERIES
    from mapreduceindexer_spark.operators.textstats import bpe_encode

    rows = [(0, "a b c"), (1, "b c d d")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert bpe_train(docs, rounds=3).count() == 0

    enc = {r.doc_id: (r.n_tokens, r.n_pieces) for r in bpe_encode(docs, 3).collect()}
    assert enc == {0: (3, 3), 1: (4, 4)}, enc

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    assert con.execute(QUERIES["q_bpe_train"][1]).fetchall() == []
    o = {r[0]: (r[1], r[2]) for r in con.execute(QUERIES["q_bpe_encode"][1]).fetchall()}
    con.close()
    assert o == {0: (3, 3), 1: (4, 4)}, o


def test_unigram_lm_round_fewest_pieces_and_determinism(spark):
    """unigram_lm_round: the Viterbi objective picks fewest pieces (a
    word whose whole form is in the inventory segments as itself), the
    M-step recount conserves total word mass onto pieces, and repeated
    runs are bit-identical (exact-integer objective)."""
    from mapreduceindexer_spark.operators.textstats import unigram_lm_round

    docs = spark.createDataFrame(
        [(1, "spark spark spark row row zq"), (2, "spark row spark")],
        "doc_id bigint, text string",
    )
    out1 = sorted(map(tuple, unigram_lm_round(docs, top_out=50).collect()))
    out2 = sorted(map(tuple, unigram_lm_round(docs, top_out=50).collect()))
    assert out1 == out2 and out1
    counts = {p: c for p, c, _ in out1}
    # 'spark' (5 chars) exceeds max_piece_len=4: fewest-pieces path is
    # 's' + 'park' (2 pieces), never 5 single chars.
    assert counts.get("park") == 5 and counts.get("s") == 5
    # 'row' and 'zq' fit in one piece each -> segment as themselves.
    assert counts.get("row") == 3
    assert counts.get("zq") == 1
    assert set(counts) == {"park", "s", "row", "zq"}
