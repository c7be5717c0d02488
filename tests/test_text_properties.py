"""Property tests for the tokenizer/normalizer and pipeline determinism —
the reference's determinism contract (identical output for every (M,R)
thread configuration, ``checker/checker.sh:141-247``) expressed as
partitioning-invariance properties.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_normalizer_invariants(spark, texts):
    from mapreduceindexer_spark.functions.text import normalize_term, tokenize

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = (
        df.select(F.explode(tokenize("text")).alias("tok"))
        .select(
            normalize_term("tok").alias("term"),
            normalize_term(normalize_term("tok")).alias("term2"),
        )
        .collect()
    )
    for r in out:
        # Output alphabet: strictly [a-z]* (the reference's contract).
        assert re.fullmatch(r"[a-z]*", r.term), r.term
        # Idempotence: normalizing twice changes nothing.
        assert r.term == r.term2


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_postings_invariant_under_repartitioning(spark, texts):
    from mapreduceindexer_spark.operators.index import build_postings

    rows = [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(map(tuple, build_postings(docs).collect()))
    shuffled = sorted(
        map(tuple, build_postings(docs.repartition(7, "doc_id")).collect())
    )
    single = sorted(map(tuple, build_postings(docs.coalesce(1)).collect()))
    assert base == shuffled == single
