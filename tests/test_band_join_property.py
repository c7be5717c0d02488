"""Property test: the bucketed band join is semantically identical to the
naive interval-containment join for arbitrary bands and values — including
bands that span many buckets, empty bands, values on bucket boundaries,
and overlapping bands (a value matching several bands appears once per
matching band)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceindexer_spark.operators.relational import band_join_bucketed

VALUES = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=25,
)
BANDS = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
        st.floats(min_value=0.0, max_value=40.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(VALUES, BANDS, st.sampled_from([1.0, 7.5, 33.0]))
def test_bucketed_band_join_equals_naive(spark, values, lohis, width):
    fact = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "rid INT, v DOUBLE")
    bands = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(lohis)],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    got = {
        (r.rid, r.band_id)
        for r in band_join_bucketed(fact, bands, "v", width).select("rid", "band_id").collect()
    }
    expected = {
        (i, b)
        for i, v in enumerate(values)
        for b, (lo, span) in enumerate(lohis)
        if lo <= v < lo + span
    }
    assert got == expected
