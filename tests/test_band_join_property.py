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


def test_interval_overlap_matches_bruteforce_property(spark):
    """Property: the bin-bucketed interval join equals the O(n^2)
    per-user brute force on randomized small inputs — bin boundaries,
    touching endpoints, zero-length and bin-spanning intervals all
    land in the random space."""
    import datetime as dt
    import random

    from mapreduceindexer_spark.operators.events import interval_overlap_stats

    t0 = dt.datetime(2024, 1, 1)
    for trial in range(6):
        rng = random.Random(trial)
        rows = []
        for eid in range(40):
            uid = rng.randrange(4)
            start_min = rng.uniform(0, 300)
            dur_min = rng.choice([0.0, rng.uniform(0, 30), rng.uniform(0, 200)])
            rows.append(
                (eid, t0 + dt.timedelta(minutes=start_min), uid, "x",
                 round(dur_min, 2), "{}")
            )
        events = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        )
        got = {r["user_id"]: (r["n_overlaps"], r["overlap_us"]) for r in
               interval_overlap_stats(events).collect()}
        # Brute force with the identical integer-microsecond arithmetic.
        iv = []
        for eid, ts, uid, _, val, _ in rows:
            s = int(ts.timestamp() * 1_000_000)
            iv.append((uid, eid, s, s + round(val * 60_000_000)))
        want = {}
        for i in range(len(iv)):
            for j in range(i + 1, len(iv)):
                a, b = iv[i], iv[j]
                if a[0] != b[0]:
                    continue
                lo, hi = (a, b) if a[1] < b[1] else (b, a)
                if lo[2] <= hi[3] and hi[2] <= lo[3]:
                    n, tot = want.get(a[0], (0, 0))
                    want[a[0]] = (
                        n + 1,
                        tot + min(a[3], b[3]) - max(a[2], b[2]),
                    )
        assert got == want, f"trial {trial}"
