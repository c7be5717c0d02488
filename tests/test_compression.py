"""Posting-list delta+varint compression: roundtrip + length invariants.

The catalog oracle (q_postings_compress) verifies the encoded LENGTHS
against an arithmetic prediction; these tests pin the part SQL cannot see —
that the bytes actually decode back to the original ID lists — plus the
coder's unit edge cases.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceindexer_spark.operators.compression import (
    compress_postings,
    varint_decode,
    varint_encode,
)
from mapreduceindexer_spark.operators.index import build_postings
from mapreduceindexer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_varint_unit_cases():
    assert varint_encode([]) == b""
    assert varint_decode(b"") == []
    assert varint_encode([0]) == b"\x00"
    assert varint_encode([127]) == b"\x7f"
    assert varint_encode([128]) == b"\x80\x01"
    # gaps: [300, 301] -> 300 absolute (2 bytes), gap 1 (1 byte)
    assert len(varint_encode([300, 301])) == 3
    big = 2**62
    assert varint_decode(varint_encode([big])) == [big]


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), unique=True, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(ids):
    ids = sorted(ids)
    assert varint_decode(varint_encode(ids)) == ids


def test_spark_encoded_postings_roundtrip(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    postings = build_postings(docs)
    original = {
        r["term"]: list(r["doc_ids"]) for r in postings.collect()
    }
    encoded = {
        r["term"]: bytes(r["encoded"])
        for r in compress_postings(postings).collect()
    }
    assert set(encoded) == set(original)
    for term, ids in original.items():
        assert varint_decode(encoded[term]) == ids, term


def test_compression_never_expands_and_helps_dense_lists(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    postings = build_postings(docs)
    from mapreduceindexer_spark.operators.compression import compression_stats

    rows = compression_stats(postings).collect()
    assert rows
    for r in rows:
        # 8-byte fixed width is the upper bound (worst gap fits 9 bytes
        # only above 2^56, impossible for these IDs).
        assert r["varint_bytes"] <= r["raw_bytes"]
    # the densest list (most doc_ids => smallest gaps) must compress hard:
    densest = max(rows, key=lambda r: r["df"])
    assert densest["permille"] <= 250  # <= 2 bytes/posting vs 8


def test_elias_fano_roundtrip_fuzz():
    """decode(encode(x)) == x across densities, plus the exact size
    formula the oracle replays (low + high byte counts)."""
    import random

    from mapreduceindexer_spark.operators.compression import (
        elias_fano_decode,
        elias_fano_encode,
    )

    for trial in range(60):
        rng = random.Random(trial)
        n = rng.randint(1, 300)
        universe = rng.randint(n, n * rng.choice([1, 2, 50, 1000]))
        vals = sorted(rng.sample(range(universe), n))
        low, high, l = elias_fano_encode(vals)
        assert elias_fano_decode(low, high, l, n) == vals
        mx = vals[-1]
        el = ((mx + 1) // n).bit_length() - 1 if mx + 1 >= n else 0
        assert l == el
        assert len(low) + len(high) == (n * el + 7) // 8 + (
            n + (mx >> el) + 1 + 7
        ) // 8
    assert elias_fano_encode([]) == (b"", b"", 0)
    assert elias_fano_decode(b"", b"", 0, 0) == []


def test_elias_fano_rejects_non_increasing():
    import pytest

    from mapreduceindexer_spark.operators.compression import elias_fano_encode

    with pytest.raises(ValueError):
        elias_fano_encode([1, 1])
    with pytest.raises(ValueError):
        elias_fano_encode([3, 2])
