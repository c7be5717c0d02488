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
