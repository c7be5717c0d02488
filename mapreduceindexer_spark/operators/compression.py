"""Posting-list compression: delta + LEB128 varint encoding.

The reference materializes postings as decimal text, one doc ID per token
(``src/functions.cpp:140-152``); a production index stores the ascending
ID list as *gaps* (first ID, then successive differences) with each gap
LEB128-varint coded — the standard inverted-index layout (Lucene's
postings format, "Managing Gigabytes" ch. 3). Gaps are small where a term
is dense, so the hot lists compress hardest: the corpus-stopword list that
is the skew hazard everywhere else becomes ~1 byte/posting here.

Spark-first shape:

- Encoding runs as an Arrow-batched ``mapInPandas`` over the *already
  aggregated* postings relation — one Python pass over |vocabulary| rows
  (never |corpus| rows), each batch a few thousand arrays. There is no
  built-in varint, so this is a legitimate Python seam; everything before
  it (tokenize → distinct → collect_set) stays JVM-side.
- The encoded column is plain ``binary``: it parquet-encodes cleanly,
  prunes like any other column, and downstream search can decode lazily
  per term (decode cost is proportional to the one list being read).
- At 100 TB the relation arrives letter- or hash-partitioned from the
  index build; encoding is embarrassingly parallel and adds no exchange.

Determinism: the byte stream is a pure function of the sorted ID list, so
the encoded length is exactly reproducible by arithmetic on the gaps —
which is what the catalog oracle recomputes in SQL (and the roundtrip
``decode(encode(x)) == x`` is pinned in tests/test_compression.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def varint_encode(values: list[int]) -> bytes:
    """Delta + LEB128: first ID absolute, then strictly-positive gaps."""
    out = bytearray()
    prev = 0
    first = True
    for v in values:
        gap = v if first else v - prev
        first = False
        prev = v
        if gap < 0:
            raise ValueError("doc_ids must be ascending")
        while True:
            b = gap & 0x7F
            gap >>= 7
            if gap:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varint_decode(data: bytes) -> list[int]:
    """Inverse of :func:`varint_encode`."""
    values: list[int] = []
    acc = 0
    shift = 0
    prev = 0
    first = True
    for byte in data:
        acc |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
            continue
        prev = acc if first else prev + acc
        values.append(prev)
        first = False
        acc = 0
        shift = 0
    if shift:
        raise ValueError("truncated varint stream")
    return values


def compress_postings(postings: DataFrame) -> DataFrame:
    """postings(term, letter, doc_ids, df) → + ``encoded`` binary column.

    Arrow-batched: each pandas batch maps its list column through the pure
    Python coder; no shuffle is introduced (narrow transformation over
    however the postings relation is already partitioned).
    """
    fields = postings.schema.fieldNames()
    out_schema = "term string, letter string, df bigint, encoded binary"

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "letter": pdf["letter"],
                    "df": pdf["df"],
                    "encoded": pdf["doc_ids"].map(
                        lambda ids: varint_encode([int(x) for x in ids])
                    ),
                }
            )

    assert {"term", "letter", "doc_ids", "df"} <= set(fields)
    return postings.select("term", "letter", "doc_ids", "df").mapInPandas(
        encode_batches, schema=out_schema
    )


def compression_stats(postings: DataFrame) -> DataFrame:
    """Per-term compression ledger, derived from the ACTUAL encoded bytes.

    ``raw_bytes`` is the uncompressed fixed-width cost (8 bytes/ID);
    ``varint_bytes`` measures the real ``encoded`` column, so any encoder
    bug shows up against the oracle's arithmetic prediction.
    """
    enc = compress_postings(postings)
    varint_bytes = F.octet_length("encoded").cast("bigint")
    raw_bytes = (F.col("df") * 8).cast("bigint")
    return enc.select(
        "term",
        "df",
        raw_bytes.alias("raw_bytes"),
        varint_bytes.alias("varint_bytes"),
        # permille via floor(IEEE double division) — bit-identical across
        # engines (a decimal ratio would hit division-scale differences).
        F.floor(varint_bytes * 1000 / raw_bytes).cast("bigint").alias("permille"),
    )


def elias_fano_encode(values: list[int]) -> tuple[bytes, bytes, int]:
    """Elias-Fano encoding of a strictly increasing non-negative ID list
    (Vigna, "Quasi-succinct indices", WSDM'13 — the posting layout in
    modern engines where random access into the list matters):

    - ``l = max(0, floor(log2(u / n)))`` low bits per value (``u`` =
      max + 1) packed little-endian into the LOW stream;
    - the HIGH stream sets bit ``(v >> l) + i`` for the i-th value
      (unary-coded high parts): ``n + (max >> l) + 1`` bits total.

    Returns (low_bytes, high_bytes, l). Size is within a factor ~2 of
    the information-theoretic minimum and supports O(1) select —
    something delta+varint cannot do without skip lists.
    """
    n = len(values)
    if n == 0:
        return b"", b"", 0
    mx = values[-1]
    u = mx + 1
    l = (u // n).bit_length() - 1 if u >= n else 0
    low = bytearray()
    acc = 0
    nbits = 0
    prev = -1
    for v in values:
        if v <= prev:
            raise ValueError("doc_ids must be strictly increasing")
        prev = v
        if l:
            acc |= (v & ((1 << l) - 1)) << nbits
            nbits += l
            while nbits >= 8:
                low.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
    if nbits:
        low.append(acc & 0xFF)
    high_bits = n + (mx >> l) + 1
    high = bytearray((high_bits + 7) // 8)
    for i, v in enumerate(values):
        pos = (v >> l) + i
        high[pos // 8] |= 1 << (pos % 8)
    return bytes(low), bytes(high), l


def elias_fano_decode(low: bytes, high: bytes, l: int, n: int) -> list[int]:
    """Inverse of ``elias_fano_encode``: walk the high stream's set bits
    (the i-th set bit at position p encodes high part ``p - i``), pair
    with the i-th low-bits group."""
    if n == 0:
        return []
    out = []
    i = 0
    for pos in range(len(high) * 8):
        if high[pos // 8] & (1 << (pos % 8)):
            hi = pos - i
            lo = 0
            if l:
                bit0 = i * l
                for b in range(l):
                    bit = bit0 + b
                    if low[bit // 8] & (1 << (bit % 8)):
                        lo |= 1 << b
            out.append((hi << l) | lo)
            i += 1
            if i == n:
                break
    return out


def elias_fano_stats(postings: DataFrame) -> DataFrame:
    """(term, df, raw_bytes, ef_bytes, varint_bytes): REAL encoded sizes
    of both codecs per posting list, Arrow-batched over the aggregated
    relation (same one-pass-over-vocabulary shape as
    ``compression_stats``). The oracle predicts ``ef_bytes`` exactly
    from (n, max) arithmetic and ``varint_bytes`` from the gap
    distribution, so either encoder drifting breaks the value hash."""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ef_bytes = []
            vi_bytes = []
            for ids in pdf["doc_ids"]:
                ids = [int(x) for x in ids]
                low, high, _l = elias_fano_encode(ids)
                ef_bytes.append(len(low) + len(high))
                vi_bytes.append(len(varint_encode(ids)))
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "df": pdf["df"],
                    "raw_bytes": [int(d) * 8 for d in pdf["df"]],
                    "ef_bytes": ef_bytes,
                    "varint_bytes": vi_bytes,
                }
            )

    return postings.select("term", "df", "doc_ids").mapInPandas(
        encode_batches,
        "term string, df bigint, raw_bytes bigint, ef_bytes bigint,"
        " varint_bytes bigint",
    )
