"""Multimodal plumbing tests: binary columns, metadata pruning, and the
Arrow-batched mapInPandas decode stage (deterministic fake kernel)."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from mapreduceindexer_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents")


def test_binary_content_roundtrip(docs):
    from mapreduceindexer_spark.operators.multimodal import with_binary_content

    rows = with_binary_content(docs).limit(5).collect()
    for r in rows:
        assert isinstance(r.content, (bytes, bytearray))
        assert r.n_bytes == len(r.content)
        assert r.content_md5 == hashlib.md5(bytes(r.content)).hexdigest()


def test_decode_media_fake_kernel_deterministic(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        with_binary_content,
    )

    media = with_binary_content(docs)
    a = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(media).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(media).collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 and 1 <= f <= 8 for (w, h, f) in a.values())
    assert len(a) == media.count()


def test_decode_media_real_kernel_raises(docs, spark):
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        with_binary_content,
    )

    media = with_binary_content(docs).limit(1)
    with pytest.raises(Exception) as exc:
        decode_media(media, decode_kernel="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_feature_extraction_unit_norm(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        with_binary_content,
    )

    rows = extract_features(with_binary_content(docs).limit(20)).collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        norm = sum(x * x for x in r.feature) ** 0.5
        assert abs(norm - 1.0) < 1e-5, norm


def test_resize_bounds_dimensions(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        resize_media,
        with_binary_content,
    )

    media = with_binary_content(docs).limit(20)
    orig = {r.doc_id: len(r.content) for r in media.collect()}
    for r in resize_media(media, max_side=32).collect():
        assert max(r.width, r.height) <= 32
        assert 1 <= len(r.content) <= orig[r.doc_id]


def test_sample_frames_expands_rows(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        sample_frames,
        with_binary_content,
    )

    media = with_binary_content(docs).limit(20)
    n_frames = {r.doc_id: r.n_frames for r in decode_media(media).collect()}
    got = {}
    for r in sample_frames(media, every_k=2).collect():
        got.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in got.items():
        # Every 2nd frame of the decoded n_frames, starting at 0.
        assert sorted(idxs) == list(range(0, n_frames[doc_id], 2))


def test_unknown_kernel_rejected(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        with_binary_content,
    )

    with pytest.raises(ValueError):
        decode_media(with_binary_content(docs), decode_kernel="gpu")


def test_ppm_real_decode_roundtrip(spark):
    """The PPM path is a REAL decoder, not a stub: encoded dimensions must
    round-trip through the Arrow-batched parse, and a corrupted blob must
    degrade to ok=false per row without failing the batch."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.multimodal import (
        _ppm_blob,
        decode_ppm,
        with_ppm_content,
    )
    from mapreduceindexer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(50)
    media = with_ppm_content(docs)
    got = {r.doc_id: (r.width, r.height, r.ok) for r in decode_ppm(media).collect()}
    want = {}
    for r in docs.collect():
        d = hashlib.md5(str(r.text).encode()).digest()
        want[r.doc_id] = (4 + d[0] % 13, 4 + d[1] % 13, True)
    assert got == want

    # Corruption containment: truncate pixel data -> ok=false, zeros.
    corrupt = media.withColumn(
        "content", F.expr("substring(content, 1, 20)")
    )
    bad = decode_ppm(corrupt).collect()
    assert all((not r.ok) and r.width == 0 for r in bad)


def test_ppm_parser_handles_comments_and_rejects_garbage(spark):
    from mapreduceindexer_spark.operators.multimodal import _ppm_blob, _ppm_decode

    blob = _ppm_blob(b"seed", 5, 7)
    assert _ppm_decode(blob) == (5, 7, 1)
    commented = blob.replace(b"P6\n", b"P6\n# a comment line\n", 1)
    assert _ppm_decode(commented) == (5, 7, 1)
    assert _ppm_decode(b"JFIF garbage") is None
    assert _ppm_decode(b"P6\n-3 4\n255\n" + b"\x00" * 100) is None


def test_wav_real_decode_roundtrip(spark):
    """The WAV path is a REAL decoder (second codec-free kernel): encoded
    rate/channels/length must round-trip through the Arrow-batched chunk
    walk, and a truncated blob must degrade to ok=false per row."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.multimodal import (
        _WAV_RATES,
        decode_wav,
        with_wav_content,
    )
    from mapreduceindexer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(50)
    media = with_wav_content(docs)
    got = {
        r.doc_id: (r.sample_rate, r.n_channels, r.bits, r.n_samples, r.ok)
        for r in decode_wav(media).collect()
    }
    want = {}
    for r in docs.collect():
        d = hashlib.md5(str(r.text).encode()).digest()
        want[r.doc_id] = (
            _WAV_RATES[d[2] % 4],
            1 + d[3] % 2,
            16,
            64 + ((d[4] << 8) | d[5]) % 1024,
            True,
        )
    assert got == want

    # Corruption containment: truncate sample data -> ok=false, zeros.
    corrupt = media.withColumn("content", F.expr("substring(content, 1, 60)"))
    bad = decode_wav(corrupt).collect()
    assert all((not r.ok) and r.sample_rate == 0 for r in bad)


def test_wav_parser_reads_samples_and_rejects_garbage():
    """The parser must actually read the PCM payload (peak amplitude
    matches an independent sample scan) and reject structurally broken
    RIFF containers."""
    import struct

    from mapreduceindexer_spark.operators.multimodal import _wav_blob, _wav_decode

    blob = _wav_blob(b"seed", 16000, 2, 100)
    got = _wav_decode(blob)
    assert got is not None
    rate, channels, bits, n_frames, peak = got
    assert (rate, channels, bits, n_frames) == (16000, 2, 16, 100)
    # Independent peak: unpack the data chunk directly.
    data = blob[44:]
    samples = struct.unpack(f"<{len(data) // 2}h", data)
    assert peak == max(abs(s) for s in samples)

    assert _wav_decode(b"OggS not a wav") is None
    assert _wav_decode(blob[:30]) is None                      # truncated header
    assert _wav_decode(blob[:44] + data[: len(data) // 2]) is None  # short data
    # Non-PCM encoding (format tag 3 = IEEE float) is rejected.
    nonpcm = bytearray(blob)
    nonpcm[20:22] = struct.pack("<H", 3)
    assert _wav_decode(bytes(nonpcm)) is None
    # A LIST chunk before fmt/data is skipped via word-aligned walking.
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    padded = blob[:12] + lst + blob[12:]
    head = bytearray(padded)
    head[4:8] = struct.pack("<I", len(padded) - 8)
    assert _wav_decode(bytes(head)) == got


def test_png_real_decode_roundtrip(spark):
    """End-to-end PNG: generated baseline blobs decode back to the exact
    digest-predicted dimensions/channels, and the decoded PIXELS equal
    the generator's md5 stream bit-for-bit (all five filter types must
    invert correctly for this to hold)."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.multimodal import (
        _png_decode_pixels,
        decode_png,
        with_png_content,
    )
    from mapreduceindexer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    media = with_png_content(docs)
    got = {
        r.doc_id: (r.width, r.height, r.n_channels, r.n_frames, r.ok)
        for r in decode_png(media).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        d = hashlib.md5(str(r.text).encode()).digest()
        want[r.doc_id] = (4 + d[6] % 13, 4 + d[7] % 13, 3 + d[8] % 2, 1, True)
    assert got == want

    # Pixel payload round-trip: decode one blob in-process and compare
    # against the generator's md5 stream.
    row = media.limit(1).collect()[0]
    out = _png_decode_pixels(bytes(row.content))
    assert out is not None
    w, h, c, px = out
    src = docs.filter(F.col("doc_id") == row.doc_id).collect()[0]
    d = hashlib.md5(str(src.text).encode()).digest()
    n = w * h * c
    exp = bytearray()
    k = 0
    while len(exp) < n:
        exp.extend(hashlib.md5(d + k.to_bytes(4, "big")).digest())
        k += 1
    assert px == bytes(exp[:n])

    # Corruption containment: truncated blobs -> ok=false, zeroed fields.
    corrupt = media.withColumn("content", F.expr("substring(content, 1, 40)"))
    bad = decode_png(corrupt).collect()
    assert all((not r.ok) and r.width == 0 for r in bad)


def test_png_parser_verifies_structure():
    """CRC damage, interlacing, odd bit depths, unknown filters, and
    truncated pixel streams must all be rejected; every one of the five
    filter types must appear across the generated scanlines (otherwise
    the round-trip test would not prove full unfilter coverage)."""
    import struct
    import zlib

    from mapreduceindexer_spark.operators.multimodal import (
        _png_blob,
        _png_decode_pixels,
    )

    blob = _png_blob(b"structseed", 9, 11, 4, 0)  # fseed 0 -> filters 0..4
    got = _png_decode_pixels(blob)
    assert got is not None and got[:3] == (9, 11, 4)

    assert _png_decode_pixels(b"\x89PNG not really") is None
    assert _png_decode_pixels(blob[:-20]) is None  # missing IEND

    # Flip one IDAT byte: CRC verification must catch it.
    bad = bytearray(blob)
    bad[8 + 25 + 10] ^= 0x40  # inside IDAT data
    assert _png_decode_pixels(bytes(bad)) is None

    # Interlaced flag rejected (Adam7 unsupported by a baseline decoder).
    ihdr = struct.pack(">IIBBBBB", 9, 11, 8, 6, 0, 0, 1)
    inter = (
        blob[:8]
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + (zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
        + blob[8 + 25 :]
    )
    assert _png_decode_pixels(inter) is None

    # Unknown filter type in the scanline stream.
    stride = 9 * 4
    scan = bytearray((1 + stride) * 11)
    scan[0] = 7  # invalid filter
    body = zlib.compress(bytes(scan))
    from mapreduceindexer_spark.operators.multimodal import _png_chunk

    ihdr_ok = struct.pack(">IIBBBBB", 9, 11, 8, 6, 0, 0, 0)
    crafted = (
        blob[:8]
        + _png_chunk(b"IHDR", ihdr_ok)
        + _png_chunk(b"IDAT", body)
        + _png_chunk(b"IEND", b"")
    )
    assert _png_decode_pixels(crafted) is None


def test_decoders_contain_null_content(spark):
    """A NULL content cell must yield ok=false, never kill the Arrow
    batch — per-row error containment includes missing blobs."""
    from mapreduceindexer_spark.operators.multimodal import (
        decode_png,
        decode_ppm,
        decode_wav,
    )

    media = spark.createDataFrame(
        [(1, None, "image/png"), (2, b"not a blob", "image/png")],
        "doc_id bigint, content binary, media_type string",
    )
    for dec in (decode_png, decode_ppm, decode_wav):
        rows = {r.doc_id: r.ok for r in dec(media).collect()}
        assert rows == {1: False, 2: False}, (dec.__name__, rows)


def test_fake_kernels_contain_null_content(spark):
    """The fake-kernel stages share the real decoders' containment
    contract: a NULL content cell must never kill the Arrow batch —
    decode_media flags ok=false; the schema-total stages (features,
    resize, frames) treat a missing blob as the empty blob."""
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        extract_features,
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, None, "video/fake"), (2, b"blob bytes", "video/fake")],
        "doc_id bigint, content binary, media_type string",
    )
    dec = {r.doc_id: r.ok for r in decode_media(media).collect()}
    assert dec == {1: False, 2: True}, dec
    feats = {r.doc_id: r.feature for r in extract_features(media).collect()}
    assert set(feats) == {1, 2} and len(feats[1]) == 16
    sizes = {r.doc_id for r in resize_media(media).collect()}
    assert sizes == {1, 2}
    frames = {r.doc_id for r in sample_frames(media).collect()}
    assert frames == {1, 2}


def test_gif_lzw_round_trip_fuzz():
    """Own-LZW encoder/decoder round trip across alphabet sizes and
    lengths, including dictionary growth, code-width bumps, and the
    4096-entry clear-code reset."""
    import random

    from mapreduceindexer_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    for trial in range(40):
        rng = random.Random(trial)
        mcs = rng.randint(2, 8)
        n = rng.randint(1, 4000)
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert _gif_lzw_decode(_gif_lzw_encode(data, mcs), mcs, n) == data
    # Forced dictionary reset (small alphabet, long stream).
    rng = random.Random(99)
    data = bytes(rng.randrange(4) for _ in range(20000))
    assert _gif_lzw_decode(_gif_lzw_encode(data, 2), 2, 20000) == data


def test_gif_generator_decoder_pixel_round_trip():
    import hashlib

    from mapreduceindexer_spark.operators import multimodal as mm

    for text in ["alpha", "beta", "gamma-very-long-" * 50]:
        d = hashlib.md5(text.encode()).digest()
        w, h, bits = 4 + d[0] % 13, 4 + d[1] % 13, 1 + d[2] % 8
        got = mm._gif_decode(mm._gif_blob(d, w, h, bits))
        assert got is not None
        gw, gh, ps, px = got
        assert (gw, gh, ps) == (w, h, 1 << bits)
        n = (1 << bits) * 3 + w * h
        stream = bytearray()
        c = 0
        while len(stream) < n:
            stream.extend(hashlib.md5(d + c.to_bytes(4, "big")).digest())
            c += 1
        assert px == bytes(b % (1 << bits) for b in stream[(1 << bits) * 3 : n])


def test_gif_decode_malformed_containment(spark):
    """Malformed/NULL blobs yield ok=false rows, never a failed batch."""
    from mapreduceindexer_spark.operators import multimodal as mm

    bad = spark.createDataFrame(
        [
            (1, bytearray(b"NOTAGIF"), "image/gif"),
            (2, None, "image/gif"),
            (3, bytearray(b"GIF89a\x05\x00"), "image/gif"),
        ],
        "doc_id bigint, content binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in mm.decode_gif(bad).collect()}
    assert not any(rows[i]["ok"] for i in (1, 2, 3))
    assert all(rows[i]["width"] == 0 for i in (1, 2, 3))
