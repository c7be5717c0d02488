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
    from py4j.protocol import Py4JJavaError

    media = with_binary_content(docs).limit(1)
    with pytest.raises(Exception) as exc:
        decode_media(media, decode_kernel="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_unknown_kernel_rejected(docs):
    from mapreduceindexer_spark.operators.multimodal import (
        decode_media,
        with_binary_content,
    )

    with pytest.raises(ValueError):
        decode_media(with_binary_content(docs), decode_kernel="gpu")
