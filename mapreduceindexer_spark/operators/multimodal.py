"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Design (the part that matters at 100 TB):

- blobs live in a ``content BINARY`` column next to typed metadata
  (``media_type``, ``n_bytes``, digest) — scans that only need metadata
  never deserialize bytes (column pruning does the work);
- per-blob compute (decode, resize, frame-sample, feature-extract) runs as
  Arrow-batched ``mapInPandas``: Python sees a few thousand rows per batch,
  bytes cross the JVM↔Python boundary once, output schema is declared up
  front so Catalyst keeps planning around the opaque stage;
- heavy decode stages repartition first so batches are even and an
  executor never holds more than ``maxRecordsPerBatch`` blobs in memory.

The container ships no image/audio codecs, so the decode kernel is a
deterministic FAKE (dimensions derived from the content digest) behind the
same plumbing a real Pillow/ffmpeg kernel would use; ``decode_kernel='real'``
raises NotImplementedError at the exact seam where the real library call
belongs. Schema, batching, partitioning, and UDF signature are real and
tested — swap the kernel, keep the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, n_frames int, ok boolean"
)


def with_binary_content(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata (here: the UTF-8
    bytes of ``text`` stand in for real media blobs)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    """Metadata-only projection: never touches the binary column, so the
    parquet scan prunes it away entirely."""
    return with_binary_content(docs).select("doc_id", "n_bytes", "content_md5")


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decoder: 'dimensions' are
    a pure function of the content digest, so tests are reproducible."""
    d = hashlib.md5(content).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    n_frames = 1 + d[2] % 8
    return width, height, n_frames


def decode_media(media: DataFrame, decode_kernel: str = "fake") -> DataFrame:
    """Decode blobs to typed features via Arrow-batched ``mapInPandas``.

    ``media`` needs (doc_id, content, media_type). Output schema is
    ``DECODED_SCHEMA``. This is the ONLY Python-side operator in the repo —
    everything expressible with built-ins stays JVM-side; decoding
    genuinely is not.
    """
    if decode_kernel not in ("fake", "real"):
        raise ValueError(f"unknown decode kernel: {decode_kernel}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_kernel == "real":
                # Real kernel seam: Pillow / torchaudio / pyav goes here.
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "use decode_kernel='fake' (deterministic stub)"
                )
            decoded = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "ok": True,
                }
            )

    return media.select("doc_id", "content", "media_type").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )
