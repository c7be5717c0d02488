"""Corpus manifest + document scan sources.

Reference semantics (gabrieltintu/MapReduceIndexer):
- Manifest: first token N, then N file paths; a document's ID is its
  1-based position in the manifest, independent of processing order
  (``src/functions.cpp:14-37`` parse, ``:64-66`` doc-ID assignment).
- Document scan: each listed file is read as whitespace-separated tokens
  (``src/functions.cpp:71-87``).

Spark design: the manifest is tiny (a list of paths) so it is parsed on the
driver; the *documents* are read distributed via ``spark.read.text`` with
``wholetext`` and joined back to manifest position by file path. Doc IDs are
therefore deterministic regardless of partitioning/task order — the Spark
equivalent of the reference's "ID = manifest slot, not claim order" contract.
At 100 TB the manifest-on-driver step is replaced by a ``documents`` table
that already carries ``doc_id`` (the driver's synthetic table does exactly
this), so nothing here is on the hot path at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_manifest(manifest_path: str, base_dir: str | None = None) -> list[str]:
    """Parse ``N path1 .. pathN`` (whitespace-separated, like ``fin >>``).

    Paths resolve relative to ``base_dir`` (defaults to the manifest's
    directory — the reference hard-codes ``../checker/`` instead,
    ``src/functions.cpp:71-72``).
    """
    with open(manifest_path, encoding="utf-8", errors="replace") as fh:
        tokens = fh.read().split()
    n = int(tokens[0])
    paths = tokens[1 : n + 1]
    if len(paths) != n:
        raise ValueError(f"manifest declares {n} files, lists {len(paths)}")
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(manifest_path))
    return [os.path.join(base_dir, p) for p in paths]


def read_manifest_corpus(
    spark: SparkSession, manifest_path: str, base_dir: str | None = None
) -> DataFrame:
    """Read a manifest-described corpus into ``documents(doc_id, path, text)``.

    ``doc_id`` is the 1-based manifest position. Files are read in parallel
    (one Spark task per file via ``wholetext``); the path→doc_id mapping is a
    broadcast-joined dimension, so IDs stay deterministic under any
    parallelism — mirroring the reference's checker requirement that output
    be identical for every (M,R) thread configuration
    (``checker/checker.sh:141-247``).
    """
    paths = parse_manifest(manifest_path, base_dir)
    id_rows = [(i + 1, os.path.abspath(p)) for i, p in enumerate(paths)]
    ids = spark.createDataFrame(id_rows, "doc_id INT, path STRING")

    docs = (
        spark.read.text(paths, wholetext=True)
        .withColumn("path", F.input_file_name())
        # input_file_name returns a percent-encoded file: URI; strip the
        # scheme AND decode (%20 etc.) so paths with spaces/non-ASCII still
        # match the manifest's plain paths.
        .withColumn("path", F.url_decode(F.regexp_replace("path", "^file:(//)?", "")))
        .withColumnRenamed("value", "text")
    )
    # ids is the small side (just the manifest): broadcast it so the
    # document scan never shuffles.
    corpus = docs.join(F.broadcast(ids), "path", "inner").select("doc_id", "path", "text")
    # Fail loudly if any manifest entry was dropped (path mismatch) or
    # multiplied (duplicate manifest entries): the reference assigns exactly
    # one doc ID per manifest slot.
    n = corpus.count()
    if n != len(paths):
        raise ValueError(
            f"corpus join produced {n} rows for {len(paths)} manifest entries; "
            "path normalization mismatch or duplicate manifest paths"
        )
    return corpus
