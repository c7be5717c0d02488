"""Custom Python DataSource (Spark 4 plug-in API): the ``mri_corpus``
format must produce the exact relation the built-in composition
(``sources/corpus.py``) produces, with deterministic doc IDs under any
partitioning — including batch sizes that force multiple partitions."""

from __future__ import annotations

import os

from mapreduceindexer_spark.sources.corpus import read_manifest_corpus
from mapreduceindexer_spark.sources.datasource import register_corpus_source

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
MANIFEST = os.path.join(FIXTURES, "manifest_small.txt")


def _read_via_datasource(spark, files_per_task: int):
    register_corpus_source(spark)
    return (
        spark.read.format("mri_corpus")
        .option("manifest", MANIFEST)
        .option("files_per_task", str(files_per_task))
        .load()
    )


def test_datasource_matches_builtin_composition(spark):
    want = sorted(
        (r["doc_id"], os.path.basename(r["path"]), r["text"])
        for r in read_manifest_corpus(spark, MANIFEST).collect()
    )
    got = sorted(
        (r["doc_id"], os.path.basename(r["path"]), r["text"])
        for r in _read_via_datasource(spark, files_per_task=8).collect()
    )
    assert got == want


def test_datasource_ids_stable_across_partitionings(spark):
    a = sorted(
        (r["doc_id"], r["text"])
        for r in _read_via_datasource(spark, files_per_task=1).collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in _read_via_datasource(spark, files_per_task=100).collect()
    )
    assert a == b
    # files_per_task=1 must actually fan out to one partition per file.
    df = _read_via_datasource(spark, files_per_task=1)
    assert df.rdd.getNumPartitions() >= df.count()


def test_datasource_missing_manifest_option_fails_loudly(spark):
    import pytest

    register_corpus_source(spark)
    with pytest.raises(Exception, match="manifest"):
        spark.read.format("mri_corpus").load().collect()
