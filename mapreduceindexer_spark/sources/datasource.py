"""Custom Python DataSource (Spark 4 extension API): the reference's
manifest-driven text-corpus format as a first-class ``spark.read``
connector.

``sources/corpus.py`` reads the same format by composing built-ins
(driver-parsed manifest + ``spark.read.text`` + broadcast id join). This
module exposes the identical relation through Spark 4's
``pyspark.sql.datasource`` plug-in point — the surface a user extends
when a corpus lives in a format no built-in reader speaks (proprietary
archives, WARC-ish containers, seekable tars). The two paths are pinned
equal by tests/test_datasource.py.

Design points that matter at scale:

- **Doc IDs ride the partition plan, not task order.** The manifest is
  parsed once at planning time (``partitions()``) and each
  ``InputPartition`` carries its own (doc_id, path) slice — the
  reference's "ID = manifest slot, never claim order" contract
  (``src/functions.cpp:64-66``) holds under any scheduling, retries
  included (a re-run partition re-reads the same slice).
- **One partition per ``files_per_task`` batch** — scan parallelism is
  explicit and data-independent; Spark schedules the batches like any
  other splits.
- The reader runs in Python workers (this API's inherent cost); it is
  the INGEST edge, not the hot path — everything downstream is a normal
  DataFrame. For formats a JVM reader speaks, prefer the built-in
  (``corpus.py``); this is the checked escape hatch, same philosophy as
  the UDTF beside the relational top-k.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from mapreduceindexer_spark.sources.corpus import parse_manifest


class CorpusDataSource(DataSource):
    """``spark.read.format("mri_corpus")`` — options:

    - ``manifest`` (required): path to the ``N path1 .. pathN`` manifest;
    - ``base_dir`` (optional): resolution root for relative entries;
    - ``files_per_task`` (optional, default 8): partition batch size.
    """

    @classmethod
    def name(cls) -> str:
        return "mri_corpus"

    def schema(self) -> str:
        return "doc_id int, path string, text string"

    def reader(self, schema) -> "CorpusReader":
        return CorpusReader(self.options)


class _CorpusSlice(InputPartition):
    def __init__(self, docs: list[tuple[int, str]]):
        self.docs = docs


class CorpusReader(DataSourceReader):
    def __init__(self, options):
        manifest = options.get("manifest")
        if not manifest:
            raise ValueError("mri_corpus requires option 'manifest'")
        base_dir = options.get("base_dir")
        self._batch = int(options.get("files_per_task", "8"))
        import os

        self._docs = [
            (i + 1, os.path.abspath(p))
            for i, p in enumerate(parse_manifest(manifest, base_dir))
        ]

    def partitions(self):
        b = self._batch
        return [
            _CorpusSlice(self._docs[i : i + b])
            for i in range(0, len(self._docs), b)
        ] or [_CorpusSlice([])]

    def read(self, partition: _CorpusSlice):
        for doc_id, path in partition.docs:
            with open(path, encoding="utf-8", errors="replace") as fh:
                yield (doc_id, path, fh.read())


def register_corpus_source(spark) -> None:
    """Idempotently register the ``mri_corpus`` format on this session."""
    spark.dataSource.register(CorpusDataSource)
