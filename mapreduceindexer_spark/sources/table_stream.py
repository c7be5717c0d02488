"""Streaming SOURCE over the transactional table's change feed —
``spark.readStream.format("mri_table").option("path", ...)`` (Spark 4
Python DataSource streaming API).

This closes the table↔stream loop: the engine already streams INTO the
table (``streaming/table_sink.py``, exactly-once via batch-id-in-
manifest) and reads deltas in batch (``transact.read_changes``); this
module makes the table a first-class INCREMENTAL source, the shape
Delta/Iceberg expose so one table can fan out to many independent
streaming consumers, each tracking its own position in the commit log.

Semantics (same contract as ``read_changes``, shared code):

- **Offsets are table VERSIONS.** ``initialOffset`` is 0 (or the
  ``starting_version`` option); ``latestOffset`` is the table's current
  version. A microbatch (start, end] materializes exactly the snapshot
  dirs APPENDED in that version range — the manifest dir-diff, no data
  diffing, planned entirely from the (tiny) manifest JSONs.
- **One InputPartition per appended dir** — scan parallelism follows
  the commit structure; a dir written by one streaming microbatch
  upstream is one task downstream.
- **Rewrites are feed boundaries.** Any non-append commit in the range
  (overwrite / delete / merge / delete_dv / publish of a rewriting
  branch) raises, exactly as ``read_changes`` does — an append-only
  consumer must not silently miss row deletions. (A row-level CDF
  across rewrites needs explicit change files; out of scope, same note
  as the batch feed.)
- **Exactly-once composes from both sides**: versions are durable and
  the dir list per version is immutable, so Spark's checkpointed
  offsets make replays deterministic — a restarted query re-reads the
  same dirs for the same (start, end].
- **Schema is pinned at stream start** (standard for streaming
  sources): the reader pads columns missing from older files with
  NULLs, so add-only schema evolution upstream never breaks a running
  consumer reading history.

The reader runs in Python workers (this API's inherent cost — the same
checked escape hatch as ``sources/datasource.py``); rows cross via
Arrow RecordBatches, never per-row Python objects. Everything
downstream is a normal streaming DataFrame. Reference has no
table/stream layer at all (fixed one-shot pipeline,
src/main.cpp:5-8).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class TableStreamDataSource(DataSource):
    """``spark.readStream.format("mri_table")`` — options:

    - ``path`` (required): the TransactionalTable root;
    - ``starting_version`` (optional, default 0): emit changes AFTER
      this version (0 = the table's whole history).
    """

    @classmethod
    def name(cls) -> str:
        return "mri_table"

    def schema(self):
        from pyspark.sql.types import StructType

        path = self.options.get("path")
        if not path:
            raise ValueError("mri_table requires option 'path'")
        from mapreduceindexer_spark.sources.transact import (
            TransactionalTable,
        )

        t = TransactionalTable(path)
        cur = t.current_version()
        if cur == 0:
            raise ValueError(
                "mri_table needs at least one committed version to "
                "derive the stream schema"
            )
        sj = t._manifest(cur).get("schema")
        if sj is None:
            raise ValueError(
                "mri_table needs a manifest-recorded schema (any commit "
                "made by this engine records one)"
            )
        return StructType.fromJson(sj)

    def streamReader(self, schema) -> "TableStreamReader":
        return TableStreamReader(self.options, schema)


class _DirSlice(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("mri_table requires option 'path'")
        self._start = int(options.get("starting_version", "0"))
        # The pinned stream schema rides to the workers as JSON (the
        # partition planner and readers must agree on column order and
        # NULL-padding for files older than an add-only evolution).
        self._schema_json = json.dumps(schema.jsonValue())

    def _table(self):
        from mapreduceindexer_spark.sources.transact import (
            TransactionalTable,
        )

        return TransactionalTable(self._path)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": max(self._table().current_version(), self._start)}

    def partitions(self, start: dict, end: dict):
        dirs = self._table().change_dirs(start["version"], end["version"])
        return [_DirSlice(os.path.join(self._path, d)) for d in dirs]

    def read(self, partition: _DirSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        spark_schema = StructType.fromJson(json.loads(self._schema_json))
        want = to_arrow_schema(spark_schema)
        files = sorted(
            os.path.join(partition.path, f)
            for f in os.listdir(partition.path)
            if f.endswith(".parquet")
        )
        for f in files:
            tbl = pq.read_table(f)
            n = tbl.num_rows
            cols = []
            for field in want:
                if field.name in tbl.column_names:
                    cols.append(
                        tbl.column(field.name).cast(field.type)
                    )
                else:  # pre-evolution file: later-added column is NULL
                    cols.append(pa.nulls(n, type=field.type))
            out = pa.Table.from_arrays(cols, schema=want)
            yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; nothing to ack


def register_table_stream_source(spark) -> None:
    """Idempotently register the ``mri_table`` format on this session."""
    spark.dataSource.register(TableStreamDataSource)
