"""Text-format sources/sinks: CSV and JSON-lines with explicit schemas.

The reference's only format is whitespace-delimited plain text
(``src/functions.cpp:27-34,71-87``); parquet is the engine's native
columnar format (``sources/tables.py``). These adapters round out the
ingest surface for the interchange formats a pipeline actually receives.

Contract: **schemas are always passed explicitly** — ``inferSchema`` scans
the data twice and lets a stray cell silently retype a column, both
unacceptable at 100 TB. Readers are plain ``spark.read`` DataFrames, so
every downstream projection/filter still prunes and pushes down (CSV/JSON
support predicate pushdown at the line level: non-matching rows are
dropped during parse, and column pruning skips unparsed fields entirely
for JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV source with an explicit DDL schema (never inferSchema)."""
    return spark.read.schema(schema).option("header", header).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink; one file per partition — repartition upstream to control
    file count (same contract as the index text sink)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with an explicit DDL schema.

    With an explicit schema Spark parses only the requested fields
    (column pruning reaches inside the JSON parser); corrupt lines land in
    the implicit ``_corrupt_record`` handling (PERMISSIVE mode) instead of
    failing the job.
    """
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line, splittable on read)."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — the other splittable columnar interchange format a
    pipeline receives from Hive-era producers. Schema travels in the file
    footer (self-describing, like parquet), and Spark's vectorized ORC
    reader gives the same pushdown/pruning as the parquet path."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (snappy by default; splittable, predicate-indexed)."""
    df.write.mode("overwrite").orc(path)


def read_jsonl_audited(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with EXPLICIT corrupt-record quarantine.

    PERMISSIVE parse with the corrupt column surfaced by name: well-formed
    rows parse into the declared schema with ``_corrupt_record`` NULL;
    malformed lines yield NULL data columns and the raw line preserved in
    ``_corrupt_record``. The caller splits good/quarantine with one
    filter each — the standard 100 TB ingest shape (never FAILFAST on a
    petabyte of third-party data, never silently drop). Pair with
    ``plans.audit.with_metrics`` to count malformed rows in the same job
    (no second scan); see tests/test_sources_roundtrip.py.
    """
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_xml(
    spark: SparkSession, path: str, schema: str, row_tag: str = "row"
) -> DataFrame:
    """XML source (Spark 4 native ``xml`` format — no external package)
    with an explicit DDL schema and row tag. XML arrives from legacy
    feeds and document corpora (Wikipedia dumps are the canonical
    training-data case); the native reader splits on ``rowTag``
    boundaries, so large dumps parallelize like any text source."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .load(path)
    )


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows"
) -> None:
    """XML sink (one ``rowTag`` element per row under ``rootTag``)."""
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
