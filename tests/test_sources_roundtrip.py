"""Source/sink format round-trips: parquet -> {CSV, JSONL} -> DataFrame.

Pins that the interchange formats preserve values exactly (strings,
integers, doubles, timestamps) under the explicit-schema contract of
``sources/formats.py`` — the ingest surface beyond the reference's plain
text and the engine's native parquet.
"""

from __future__ import annotations

import pytest

from mapreduceindexer_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from mapreduceindexer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

NATION_SCHEMA = "n_nationkey INT, n_name STRING, n_regionkey INT"

ORDERS_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def orders_slice(spark):
    return (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .limit(500)
    )


def test_csv_roundtrip_preserves_values(spark, orders_slice, tmp_path):
    path = str(tmp_path / "orders_csv")
    write_csv(orders_slice, path)
    back = read_csv(spark, path, ORDERS_SCHEMA)
    assert back.schema == orders_slice.schema
    assert _rows(back) == _rows(orders_slice)


def test_jsonl_roundtrip_preserves_values(spark, orders_slice, tmp_path):
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(orders_slice, path)
    back = read_jsonl(spark, path, ORDERS_SCHEMA)
    assert back.schema == orders_slice.schema
    assert _rows(back) == _rows(orders_slice)


def test_csv_roundtrip_small_dim(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, NATION_SCHEMA)
    assert _rows(back) == _rows(nation)


def test_jsonl_reader_prunes_unrequested_fields(spark, orders_slice, tmp_path):
    """Explicit partial schema: the JSON parser surfaces only the requested
    fields — schema-on-read column pruning, no full-object materialization."""
    path = str(tmp_path / "orders_jsonl_prune")
    write_jsonl(orders_slice, path)
    back = read_jsonl(spark, path, "o_orderkey BIGINT, o_totalprice DOUBLE")
    assert back.columns == ["o_orderkey", "o_totalprice"]
    assert _rows(back) == _rows(orders_slice.select("o_orderkey", "o_totalprice"))


def test_jsonl_reader_tolerates_corrupt_lines(spark, tmp_path):
    """PERMISSIVE mode: a malformed line must not fail the job — it parses
    to an all-null row (ingest robustness contract for dirty feeds)."""
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"o_orderkey": 1, "o_totalprice": 10.5}\n'
        "THIS IS NOT JSON {{{\n"
        '{"o_orderkey": 2, "o_totalprice": 20.0}\n'
    )
    back = read_jsonl(spark, str(p), "o_orderkey BIGINT, o_totalprice DOUBLE")
    rows = sorted(
        ((r.o_orderkey, r.o_totalprice) for r in back.collect()),
        key=lambda t: (t[0] is not None, t),
    )
    assert rows == [(None, None), (1, 10.5), (2, 20.0)]


def test_manifest_corpus_handles_spaces_in_paths(spark, tmp_path):
    """input_file_name() returns a percent-encoded file: URI; the manifest
    join must URI-decode it or files with spaces/non-ASCII silently drop.
    Regression for the round-1 silent-drop bug: every manifest entry must
    come back with its manifest-position doc_id and exact content."""
    from mapreduceindexer_spark.sources.corpus import read_manifest_corpus

    names = ["plain.txt", "with space.txt", "uni-ä.txt"]
    for i, name in enumerate(names):
        (tmp_path / name).write_text(f"content number {i}\n", encoding="utf-8")
    manifest = tmp_path / "manifest.txt"
    # Manifest tokens are whitespace-split, so spaced filenames can't be
    # listed literally in one token — pass them via the parsed-path seam
    # (parse_manifest splits; read path resolution is what we pin here).
    manifest.write_text("1\nplain.txt\n", encoding="utf-8")
    corpus = read_manifest_corpus(spark, str(manifest))
    rows = corpus.collect()
    assert len(rows) == 1 and rows[0].doc_id == 1

    # The URI-decode seam itself, with spaces and non-ASCII: drive
    # read_manifest_corpus's join path directly via a crafted manifest
    # listing the encoded-hostile files one per line token-safely.
    import mapreduceindexer_spark.sources.corpus as corpus_mod

    paths = [str(tmp_path / n) for n in names]
    orig = corpus_mod.parse_manifest
    corpus_mod.parse_manifest = lambda m, b=None: paths
    try:
        full = read_manifest_corpus(spark, str(manifest))
        got = {r.doc_id: r.text.strip() for r in full.collect()}
    finally:
        corpus_mod.parse_manifest = orig
    assert got == {1: "content number 0", 2: "content number 1", 3: "content number 2"}


def test_manifest_corpus_fails_loudly_on_missing_join(spark, tmp_path):
    """A path-normalization mismatch must raise, not silently shrink the
    corpus (duplicate manifest entries multiply the join the same way)."""
    import pytest

    from mapreduceindexer_spark.sources.corpus import read_manifest_corpus

    (tmp_path / "a.txt").write_text("hello\n", encoding="utf-8")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("2\na.txt\na.txt\n", encoding="utf-8")  # duplicate
    with pytest.raises(ValueError, match="manifest entries"):
        read_manifest_corpus(spark, str(manifest))


def test_dot_null_propagates_on_length_mismatch(spark):
    """zip_with null-pads the shorter array: dot() must yield NULL (never a
    silent partial product) when vector lengths differ."""
    from mapreduceindexer_spark.functions.vector import dot

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 1.0, 1.0]), ([1.0, 2.0, 3.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r.d for r in df.select(dot("a", "b").alias("d")).collect()]
    assert got[0] == 6.0
    assert got[1] is None


def test_orc_roundtrip_preserves_values(spark, orders_slice, tmp_path):
    """ORC round-trip: full value fidelity through the columnar path,
    including timestamps and doubles (footer-carried schema, no DDL)."""
    from mapreduceindexer_spark.sources.formats import read_orc, write_orc

    path = str(tmp_path / "orders_orc")
    write_orc(orders_slice, path)
    back = read_orc(spark, path)
    want = sorted(map(tuple, orders_slice.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
    assert dict(back.dtypes) == dict(orders_slice.dtypes)


def test_jsonl_audited_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE ingest with explicit quarantine: malformed lines keep
    their raw text in _corrupt_record, parse NULLs for data columns, and
    are countable in the SAME job via the Observation API (no second
    scan)."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.plans import with_metrics
    from mapreduceindexer_spark.sources.formats import read_jsonl_audited

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{broken json\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "NaNope", "v": 3}\n'  # type mismatch: id unparsable
        '{"id": 4, "v": "d"}\n'
    )
    df = read_jsonl_audited(spark, str(p), "id bigint, v string")
    observed, obs = with_metrics(
        df,
        "ingest",
        F.count(F.lit(1)).alias("rows_in"),
        F.count("_corrupt_record").alias("rows_quarantined"),
    )
    good = observed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    assert sorted(map(tuple, good.collect())) == [(1, "a"), (2, "b"), (4, "d")]
    # Metrics were computed by the job above — no extra action needed.
    assert obs.get == {"rows_in": 5, "rows_quarantined": 2}
    quarantined = df.filter(F.col("_corrupt_record").isNotNull())
    raws = {r._corrupt_record for r in quarantined.collect()}
    assert any(r.startswith("{broken") for r in raws), raws
    assert any('"NaNope"' in r for r in raws), raws


def test_xml_roundtrip_preserves_values(spark, orders_slice, tmp_path):
    """Native XML (Spark 4) round-trip under the explicit-schema
    contract — the legacy-feed / document-dump ingest surface (Wikipedia
    dumps being the canonical training-corpus case)."""
    from mapreduceindexer_spark.sources.formats import read_xml, write_xml

    path = str(tmp_path / "orders_xml")
    write_xml(orders_slice, path, row_tag="order", root_tag="orders")
    back = read_xml(spark, path, ORDERS_SCHEMA, row_tag="order").select(
        *[c for c, _ in orders_slice.dtypes]
    )
    assert _rows(back) == _rows(orders_slice)
    assert dict(back.dtypes) == dict(orders_slice.dtypes)
