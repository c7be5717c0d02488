"""Differential test: every catalog query vs its DuckDB oracle.

This mirrors the driver's correctness gate (row count + schema-insensitive,
order-insensitive value comparison) so regressions surface locally before a
round's CORRECTNESS file does. Comparison is *exact* on values (after
normalizing arrays to lists and timestamps to naive UTC) — the catalog's
contract is that every query is deterministic to the last bit, via decimal
sums and explicit rounding.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduceindexer_spark.catalog import QUERIES
from tests.conftest import SF_CHECK

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        return v.replace(tzinfo=None)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", [n for n, (_, o) in QUERIES.items() if o is not None])
def test_query_matches_oracle(spark, name):
    builder, oracle = QUERIES[name]
    sdf = builder(spark, SF_CHECK)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = _duck(SF_CHECK)
    try:
        res = con.execute(oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"

    _, s_norm = _norm_rows(scols, srows)
    _, o_norm = _norm_rows(ocols, orows)
    mism = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
