"""Structural contract with the correctness harness.

The harness canonicalizes query results through pandas ``sort_values``
over every column, which cannot hash list/dict cells — so NO registered
query may expose an ARRAY/MAP/STRUCT column in its output schema (library
relations keep their native complex types; only the registered surface
serializes, e.g. ``concat_ws`` with an ``array_to_string`` oracle).

Round 2 shipped three red rows (q_postings, q_postings_merge,
q_postings_gaps) from exactly this; this test makes the invariant
unbreakable for every oracle-backed query.
"""

from __future__ import annotations

import pytest

from mapreduceindexer_spark.catalog import QUERIES
from tests.conftest import SF_SMOKE

_COMPLEX = ("array", "map", "struct")


@pytest.mark.parametrize(
    "name", [n for n, (_, o) in QUERIES.items() if o is not None]
)
def test_no_complex_output_columns(spark, name):
    builder, _ = QUERIES[name]
    df = builder(spark, SF_SMOKE)  # schema only; no action triggered
    bad = [
        f.name for f in df.schema.fields if f.dataType.typeName() in _COMPLEX
    ]
    assert not bad, (
        f"{name} exposes complex-typed columns {bad}; serialize them "
        "(concat_ws / array_to_string) in the registered output"
    )


def test_no_hugeint_or_decimal_oracle_columns():
    """Round-10 shipped the catalog's only two driver-red rows
    (q_tws_totals, q_state_reader) from exactly this: a bare
    ``SUM(BIGINT)`` output column is HUGEINT in DuckDB, which
    ``fetchall()`` (the local comparator) returns as exact Python ints
    but the driver's pandas canonicalizer coerces to float64 — so the
    int64 Spark column hash-mismatches on dtype while every local check
    passes. Pin the invariant: every oracle output column must bind to
    a type pandas maps losslessly onto the matching Spark dtype
    (BIGINT/INTEGER/DOUBLE/..., never HUGEINT/DECIMAL/UHUGEINT).
    DESCRIBE only binds the query — no execution — so this covers all
    288 oracles in seconds."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    ok = {
        "BIGINT",
        "INTEGER",
        "SMALLINT",
        "TINYINT",
        "DOUBLE",
        "FLOAT",
        "VARCHAR",
        "BOOLEAN",
        "DATE",
        "TIMESTAMP",
    }
    bad = {}
    for name, (_, oracle) in QUERIES.items():
        if oracle is None:
            continue
        susp = [
            (c, t)
            for c, t, *_ in con.execute(f"DESCRIBE ({oracle})").fetchall()
            if t not in ok
        ]
        if susp:
            bad[name] = susp
    assert not bad, (
        f"oracle output columns with pandas-lossy DuckDB types: {bad}; "
        "CAST sums/counts to BIGINT and decimal aggregates to DOUBLE "
        "in the oracle SQL"
    )


def test_check_priority_window_mostly_oracle_backed():
    """The first 50 registered queries are the harness's verification
    window. Through round 6 the window was oracle-only; rounds 7-8
    rotate the declared rows-only queries (real streaming runs — the
    driver's weaker rows-only check is their ONLY possible external
    evidence) through a handful of slots. Pin the policy: a windowed
    query either carries an oracle or was explicitly registered
    rows-only, and rows-only entries never crowd the window (≤ 6)."""
    names = list(QUERIES)[:50]
    rows_only = [n for n in names if QUERIES[n][1] is None]
    assert len(rows_only) <= 6, f"too many rows-only window slots: {rows_only}"


def test_check_priority_is_exactly_the_window():
    """Round 4 shipped 51 names in _CHECK_PRIORITY while the driver checks
    exactly the first 50 registered queries, so position 51 silently got
    no driver row. Pin the length (and uniqueness) so the window and the
    intent can never diverge again."""
    from mapreduceindexer_spark.catalog import _CHECK_PRIORITY

    assert len(_CHECK_PRIORITY) == 50
    assert len(set(_CHECK_PRIORITY)) == 50
    assert list(QUERIES)[:50] == _CHECK_PRIORITY
