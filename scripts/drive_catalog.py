"""Driver-shaped drive of the full catalog — the canonical local
replication of the harness's correctness check, as a script instead of
a per-session heredoc (r11; the verify skill's recipe now calls this).

What it does, exactly like the driver:
  1. ``entry(spark)`` smoke at sf0.001 (row count).
  2. Every ``queries()`` entry at sf0.01 vs its ``oracle_sql()`` in
     DuckDB — values repr-sorted and compared; rows-only queries get a
     row-count print.

What it adds beyond the driver (both lessons from the r10 red rows):
  - ``--pandas-audit``: fetches each result through BOTH engines'
    pandas paths (Spark ``toPandas()`` and DuckDB ``.df()`` — what the
    driver canonicalizes through) and flags any output column whose
    FULL dtype string differs between the two sides (the
    HUGEINT→float64 signature: locally green via fetchall, driver-red
    via pandas; since r12 also int/float WIDTH drift like int32-vs-
    int64, with date and datetime64-resolution pairings exempt as
    documented at the check).
    The comparison basis is toPandas-vs-df, NOT the Spark schema: both
    engines render NULLABLE int columns as float64+NaN, so a schema
    check would false-positive every outer-join/lag query (verified:
    q_asof_join etc. are float64 on BOTH sides and driver-green).
  - ``--stress N``: N fresh-SparkSession repeat runs of the queries
    named in ``--only`` (default: the full catalog once) — the
    load/flake hunt the r10 verdict prescribed.

Exit status: 0 iff every comparison matched and the audit is clean.

Usage:
  python scripts/drive_catalog.py                    # full drive
  python scripts/drive_catalog.py --pandas-audit
  python scripts/drive_catalog.py --only q_tws_totals,q_state_reader --stress 6
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()



def dtypes_differ(a, b) -> bool:
    """FULL-dtype-string comparison with ONE exemption: both sides
    naive datetime64 differing only in RESOLUTION (Spark toPandas
    [ns] vs DuckDB .df() [us] — same instants, historically
    driver-green). tz-AWARE datetimes are NOT exempt: an aware-vs-
    naive pairing can carry shifted wall-clock values, exactly the
    lossy widening the audit hunts, so any timezone on either side
    falls through to the strict string compare (r12 review; pinned by
    tests/test_harness_contract.py::test_dtype_audit_exemptions)."""
    sa, sb = str(a), str(b)
    if (
        sa.startswith("datetime64[")
        and sb.startswith("datetime64[")
        and "," not in sa
        and "," not in sb
    ):
        return False  # naive resolution pairing — exempt
    return sa != sb


def _rows(df) -> list:
    return sorted(
        tuple(map(repr, (tuple(x) if isinstance(x, list) else x for x in r)))
        for r in df
    )


def _connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def drive(spark, names, sf_dir: str, pandas_audit: bool) -> int:
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = _connect(sf_dir)
    bad = 0
    for name in names:
        b = qs[name]
        if name not in osql:
            print(name, "rows-only:", b(spark, sf_dir).count(), flush=True)
            continue
        sdf = b(spark, sf_dir)
        s = _rows(sdf.collect())
        o = _rows(con.execute(osql[name]).fetchall())
        ok = s == o
        note = ""
        if pandas_audit:
            pdf = con.execute(osql[name]).df()
            spdf = sdf.toPandas()
            # Column NAMES must agree exactly — the driver sorts
            # columns by name before hashing, so an aliasing drift is
            # itself a red row; silently skipping unmatched names here
            # would hide exactly the divergence the audit hunts
            # (r11 third review).
            if set(pdf.columns) != set(spdf.columns):
                ok = False
                note = (
                    f" COLUMN-NAME-MISMATCH spark={sorted(spdf.columns)}"
                    f" duckdb={sorted(pdf.columns)}"
                )
            # FULL dtype strings must agree (r11 advice: a kind-only
            # compare admits int32-vs-int64 / float32-vs-float64 width
            # drift — the same locally-green/driver-red shape as the
            # HUGEINT incident, one notch subtler). Two documented,
            # value-exact exemptions, both pinned by
            # tests/test_harness_contract.py::test_date_exemption_is_value_exact:
            #   - DATE columns: Spark toPandas yields object-of-date,
            #     DuckDB datetime64[us] at midnight — both exact
            #     (q_promo_revenue r10 et al. driver-green).
            #   - NAIVE datetime64 RESOLUTION: Spark emits [ns],
            #     DuckDB [us] — same instants, all 21 TIMESTAMP
            #     oracles historically driver-green. tz-aware is NOT
            #     exempt (dtypes_differ docstring).
            dates = {
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() == "date"
            }
            lossy = [
                (c, str(spdf[c].dtype), str(pdf[c].dtype))
                for c in pdf.columns
                if c in spdf.columns
                and c not in dates
                and dtypes_differ(spdf[c].dtype, pdf[c].dtype)
            ]
            if lossy:
                ok = False
                note += f" PANDAS-DTYPE-MISMATCH (spark,duckdb) {lossy}"
        bad += not ok
        print(name, "match:", ok, len(s), note, flush=True)
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    def _positive(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(
                "--stress must be >= 1 (0 drives = vacuous green)"
            )
        return n

    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument(
        "--stress", type=_positive, default=1, help="fresh-session repeats"
    )
    ap.add_argument("--pandas-audit", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    from mapreduceindexer_spark.session import get_spark

    registered = list(entrymod.queries())
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in registered]
        if unknown:
            sys.exit(f"unknown query names: {unknown}")
    else:
        names = registered
    bad = 0
    for i in range(args.stress):
        spark = get_spark(
            app_name=f"drive_catalog_{i}", shuffle_partitions=8
        )
        if i == 0 and not args.only:
            print("entry rows:", entrymod.entry(spark).count(), flush=True)
        bad += drive(spark, names, args.sf, args.pandas_audit)
        spark.stop()
    print(f"mismatches: {bad}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
