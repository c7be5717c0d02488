"""The third entry point (SURVEY §3.4): plain ``spark.sql`` over registered
temp views must reach the same Catalyst plans and the same answers as the
DataFrame programs — both are just logical-plan front-ends.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_sql_postings_equals_dataframe_postings(spark):
    from mapreduceindexer_spark.operators.index import build_postings
    from mapreduceindexer_spark.sources.tables import register_views

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        r"""
        SELECT term,
               substring(term, 1, 1) AS letter,
               sort_array(collect_set(doc_id)) AS doc_ids,
               count(DISTINCT doc_id) AS df
        FROM (
          SELECT doc_id,
                 lower(regexp_replace(tok, '[^A-Za-z]', '')) AS term
          FROM (SELECT doc_id, explode(split(text, '\\s+')) AS tok FROM documents)
        )
        WHERE term != ''
        GROUP BY term
        """
    )
    df = build_postings(spark.table("documents"), salt_buckets=16)
    got = sorted((r.term, r.letter, list(r.doc_ids), r.df) for r in sql.collect())
    want = sorted((r.term, r.letter, list(r.doc_ids), r.df) for r in df.collect())
    assert got == want


def test_sql_join_equals_dataframe_join(spark):
    from mapreduceindexer_spark.catalog import QUERIES
    from mapreduceindexer_spark.sources.tables import register_views

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2)
                 AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    df = QUERIES["q_join_orders_customer"][0](spark, SF_SMOKE)
    got = sorted(tuple(r) for r in sql.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_approx_quantiles_within_sketch_bound(spark):
    """GK-sketch guarantee is on RANK error, not value distance (tail
    quantiles sit in sparse regions where neighboring values are far
    apart): the fraction of group values at-or-below the sketch answer
    must bracket the requested quantile within the sketch tolerance."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.catalog import QUERIES
    from mapreduceindexer_spark.sources.tables import load_table
    from tests.conftest import SF_CHECK

    approx = {
        r["event_type"]: (r["q50"], r["q90"], r["q99"])
        for r in QUERIES["q_approx_quantiles"][0](spark, SF_CHECK).collect()
    }
    vals = (
        load_table(spark, SF_CHECK, "events")
        .groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list("value")).alias("vs"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    eps = 0.01  # well above 1/accuracy = 1e-4; guards discreteness too
    assert set(approx) == {r["event_type"] for r in vals}
    for r in vals:
        import bisect

        vs, n = r["vs"], r["n"]
        for q, a in zip((0.5, 0.9, 0.99), approx[r["event_type"]]):
            below = bisect.bisect_left(vs, a) / n   # frac strictly below
            at_or_below = bisect.bisect_right(vs, a) / n
            assert below <= q + eps and at_or_below >= q - eps, (
                r["event_type"], q, a, below, at_or_below,
            )
