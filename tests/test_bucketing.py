"""Bucketed tables: the zero-shuffle co-located join path.

At 100 TB, joins and merges keyed on ``term`` (postings ⋈ postings,
postings ⋈ term stats) should not re-shuffle both sides every run: write
both sides bucketed by the join key once, and every subsequent join is
exchange-free. This test pins that contract — two tables bucketed by the
same key join with NO Exchange in the plan.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def warehouse_spark(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # saveAsTable writes into the session warehouse; use unique table names
    # per test run instead of re-pointing the (session-fixed) warehouse dir.
    return spark


def test_bucketed_join_has_no_exchange(warehouse_spark, tmp_path):
    import uuid

    from mapreduceindexer_spark.operators.index import build_postings
    from mapreduceindexer_spark.plans import explain_str
    from mapreduceindexer_spark.sources.tables import load_table

    spark = warehouse_spark
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"postings_a_{suffix}", f"postings_b_{suffix}"

    docs = load_table(spark, SF_SMOKE, "documents")
    postings = build_postings(docs).select("term", "df")
    for name in (ta, tb):
        (
            postings.write.bucketBy(8, "term")
            .sortBy("term")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    try:
        # hint("merge"): at test scale AQE would broadcast the tiny side
        # (which also skips bucketing); production-size tables plan
        # sort-merge on their own, and THAT is the path bucketing serves.
        joined = (
            spark.table(ta)
            .withColumnRenamed("df", "df_a")
            .hint("merge")
            .join(spark.table(tb).withColumnRenamed("df", "df_b"), "term")
        )
        plan = explain_str(joined, "simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # And the join actually produces the full match.
        assert joined.count() == postings.count()
    finally:
        for name in (ta, tb):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_downdate_has_no_exchange_and_equals_rebuild(
    warehouse_spark, tmp_path
):
    """Index DOWNDATE over bucketed state: the maintained index and the
    deleted-batch postings, both bucketed by term, subtract with ZERO
    exchanges — the 100 TB retraction shape (delete_from_postings)."""
    import uuid

    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.index import (
        build_postings,
        delete_from_postings,
    )
    from mapreduceindexer_spark.plans import explain_str
    from mapreduceindexer_spark.sources.tables import load_table

    spark = warehouse_spark
    suffix = uuid.uuid4().hex[:8]
    tb, td = f"idx_base_{suffix}", f"idx_gone_{suffix}"

    docs = load_table(spark, SF_SMOKE, "documents")
    base = build_postings(docs).select("term", "doc_ids")
    gone = build_postings(docs.filter(F.col("doc_id") % 7 == 3)).select(
        "term", "doc_ids"
    )
    for name, rel in ((tb, base), (td, gone)):
        (
            rel.write.bucketBy(8, "term")
            .sortBy("term")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    try:
        out = delete_from_postings(spark.table(tb), spark.table(td))
        plan = explain_str(out, "simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        want = {
            (r.term, tuple(r.doc_ids), r.df)
            for r in build_postings(
                docs.filter(F.col("doc_id") % 7 != 3)
            ).collect()
        }
        got = {(r.term, tuple(r.doc_ids), r.df) for r in out.collect()}
        assert got == want
    finally:
        for name in (tb, td):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_downdate_edge_cases(spark):
    """delete(X, X) is empty; delete(X, ∅-shaped delta) is identity."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.index import (
        build_postings,
        delete_from_postings,
    )
    from mapreduceindexer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    base = build_postings(docs)
    assert delete_from_postings(base, base).count() == 0
    empty = build_postings(docs.filter(F.lit(False)))
    same = delete_from_postings(base, empty)
    want = {(r.term, tuple(r.doc_ids)) for r in base.collect()}
    assert {(r.term, tuple(r.doc_ids)) for r in same.collect()} == want
