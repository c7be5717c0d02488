"""Small-file compaction: content-preserving, file-count-bounded, and —
with cluster_by — range-clustered so per-file min/max stats stay
prunable."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.maintenance import compact_files
from mapreduceindexer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _parts(d):
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def test_compaction_merges_small_files(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    events = load_table(spark, SF_SMOKE, "events")
    events.repartition(64).write.parquet(frag)
    assert len(_parts(frag)) == 64

    total = sum(os.path.getsize(f) for f in _parts(frag))
    n = compact_files(spark, frag, out, target_file_bytes=total // 4 + 1)
    assert len(_parts(out)) == n <= 4

    # Content parity, not just row count.
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, events.collect()))
    assert a == b


def test_compaction_cluster_by_gives_disjoint_ranges(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "clustered")
    events = load_table(spark, SF_SMOKE, "events")
    events.repartition(32).write.parquet(frag)

    total = sum(os.path.getsize(f) for f in _parts(frag))
    n = compact_files(
        spark, frag, out, target_file_bytes=total // 4 + 1, cluster_by="user_id"
    )
    files = _parts(out)
    assert len(files) == n > 1

    # Each output file covers a user_id range disjoint from every other
    # file's — the property that makes parquet footer min/max prune a
    # key-predicate scan down to one file.
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
        ).collect()[0]
        spans.append((r["lo"], r["hi"]))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans

    assert spark.read.parquet(out).count() == events.count()


# -- incremental materialized view over the commit log ------------------------


def _mv_fns():
    from pyspark.sql import functions as F

    def delta_to_partial(df):
        return df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))

    def combine(view, partial):
        return (
            view.unionByName(partial)
            .groupBy("k")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        )

    return delta_to_partial, combine


def test_incremental_mv_merge_equals_rebuild_and_replay_noops(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.maintenance import (
        incremental_mv_refresh,
    )
    from mapreduceindexer_spark.sources.transact import TransactionalTable

    base = TransactionalTable(str(tmp_path / "base"))
    view = TransactionalTable(str(tmp_path / "view"))
    d2p, comb = _mv_fns()
    rows = spark.range(90).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    )
    for i in range(3):
        base.commit(
            rows.filter(F.col("v") % 3 == i),
            mode="append" if i else "overwrite",
        )
        incremental_mv_refresh(spark, base, view, d2p, comb)
    got = {r["k"]: (r["n"], r["s"]) for r in view.read(spark).collect()}
    want = {
        r["k"]: (r["n"], r["s"]) for r in d2p(rows).collect()
    }
    assert got == want  # merge == rebuild
    # Replay: refresh with nothing new is a version-stable no-op.
    v = view.current_version()
    assert incremental_mv_refresh(spark, base, view, d2p, comb) == v
    assert view.meta_of(v)["processed"] == base.current_version()


def test_incremental_mv_rewritten_base_raises(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.maintenance import (
        incremental_mv_refresh,
    )
    from mapreduceindexer_spark.sources.transact import TransactionalTable

    base = TransactionalTable(str(tmp_path / "base"))
    view = TransactionalTable(str(tmp_path / "view"))
    d2p, comb = _mv_fns()
    base.commit(spark.range(10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v")))
    incremental_mv_refresh(spark, base, view, d2p, comb)
    # A base rewrite in the unprocessed range invalidates partials.
    base.delete_where(spark, "v", lo=0, hi=3)
    with pytest.raises(ValueError, match="append"):
        incremental_mv_refresh(spark, base, view, d2p, comb)


def test_join_mv_decomposition_counts_overlap_once(spark, tmp_path):
    """Both sides advance before one refresh: ΔA ⋈ ΔB must land exactly
    once (it lives in the ΔA ⋈ B_new term; A_old ⋈ ΔB excludes it by
    construction), late dimension rows must back-fill matches for facts
    already processed, and a replayed refresh must no-op."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.operators.maintenance import (
        incremental_mv_join_refresh,
    )
    from mapreduceindexer_spark.sources.transact import TransactionalTable

    facts = TransactionalTable(str(tmp_path / "facts"))
    dims = TransactionalTable(str(tmp_path / "dims"))
    view = TransactionalTable(str(tmp_path / "view"))
    f_all = spark.range(12).select(
        F.col("id").alias("fk"), (F.col("id") % 6).alias("k")
    )
    d_all = spark.range(6).select(
        F.col("id").alias("k2"), (F.col("id") * 10).alias("attr")
    )

    def jd(left, right):
        return left.join(right, left["k"] == right["k2"]).select(
            "fk", "k", "attr"
        )

    # Refresh while the dims side is still empty: a recorded no-op.
    facts.commit(f_all.filter(F.col("fk") < 4))
    assert (
        incremental_mv_join_refresh(spark, facts, dims, view, jd) == 0
    )
    # Dims 0..2 arrive; facts 0..3 (k 0..3) match only k 0..2 for now.
    dims.commit(d_all.filter(F.col("k2") < 3))
    incremental_mv_join_refresh(spark, facts, dims, view, jd)
    assert view.read(spark).count() == 3  # fk 0,1,2
    # BOTH sides advance before one refresh: late dims 3..5 back-fill
    # fk 3 (A_old ⋈ ΔB), new facts 4..7 join the FULL dims (ΔA ⋈ B_new,
    # which contains ΔB — the overlap must not double-count).
    dims.commit(d_all.filter(F.col("k2") >= 3), mode="append")
    facts.commit(
        f_all.filter((F.col("fk") >= 4) & (F.col("fk") < 8)), mode="append"
    )
    incremental_mv_join_refresh(spark, facts, dims, view, jd)
    got = sorted(r["fk"] for r in view.read(spark).collect())
    assert got == list(range(8))  # every fact exactly once
    # Remaining facts, then replay no-op.
    facts.commit(f_all.filter(F.col("fk") >= 8), mode="append")
    v = incremental_mv_join_refresh(spark, facts, dims, view, jd)
    assert incremental_mv_join_refresh(spark, facts, dims, view, jd) == v
    final = {(r["fk"], r["attr"]) for r in view.read(spark).collect()}
    want = {(r["fk"], r["attr"]) for r in jd(f_all, d_all).collect()}
    assert final == want  # incremental == full rebuild, attrs included
    m = view.meta_of(v)
    assert m["processed_a"] == facts.current_version()
    assert m["processed_b"] == dims.current_version()
