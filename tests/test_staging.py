"""Session staging registry: expensive multi-consumer relations (the
verified near-dup pair set) build once per Spark application and are
reused by every consumer query (q_near_dup, q_dup_clusters,
q_curation_pipeline). Value correctness of each consumer is covered by
test_oracle_parity; these tests pin the reuse contract itself."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_staged_builds_once_per_key(spark):
    from mapreduceindexer_spark import staging

    staging.clear()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).localCheckpoint()

    a = staging.staged(spark, ("t", 1), build)
    b = staging.staged(spark, ("t", 1), build)
    c = staging.staged(spark, ("t", 2), build)
    assert calls["n"] == 2
    assert a is b and a is not c
    staging.clear()
    staging.staged(spark, ("t", 1), build)
    assert calls["n"] == 3
    staging.clear()


def test_near_dup_consumers_share_one_staged_relation(spark):
    """All three near-dup consumers must resolve to the SAME materialized
    handle (identical dials -> identical key), and the shared relation
    must still produce the right answer through the composite."""
    from mapreduceindexer_spark import staging
    from mapreduceindexer_spark.catalog import QUERIES, _near_pairs_staged

    staging.clear()
    p1 = _near_pairs_staged(spark, SF_SMOKE)
    n_before = len(staging._CACHE)
    # Consumer queries must not add new cache entries for the same key.
    QUERIES["q_near_dup"][0](spark, SF_SMOKE)
    QUERIES["q_dup_clusters"][0](spark, SF_SMOKE)
    QUERIES["q_curation_pipeline"][0](spark, SF_SMOKE)
    assert len(staging._CACHE) == n_before
    p2 = _near_pairs_staged(spark, SF_SMOKE)
    assert p1 is p2
    staging.clear()

def test_stale_app_entries_evicted_on_access(spark):
    """Entries keyed by a stopped application must not accumulate: any
    access under the live app evicts them (advisor finding, round 5)."""
    from mapreduceindexer_spark import staging

    staging.clear()
    dead = ("app-deadbeef-0000", ("t", 1))
    staging._CACHE[dead] = spark.range(1).localCheckpoint()
    staging.staged(spark, ("t", 2), lambda: spark.range(2).localCheckpoint())
    assert dead not in staging._CACHE
    live_apps = {k[0] for k in staging._CACHE}
    assert live_apps == {spark.sparkContext.applicationId}
    staging.clear()
