"""Partitioning-independence sweep for the session's new operators —
the engine-level analogue of the reference checker's (M,R)-independence
contract: the ANSWER must not depend on how Spark happened to split the
shuffle. Each query runs under different spark.sql.shuffle.partitions
settings and must produce byte-identical sorted rows."""

from __future__ import annotations

import pytest

from mapreduceindexer_spark.catalog import QUERIES

from tests.conftest import SF_SMOKE

SWEEP = ["q_winnowing", "q_diverse_sample", "q_postings_unmerge",
         "q_index_cdc", "q_ann_filtered_ivf", "q_embedding_drift"]


@pytest.mark.parametrize("name", SWEEP)
def test_answers_are_partitioning_independent(spark, name):
    builder = QUERIES[name][0]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                sorted(tuple(map(repr, r)) for r in builder(spark, SF_SMOKE).collect())
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert results[0] == results[1], f"{name} answer depends on partitioning"
