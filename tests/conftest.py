"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mapreduceindexer_spark.session import get_spark

    # Modest parallelism for tests: tiny data, many short jobs.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="mapreduceindexer_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session", autouse=True)
def _no_nonempty_observe_fallbacks():
    """The observed-metrics fallback is expected ONLY for provably-empty
    writes. A non-empty occurrence anywhere in the suite means the
    engine silently degraded the single-pass commit back to two passes
    (VERDICT r12 item 8) — fail the session so it cannot go unnoticed."""
    yield
    from mapreduceindexer_spark.sources import transact

    assert transact.OBS_FALLBACK_NONEMPTY == 0, (
        f"{transact.OBS_FALLBACK_NONEMPTY} non-empty observe fallback(s) "
        "fired during the suite: the single-pass commit path is degraded"
    )
