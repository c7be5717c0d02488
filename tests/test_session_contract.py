"""The catalog must behave identically under a CALLER-owned SparkSession:
the driver harness passes its own session, whose ANSI/timezone defaults we
don't control. Every query path goes through the table loader, which pins
the runtime-settable confs the contract depends on."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_loader_pins_session_confs(spark):
    from mapreduceindexer_spark.sources.tables import load_table

    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_table(spark, SF_SMOKE, "events")
    finally:
        conf_after = {
            "ansi": spark.conf.get("spark.sql.ansi.enabled"),
            "tz": spark.conf.get("spark.sql.session.timeZone"),
        }
    assert conf_after == {"ansi": "false", "tz": "UTC"}, conf_after
