"""Partition pruning: the data-skipping contract for date-partitioned
layouts. At 100 TB the events table is written partitioned by day; a
one-day query must scan one directory, not the table — visible as
PartitionFilters on the scan and pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_day_partitioned_scan_prunes(spark, tmp_path):
    from mapreduceindexer_spark.plans import explain_str
    from mapreduceindexer_spark.sources.tables import load_table

    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = explain_str(one_day, "formatted")
    assert "PartitionFilters" in plan
    # The partition predicate must be in PartitionFilters (pruning), not a
    # post-scan data filter.
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line, pf_line
    # Counts agree with the unpartitioned source.
    want = events.filter(F.to_date("ts") == "2024-01-03").count()
    assert one_day.count() == want and want > 0
