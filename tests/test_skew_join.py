"""AQE skew-join hardening: a join with one pathologically hot key must be
split by adaptive execution at runtime, not serialized through a single
reducer.

This is the runtime half of the skew story (the query-shape half — salted
two-level aggregation — is pinned in test_scale_stress.py): with AQE on,
Spark detects the oversized shuffle partition after the map stage and
rewrites the sort-merge join to read the hot partition in slices. The
skew thresholds are lowered to make the effect observable at test scale;
production keeps the defaults and gets the same rewrite at real sizes.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    # Keep both sides above the broadcast threshold so the planner keeps a
    # sort-merge join (skew splitting applies to SMJ/SHJ, not broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # 150k rows on ONE key + uniform tail; payload makes bytes count.
        hot = spark.range(150_000).select(
            F.lit(0).alias("k"), F.concat(F.lit("x" * 64), F.col("id")).alias("pay")
        )
        tail = spark.range(5_000).select(
            (F.col("id") % 500 + 1).alias("k"),
            F.concat(F.lit("y" * 64), F.col("id")).alias("pay"),
        )
        fact = hot.union(tail)
        dim = spark.range(501).select(
            F.col("id").alias("k"), F.col("id").alias("dim_val")
        )
        # No keyed operator after the join: a downstream groupBy(k) would
        # pin the join's hash distribution and make AQE skip the skew
        # rewrite (it never adds a recovery shuffle by default).
        joined = fact.join(dim, "k").select("k", "pay", "dim_val")
        # collect() executes THIS DataFrame's own query execution, so the
        # executedPlan below is the finalized adaptive plan (count()/write
        # would finalize a different QueryExecution).
        assert len(joined.collect()) == 155_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for key in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        ):
            spark.conf.unset(key)
