"""SparkSession factory with scale-oriented defaults.

Settings chosen for correctness-vs-oracle (UTC timestamps, ANSI off to match
reference semantics) and for 100 TB readiness (AQE on: runtime partition
coalescing, skew-join splitting; Arrow for the rare Pandas-UDF path).
On a real cluster the same session config applies — only master/memory
change; nothing here is local-mode-specific except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduceindexer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster manager is configured; on a real cluster pass
    ``master=None`` with ``spark.master`` set by the submitter.

    ``shuffle_partitions`` defaults to the core count locally; on a large
    cluster it should be ~2-3× total executor cores (AQE coalesces the
    excess at runtime, so erring high is safe).

    ``spark.driver.memory`` (env ``SPARK_GRAFT_DRIVER_MEM``, default 8g)
    is set in builder config: when this process launches the JVM itself
    (plain ``python script.py`` — every path in this repo), the launcher
    reads it before forking, so it applies. It is silently ignored only
    when a gateway JVM already exists (pyspark shell, or a harness that
    created the session first) — there the owner of the JVM sets memory,
    which is the correct division of responsibility.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
