"""Parquet table loaders for the synthetic star schema + corpus tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

All loads go through ``spark.read.parquet`` so Catalyst's vectorized reader,
predicate pushdown, and column pruning apply; never collect-and-rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Path layout: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read nanos as raw INT64
    (``nanosAsLong``, set at runtime so it also applies under a caller-owned
    SparkSession) and truncate to microseconds — the same ns→µs truncation
    DuckDB applies, keeping oracle comparisons bit-identical.
    """
    df = _read_parquet_nanos_safe(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
            # TIMESTAMP_NTZ. On PySpark 4.1 window()/session_window accept
            # NTZ, but unix_micros() and withWatermark() reject it, and the
            # DuckDB oracle compares as instants — so normalize here once.
            # Session tz is pinned UTC by _ensure_session_confs (and must
            # stay UTC through execution: the cast is evaluated lazily with
            # the tz in effect at action time), making this a wall-clock-
            # preserving reinterpretation, bit-identical to the oracle.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    _ensure_session_confs(spark)
    return spark.read.parquet(path)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime-settable confs the query contract depends on, so the
    catalog behaves identically under a CALLER-owned SparkSession (the
    driver harness passes its own): nanos-as-long for the events table,
    UTC so timestamp arithmetic matches the (timezone-less) oracle, ANSI
    off so casts/overflow yield null instead of throwing (the documented
    oracle-matching semantics). All three are session-mutable — no JVM
    restart needed."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan has too few splits.

    Parquet's minimum split unit is the row group; the synthetic test files
    are single-row-group, so every scan is one task and each CPU-bound
    narrow stage (explode, normalize, md5 minhash) runs on one core — and
    AQE then *re-coalesces* small shuffles back to one partition. An
    explicit-numPartitions repartition is exempt from AQE coalescing and
    spreads the compute.

    At production scale inputs have >= cluster-parallelism splits, the
    condition is false, and this is a no-op — no extra shuffle ever appears
    on a big scan.

    The split probe (``df.rdd.getNumPartitions()``) physically plans the
    scan, so its result is memoized per (context, file set) — row-group
    splits depend on the files, not the projection — and repeated loader
    calls skip the re-plan entirely.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        key = (id(spark.sparkContext), tuple(sorted(df.inputFiles())))
        n = _SPLIT_CACHE.get(key)
        if n is None:
            n = df.rdd.getNumPartitions()
            _SPLIT_CACHE[key] = n
    except Exception:  # non-scan input: fall back to the direct probe
        n = df.rdd.getNumPartitions()
    if n < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df


_SPLIT_CACHE: dict[tuple[int, tuple[str, ...]], int] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL entry point)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
