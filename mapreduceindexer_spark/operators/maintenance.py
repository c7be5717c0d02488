"""Table-maintenance operators: small-file compaction.

A long-lived ingest pipeline (streaming sinks, frequent small upserts)
fragments a table into thousands of tiny files; at 100 TB the resulting
task explosion and per-file open cost dominate scan time. Compaction
rewrites a directory into ~target-sized files, optionally range-clustered
on a key so parquet min/max footer statistics (and any later
partition-range pruning) stay effective after the rewrite.

The reference engine has no table layer at all (its sink writes 26 fixed
per-letter files, ``src/functions.cpp:146-164``); this is part of the
pipeline-maintenance family (see also q_upsert / q_scd2 in catalog.py).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def plan_target_files(total_bytes: int, target_file_bytes: int) -> int:
    """Number of output files for a compaction: ceil(bytes / target),
    never zero."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_files(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: str | None = None,
) -> int:
    """Rewrite ``in_dir`` (parquet) into ``out_dir`` as ~target-sized
    files; returns the file count written.

    Sizing uses the *source* byte footprint (driver-side listing here; on
    an object store the same numbers come from the table manifest or
    listing API — one metadata call, not a data read). Without
    ``cluster_by`` the rewrite is a plain ``repartition(n)`` — one round-
    robin shuffle, perfectly balanced output. With ``cluster_by`` it is
    ``repartitionByRange(n, key).sortWithinPartitions(key)``: output files
    cover disjoint key ranges, so every file's parquet min/max footer
    prunes key-predicate scans — compaction then *improves* data skipping
    instead of destroying it. Range boundaries come from Spark's reservoir
    sample of the key, so skewed keys still yield balanced files.
    """
    n = plan_target_files(_dir_bytes(in_dir), target_file_bytes)
    df: DataFrame = spark.read.parquet(in_dir)
    if cluster_by is None:
        out = df.repartition(n)
    else:
        out = df.repartitionByRange(n, cluster_by).sortWithinPartitions(cluster_by)
    out.write.mode("overwrite").parquet(out_dir)
    return n


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: multi-dimensional clustering for data skipping.
# ---------------------------------------------------------------------------

ZORDER_BITS = 16  # per-dimension resolution; z fits 2*ZORDER_BITS bits


def zorder_interleave(sx, sy, bits: int = ZORDER_BITS):
    """Morton interleave of two pre-scaled non-negative ints (< 2**bits):
    bit i of ``sx`` lands at z-bit 2i, bit i of ``sy`` at 2i+1. Pure
    narrow integer arithmetic — whole-stage codegen, no shuffle, and the
    identical shift/mask expression is replayable by any engine
    (``zorder_interleave_sql`` emits the DuckDB twin)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(sx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(sy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_interleave_sql(sx: str, sy: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB-replayable text twin of :func:`zorder_interleave`."""
    return " + ".join(
        f"((({sx} >> {i}) & 1) << {2 * i}) + ((({sy} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def zorder_bucket_stats(
    df: DataFrame,
    col_x: str,
    col_y: str,
    n_bucket_bits: int = 6,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Per-bucket extent statistics of a Z-order layout over two integer
    dimensions: scale each to ``bits`` bits min-max, Morton-interleave,
    bucket on the top ``n_bucket_bits`` z-bits (an equal-width 2^(b/2) ×
    2^(b/2) grid — NO global sort, no sampled range boundaries, so the
    bucketing is deterministic and oracle-replayable).

    Returns (bucket, n_rows, x_min, x_max, y_min, y_max) — the point of
    z-order: EVERY bucket's extent is bounded in BOTH dimensions
    (~span/2^(b/2) each), so parquet footer min/max prune predicates on
    either column; a one-dimensional sort bounds only its own column.
    Pinned by tests/test_zorder.py.

    Scale shape: the min/max scalars are one agg broadcast back (4
    values); scaling + interleave is narrow per-row integer arithmetic;
    the only shuffle is the final 2^n_bucket_bits-group aggregate. The
    clustering WRITE for a real table is ``compact_files(...,
    zorder_by=(x, y))`` below.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    bounds = df.agg(
        F.min(col_x).cast("bigint").alias("_xmin"),
        F.max(col_x).cast("bigint").alias("_xmax"),
        F.min(col_y).cast("bigint").alias("_ymin"),
        F.max(col_y).cast("bigint").alias("_ymax"),
    )
    scaled = (
        df.select(F.col(col_x).cast("bigint").alias("_x"), F.col(col_y).cast("bigint").alias("_y"))
        .crossJoin(F.broadcast(bounds))
        .selectExpr(
            "_x",
            "_y",
            f"CASE WHEN _xmax > _xmin THEN (_x - _xmin) * {top} DIV (_xmax - _xmin) ELSE CAST(0 AS BIGINT) END AS _sx",
            f"CASE WHEN _ymax > _ymin THEN (_y - _ymin) * {top} DIV (_ymax - _ymin) ELSE CAST(0 AS BIGINT) END AS _sy",
        )
    )
    z = zorder_interleave(F.col("_sx"), F.col("_sy"), bits)
    return (
        scaled.select(
            "_x",
            "_y",
            F.shiftrightunsigned(z, 2 * bits - n_bucket_bits).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
    )


def zorder_column(df: DataFrame, col_x: str, col_y: str, bits: int = ZORDER_BITS):
    """``df`` plus a ``_z`` Morton key over min-max-scaled ``col_x``/
    ``col_y`` (helper for the clustered write)."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    bounds = df.agg(
        F.min(col_x).cast("bigint").alias("_xmin"),
        F.max(col_x).cast("bigint").alias("_xmax"),
        F.min(col_y).cast("bigint").alias("_ymin"),
        F.max(col_y).cast("bigint").alias("_ymax"),
    )
    with_scaled = df.crossJoin(F.broadcast(bounds)).selectExpr(
        "*",
        f"CASE WHEN _xmax > _xmin THEN (CAST({col_x} AS BIGINT) - _xmin) * {top} DIV (_xmax - _xmin) ELSE CAST(0 AS BIGINT) END AS _sx",
        f"CASE WHEN _ymax > _ymin THEN (CAST({col_y} AS BIGINT) - _ymin) * {top} DIV (_ymax - _ymin) ELSE CAST(0 AS BIGINT) END AS _sy",
    )
    return with_scaled.withColumn(
        "_z", zorder_interleave(F.col("_sx"), F.col("_sy"), bits)
    ).drop("_xmin", "_xmax", "_ymin", "_ymax", "_sx", "_sy")


def compact_files_zordered(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    col_x: str,
    col_y: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Compaction clustered on a Z-order key over TWO columns (the
    OPTIMIZE ... ZORDER BY of table formats, expressed on plain parquet):
    every output file covers a contiguous Morton range, whose preimage is
    a bounded rectangle — so footer min/max statistics prune predicates
    on EITHER column. Range boundaries come from Spark's reservoir sample
    of the z key (layout only — never affects values)."""
    n = plan_target_files(_dir_bytes(in_dir), target_file_bytes)
    df = zorder_column(spark.read.parquet(in_dir), col_x, col_y)
    (
        df.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return n


def incremental_mv_refresh(
    spark: SparkSession,
    base,
    mv,
    delta_to_partial,
    combine,
) -> int:
    """Advance a MATERIALIZED-VIEW table to the base table's current
    version by aggregating ONLY the unprocessed delta — the table-owned
    form of the monoid-merge contract ``q_incr_agg`` pins in memory.

    ``base`` and ``mv`` are TransactionalTables. The MV's manifest meta
    records the base version it reflects (``processed``); a refresh
    reads ``base.read_changes(processed, base_cur)`` (manifest dir-diff
    — history is never rescanned), folds it with ``delta_to_partial``,
    merges partials with ``combine`` (must be associative/commutative:
    sums of counts, sums of decimal sums, min/max — the monoid menu),
    and commits the merged view with ``meta={"processed": base_cur}``.

    Exactly-once composes from both sides: the commit carries
    ``expected_version`` (a racing refresher loses the manifest CAS and
    retries), and a RETRIED refresh whose predecessor already landed
    sees ``processed >= base_cur`` and no-ops — the same batch-id
    idempotence discipline as the streaming sinks. The MV itself is
    rewritten per refresh (mode=overwrite): views are small aggregates
    by construction, so the rewrite is O(|view|), never O(base). At
    100 TB this is the difference between a rollup that updates in
    seconds off the commit log and a nightly full recompute. Any
    non-append base commit in the unprocessed range raises (the change
    feed's soundness rule): rewrites invalidate incremental partials,
    so rebuild the view from scratch after compaction/DML — exactly
    Delta's MV-over-CDF caveat."""
    base_v = base.current_version()
    mv_v = mv.current_version()
    processed = mv.meta_of(mv_v).get("processed", 0) if mv_v else 0
    if processed >= base_v:
        return mv_v  # already current (or a replayed refresh): no-op
    delta = base.read_changes(spark, processed, base_v)
    partial = delta_to_partial(delta)
    merged = combine(mv.read(spark, mv_v), partial) if mv_v else partial
    return mv.commit(
        merged,
        mode="overwrite",
        expected_version=mv_v,
        meta={"processed": base_v},
    )


def incremental_mv_join_refresh(
    spark: SparkSession,
    a,
    b,
    mv,
    join_delta,
) -> int:
    """Advance a JOIN materialized view to both base tables' current
    versions by joining ONLY the unprocessed deltas — incremental view
    maintenance for the binary-join case the monoid refresh above
    cannot express.

    ``a``/``b``/``mv`` are TransactionalTables; ``join_delta(left,
    right)`` builds the view rows for one (left, right) pair (the join
    + projection). For append-only bases the view delta decomposes as

        Δ(A ⋈ B) = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)

    — the first term covers ΔA against everything B now holds
    (including ΔB, so ΔA ⋈ ΔB is counted once), the second adds the
    late-arriving right-side matches against the PRE-delta left side.
    ``A_old`` is exact, not approximated: the MV's manifest meta
    records the (processed_a, processed_b) version pair it reflects,
    and the snapshot layer time-travels to ``processed_a`` — the IVM
    algebra rides directly on the table format's versioning. Deltas
    come from ``read_changes`` (manifest dir-diff, history never
    rescanned); a non-append base commit in the range raises there.

    The view table only ever APPENDS its delta rows, so refresh cost is
    O(|ΔA| ⋈ B + A_old ⋈ |ΔB|) with small-side broadcast picked by AQE
    — never O(A ⋈ B). Late-arriving dimension rows are handled by the
    second term: a fact that found no partner at its own refresh joins
    when the partner's delta arrives. Exactly-once composes exactly as
    in ``incremental_mv_refresh``: CAS on ``expected_version`` plus
    processed-pair idempotence (a replayed refresh no-ops). Returns the
    MV's (possibly unchanged) version."""
    a_cur, b_cur = a.current_version(), b.current_version()
    mv_v = mv.current_version()
    meta = mv.meta_of(mv_v) if mv_v else {}
    pa, pb = meta.get("processed_a", 0), meta.get("processed_b", 0)
    if (pa >= a_cur and pb >= b_cur) or a_cur == 0 or b_cur == 0:
        return mv_v  # current, replayed, or a side still empty: no-op
    parts = []
    if a_cur > pa:
        delta_a = a.read_changes(spark, pa, a_cur)
        parts.append(join_delta(delta_a, b.read(spark, b_cur)))
    if b_cur > pb:
        a_old = (
            a.read(spark, pa)
            if pa >= 1
            else a.read(spark, a_cur).limit(0)
        )
        parts.append(join_delta(a_old, b.read_changes(spark, pb, b_cur)))
    delta = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return mv.commit(
        delta,
        mode="append",
        expected_version=mv_v,
        meta={"processed_a": a_cur, "processed_b": b_cur},
    )
