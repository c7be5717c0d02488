"""Pins for the Z-order layout family: locality bounds (the property the
layout exists for), interleave bit-exactness, and footer-level data
skipping after a z-ordered compaction write.
"""

import glob
import os

from pyspark.sql import functions as F

from mapreduceindexer_spark.operators.maintenance import (
    compact_files_zordered,
    zorder_bucket_stats,
    zorder_interleave,
)

from tests.conftest import SF_SMOKE as SF


def test_interleave_matches_reference_bit_math(spark):
    # Hand-computed Morton codes: z(x=0b11, y=0b01) = x bits at even
    # positions (0b0101) + y bits at odd positions (0b0010) = 0b0111.
    rows = spark.range(1).select(
        zorder_interleave(F.lit(3).cast("bigint"), F.lit(1).cast("bigint")).alias("a"),
        zorder_interleave(F.lit(0).cast("bigint"), F.lit(0).cast("bigint")).alias("b"),
        zorder_interleave(F.lit(65535).cast("bigint"), F.lit(65535).cast("bigint")).alias("c"),
        zorder_interleave(F.lit(65535).cast("bigint"), F.lit(0).cast("bigint")).alias("d"),
    ).first()
    assert rows.a == 0b0111
    assert rows.b == 0
    assert rows.c == (1 << 32) - 1  # all 32 bits set
    assert rows.d == sum(1 << (2 * i) for i in range(16))  # even bits only


def test_every_bucket_extent_bounded_in_both_dimensions(spark):
    # Top-6-bit bucketing = an 8x8 grid: each bucket's preimage spans at
    # most 1/8 of EITHER dimension's range (plus integer-scaling slack of
    # one grid cell). A 1-D sort gives this bound for its own key only.
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    stats = zorder_bucket_stats(li, "l_orderkey", "l_partkey").collect()
    assert len(stats) > 1
    bx = li.agg(
        F.min("l_orderkey").alias("xmin"), F.max("l_orderkey").alias("xmax"),
        F.min("l_partkey").alias("ymin"), F.max("l_partkey").alias("ymax"),
    ).first()
    span_x, span_y = bx.xmax - bx.xmin, bx.ymax - bx.ymin
    for r in stats:
        assert r.x_max - r.x_min <= span_x / 8 + span_x / 65535 + 1
        assert r.y_max - r.y_min <= span_y / 8 + span_y / 65535 + 1
    # Buckets partition the relation.
    assert sum(r.n_rows for r in stats) == li.count()


def test_zordered_compaction_bounds_file_extents(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "zout")
    spark.read.parquet(os.path.join(SF, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).write.parquet(src)
    n = compact_files_zordered(
        spark, src, out, "l_orderkey", "l_partkey", target_file_bytes=4 << 10
    )
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert n >= 4 and len(files) >= 4
    # Each file = a contiguous Morton range = a bounded rectangle: its
    # min/max footer must span well under the full range in BOTH dims for
    # most files (a straight l_orderkey sort would leave l_partkey
    # extents at ~full span in EVERY file).
    full = spark.read.parquet(src).agg(
        F.min("l_partkey").alias("ymin"), F.max("l_partkey").alias("ymax")
    ).first()
    span_y = full.ymax - full.ymin
    bounded = 0
    for f in files:
        st = spark.read.parquet(f).agg(
            F.min("l_partkey").alias("a"), F.max("l_partkey").alias("b")
        ).first()
        if st.b - st.a <= 0.7 * span_y:
            bounded += 1
    assert bounded >= len(files) // 2, (bounded, len(files))
    # Layout never changes values.
    a = spark.read.parquet(src).groupBy().agg(
        F.sum("l_quantity").alias("s"), F.count("*").alias("n")
    ).first()
    b = spark.read.parquet(out).groupBy().agg(
        F.sum("l_quantity").alias("s"), F.count("*").alias("n")
    ).first()
    assert (a.s, a.n) == (b.s, b.n)
