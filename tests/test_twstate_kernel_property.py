"""Property: the twstate kernel's per-row scaled value is EXACTLY
Spark's ``CAST(value AS DECIMAL(18,6)) * 1e6 -> BIGINT`` — for
adversarial doubles, not just the shipped data. The whole r11 red-row
fix rests on this equivalence (kernel ≡ batch twin ≡ oracle), so it
gets its own pin: a deterministic edge battery (IEEE half-way reprs,
DECIMAL(18,6) overflow boundary at |v| = 1e12 where the non-ANSI cast
NULLs, subnormals, NaN/±inf, NULL) plus hypothesis-generated floats,
each batch compared cell-by-cell against the JVM cast."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceindexer_spark.streaming.twstate import _accumulate_batch

EDGES = [
    0.0,
    -0.0,
    0.49999999999999994,  # + 0.5 == 1.0 in IEEE; repr-HALF_UP says 0
    0.0000005,  # exactly representable? no — repr "5e-07", ties at 1e-6
    0.00000049999999999999998,
    -0.0000005,
    1.5e-06,
    2.5e-07,
    123.4567895,  # 7 fractional digits, tie digit
    -123.4567885,
    999999999999.9998779296875,  # largest double below 1e12
    -999999999999.9998779296875,
    1e12,  # DECIMAL(18,6) overflow -> NULL / kernel drop
    -1e12,
    1.0000000000001e12,
    5e-324,  # min subnormal
    -5e-324,
    1.7976931348623157e308,
    float("nan"),
    float("inf"),
    float("-inf"),
    None,
    490.02,  # shipped-data shapes
    32.65,
]


def _spark_scaled(spark, values: list) -> list:
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i bigint, value double"
    )
    scaled = (
        F.col("value").cast("decimal(18,6)")
        * F.lit(1_000_000).cast("decimal(7,0)")
    ).cast("bigint")
    rows = df.select("i", scaled.alias("s")).collect()
    return [r.s for r in sorted(rows, key=lambda r: r.i)]


def _kernel_scaled(values: list) -> list:
    out = []
    for v in values:
        n, s = _accumulate_batch(0, 0, pd.DataFrame({"value": [v]}))
        # A dropped value contributes 0 to the sum; distinguish "kept 0"
        # from "dropped" via the batch-sum semantics: Spark's NULL also
        # contributes nothing, so comparing CONTRIBUTIONS is the right
        # equivalence (sum skips NULLs).
        out.append(s)
    return out


def _check(spark, values: list) -> None:
    jvm = _spark_scaled(spark, values)
    ker = _kernel_scaled(values)
    for v, j, k in zip(values, jvm, ker):
        want = 0 if j is None else j
        assert k == want, (v, j, k)


def test_kernel_matches_spark_cast_on_edge_battery(spark):
    _check(spark, EDGES)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=40,
    )
)
def test_kernel_matches_spark_cast_on_arbitrary_doubles(spark, values):
    _check(spark, values)
