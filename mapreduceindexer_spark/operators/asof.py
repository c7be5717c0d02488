"""As-of (point-in-time) join — an operator Spark has no built-in for.

``asof_join(left, right, ...)`` attaches to every left row the payload of
the latest right row with the same key and ``right_ts <= left_ts``
(inclusive, like SQL ``ASOF JOIN``). Classic uses: trade↔quote matching,
attribute-conversion-to-last-click, slowly-changing-dimension lookup.

Spark-first realization (no range-join explosion, no per-key loops):

1. union both sides into one relation with a ``side`` marker
   (right = 0, left = 1) and the payload columns null on the left side;
2. one window per key ordered by ``(ts, side, tiebreak)`` — right rows
   sort before left rows at equal timestamps, which is exactly the
   inclusive at-or-before contract;
3. ``last(payload, ignorenulls=True)`` over rows unbounded-preceding..current
   carries the most recent right payload forward;
4. keep the left rows.

Cost: ONE shuffle (the window's hash partition on key) over |L| + |R|
rows — compare a naive range join (|L|·|R| per key) or per-key
``collect_list`` (unbounded row size). Skewed keys behave like any other
single-key window: mitigate by pre-bucketing hot keys, exactly as the
postings pipeline salts stopwords.

The reference engine has no join surface at all; this is north-star
extension coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
) -> DataFrame:
    """For each left row, attach the latest right row's payload columns
    (``payload`` maps right column → output alias) with the same ``key``
    and ``right_ts <= left_ts``; nulls where no right row qualifies.

    Both inputs must share no column names other than ``key`` (select
    before joining, as with any join).
    """
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(src).alias(alias) for src, alias in payload.items()],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(r.dtypes)[alias]).alias(alias) for alias in payload.values()],
    )
    u = l.select(r.columns + [c for c in l.columns if c not in r.columns]).unionByName(
        r, allowMissingColumns=True
    )
    # Payload aliases as final sort keys: if several right rows tie on
    # (ts), the greatest payload tuple wins deterministically — without
    # them, last() would pick whichever tied row happened to sort last.
    # (Left-row ties are harmless: their null payloads are ignored.)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", *payload.values())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(alias, ignorenulls=True).over(w).alias(f"__carried_{alias}")
            for alias in payload.values()
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__carried_{alias}").alias(alias) for alias in payload.values()
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def purchases_with_last_click(events: DataFrame) -> DataFrame:
    """Attribution query: each purchase event annotated with the user's most
    recent at-or-before click (id + value); null if the purchase precedes
    every click."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload={"click_id": "last_click_id", "click_value": "last_click_value"},
    )
