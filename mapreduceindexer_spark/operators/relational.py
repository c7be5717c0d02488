"""Relational operator families (SURVEY §2.3 gap table).

The reference engine has none of these — its only relational shapes are the
seed operators (scan/filter/distinct/group-agg) inside the index pipeline
(``src/functions.cpp:48-168``). Here each family is generalized as an
idiomatic DataFrame program; Catalyst supplies pushdown, pruning, join
selection, and AQE — none of it is hand-scheduled.

Determinism contract (shared with the DuckDB oracles in catalog.py):

- double SUMs go through DECIMAL(38,10): exact, order-independent, so the
  result is bit-identical no matter how the shuffle interleaves partial
  aggregates. Per-row double *products* are IEEE-deterministic in both
  engines, so casting the product to decimal is still exact-per-row.
- AVGs = decimal sum cast to double / count, rounded to 6 digits.
- Window frames are always ROWS with a total-order ORDER BY (ties broken
  by a key column) — RANGE frames + peer rows would make running sums
  engine-dependent.

Scale notes are per-function docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def _dsum(col, alias: str, round_to: int = 4):
    """Order-independent sum of a double expression, rounded, as double."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), round_to).alias(alias)


def _davg(col, count_col, alias: str):
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / count_col, 6
    ).alias(alias)


def filter_shipdate(lineitem: DataFrame) -> DataFrame:
    """Filter family: BETWEEN + IN + LIKE, all pushed to the parquet scan.

    ``.explain`` shows PushedFilters for the range and IN predicates and a
    2-column ReadSchema — the scan never materializes unused columns.
    """
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "N")
        & F.col("l_linestatus").like("O%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over lineitem with computed measures.

    Scale: pure map-side partial + final hash aggregate on two low-card
    keys; no skew possible (6 groups), shuffle carries only partial states.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            _davg(F.col("l_quantity"), n, "avg_qty"),
            _davg(F.col("l_extendedprice"), n, "avg_price"),
            _davg(F.col("l_discount"), n, "avg_disc"),
            n.cast("bigint").alias("count_order"),
        )
    )


def orders_by_nation(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Join family: fact ⋈ dim ⋈ tiny-dim with explicit broadcast.

    ``nation`` (25 rows) is force-broadcast; ``customer`` is left to AQE
    (broadcast at small sf, shuffled-hash/sort-merge at scale). The
    aggregate pushes partially below the join output size.
    """
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "total_price", 2),
        )
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year: str = "1995",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue of *local* suppliers per nation.

    Join strategy at scale: the dimension chain region→nation collapses to
    a handful of rows after the region filter and is force-broadcast, as is
    ``supplier`` (10k/SF rows); lineitem⋈orders shuffles on orderkey
    (the two facts) and everything else hangs off that one exchange.
    The local-supplier condition (s_nationkey = c_nationkey) rides the
    broadcast join, not an extra shuffle.
    """
    nations_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    lo = f"{year}-01-01"
    hi = f"{int(year) + 1}-01-01"
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(
            F.broadcast(nations_in_region),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 2),
        )
    )


def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi-join family: EXISTS as left_semi (never materializes matches)."""
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join family: NOT EXISTS as left_anti."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def returnflag_rollup(lineitem: DataFrame) -> DataFrame:
    """Rollup family: hierarchical subtotals in one pass (partial aggs are
    shared across grouping sets by the planner)."""
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n"),
        _dsum(F.col("l_quantity"), "sum_qty"),
    )


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Distinct-aggregate family (exact). Two count-distincts in one pass —
    Spark expands to a single aggregate with distinct sets."""
    return lineitem.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def approx_distinct_parts(lineitem: DataFrame) -> DataFrame:
    """HLL sketch (rows-only check: estimate is engine-specific by design).

    At 100 TB this replaces exact countDistinct wherever a ±2% answer is
    acceptable — constant memory per partition instead of a distinct
    shuffle of every key.
    """
    return lineitem.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).cast("bigint").alias("approx_parts")
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window family: per-partition top-k with a rank that is total-ordered
    (price DESC, key ASC) so ties can't flip rows across engines."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= k)
    )


def running_user_value(events: DataFrame) -> DataFrame:
    """Window family: running sum + lag over an explicit ROWS frame.

    ROWS (not the default RANGE) + event_id tie-break: peer rows in a RANGE
    frame would make the cumulative sum depend on engine peer-handling.
    """
    order = [F.asc("ts"), F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wsum), 6).alias("running_value"),
        F.lag("value", 1).over(w).alias("prev_value"),
    )


def segment_custkey_setops(customer: DataFrame) -> DataFrame:
    """Set-op family: INTERSECT / EXCEPT / UNION (all distinct flavors)."""
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 1000.0).select("c_custkey")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return auto.intersect(rich).union(building.exceptAll(rich).distinct()).distinct()


def order_scalar_functions(orders: DataFrame) -> DataFrame:
    """Scalar-function family: string/date/math expressions, one codegen
    stage fused with the scan (no shuffle at all)."""
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dd"),
        F.substring("o_orderpriority", 3, 100).alias("prio"),
        F.upper("o_orderstatus").alias("status_u"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("mod7"),
        # Exact decimal arithmetic: double*0.1 is not representable in binary
        # FP, so round() on it diverges between engines; decimal is exact.
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("0.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("price_tenth"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("abs_diff"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.concat(F.col("o_orderstatus"), F.lit("/"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
    )
