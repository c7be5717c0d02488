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
    """Order-independent sum of a double expression, rounded, as double.

    The ROUND happens on the exact DECIMAL, not on the double: rounding a
    double is engine-dependent exactly at half-way points (Spark rounds the
    shortest decimal repr via BigDecimal, DuckDB rounds the true binary
    value — a sum landing on .xx5 flips a cent between them), while decimal
    HALF_UP is identical everywhere and the rounded decimal converts to the
    same double in both engines.
    """
    return F.round(F.sum(col.cast(DEC)), round_to).cast("double").alias(alias)


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

    Join ORDER is the optimization: the selective dimension chain reduces
    first — region filter → nations_in_region (handful of rows) →
    customers in the region (~1/|regions| of customers) → year+region
    orders — and only then does lineitem join, against an already-reduced
    orders side (AQE picks broadcast when it fits, else one orderkey
    shuffle of a 5x-smaller relation). Joining the two facts first and
    filtering afterwards — the naive transcription — shuffles the whole
    year of orders against lineitem and throws 80% away at the customer
    join. The local-supplier condition (s_nationkey = c_nationkey) rides
    the broadcast supplier join, never an extra shuffle.
    """
    nations_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    lo = f"{year}-01-01"
    hi = f"{int(year) + 1}-01-01"
    cust_region = customer.join(
        F.broadcast(nations_in_region),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    ord_region = orders.filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
    ).join(cust_region, orders.o_custkey == F.col("c_custkey"))
    return (
        lineitem.join(ord_region, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == F.col("c_nationkey")),
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


def band_join_bucketed(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range (band) join as an equi-join: each row of ``fact`` matched to the
    band(s) whose half-open interval ``[lo, hi)`` contains ``value_col``.

    The reference engine has no joins at all; this is the interval-join
    family (SURVEY §2.3) done scale-first. A naive range join is a
    broadcast-nested-loop (O(|fact| x |bands|) comparisons) — fine for a
    handful of bands, fatal when ``bands`` is large (e.g. per-key dynamic
    pricing tiers at 100 TB). Instead each band is exploded to the integer
    buckets its interval overlaps (``sequence(floor(lo/w), floor(hi/w))``)
    and the fact row computes its single bucket ``floor(value/w)``; the join
    is then a plain hash equi-join on ``bucket`` with the exact interval
    predicate as a residual filter. Shuffle cost is linear in both inputs
    (times the small explode factor = avg interval span / bucket width + 1),
    AQE handles bucket skew, and no nested-loop ever runs.
    """
    w = F.lit(bucket_width)
    exploded = bands.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / w).cast("long"),
                F.floor(F.col("hi") / w).cast("long"),
            )
        ),
    )
    keyed = fact.withColumn("bucket", F.floor(F.col(value_col) / w).cast("long"))
    v = F.col(value_col)
    return keyed.join(exploded, "bucket").filter(
        (v >= F.col("lo")) & (v < F.col("hi"))
    )


def quantity_band_summary(lineitem: DataFrame, bands: DataFrame) -> DataFrame:
    """Band-join consumer: per-band row count and exact-decimal quantity sum."""
    joined = band_join_bucketed(lineitem, bands, "l_quantity", bucket_width=10.0)
    return joined.groupBy("band_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        _dsum(F.col("l_quantity"), "sum_qty"),
    )


def daily_activity_outer(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Full-outer-join family: align two independently aggregated daily
    series (orders placed vs lineitems shipped) on the calendar day, keeping
    days present in only one side (nulls -> 0).

    Scale: both sides pre-aggregate to ~one row per day *before* the join,
    so the outer join is tiny regardless of fact size; the heavy lifting is
    two map-side-combined hash aggregates. Joining the raw facts and then
    aggregating would shuffle 100 TB to produce the same few thousand rows.
    """
    od = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    sd = lineitem.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_shipped")
    )
    return od.join(sd, "day", "full_outer").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("n_shipped", F.lit(0)).cast("bigint").alias("n_shipped"),
    )


def acctbal_distribution(customer: DataFrame, tiles: int = 4) -> DataFrame:
    """Window distribution-function family: ntile / percent_rank / cume_dist
    per market segment. The ORDER BY carries the primary key as tiebreak so
    every row has a distinct rank position — without it, peer groups make
    ntile assignment engine-dependent.

    Scale: one shuffle on the partition key; each segment sorts
    independently (Tungsten sort, spills if needed). Segments are few but
    large — if one segment dominated, pre-salting cannot help a global
    ntile; the scalable variant computes approximate quantile boundaries
    first and joins them in (see q_value_histogram for the fixed-boundary
    precedent).
    """
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(tiles).over(w).cast("bigint").alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def fuzzy_name_pairs(part: DataFrame, max_dist: int = 4) -> DataFrame:
    """Fuzzy-matching family: near-identical part names by Levenshtein edit
    distance, with blocking. The all-pairs comparison is O(n^2) and can
    never run at 100 TB; blocking on (p_brand, p_type) bounds each
    comparison group to one block (the classic record-linkage design — same
    shape as the LSH-banded near-dup in operators/dedup.py, with the block
    key in the role of the band signature).

    Scale: self-equi-join on the block key (hash join, linear shuffle),
    pair predicate ``a.key < b.key`` halves the block, and the edit-distance
    UDF-free built-in runs codegen-side. Block-size skew is the one hazard:
    a pathological block degrades to quadratic — cap block sizes upstream
    (salt wide blocks by a cheap second key, e.g. name length bucket).
    """
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    pairs = (
        a.join(b, ["brand", "ptype"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
    )
    return pairs.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n_close_pairs"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
        F.min("dist").cast("bigint").alias("min_dist"),
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, for every k —
    including the zero-order customers the inner join would drop (hence
    the left outer join with the filter ON the join, not WHERE).

    Two hash aggregates: per-customer order count (shuffle on custkey —
    the natural key, no skew), then the tiny count-of-counts. The second
    groupBy's input is one row per customer but its output is a few dozen
    rows; partial map-side aggregation collapses almost everything before
    the second (trivial) shuffle.
    """
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(o, customer["c_custkey"] == o["o_custkey"], "left")
        .groupBy(customer["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped between two
    nations (either direction), per (supplier nation, customer nation,
    ship year).

    Scale: the two-nation predicate is applied to each *dimension chain*
    before it touches the fact. Suppliers in {a,b} and customers in {a,b}
    are small filtered dims (broadcast); lineitem joins the supplier side
    first (cheap branch prune: rows whose supplier is in neither nation
    drop before the orders shuffle), then orders→customer. The either-
    direction pair condition is a residual filter on two already-joined
    nation names — never a join explosion. One fact shuffle (on orderkey)
    when the reduced orders side outgrows broadcast; the final aggregate
    has ≤ 2×2×years groups.
    """
    pair = [nation_a, nation_b]
    n_s = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n_s), supplier["s_nationkey"] == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n_c), customer["c_nationkey"] == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 2),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    part_type_rows: DataFrame | None = None,
    target_nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of a region's revenue for
    one part type, per order year. ``part_type_rows`` is the pre-filtered
    part dim (p_partkey only).

    Scale: numerator selection (supplier's nation == target) is a CASE in
    the aggregate, not a second pass — one fact scan computes both sums.
    Every dimension is reduced before the fact join (region→nations→
    customers-in-region; the filtered part type; supplier⋈nation name),
    and all of them broadcast. The share division happens on the
    few-rows-per-year aggregate, with both sums carried exactly in
    decimal so numerator/denominator are order-independent.
    """
    nations_in_region = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey")
    cust_region = customer.join(
        F.broadcast(nations_in_region),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_named = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.join(
        F.broadcast(part_type_rows), lineitem["l_partkey"] == F.col("p_partkey")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == target_nation, disc).otherwise(F.lit(0.0))
    per_year = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_region, orders["o_custkey"] == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_named), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(target.cast(DEC)).alias("_num"),
            F.sum(disc.cast(DEC)).alias("_den"),
        )
    )
    return per_year.select(
        "o_year",
        # Round the exact DECIMAL, then cast (the _dsum convention):
        # rounding the double repr diverges from DuckDB on half-cent sums.
        F.round(F.col("_num"), 2).cast("double").alias("nation_revenue"),
        F.round(F.col("_den"), 2).cast("double").alias("total_revenue"),
        # double/double of two exact-decimal-derived doubles: identical IEEE
        # division in both engines (decimal division scale rules differ).
        F.round(
            F.col("_num").cast("double") / F.col("_den").cast("double"), 6
        ).alias("mkt_share"),
    )


def returned_item_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items
    in one quarter.

    Scale: both facts are filtered at the scan (quarter predicate on
    orders, returnflag on lineitem — pushed to parquet), joined on
    orderkey, aggregated per customer, and only then joined to the
    customer dim (the aggregate is one row per returning customer, far
    smaller than lineitem). Top-k is TakeOrderedAndProject — no global
    sort. Tie-break on custkey keeps the limit deterministic.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 2)
        )
    )
    return (
        per_cust.join(customer, per_cust["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def top_revenue_suppliers(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue (the CREATE VIEW + scalar-max formulation, ties kept).

    Scale: one fact shuffle to the per-supplier aggregate; the max is a
    window over that aggregate (|suppliers| rows — small), NOT over the
    fact, and the equality compares the *rounded decimal* both sides so
    FP accumulation order can't split a tie across engines. The supplier
    dim joins after the max filter (usually a handful of rows,
    broadcast).
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                2,
            )
        )
    )
    w = Window.partitionBy()
    best = rev.withColumn("_mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    return best.join(
        supplier, best["l_suppkey"] == supplier["s_suppkey"]
    ).select("s_suppkey", "s_name", "total_revenue")


def excess_quantity_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_prefix: str = "small",
    qty_threshold: float = 45.0,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved an excess quantity of any
    matching part in one year (the nested-semi-join formulation:
    part-name filter → per-(part,supp) shipped quantity → threshold →
    supplier semi-join).

    Scale: the part-name filter broadcasts (it's a dimension subset); the
    fact aggregates on its natural (partkey, suppkey) key — no skew, both
    high-cardinality; the threshold filter collapses the aggregate to the
    few qualifying keys, and the supplier join is a semi against that
    small distinct set. Nothing re-scans lineitem.
    """
    matching_parts = part.filter(F.col("p_name").like(f"{name_prefix}%")).select(
        "p_partkey"
    )
    qualifying = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(matching_parts),
            lineitem["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dsum(F.col("l_quantity"), "qty", 2))
        .filter(F.col("qty") > qty_threshold)
        .select("l_suppkey")
        .distinct()
    )
    return supplier.join(
        qualifying, supplier["s_suppkey"] == qualifying["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: the forecasting-revenue-change query — one scalar
    aggregate over a triply-banded scan (date range, discount band,
    quantity ceiling).

    Scale: the simplest possible distributed plan and worth pinning for
    exactly that reason — ALL three predicates push to the parquet scan
    (PushedFilters; row-group min/max statistics prune whole groups), the
    projection reads two columns, and the aggregate is a map-side partial
    collapsing to one row. No shuffle carries data; only the 1-row
    partials move. This is the query whose plan must stay scan+agg at any
    scale — a regression here (lost pushdown, extra exchange) flags a
    loader or expression problem immediately.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 2),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


def product_type_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    name_fragment: str = "gear",
) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for parts
    whose name contains a fragment. The schema ships no partsupp table,
    so supply cost is adapted to ``p_retailprice * l_quantity / 10`` —
    the plan shape (fact ⋈ filtered part ⋈ supplier ⋈ nation ⋈ orders,
    profit expression inside one aggregate) is Q9's; only the cost
    column's provenance differs.

    Scale: the part-name filter contains a leading wildcard so it cannot
    prune the part SCAN, but it still reduces the dim to a broadcast
    BEFORE the fact join — lineitem rows for non-matching parts drop at
    the (broadcast) probe, before the orders shuffle. Supplier⋈nation
    broadcasts likewise. One fact shuffle (orderkey), and the final
    aggregate has |nations|×|years| groups. The profit measure is a
    per-row expression summed exactly in decimal.
    """
    matching = part.filter(F.col("p_name").contains(name_fragment)).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") / 10.0
    )
    return (
        lineitem.join(F.broadcast(matching), lineitem["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            _dsum(profit, "sum_profit", 2),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


def important_stock(
    lineitem: DataFrame, part: DataFrame, multiple: float = 1.5
) -> DataFrame:
    """TPC-H Q11 shape: parts whose total moved value exceeds a threshold
    derived from the GLOBAL total — the group-by + global-scalar-subquery
    formulation. Without a partsupp table the per-part value is
    ``sum(p_retailprice * l_quantity)`` over lineitem; Q11's fixed
    ``fraction`` (tuned to its SF) is replaced by ``multiple`` × the
    average per-part value, which keeps the selectivity meaningful at any
    scale factor while preserving the shape (inner aggregate, scalar over
    the SAME aggregate, HAVING comparison).

    Scale: one fact shuffle to the per-part aggregate; the global
    total/count is a window over that aggregate's rows (|parts|, small —
    NEVER a second fact scan), so threshold and groups come out of one
    pass. The comparison stays in exact decimal (multiple is applied to
    the value side as an exact integer-scaled product); rounded values
    are emitted only for display. At 100 TB the per-part aggregate is
    the only thing that scales, and it partitions on its natural
    high-cardinality key.
    """
    per_part = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_partkey")
        .agg(F.sum((F.col("p_retailprice") * F.col("l_quantity")).cast(DEC)).alias("_val"))
    )
    w = Window.partitionBy()
    # val > multiple * total / n  ⇔  val * n * 10 > total * (multiple*10):
    # exact decimal × integer on both sides, engine-independent.
    scaled = F.lit(int(multiple * 10)).cast(DEC)
    return (
        per_part.withColumn("_total", F.sum("_val").over(w))
        .withColumn("_n", F.count("*").over(w))
        .filter(F.col("_val") * F.col("_n") * F.lit(10) > F.col("_total") * scaled)
        .select(
            "p_partkey",
            F.round(F.col("_val"), 2).cast("double").alias("part_value"),
            F.round(F.col("_total"), 2).cast("double").alias("total_value"),
        )
    )


def profile_columns(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """One-pass data-profiling sheet: per column, null count, exact
    distinct count, and min/max rendered as strings (doubles through
    DECIMAL(18,2) so both engines print the same digits).

    All statistics come from a single aggregate over one scan; the
    several exact COUNT(DISTINCT)s plan as one Expand (row multiplied by
    n_cols) feeding one hash aggregate — still one pass over the data,
    with partial aggregation collapsing each column's domain map-side. At
    warehouse scale swap countDistinct for approx_count_distinct and the
    plan loses the Expand entirely; exact is kept here because profiles
    feed data-contract checks that compare engines.
    """

    def fmt(c, typ):
        if typ == "double":
            return F.round(c, 2).cast("decimal(18,2)").cast("string")
        return c.cast("string")

    aggs = []
    for name, typ in cols:
        c = F.col(name)
        aggs += [
            F.sum(c.isNull().cast("bigint")).alias(f"{name}__nn"),
            F.countDistinct(c).alias(f"{name}__nd"),
            fmt(F.min(c), typ).alias(f"{name}__min"),
            fmt(F.max(c), typ).alias(f"{name}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{n}', {n}__nn, {n}__nd, {n}__min, {n}__max" for n, _ in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        )
    )


def range_partition_bounds(
    df: DataFrame, value_col: str, n_parts: int = 8
) -> DataFrame:
    """Equi-depth range-partition boundaries + per-range populations — the
    X3 analogue from the reference's scheduler (its static letter ranges,
    ``src/main.cpp``) generalized to data-driven ranges: the split points
    ``repartitionByRange`` / a range-sharded sink would use, computed
    EXACTLY (production uses reservoir-sampled bounds — same output
    contract, approximate ranks).

    Two passes, neither a global sort: (1) one scalar aggregate computes
    the n−1 interior boundaries as exact percentile_cont values; (2) the
    1-row boundary vector broadcasts back and each row's bucket is a sum
    of comparisons — a narrow codegen expression — feeding an n-group
    aggregate. The equi-depth property itself is the test: populations
    must differ only by interpolation ties.

    Determinism: the probe points k/8 are exact binary doubles; a
    boundary either equals a data value exactly (integer rank, g=0 —
    identical in both engines) or lies strictly inside a gap between two
    values ≥ 1 cent apart, so 1-ulp interpolation differences can never
    flip a bucket comparison. Boundary display values round to 6.
    """
    ps = [k / n_parts for k in range(1, n_parts)]
    bounds = df.agg(
        *[
            F.percentile(value_col, F.lit(p)).alias(f"b{k}")
            for k, p in enumerate(ps, start=1)
        ]
    )
    bucket = None
    for k in range(1, n_parts):
        term = (F.col(value_col) > F.col(f"b{k}")).cast("int")
        bucket = term if bucket is None else bucket + term
    barr = F.array(*[F.col(f"b{k}") for k in range(1, n_parts)])
    return (
        df.select(value_col)
        .crossJoin(F.broadcast(bounds))
        .select(bucket.cast("bigint").alias("bucket"), barr.alias("_b"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_rows"), F.first("_b").alias("_b"))
        .select(
            "bucket",
            F.round(
                F.when(F.col("bucket") > 0, F.element_at("_b", F.col("bucket").cast("int"))),
                6,
            ).alias("range_lo"),
            F.round(
                F.when(
                    F.col("bucket") < n_parts - 1,
                    F.element_at("_b", (F.col("bucket") + 1).cast("int")),
                ),
                6,
            ).alias("range_hi"),
            "n_rows",
        )
    )


def salted_join_agg(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    group_col: str,
    sum_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Skew-proof shuffle join: the SALTED join ⟶ aggregate pattern, the
    join-side twin of the index build's salted aggregation. When one join
    key carries a disproportionate share of fact rows (the "hot customer"
    / stopword pathology), a plain hash join lands that key's entire
    population on ONE reduce task; salting splits it across ``buckets``
    tasks at the cost of replicating the (small) dim side ×buckets.

    Mechanics: dim rows replicate with salt 0..B−1 (an explode of a
    constant B-element array — narrow); fact rows compute a DETERMINISTIC
    content-based salt ``pmod(xxhash64(whole row), B)`` so the result is
    reproducible across retries; the join matches on
    (key, salt), so every fact row still meets exactly one dim replica —
    the relational answer is IDENTICAL to the unsalted join, which is
    exactly what the DuckDB oracle (a plain join) checks. AQE's skew-join
    splitting does this adaptively for sort-merge joins; the explicit
    form works for any join strategy and any engine, and composes with
    the aggregate pushdown below it.

    The group aggregate after the join is keyed independently of the
    salt, so partial aggregation absorbs the ×B replication before the
    final shuffle.
    """
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    # The salt MUST vary per row within the same join key (a salt that is
    # a function of the key alone sends the hot key's rows to one
    # constant salt — the original skew, verbatim; caught live by the
    # reduce-partition census in PLANS.md). Hash the WHOLE row: content-
    # deterministic (identical across retries and input reorderings),
    # and engine-native xxhash64 is fine because the salt never reaches
    # the result — only its distribution matters.
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(buckets)).cast(
            "int"
        ),
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
    )
    return joined.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        _dsum(F.col(sum_col), "total", 2),
    )
