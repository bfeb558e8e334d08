"""Relational analytics operators over the star schema.

The reference owns no relational operators — every SELECT it issues is
evaluated by PostgreSQL (SURVEY.md §2.2); a mover user's seed query can
contain arbitrary joins/aggregates/windows, so a complete replacement engine
must evaluate them itself. These are expressed with the DataFrame API so
Catalyst picks physical strategies (broadcast for dims, partial aggregation,
AQE coalesce).

Float determinism: aggregates over doubles are computed via DECIMAL(25,4)
partial sums then cast back to double — bit-identical results regardless of
partitioning/summation order, so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive exact sum of a double column (via decimal).

    `scale` must cover the full decimal width of the value: a product with
    6 decimal digits (e.g. price*(1-disc)*(1+tax)) cast at scale 4 lands on
    .xxxx5 halfway points where Spark (shortest-repr HALF_UP) and DuckDB
    (binary-value rounding) disagree; at the exact scale there is no
    rounding at all and every engine recovers the same decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: Column | str) -> Column:
    # exact decimal sum (dsum — ONE definition of the width/scale) ->
    # double, then double division: decimal-division scale rules differ
    # across engines, double division does not
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def pricing_summary(cat: Catalog, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.

    Pure built-in functions -> whole-stage codegen; partial aggregation
    map-side, 2-col grouping key keeps the shuffle tiny at any scale.
    """
    li = cat.df("lineitem").where(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp_ntz"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(cat: Catalog, segment: str = "BUILDING", cutoff: str = "1997-01-01") -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped agg + deterministic top-10.

    customer is the small side -> Catalyst broadcasts it; lineitem joins
    orders on the shuffle key both sides already need.
    """
    cut = F.lit(cutoff).cast("timestamp_ntz")
    cust = cat.df("customer").where(F.col("c_mktsegment") == segment)
    orders = cat.df("orders").where(F.col("o_orderdate") < cut)
    li = cat.df("lineitem").where(F.col("l_shipdate") > cut)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def region_revenue(cat: Catalog, region: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: 5-way join through the dimension chain; every
    dimension broadcasts, lineitem never shuffles until the final agg."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        cat.df("lineitem")
        .join(cat.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.df("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.df("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.df("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.df("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == region)
    )
    return (
        df.groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def topk_orders_per_customer(cat: Catalog, k: int = 3) -> DataFrame:
    """Window top-k: rank orders per customer (deterministic tie-break)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        cat.df("orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def returnflag_rollup(cat: Catalog) -> DataFrame:
    """ROLLUP grouping-sets aggregation with explicit ALL markers."""
    return (
        cat.df("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


def except_semantics(cat: Catalog, threshold: float = 150000.0) -> DataFrame:
    """Set operation: customers with orders EXCEPT customers with any
    high-value order (left-anti after distinct — Catalyst's EXCEPT plan)."""
    with_orders = cat.df("orders").select("o_custkey").distinct()
    high = cat.df("orders").where(F.col("o_totalprice") > threshold).select("o_custkey").distinct()
    return (
        with_orders.exceptAll(high)
        .select(F.col("o_custkey").alias("custkey"))
        .orderBy("custkey")
    )


def value_window_funcs(cat: Catalog) -> DataFrame:
    """Value-window family over each customer's order history: first order
    price (running frame), second and last price (full-partition frame),
    and cumulative distribution. Frames are EXPLICIT rows-frames with a
    unique tie-break in the ordering, so every engine computes identical
    values; one shuffle on customer, one sort — same cost envelope as any
    per-key window."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cat.df("orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(run).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )
