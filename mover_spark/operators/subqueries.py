"""Subquery, set-op, pivot, and statistical aggregation operators.

Second relational batch (first: analytics.py). The reference delegates all
of these to PostgreSQL inside user seed queries (SURVEY.md §2.2); a
replacement engine must evaluate them natively. Each shape is expressed so
Catalyst picks the scale-correct physical plan:

- scalar/correlated subqueries  -> window-min or broadcast scalar, never a
  per-row re-scan of the inner table;
- EXISTS / NOT EXISTS           -> left_semi / left_anti joins (hash-based,
  null-safe, no row-at-a-time probing);
- CUBE / pivot                  -> native grouping-sets expansion (one scan,
  partial aggregation map-side);
- percentiles / stddev          -> exact `percentile` (JVM-side) and
  decimal-sum moment formulas so results are partition-order-invariant and
  oracle hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from .analytics import davg, dsum

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def scalar_subquery_min(cat: Catalog) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape): suppliers whose account
    balance equals their nation's minimum.

    The correlated `(SELECT MIN(..) WHERE nation = outer.nation)` becomes a
    window-min over one shuffle by nation — the inner table is scanned once,
    not once per outer row."""
    w = Window.partitionBy("s_nationkey")
    return (
        cat.df("supplier")
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


def exists_semijoin(cat: Catalog) -> DataFrame:
    """EXISTS (TPC-H Q4 shape): count orders per priority having at least
    one line item shipped after the order date.

    The correlated EXISTS with a per-order inequality is evaluated as an
    aggregate transform: EXISTS(l_shipdate > o_orderdate) over an order's
    lines ⟺ MAX(l_shipdate) > o_orderdate. The pre-aggregation map-side
    combines the fact table down to one row per distinct orderkey BEFORE
    the shuffle, and the residual join is pure-equi (hash-joinable) —
    where the literal left_semi with the non-equi conjunct must shuffle
    every fact row to its key. Same output on every edge (no lines /
    all-null shipdates both drop the order under either form); measured
    1.8× faster at sf10 (60M lineitem). At a skewed 100 TB the partial
    agg also caps any hot orderkey's shuffle contribution at one row per
    map task."""
    ord_ = cat.df("orders")
    late_max = (
        cat.df("lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    hit = ord_.join(late_max, "o_orderkey").where(
        F.col("__max_ship") > F.col("o_orderdate")
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def forecast_revenue(cat: Catalog, year: str = "1997") -> DataFrame:
    """TPC-H Q6 shape: single filtered scan + global aggregate. The filters
    push into the parquet scan; one row crosses the final exchange."""
    li = cat.df("lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def volume_shipping(cat: Catalog, nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7 shape: supplier-nation x customer-nation trade volume by
    year, both directions. Nation is broadcast twice under different
    aliases; lineitem⋈orders carries the only large shuffle."""
    n1 = cat.df("nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.df("nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    df = (
        cat.df("lineitem")
        .join(cat.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.df("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.df("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        df.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def distinct_count_agg(cat: Catalog) -> DataFrame:
    """COUNT(DISTINCT) per group (TPC-H Q16 shape): suppliers per part
    brand. Catalyst expands distinct-agg into a two-level aggregate —
    partial distinct map-side, no global set materialization."""
    return (
        cat.df("lineitem")
        .join(F.broadcast(cat.df("part")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy("p_brand")
    )


def having_filter(cat: Catalog, min_qty: float = 150.0) -> DataFrame:
    """HAVING (TPC-H Q18 shape): orders whose total quantity exceeds a
    threshold, joined back to the customer. The heavy agg runs first and
    shrinks the join input to the matching keys only."""
    big = (
        cat.df("lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        cat.df("orders")
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cat.df("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


def anti_join_not_exists(cat: Catalog, priority: str = "1-URGENT") -> DataFrame:
    """NOT EXISTS as left_anti: customers who never placed an order of the
    given priority. The filter lands on the build side before the join."""
    urgent = cat.df("orders").where(F.col("o_orderpriority") == priority)
    return cat.df("customer").join(
        urgent.select(F.col("o_custkey").alias("c_custkey")),
        on=["c_custkey"],
        how="left_anti",
    )


def rich_idle_customers(cat: Catalog, priority: str = "1-URGENT") -> DataFrame:
    """Scalar subquery + NOT EXISTS (TPC-H Q22 shape): per-nation count and
    balance-sum of customers above the global positive-balance average with
    no urgent order. The scalar average is computed once and broadcast as a
    1-row cross join — never re-evaluated per row."""
    cust = cat.df("customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    urgent = cat.df("orders").where(F.col("o_orderpriority") == priority)
    idle = cust.join(
        urgent.select(F.col("o_custkey").alias("c_custkey")),
        on=["c_custkey"],
        how="left_anti",
    )
    return (
        idle.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_nationkey")
    )


def cube_agg(cat: Catalog) -> DataFrame:
    """CUBE grouping sets over orders: all 4 combinations of
    (status, priority) in one scan, ALL markers made explicit."""
    return (
        cat.df("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


def intersect_set_op(cat: Catalog) -> DataFrame:
    """INTERSECT: customers holding both a finished and an open order."""
    f_cust = cat.df("orders").where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = cat.df("orders").where(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        f_cust.intersect(o_cust)
        .select(F.col("o_custkey").alias("custkey"))
        .orderBy("custkey")
    )


def pivot_events(cat: Catalog) -> DataFrame:
    """Pivot: per-user event counts, one column per event type. The value
    list is pinned (EVENT_TYPES) so the plan is a single grouping pass —
    no extra distinct-values job, stable schema at any scale."""
    return (
        cat.df("events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def percentile_agg(cat: Catalog) -> DataFrame:
    """Exact interpolated percentiles (median / p90 of order price per
    status) — JVM-side `percentile`, one shuffle on the 3-value group key.
    Both quantiles come from ONE percentile(..., array(...)) aggregate:
    the scalar form buffers and sorts the group's full value list once
    PER QUANTILE, the array form once per group (same interpolation math
    on the same sorted buffer — bit-identical values)."""
    return (
        cat.df("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, array(0.5, 0.9))").alias("__p"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            F.round(F.col("__p")[0], 6).alias("p50_price"),
            F.round(F.col("__p")[1], 6).alias("p90_price"),
            "n_orders",
        )
        .orderBy("o_orderstatus")
    )


def stddev_stats(cat: Catalog) -> DataFrame:
    """Moment statistics with partition-order-invariant math: mean and
    sample stddev from decimal partial sums (sum, sum of squares) rather
    than the streaming variance update — bit-identical under any partition
    count, so the oracle hash matches."""
    li = cat.df("lineitem")
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("l_extendedprice").cast("decimal(25,4)")).cast("double")
    # square in double (IEEE-deterministic), then decimal-sum the products —
    # same engine-portable pattern as dsum over a computed expression
    s2 = F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(30,4)")).cast(
        "double"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n_items"),
            F.round(s1 / n, 6).alias("mean_price"),
            F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias("stddev_price"),
        )
        .orderBy("l_returnflag")
    )


def cust_order_distribution(cat: Catalog, excl_priority: str = "1-URGENT") -> DataFrame:
    """LEFT OUTER join + null-skipping count (TPC-H Q13 shape): order-count
    histogram over ALL customers, zero-order customers included. The extra
    join predicate lives in the join condition (not a post-filter), which is
    what preserves the unmatched left rows."""
    c = cat.df("customer")
    o = cat.df("orders").where(F.col("o_orderpriority") != excl_priority)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col) skips nulls
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def full_outer_status_spend(cat: Catalog) -> DataFrame:
    """FULL OUTER join of two per-customer aggregates (spend on finished vs
    open orders) — exercises outer-join null semantics + coalesce."""
    o = cat.df("orders")
    f_spend = (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum("o_totalprice").alias("f_spend"))
    )
    o_spend = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum("o_totalprice").alias("o_spend"))
    )
    return (
        f_spend.join(o_spend, on=["custkey"], how="full_outer")
        .select(
            "custkey",
            F.coalesce("f_spend", F.lit(0.0)).alias("f_spend"),
            F.coalesce("o_spend", F.lit(0.0)).alias("o_spend"),
        )
        .orderBy("custkey")
    )


def promo_revenue_ratio(cat: Catalog, year: str = "1997") -> DataFrame:
    """Conditional aggregation (TPC-H Q14 shape): CASE inside the aggregate
    — the % of revenue from 'PROMO%' parts, one scan, no extra join for the
    numerator."""
    li = cat.df("lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(cat.df("part")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * dsum(promo) / dsum(rev), 6).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def small_quantity_orders(cat: Catalog, frac: float = 0.5) -> DataFrame:
    """Per-group scalar subquery filter (TPC-H Q17 shape): line items whose
    quantity is below `frac` x their part's average quantity. The correlated
    AVG becomes one aggregate joined back — the part table is scanned once,
    not per row."""
    li = cat.df("lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(25,4)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(avg_q, li.l_partkey == avg_q.pk)
        .where(F.col("l_quantity") < frac * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def disjunctive_revenue(cat: Catalog) -> DataFrame:
    """OR-of-ANDs predicates (TPC-H Q19 shape): three disjoint brand/size/
    quantity bands in one scan — Catalyst splits the disjunction into
    per-conjunct parquet pushdown instead of a post-scan filter."""
    li = cat.df("lineitem")
    p = cat.df("part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(band).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


def grouping_sets_agg(cat: Catalog) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): totals by
    (status), by (priority), and grand total in one scan via SQL grouping
    sets. Subtotal rows are labeled 'ALL' via COALESCE — which conflates a
    genuine NULL group value with a subtotal marker; fine for these
    NOT-NULL fixture columns, but a nullable dimension needs GROUPING()
    markers instead (same caveat applies to cube_agg/rollup_agg)."""
    spark = cat.spark
    cat.df("orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        "SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus, "
        "COALESCE(o_orderpriority, 'ALL') AS orderpriority, "
        "COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_price "
        "FROM __orders_gs "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
        "ORDER BY orderstatus, orderpriority"
    )


def corr_stats(cat: Catalog) -> DataFrame:
    """Pearson correlation (price vs quantity per return flag) from exact
    decimal moment sums — the order-invariant formulation of corr(), same
    technique as stddev_stats (the streaming corr update is partition-order
    dependent and would not hash-match an oracle)."""
    li = cat.df("lineitem")
    n = F.count(F.lit(1))
    dx = F.col("l_extendedprice")
    dy = F.col("l_quantity")
    sx = F.sum(dx.cast("decimal(25,4)")).cast("double")
    sy = F.sum(dy.cast("decimal(25,4)")).cast("double")
    sxx = F.sum((dx * dx).cast("decimal(30,4)")).cast("double")
    syy = F.sum((dy * dy).cast("decimal(30,4)")).cast("double")
    sxy = F.sum((dx * dy).cast("decimal(30,4)")).cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(n.alias("n_items"), F.round(corr, 6).alias("price_qty_corr"))
        .orderBy("l_returnflag")
    )


def rank_functions(cat: Catalog) -> DataFrame:
    """Ranking-window surface: dense_rank / percent_rank / ntile in one
    pass over a single (status)-partitioned sort."""
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return cat.df("orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).alias("quartile"),
    )


def running_window(cat: Catalog) -> DataFrame:
    """Running aggregation frame: cumulative spend + previous order price
    per customer in date order (deterministic tie-break on order key)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return cat.df("orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(25,4)")).over(cum).cast("double").alias("cum_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


def returned_item_revenue(cat: Catalog, k: int = 20) -> DataFrame:
    """TPC-H Q10: revenue lost to returned items per customer in one
    quarter, top-k. Scale shape: the small dimension (nation) broadcasts;
    the order-date filter lands on the orders scan BEFORE its join; the
    top-k is a TakeOrdered, not a global sort."""
    o = cat.df("orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    r = cat.df("lineitem").where(F.col("l_returnflag") == "R")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,4)")
    ).cast("double")
    return (
        r.join(o, r.l_orderkey == o.o_orderkey)
        .join(cat.df("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.df("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def late_line_priority_dist(cat: Catalog, grace_days: int = 60) -> DataFrame:
    """TPC-H Q12 shape (the fixture has no shipmode/commitdate, so the
    category is l_linestatus and "late" is shipped > grace_days after the
    order date): per status, CASE-sum of high- vs low-priority orders.
    One join, map-side partial CASE aggregation."""
    li = cat.df("lineitem")
    o = cat.df("orders")
    late = li.join(o, li.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def large_volume_customers(cat: Catalog, min_qty: float = 200.0, k: int = 100) -> DataFrame:
    """TPC-H Q18: customers whose single orders exceed min_qty total
    quantity. The IN-subquery over a grouped lineitem becomes an aggregated
    build side joined back — one shuffle on orderkey, never a per-row
    subquery."""
    big = (
        cat.df("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,4)")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        big.join(cat.df("orders"), big.l_orderkey == F.col("o_orderkey"))
        .join(cat.df("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def waiting_suppliers(cat: Catalog, k: int = 10) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates in the fixture, so "kept
    the order waiting" = was the strictly-latest shipper): suppliers who
    were the last to ship on multi-supplier finished orders.

    The textbook plan — correlated EXISTS / NOT EXISTS as one left_semi
    plus one left_anti self-join with NON-EQUI conditions — forces two
    sort-merge passes over the fact table and spilled 221.8 s / alpha=1.16
    at sf100 (600M lineitem rows). But the predicate algebra collapses:
    a row (o, s, d) survives the NOT EXISTS iff d >= max shipdate of the
    order's OTHER suppliers, and supplier s has such a row iff its own
    max shipdate m_s satisfies m_s >= max_other. If m_s < D1 (the order's
    overall max), then D1 is achieved only by other suppliers, so
    max_other = D1 > m_s — contradiction. Hence s qualifies iff
    m_s == D1: the qualifying set is exactly the argmax-by-shipdate
    supplier set, ties included (d > d is false, so co-max suppliers do
    not disqualify each other). The EXISTS just adds n_suppliers >= 2.

    That re-expresses Q21 as two map-side-combining aggregates and zero
    self-joins: per-(order, supplier) max shipdate (shuffle 1, partial
    max collapses the fact rows before the exchange), then per-order
    supplier count + overall max + the (order-size-bounded, <= 7 rows in
    TPC-H) supplier/date list (shuffle 2), argmax-set via a filtered
    explode, broadcast-sized supplier join, tiny final agg. No non-equi
    join, no window sort over the fact table, nothing super-linear."""
    li = cat.df("lineitem")
    fo = cat.df("orders").where(F.col("o_orderstatus") == "F")
    per_supp = (
        li.join(fo.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.max("s_max").alias("order_max"),
            F.collect_list(
                F.struct(F.col("s_max").alias("sd"), F.col("l_suppkey").alias("sk"))
            ).alias("supps"),
        )
        .where(F.col("n_supp") >= 2)
    )
    winners = per_order.select(
        "l_orderkey",
        F.explode(
            F.filter("supps", lambda s: s["sd"] == F.col("order_max"))
        ).alias("w"),
    ).select("l_orderkey", F.col("w.sk").alias("l_suppkey"))
    return (
        winners.join(cat.df("supplier"), winners.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def top_supplier(cat: Catalog, start: str = "1997-01-01", end: str = "1997-04-01") -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in one quarter —
    the aggregate-then-argmax shape (Q15's revenue view feeds both the
    max and the equality filter). The scalar max is an unbounded window
    over the POST-aggregation frame (one row per supplier — a tiny
    fraction of the fact table), so lineitem is scanned exactly once;
    the naive agg-then-join-the-max formulation plans TWO full fact
    scans because the two aggregate subtrees differ and the exchange is
    not reused. The single-partition window exchange carries |suppliers|
    rows, immaterial at any SF. Equality on double is safe because both
    sides sum via exact decimal partials, then cast."""
    li = cat.df("lineitem").where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    return (
        rev.withColumn("mx", F.max("total_rev").over(Window.partitionBy()))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(cat.df("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def trailing_spend_window(cat: Catalog, days: int = 30) -> DataFrame:
    """Time-RANGE window frame: each order's trailing `days`-day spend for
    its customer — rangeBetween over the epoch-day ordering key, so frame
    membership is VALUE-based (all same-day peers included), unlike the
    row-based frames in running_window. One shuffle on customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-days, 0)
    )
    return cat.df("orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_spend"),
    )


def market_share(cat: Catalog, region: str = "ASIA", part_type: str | None = None) -> DataFrame:
    """TPC-H Q8: a supplier nation's revenue share per year inside one
    region's market. The nested two-level aggregate (share = conditional
    sum / total sum) is one grouped CASE aggregation — no self-join, no
    second scan. Dimension chain (region->nation->customer) broadcasts."""
    nat = cat.df("nation")
    reg = cat.df("region").where(F.col("r_name") == region)
    cust_nations = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    target_nation = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    li = cat.df("lineitem")
    if part_type is not None:
        li = li.join(
            cat.df("part").where(F.col("p_type") == part_type).select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
        )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,4)")
    j = (
        li.join(cat.df("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(cat.df("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(cat.df("supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(target_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    first_row = nat.orderBy("n_nationkey").limit(1).collect()
    # empty nation table: every fact row already died in the inner join to
    # target_nation, so the aggregate below is empty whatever constant we
    # compare against — any placeholder keeps empty-in -> empty-out (with
    # the right schema) instead of crashing the whole DAG
    first_nation = first_row[0].n_name if first_row else ""
    return (
        j.groupBy("o_year")
        .agg(
            (
                # coalesce to 0: a year where the target nation sold
                # nothing is a 0% share, not NULL (the conditional sum of
                # zero matching rows is all-NULLs -> NULL). Coalescing
                # AFTER the cast keeps the sum itself decimal-exact;
                # oracle mirrors with COALESCE(CAST(SUM(...)...), 0.0)
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == first_nation,
                            F.col("volume"),
                        )
                    ).cast("double"),
                    F.lit(0.0),
                )
                / F.sum("volume").cast("double")
            ).alias("mkt_share_raw"),
        )
        .select("o_year", F.round("mkt_share_raw", 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def unpivot_events(cat: Catalog) -> DataFrame:
    """Unpivot (melt): the per-user pivoted event counts back to long
    form via Spark's native unpivot — wide->long without exploding
    through a UNION of per-column scans (one pass over the pivoted
    frame; zero-count cells are preserved, which is what distinguishes
    melt from re-aggregating the raw table)."""
    wide = pivot_events(cat)
    long = wide.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    )
    return long.select(
        "user_id",
        F.expr("substring(event_type, 3)").alias("event_type"),
        "n",
    )


def price_histogram(cat: Catalog, width: float = 50000.0) -> DataFrame:
    """Fixed-width histogram of order prices: floor-division binning —
    one scan, one tiny shuffle on the bucket id; the binning expression
    is a single IEEE divide + floor, identical on any engine."""
    b = F.floor(F.col("o_totalprice") / width).cast("int")
    return (
        cat.df("orders")
        .groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


def nation_year_profit(cat: Catalog, name_like: str = "%o%") -> DataFrame:
    """TPC-H Q9 shape (adapted: the fixtures have no partsupp, so profit is
    revenue = extprice*(1-disc) without supply cost): 5-table join through
    part / supplier / nation / orders grouped by (nation, order year).

    Scale shape: lineitem joins three broadcast dimensions without a
    shuffle, then one fact-fact join on l_orderkey, then a tiny
    (nation, year) aggregation — the only big shuffle is the orders join."""
    li = cat.df("lineitem")
    parts = cat.df("part").where(F.col("p_name").like(name_like)).select("p_partkey")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cat.df("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.df("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("nation", F.desc("o_year"))
    )


def part_value_share(cat: Catalog, lift: float = 1.5) -> DataFrame:
    """TPC-H Q11 shape (partsupp -> lineitem): per-part revenue kept only
    when it exceeds `lift` x the AVERAGE per-part share of total revenue —
    a scalar subquery consumed by a HAVING. (Q11's fixed fraction is
    sf-dependent; the average-share form is scale-free, like Q11's own
    0.0001/SF scaling rule.)

    The global total and part count ride in as a broadcast single-row cross
    join, so both aggregations scan lineitem once each and nothing is
    collected to the driver; identical decimal-exact arithmetic on both
    sides of the comparison keeps the threshold engine-portable."""
    li = cat.df("lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(value).alias("part_value"))
    total = li.agg(
        dsum(value).alias("total_value"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("total_value") * lift / F.col("n_parts"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def part_supplier_counts(cat: Catalog, excl_brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part-supplier bridge): distinct
    supplier count per (brand, type, size), excluding one brand and every
    supplier with a negative account balance (the NOT IN subquery).

    NOT IN compiles to a broadcast left_anti join on the distinct
    (partkey, suppkey) bridge — no correlated probing; count(distinct)
    shuffles only the already-distinct bridge keyed by part attributes."""
    bridge = cat.df("lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = cat.df("supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = cat.df("part").where(F.col("p_brand") != excl_brand)
    return (
        bridge.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def excess_shippers(cat: Catalog, name_like: str = "%o%", min_qty: float = 400.0) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped quantity of matching parts
    exceeds a threshold — a nested IN ( ... GROUP BY ... HAVING ) subquery.

    The inner aggregate runs once (lineitem x broadcast part filter,
    grouped by supplier); the outer IN is a left_semi join against that
    tiny qualified-supplier set, then nation broadcasts for the label."""
    qualified = (
        cat.df("lineitem")
        .join(
            F.broadcast(
                cat.df("part").where(F.col("p_name").like(name_like)).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,4)")).alias("qty"))
        .where(F.col("qty") > min_qty)
        .select("l_suppkey")
    )
    return (
        cat.df("supplier")
        .join(F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(cat.df("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def idle_rich_by_nation(cat: Catalog, priority: str = "1-URGENT") -> DataFrame:
    """TPC-H Q22 shape: customers above the GLOBAL positive-balance average
    (scalar subquery) with no `priority` orders (NOT EXISTS — every fixture
    customer has SOME order, so Q22's no-orders-at-all predicate is empty;
    the priority filter keeps the same anti-join shape with real output),
    rolled up by nation NAME (the labeled variant of ``rich_idle_customers``
    above, which rolls up by raw nationkey — kept separate so the TPC-H
    series has its q22 entry with the dimension join included).

    The scalar average broadcasts as a single-row cross join; NOT EXISTS is
    a left_anti against the distinct order-customer keys; the final rollup
    groups a few thousand survivors — nothing correlated, nothing
    re-scanned."""
    cust = cat.df("customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    never_ordered = cust.join(
        cat.df("orders")
        .where(F.col("o_orderpriority") == priority)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct(),
        "c_custkey",
        "left_anti",
    )
    return (
        never_ordered.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(cat.df("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("nation")
    )


def ntile_percent_rank(cat: Catalog, tiles: int = 4) -> DataFrame:
    """ntile + percent_rank over a total order (acctbal, custkey — unique,
    so both functions are deterministic): per-tile member count and the
    percent_rank span it covers. One window shuffle; percent_rank's
    (rank-1)/(n-1) double division is bit-identical on any engine given the
    same total order."""
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    tiled = cat.df("customer").select(
        "c_custkey",
        "c_acctbal",
        F.ntile(tiles).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        tiled.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("pr").alias("pr_lo"),
            F.max("pr").alias("pr_hi"),
            F.min("c_acctbal").alias("bal_lo"),
            F.max("c_acctbal").alias("bal_hi"),
        )
        .orderBy("tile")
    )
