"""Subquery/set-op/pivot/statistics operators on constructed cases and the
sf0.001 fixture (the DuckDB oracle at sf0.01 is the authoritative check;
these pin the semantics that the oracle can't isolate)."""

import math

from pyspark.sql import functions as F

from mover_spark.operators.subqueries import (
    EVENT_TYPES,
    anti_join_not_exists,
    cube_agg,
    percentile_agg,
    pivot_events,
    running_window,
    scalar_subquery_min,
    stddev_stats,
)


def test_scalar_subquery_min_keeps_all_ties(catalog):
    out = scalar_subquery_min(catalog)
    mins = {
        r.s_nationkey: r.min_bal
        for r in catalog.df("supplier").groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal")).collect()
    }
    rows = out.collect()
    assert rows and all(r.s_acctbal == mins[r.s_nationkey] for r in rows)


def test_anti_join_complements_semi_join(catalog):
    cust = catalog.df("customer")
    anti = anti_join_not_exists(catalog)
    urgent = catalog.df("orders").where(F.col("o_orderpriority") == "1-URGENT")
    semi = cust.join(
        urgent.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"], how="left_semi"
    )
    assert anti.count() + semi.count() == cust.count()


def test_cube_contains_all_grouping_sets(catalog):
    rows = cube_agg(catalog).collect()
    combos = {(r.orderstatus == "ALL", r.orderpriority == "ALL") for r in rows}
    assert combos == {(False, False), (False, True), (True, False), (True, True)}
    grand = [r for r in rows if r.orderstatus == "ALL" and r.orderpriority == "ALL"]
    assert len(grand) == 1 and grand[0].n_orders == catalog.df("orders").count()


def test_pivot_counts_sum_to_total(catalog):
    out = pivot_events(catalog)
    total = out.agg(
        F.sum(sum(F.col(f"n_{t}") for t in EVENT_TYPES)).alias("s")
    ).collect()[0].s
    assert total == catalog.df("events").count()


def test_percentile_exact_interpolation(spark, catalog):
    # 4 known values -> p50 is the midpoint interpolation
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0)], "o_orderstatus string, o_totalprice double"
    )

    class FakeCat:
        def df(self, name):
            return df

    row = percentile_agg(FakeCat()).collect()[0]
    assert row.p50_price == 2.5 and row.n_orders == 4


def test_stddev_matches_python(catalog):
    prices = [r.l_extendedprice for r in catalog.df("lineitem").select("l_extendedprice").collect()]
    n = len(prices)
    mean = sum(prices) / n
    ref = math.sqrt(sum((p - mean) ** 2 for p in prices) / (n - 1))
    got = {r.l_returnflag: r for r in stddev_stats(catalog).collect()}
    # per-flag stddevs combine to the global one only approximately; instead
    # check one flag against a direct recomputation
    flag = next(iter(got))
    sub = [
        r.l_extendedprice
        for r in catalog.df("lineitem").where(F.col("l_returnflag") == flag).collect()
    ]
    m = sum(sub) / len(sub)
    expect = math.sqrt(sum((p - m) ** 2 for p in sub) / (len(sub) - 1))
    assert abs(got[flag].stddev_price - expect) < 1e-2
    assert ref > 0  # sanity: fixture is non-degenerate


def test_running_window_is_cumulative(catalog):
    out = running_window(catalog)
    one = (
        out.where(F.col("o_custkey") == out.select("o_custkey").first().o_custkey)
        .orderBy("o_orderdate", "o_orderkey")
        .collect()
    )
    acc = 0.0
    for i, r in enumerate(one):
        acc += r.o_totalprice
        assert abs(r.cum_spend - acc) < 1e-4
        if i > 0:
            assert r.prev_price == one[i - 1].o_totalprice
        else:
            assert r.prev_price is None


def test_unpivot_roundtrip(catalog):
    """melt(pivot(x)) == groupBy counts, plus explicit zero cells."""
    from pyspark.sql import functions as F

    from mover_spark.operators.subqueries import unpivot_events

    long = unpivot_events(catalog)
    direct = (
        catalog.df("events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # every nonzero melt cell matches the direct aggregation...
    nz = long.where(F.col("n") > 0)
    assert nz.exceptAll(direct).count() == 0
    assert direct.exceptAll(nz).count() == 0
    # ...and every user carries exactly 5 cells (zeros preserved)
    per_user = long.groupBy("user_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_user] == [5]


def test_price_histogram_partitions_orders(catalog):
    from pyspark.sql import functions as F

    from mover_spark.operators.subqueries import price_histogram

    h = price_histogram(catalog)
    total = h.agg(F.sum("n_orders")).first()[0]
    assert total == catalog.df("orders").count()
    rows = h.collect()
    for r in rows:
        # bucket bounds honored: min/max inside [bucket*w, (bucket+1)*w)
        assert r.bucket * 50000.0 <= r.min_price <= r.max_price < (r.bucket + 1) * 50000.0


def test_value_window_funcs_semantics(catalog):
    from mover_spark.operators.analytics import value_window_funcs

    rows = value_window_funcs(catalog).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for rs in by_cust.values():
        rs.sort(key=lambda r: r.cdist)
        first = rs[0].o_totalprice
        last = rs[-1].o_totalprice
        for i, r in enumerate(rs):
            assert r.last_price == last
            if i == 0:
                assert r.first_price == r.o_totalprice
            assert (r.second_price is None) == (len(rs) < 2) or r.second_price == rs[1].o_totalprice
        assert abs(rs[-1].cdist - 1.0) < 1e-9


def test_exists_semijoin_agg_rewrite_edges(spark, catalog):
    """The MAX-pre-aggregate form must agree with the literal correlated
    left_semi on the fixture AND on constructed edges (order with no lines,
    order whose only shipdates are null, order with one late line)."""
    from mover_spark.operators.subqueries import exists_semijoin

    ord_ = catalog.df("orders")
    late = catalog.df("lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_shipdate")
    )
    literal = (
        ord_.join(
            late,
            (ord_.o_orderkey == late.o_orderkey)
            & (late.l_shipdate > ord_.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    got = {r.o_orderpriority: r.n_orders for r in exists_semijoin(catalog).collect()}
    want = {r.o_orderpriority: r.n_orders for r in literal.collect()}
    assert got == want and got

    orders = spark.createDataFrame(
        [(1, "2024-01-10", "P"), (2, "2024-01-10", "P"), (3, "2024-01-10", "P")],
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    lines = spark.createDataFrame(
        [(2, None), (3, "2024-02-01")],  # 1: no lines; 2: only-null shipdate
        "l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz"))

    class _MiniCat:
        def df(self, name):
            return {"orders": orders, "lineitem": lines}[name]

    rows = exists_semijoin(_MiniCat()).collect()
    assert [(r.o_orderpriority, r.n_orders) for r in rows] == [("P", 1)]


def test_outlier_events_single_event_group(spark):
    """An event type with exactly one event must yield zero outliers, not
    an ANSI DIVIDE_BY_ZERO from the (n-1) sample-stddev denominator."""
    from mover_spark.catalog import Catalog
    from mover_spark.operators.events import outlier_events

    class _Cat:
        def df(self, name):
            return spark.createDataFrame(
                [(1, "rare", 5.0), (2, "dense", 1.0), (3, "dense", 2.0),
                 (4, "dense", 100.0)],
                "event_id long, event_type string, value double",
            )

    rows = {r.event_type: r for r in outlier_events(_Cat()).collect()}
    assert rows["rare"].n_outliers == 0 and rows["rare"].n_events == 1


def test_market_share_empty_tables(spark, catalog):
    """Q8 over all-empty tables: empty-in -> empty-out with the normal
    schema, not a driver-side ValueError — an empty dimension after
    partition pruning must not kill the whole DAG."""
    from mover_spark.operators.subqueries import market_share

    class EmptyCat:
        def df(self, name):
            return catalog.df(name).limit(0)

    out = market_share(EmptyCat())
    assert out.count() == 0
    assert out.columns == ["o_year", "mkt_share"]


def test_waiting_suppliers_plan_has_no_nonequi_self_join(spark, catalog):
    """Q21 regression pin: the rewrite replaced two non-equi lineitem
    self-joins (SMJ sort spill, 221.8 s / alpha=1.16 at sf100) with two
    map-side-combining aggregates. The physical plan must contain exactly
    two joins (finished-order semi, supplier lookup), both pure-equi —
    any `!=` join condition means the self-join crept back."""
    from mover_spark.operators.subqueries import waiting_suppliers

    df = waiting_suppliers(catalog)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert len(joins) == 2, joins
    assert all("NOT (" not in l for l in joins), joins
