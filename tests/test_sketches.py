"""Sketch accuracy/containment bounds — the checks the rows-only driver
gate can't express."""

from pyspark.sql import functions as F

from mover_spark.operators.sketches import bloom_semi_join, heavy_hitters, kmv_distinct


def test_kmv_small_cardinality_is_exact(spark):
    df = spark.createDataFrame([(i % 37,) for i in range(5000)], "x long")
    est = kmv_distinct(df, ["x"], k=256).collect()[0].distinct_est
    assert est == 37.0  # below k -> exact


def test_kmv_large_cardinality_within_bound(catalog):
    ords = catalog.df("orders")
    exact = ords.select("o_orderkey").distinct().count()
    est = kmv_distinct(ords, ["o_orderkey"], k=256).collect()[0].distinct_est
    assert abs(est - exact) / exact < 0.25  # ~4 sigma at k=256


def test_kmv_bigint_defaults_to_md5_path(spark):
    """Unasserted bigints (incl. negatives and values >= 2^31, where the
    mix31 fast path's portability/bijectivity contract breaks) take the
    md5 hash and still estimate within bound."""
    vals = [(-(1 << 40) + i * 7,) for i in range(400)] + [
        ((1 << 33) + i * 13,) for i in range(400)
    ]
    df = spark.createDataFrame(vals * 3, "x long")
    est = kmv_distinct(df, ["x"], k=256).collect()[0].distinct_est
    assert abs(est - 800) / 800 < 0.25


def test_kmv_small_keys_assertion_takes_fast_path(spark):
    """small_keys=True on an in-domain key reproduces the documented mix31
    estimator arithmetic (pinned by the DuckDB mirror in
    test_portable_hash.py); the estimate stays within bound."""
    df = spark.createDataFrame([(i,) for i in range(2000)], "x long")
    fast = kmv_distinct(df, ["x"], k=256, small_keys=True).collect()[0].distinct_est
    slow = kmv_distinct(df, ["x"], k=256).collect()[0].distinct_est
    assert abs(fast - 2000) / 2000 < 0.25
    assert abs(slow - 2000) / 2000 < 0.25


def test_heavy_hitters_exact_counts(spark):
    rows = [("hot",)] * 500 + [("warm",)] * 120 + [(f"cold{i}",) for i in range(380)]
    df = spark.createDataFrame(rows, "x string")
    got = {r.x: r.cnt for r in heavy_hitters(df, "x", min_share=0.1).collect()}
    assert got == {"hot": 500, "warm": 120}


def test_bloom_semi_join_superset_of_exact(catalog):
    li = catalog.df("lineitem")
    hot = catalog.df("orders").where(F.col("o_totalprice") > 150000)
    exact = li.join(
        hot.select(F.col("o_orderkey").alias("l_orderkey")), on=["l_orderkey"], how="left_semi"
    )
    approx = bloom_semi_join(li, hot, "l_orderkey", "o_orderkey", expected=20000, fpp=0.01)
    n_exact, n_approx, n_li = exact.count(), approx.count(), li.count()
    assert n_approx >= n_exact  # never drops a true match
    # false-positive mass stays near fpp of the non-matching rows
    assert n_approx - n_exact <= 0.05 * (n_li - n_exact) + 10
    # and composing with the exact join recovers exactness
    recovered = approx.join(
        hot.select(F.col("o_orderkey").alias("l_orderkey")), on=["l_orderkey"], how="left_semi"
    ).count()
    assert recovered == n_exact


def test_approx_quantile_bracket(catalog):
    from mover_spark.operators.sketches import approx_quantile_check

    out = approx_quantile_check(
        catalog.df("events"), value_col="value", group_col="event_type"
    ).collect()
    assert len(out) > 0
    assert all(r.sketch_in_bracket for r in out)


def test_outlier_events_bounds(catalog):
    from mover_spark.operators.events import outlier_events

    rows = outlier_events(catalog).collect()
    assert len(rows) == 5
    for r in rows:
        # outliers are a small minority by construction of the 3-sigma rule
        assert r.n_outliers <= r.n_events * 0.05


def test_bloom_semi_join_empty_filter_side(catalog):
    """Zero-partition filter side (empty createDataFrame) must return an
    empty result, not raise treeReduce's 'empty collection'."""
    li = catalog.df("lineitem")
    empty = catalog.spark.createDataFrame([], "o_orderkey long")
    out = bloom_semi_join(li, empty, "l_orderkey", "o_orderkey", expected=10)
    assert out.count() == 0
