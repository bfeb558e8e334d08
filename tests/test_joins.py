"""as-of / range join semantics on constructed cases."""

import datetime

from mover_spark.operators.joins import as_of_join, range_join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(12)), (3, 10, _ts(8)), (4, 99, _ts(12))],
        "id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(10, _ts(9), 5.0), (10, _ts(11), 7.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = {r.id: (r.ts_asof, r.value_asof) for r in as_of_join(left, right, ["user_id"]).collect()}
    assert out[1] == (_ts(9), 5.0)   # most recent <= 10:00
    assert out[2] == (_ts(11), 7.0)  # most recent <= 12:00
    assert out[3] == (None, None)    # nothing before 8:00
    assert out[4] == (None, None)    # key never on right


def test_asof_tie_takes_equal_timestamp(spark):
    left = spark.createDataFrame([(1, 10, _ts(9))], "id long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(10, _ts(9), 42.0)], "user_id long, ts timestamp_ntz, value double"
    )
    row = as_of_join(left, right, ["user_id"]).collect()[0]
    assert row.value_asof == 42.0  # >= semantics, like DuckDB ASOF


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 49.99), (5, 50.0)], "id long, v double"
    )
    right = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 50.0, "b")], "lo double, hi double, label string"
    )
    out = {r.id: r.label for r in range_join(left, right, "v").collect()}
    # hi exclusive, lo inclusive
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}


def test_range_join_wide_interval_spans_buckets(spark):
    left = spark.createDataFrame([(1, 137.0)], "id long, v double")
    right = spark.createDataFrame([(0.0, 500.0, "all")], "lo double, hi double, label string")
    assert range_join(left, right, "v", bucket_width=50.0).count() == 1


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from mover_spark.operators.joins import salted_join

    # 90% of the large side lands on one hot key
    large = spark.createDataFrame(
        [(1 if i % 10 else i, float(i)) for i in range(1000)], "k long, v double"
    )
    small = spark.createDataFrame([(i, f"dim_{i}") for i in range(100)], "k long, label string")
    plain = large.join(small, on=["k"]).groupBy("label").agg(F.count("*").alias("n"))
    salted = salted_join(large, small, on=["k"], salts=8).groupBy("label").agg(
        F.count("*").alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    from mover_spark.operators.joins import salted_join

    large = spark.createDataFrame([(1, 1.0), (999, 2.0)], "k long, v double")
    small = spark.createDataFrame([(1, "one")], "k long, label string")
    rows = {r.k: r.label for r in salted_join(large, small, ["k"], how="left").collect()}
    assert rows == {1: "one", 999: None}


def test_salted_agg_equals_plain_agg(spark):
    from pyspark.sql import functions as F

    from mover_spark.operators.joins import salted_agg

    df = spark.createDataFrame(
        [("hot" if i % 10 else f"g{i}", i) for i in range(1000)], "g string, x long"
    )
    plain = {
        (r.g): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n"), F.sum("x").alias("s"),
            F.min("x").alias("mn"), F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.g): (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df, ["g"],
            {"n": ("count", "x"), "s": ("sum", "x"), "mn": ("min", "x"), "mx": ("max", "x")},
        ).collect()
    }
    assert plain == salted
