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
