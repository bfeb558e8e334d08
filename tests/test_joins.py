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


def test_asof_directions_match_pandas(spark):
    """Property check vs pandas merge_asof (the public reference semantics
    for direction/tolerance): deterministic integer-ts data, no exact ties
    and no equidistant nearest pairs by construction (left ts even, right
    ts = 1 mod 4), unique right ts per key."""
    import pandas as pd

    lrows = [(i, i % 3, 2 * ((i * 7) % 50)) for i in range(120)]
    rrows, seen = [], set()
    for j in range(90):
        key, ts = j % 3, 4 * ((j * 11) % 23) + 1
        if (key, ts) not in seen:
            seen.add((key, ts))
            rrows.append((key, ts, float(j)))
    left = spark.createDataFrame(lrows, "id long, k long, ts long")
    right = spark.createDataFrame(rrows, "k long, ts long, v double")
    lpd = pd.DataFrame(lrows, columns=["id", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 8):
            got = {
                r.id: (r.ts_asof, r.v_asof)
                for r in as_of_join(
                    left, right, ["k"], direction=direction, tolerance=tol
                ).collect()
            }
            want_df = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction, tolerance=tol
            )
            for _, row in want_df.iterrows():
                want_v = None if pd.isna(row.v) else row.v
                got_ts, got_v = got[row.id]
                assert got_v == want_v, (direction, tol, row.id, got_v, want_v)
                if want_v is not None:
                    assert got_ts is not None


def test_asof_forward_and_nearest_basics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10))], "id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(10, _ts(9, 30), 1.0), (10, _ts(11), 2.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    fwd = as_of_join(left, right, ["user_id"], direction="forward").collect()[0]
    assert fwd.value_asof == 2.0  # earliest >= 10:00
    near = as_of_join(left, right, ["user_id"], direction="nearest").collect()[0]
    assert near.value_asof == 1.0  # 30 min back beats 60 min forward
    tight = as_of_join(
        left, right, ["user_id"], direction="forward", tolerance="45 MINUTES"
    ).collect()[0]
    assert tight.value_asof is None  # 11:00 is past the 45-minute cap


def test_interval_overlap_join_matches_naive(spark):
    """Bucket-banded overlap join == naive theta-join, incl. pairs spanning
    many buckets and touching endpoints; each pair appears exactly once."""
    from mover_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, 1, _ts(1), _ts(10)),     # spans 9 buckets
            (2, 1, _ts(12), _ts(12, 30)),
            (3, 2, _ts(5), _ts(6)),
        ],
        "lid long, k long, s timestamp_ntz, e timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts(9, 30), _ts(11)),   # overlaps lid=1 tail
            (11, 1, _ts(12, 30), _ts(13)),  # touches lid=2 endpoint
            (12, 1, _ts(0), _ts(23)),       # overlaps both k=1 intervals
            (13, 2, _ts(6), _ts(7)),        # touches lid=3 endpoint
            (14, 2, _ts(20), _ts(21)),      # no overlap
        ],
        "rid long, k long, s timestamp_ntz, e timestamp_ntz",
    )
    got = sorted(
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, ["k"], ("s", "e"), ("s", "e")
        ).collect()
    )
    naive = sorted(
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.k == r.k and l.s <= r.e and r.s <= l.e
    )
    assert got == naive
    assert len(got) == len(set(got))  # emit-once: no duplicates


def test_interval_overlap_join_drops_malformed_and_caps_span(spark):
    """end < start rows are dropped (a descending F.sequence would emit
    junk candidates); an interval spanning more buckets than the cap fails
    fast instead of exploding."""
    import pytest

    from mover_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 1, _ts(10), _ts(9)), (2, 1, _ts(5), _ts(6))],  # lid=1 malformed
        "lid long, k long, s timestamp_ntz, e timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(10, 1, _ts(4), _ts(11))],
        "rid long, k long, s timestamp_ntz, e timestamp_ntz",
    )
    got = sorted(
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, ["k"], ("s", "e"), ("s", "e")
        ).collect()
    )
    assert got == [(2, 10)]  # malformed lid=1 dropped, not junk-matched

    with pytest.raises(Exception, match="spans"):
        interval_overlap_join(
            left.where("lid = 2"),
            right,
            ["k"],
            ("s", "e"),
            ("s", "e"),
            bucket_seconds=60,
            max_buckets_per_interval=3,  # rid=10 spans 7h of 1-min buckets
        ).collect()


def test_interval_overlap_join_drops_unparseable_string_bounds(spark):
    """String bounds parse through try_to_timestamp: date-only strings
    (cast semantics) join correctly, genuinely unparseable bounds DROP like
    malformed intervals — neither crashes with an ANSI DateTimeException or
    the misleading span-cap error."""
    from mover_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-02", "2024-01-03"),            # date-only: parses
         (2, 1, "2024-01-02 00:00:00", "2024-01-02 02:00:00"),
         (3, 1, "garbage", "junk")],                    # unparseable: drops
        "lid long, k long, s string, e string",
    )
    right = spark.createDataFrame(
        [(10, 1, "2024-01-02 01:00:00", "2024-01-02 03:00:00")],
        "rid long, k long, s string, e string",
    )
    got = sorted(
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, ["k"], ("s", "e"), ("s", "e")
        ).collect()
    )
    assert got == [(1, 10), (2, 10)]


def test_salted_join_rejects_right_and_full(spark):
    """Unmatched small-side salt replicas would emit phantom rows under
    right/full outer — those modes must be rejected loudly."""
    import pytest

    from mover_spark.operators.joins import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="phantom"):
            salted_join(a, b, on=["k"], how=how)


def test_range_join_drops_malformed_intervals(spark):
    """hi <= lo intervals drop before the explode instead of generating a
    huge descending bucket sequence."""
    from mover_spark.operators.joins import range_join

    left = spark.createDataFrame([(1, 25.0)], "id long, v double")
    right = spark.createDataFrame(
        [(10, 0.0, 50.0), (11, 1e9, 0.0)],  # 11 malformed (hi < lo)
        "rid long, lo double, hi double",
    )
    got = range_join(left, right, "v").collect()
    assert [(r.id, r.rid) for r in got] == [(1, 10)]


def test_interval_overlap_join_iso_t_string_bounds(spark):
    """ISO 'T'-separator strings must parse and match: the overlap
    predicate sees the PARSED timestamps, not raw strings the default
    unix_timestamp format can't read."""
    from mover_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-05T10:00:00", "2024-01-05T12:00:00")],
        "lid long, k long, s string, e string",
    )
    right = spark.createDataFrame(
        [(10, 1, "2024-01-05 11:00:00", "2024-01-05 13:00:00")],  # mixed fmt
        "rid long, k long, s string, e string",
    )
    got = [
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, ["k"], ("s", "e"), ("s", "e")
        ).collect()
    ]
    assert got == [(1, 10)]
