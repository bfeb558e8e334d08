"""CDC operators: changelog compaction, SCD-2 intervals, rollup reuse.

The reference's load keeps only the FIRST version of a key (ON CONFLICT DO
NOTHING, /root/reference/dialect/postgres/postgres.go:466-481); these
operators cover the other direction a CDC mirror needs (latest wins +
full history intervals). Tests pin the tie-break determinism and the
window-free plan shape that make them scale.
"""

import pytest
from pyspark.sql import functions as F

from mover_spark.operators.cdc import latest_snapshot, scd2_intervals


@pytest.fixture(scope="module")
def changelog(spark):
    # key "a" has a same-timestamp tie (ids 2 and 3) — the unique id must
    # decide; key "b" has one version only
    rows = [
        (1, "a", "2024-01-01 00:00:00", 10.0),
        (2, "a", "2024-01-02 00:00:00", 20.0),
        (3, "a", "2024-01-02 00:00:00", 30.0),
        (4, "b", "2024-01-01 12:00:00", 99.0),
    ]
    df = spark.createDataFrame(rows, "id long, k string, ts string, v double")
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_latest_snapshot_tiebreak(changelog):
    out = {
        r.k: (r.last_id, r.last_v)
        for r in latest_snapshot(
            changelog, keys=["k"], order_cols=["ts", "id"], payload=["v"]
        ).collect()
    }
    assert out == {"a": (3, 30.0), "b": (4, 99.0)}


def test_latest_snapshot_no_window_sort(changelog):
    plan = latest_snapshot(
        changelog, keys=["k"], order_cols=["ts", "id"], payload=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    # compaction must be a hash aggregate (map-side partials), not a
    # window sort over every version
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_scd2_interval_chain(changelog):
    rows = scd2_intervals(
        changelog, keys=["k"], ts_col="ts", tiebreak_col="id", attrs=["v"]
    ).collect()
    assert len(rows) == 4  # every version becomes exactly one interval
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    # exactly one open (current) interval per key
    for k, rs in by_key.items():
        assert sum(1 for r in rs if r.is_current) == 1
    # intervals chain: each closed interval's valid_to is some successor's
    # valid_from, and the tie resolves by id (v=20 closes at the tied ts)
    a = sorted(by_key["a"], key=lambda r: (r.valid_from, r.v))
    assert [r.v for r in a] == [10.0, 20.0, 30.0]
    assert a[0].valid_to == a[1].valid_from
    assert a[1].valid_to == a[1].valid_from  # tied timestamps: zero-width
    assert a[2].is_current


def test_daily_rollup_matches_direct(catalog):
    from mover_spark.operators.events import daily_from_hourly

    ev = catalog.df("events")
    direct = (
        ev.groupBy(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("bucket_day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
        )
    )
    roll = daily_from_hourly(catalog)
    assert roll.exceptAll(direct).count() == 0
    assert direct.exceptAll(roll).count() == 0


def test_normalized_dedup_collapses_variants(spark):
    from mover_spark.operators.dedup import normalized_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO WORLD?"),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.canon_id, r.n_variants) for r in normalized_dedup(docs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (4, 1)}


def test_approx_distinct_within_tol(catalog):
    from mover_spark.operators.sketches import approx_distinct_check

    out = approx_distinct_check(
        catalog.df("events"), key_col="user_id", group_col="event_type"
    ).collect()
    assert len(out) > 0
    assert all(r.within_tol for r in out)


def test_top_supplier_is_argmax(catalog):
    from mover_spark.operators.subqueries import top_supplier

    rows = top_supplier(catalog).collect()
    assert len(rows) >= 1
    # every returned supplier carries the same (maximal) revenue
    assert len({r.total_rev for r in rows}) == 1


def test_apply_changes_merge_semantics(spark):
    """Newest change per key decides: trailing delete removes, trailing
    update resurrects, unseen keys pass through, new keys insert."""
    from mover_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, 1, "x", "U"),   # id=1: updated...
            (1, 2, 2, None, "D"),  # ...then deleted -> gone
            (2, 1, 3, None, "D"),  # id=2: deleted...
            (2, 2, 4, "b2", "U"),  # ...then re-upserted -> b2
            (9, 1, 5, "new", "U"), # id=9: brand new key
        ],
        "id long, ts long, seq long, v string, op string",
    )
    out = {
        r.id: r.v
        for r in apply_changes(
            base, changes, keys=["id"], order_cols=["ts", "seq"], payload=["v"]
        ).collect()
    }
    assert out == {2: "b2", 3: "c", 9: "new"}


def test_apply_changes_null_op_is_upsert(spark):
    """A NULL op must upsert, not silently delete the key (the plain !=
    comparison evaluated NULL and dropped the row from both sides)."""
    from mover_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(5, 1.0)], "id long, v double")
    changes = spark.createDataFrame(
        [(5, 1, 1, 9.0, None)], "id long, ts long, seq long, v double, op string"
    )
    rows = apply_changes(
        base, changes, keys=["id"], order_cols=["ts", "seq"], payload=["v"]
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(5, 9.0)]
