"""Partition-predicate generation invariants (pgread).

The partitioned source read (SURVEY §4 "Parallelism": the promised win
over the reference's single-connection extractor, postgres.go:21-35)
stands on one contract: the generated WHERE predicates are COMPLETE
(every row, including NULL keys and rows outside stale bounds, matches
exactly one) and DISJOINT (no row matches two — a double-read silently
duplicates data). These tests prove both invariants by executing the
predicates against DuckDB over adversarial data; the text-hash form
(hashtextextended, PG-only) and the executor-side parallel_read path are
proven against live PostgreSQL in tests/test_postgres_live.py.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mover_spark.sources.pgread import (
    hash_partition_predicates,
    range_partition_predicates,
)

#: adversarial key set: negatives, NULL, values far outside any sane
#: MIN/MAX probe (stale-bounds simulation), dense middle run
KEYS = [-(2**62), -17, -1, 0, 1, 2, 3, 4, 5, 6, 7, 99, 10**15, None]


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute('CREATE TABLE t (k BIGINT, "payload" VARCHAR)')
    c.executemany(
        "INSERT INTO t VALUES (?, ?)", [(k, f"v{k}") for k in KEYS]
    )
    yield c
    c.close()


def _counts(con, preds, column='"k"'):
    total = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
    per = [
        con.execute(f"SELECT COUNT(*) FROM t WHERE ({p})").fetchone()[0]
        for p in preds
    ]
    overlaps = [
        con.execute(
            f"SELECT COUNT(*) FROM t WHERE ({a}) AND ({b})"
        ).fetchone()[0]
        for i, a in enumerate(preds)
        for b in preds[i + 1 :]
    ]
    return total, per, overlaps


@pytest.mark.parametrize("n", [1, 2, 4, 7])
def test_range_predicates_complete_disjoint(con, n):
    """Stride predicates over stale bounds [0, 8): rows below, above, and
    NULL all land in exactly one partition."""
    preds = range_partition_predicates("k", 0, 8, n)
    total, per, overlaps = _counts(con, preds)
    assert sum(per) == total  # complete
    assert all(o == 0 for o in overlaps)  # disjoint
    if n > 1:
        assert len(preds) == n
        assert sum(1 for c in per if c > 0) >= 2  # the split actually splits


def test_range_predicates_span_smaller_than_partitions(con):
    """span < num_partitions collapses to span partitions, never emits
    empty-by-construction or overlapping strides."""
    preds = range_partition_predicates("k", 3, 5, 16)
    assert len(preds) == 2
    total, per, overlaps = _counts(con, preds)
    assert sum(per) == total
    assert all(o == 0 for o in overlaps)


def test_range_predicates_single_partition(con):
    preds = range_partition_predicates("k", 0, 8, 1)
    assert len(preds) == 1
    total, per, _ = _counts(con, preds)
    assert per[0] == total


@pytest.mark.parametrize("n", [2, 4, 8])
def test_hash_predicates_numeric_complete_disjoint(con, n):
    """Sign-safe numeric mod: negative keys (incl. near -2^62) and NULLs
    cover exactly once. abs() would overflow at -2^63; the
    ((k % n) + n) % n form never does."""
    preds = hash_partition_predicates("k", n, numeric=True)
    assert len(preds) == n
    total, per, overlaps = _counts(con, preds)
    assert sum(per) == total
    assert all(o == 0 for o in overlaps)
    assert sum(1 for c in per if c > 0) >= 2


def test_hash_predicates_single_partition(con):
    preds = hash_partition_predicates("k", 1, numeric=True)
    assert len(preds) == 1
    total, per, _ = _counts(con, preds)
    assert per[0] == total


INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1

_fuzz_keys = st.lists(
    st.one_of(
        st.integers(INT64_MIN, INT64_MAX),
        st.sampled_from([INT64_MIN, INT64_MAX, 0, -1, 1]),
        st.none(),
    ),
    min_size=0,
    max_size=10,
)


def _check_cover(keys, preds):
    """Execute the predicates against DuckDB BIGINT arithmetic (same %
    and comparison semantics as PG) and assert complete + disjoint."""
    c = duckdb.connect()
    try:
        c.execute("CREATE TABLE t (k BIGINT)")
        if keys:
            c.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
        total, per, overlaps = _counts(c, preds)
        assert sum(per) == total, (keys, preds)
        assert all(o == 0 for o in overlaps), (keys, preds)
    finally:
        c.close()


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    _fuzz_keys,
    st.integers(INT64_MIN, INT64_MAX),
    st.integers(0, 2**64),
    st.integers(1, 9),
)
def test_fuzz_range_predicates_int64_extremes(keys, lower, span, n):
    """Stride generation fuzzed across the whole int64 domain, including
    upper = INT64_MAX + 1 (a MIN/MAX probe on a table holding the max
    key passes exactly that) and spans near 2^64: every emitted literal
    must stay a valid BIGINT and the cover must stay exact for ANY key
    set — bounds are deliberately decoupled from the keys to model stale
    or wildly wrong probes."""
    upper = min(lower + span, INT64_MAX + 1)
    preds = range_partition_predicates("k", lower, upper, n)
    for p in preds:  # every literal must fit BIGINT for the server
        for tok in p.replace("(", " ").replace(")", " ").split():
            if tok.lstrip("-").isdigit():
                assert INT64_MIN <= int(tok) <= INT64_MAX, p
    _check_cover(keys, preds)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(_fuzz_keys, st.integers(1, 9))
def test_fuzz_hash_predicates_int64_extremes(keys, n):
    """Sign-safe mod cover fuzzed over the whole int64 domain incl.
    -2^63, where an abs()-based form overflows server-side."""
    _check_cover(keys, hash_partition_predicates("k", n, numeric=True))


def test_auto_predicates_numeric_uses_real_bounds(con):
    """auto probes MIN/MAX then strides — the probe row below proves one
    round trip; the resulting predicates still cover exactly once."""
    from mover_spark.sources.pgread import auto_partition_predicates

    calls = []

    def run_sql(sql):
        calls.append(sql)
        return [con.execute(sql).fetchone()]

    preds = auto_partition_predicates(run_sql, "t", "k", "bigint", 4)
    assert len(calls) == 1 and "MIN" in calls[0] and "MAX" in calls[0]
    total, per, overlaps = _counts(con, preds)
    assert sum(per) == total
    assert all(o == 0 for o in overlaps)


def test_auto_predicates_empty_table():
    from mover_spark.sources.pgread import auto_partition_predicates

    preds = auto_partition_predicates(
        lambda sql: [(None, None)], "t", "k", "bigint", 4
    )
    assert len(preds) == 1  # trivially-true single partition


class _StubCursor:
    """DB-API cursor stub recording the SQL and serving a fixed
    description — lets describe_query's OID->Spark mapping and identifier
    quoting be pinned without any database."""

    def __init__(self, description):
        self.description = description
        self.sql = None

    def execute(self, sql):
        self.sql = sql
        _StubConn.last_sql = sql

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


class _StubConn:
    last_sql = None

    def __init__(self, description):
        self._desc = description

    def cursor(self):
        return _StubCursor(self._desc)

    def close(self):
        pass


def test_describe_query_oid_mapping_and_quoting():
    from mover_spark.sources.pgread import describe_query

    desc = [
        ("flag", 16, None, None, None, None, None),
        ("n", 20, None, None, None, None, None),
        ("m", 23, None, None, None, None, None),
        ("x", 701, None, None, None, None, None),
        ("price", 1700, None, None, None, None, None),
        ("d", 1082, None, None, None, None, None),
        ("ts", 1114, None, None, None, None, None),
        ("tstz", 1184, None, None, None, None, None),
        ("blob", 17, None, None, None, None, None),
        ("weird oid", 424242, None, None, None, None, None),
    ]
    schema = describe_query(
        "dsn", "SELECT 1", connection_factory=lambda dsn: _StubConn(desc)
    )
    got = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert got == {
        "flag": "boolean", "n": "bigint", "m": "int", "x": "double",
        "price": "decimal(38,18)", "d": "date", "ts": "timestamp_ntz",
        "tstz": "timestamp", "blob": "binary", "weird oid": "string",
    }
    assert _StubConn.last_sql == "SELECT * FROM (SELECT 1) mover_src LIMIT 0"
    # projection quotes identifiers, doubling embedded quotes
    describe_query(
        "dsn", "SELECT 1", columns=['a"b', "c"],
        connection_factory=lambda dsn: _StubConn(desc),
    )
    assert _StubConn.last_sql == 'SELECT "a""b", "c" FROM (SELECT 1) mover_src LIMIT 0'


def test_qident_quote_doubling_in_predicates():
    from mover_spark.sources.pgread import (
        hash_partition_predicates,
        range_partition_predicates,
    )

    assert range_partition_predicates('k"x', 0, 8, 2)[0].startswith('"k""x" <')
    assert '"k""x"' in hash_partition_predicates('k"x', 2, numeric=True)[0]
