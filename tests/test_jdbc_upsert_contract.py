"""Contract tests for the generated upsert SQL (S17) against a real
engine.

The psycopg2 execute path is stub-tested (no database here), but the SQL
STRINGS themselves were never executed anywhere. DuckDB implements the
same `INSERT ... ON CONFLICT` dialect as PostgreSQL, so running the
generated statements against DuckDB tables verifies the semantics the
loader depends on: conflict-target matching on single and composite
keys, DO NOTHING idempotency (first write wins, the reference's
behavior, postgres.go:466-481), and the DO UPDATE last-write-wins
extension. Only the VALUES placeholder differs (execute_values `%s` vs
parameter tuples), translated mechanically here.
"""

from __future__ import annotations

import duckdb
import pytest

from mover_spark.sources.jdbc import insert_sql, upsert_sql, upsert_update_sql


def _run(con, sql: str, columns: list[str], rows: list[tuple]):
    stmt = sql.replace("VALUES %s", f"VALUES ({', '.join(['?'] * len(columns))})")
    con.executemany(stmt, rows)


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_upsert_do_nothing_is_idempotent(con):
    con.execute('CREATE TABLE "users" (id BIGINT PRIMARY KEY, name VARCHAR)')
    cols = ["id", "name"]
    sql = upsert_sql("users", cols, "id")
    _run(con, sql, cols, [(1, "a"), (2, "b")])
    # replay + conflicting new value: first write wins, no error, no dup
    _run(con, sql, cols, [(1, "CHANGED"), (3, "c")])
    assert con.sql('SELECT id, name FROM "users" ORDER BY id').fetchall() == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_upsert_composite_conflict_target(con):
    con.execute(
        'CREATE TABLE "li" (a BIGINT, b INTEGER, v DOUBLE, PRIMARY KEY (a, b))'
    )
    cols = ["a", "b", "v"]
    sql = upsert_sql("li", cols, ["a", "b"])
    _run(con, sql, cols, [(1, 1, 0.5), (1, 2, 0.7)])
    _run(con, sql, cols, [(1, 1, 9.9), (2, 1, 0.1)])
    assert con.sql('SELECT a, b, v FROM "li" ORDER BY a, b').fetchall() == [
        (1, 1, 0.5),
        (1, 2, 0.7),
        (2, 1, 0.1),
    ]


def test_upsert_do_update_last_write_wins(con):
    con.execute('CREATE TABLE "users" (id BIGINT PRIMARY KEY, name VARCHAR, n INTEGER)')
    cols = ["id", "name", "n"]
    sql = upsert_update_sql("users", cols, "id")
    _run(con, sql, cols, [(1, "a", 1)])
    _run(con, sql, cols, [(1, "updated", 2), (2, "b", 1)])
    assert con.sql('SELECT id, name, n FROM "users" ORDER BY id').fetchall() == [
        (1, "updated", 2),
        (2, "b", 1),
    ]


def test_upsert_update_without_nonkey_columns_degrades_to_nothing(con):
    """A table that is ALL key: an empty SET list is a syntax error, so the
    generator must fall back to DO NOTHING (jdbc.py documents this)."""
    con.execute('CREATE TABLE "k" (id BIGINT PRIMARY KEY)')
    sql = upsert_update_sql("k", ["id"], "id")
    assert "DO NOTHING" in sql
    _run(con, sql, ["id"], [(1,), (1,), (2,)])
    assert con.sql('SELECT COUNT(*) FROM "k"').fetchone()[0] == 2


def test_plain_insert_for_non_unique_pk(con):
    """pk_unique=False tables (fixture lineitem) take plain INSERT — ON
    CONFLICT against a non-constraint would error on Postgres."""
    con.execute('CREATE TABLE "log" (id BIGINT, v VARCHAR)')
    cols = ["id", "v"]
    sql = insert_sql("log", cols)
    assert "ON CONFLICT" not in sql
    _run(con, sql, cols, [(1, "x"), (1, "x")])  # duplicates allowed
    assert con.sql('SELECT COUNT(*) FROM "log"').fetchone()[0] == 2
