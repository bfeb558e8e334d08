"""Contract test for the catalog-introspection SQL (S19-S24).

The reference introspects a live PostgreSQL (postgres.go:100-403); no
database exists in this environment, so the contract proxy is DuckDB's
information_schema/pg_catalog implementation: the SAME SQL strings the
engine would send over JDBC run against a DuckDB-hosted mock of the star
schema, and the parsed catalog must agree with the sidecar catalog
(catalog.STAR_SIDECAR) that the parquet fixtures use — keys, composite-PK
column order, FK edges, derived reverse-FK edges, column order and
nullability.
"""

from __future__ import annotations

import duckdb
import pytest

from mover_spark.catalog import STAR_SIDECAR
from mover_spark.sources.jdbc import (
    LIST_COLUMNS_SQL,
    LIST_TABLES_SQL,
    introspect_catalog,
)

# Star-schema DDL mirroring STAR_SIDECAR's key graph — what the source
# database of a real mover deployment would declare. lineitem's composite
# PK exercises multi-column constraint ordering.
STAR_DDL = [
    "CREATE TABLE region (r_regionkey BIGINT PRIMARY KEY, r_name VARCHAR)",
    "CREATE TABLE nation (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR, "
    "n_regionkey BIGINT REFERENCES region(r_regionkey))",
    "CREATE TABLE customer (c_custkey BIGINT PRIMARY KEY, c_name VARCHAR, "
    "c_nationkey BIGINT REFERENCES nation(n_nationkey), c_acctbal DOUBLE, "
    "c_mktsegment VARCHAR)",
    "CREATE TABLE supplier (s_suppkey BIGINT PRIMARY KEY, s_name VARCHAR, "
    "s_nationkey BIGINT REFERENCES nation(n_nationkey), s_acctbal DOUBLE)",
    "CREATE TABLE part (p_partkey BIGINT PRIMARY KEY, p_name VARCHAR, "
    "p_type VARCHAR, p_retailprice DOUBLE)",
    "CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY, "
    "o_custkey BIGINT REFERENCES customer(c_custkey), o_orderstatus VARCHAR, "
    "o_totalprice DOUBLE, o_orderdate DATE)",
    "CREATE TABLE lineitem (l_orderkey BIGINT REFERENCES orders(o_orderkey), "
    "l_linenumber INTEGER, l_partkey BIGINT REFERENCES part(p_partkey), "
    "l_suppkey BIGINT REFERENCES supplier(s_suppkey), l_quantity DOUBLE, "
    "l_extendedprice DOUBLE, PRIMARY KEY (l_orderkey, l_linenumber))",
    "CREATE TABLE events (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, "
    "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)",
    "CREATE TABLE documents (doc_id BIGINT PRIMARY KEY, text VARCHAR, "
    "lang VARCHAR, source VARCHAR, n_chars BIGINT)",
    "CREATE TABLE embeddings (vec_id BIGINT PRIMARY KEY, embedding DOUBLE[], "
    "label INTEGER)",
]


def _duck_runner(con):
    """Run the engine's introspection SQL verbatim on DuckDB.

    One documented engine gap: DuckDB 1.0's key_column_usage mis-names
    composite-PK constraints (single-column '<t>_<col>_pkey' row instead of
    '<t>_pkey' rows for every key column), so the standard PK query — which
    PostgreSQL answers correctly — silently drops multi-column keys here.
    The runner supplements ONLY those missing rows from duckdb_constraints()
    (same columns, constraint order), keeping the SQL under test unchanged.
    """

    def run(sql):
        rows = con.sql(sql).fetchall()
        if "PRIMARY KEY" in sql and "table_constraints" in sql:
            seen = {r[0] for r in rows}
            for t, cols in con.sql(
                "SELECT table_name, constraint_column_names FROM duckdb_constraints() "
                "WHERE constraint_type = 'PRIMARY KEY' AND len(constraint_column_names) > 1"
            ).fetchall():
                if t not in seen:
                    rows += [(t, c, i + 1) for i, c in enumerate(cols)]
        return rows

    return run


@pytest.fixture(scope="module")
def mock_catalog():
    con = duckdb.connect()
    for ddl in STAR_DDL:
        con.execute(ddl)
    yield introspect_catalog(_duck_runner(con), schema="main")
    con.close()


def test_all_tables_discovered(mock_catalog):
    assert set(mock_catalog) == set(STAR_SIDECAR)


def test_primary_keys_match_sidecar(mock_catalog):
    """PK columns AND their constraint order — lineitem's composite key must
    come back (l_orderkey, l_linenumber), not alphabetical or arbitrary."""
    for name, meta in STAR_SIDECAR.items():
        assert mock_catalog[name].primary_keys == meta["pk"], name


def test_foreign_keys_match_sidecar(mock_catalog):
    for name, meta in STAR_SIDECAR.items():
        got = {
            (tuple(fk.cols), fk.ref_table, tuple(fk.ref_cols))
            for fk in mock_catalog[name].foreign_keys
        }
        want = {
            (tuple(fk["cols"]), fk["ref"], tuple(fk["ref_cols"]))
            for fk in meta["fks"]
        }
        assert got == want, name


def test_reverse_fks_derived(mock_catalog):
    """Reference keys = inverted FK edges (postgres.go:100-134 parity,
    derived instead of queried)."""
    got = {
        (name, rk.child_table, tuple(rk.child_cols))
        for name, t in mock_catalog.items()
        for rk in t.reference_keys
    }
    want = {
        (fk["ref"], name, tuple(fk["cols"]))
        for name, meta in STAR_SIDECAR.items()
        for fk in meta["fks"]
    }
    assert got == want


def test_columns_ordinal_order_and_nullability(mock_catalog):
    """Columns come back in ordinal order (dialect.go:50-52's sort) with
    PK columns non-nullable."""
    li = mock_catalog["lineitem"]
    assert [c[0] for c in li.columns] == [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice",
    ]
    nullable = {c[0]: c[2] for c in li.columns}
    assert not nullable["l_orderkey"] and not nullable["l_linenumber"]
    assert nullable["l_quantity"]


def test_tables_query_sees_only_relations(mock_catalog):
    """LIST_TABLES_SQL's relkind='r' filter excludes views."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT PRIMARY KEY)")
    con.execute("CREATE VIEW v AS SELECT * FROM t")
    names = {r[0] for r in con.sql(LIST_TABLES_SQL.format(schema="main")).fetchall()}
    con.close()
    assert names == {"t"}


def test_columns_query_shape():
    """LIST_COLUMNS_SQL yields (table, column, type, nullable, position)
    with a boolean nullable — the shape introspect_catalog parses."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT NOT NULL, b VARCHAR)")
    rows = sorted(con.sql(LIST_COLUMNS_SQL.format(schema="main")).fetchall())
    con.close()
    assert rows == [("t", "a", "BIGINT", False, 1), ("t", "b", "VARCHAR", True, 2)]
