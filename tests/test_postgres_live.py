"""End-to-end extract→load→resync against a LIVE local PostgreSQL server.

This is the realism gap the stub/DuckDB contract tests can't close: the
actual Engine.load(dsn=...) code path — executor-side foreachPartition
connections, the trigger disable/enable bracket, ON CONFLICT upserts, and
sequence resync (postgres.go:64-97,466-523) — running against a real
server over the wire (via the bundled minipg client; psycopg2 is absent
in this sandbox). The server is a throwaway initdb cluster on a unix
socket, started per test module and torn down after.

Skips cleanly when the postgres binaries or root/runuser are unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

from mover_spark.sources import minipg

PG_PORT = 54391  # socket filename suffix only (unix socket, no TCP)


def _have_postgres() -> bool:
    return (
        shutil.which("initdb") is not None
        and shutil.which("pg_ctl") is not None
        and shutil.which("runuser") is not None
        and os.geteuid() == 0  # need runuser -u postgres
    )


pytestmark = pytest.mark.skipif(
    not _have_postgres(), reason="postgres binaries / runuser not available"
)


@pytest.fixture(scope="module")
def pg_dsn():
    base = f"/tmp/mover_pg_{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    shutil.chown(base, "postgres", "postgres")
    data = os.path.join(base, "data")

    def pg(*args):
        subprocess.run(
            ["runuser", "-u", "postgres", "--", *args],
            check=True, capture_output=True,
        )

    try:
        pg("initdb", "-D", data, "-A", "trust", "--no-sync")
        pg(
            "pg_ctl", "-D", data, "-w", "-l", os.path.join(base, "log.txt"),
            "-o",
            f"-c listen_addresses='' -c unix_socket_directories={base} "
            f"-p {PG_PORT} -c fsync=off",
            "start",
        )
        yield f"host={base} port={PG_PORT} user=postgres dbname=postgres"
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-m", "immediate", "stop"],
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def _run(dsn: str, *stmts):
    conn = minipg.connect(dsn)
    try:
        rows = None
        with conn.cursor() as cur:
            for s in stmts:
                cur.execute(s)
                rows = cur.fetchall()
        conn.commit()
        return rows
    finally:
        conn.close()


# --- introspection SQL against the real information_schema ------------------

def test_introspect_catalog_live(pg_dsn):
    """The four LIST_*_SQL queries (contract-tested on DuckDB so far) run
    unchanged on real Postgres and recover tables/columns/PKs/FKs —
    including a composite PK and a decoy schema holding identically-named
    tables + default-named <table>_pkey constraints (the cross-schema
    collision the PK join must not match)."""
    from mover_spark.sources.jdbc import introspect_catalog

    _run(
        pg_dsn,
        "DROP SCHEMA IF EXISTS decoy CASCADE",
        "DROP TABLE IF EXISTS line_item, ord CASCADE",
        "CREATE TABLE ord (o_id bigint PRIMARY KEY, o_note text)",
        "CREATE TABLE line_item ("
        " l_oid bigint REFERENCES ord (o_id), l_no int, l_qty double precision,"
        " PRIMARY KEY (l_oid, l_no))",
        # decoy schema: same table names => same default constraint names
        # (ord_pkey / line_item_pkey) with DIFFERENT key columns
        "CREATE SCHEMA decoy",
        "CREATE TABLE decoy.ord (other_id int PRIMARY KEY)",
        "CREATE TABLE decoy.line_item (other_a int, other_b int, other_c int,"
        " PRIMARY KEY (other_a, other_b, other_c))",
    )

    def run_sql(sql):
        conn = minipg.connect(pg_dsn)
        try:
            with conn.cursor() as cur:
                cur.execute(sql)
                return cur.fetchall()
        finally:
            conn.close()

    tables = introspect_catalog(run_sql, schema="public")
    assert set(tables) == {"ord", "line_item"}
    assert tables["ord"].primary_keys == ["o_id"]
    assert tables["line_item"].primary_keys == ["l_oid", "l_no"]  # composite, ordered
    cols = {c[0]: c[1] for c in tables["line_item"].columns}
    assert cols == {"l_oid": "bigint", "l_no": "integer",
                    "l_qty": "double precision"}
    (fk,) = tables["line_item"].foreign_keys
    assert (fk.cols, fk.ref_table, fk.ref_cols) == (["l_oid"], "ord", ["o_id"])
    (rk,) = tables["ord"].reference_keys
    assert (rk.child_table, rk.child_cols) == ("line_item", ["l_oid"])


# --- the full extract -> load -> resync round trip --------------------------

@pytest.fixture(scope="module")
def tpch_pg(pg_dsn):
    """region/nation target tables + a hostile trigger that rejects every
    insert — proving the load's DISABLE TRIGGER bracket really executes
    (as superuser it disables user triggers exactly like the reference's
    session_replication_role trick, postgres.go:483-497)."""
    _run(
        pg_dsn,
        "DROP TABLE IF EXISTS nation, region CASCADE",
        "CREATE TABLE region (r_regionkey int PRIMARY KEY, r_name text)",
        "CREATE TABLE nation (n_nationkey int PRIMARY KEY, n_name text,"
        " n_regionkey int REFERENCES region (r_regionkey))",
        "CREATE FUNCTION reject_all() RETURNS trigger AS"
        " $$ BEGIN RAISE EXCEPTION 'trigger not disabled'; END $$"
        " LANGUAGE plpgsql",
        "CREATE TRIGGER region_reject BEFORE INSERT ON region"
        " FOR EACH ROW EXECUTE FUNCTION reject_all()",
    )
    return pg_dsn


def test_extract_load_live_idempotent(tpch_pg, spark, tmp_path):
    """CLI extract (parquet catalog -> envelopes) then CLI load (envelopes
    -> live postgres): rows land despite the reject-trigger, FK order
    survives (triggers disabled), and a second load is a no-op
    (ON CONFLICT DO NOTHING idempotency) — the reference's core promise."""
    import json

    from mover_spark import cli

    out = str(tmp_path / "extract")
    # omit nation's reverse-FK fanout (customer/supplier) — the live target
    # only has region+nation; this also exercises the -conf code path
    conf = tmp_path / "config.json"
    conf.write_text(json.dumps({
        "schema": [{"table_name": "nation", "omit_reference_keys": True}]
    }))
    rc = cli.main([
        "-action", "extract", "-path", out, "-conf", str(conf),
        "-query", "SELECT * FROM nation WHERE n_nationkey <= 5",
        "-sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0

    rc = cli.main(["-action", "load", "-path", out, "-dsn", tpch_pg,
                   "-sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    (n_nation,) = _run(tpch_pg, "SELECT COUNT(*) FROM nation")[0]
    (n_region,) = _run(tpch_pg, "SELECT COUNT(*) FROM region")[0]
    assert n_nation == 6  # nationkeys 0..5
    assert n_region > 0  # closure pulled the referenced regions

    # triggers were re-enabled after the load (the bracket closes)
    with pytest.raises(minipg.MiniPgError, match="trigger not disabled"):
        _run(tpch_pg, "INSERT INTO region VALUES (999, 'nope')")

    # idempotency: second load of the same envelopes changes nothing
    rc = cli.main(["-action", "load", "-path", out, "-dsn", tpch_pg,
                   "-sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert _run(tpch_pg, "SELECT COUNT(*) FROM nation")[0] == (n_nation,)
    assert _run(tpch_pg, "SELECT COUNT(*) FROM region")[0] == (n_region,)

    # loaded values match the envelope source (spot-check nation names)
    with open(os.path.join(out, "nation", "_envelope.json")) as f:
        assert json.load(f)["count"] == n_nation
    got = dict(_run(tpch_pg, "SELECT n_nationkey, n_name FROM nation"))
    want = {
        int(r["n_nationkey"]): r["n_name"]
        for r in spark.read.json(os.path.join(out, "nation", "part-*"))
        .collect()
    }
    assert got == want


def test_sequence_resync_live(pg_dsn, spark, tmp_path):
    """A serial-id table: after loading explicit ids above the sequence
    position, nextval must jump past MAX(id) (postgres.go:499-523) — the
    insert a user makes right after a restore must not collide."""
    from mover_spark.engine import Engine
    from mover_spark.catalog import Catalog
    from mover_spark.sources import jsonio

    _run(pg_dsn, "DROP TABLE IF EXISTS account",
         "CREATE TABLE account (id serial PRIMARY KEY, email text)")

    df = spark.createDataFrame(
        [(7, "a@x"), (9, "b@x"), (42, "c@x")], "id int, email string"
    )
    jsonio.write_envelope(df, "account", str(tmp_path), partitioned=True)
    catalog = Catalog(spark, "/root/testdata/sf0.001")
    Engine(spark, catalog).load(str(tmp_path), dsn=pg_dsn)

    (nxt,) = _run(pg_dsn, "SELECT nextval('account_id_seq')")[0]
    assert nxt == 43  # GREATEST(MAX(id)+1, old nextval)
    # and inserting without an id works immediately
    _run(pg_dsn, "INSERT INTO account (email) VALUES ('d@x')")
    (n,) = _run(pg_dsn, "SELECT COUNT(*) FROM account")[0]
    assert n == 4


def test_resync_skips_tables_without_sequence(pg_dsn, spark, tmp_path):
    """Natural-key tables (no {table}_id_seq) load fine — the to_regclass
    guard makes resync a no-op instead of the reference's hard error."""
    from mover_spark.engine import Engine
    from mover_spark.catalog import Catalog
    from mover_spark.sources import jsonio

    _run(pg_dsn, "DROP TABLE IF EXISTS natkey",
         "CREATE TABLE natkey (code text PRIMARY KEY, v int)")
    df = spark.createDataFrame([("a", 1), ("b", 2)], "code string, v int")
    jsonio.write_envelope(df, "natkey", str(tmp_path), partitioned=True)
    Engine(spark, Catalog(spark, "/root/testdata/sf0.001")).load(
        str(tmp_path), dsn=pg_dsn
    )
    assert _run(pg_dsn, "SELECT COUNT(*) FROM natkey")[0] == (2,)


def test_on_conflict_update_live(pg_dsn, spark, tmp_path):
    """on_conflict='update' (the last-write-wins mode the reference lacks)
    really merges on a live server."""
    from mover_spark.engine import Engine
    from mover_spark.catalog import Catalog
    from mover_spark.sources import jsonio

    _run(pg_dsn, "DROP TABLE IF EXISTS kv",
         "CREATE TABLE kv (id int PRIMARY KEY, v text)",
         "INSERT INTO kv VALUES (1, 'old'), (2, 'keep')")
    df = spark.createDataFrame([(1, "new"), (3, "add")], "id int, v string")
    jsonio.write_envelope(df, "kv", str(tmp_path), partitioned=True)
    Engine(spark, Catalog(spark, "/root/testdata/sf0.001")).load(
        str(tmp_path), dsn=pg_dsn, on_conflict="update"
    )
    got = dict(_run(pg_dsn, "SELECT id, v FROM kv ORDER BY id"))
    assert got == {1: "new", 2: "keep", 3: "add"}


def test_minipg_interpolate_matches_psycopg2_placeholder_rules():
    """Only %s consumes a parameter and %% escapes; a literal % elsewhere
    (LIKE patterns) passes through — raw Python %-formatting would raise."""
    import pytest

    from mover_spark.sources.minipg import _interpolate

    assert (
        _interpolate("SELECT * FROM t WHERE name LIKE 'a%' AND id = %s", (5,))
        == "SELECT * FROM t WHERE name LIKE 'a%' AND id = 5"
    )
    assert _interpolate("SELECT '100%%' || %s", ("x",)) == "SELECT '100%' || 'x'"
    with pytest.raises(ValueError, match="more %s placeholders"):
        _interpolate("%s + %s", (1,))
    with pytest.raises(ValueError, match="expects 1"):
        _interpolate("%s", (1, 2))
