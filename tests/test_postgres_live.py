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


# --- partitioned parallel extract (pgread) ----------------------------------

@pytest.fixture(scope="module")
def pread_pg(pg_dsn):
    """A 2,000-row table with a bigint PK (negatives included — the
    sign-safe mod must survive them) and a text-keyed sibling."""
    _run(
        pg_dsn,
        "DROP TABLE IF EXISTS pread_num, pread_txt",
        "CREATE TABLE pread_num (id bigint PRIMARY KEY, val text, amt double precision)",
        "INSERT INTO pread_num "
        "SELECT g, 'v' || g, g * 1.5 FROM generate_series(-500, 1499) g",
        "CREATE TABLE pread_txt (code text PRIMARY KEY, n int)",
        "INSERT INTO pread_txt "
        "SELECT 'k-' || g, g FROM generate_series(1, 300) g",
    )
    return pg_dsn


def test_parallel_read_matches_single_connection(pread_pg, spark):
    """The headline scale fix: N executor-side connections, one disjoint
    range predicate each, reading the same rows a single connection
    returns — contrast postgres.go:21-35 (one pipe, always)."""
    from pyspark.sql import functions as F

    from mover_spark.sources.jdbc import dsn_run_sql
    from mover_spark.sources.pgread import (
        auto_partition_predicates,
        parallel_read,
    )

    run = dsn_run_sql(pread_pg)
    preds = auto_partition_predicates(run, "pread_num", "id", "bigint", 4)
    assert len(preds) == 4
    df = parallel_read(
        spark, pread_pg, 'SELECT * FROM "pread_num"', preds
    )
    # one predicate = one Spark partition = one concurrent connection
    assert df.rdd.getNumPartitions() == 4
    # the split genuinely splits: >=2 partitions carry rows
    per_part = (
        df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert len([r for r in per_part if r["count"] > 0]) >= 2
    # row-for-row identical to the single-connection read
    got = sorted((r.id, r.val, r.amt) for r in df.collect())
    want = sorted(run('SELECT id, val, amt FROM "pread_num"'))
    assert got == want and len(got) == 2000


def test_parallel_read_text_key_hash(pread_pg, spark):
    """Keyless/non-numeric fallback: hashtextextended mod predicates —
    disjoint + complete verified ON THE SERVER, then the parallel read
    matches the single-connection read."""
    from mover_spark.sources.jdbc import dsn_run_sql
    from mover_spark.sources.pgread import (
        auto_partition_predicates,
        parallel_read,
    )

    run = dsn_run_sql(pread_pg)
    preds = auto_partition_predicates(run, "pread_txt", "code", "text", 4)
    assert len(preds) == 4
    (total,) = run('SELECT COUNT(*) FROM "pread_txt"')[0]
    per = [run(f'SELECT COUNT(*) FROM "pread_txt" WHERE ({p})')[0][0] for p in preds]
    assert sum(per) == total  # complete
    assert sum(1 for c in per if c > 0) >= 2  # actually splits
    for i, a in enumerate(preds):
        for b in preds[i + 1:]:
            (o,) = run(f'SELECT COUNT(*) FROM "pread_txt" WHERE ({a}) AND ({b})')[0]
            assert o == 0  # disjoint

    df = parallel_read(spark, pread_pg, 'SELECT * FROM "pread_txt"', preds)
    got = sorted((r.code, r.n) for r in df.collect())
    want = sorted(run('SELECT code, n FROM "pread_txt"'))
    assert got == want and len(got) == 300


def test_parallel_read_projection_and_types(pread_pg, spark):
    """Column projection pushes down (only requested columns travel) and
    the OID->Spark type map survives the round trip."""
    from mover_spark.sources.pgread import parallel_read, range_partition_predicates

    df = parallel_read(
        spark,
        pread_pg,
        'SELECT * FROM "pread_num"',
        range_partition_predicates("id", -500, 1500, 3),
        columns=["id", "amt"],
    )
    assert df.columns == ["id", "amt"]
    assert dict(df.dtypes) == {"id": "bigint", "amt": "double"}
    row = df.where("id = 10").collect()[0]
    assert (row.id, row.amt) == (10, 15.0)


def test_dsn_extract_closure_load_roundtrip(pg_dsn, spark, tmp_path):
    """The full mover loop AGAINST A DSN SOURCE: partitioned parallel
    extract from live PG -> FK closure (children pull their parents) ->
    sanitize -> envelopes -> load back into the same (truncated) tables
    -> second load is a no-op. The reference runs this loop through one
    connection each way; here the extract side reads through N
    executor-side connections (DsnCatalog auto-partitioning)."""
    from mover_spark.config import MoverConfig
    from mover_spark.engine import Engine
    from mover_spark.sources.pgread import DsnCatalog

    _run(
        pg_dsn,
        "DROP TABLE IF EXISTS li2, ord2 CASCADE",
        "CREATE TABLE ord2 (o_id bigint PRIMARY KEY, o_note text)",
        "CREATE TABLE li2 (l_id bigint PRIMARY KEY,"
        " l_oid bigint REFERENCES ord2 (o_id), l_qty double precision)",
        "INSERT INTO ord2 SELECT g, 'note-' || g FROM generate_series(1, 40) g",
        "INSERT INTO li2 SELECT g, (g % 40) + 1, g * 0.5"
        " FROM generate_series(1, 400) g",
    )

    # register_views=False: the shared test session already has parquet
    # views named region/nation; only the seed view this test queries is
    # registered (production DsnCatalog use registers everything)
    cat = DsnCatalog(spark, pg_dsn, num_partitions=4, register_views=False)
    assert set(cat.tables) >= {"ord2", "li2"}
    cat.df("li2").createOrReplaceTempView("li2")
    config = MoverConfig(schema=[{
        "table_name": "ord2",
        "omit_reference_keys": True,  # seed li2 pulls parents only
        "columns": [{"name": "o_note", "fake": "last_name", "unique": True}],
    }])
    eng = Engine(spark, cat, config)
    out = str(tmp_path / "dsn_extract")
    res = eng.extract(out, "SELECT * FROM li2 WHERE l_id <= 100", table="li2")
    assert set(res) == {"li2", "ord2"}
    # closure pulled exactly the parents of the seed rows
    want_parents = {r[0] for r in _run(
        pg_dsn, "SELECT DISTINCT l_oid FROM li2 WHERE l_id <= 100")}
    got_parents = {r.o_id for r in res["ord2"].collect()}
    assert got_parents == want_parents
    # sanitize applied: o_note faked, unique
    notes = [r.o_note for r in res["ord2"].collect()]
    assert all(not n.startswith("note-") for n in notes)
    assert len(set(notes)) == len(notes)

    # load back into the truncated source tables, then again: idempotent
    _run(pg_dsn, "TRUNCATE li2, ord2 CASCADE")
    eng.load(out, dsn=pg_dsn)
    (n_li,) = _run(pg_dsn, "SELECT COUNT(*) FROM li2")[0]
    (n_ord,) = _run(pg_dsn, "SELECT COUNT(*) FROM ord2")[0]
    assert n_li == 100 and n_ord == len(want_parents)
    eng.load(out, dsn=pg_dsn)
    assert _run(pg_dsn, "SELECT COUNT(*) FROM li2")[0] == (n_li,)
    assert _run(pg_dsn, "SELECT COUNT(*) FROM ord2")[0] == (n_ord,)


# --- property fuzz: literal inlining vs the real server parser --------------

def test_minipg_interpolate_placeholder_fuzz():
    """Hypothesis fuzz of the %s/%%/literal-% tokenizer against an
    independent regex model: consumed-parameter count, escape handling,
    and pass-through bytes agree on randomized templates."""
    import re

    from hypothesis import given, settings, strategies as st

    from mover_spark.sources.minipg import _interpolate, quote_literal

    # templates assembled from fragments so %s/%%/stray-% appear in
    # realistic mixtures (pure random text almost never makes a %s)
    frag = st.one_of(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00"), max_size=8
        ),
        st.just("%s"),
        st.just("%%"),
        st.just("%"),
        st.just("'a%'"),
    )
    tmpl = st.lists(frag, max_size=12).map("".join)

    SLOT = object()  # sentinel — can never collide with template text

    @settings(max_examples=1000, deadline=None)
    @given(tmpl, st.data())
    def check(sql, data):
        # the independent model: scan left-to-right, same three rules
        out_model, i, n_slots = [], 0, 0
        while i < len(sql):
            if sql.startswith("%s", i):
                n_slots += 1
                out_model.append(SLOT)
                i += 2
            elif sql.startswith("%%", i):
                out_model.append("%")
                i += 2
            else:
                out_model.append(sql[i])
                i += 1
        params = data.draw(
            st.lists(
                st.one_of(
                    st.integers(-(2**62), 2**62),
                    # NUL and lone surrogates (category Cs) are excluded:
                    # quote_literal REJECTS both by contract (the explicit
                    # rejection test below pins that); this fuzz targets
                    # the tokenizer on encodable values
                    st.text(
                        alphabet=st.characters(
                            blacklist_characters="\x00",
                            blacklist_categories=("Cs",),
                        ),
                        max_size=6,
                    ),
                    st.none(),
                    st.booleans(),
                ),
                min_size=n_slots,
                max_size=n_slots,
            )
        )
        it = iter(params)
        expect = "".join(
            quote_literal(next(it)) if piece is SLOT else piece
            for piece in out_model
        )
        assert _interpolate(sql, params) == expect
        # wrong arity must raise, both directions
        if n_slots:
            with pytest.raises(ValueError):
                _interpolate(sql, params[:-1])
        with pytest.raises(ValueError):
            _interpolate(sql, params + [0])

    check()


def test_minipg_literal_roundtrip_fuzz_live(pg_dsn):
    """The strong oracle: 1000+ randomized values of every supported type
    sent through ``execute(sql, params)`` — since round 8 that is the
    EXTENDED-protocol Bind path (_to_pg_text) — against the REAL server;
    the parsed-back value must equal the original. Covers quotes,
    backslashes, unicode, bytea, temporal types, and numeric edge
    magnitudes; NULs are rejected client-side (PG text values can't hold
    them) rather than generated. The literal-inlining path
    (quote_literal, still used by execute_values' bulk VALUES expansion)
    keeps its own round trip in test_minipg_literal_path_still_roundtrips."""
    import datetime
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    from mover_spark.sources import minipg

    conn = minipg.connect(pg_dsn)

    # surrogates (category Cs) are excluded from the ROUNDTRIP strategy —
    # they are not UTF-8-encodable so they can never be valid PG text;
    # the clean client-side rejection is asserted separately below
    text_strat = st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
        max_size=40,
    )
    value = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        text_strat,
        st.binary(max_size=40),
        st.dates(
            min_value=datetime.date(1, 1, 1),
            max_value=datetime.date(9999, 12, 31),
        ),
        st.datetimes(
            min_value=datetime.datetime(1, 1, 1),
            max_value=datetime.datetime(9999, 12, 31, 23, 59, 59),
        ),
        st.decimals(
            allow_nan=False, allow_infinity=False, places=6,
            min_value=Decimal("-1e20"), max_value=Decimal("1e20"),
        ),
    )

    casts = {
        bool: "boolean", int: "bigint", float: "float8", str: "text",
        bytes: "bytea", datetime.date: "date",
        datetime.datetime: "timestamp", Decimal: "numeric",
    }

    @settings(max_examples=1200, deadline=None)
    @given(value)
    def check(v):
        # explicit cast pins the server-side type so _decode's OID map
        # round-trips (a bare quoted literal would come back as text)
        cast = "text" if v is None else casts[
            type(v) if type(v) in casts else
            next(t for t in casts if isinstance(v, t))
        ]
        with conn.cursor() as cur:
            cur.execute(f"SELECT (%s)::{cast}", (v,))
            (got,) = cur.fetchone()
        if v is None:
            assert got is None
        elif isinstance(v, bool):
            assert got is v
        elif isinstance(v, float):
            assert got == v or (got == 0.0 and v == 0.0)
        elif isinstance(v, datetime.datetime):
            assert got == v
        else:
            assert got == v

    try:
        check()
        # and the NUL guard: never silently truncates on the wire
        with pytest.raises(ValueError, match="NUL"):
            minipg.quote_literal("a\x00b")
        # lone surrogate: clean rejection, not a UnicodeEncodeError
        # mid-send (hypothesis found this one)
        with pytest.raises(ValueError, match="surrogate"):
            minipg.quote_literal("\ud800")
    finally:
        conn.close()


def test_parallel_read_cursor_streaming_small_batches(pread_pg, spark):
    """Server-side cursor streaming: batch_rows far below the partition
    size forces many FETCH FORWARD round trips per connection — executor
    memory is bounded by one batch — and the result still matches the
    buffered (stream=False) path and the single-connection read."""
    from mover_spark.sources.jdbc import dsn_run_sql
    from mover_spark.sources.pgread import parallel_read, range_partition_predicates

    preds = range_partition_predicates("id", -500, 1500, 4)
    streamed = parallel_read(
        spark, pread_pg, 'SELECT * FROM "pread_num"', preds, batch_rows=137
    )
    buffered = parallel_read(
        spark, pread_pg, 'SELECT * FROM "pread_num"', preds,
        batch_rows=137, stream=False,
    )
    got_s = sorted((r.id, r.val, r.amt) for r in streamed.collect())
    got_b = sorted((r.id, r.val, r.amt) for r in buffered.collect())
    want = sorted(dsn_run_sql(pread_pg)('SELECT id, val, amt FROM "pread_num"'))
    assert got_s == want and got_b == want and len(want) == 2000


def test_minipg_declare_fetch_wire_flow(pg_dsn):
    """The DECLARE/FETCH flow at the wire level: a 10-row table fetched 3
    rows at a time takes exactly ceil(10/3)+1 FETCH round trips and
    decodes every batch through the per-FETCH RowDescription."""
    _run(pg_dsn, "DROP TABLE IF EXISTS curfetch",
         "CREATE TABLE curfetch (i int, t text)",
         "INSERT INTO curfetch SELECT g, 'r' || g FROM generate_series(1, 10) g")
    conn = minipg.connect(pg_dsn)
    try:
        got, fetches = [], 0
        with conn.cursor() as cur:
            cur.execute(
                "DECLARE c NO SCROLL CURSOR FOR SELECT i, t FROM curfetch ORDER BY i"
            )
            while True:
                cur.execute("FETCH FORWARD 3 FROM c")
                fetches += 1
                rows = cur.fetchall()
                if not rows:
                    break
                got.extend(rows)
        assert fetches == 5  # 3+3+3+1 rows, then the empty terminator
        assert got == [(i, f"r{i}") for i in range(1, 11)]
    finally:
        conn.close()


def test_parallel_read_numeric_precision_live(pg_dsn, spark):
    """numeric columns read at their DECLARED precision/scale (from the
    wire-level atttypmod surfaced in cursor.description): a numeric(30,0)
    holding 1e21 and a numeric(38,28) with 28 fractional digits both
    exceed the old hardcoded decimal(38,18) and must round-trip exactly;
    an unconstrained numeric keeps the documented (38,18) fallback."""
    from decimal import Decimal

    from mover_spark.sources.pgread import parallel_read, range_partition_predicates

    _run(
        pg_dsn,
        "DROP TABLE IF EXISTS pread_dec",
        "CREATE TABLE pread_dec (id bigint PRIMARY KEY, big numeric(30,0),"
        " fine numeric(38,28), free numeric)",
        "INSERT INTO pread_dec SELECT g,"
        " 1000000000000000000000 + g,"                       # 1e21 + g
        " g * 0.1234567890123456789012345678,"
        " g * 1.5"
        " FROM generate_series(1, 50) g",
    )
    df = parallel_read(
        spark, pg_dsn, 'SELECT * FROM "pread_dec"',
        range_partition_predicates("id", 1, 51, 3),
    )
    types = dict(df.dtypes)
    assert types["big"] == "decimal(30,0)"
    assert types["fine"] == "decimal(38,28)"
    assert types["free"] == "decimal(38,18)"
    got = {r.id: (r.big, r.fine) for r in df.collect()}
    assert got[3] == (
        Decimal("1000000000000000000003"),
        Decimal("0.3703703670370370367037037034"),
    )
    assert len(got) == 50


def test_read_seed_query_rejects_partial_partition_spec(spark):
    """A partial stride spec must raise, not silently degrade to the
    single-connection read (the exact bottleneck partitioning removes)."""
    from mover_spark.sources.jdbc import read_seed_query

    with pytest.raises(ValueError, match="partitioned read needs ALL"):
        read_seed_query(
            spark, "jdbc:postgresql://x/y", "SELECT 1", {},
            partition_column="id", num_partitions=8,
        )


def test_minipg_extended_protocol_binds_live(pg_dsn):
    """Extended-query protocol essentials against the real server:
    hostile strings stay DATA (out-of-band binds can't change statement
    shape), %% stays a literal %, placeholder/param mismatches raise
    client-side, NULL binds round-trip, and DML through binds works
    inside the lazy-transaction bracket."""
    from mover_spark.sources import minipg

    conn = minipg.connect(pg_dsn)
    try:
        hostile = [
            "'; DROP TABLE bind_t; --",
            "Robert'); DELETE FROM bind_t;--",
            'a"b`c\\d\\\\e',
            "100% legit' OR '1'='1",
        ]
        with conn.cursor() as cur:
            cur.execute("CREATE TABLE bind_t (id int PRIMARY KEY, v text)")
            for i, s in enumerate(hostile):
                cur.execute("INSERT INTO bind_t VALUES (%s, %s)", (i, s))
            cur.execute("SELECT v FROM bind_t ORDER BY id")
            assert [r[0] for r in cur.fetchall()] == hostile
            # the table survived every 'injection' — it was all data
            cur.execute("SELECT COUNT(*) FROM bind_t WHERE v LIKE '100%%'")
            assert cur.fetchone() == (4 - 3,)
            cur.execute("SELECT %s::text", (None,))
            assert cur.fetchone() == (None,)
            import pytest as _pytest

            with _pytest.raises(ValueError, match="placeholder"):
                cur.execute("SELECT %s, %s", (1,))
            with _pytest.raises(ValueError, match="NUL"):
                cur.execute("SELECT %s", ("a\x00b",))
            with _pytest.raises(ValueError, match="surrogate"):
                cur.execute("SELECT %s", ("\ud800",))
            # server-side errors surface as MiniPgError and the
            # connection recovers for the next statement
            cur.execute("SELECT 1")
        conn.rollback()
    finally:
        conn.close()


def test_minipg_literal_path_still_roundtrips(pg_dsn):
    """execute_values keeps the literal-inlining path (bulk VALUES beats
    the 65535-bind cap): hostile strings must still round-trip through
    quote_literal there."""
    from mover_spark.sources import minipg

    vals = ["it's", "back\\slash", "E'esc", "100% x", "naïve"]
    conn = minipg.connect(pg_dsn)
    try:
        with conn.cursor() as cur:
            cur.execute("CREATE TABLE lit_t (id int, v text)")
            minipg.execute_values(
                cur,
                "INSERT INTO lit_t VALUES %s",
                [(i, v) for i, v in enumerate(vals)],
            )
            cur.execute("SELECT v FROM lit_t ORDER BY id")
            assert [r[0] for r in cur.fetchall()] == vals
        conn.rollback()
    finally:
        conn.close()


# --- SCRAM-SHA-256 (round 13) ------------------------------------------------

def test_scram_client_rfc7677_vector():
    """The SCRAM client reproduces RFC 7677's SCRAM-SHA-256 test vector
    bit-for-bit (user 'user', password 'pencil', pinned nonces) — proof,
    client-final message, and the mutual-auth server-signature check.
    Pure-Python, no server needed."""
    from mover_spark.sources.minipg import MiniPgError, _ScramClient

    c = _ScramClient("pencil", username="user", nonce="rOprNGfwEbeRWgbNEkqO")
    assert c.client_first() == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    final = c.client_final(server_first)
    assert final == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    # the RFC's server-final verifies; a tampered signature refuses
    c.verify_server(b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    with pytest.raises(MiniPgError):
        c.verify_server(b"v=AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=")


def test_scram_client_rejects_nonce_truncation():
    """A server echoing the client nonce WITHOUT extending it (or a
    different nonce) is a replay/MITM shape — the client must refuse."""
    from mover_spark.sources.minipg import MiniPgError, _ScramClient

    for bad_r in ("rOprNGfwEbeRWgbNEkqO", "completely-different-nonce"):
        c = _ScramClient("pw", nonce="rOprNGfwEbeRWgbNEkqO")
        c.client_first()
        with pytest.raises(MiniPgError):
            c.client_final(
                f"r={bad_r},s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096".encode()
            )


@pytest.fixture(scope="module")
def scram_pg_dsn():
    """A SCRAM-ONLY throwaway cluster: initdb -A scram-sha-256 writes a
    pg_hba.conf with no trust line (the modern distro default the r12
    client could not speak), password_encryption is PG15's scram
    default."""
    base = f"/tmp/mover_pgscram_{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    shutil.chown(base, "postgres", "postgres")
    data = os.path.join(base, "data")
    pwfile = os.path.join(base, "pw.txt")
    with open(pwfile, "w") as f:
        f.write("s3cret-scram\n")
    shutil.chown(pwfile, "postgres", "postgres")

    def pg(*args):
        subprocess.run(
            ["runuser", "-u", "postgres", "--", *args],
            check=True, capture_output=True,
        )

    try:
        pg(
            "initdb", "-D", data, "-A", "scram-sha-256",
            f"--pwfile={pwfile}", "--no-sync",
        )
        pg(
            "pg_ctl", "-D", data, "-w", "-l", os.path.join(base, "log.txt"),
            "-o",
            f"-c listen_addresses='' -c unix_socket_directories={base} "
            f"-p {PG_PORT + 1} -c fsync=off",
            "start",
        )
        yield (
            f"host={base} port={PG_PORT + 1} user=postgres "
            f"dbname=postgres password=s3cret-scram"
        )
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-m", "immediate", "stop"],
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def test_scram_auth_live_roundtrip(scram_pg_dsn):
    """minipg authenticates against a SCRAM-only pg_hba.conf (no trust
    fallback anywhere) and runs a full create/insert/select round trip
    over both the simple and extended protocols."""
    t = f"scram_t_{uuid.uuid4().hex[:8]}"
    conn = minipg.connect(scram_pg_dsn)
    try:
        with conn.cursor() as cur:
            cur.execute(f"CREATE TABLE {t} (id int PRIMARY KEY, v text)")
            cur.execute(f"INSERT INTO {t} VALUES (%s, %s)", (1, "scram'd"))
            cur.execute(f"SELECT id, v FROM {t} ORDER BY id")
            assert cur.fetchall() == [(1, "scram'd")]
        conn.commit()
    finally:
        conn.close()


def test_scram_auth_live_wrong_password_refused(scram_pg_dsn):
    """A wrong password must fail with the server's auth error, not
    hang or mis-handshake."""
    bad = scram_pg_dsn.replace("password=s3cret-scram", "password=wrong")
    with pytest.raises(minipg.MiniPgError):
        minipg.connect(bad)
