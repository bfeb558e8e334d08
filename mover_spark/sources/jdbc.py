"""JDBC source/sink: catalog introspection SQL + idempotent bulk upsert.

The reference's load path (S17/S18) is: one transaction, triggers disabled,
per-row ``INSERT ... ON CONFLICT (pk) DO NOTHING``, then sequence resync
(/root/reference/dialect/postgres/postgres.go:64-97,466-523). Spark's JDBC
writer has no ON CONFLICT, so the sink is a ``foreachPartition`` batched
upsert via psycopg2 — one transaction per partition (isolation divergence
from the reference's single global tx: documented, inherent to distributed
writers). No database exists in the test environment, so everything network
is import/connection-gated; SQL generation is unit-tested.

Catalog introspection uses information_schema/pg_catalog queries equivalent
to postgres.go:100-403, fetched through ONE spark.read.jdbc round per query
instead of the reference's per-table fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- introspection SQL (pg_catalog; postgres.go:334-403 equivalents) -------

LIST_TABLES_SQL = (
    "SELECT c.relname AS table_name FROM pg_catalog.pg_class c "
    "JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace "
    "WHERE c.relkind = 'r' AND n.nspname = '{schema}'"
)

#: columns + types + nullability + ordinal position (postgres.go:243-302);
#: information_schema instead of regex-parsing pg_get_constraintdef
LIST_COLUMNS_SQL = (
    "SELECT table_name, column_name, data_type, is_nullable = 'YES' AS nullable, "
    "ordinal_position AS position FROM information_schema.columns "
    "WHERE table_schema = '{schema}'"
)

#: primary keys (postgres.go:200-240)
LIST_PRIMARY_KEYS_SQL = (
    "SELECT tc.table_name, kcu.column_name "
    "FROM information_schema.table_constraints tc "
    "JOIN information_schema.key_column_usage kcu "
    "ON tc.constraint_name = kcu.constraint_name "
    "AND tc.table_schema = kcu.table_schema "
    "WHERE tc.constraint_type = 'PRIMARY KEY' AND tc.table_schema = '{schema}'"
)

#: foreign keys — structured catalog instead of the reference's regex parse
#: of constraint definitions (postgres.go:18,137-176)
LIST_FOREIGN_KEYS_SQL = (
    "SELECT tc.constraint_name AS name, tc.table_name, kcu.column_name, "
    "ccu.table_name AS ref_table, ccu.column_name AS ref_column "
    "FROM information_schema.table_constraints tc "
    "JOIN information_schema.key_column_usage kcu "
    "ON tc.constraint_name = kcu.constraint_name AND tc.table_schema = kcu.table_schema "
    "JOIN information_schema.constraint_column_usage ccu "
    "ON ccu.constraint_name = tc.constraint_name AND ccu.table_schema = tc.table_schema "
    "WHERE tc.constraint_type = 'FOREIGN KEY' AND tc.table_schema = '{schema}'"
)
# reverse FKs (postgres.go:100-134) are DERIVED by inverting the FK edges —
# no extra query (catalog.Catalog does the inversion).


def read_seed_query(spark: SparkSession, url: str, query: str, props: dict) -> DataFrame:
    """S1 over JDBC: push the whole seed query to the source DB —
    the exact analogue of Dialect.ResultSet (postgres.go:43-60)."""
    return spark.read.jdbc(url, f"({query}) seed_q", properties=props)


# --- upsert sink ------------------------------------------------------------

def disable_triggers_sql(table: str) -> str:
    """postgres.go:483-490."""
    return f'ALTER TABLE "{table}" DISABLE TRIGGER ALL'


def enable_triggers_sql(table: str) -> str:
    """postgres.go:492-497."""
    return f'ALTER TABLE "{table}" ENABLE TRIGGER ALL'


def _pk_list(pk) -> list[str]:
    return [pk] if isinstance(pk, str) else list(pk)


def upsert_sql(table: str, columns: list[str], pk) -> str:
    """INSERT ... ON CONFLICT (pk...) DO NOTHING (postgres.go:466-481);
    psycopg2.extras.execute_values-compatible VALUES placeholder. `pk` is a
    column name or a composite-key list — the conflict target must name the
    FULL unique key or Postgres won't match the constraint."""
    collist = ", ".join(f'"{c}"' for c in columns)
    pklist = ", ".join(f'"{c}"' for c in _pk_list(pk))
    return (
        f'INSERT INTO "{table}" ({collist}) VALUES %s '
        f'ON CONFLICT ({pklist}) DO NOTHING'
    )


def upsert_update_sql(table: str, columns: list[str], pk) -> str:
    """Last-write-wins flavor the reference lacks: ON CONFLICT DO UPDATE
    SET every non-key column from EXCLUDED — a true merge for refresh-style
    loads (the reference can only ignore conflicting rows). When the table
    has no non-key columns there is nothing to SET — fall back to DO NOTHING
    (an empty SET list is a Postgres syntax error)."""
    pks = _pk_list(pk)
    sets = ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in columns if c not in pks)
    if not sets:
        return upsert_sql(table, columns, pk)
    collist = ", ".join(f'"{c}"' for c in columns)
    pklist = ", ".join(f'"{c}"' for c in pks)
    return (
        f'INSERT INTO "{table}" ({collist}) VALUES %s '
        f'ON CONFLICT ({pklist}) DO UPDATE SET {sets}'
    )


def insert_sql(table: str, columns: list[str]) -> str:
    """Plain INSERT for tables whose PK is not backed by a unique
    constraint (catalog pk_unique=False): ON CONFLICT can never fire
    without a constraint, and naming one is an error."""
    collist = ", ".join(f'"{c}"' for c in columns)
    return f'INSERT INTO "{table}" ({collist}) VALUES %s'


def reset_sequence_sql(table: str, pk: str = "id") -> list[str]:
    """Sequence resync, assuming {table}_id_seq naming (postgres.go:499-523)."""
    seq = f"{table}_id_seq"
    return [
        f"SELECT setval('{seq}', GREATEST((SELECT COALESCE(MAX(\"{pk}\"), 0) + 1 "
        f"FROM \"{table}\"), nextval('{seq}')), false)"
    ]


def upsert_partition_writer(
    dsn: str,
    table: str,
    columns: list[str],
    pk,
    batch: int = 1000,
    on_conflict: str = "nothing",
    pk_unique: bool = True,
):
    """Returns a foreachPartition callback performing the batched upsert.
    One tx per partition. Import-gated: raises a clear error without
    psycopg2 (not installed in this environment)."""
    if not pk_unique:
        sql = insert_sql(table, columns)
    elif on_conflict == "update":
        sql = upsert_update_sql(table, columns, pk)
    else:
        sql = upsert_sql(table, columns, pk)

    def write(rows):
        try:
            import psycopg2
            from psycopg2.extras import execute_values
        except ImportError as exc:  # pragma: no cover - env has no driver
            raise RuntimeError(
                "JDBC/postgres upsert sink requires psycopg2 on executors"
            ) from exc
        conn = psycopg2.connect(dsn)
        try:
            with conn.cursor() as cur:
                buf = []
                for row in rows:
                    buf.append(tuple(row[c] for c in columns))
                    if len(buf) >= batch:
                        execute_values(cur, sql, buf)
                        buf.clear()
                if buf:
                    execute_values(cur, sql, buf)
            conn.commit()
        finally:
            conn.close()

    return write


def _psycopg2_connect(dsn: str):
    try:
        import psycopg2
    except ImportError as exc:  # pragma: no cover - env has no driver
        raise RuntimeError(
            "JDBC/postgres load path requires psycopg2 on the driver"
        ) from exc
    return psycopg2.connect(dsn)


def bulk_upsert(
    df: DataFrame,
    dsn: str,
    table: str,
    pk,
    connection_factory=None,
    partition_writer=None,
    on_conflict: str = "nothing",
    pk_unique: bool = True,
) -> None:
    """S17+S18: distributed idempotent load with the reference's bracket
    (postgres.go:64-97): triggers disabled before the insert, re-enabled
    after, then sequence resync (postgres.go:499-523). The reference does all
    of it in ONE transaction; a distributed writer cannot, so the toggles are
    driver-side statements committed around the job (documented isolation
    divergence). Triggers are re-enabled even if the distributed write fails.

    `connection_factory(dsn)` defaults to psycopg2.connect; tests inject a
    stub to assert the exact statement sequence (no DB in this environment).
    `partition_writer` is injectable for the same reason."""
    pks = _pk_list(pk)
    connect = connection_factory or _psycopg2_connect
    make_writer = partition_writer or (
        lambda d, t, cols, key: upsert_partition_writer(
            d, t, cols, key, on_conflict=on_conflict, pk_unique=pk_unique
        )
    )
    conn = connect(dsn)
    try:
        with conn.cursor() as cur:
            cur.execute(disable_triggers_sql(table))
        conn.commit()
        try:
            df.foreachPartition(make_writer(dsn, table, df.columns, pks))
        finally:
            with conn.cursor() as cur:
                cur.execute(enable_triggers_sql(table))
            conn.commit()
        with conn.cursor() as cur:
            for stmt in reset_sequence_sql(table, pks[0]):
                cur.execute(stmt)
        conn.commit()
    finally:
        conn.close()
