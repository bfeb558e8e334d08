"""Catalog: tables, columns, PKs, FKs, reverse FKs ("reference keys").

Mirrors the reference's introspected-metadata model
(/root/reference/dialect/dialect.go:23-107): a ``Table`` carries primary keys,
foreign keys, and the *derived* reverse-FK edge list. The reference introspects
PostgreSQL's pg_catalog (/root/reference/dialect/postgres/postgres.go:334-403);
Spark's catalog has no key metadata, so file-backed fixtures get their key
graph from a JSON sidecar (same shape as FIXTURES.md) while the parquet footer
supplies column names/types/order.

Unlike the reference — which only ever uses PrimaryKeys[0]
(dialect/dialect.go:32-34, composite PKs unsupported) — ``Table.primary_keys``
is a real list and the closure/dedup code handles composites (lineitem).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Strict-mode decimal type for `numeric` columns (SURVEY §1.2): the
#: reference degrades Postgres numeric to float64
#: (dialect/postgres/util.go:177-183); our strict mode keeps exact decimals.
NUMERIC_STRICT_TYPE = "decimal(38,18)"

#: Key graph for the driver fixture tables (FIXTURES.md "Catalog sidecar").
#: "numeric" lists the columns that are `numeric` in the source schema
#: (TPC-H money/rate columns) — doubles in lossy mode, DecimalType in strict.
STAR_SIDECAR: dict = {
    "region": {"pk": ["r_regionkey"], "fks": []},
    "nation": {
        "pk": ["n_nationkey"],
        "fks": [{"cols": ["n_regionkey"], "ref": "region", "ref_cols": ["r_regionkey"]}],
    },
    "customer": {
        "pk": ["c_custkey"],
        "fks": [{"cols": ["c_nationkey"], "ref": "nation", "ref_cols": ["n_nationkey"]}],
        "numeric": ["c_acctbal"],
    },
    "supplier": {
        "pk": ["s_suppkey"],
        "fks": [{"cols": ["s_nationkey"], "ref": "nation", "ref_cols": ["n_nationkey"]}],
        "numeric": ["s_acctbal"],
    },
    "part": {"pk": ["p_partkey"], "fks": [], "numeric": ["p_retailprice"]},
    "orders": {
        "pk": ["o_orderkey"],
        "fks": [{"cols": ["o_custkey"], "ref": "customer", "ref_cols": ["c_custkey"]}],
        "numeric": ["o_totalprice"],
    },
    "lineitem": {
        # the fixture's (l_orderkey, l_linenumber) is NOT unique — flag it so
        # the closure engine never dedups/filters lineitem rows by PK
        "pk": ["l_orderkey", "l_linenumber"],
        "pk_unique": False,
        "fks": [
            {"cols": ["l_orderkey"], "ref": "orders", "ref_cols": ["o_orderkey"]},
            {"cols": ["l_partkey"], "ref": "part", "ref_cols": ["p_partkey"]},
            {"cols": ["l_suppkey"], "ref": "supplier", "ref_cols": ["s_suppkey"]},
        ],
        "numeric": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    },
    "events": {"pk": ["event_id"], "fks": []},
    "documents": {"pk": ["doc_id"], "fks": []},
    "embeddings": {"pk": ["vec_id"], "fks": []},
}


def _footer_schema(path: str):
    """Parquet footer schema for a file OR directory table (directory:
    probe the first part file — one footer describes them all)."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        parts = sorted(
            p
            for p in _glob.glob(_os.path.join(path, "*"))
            if _os.path.isfile(p) and not _os.path.basename(p).startswith(("_", "."))
        )
        if not parts:
            raise FileNotFoundError(path)
        path = parts[0]
    return pq.read_schema(path)


def parquet_ts_unit(path_or_glob: str, col: str) -> str:
    """Time unit ('ns'/'us'/...) of a timestamp column, from the parquet
    footer. THE one probe shared by the batch reader (read_table) and the
    streaming sources — two diverging copies of this rule would let batch
    and stream disagree on the unit and silently break their parity. An
    int64 physical column is reported as 'ns' (the legacy nanosAsLong
    rendering of TIMESTAMP(NANOS) fixtures); unknown/missing -> 'us'."""
    import glob as _glob

    for path in sorted(_glob.glob(path_or_glob)):
        try:
            field = _footer_schema(path).field(col)
        except Exception:
            continue
        if pa.types.is_timestamp(field.type):
            return field.type.unit
        if pa.types.is_int64(field.type):
            return "ns"  # int64 physical column => legacy nanos fixture
        # any other physical type (int32/date/string) is NOT epoch-nanos:
        # reporting 'ns' here would shift timestamps by orders of magnitude
        return "us"
    return "us"


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, normalizing nanosecond timestamps.

    Spark cannot scan INT64 TIMESTAMP(NANOS) parquet columns natively; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they surface as LongType. We
    detect ns-timestamp columns from the parquet footer (pyarrow) and convert
    via integer division to microseconds — matching DuckDB's ns->us
    truncation so oracle comparisons agree. Integer ``div`` (not float) —
    epoch-nanos exceed double's 53-bit mantissa.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    try:
        footer = _footer_schema(path)
    except Exception:
        return df
    for field in footer:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            if dict(df.dtypes).get(field.name) == "bigint":
                # NTZ to match the µs-precision tables Spark reads natively
                # backtick-quote: a column name with a space/dot/hyphen
                # would otherwise break the expr parse
                q = "`" + field.name.replace("`", "``") + "`"
                df = df.withColumn(
                    field.name,
                    F.expr(f"timestamp_micros({q} div 1000)").cast("timestamp_ntz"),
                )
    return df


@dataclass
class ForeignKey:
    """Edge table.cols -> ref_table.ref_cols (dialect/dialect.go:76-83)."""

    name: str
    table: str
    cols: list[str]
    ref_table: str
    ref_cols: list[str]


@dataclass
class ReferenceKey:
    """Reverse FK: which table points at me (dialect/dialect.go:94-99)."""

    name: str
    child_table: str
    child_cols: list[str]
    parent_cols: list[str]


@dataclass
class Table:
    name: str
    primary_keys: list[str]
    foreign_keys: list[ForeignKey] = field(default_factory=list)
    reference_keys: list[ReferenceKey] = field(default_factory=list)
    # (name, data_type, nullable) in ordinal order — dialect/dialect.go:55-61
    columns: list[tuple[str, str, bool]] = field(default_factory=list)
    #: False when the declared PK does not uniquely identify rows (the
    #: reference blindly assumes it does, dialect/dialect.go:32-34)
    pk_unique: bool = True

    @property
    def primary_key(self) -> str:
        """Mover-parity accessor: first PK column (dialect/dialect.go:32-34)."""
        return self.primary_keys[0]


class Catalog:
    """Parquet-fixture catalog: one DataFrame + key metadata per table.

    Registers every table as a temp view so seed queries run via
    ``spark.sql`` — the Spark-side equivalent of the reference delegating
    seed SQL to PostgreSQL (etl/extractor.go:158).
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        sidecar: dict | None = None,
        numeric_mode: str = "lossy",
        register_views: bool = True,
    ):
        """`numeric_mode`: "lossy" keeps the reference's numeric->float64
        degradation (dialect/postgres/util.go:177-183); "strict" surfaces the
        sidecar's `numeric` columns as DecimalType(38,18). The strict cast
        goes through the double's shortest decimal rendering (Spark's
        double->decimal semantics), i.e. it recovers the decimal the double
        was displaying — matching CAST(CAST(x AS VARCHAR) AS DECIMAL) in
        DuckDB, NOT the binary expansion of the double."""
        if numeric_mode not in ("lossy", "strict"):
            raise ValueError(f"numeric_mode must be lossy|strict, got {numeric_mode!r}")
        self.spark = spark
        self.sf_dir = sf_dir
        self.numeric_mode = numeric_mode
        self.tables: dict[str, Table] = {}
        self._dfs: dict[str, DataFrame] = {}
        sidecar = sidecar if sidecar is not None else STAR_SIDECAR

        names = []
        for fname in sorted(os.listdir(sf_dir)):
            if fname.endswith(".parquet"):
                names.append(fname[: -len(".parquet")])

        for name in names:
            df = read_table(spark, os.path.join(sf_dir, f"{name}.parquet"))
            if numeric_mode == "strict":
                for col in sidecar.get(name, {}).get("numeric", []):
                    if col in df.columns:
                        df = df.withColumn(col, F.col(col).cast(NUMERIC_STRICT_TYPE))
            self._dfs[name] = df
            meta = sidecar.get(name, {})
            fks = [
                ForeignKey(
                    name=f"{name}_fk_{'_'.join(fk['cols'])}",
                    table=name,
                    cols=list(fk["cols"]),
                    ref_table=fk["ref"],
                    ref_cols=list(fk["ref_cols"]),
                )
                for fk in meta.get("fks", [])
            ]
            self.tables[name] = Table(
                name=name,
                primary_keys=list(meta.get("pk", [])) or [df.columns[0]],
                foreign_keys=fks,
                columns=[(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields],
                pk_unique=bool(meta.get("pk_unique", True)),
            )

        # Derive reverse FKs by inverting the edge list — replaces the
        # reference's extra pg_constraint query (postgres.go:100-134).
        for t in self.tables.values():
            for fk in t.foreign_keys:
                if fk.ref_table in self.tables:
                    self.tables[fk.ref_table].reference_keys.append(
                        ReferenceKey(
                            name=fk.name,
                            child_table=fk.table,
                            child_cols=fk.cols,
                            parent_cols=fk.ref_cols,
                        )
                    )

        # register_views=False lets a second catalog (e.g. a strict-numeric
        # one) coexist without clobbering the session's temp views
        if register_views:
            for name, df in self._dfs.items():
                df.createOrReplaceTempView(name)

    @classmethod
    def from_sidecar_file(cls, spark: SparkSession, sf_dir: str, path: str) -> "Catalog":
        with open(path) as f:
            return cls(spark, sf_dir, sidecar=json.load(f))

    def df(self, name: str) -> DataFrame:
        return self._dfs[name]

    def table(self, name: str) -> Table:
        return self.tables[name]

    def describe(self, name: str) -> list[dict]:
        """One dict per column — the `describe` action (etl/engine.go:89-96)."""
        t = self.tables[name]
        # pairwise col -> (fk, matching ref_col): a composite FK's second
        # column must report its OWN referenced column, not ref_cols[0]
        fk_by_col = {
            c: (fk, rc)
            for fk in t.foreign_keys
            for c, rc in zip(fk.cols, fk.ref_cols)
        }
        out = []
        for pos, (col, dtype, nullable) in enumerate(t.columns, start=1):
            fk, fk_ref_col = fk_by_col.get(col, (None, None))
            out.append(
                {
                    "table_name": name,
                    "column_name": col,
                    "data_type": dtype,
                    "nullable": nullable,
                    "position": pos,
                    "is_primary_key": col in t.primary_keys,
                    "fk_ref": f"{fk.ref_table}.{fk_ref_col}" if fk else None,
                }
            )
        return out

    def describe_df(self, names: list[str] | None = None) -> DataFrame:
        """Catalog as a DataFrame (S19-S24 equivalent, one pass, no per-table
        round trips unlike postgres.go:334-403)."""
        rows = []
        for name in sorted(names or self.tables):
            rows.extend(self.describe(name))
        from pyspark.sql.types import (
            BooleanType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("table_name", StringType(), False),
                StructField("column_name", StringType(), False),
                StructField("data_type", StringType(), False),
                StructField("nullable", BooleanType(), False),
                StructField("position", IntegerType(), False),
                StructField("is_primary_key", BooleanType(), False),
                StructField("fk_ref", StringType(), True),
            ]
        )
        return self.spark.createDataFrame(rows, schema=schema)
