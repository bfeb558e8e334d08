"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship FK-closure extract on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Implementation lives in ``mover_spark/``; this module only wires it to the
driver harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mover_spark.catalog import Catalog
from mover_spark.operators.closure import SchemaConfig, closure_summary, extract_closure
from mover_spark.operators.sanitize import ColumnRule, sanitize_df
from mover_spark.session import tune

_CATALOGS: dict[tuple[int, str], Catalog] = {}


def _catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    key = (id(spark), sf_dir)
    if key not in _CATALOGS:
        tune(spark)
        _CATALOGS[key] = Catalog(spark, sf_dir)
    return _CATALOGS[key]


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: FK-closure extract (reference: etl/extractor.go) seeded on
    20 customers, reverse-FK allowlist pulling lineitem -> part/supplier."""
    cat = _catalog(spark, "/root/testdata/sf0.001")
    seed = cat.df("customer").where(F.col("c_custkey") <= 20)
    cfg = {"orders": SchemaConfig("orders", reference_keys=["lineitem_fk_l_orderkey"])}
    out = extract_closure(spark, cat, [("customer", seed)], cfg)
    return closure_summary(out)


# --------------------------------------------------------------------------
# queries — mover-parity operators
# --------------------------------------------------------------------------

def _q_seed_query_scan(spark, sf_dir):
    """S1: arbitrary seed SELECT evaluated by the engine (extractor.go:158
    delegates to PostgreSQL; we delegate to spark.sql over registered views)."""
    _catalog(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
        "FROM orders WHERE o_totalprice > 50000 AND o_orderstatus = 'F'"
    )


def _q_full_scan_extra(spark, sf_dir):
    """S2: `extra` table full scan (etl/engine.go:117-125)."""
    return _catalog(spark, sf_dir).df("nation")


def _q_fk_semijoin(spark, sf_dir):
    """S3: FK dereference as a set-at-a-time semi-join (replaces the
    per-row point lookups of extractor.go:120-123)."""
    cat = _catalog(spark, sf_dir)
    hot = cat.df("orders").where(F.col("o_totalprice") > 100000)
    keys = hot.select(F.col("o_custkey").alias("c_custkey")).dropDuplicates(["c_custkey"])
    return cat.df("customer").join(keys, on=["c_custkey"], how="left_semi")


def _q_reverse_fk_fanout(spark, sf_dir):
    """S4: reverse-FK fan-out (extractor.go:52-68) as a semi-join."""
    cat = _catalog(spark, sf_dir)
    seg = cat.df("customer").where(F.col("c_mktsegment") == "BUILDING")
    keys = seg.select(F.col("c_custkey").alias("o_custkey")).dropDuplicates(["o_custkey"])
    return cat.df("orders").join(keys, on=["o_custkey"], how="left_semi")


def _q_closure_default(spark, sf_dir):
    """S6/S7: default closure — depth-0 reverse fan-out only
    (extractor.go:40-42); per-table row counts."""
    cat = _catalog(spark, sf_dir)
    seed = cat.df("customer").where(F.col("c_custkey") <= 50)
    out = extract_closure(spark, cat, [("customer", seed)])
    return closure_summary(out)


def _q_closure_allowlist(spark, sf_dir):
    """S6: allowlisted reverse FK followed at any depth (extractor.go:44-50)."""
    cat = _catalog(spark, sf_dir)
    seed = cat.df("customer").where(F.col("c_custkey") <= 20)
    cfg = {"orders": SchemaConfig("orders", reference_keys=["lineitem_fk_l_orderkey"])}
    out = extract_closure(spark, cat, [("customer", seed)], cfg)
    return closure_summary(out)


def _q_closure_config_query(spark, sf_dir):
    """S5: templated config sub-query ({attr} substitution,
    extractor.go:70-79), compiled to a semi-join."""
    cat = _catalog(spark, sf_dir)
    seed = cat.df("nation").where(F.col("n_nationkey") < 5)
    cfg = {
        "nation": SchemaConfig(
            "nation",
            omit_reference_keys=True,
            queries=[("supplier", "SELECT * FROM supplier WHERE s_nationkey = {n_nationkey}")],
        ),
        "supplier": SchemaConfig("supplier", omit_reference_keys=True),
    }
    out = extract_closure(spark, cat, [("nation", seed)], cfg)
    return closure_summary(out)


def _q_sanitize_template(spark, sf_dir):
    """S10/S11: NULL-out + template replace compiled to column expressions
    (etl/sanitizer.go:98-104,110-124)."""
    cat = _catalog(spark, sf_dir)
    rules = [
        ColumnRule("c_name", replace="cust-{c_custkey}@example.com"),
        ColumnRule("c_acctbal", sanitize=True),
    ]
    return sanitize_df(cat.df("customer"), rules, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def _q_sanitize_fake_unique(spark, sf_dir):
    """S12/S13: deterministic PK-seeded fake + uniqueness by construction
    (vs the reference's random faker + retry loop, etl/sanitizer.go:66-93)."""
    cat = _catalog(spark, sf_dir)
    rules = [
        ColumnRule("c_name", fake="email", unique=True),
        ColumnRule("c_mktsegment", fake="first_name"),
    ]
    return sanitize_df(cat.df("customer"), rules, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def _q_pk_dedup(spark, sf_dir):
    """S9: PK-dedup of unioned result sets (etl/sanitizer.go:38-64)."""
    cat = _catalog(spark, sf_dir)
    ord_ = cat.df("orders")
    return sanitize_df(ord_.unionByName(ord_), [], ["o_orderkey"])


def _q_describe_catalog(spark, sf_dir):
    """S19-S24: catalog introspection (tables/columns/PKs/FKs/reverse-FKs;
    dialect/postgres/postgres.go:334-403) as one DataFrame."""
    return _catalog(spark, sf_dir).describe_df()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "seed_query_scan": _q_seed_query_scan,
        "full_scan_extra": _q_full_scan_extra,
        "fk_semijoin": _q_fk_semijoin,
        "reverse_fk_fanout": _q_reverse_fk_fanout,
        "closure_default": _q_closure_default,
        "closure_allowlist": _q_closure_allowlist,
        "closure_config_query": _q_closure_config_query,
        "sanitize_template": _q_sanitize_template,
        "sanitize_fake_unique": _q_sanitize_fake_unique,
        "pk_dedup": _q_pk_dedup,
        "describe_catalog": _q_describe_catalog,
    }


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------

_FAKE_FIRST = ["Marie", "Jean", "Luc", "Anna", "Paul", "Claire", "Louis", "Emma"]
_FAKE_LOCAL = ["alex", "sam", "jo", "max", "kim", "lee", "ray", "pat"]


def _duck_list(xs: list[str]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


#: static catalog rows (table, column, type, nullable, pos, is_pk, fk_ref)
_CATALOG_ROWS = [
    ("customer", "c_custkey", "bigint", True, 1, True, None),
    ("customer", "c_name", "string", True, 2, False, None),
    ("customer", "c_nationkey", "int", True, 3, False, "nation.n_nationkey"),
    ("customer", "c_acctbal", "double", True, 4, False, None),
    ("customer", "c_mktsegment", "string", True, 5, False, None),
    ("documents", "doc_id", "bigint", True, 1, True, None),
    ("documents", "text", "string", True, 2, False, None),
    ("documents", "lang", "string", True, 3, False, None),
    ("documents", "source", "string", True, 4, False, None),
    ("documents", "n_chars", "bigint", True, 5, False, None),
    ("embeddings", "vec_id", "bigint", True, 1, True, None),
    ("embeddings", "embedding", "array<float>", True, 2, False, None),
    ("embeddings", "label", "int", True, 3, False, None),
    ("events", "event_id", "bigint", True, 1, True, None),
    ("events", "ts", "timestamp_ntz", True, 2, False, None),
    ("events", "user_id", "bigint", True, 3, False, None),
    ("events", "event_type", "string", True, 4, False, None),
    ("events", "value", "double", True, 5, False, None),
    ("events", "props", "string", True, 6, False, None),
    ("lineitem", "l_orderkey", "bigint", True, 1, True, "orders.o_orderkey"),
    ("lineitem", "l_partkey", "bigint", True, 2, False, "part.p_partkey"),
    ("lineitem", "l_suppkey", "bigint", True, 3, False, "supplier.s_suppkey"),
    ("lineitem", "l_linenumber", "int", True, 4, True, None),
    ("lineitem", "l_quantity", "double", True, 5, False, None),
    ("lineitem", "l_extendedprice", "double", True, 6, False, None),
    ("lineitem", "l_discount", "double", True, 7, False, None),
    ("lineitem", "l_tax", "double", True, 8, False, None),
    ("lineitem", "l_returnflag", "string", True, 9, False, None),
    ("lineitem", "l_linestatus", "string", True, 10, False, None),
    ("lineitem", "l_shipdate", "timestamp_ntz", True, 11, False, None),
    ("nation", "n_nationkey", "int", True, 1, True, None),
    ("nation", "n_name", "string", True, 2, False, None),
    ("nation", "n_regionkey", "int", True, 3, False, "region.r_regionkey"),
    ("orders", "o_orderkey", "bigint", True, 1, True, None),
    ("orders", "o_custkey", "bigint", True, 2, False, "customer.c_custkey"),
    ("orders", "o_orderstatus", "string", True, 3, False, None),
    ("orders", "o_totalprice", "double", True, 4, False, None),
    ("orders", "o_orderdate", "timestamp_ntz", True, 5, False, None),
    ("orders", "o_orderpriority", "string", True, 6, False, None),
    ("part", "p_partkey", "bigint", True, 1, True, None),
    ("part", "p_name", "string", True, 2, False, None),
    ("part", "p_brand", "string", True, 3, False, None),
    ("part", "p_type", "string", True, 4, False, None),
    ("part", "p_size", "int", True, 5, False, None),
    ("part", "p_retailprice", "double", True, 6, False, None),
    ("region", "r_regionkey", "int", True, 1, True, None),
    ("region", "r_name", "string", True, 2, False, None),
    ("supplier", "s_suppkey", "bigint", True, 1, True, None),
    ("supplier", "s_name", "string", True, 2, False, None),
    ("supplier", "s_nationkey", "int", True, 3, False, "nation.n_nationkey"),
    ("supplier", "s_acctbal", "double", True, 4, False, None),
]


def _catalog_values_sql() -> str:
    rows = []
    for t, c, dt, nullable, pos, is_pk, fk in _CATALOG_ROWS:
        fk_lit = f"'{fk}'" if fk else "CAST(NULL AS VARCHAR)"
        rows.append(
            f"('{t}', '{c}', '{dt}', {str(nullable).lower()}, {pos}, "
            f"{str(is_pk).lower()}, {fk_lit})"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(table_name, "
        "column_name, data_type, nullable, position, is_primary_key, fk_ref)"
    )


def oracle_sql() -> dict[str, str]:
    first_names = _duck_list(_FAKE_FIRST)
    locals_ = _duck_list(_FAKE_LOCAL)
    return {
        "seed_query_scan": (
            "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
            "FROM orders WHERE o_totalprice > 50000 AND o_orderstatus = 'F'"
        ),
        "full_scan_extra": "SELECT * FROM nation",
        "fk_semijoin": (
            "SELECT * FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 100000)"
        ),
        "reverse_fk_fanout": (
            "SELECT * FROM orders WHERE o_custkey IN "
            "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
        ),
        "closure_default": (
            "WITH seed AS (SELECT * FROM customer WHERE c_custkey <= 50), "
            "ord AS (SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM seed)), "
            "nat AS (SELECT * FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM seed)), "
            "reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat)) "
            "SELECT * FROM ("
            "SELECT 'customer' AS table_name, count(*) AS row_count FROM seed "
            "UNION ALL SELECT 'nation', count(*) FROM nat "
            "UNION ALL SELECT 'orders', count(*) FROM ord "
            "UNION ALL SELECT 'region', count(*) FROM reg) ORDER BY table_name"
        ),
        "closure_allowlist": (
            "WITH seed AS (SELECT * FROM customer WHERE c_custkey <= 20), "
            "ord AS (SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM seed)), "
            "li AS (SELECT * FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM ord)), "
            "prt AS (SELECT * FROM part WHERE p_partkey IN (SELECT l_partkey FROM li)), "
            "sup AS (SELECT * FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM li)), "
            "nat AS (SELECT * FROM nation WHERE n_nationkey IN "
            "(SELECT c_nationkey FROM seed UNION SELECT s_nationkey FROM sup)), "
            "reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat)) "
            "SELECT * FROM ("
            "SELECT 'customer' AS table_name, count(*) AS row_count FROM seed "
            "UNION ALL SELECT 'lineitem', count(*) FROM li "
            "UNION ALL SELECT 'nation', count(*) FROM nat "
            "UNION ALL SELECT 'orders', count(*) FROM ord "
            "UNION ALL SELECT 'part', count(*) FROM prt "
            "UNION ALL SELECT 'region', count(*) FROM reg "
            "UNION ALL SELECT 'supplier', count(*) FROM sup) ORDER BY table_name"
        ),
        "closure_config_query": (
            "WITH seed AS (SELECT * FROM nation WHERE n_nationkey < 5), "
            "sup AS (SELECT * FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM seed)), "
            "reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM seed)) "
            "SELECT * FROM ("
            "SELECT 'nation' AS table_name, count(*) AS row_count FROM seed "
            "UNION ALL SELECT 'region', count(*) FROM reg "
            "UNION ALL SELECT 'supplier', count(*) FROM sup) ORDER BY table_name"
        ),
        "sanitize_template": (
            "SELECT c_custkey, "
            "'cust-' || CAST(c_custkey AS VARCHAR) || '@example.com' AS c_name, "
            "CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment FROM customer"
        ),
        "sanitize_fake_unique": (
            "SELECT c_custkey, "
            f"list_extract({locals_}, CAST(c_custkey % 8 AS INT) + 1) || '-' || "
            "CAST(c_custkey AS VARCHAR) || '@example.org' AS c_name, "
            f"list_extract({first_names}, CAST(c_custkey % 8 AS INT) + 1) AS c_mktsegment "
            "FROM customer"
        ),
        "pk_dedup": "SELECT * FROM orders",
        "describe_catalog": _catalog_values_sql(),
    }
