"""Local mimic of the driver's t2 correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at the same sf dir, compare
row count + sorted column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from mover_spark import TABLES
from mover_spark.session import get_spark


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full-precision shortest round-trip repr (17 significant digits
        # when needed): a 9-digit format hid a real 1e-11-relative value
        # divergence for two rounds — never truncate here
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash_rows(rows: list[dict], cols: list[str]) -> str:
    lines = sorted("|".join(_norm(r[c]) for c in cols) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sorted(sdf.columns)
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):7d} (rows-only check) {spark_sec:5.1f}s")
            continue
        rel = con.sql(oracles[name])
        ocols_raw = list(rel.columns)
        otypes = [str(t).upper() for t in rel.types]
        orows = [dict(zip(ocols_raw, row)) for row in rel.fetchall()]
        ocols = sorted(ocols_raw)
        # normalization-fragile output types: engines disagree on how these
        # RENDER even when values are identical (decimal trailing zeros,
        # HUGEINT fetched as float by pandas-style paths). Every output
        # column must be string/bigint/double/date/bool — fail otherwise.
        # - decimal/hugeint: engines disagree on RENDERING identical values
        # - array/map/struct: the DRIVER's canonicalizer (unlike _norm
        #   above) sorts rows with pandas, where ArrayType arrives as
        #   numpy arrays -> unhashable TypeError; array_funcs was
        #   driver-red on exactly this for 11 rounds while this mimic's
        #   list-handling masked it. Nested output must be stringified
        #   (concat_ws/to_json) at the query's final select.
        fragile = [
            f"{c}:{t}"
            for c, t in zip(ocols_raw, otypes)
            if t.startswith("DECIMAL") or "HUGEINT" in t
            or "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))
        ] + [
            f"spark.{c}:{t}"
            for c, t in sdf.dtypes
            if t.startswith(("decimal", "array", "map", "struct"))
        ]
        ok_count = len(srows) == len(orows)
        ok_schema = scols == ocols
        ok_hash = ok_schema and _hash_rows(srows, scols) == _hash_rows(orows, ocols)
        status = "OK" if (ok_count and ok_schema and ok_hash and not fragile) else "FAIL"
        print(
            f"  {name:28s} rows={len(srows):7d}/{len(orows):7d} "
            f"schema={'=' if ok_schema else 'X'} hash={'=' if ok_hash else 'X'} "
            f"{spark_sec:5.1f}s {status}"
        )
        if status == "FAIL":
            failures.append(name)
            if fragile:
                print(f"    fragile output types: {fragile}")
            if not ok_schema:
                print(f"    spark cols: {scols}\n    duck  cols: {ocols}")
            elif not ok_hash and srows and orows:
                sset = {"|".join(_norm(r[c]) for c in scols) for r in srows}
                oset = {"|".join(_norm(r[c]) for c in ocols) for r in orows}
                for x in sorted(sset - oset)[:3]:
                    print(f"    spark-only: {x[:160]}")
                for x in sorted(oset - sset)[:3]:
                    print(f"    duck-only:  {x[:160]}")
    print(f"\n{'PASS' if not failures else 'FAIL: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
