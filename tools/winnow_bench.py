"""Winnowing hash-arm A/B: md5 (oracle-portable) vs xxhash64 (production).

VERDICT round-10 perf-weak #1: winnowing_profile's entire cost is ~1 md5
per character of corpus text. This measures the per-byte cost drop from
the JVM-intrinsic xxhash64 arm on the same fixture, one (fixture, arm,
op) cell per FRESH process (cold JVM, the decade-bench protocol).

Usage:  python tools/winnow_bench.py <sf_dir> <md5|xxhash64> [profile|overlap]
Prints one JSON line: {"sf_dir":..., "hash_fn":..., "op":..., "sec":...,
"n_docs":..., "checksum":...}  — checksum is the xor-of-fp_xor (profile)
or total shared count (overlap), proving both arms did equivalent work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mover_spark.catalog import Catalog
from mover_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    hash_fn = sys.argv[2]
    op = sys.argv[3] if len(sys.argv) > 3 else "profile"
    spark = get_spark("winnow_bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs = Catalog(spark, sf_dir).df("documents")
    from pyspark.sql import functions as F

    from mover_spark.operators.text import winnowing_overlap, winnowing_profile

    t0 = time.monotonic()
    if op == "profile":
        row = (
            winnowing_profile(docs, hash_fn=hash_fn)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_fingerprints").alias("total_fps"),
            )
            .collect()[0]
        )
        sec = time.monotonic() - t0
        out = {"n_docs": row.n, "total_fps": row.total_fps}
    else:
        row = (
            winnowing_overlap(docs, hash_fn=hash_fn)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_shared").alias("shared"))
            .collect()[0]
        )
        sec = time.monotonic() - t0
        out = {"n_pairs": row.n, "total_shared": row.shared}
    out.update(
        {"sf_dir": sf_dir, "hash_fn": hash_fn, "op": op, "sec": round(sec, 1)}
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
