"""Materialize a larger-SF parquet fixture set by key-shifted replication
of sf0.1 — the full-suite decade-up bench input (vs scale_probe.py, which
times a handful of flagship operators on in-memory replicas).

Same replication discipline as scale_probe: each replica gets its own id
range so CARDINALITIES scale with volume (no synthetic hot keys), document
text is perturbed per replica so replicas are not near-dups of each other,
and embedding vectors are nudged into distinct points. FK consistency is
preserved where the suite joins on it (l_orderkey->o_orderkey,
o_custkey->c_custkey share one shift; part/supplier replicate standalone —
replica lineitem rows keep base part/supp keys, which only grows the
per-part fan-out the way a fixed part:lineitem ratio would).

Usage:  python tools/make_sf.py [factor] [out_dir]
        # default: 10  ->  <repo>/.bench/sf1  (gitignored)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mover_spark.catalog import Catalog
from mover_spark.session import get_spark
from tools.scale_probe import _perturb_text, _replicate

from pyspark.sql import functions as F

BASE_SF_DIR = "/root/testdata/sf0.1"

#: id columns to shift per table (shared mult => FK edges stay aligned)
SHIFTS = {
    "lineitem": {"l_orderkey": 1},
    "orders": {"o_orderkey": 1, "o_custkey": 2},
    "customer": {"c_custkey": 2},
    "supplier": {"s_suppkey": 3},
    "part": {"p_partkey": 4},
    "events": {"event_id": 1, "user_id": 2},  # user_id shares c_custkey's shift
    "documents": {"doc_id": 1},
    "embeddings": {"vec_id": 1},
}
COPY_AS_IS = ("region", "nation")  # fixed-size dims at every TPC-H SF


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(repo, ".bench", f"sf{factor / 10:g}")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-sf")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, BASE_SF_DIR)

    t0 = time.time()
    for name in COPY_AS_IS:
        cat.df(name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, shifts in SHIFTS.items():
        base = cat.df(name)
        if factor > 1:
            # parallelize the explode: each base fixture is ONE small
            # parquet file -> one input partition, so without this the
            # xfactor explode (and the map side feeding the repartition
            # below) runs on a single core for the whole replicated table
            # (measured: sf100 lineitem pinned one core for 17+ min)
            base = base.repartition(32)
        df = _replicate(base, factor, shifts)
        if factor > 1:
            if name == "documents":
                df = _perturb_text(df)
            elif name == "embeddings":
                df = df.withColumn(
                    "embedding",
                    # cast back: the perturbation arithmetic widens float
                    # elements to double, and a replica file with
                    # array<double> breaks every reader that binds the
                    # base fixture's array<float> schema explicitly
                    # (streaming sources must declare their schema)
                    F.transform(
                        "embedding",
                        lambda x, i: x
                        + (F.col("__rep") % 7).cast("float") * 0.001 * (i % 3),
                    ).cast("array<float>"),
                )
            df = df.repartition(32).drop("__rep")
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        n = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet")).count()
        print(f"  {name}: {n} rows")
    print(f"wrote {out_dir} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
