"""Stage-level wall-clock profile of containment_lsh at a bench fixture —
dev tool for the scheme-economics work (round-10 verdict item 1). Forces
each stage with a count() in dependency order so later stages reuse the
memoized/persisted earlier ones, mirroring the operator's own flow.

Usage: python tools/contain_profile.py [sf_dir] [threshold]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mover_spark.catalog import Catalog  # noqa: E402
from mover_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf10"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95

    from mover_spark.operators import dedup as D

    spark = get_spark("contain_profile")
    docs = Catalog(spark, sf_dir).df("documents")

    t0 = time.time()
    reps, members = D._containment_reps(docs)
    n_reps = reps.count()
    t_reps = time.time() - t0
    print(f"reps: {n_reps} rows in {t_reps:.1f}s", flush=True)

    schemes = D._containment_band_schemes(
        threshold, 2.0 ** 0.5, 5e-3, D.N_CONTAIN_MINHASH,
        max_class=D.contain_band_boundary(threshold),
    )
    n_slots = max(r * nb for r, (nb, _) in schemes.items())
    print(f"schemes: { {r: (nb, ks) for r, (nb, ks) in schemes.items()} } "
          f"slots={n_slots}", flush=True)

    t0 = time.time()
    sig = D._containment_signatures(docs, n_slots=n_slots)
    sig.count()
    t_sig = time.time() - t0
    print(f"signatures({n_slots} slots): {t_sig:.1f}s", flush=True)

    t0 = time.time()
    out = D.containment_lsh(docs, threshold=threshold)
    n_out = out.count()
    t_full = time.time() - t0
    print(f"rest-of-operator (bands+deep+verify+expand): {t_full:.1f}s "
          f"-> {n_out} pairs", flush=True)
    print(f"TOTAL {t_reps + t_sig + t_full:.1f}s  "
          f"(reps {t_reps:.1f} / sig {t_sig:.1f} / rest {t_full:.1f})")


if __name__ == "__main__":
    main()
