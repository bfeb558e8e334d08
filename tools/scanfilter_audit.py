"""Scan-filter audit: flag queries whose parquet scan DataFilters carry
EXPENSIVE derived expressions (regex / digest / tokenize chains).

The defect class (round 8, found at 62x cost in dedup_normalized): a
filter written against a PROJECTED expression gets pushed below the
projection into the scan's data filter with the derivation inlined —
re-evaluated per scanned row in interpreted mode, outside whole-stage
codegen, and then computed AGAIN in the projection above. Filters should
test source columns (e.g. `text IS NOT NULL`, `instr(trim(text),' ')>0`)
whenever a cheap equivalent of the derived predicate exists.

A FLAG is a CANDIDATE for the dedup_normalized treatment, not an
automatic defect — A/B before rewriting. Known residual classes:
- isnotnull(md5/xxhash64/...) inferred by Catalyst from join keys that
  ARE derived expressions (digest anti-joins, salted joins), and
  constraints inferred back through derived join keys generally — one
  extra expression eval per scanned row, not removable without
  excluding InferFiltersFromConstraints globally; usually cheap, and
  sometimes a net WIN (the pushed filter shrinks a downstream explode).
- Semantically-derived gates (quality-score thresholds) where no
  source-column equivalent exists: the scan evaluation IS the filter.

Usage: python tools/scanfilter_audit.py [query ...]   (default: all)
Informational: always exits 0; read the flags with the classes above.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = re.compile(
    r"regexp_replace|regexp_extract|md5|xxhash64|sha2|split\(", re.I
)
#: inferred-join-key hash null checks: cheap, Catalyst-generated
ACCEPT = re.compile(r"^(NOT .*? IN \([^)]*\)(, )?)?isnotnull\((md5|cast\(pmod\(xxhash64)")


def main() -> int:
    from mover_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("scanfilter-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(e.queries())
    qs = e.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    bad = 0
    for name in names:
        try:
            plan = (
                qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:
            print(f"SKIP {name}: {type(exc).__name__}: {exc}")
            continue
        for m in re.finditer(r"DataFilters: \[(.*?)\]", plan, re.S):
            body = " ".join(m.group(1).split())
            if not EXPENSIVE.search(body):
                continue
            if ACCEPT.match(body):
                print(f"INFO {name}: accepted inferred hash check")
            else:
                bad += 1
                print(f"FLAG {name}: {body[:200]}")
    print(f"{bad} non-accepted expensive scan filters")
    return 0


if __name__ == "__main__":
    sys.exit(main())
