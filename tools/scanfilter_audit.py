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

#: queries whose flagged gates were individually audited (A/B or decade
#: probe) and accepted — pointer to the evidence, so a future flag on a
#: NEW query stands out while these stay labeled
AUDITED = {
    "curation_pipeline": "semantically-derived quality gate; decade probe 5.3x (BASELINE round 8)",
    "collocation_pmi": "inferred token-count constraint below the explode; the authored filter was rewritten to a source predicate (A/B ~10% warm)",
}


def _nullcheck_only(body: str) -> bool:
    """True when every expensive token sits inside an isnotnull(...) —
    the Catalyst-inferred join-key null check, one cheap eval per row."""
    stripped = body
    # remove isnotnull(...) spans with naive paren balancing
    out = []
    i = 0
    while i < len(stripped):
        j = stripped.find("isnotnull(", i)
        if j < 0:
            out.append(stripped[i:])
            break
        out.append(stripped[i:j])
        depth = 0
        k = j + len("isnotnull(") - 1
        while k < len(stripped):
            if stripped[k] == "(":
                depth += 1
            elif stripped[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        i = k + 1
    return not EXPENSIVE.search("".join(out))


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
            if _nullcheck_only(body):
                print(f"INFO {name}: inferred null-check on a derived key")
            elif name in AUDITED:
                print(f"INFO {name}: audited — {AUDITED[name]}")
            else:
                bad += 1
                print(f"FLAG {name}: {body[:200]}")
    print(f"{bad} non-accepted expensive scan filters")
    return 0


if __name__ == "__main__":
    sys.exit(main())
