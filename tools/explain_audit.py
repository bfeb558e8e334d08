"""Physical-plan audit: prints formatted plans for headline queries and
flags scale anti-patterns (missing filter pushdown, un-pruned columns,
non-broadcast dim joins, codegen gaps).

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mover_spark.session import get_spark

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_volume_shipping",
    "q13_cust_order_dist",
    "seed_query_scan",
    "fk_semijoin",
    "events_tumbling",
    "dedup_minhash_lsh",
    "topk_window",
    "skew_salted_join",
    "word_freq_topk",
    "ann_topk_ivf",
    "bloom_prefilter_join",
    "user_value_trend",
    "numeric_strict",
    "repetition_stats",
    "quota_sample_per_source",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    names = sys.argv[1:] or AUDIT
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = entrymod.queries()
    for name in names:
        plan = plan_of(qs[name](spark, sf_dir))
        flags = []
        if "PushedFilters: []" in plan and "Filter" in plan:
            flags.append("NO-PUSHDOWN?")
        if "BroadcastHashJoin" not in plan and "SortMergeJoin" in plan:
            flags.append("SMJ-ONLY")
        # note: AQE formatted plans don't print WholeStageCodegen spans
        # before execution — don't flag on their absence
        print(f"\n===== {name} {'[' + ' '.join(flags) + ']' if flags else '[ok]'} =====")
        print(plan[:4000])


if __name__ == "__main__":
    main()
