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
from mover_spark.plans import audit_plan
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
    "q15_top_supplier",
    "cdc_latest_snapshot",
    "rollup_daily_from_hourly",
    "dedup_normalized",
    "tfidf_top_terms",
    "outlier_events",
    "weighted_sample_docs",
    "collocation_pmi",
    "dedup_incremental",
    "ann_topk_pq",
    "containment_pairs",
    "unigram_xent",
    "doc_novelty",
    "substring_dedup_stats",
    "q9_nation_year_profit",
    "q11_part_value_share",
    "q16_part_supplier_counts",
    "q20_excess_shippers",
    "q22_idle_rich_by_nation",
    "ntile_percent_rank",
    "asof_forward_tolerance",
    "dedup_keep_canonical",
    "interval_overlap_join",
    "cohort_retention",
    "profile_orders",
    "cdc_apply_changes",
    "stratified_sample_exact",
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
        df = qs[name](spark, sf_dir)
        a = audit_plan(df)
        plan = a["plan"]
        flags = []
        if "PushedFilters: []" in plan and "Filter" in plan:
            flags.append("NO-PUSHDOWN?")
        if a["n_broadcast_joins"] == 0 and a["n_sortmerge_joins"] > 0:
            # static SMJ is often a stats gap (e.g. a join input derived
            # from an iterative/checkpointed computation Catalyst can't
            # size); AQE converts to broadcast at runtime once it sees the
            # actual bytes — execute and inspect the FINAL adaptive plan
            # before flagging
            # NB: must be collect() (executes THIS df's QueryExecution, to
            # which the final adaptive plan attaches) — a noop write or
            # count() plans a different query and leaves df's plan unrun
            try:
                df.collect()
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain()
                if "BroadcastHashJoin" in buf.getvalue():
                    flags.append("ok-aqe-bhj")
                else:
                    flags.append("SMJ-ONLY")
            except Exception:
                flags.append("SMJ-ONLY")
        if a["has_python_eval"]:
            flags.append("ROW-PYTHON-UDF")
        # note: AQE formatted plans don't print WholeStageCodegen spans
        # before execution — don't flag on their absence
        stats = (f"exch={a['n_exchanges']} bhj={a['n_broadcast_joins']} "
                 f"smj={a['n_sortmerge_joins']} scans={a['n_scans']}")
        print(f"\n===== {name} {'[' + ' '.join(flags) + ']' if flags else '[ok]'} ({stats}) =====")
        print(plan[:4000])


if __name__ == "__main__":
    main()
