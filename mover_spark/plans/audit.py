"""Physical-plan audit: machine-checkable scale-quality signals.

The reference has no planner at all (SURVEY.md §4 — it is a straight-line
interpreter); in a Catalyst engine the plan IS the performance contract, so
these helpers turn `explain("formatted")` output into assertable facts:

- did the filters reach the parquet scan (``PushedFilters``)?
- did column pruning reach the scan (``ReadSchema`` width)?
- did the small side broadcast (``BroadcastHashJoin``)?
- how many shuffles (``Exchange``) does the plan pay?

Used by ``tools/explain_audit.py`` for the human report and by
``tests/test_layout.py``-style plan-shape tests for regression gates: a
code change that silently un-broadcasts a dimension or drops pushdown
fails a test, not a production run at 1000× the data.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_plan(df: DataFrame) -> dict:
    """Summarize a DataFrame's physical plan into countable facts."""
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b|\(\d+\) Exchange", plan))
        or plan.count("Exchange "),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        "n_scans": plan.count("Scan parquet") + plan.count("FileScan"),
        "pushed_filters": [p for p in pushed if p.strip()],
        "scan_column_counts": [
            len([c for c in s.split(",") if c.strip()]) for s in read_schemas
        ],
        "has_python_eval": "BatchEvalPython" in plan,  # row-at-a-time UDF: red flag
        "plan": plan,
    }
