"""profile_table: exact/approx twins, plan shape, and identifier safety."""

import pytest
from pyspark.sql import functions as F

from mover_spark.operators.profiling import profile_table


def _by_col(rows):
    return {r["column_name"]: r for r in rows}


def test_exact_and_approx_agree_on_everything_but_distinct(catalog):
    ords = catalog.df("orders")
    exact = _by_col(profile_table(ords, exact=True).collect())
    approx = _by_col(profile_table(ords, exact=False).collect())
    assert set(exact) == set(approx) == set(ords.columns)
    for c in exact:
        e, a = exact[c], approx[c]
        # nulls / min / max / n_rows are exact in BOTH modes
        assert (e["n_rows"], e["n_nulls"], e["min_val"], e["max_val"]) == (
            a["n_rows"], a["n_nulls"], a["min_val"], a["max_val"]
        )
        # HLL++ accuracy contract: within 5x the configured rsd (0.05)
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.25 * e["n_distinct"]
        ), c


def test_approx_plan_has_no_expand(catalog):
    """The whole point of exact=False: one partial/final aggregate pass.
    The exact plan multiplies the scan by N columns through Expand; the
    sketch plan must not."""
    ords = catalog.df("orders")
    exact_plan = profile_table(ords, exact=True)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_table(ords, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the documented cost of exact multi-distinct
    assert "Expand" not in approx_plan


def test_hostile_column_names(spark):
    """Names with spaces, quotes, and SQL metacharacters profile fine —
    column_name is carried as a literal value, never spliced into SQL."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b')--")],
        ["weird col's \"name\"", "x; DROP TABLE t"],
    )
    rows = _by_col(profile_table(df).collect())
    assert set(rows) == {"weird col's \"name\"", "x; DROP TABLE t"}
    r = rows["weird col's \"name\""]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (3, 0, 2)
    assert (r["min_val"], r["max_val"]) == ("1", "2")
    r2 = rows["x; DROP TABLE t"]
    assert (r2["n_nulls"], r2["n_distinct"]) == (1, 2)


def test_profile_column_order_stable(catalog):
    ords = catalog.df("orders")
    got = [r["column_name"] for r in profile_table(ords).collect()]
    assert got == ords.columns


def test_profile_skips_map_columns_and_dotted_names(spark):
    """Defaulted columns skip unorderable maps; a literal dotted name is
    one column, not nested-field syntax."""
    from mover_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, {"a": "b"}, 2.0)], "id long, m map<string,string>, `a.b` double"
    )
    rows = {r.column_name for r in profile_table(df).collect()}
    assert rows == {"id", "a.b"}


def test_profile_renders_huge_doubles(spark):
    """|x| >= 1e16 must render, not overflow decimal(18,2) to NULL."""
    from mover_spark.operators.profiling import profile_table

    df = spark.createDataFrame([(1, 1.5e17)], "id long, big double")
    row = [r for r in profile_table(df, ["big"]).collect()][0]
    assert row.max_val is not None and row.max_val.startswith("15000000")


def test_profile_accuracy_check_contract(catalog):
    """The contract view emits exact metrics + a TRUE tolerance boolean
    per column (this is what makes the sketch twin hash-checkable)."""
    from mover_spark.operators.profiling import profile_accuracy_check

    rows = profile_accuracy_check(catalog.df("orders")).collect()
    assert len(rows) == len(catalog.df("orders").columns)
    assert all(r.distinct_within_tol for r in rows)
    # exact metrics identical to the exact profile
    from mover_spark.operators.profiling import profile_table

    exact = {r.column_name: r for r in profile_table(catalog.df("orders")).collect()}
    for r in rows:
        e = exact[r.column_name]
        assert (r.n_rows, r.n_nulls, r.n_distinct, r.min_val, r.max_val) == (
            e.n_rows, e.n_nulls, e.n_distinct, e.min_val, e.max_val
        )


def test_profile_exact_plans_split_by_buffer_type(catalog):
    """Optimization r13: the exact profile and the accuracy contract keep
    the multi-distinct Expand aggregate on the HashAggregate codegen path
    by folding every variable-width-buffer aggregate (string min/max, the
    HLL sketch) in a separate un-expanded single-group pass. A merged
    one-agg form demotes the whole Expand aggregate to SortAggregate
    (measured 8.8 s vs 2.0 s solo at sf0.1 for the check). Pin: no
    SortAggregate anywhere downstream of the Expand, and the join gluing
    the two 1-row arms is a broadcast nested-loop, never a shuffle."""
    from mover_spark.operators.profiling import (
        profile_accuracy_check,
        profile_table,
    )

    for frame in (
        profile_accuracy_check(catalog.df("orders")),
        profile_table(catalog.df("orders"), exact=True),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in plan  # the exact multi-distinct is still one agg
        # the Expand subtree must be hash-aggregated: a SortAggregate in
        # this plan means wide buffers leaked back onto the expanded stream
        assert "SortAggregate" not in plan.split("Expand")[0]
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
