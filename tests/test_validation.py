"""data_quality_report: planted-violation counts, empty-table vacuity,
null-handling contracts, and misconfiguration errors."""

import pytest
from pyspark.sql import functions as F

from mover_spark.operators.validation import (
    Check,
    accepted_values,
    data_quality_report,
    foreign_key,
    in_range,
    min_rows,
    not_null,
    satisfies,
    unique_key,
)


def _report(tables, checks):
    return {r.check_name: r for r in data_quality_report(tables, checks).collect()}


def test_planted_violations_counted_exactly(spark):
    child = spark.createDataFrame(
        [
            (1, 10, 0.5, "A"),
            (2, 10, 1.5, "B"),     # range violation; dup (10) handled below
            (3, None, -0.1, "A"),  # null fk key is NOT an orphan; range violation
            (4, 99, 0.0, "Z"),     # orphan fk; bad domain value
            (4, 10, None, "A"),    # dup id; NULL range value not a violation
        ],
        "id long, parent_id long, score double, cat string",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pid long")
    rep = _report(
        {"child": child, "parent": parent},
        [
            unique_key("child_pk", "child", "id"),
            foreign_key("child_fk", "child", "parent_id", "parent", "pid"),
            in_range("score_range", "child", "score", 0.0, 1.0),
            accepted_values("cat_domain", "child", "cat", ["A", "B"]),
            not_null("parent_id_not_null", "child", "parent_id"),
            min_rows("child_min", "child", 10),
        ],
    )
    assert rep["child_pk"].violations == 1          # one excess row for id=4
    assert rep["child_fk"].violations == 1          # only 99 is an orphan
    assert rep["score_range"].violations == 2       # 1.5 and -0.1; NULL skipped
    assert rep["cat_domain"].violations == 1        # Z; NULLs are not domain errors
    assert rep["parent_id_not_null"].violations == 1
    assert rep["child_min"].violations == 5         # shortfall 10 - 5
    assert all(r.n_rows == 5 for n, r in rep.items() if n != "child_min")
    assert not rep["child_pk"].passed and not rep["child_min"].passed


def test_empty_table_row_checks_vacuously_pass(spark):
    empty = spark.createDataFrame([], "id long, score double")
    rep = _report(
        {"t": empty},
        [
            in_range("score_range", "t", "score", 0.0, 1.0),
            unique_key("pk", "t", "id"),
            min_rows("nonempty", "t", 1),
        ],
    )
    assert rep["score_range"].passed and rep["score_range"].n_rows == 0
    assert rep["pk"].passed
    assert rep["nonempty"].violations == 1 and not rep["nonempty"].passed


def test_satisfies_null_is_a_violation(spark):
    df = spark.createDataFrame([(1, 5), (2, None), (3, -1)], "id long, qty int")
    rep = _report({"t": df}, [satisfies("qty_pos", "t", F.col("qty") > 0)])
    # NULL invariant = unproven = violation (strict, unlike SQL CHECK)
    assert rep["qty_pos"].violations == 2


def test_multi_column_unique_and_shared_scan(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, None)], "a long, b long"
    )
    rep = _report(
        {"t": df},
        [
            unique_key("ab_unique", "t", "a", "b"),
            not_null("b_not_null", "t", "b"),
            satisfies("a_pos", "t", F.col("a") > 0),
        ],
    )
    # countDistinct skips the (2, NULL) row entirely: 4 - 2 = 2
    assert rep["ab_unique"].violations == 2
    assert rep["b_not_null"].violations == 1
    assert rep["a_pos"].violations == 0


def test_fk_null_child_keys_are_not_orphans(spark):
    child = spark.createDataFrame([(None,), (None,), (7,)], "k long")
    parent = spark.createDataFrame([(7,)], "pk long")
    rep = _report(
        {"c": child, "p": parent}, [foreign_key("fk", "c", "k", "p", "pk")]
    )
    assert rep["fk"].violations == 0 and rep["fk"].n_rows == 3


def test_config_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(KeyError, match="unknown table"):
        data_quality_report({"t": df}, [not_null("x", "missing", "id")])
    with pytest.raises(ValueError, match="unknown check kind"):
        data_quality_report({"t": df}, [Check("x", "t", "bogus")])


def test_report_shape_and_order(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = data_quality_report(
        {"t": df},
        [not_null("z_check", "t", "id"), min_rows("a_check", "t", 1)],
    )
    assert out.columns == ["check_name", "table_name", "violations", "n_rows", "passed"]
    assert [r.check_name for r in out.collect()] == ["a_check", "z_check"]


def test_row_checks_share_one_scan(spark):
    """The scale contract: N row checks on a table fold into ONE pass —
    the physical plan must contain exactly one scan of the input."""
    df = spark.range(100).selectExpr("id", "id % 7 AS v").cache()
    try:
        rep = data_quality_report(
            {"t": df},
            [
                not_null("c1", "t", "v"),
                in_range("c2", "t", "v", 0, 5),
                satisfies("c3", "t", F.col("id") >= 0),
            ],
        )
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") == 1, plan
    finally:
        df.unpersist()


def test_fk_parent_is_broadcast(spark):
    """A small FK parent must reach the child join as a broadcast, not a
    shuffle — the referential check's cost has to stay one pass over the
    child at corpus scale."""
    child = spark.range(1000).selectExpr("id", "id % 50 AS pid")
    parent = spark.range(50).selectExpr("id AS k")
    rep = data_quality_report(
        {"c": child, "p": parent}, [foreign_key("fk", "c", "pid", "p", "k")]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert rep.collect()[0].violations == 0


def test_empty_checks_list_is_a_clear_error(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no checks given"):
        data_quality_report({"t": df}, [])


def test_quoted_check_name_survives_stack_sql(spark):
    """Row-check names are interpolated into stack() SQL — a single quote in
    the name must round-trip, not break the generated query."""
    df = spark.createDataFrame([(1,), (None,)], "id long")
    rep = _report({"t": df}, [not_null("bob's check", "t", "id")])
    assert rep["bob's check"].violations == 1
    assert rep["bob's check"].n_rows == 2


def test_backslash_check_name_survives_stack_sql(spark):
    """ADVICE r11: Spark string literals treat backslash as an escape, so
    a name containing one (worst case: trailing — it would swallow the
    closing quote and SHIFT the stack() arguments) must round-trip."""
    df = spark.createDataFrame([(1,), (None,)], "id long")
    for name in ("back\\slash", "trailing\\", "mixed\\'quote"):
        rep = _report({"t": df}, [not_null(name, "t", "id")])
        assert rep[name].violations == 1
        assert rep[name].n_rows == 2
