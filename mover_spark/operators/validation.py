"""Data-quality validation: declarative constraint checks over the corpus
tables — the promotion gate a 100-TB ingest pipeline runs before a dataset
snapshot is handed to training (reference has no equivalent; the taxonomy
follows the public constraint vocabularies of AWS Deequ and dbt tests:
completeness, uniqueness, accepted values, ranges, referential integrity).

Scale shape — the whole report is CHECK-sized, never data-sized:

- Every row-predicate check on a table folds into ONE conditional
  aggregate (``SUM(CASE WHEN violation THEN 1 END)``) so N checks cost one
  scan, not N scans; the per-table agg is unpivoted with ``stack`` into
  (check, violations) rows JVM-side.
- Uniqueness is a separate single-pass ``COUNT(*) - COUNT(DISTINCT key)``
  per key set — kept OUT of the shared scan on purpose: mixing distinct
  and non-distinct aggregates makes Catalyst plan an Expand (one input row
  duplicated per aggregate), turning the cheap shared scan into a
  data-multiplying one (same reasoning as operators/profiling.py).
- Referential integrity is one LEFT join child->parent with
  ``SUM(parent IS NULL)`` — Catalyst broadcasts small parents and AQE
  handles skewed keys; the join degenerates to a semi-join-shaped probe,
  and total rows + violations come out of the same pass.

Empty tables: conditional sums are NULL over zero rows, coalesced to 0 so
an empty table PASSES row checks (vacuous truth, the Deequ convention)
while a dedicated ``min_rows`` check exists to assert non-emptiness.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "accepted_values",
    "in_range",
    "satisfies",
    "unique_key",
    "foreign_key",
    "min_rows",
    "data_quality_report",
]

REPORT_COLS = ["check_name", "table_name", "violations", "n_rows", "passed"]


@dataclass(frozen=True)
class Check:
    """One declarative constraint. ``kind`` picks the evaluation strategy:

    - ``row``: ``predicate`` is the VIOLATION condition, folded into the
      table's shared conditional-aggregate scan.
    - ``unique``: ``key_cols`` must be unique; violations = excess rows
      (``COUNT(*) - COUNT(DISTINCT key)``).
    - ``fk``: every non-null ``key_cols[0]`` must exist in
      ``ref_table``.``ref_col``; violations = orphan child rows.
    - ``min_rows``: table must hold at least ``threshold`` rows;
      violations = the shortfall.
    """

    name: str
    table: str
    kind: str = "row"
    predicate: Column | None = None
    key_cols: tuple[str, ...] = field(default_factory=tuple)
    ref_table: str = ""
    ref_col: str = ""
    threshold: int = 0


def not_null(name: str, table: str, col: str) -> Check:
    return Check(name, table, "row", F.col(col).isNull())


def accepted_values(name: str, table: str, col: str, values) -> Check:
    # NULL is a completeness concern, not a domain violation (pair with
    # not_null to assert both) — ~isin(NULL) is NULL and the conditional
    # sum would silently skip it anyway; make that contract explicit
    return Check(name, table, "row", F.col(col).isNotNull() & ~F.col(col).isin(*values))


def in_range(name: str, table: str, col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(name, table, "row", c.isNotNull() & ~c.between(lo, hi))


def satisfies(name: str, table: str, must_hold: Column) -> Check:
    """Row-level invariant: violation when ``must_hold`` is false OR null
    (a null invariant is an unproven one — strict, unlike SQL CHECK)."""
    return Check(name, table, "row", ~F.coalesce(must_hold, F.lit(False)))


def unique_key(name: str, table: str, *cols: str) -> Check:
    return Check(name, table, "unique", key_cols=tuple(cols))


def foreign_key(name: str, table: str, col: str, ref_table: str, ref_col: str) -> Check:
    return Check(name, table, "fk", key_cols=(col,), ref_table=ref_table, ref_col=ref_col)


def min_rows(name: str, table: str, threshold: int) -> Check:
    return Check(name, table, "min_rows", threshold=threshold)


def _lit_row(spark_df: DataFrame, name: str, table: str) -> DataFrame:
    """Tag a 1-row (violations, n_rows) agg with its check identity."""
    return spark_df.select(
        F.lit(name).alias("check_name"),
        F.lit(table).alias("table_name"),
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
    )


def data_quality_report(tables: dict[str, DataFrame], checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` against ``tables`` and return one row per check:
    (check_name, table_name, violations, n_rows, passed), ordered by
    check_name. All row checks on a table share a single scan."""
    if not checks:
        raise ValueError("data_quality_report: no checks given")
    by_table: dict[str, list[Check]] = {}
    parts: list[DataFrame] = []
    for c in checks:
        if c.table not in tables:
            raise KeyError(f"check {c.name!r} references unknown table {c.table!r}")
        if c.kind == "row":
            by_table.setdefault(c.table, []).append(c)
        elif c.kind == "unique":
            df = tables[c.table]
            agg = df.agg(
                (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in c.key_cols])).alias(
                    "violations"
                ),
                F.count(F.lit(1)).alias("n_rows"),
            )
            parts.append(_lit_row(agg, c.name, c.table))
        elif c.kind == "fk":
            child, parent = tables[c.table], tables[c.ref_table]
            key = c.key_cols[0]
            p = parent.select(F.col(c.ref_col).alias("__ref")).distinct()
            agg = (
                child.join(p, F.col(key) == F.col("__ref"), "left")
                .agg(
                    F.sum(
                        (F.col(key).isNotNull() & F.col("__ref").isNull()).cast("long")
                    ).alias("violations"),
                    F.count(F.lit(1)).alias("n_rows"),
                )
            )
            parts.append(_lit_row(agg, c.name, c.table))
        elif c.kind == "min_rows":
            agg = tables[c.table].agg(
                F.greatest(
                    F.lit(0).cast("long"), F.lit(c.threshold) - F.count(F.lit(1))
                ).alias("violations"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            parts.append(_lit_row(agg, c.name, c.table))
        else:
            raise ValueError(f"unknown check kind {c.kind!r}")

    for table, tchecks in by_table.items():
        df = tables[table]
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(c.predicate.cast("long")).alias(f"__v{i}")
                for i, c in enumerate(tchecks)
            ],
        )
        # unpivot the one agg row into one report row per check (stack is
        # codegen'd; the scan above is the only pass over the table)
        # check names are interpolated into SQL — escape backslashes FIRST
        # then quotes: Spark string literals treat \ as an escape, so an
        # unescaped trailing backslash would swallow the closing quote and
        # shift the stack() arguments, and a lone "'" would terminate the
        # literal (ADVICE r11: the quote-only escaping missed the
        # backslash cases)
        stack_args = ", ".join(
            "'{}', __v{}".format(
                c.name.replace("\\", "\\\\").replace("'", "''"), i
            )
            for i, c in enumerate(tchecks)
        )
        rows = agg.select(
            F.expr(f"stack({len(tchecks)}, {stack_args}) AS (check_name, violations)"),
            "n_rows",
        ).select(
            "check_name",
            F.lit(table).alias("table_name"),
            F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
            F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        )
        parts.append(rows)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0).orderBy("check_name")
