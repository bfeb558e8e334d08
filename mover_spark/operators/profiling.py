"""Data profiling: the one-pass per-column summary every ingest pipeline
runs before trusting a new source — null counts, exact distinct counts,
and min/max rendered engine-portably.

Scale shape: ONE aggregation over one scan computes every column's
metrics simultaneously (Catalyst expands the multi-distinct into its
standard two-level plan); the wide 1-row result is then stacked to long
format driver-free with `stack()`. Nothing is collected, nothing loops
per column.

Rendering rules (the part that makes the output hash-stable across
engines): doubles go through DECIMAL(18,2) before the string cast (raw
double->string uses scientific notation in Spark but not DuckDB),
timestamps format identically in both, integers and strings cast
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _render(col: str, dtype: str):
    c = F.col(col)
    if dtype == "double" or dtype.startswith("decimal") or dtype == "float":
        return lambda x: x.cast("decimal(18,2)").cast("string")
    return lambda x: x.cast("string")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, min_val,
    max_val) — one aggregation pass, long-format output."""
    dtypes = dict(df.dtypes)
    columns = columns if columns is not None else [c for c in df.columns]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        r = _render(c, dtypes[c])
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            r(F.min(c)).alias(f"__min_{c}"),
            r(F.max(c)).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in columns
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(columns)}, {stack_args}) "
        "AS (column_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
