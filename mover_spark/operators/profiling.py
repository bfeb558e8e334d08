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


def _render(dtype: str):
    # decimal(38,2), not (18,2): |x| >= 1e16 (epoch-nanos, large revenue
    # aggregates) overflowed the narrower type — NULL min/max silently,
    # or NUMERIC_VALUE_OUT_OF_RANGE under ANSI mode
    if dtype == "double" or dtype.startswith("decimal") or dtype == "float":
        return lambda x: x.cast("decimal(38,2)").cast("string")
    return lambda x: x.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, min_val,
    max_val) — one aggregation pass, long-format output.

    ``exact=True`` (default, the oracle-checked mode) uses exact
    count_distinct — Catalyst expands the N multi-distincts into an
    Expand(xN) two-level plan, which is correct but multiplies the scan's
    row stream by the column count. ``exact=False`` swaps in
    approx_count_distinct (HyperLogLog++, relative error ``rsd``): every
    metric then computes as a plain partial/final aggregate in ONE pass
    with NO Expand — the profile you actually run first on a 100 TB
    source. All other metrics (nulls, min, max, n_rows) stay exact in
    both modes.

    Column names are never spliced into SQL text: per-column metrics are
    built as struct() aggregate expressions and exploded to long format,
    so names containing spaces, quotes, or SQL metacharacters profile
    fine (column_name is carried as a literal VALUE, not an identifier).
    """
    dtypes = dict(df.dtypes)
    if columns is None:
        # maps are not orderable: min/max on a defaulted map column would
        # fail the WHOLE profile; explicit `columns` still errors loudly
        columns = [c for c in df.columns if not dtypes[c].startswith("map<")]
    distinct = (
        F.count_distinct if exact
        else (lambda c: F.approx_count_distinct(c, rsd=rsd))
    )
    profiles = []
    for c in columns:
        r = _render(dtypes[c])
        # backtick-quote the name: a literal dot would otherwise parse as
        # nested-field syntax (F.col and df[...] both do) and fail to
        # resolve; embedded backticks escape by doubling
        col = F.col("`" + c.replace("`", "``") + "`")
        profiles.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
                distinct(col).alias("n_distinct"),
                r(F.min(col)).alias("min_val"),
                r(F.max(col)).alias("max_val"),
            )
        )
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), F.array(*profiles).alias("p"))
    return wide.select(
        "n_rows", F.explode("p").alias("p")
    ).select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_val").alias("min_val"),
        F.col("p.max_val").alias("max_val"),
    )


def profile_accuracy_check(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    tol: float = 0.10,
) -> DataFrame:
    """The sketch profile's accuracy contract, checked in-query: the
    EXACT per-column profile plus a boolean asserting the HLL++ distinct
    estimate (the ``exact=False`` fast path) landed within ``tol`` of the
    exact count. Same trick as sketches.approx_distinct_check — the
    booleans (not the raw estimates) are the query output, so a SQL
    oracle can reproduce every cell even though no other engine
    reproduces Spark's HLL bits. Spark's HLL is hash-based and
    merge-commutative, so the boolean is deterministic per dataset.

    This is the per-SF AUDIT of the sketch twin. ONE aggregation pass
    (optimization r13, guide §2.4): exact count_distinct and the HLL++
    estimate compute in the SAME agg — previously this ran
    ``profile_table`` twice (two scans, two aggregate trees) and joined
    on column_name. Catalyst's multi-distinct rewrite puts the
    non-distinct aggregates (sum/min/max/approx_count_distinct) in the
    Expand's gid-0 group where every row appears exactly once, so the
    HLL sketch sees the identical row stream the standalone approx
    profile does; HLL merge is commutative, so the estimate — and the
    boolean — is bit-identical to the two-pass form. Production
    first-profile still runs ``profile_table(exact=False)`` alone — the
    no-Expand shape pinned by tests/test_profiling.py."""
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [c for c in df.columns if not dtypes[c].startswith("map<")]
    profiles = []
    for c in columns:
        r = _render(dtypes[c])
        col = F.col("`" + c.replace("`", "``") + "`")
        profiles.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                F.approx_count_distinct(col, rsd=rsd).alias("n_approx"),
                r(F.min(col)).alias("min_val"),
                r(F.max(col)).alias("max_val"),
            )
        )
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), F.array(*profiles).alias("p"))
    return wide.select("n_rows", F.explode("p").alias("p")).select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_val").alias("min_val"),
        F.col("p.max_val").alias("max_val"),
        (
            F.abs(F.col("p.n_approx") - F.col("p.n_distinct"))
            <= F.col("p.n_distinct") * F.lit(tol)
        ).alias("distinct_within_tol"),
    )
