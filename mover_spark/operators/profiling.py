"""Data profiling: the one-pass per-column summary every ingest pipeline
runs before trusting a new source — null counts, exact distinct counts,
and min/max rendered engine-portably.

Scale shape: every column's metrics compute simultaneously in one or two
wide aggregations (exact mode splits the multi-distinct Expand aggregate
from the variable-width-buffer fold so both stay on the HashAggregate
codegen path — see ``_exact_profile``); the wide 1-row results are then
exploded to long format driver-free. Nothing is collected, nothing loops
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


def _qcol(c: str):
    # backtick-quote the name: a literal dot would otherwise parse as
    # nested-field syntax (F.col and df[...] both do) and fail to
    # resolve; embedded backticks escape by doubling
    return F.col("`" + c.replace("`", "``") + "`")


def _exact_profile(
    df: DataFrame,
    dtypes: dict,
    columns: list[str],
    approx_rsd: float | None,
    tol: float = 0.10,
) -> DataFrame:
    """Shared exact-profile builder, SPLIT BY AGGREGATE-BUFFER TYPE
    (optimization r13, guide §1.2/§7.2). One aggregation holding exact
    multi-distincts AND string min/max (and, in check mode, N x 52-word
    HLL++ sketch buffers) plans as a SortAggregate over the Expand: the
    variable-width buffers disqualify HashAggregateExec, so every
    first-level (gid, value) group drags the full wide buffer through a
    sort — measured 8.8 s solo at sf0.1 for the one-agg check form vs
    2.0 s for this split. So:

    - the N count_distincts run ALONE over the Expand: no aggregate
      buffers at the distinct level and fixed-width longs at the count
      level -> HashAggregate + whole-stage codegen end to end;
    - n_rows / n_nulls / min / max (and the HLL estimate in check mode)
      fold in a single-group aggregate over an un-expanded scan — no
      grouping keys, so the variable-width buffers cost one fold, not a
      sort of the xN row stream;
    - the two 1-row wide results meet in a 1x1 cross join (broadcast,
      no shuffle) and zip positionally — both arrays are built from the
      same `columns` list, so row i of each describes the same column.

    Output rows/schema are identical to the old one-agg form (exact
    aggregates are deterministic; HLL sees the same un-expanded row
    stream the sketch profile sees, and its merge is commutative)."""
    d_structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.count_distinct(_qcol(c)).alias("n_distinct"),
        )
        for c in columns
    ]
    s_structs = []
    for c in columns:
        r = _render(dtypes[c])
        col = _qcol(c)
        fields = [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
            r(F.min(col)).alias("min_val"),
            r(F.max(col)).alias("max_val"),
        ]
        if approx_rsd is not None:
            fields.append(
                F.approx_count_distinct(col, rsd=approx_rsd).alias("n_approx")
            )
        s_structs.append(F.struct(*fields))
    wide_d = df.agg(F.array(*d_structs).alias("pd"))
    wide_s = df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.array(*s_structs).alias("ps")
    )
    z = wide_d.crossJoin(wide_s).select(
        "n_rows", F.explode(F.arrays_zip("pd", "ps")).alias("z")
    )
    out_cols = [
        F.col("z.pd.column_name").alias("column_name"),
        F.col("n_rows"),
        F.col("z.ps.n_nulls").alias("n_nulls"),
        F.col("z.pd.n_distinct").alias("n_distinct"),
        F.col("z.ps.min_val").alias("min_val"),
        F.col("z.ps.max_val").alias("max_val"),
    ]
    if approx_rsd is not None:
        out_cols.append(
            (
                F.abs(F.col("z.ps.n_approx") - F.col("z.pd.n_distinct"))
                <= F.col("z.pd.n_distinct") * F.lit(tol)
            ).alias("distinct_within_tol")
        )
    return z.select(*out_cols)


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
    if not exact:
        # sketch mode: every metric is a plain partial/final aggregate —
        # ONE pass, NO Expand (the pinned 100-TB first-profile shape)
        profiles = []
        for c in columns:
            r = _render(dtypes[c])
            col = _qcol(c)
            profiles.append(
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
                    F.approx_count_distinct(col, rsd=rsd).alias("n_distinct"),
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
    return _exact_profile(df, dtypes, columns, approx_rsd=None)


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

    This is the per-SF AUDIT of the sketch twin. The session-2 one-agg
    form (exact distincts + HLL in one aggregation) was MEASURED SLOWER
    than even the original two-profile join — 8.8 s vs 6.1 s solo at
    sf0.1 — because the 52-word HLL buffers ride the Expand's
    SortAggregate (see ``_exact_profile``). The split shape runs the
    distincts hash-aggregated over the Expand and folds HLL + min/max in
    an un-expanded single-group pass: the HLL sketch sees the identical
    un-expanded row stream the standalone approx profile does, and its
    merge is commutative, so the estimate — and the boolean — is
    bit-identical to every prior form. Production first-profile still
    runs ``profile_table(exact=False)`` alone — the no-Expand shape
    pinned by tests/test_profiling.py."""
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [c for c in df.columns if not dtypes[c].startswith("map<")]
    return _exact_profile(df, dtypes, columns, approx_rsd=rsd, tol=tol)
