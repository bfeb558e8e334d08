"""Join operators Spark lacks as built-ins: as-of join and range
(interval) join. The reference delegates all joins to PostgreSQL
(SURVEY.md §2.2); these close the taxonomy gap Spark-first.

as_of_join — the kdb/pandas `merge_asof` semantics: for every left row,
the single most recent right row with right.ts <= left.ts (per key). No
per-row lookups and no window-of-joins: ONE union + ONE sort within the
(key)-partitioned shuffle, then last(ignorenulls) over an ordered frame.
At 100 TB both sides shuffle once on the key — the same cost as any
equi-join — and the sort is Tungsten's radix sort, not a UDF.

range_join — left.value ∈ [right.lo, right.hi): mapping each interval to
the fixed-width buckets it overlaps and equi-joining on bucket id turns a
nested-loop theta-join into a hash join + residual filter. Bucket width
trades replication for selectivity; intervals dims are usually tiny and
broadcast anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: latest right row with right_ts <= left_ts, per key.

    Ties (equal timestamps) resolve to the right row (matching DuckDB's
    ASOF `>=` semantics). Implementation: tag sources, union on the key
    columns, and carry the most recent right payload forward with
    last(ignorenulls) over (key ORDER BY ts, src) — right rows sort before
    left rows at equal ts so equality is visible."""
    payload = payload if payload is not None else [c for c in right.columns if c not in keys and c != right_ts]

    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(dict(right.dtypes)[p]).alias(f"__p_{p}") for p in payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__rts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        F.col(right_ts).alias("__rts"),
    ).select(*[c for c in l_tagged.columns])

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns],
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{p}{suffix}")
            for p in payload
        ],
        F.last("__rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return filled.where(F.col("__src") == 1).select(
        *[c for c in left.columns],
        f"{right_ts}{suffix}",
        *[f"{p}{suffix}" for p in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Inner join on left.value ∈ [right.lo, right.hi) via bucket mapping.

    Each interval explodes to ceil((hi-lo)/width) bucket rows; the join is
    then a plain equi-join on __bucket (hash/broadcast — Catalyst's choice)
    with the exact predicate as a residual filter."""
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge doesn't
                # reach into the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    l = left.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        l.join(r, on="__bucket")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
