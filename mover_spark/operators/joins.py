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

salted_join / salted_agg — explicit skew mitigation for when AQE's runtime
skew-join split isn't available or sufficient (e.g. a hot key inside one
fetched shuffle block, or a skewed aggregation): scatter the hot side
across S salt buckets with a deterministic content hash, replicate the
other side S times (join) or pre-aggregate per salt (agg). Results are
identical to the unsalted plan — only the partitioning changes.
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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, per key: the matching right row by time —
    ``backward`` (latest right_ts <= left_ts, the default / DuckDB ASOF
    semantics), ``forward`` (earliest right_ts >= left_ts), or ``nearest``
    (closer of the two; exact ties resolve backward). ``tolerance`` caps
    the allowed gap — a Spark interval string ("1 hour") for timestamp
    columns or a number for numeric ones; out-of-tolerance matches null
    out, like pandas merge_asof.

    Ties (equal timestamps) resolve to the right row in every direction.
    Implementation: tag sources, union on the key columns, and carry the
    right payload across with last(ignorenulls) windows — ascending scan
    for backward, descending for forward, both (sharing one hash exchange,
    two sorts) for nearest. Right rows sort before left rows at equal ts
    so equality is visible. No join fan-out, no per-row probing: the whole
    operator is O(n log n) sort-window work per key partition."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    payload = payload if payload is not None else [c for c in right.columns if c not in keys and c != right_ts]
    tol = F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str) else (
        F.lit(tolerance) if tolerance is not None else None
    )

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

    # payload columns as the final tie-break: two right rows with identical
    # (key, ts) would otherwise leave last(ignorenulls) partition-order
    # dependent; ordering by the payload itself makes the winner (the max
    # payload tuple) deterministic run-to-run
    def _window(descending: bool):
        ts_ord = F.col("__ts").desc() if descending else F.col("__ts").asc()
        return (
            Window.partitionBy(*keys)
            .orderBy(
                ts_ord,
                F.col("__src").asc(),
                *[F.col(f"__p_{p}").asc_nulls_first() for p in payload],
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    fills = []
    if direction in ("backward", "nearest"):
        fills.append(("b", _window(descending=False)))
    if direction in ("forward", "nearest"):
        fills.append(("f", _window(descending=True)))
    filled = unioned.select(
        *[c for c in unioned.columns],
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"__{d}_{p}")
            for d, w in fills
            for p in payload
        ],
        *[F.last("__rts", ignorenulls=True).over(w).alias(f"__{d}_rts") for d, w in fills],
    ).where(F.col("__src") == 1)

    def _ok(d: str):
        rts = F.col(f"__{d}_rts")
        cond = rts.isNotNull()
        if tol is not None:
            gap = (F.col("__ts") - rts) if d == "b" else (rts - F.col("__ts"))
            cond = cond & (gap <= tol)
        return cond

    if direction == "nearest":
        use_b = _ok("b") & (
            ~_ok("f")
            | ((F.col("__ts") - F.col("__b_rts")) <= (F.col("__f_rts") - F.col("__ts")))
        )

        def _pick(col: str):
            return F.when(use_b, F.col(f"__b_{col}")).when(_ok("f"), F.col(f"__f_{col}"))

    else:
        d = "b" if direction == "backward" else "f"
        ok = _ok(d)

        def _pick(col: str):
            return F.when(ok, F.col(f"__{d}_{col}"))

    return filled.select(
        *[c for c in left.columns],
        _pick("rts").alias(f"{right_ts}{suffix}"),
        *[_pick(p).alias(f"{p}{suffix}") for p in payload],
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `large` has skewed join keys: the shuffle key becomes
    (key, salt) so a hot key spreads over `salts` reducers instead of
    melting one. `small` is replicated `salts` times (explode of a literal
    range — cheap for the dimension-sized inputs this is meant for).

    Salt is a deterministic hash of the large row's full content, so plans
    stay reproducible run-to-run (no rand()). Result == large.join(small,
    on, how) exactly; only the physical partitioning differs.

    `how` must preserve the small side's replication invariant: each large
    row carries ONE salt, so joins that emit unmatched SMALL-side rows
    (right/full outer) would surface the salts-1 replicas that found no
    partner as phantom null-extended rows — those modes are rejected."""
    if how.replace("_", "").lower() in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "small-side salt replicas would emit phantom rows. Swap the "
            "sides (salting belongs on the skewed probe side) or use a "
            "plain join."
        )
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in large.columns])), F.lit(salts))
    l = large.withColumn("__salt", salt.cast("int"))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return l.join(s, on=[*on, "__salt"], how=how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial agg on (keys, salt), final
    agg on keys. `aggs` maps output column -> (kind, column) with kind in
    {count, sum, min, max} — the decomposable aggregates where
    final(partial(x)) == direct(x). A hot group's rows split across `salts`
    partial groups, so no single task aggregates a whole hot key."""
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(salts))
    partial_exprs, final_exprs = [], []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__{out}"))
            final_exprs.append(F.sum(f"__{out}").alias(out))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"__{out}"))
            final_exprs.append(F.sum(f"__{out}").alias(out))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(f"__{out}"))
            final_exprs.append(F.min(f"__{out}").alias(out))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(f"__{out}"))
            final_exprs.append(F.max(f"__{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate kind: {kind}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


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
    # malformed intervals (hi <= lo: empty by the half-open semantics, or
    # null bounds) DROP before the explode — F.sequence steps -1 when
    # start > stop, so one corrupt row would otherwise generate a huge
    # DESCENDING bucket run (the same hazard interval_overlap_join guards)
    r = (
        right.where(F.col(hi_col) > F.col(lo_col))
        .withColumn(
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
    )
    l = left.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        l.join(r, on="__bucket")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_bounds: tuple = ("start", "end"),
    right_bounds: tuple = ("start", "end"),
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Two-sided interval overlap join: pairs where [l_start, l_end] and
    [r_start, r_end] intersect (inclusive), per key — the genomics /
    time-overlap shape a naive engine evaluates as a per-key cross join.

    Scale mechanism (bucket banding): each interval explodes to the
    fixed-width time buckets it touches, the join runs as a plain EQUI-join
    on (keys, bucket), and the overlap predicate filters survivors. A pair
    overlapping several buckets is emitted EXACTLY ONCE without a distinct:
    only the bucket containing max(l_start, r_start) — the first instant of
    the overlap, which both intervals contain by definition — keeps the
    row. Join cost is candidates-per-bucket, not |left| x |right| per key;
    bucket_seconds trades explode factor against candidate density and
    should approximate the typical interval length.

    Input hygiene: malformed intervals (end < start) and intervals whose
    bounds don't parse to a timestamp (unix_timestamp -> null) are DROPPED
    before the explode — F.sequence(lo, hi) would otherwise silently emit a
    DESCENDING bucket run and junk candidate rows. An interval spanning more than
    ``max_buckets_per_interval`` buckets (i.e. vastly longer than
    bucket_seconds) fails fast with a runtime error instead of exploding to
    an unbounded row blow-up; raise the cap or widen bucket_seconds for
    legitimately long intervals."""
    ls, le = left_bounds
    rs, re_ = right_bounds
    w = F.lit(bucket_seconds)

    def bucketed(df, s, e, side):
        # string bounds parse IN PLACE via try_to_timestamp, so bucketing,
        # the malformed filter, the final overlap predicate AND the output
        # all see the same typed value. Unparseable values give null
        # (dropped below) instead of an ANSI DateTimeException killing the
        # job. Parsing only for bucketing while predicating on the raw
        # strings would silently drop every pair whose format the default
        # unix_timestamp pattern can't read (ISO 'T' separators), and
        # compare mixed formats lexicographically wrong.
        for c in (s, e):
            if dict(df.dtypes)[c] == "string":
                df = df.withColumn(c, F.try_to_timestamp(F.col(c)))

        lo = F.floor(F.unix_timestamp(F.col(s)) / w)
        hi = F.floor(F.unix_timestamp(F.col(e)) / w)
        span_ok = F.when(
            hi - lo < F.lit(max_buckets_per_interval),
            hi,
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans > "
                        f"{max_buckets_per_interval} buckets of "
                        f"{bucket_seconds}s — widen bucket_seconds or raise "
                        f"max_buckets_per_interval ("
                    ),
                    F.col(s).cast("string"),
                    F.lit(" .. "),
                    F.col(e).cast("string"),
                    F.lit(")"),
                )
            ).cast("long")
        )
        # un-parseable bounds (unix_timestamp -> null, e.g. a string column
        # in a non-default format) must DROP like any malformed interval —
        # a null lo/hi would otherwise fall through the span guard's
        # not-true branch and fire the misleading span-cap error
        return (
            df.where(F.col(e) >= F.col(s))
            .where(lo.isNotNull() & hi.isNotNull())
            .select(
                *[F.col(k) for k in keys],
                *[F.col(c).alias(f"{side}_{c}") for c in df.columns if c not in keys],
                F.explode(F.sequence(lo, span_ok)).alias("__bucket"),
            )
        )

    lb = bucketed(left, ls, le, "l")
    rb = bucketed(right, rs, re_, "r")
    lst, lend = F.col(f"l_{ls}"), F.col(f"l_{le}")
    rst, rend = F.col(f"r_{rs}"), F.col(f"r_{re_}")
    return (
        lb.join(rb, on=[*keys, "__bucket"])
        .where(
            (lst <= rend)
            & (rst <= lend)
            # emit-once: only the bucket holding the overlap's first instant
            & (
                F.col("__bucket")
                == F.floor(F.unix_timestamp(F.greatest(lst, rst)) / w)
            )
        )
        .drop("__bucket")
    )
