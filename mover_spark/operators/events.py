"""Event-time windowing + JSON-prop analytics over the `events` table.

The reference is batch-only with opaque jsonb passthrough
(/root/reference/dialect/postgres/util.go:91-96); this module adds the
event-analytics surface a scale pipeline needs: tumbling/sliding windows
via ``F.window``, session windows via ``F.session_window``, and JSON prop
extraction with ``get_json_object`` — all built-ins, watermark-compatible so
the same expressions run under Structured Streaming (mover_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from .analytics import dsum


def tumbling_counts(cat: Catalog, width: str = "1 hour") -> DataFrame:
    """Tumbling window per event_type: count + exact value sum."""
    ev = cat.df("events")
    return (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(cat: Catalog, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding window: each event lands in width/slide windows."""
    ev = cat.df("events")
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n_events")
    )


def session_stats(cat: Catalog, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-merged), built-in session_window —
    the streaming-safe formulation of sessionization."""
    ev = cat.df("events")
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def gapfill_hourly(cat: Catalog, event_type: str = "purchase") -> DataFrame:
    """Time-series gap-fill: a dense hourly series per event type with
    zero-filled missing buckets. The bucket spine is generated with
    sequence+explode from the GLOBAL min/max (one tiny agg, broadcast as a
    1-row cross join) — no driver-side range materialization; the fill is a
    left join + coalesce. The pattern behind resampling/ffill pipelines."""
    ev = cat.df("events").where(F.col("event_type") == event_type)
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    return (
        spine.join(counts, on=["bucket"], how="left")
        .select(
            F.col("bucket").cast("timestamp_ntz").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("bucket")
    )


def hourly_rollup(cat: Catalog) -> DataFrame:
    """Hour-level partial aggregates per event type — the materialized
    rollup a hypertable/continuous-aggregate keeps. Sums stay DECIMAL so
    they re-aggregate exactly (see daily_from_hourly)."""
    ev = cat.df("events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,4)")).alias("sum_value_dec"),
    )


def daily_from_hourly(cat: Catalog) -> DataFrame:
    """Hierarchical re-aggregation (continuous-aggregate pattern): the
    daily answer computed FROM the hourly rollup, never re-reading raw
    events. At 100 TB this is the difference between scanning 24x fewer
    rows and a full rescan; correctness holds because count and DECIMAL
    sum are decomposable (associative, exact in any combination order) —
    the oracle aggregates the raw table directly and the hashes match."""
    hourly = hourly_rollup(cat)
    return (
        hourly.groupBy(
            F.date_trunc("day", "bucket_hour").cast("timestamp_ntz").alias("bucket_day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("bucket_day", "event_type")
    )


def user_value_trend(cat: Catalog) -> DataFrame:
    """Per-user value trend (least-squares slope, units/hour) entirely in
    built-in aggregates — the slope is pure decomposable sums, so there is
    no reason to leave the JVM: x = seconds since the user's first event
    (window-min), y = round(value*1e4) as int, then one groupBy computing
    n/Σx/Σy/Σxy/Σxx with map-side partial aggregation and whole-stage
    codegen. Sums accumulate in decimal(38,0) so they cannot overflow int64
    even for year-long spans * millions of events per user.

    Determinism: integer/decimal sums are exact in any accumulation order;
    the only float ops are the final two divisions + round, identical on any
    engine — hash-matches the DuckDB oracle bit-for-bit.
    (user_value_trend_pandas is the same computation as a grouped-map
    applyInPandas kernel, kept as the custom-kernel demo.)"""
    ev = cat.df("events").select(
        "user_id",
        # ts is TIMESTAMP_NTZ (no direct long cast); session runs UTC so the
        # hop through TIMESTAMP is value-preserving -> epoch seconds
        F.col("ts").cast("timestamp").cast("long").alias("tsec"),
        F.round(F.col("value") * 10000).cast("long").alias("y"),
    )
    w = Window.partitionBy("user_id")
    e = ev.select(
        "user_id",
        (F.col("tsec") - F.min("tsec").over(w)).alias("x"),
        "y",
    )
    dec = "decimal(38,0)"
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
    )
    numer = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denom = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.when(denom == 0, F.lit(None)).otherwise(
            F.round(numer / denom / 10000.0 * 3600.0, 6)
        ).alias("slope_per_hour"),
    )


def user_value_trend_pandas(cat: Catalog) -> DataFrame:
    """Per-user value trend (least-squares slope, units/hour) via a custom
    Python kernel — the escape hatch for logic aggregates genuinely can't
    express (the built-in formulation above is the fast path).

    Kernel shape (optimization round 13): mapInPandas over user-clustered
    partitions, ONE Python invocation per partition with every group in
    the partition reduced by vectorized numpy segment sums
    (argsort + reduceat). The previous grouped-map applyInPandas form paid
    one Python call + one pandas DataFrame construction PER USER — at
    sf0.1 that was ~20k sub-millisecond calls and the call overhead, not
    the math, was the whole cost (guide §4.2: hand whole batches to
    vectorized native code). The repartition("user_id") exchange replaces
    applyInPandas' identical internal shuffle, so the plan's shuffle count
    is unchanged; per-partition memory is 24 bytes/row (3 int64 narrow
    columns), bounded by shuffle partition sizing, where the grouped-map
    form held the largest single group as a pandas frame.

    Determinism without sorting: the discrete slope formula
    (n*Σxy - Σx*Σy) / (n*Σxx - Σx*Σx) is computed from INTEGER sums
    (x = seconds since the user's first event, y = round(value*1e4)), which
    are exact in any accumulation order — so the result is bit-identical to
    the grouped-map form and the DuckDB oracle evaluating the same formula,
    shuffle order and all. Per-element x*y products stay int64-safe up to
    ~1e14 rows-per-group at a 1-year span (same bound as before); the n*s
    products can exceed int64, so the per-group finish runs in Python ints
    (a handful of scalar ops per group)."""
    import numpy as np
    import pandas as pd

    def fit_partition(batches):
        uids, tss, ys = [], [], []
        for pdf in batches:
            if not len(pdf):
                continue
            uids.append(pdf["user_id"].to_numpy(dtype=np.int64))
            # epoch seconds, same floor-division as the grouped-map kernel
            tss.append(pdf["ts"].astype("int64").to_numpy() // 1_000_000_000)
            ys.append(pdf["y"].to_numpy(dtype=np.int64))
        if not uids:
            return
        u = np.concatenate(uids)
        t = np.concatenate(tss)
        yv = np.concatenate(ys)
        order = np.argsort(u, kind="stable")
        u, t, yv = u[order], t[order], yv[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(u)]
        n = np.diff(bounds)
        tmin = np.minimum.reduceat(t, starts)
        x = t - np.repeat(tmin, n)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(yv, starts)
        sxy = np.add.reduceat(x * yv, starts)
        sxx = np.add.reduceat(x * x, starts)
        slopes = []
        for i in range(len(starts)):
            ni, sxi, syi = int(n[i]), int(sx[i]), int(sy[i])
            sxyi, sxxi = int(sxy[i]), int(sxx[i])
            denom = ni * sxxi - sxi * sxi
            slopes.append(
                round((ni * sxyi - sxi * syi) / denom / 10000.0 * 3600.0, 6)
                if denom
                else None
            )
        yield pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": n.astype(np.int64),
                # object dtype: None -> SQL NULL exactly as the grouped-map
                # kernel's [None] single-row frames did (a float64 column
                # would smuggle None in as NaN)
                "slope_per_hour": pd.Series(slopes, dtype=object),
            }
        )

    ev = cat.df("events").select(
        "user_id", "ts", F.round(F.col("value") * 10000).cast("long").alias("y")
    )
    return ev.repartition("user_id").mapInPandas(
        fit_partition, "user_id long, n_events long, slope_per_hour double"
    )


def json_prop_stats(cat: Catalog) -> DataFrame:
    """JSON prop extraction + aggregation (mover passes jsonb through
    opaquely; we query into it with get_json_object — JVM-side, codegen)."""
    ev = cat.df("events")
    # try_cast, not cast: under ANSI mode a non-integer prop ({"k": 87.5}
    # or {"k": "n/a"}) would throw CAST_INVALID_INPUT and kill the whole
    # aggregation; malformed values must aggregate as NULL (the DuckDB
    # oracle mirrors with TRY_CAST)
    k = F.expr("try_cast(get_json_object(props, '$.k') AS int)")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def funnel_counts(
    cat: Catalog, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed step1, then step2
    strictly after it, then step3 strictly after that (classic product
    funnel; the reference has no event analytics at all). Set-at-a-time:
    one aggregate per stage with a semi-join carrying each user's previous
    stage timestamp — no per-user iteration, no window over the whole
    event stream. Deterministic: stage times are MINs, comparisons strict."""
    ev = cat.df("events").select("user_id", "event_type", "ts")
    s1, s2, s3 = steps
    t1 = (
        ev.where(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == s2)
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == s3)
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_step1"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_step2")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_step3")))
    )


def outlier_events(cat: Catalog, sigmas: float = 3.0) -> DataFrame:
    """Statistical outlier detection per event type: events beyond
    `sigmas` sample standard deviations from their type's mean — the
    quality-monitoring pass a training pipeline runs over telemetry.
    Two passes over one grouped aggregate: moments from exact decimal
    sums (partition-order invariant, same formula as the oracle),
    broadcast back onto the stream of events as a 5-row join. No window,
    no sort; the comparison is identical IEEE arithmetic on any engine."""
    ev = cat.df("events")
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("value").cast("decimal(25,4)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)")).cast("double")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2")
    ).select(
        "et",
        (F.col("s1") / F.col("n")).alias("mean_v"),
        # n=1 groups have no sample stddev: guard the (n-1) division —
        # under the ANSI mode this repo runs, a bare divide would throw
        # DIVIDE_BY_ZERO for any event type with exactly one event. NULL
        # matches STDDEV_SAMP's single-row answer on every engine, and a
        # null std_v makes the 3-sigma comparison null -> no outliers.
        F.when(
            F.col("n") > 1,
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ),
        ).alias("std_v"),
    )
    joined = ev.join(F.broadcast(stats), ev.event_type == stats.et)
    is_out = F.abs(F.col("value") - F.col("mean_v")) > sigmas * F.col("std_v")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.min(F.when(is_out, F.col("value"))).alias("min_outlier"),
            F.max(F.when(is_out, F.col("value"))).alias("max_outlier"),
        )
        .orderBy("event_type")
    )


def cohort_retention(cat: Catalog) -> DataFrame:
    """Cohort retention matrix: users grouped by FIRST-activity day, then
    for each (cohort_day, days_since) the distinct users still active and
    the retained fraction of the cohort — the standard product-analytics
    triangle.

    Scale shape: one groupBy finds each user's cohort (min ts), one
    distinct projects (user, active_day), and the cohort assignment joins
    back on user_id before the final small aggregation — the only heavy
    shuffles key on user_id, never on the (tiny) output matrix. The cohort
    size needs NO extra aggregation or join: every user is active on their
    own cohort day (it is their min ts), so the days_since=0 cell already
    counts the whole cohort — a window over the tiny matrix reads it. The
    retained fraction divides two exact counts as doubles, so it is
    engine-portable."""
    ev = cat.df("events")
    cohorts = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("active_day")).distinct()
    matrix = (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_day", F.datediff("active_day", "cohort_day").alias("days_since"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    from pyspark.sql.window import Window

    size = F.max(F.when(F.col("days_since") == 0, F.col("n_active"))).over(
        Window.partitionBy("cohort_day")
    )
    return (
        matrix.select(
            "cohort_day",
            "days_since",
            "n_active",
            (F.col("n_active").cast("double") / size.cast("double")).alias("retention"),
        )
        .orderBy("cohort_day", "days_since")
    )


def windowed_funnel(
    cat: Catalog,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    within: str = "6 HOURS",
) -> DataFrame:
    """Funnel with conversion DEADLINES: each step must follow the previous
    one within `within` — the form product analytics actually uses (an
    unbounded funnel calls a purchase a year later a conversion). Same
    set-at-a-time shape as ``funnel_counts``: one conditional-MIN aggregate
    per stage, each joined to the previous stage's per-user time; the
    deadline is one more predicate in the join filter, so the plan cost is
    identical to the unbounded funnel."""
    ev = cat.df("events").select("user_id", "event_type", "ts")
    s1, s2, s3 = steps
    win = F.expr(f"INTERVAL {within}")
    t1 = (
        ev.where(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == s2)
        .join(t1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == s3)
        .join(t2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_step1"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_step2")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_step3")))
    )
