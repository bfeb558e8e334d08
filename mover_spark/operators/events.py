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


def json_prop_stats(cat: Catalog) -> DataFrame:
    """JSON prop extraction + aggregation (mover passes jsonb through
    opaquely; we query into it with get_json_object — JVM-side, codegen)."""
    ev = cat.df("events")
    k = F.get_json_object("props", "$.k").cast("int")
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
