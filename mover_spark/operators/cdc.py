"""Change-data-capture shapes: changelog compaction and SCD-2 intervals.

The reference's load path is an idempotent ON CONFLICT DO NOTHING insert
(/root/reference/dialect/postgres/postgres.go:466-481) — first write wins
and history is discarded. A warehouse ingesting the same changelogs needs
the two complementary operators this module provides:

- ``latest_snapshot``   keep only the NEWEST version of each key (last
  write wins) — the compaction every CDC mirror runs before serving reads.
  Implemented as ONE hash aggregation: ``max(struct(order_cols...,
  payload...))`` exploits Spark's lexicographic struct ordering, so the
  plan is a map-side-partial agg with no window sort — at 100 TB this is
  a single shuffle of partial maxima, not a full sort of every version.
- ``scd2_intervals``    expand the same changelog into slowly-changing-
  dimension type-2 validity intervals ([valid_from, valid_to) per version,
  NULL-open for the current row) via one ``lead()`` window — one shuffle
  +sort per key partition, the minimum any interval construction needs.

Determinism: version order is (ts, id) with the unique id as tie-break, so
same-timestamp versions resolve identically on any engine/partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_snapshot(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload: list[str],
) -> DataFrame:
    """Last-write-wins compaction: one row per `keys`, the version with the
    greatest `order_cols` tuple. `order_cols` must end in a unique
    tie-break column (e.g. the event/version id) for determinism.

    Plan shape: groupBy(keys).max(struct(...)) — struct comparison is
    field-lexicographic, so the max carries the payload of the winning
    version. Partial aggregation runs map-side; only one partial row per
    key per partition crosses the exchange (vs a window formulation that
    shuffles and sorts EVERY version)."""
    packed = F.struct(*[F.col(c) for c in order_cols + payload]).alias("v")
    agg = df.groupBy(*keys).agg(F.max(packed).alias("v"))
    out_cols = [F.col(k) for k in keys]
    out_cols += [F.col(f"v.{c}").alias(f"last_{c}") for c in order_cols + payload]
    return agg.select(*out_cols)


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    attrs: list[str],
) -> DataFrame:
    """SCD type-2 expansion: each version of a key becomes a validity
    interval [valid_from, valid_to), where valid_to is the next version's
    timestamp (NULL = still current). One window per key partition ordered
    by (ts, tiebreak) — deterministic under same-timestamp versions."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return df.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an insert/update/delete changelog to a base snapshot — the
    MERGE every CDC mirror runs per sync cycle. Per key, only the NEWEST
    change (by `order_cols`, ending in a unique tie-break) decides: a
    delete removes the key, anything else replaces/creates the row.

    Plan shape: compact the changelog first (one hash agg — the cheap
    side), then ONE anti-join drops every changed key from the base and a
    union adds the surviving upserts. The base — the 100-TB side — is
    scanned once and never shuffled beyond the anti-join; with the compact
    changelog below the broadcast threshold AQE makes even that join
    shuffle-free."""
    last = latest_snapshot(changes, keys, order_cols, payload + [op_col])
    # null-safe inequality: a NULL op is an upsert, not a delete — the
    # plain != evaluated NULL for a null op, dropping the key from base
    # AND from survivors, i.e. silently deleting it
    survivors = last.where(
        ~F.col(f"last_{op_col}").eqNullSafe(delete_op)
    ).select(*keys, *[F.col(f"last_{c}").alias(c) for c in payload])
    untouched = base.join(last.select(*keys), keys, "left_anti")
    return untouched.select(*keys, *payload).unionByName(survivors)
