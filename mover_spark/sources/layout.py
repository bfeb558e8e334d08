"""Physical table layout for scale: bucketing and partitioning writers.

At 100 TB the dominant cost of the closure/join workloads is the shuffle on
join keys. Two layout tools remove it:

- ``write_bucketed``     hash-bucket (and optionally sort) a table by its
  join key at write time. Two tables bucketed the same way join with NO
  exchange on either side — the shuffle is paid once at ingest, amortized
  over every subsequent join. This is Spark's native bucketing
  (`bucketBy` + `saveAsTable`; files per bucket, bucket id from the same
  hash the shuffle would use).
- ``write_partitioned``  directory-partition by a low-cardinality column
  (e.g. event date). Predicates on the partition column prune whole
  directories at planning time — the scan never opens excluded files.

Both return the re-read DataFrame so callers can verify the layout took
effect (`assert_no_join_exchange` / scan `PartitionFilters`).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Persist `df` hash-bucketed by `bucket_cols`; returns the catalog-
    backed DataFrame (bucket metadata only survives via the table catalog —
    plain parquet round-trips lose it)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def write_partitioned(
    df: DataFrame, out_path: str, partition_cols: list[str]
) -> DataFrame:
    """Persist `df` directory-partitioned; returns the re-read DataFrame
    (filters on `partition_cols` now prune at planning time)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_path)
    return df.sparkSession.read.parquet(out_path)


def compact_parquet(
    spark: SparkSession, in_path: str, out_path: str, target_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_mb) files. Small files are the silent killer
    of large scans (one task + one open per file); compaction is the
    standing maintenance job of any long-lived 100-TB dataset. Returns the
    output file count. Uses coalesce (no shuffle) — the rows only combine,
    never redistribute."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(in_path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(in_path).coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def plan_string(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_no_join_exchange(joined: DataFrame) -> None:
    """Raise if the physical plan shuffles either join input — the check
    that bucketing actually removed the exchanges."""
    plan = plan_string(joined)
    if "Exchange" in plan:
        raise AssertionError(f"join plan still shuffles:\n{plan}")
