"""Interchange formats beyond parquet and the JSON envelope: CSV and ORC.

The reference moves data only as its JSON envelope (etl/engine.go:141-164);
a Spark engine should also speak the interchange formats ETL counterparts
commonly hand it. Schema discipline mirrors the envelope loader: CSV is
schema-directed on read (header + type inference are NOT trusted — the
catalog's schema is applied, like valuesToPairs consulting the introspected
DataType, postgres/util.go:29-107); ORC carries its own schema.

Scale notes: both writers are executor-parallel (one file per partition);
CSV is the slow path (row-oriented, no predicate pushdown, full-row parse)
and the docstrings say so — it exists for interchange, not for analytics
storage. ORC keeps columnar pruning/pushdown like parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: ISO-8601 with microseconds — value-preserving for the fixture's
#: microsecond timestamps (default CSV format drops sub-seconds)
CSV_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    """Executor-parallel CSV with header + lossless timestamp format."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", CSV_TS_FMT)
        .option("timestampNTZFormat", CSV_TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-DIRECTED CSV read: the caller's schema is law, inference is
    off — type drift fails loudly at parse instead of silently downstream."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", CSV_TS_FMT)
        .option("timestampNTZFormat", CSV_TS_FMT)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read across parquet batches written at different
    schema versions: mergeSchema unions the per-file footers, so columns
    added by later pipeline versions surface as nullable for older files
    instead of failing the scan or silently disappearing (the default
    read takes ONE file's schema). The per-file footer merge happens at
    planning time on file metadata only — no data pass — which is what
    makes evolution viable over a 100-TB landing zone where old batches
    are never rewritten."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines writer (one object per line, executor-parallel, one
    file per partition) — the lingua franca of LLM corpus interchange.
    Distinct from the reference's envelope format (etl/engine.go:141-164,
    handled by sources/jsonio): no wrapper object, no count, streamable
    line-by-line."""
    (
        df.write.mode("overwrite")
        .option("timestampFormat", CSV_TS_FMT)
        .option("timestampNTZFormat", CSV_TS_FMT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-DIRECTED JSONL read (same discipline as read_csv: the
    catalog's schema is law, inference off — a malformed line fails
    loudly via FAILFAST instead of silently nulling columns)."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", CSV_TS_FMT)
        .option("timestampNTZFormat", CSV_TS_FMT)
        .json(path)
    )
