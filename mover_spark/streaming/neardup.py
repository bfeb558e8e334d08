"""Streaming near-duplicate detection: an incoming document stream probed
against a STATIC corpus LSH index — the continuous-ingestion twin of the
batch MinHash pipeline (operators/dedup.py), the shape a training-data
pipeline needs to reject near-dups of an already-collected corpus as new
data arrives. (The reference, ulule/mover, is strictly batch — this is
part of the streaming extension surface, like streaming/events.py.)

Scale design — deliberately STATELESS:
- The corpus index is LEAN: (doc, band, bucket, band-hash array) — 12
  rows of a few longs per doc, no text payload; at cluster scale it
  lives as a bucketed table keyed by (band, bucket). Shingle arrays are
  fetched by a SECOND stream-static join only for the few rows that
  survive banding + emit-once — corpus text is never duplicated 12×
  across band rows.
- Each micro-batch shingles + minhashes its documents with THE SAME
  projection as batch (dedup.signature_projection — one definition, so
  stream and corpus band hashes can never drift apart), explodes
  LSH_BANDS rows per doc, and equi-joins the static index on
  (band, bucket): a stream-static inner join, no state store.
- A pair colliding in several bands must be emitted exactly once
  WITHOUT a stateful distinct: both sides carry their per-band
  bucket-hash arrays, so "is this the FIRST band where the two
  signatures agree" is a pure per-row predicate (zip_with equality +
  array_position) — the same emit-once trick the batch interval-overlap
  join uses.
- Survivors verify EXACT Jaccard on the two shingle arrays.
Result: output is identical no matter how the stream is micro-batched,
append-mode, zero state — so availableNow over the fixture equals the
batch cross-side pair enumeration, which the DuckDB oracle checks
exactly (same recall argument as batch dedup_minhash_lsh:
P(miss | j >= 0.8+0.1) ~ 3e-6 with 12 bands x 4 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mover_spark.operators.dedup import (
    LSH_BANDS,
    N_MINHASH,
    _signatures,
    jaccard_col,
    signature_projection,
)

_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

#: stream/corpus split of the documents fixture: every 5th doc "arrives"
STREAM_MOD = 5


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fixture as a file stream (glob: FileStreamSource needs a
    directory or pattern, and the fixture ships both single-file and
    directory layouts)."""
    return spark.readStream.schema(_DOCS_SCHEMA).parquet(
        f"{sf_dir}/documents.parque*"
    )


def _band_hashes(mhs_col: str = "mhs") -> F.Column:
    """array<long> of LSH_BANDS bucket hashes — band b hashes its
    rows-per-band signature slice; equality of element b IS bucket
    collision in band b."""
    r = N_MINHASH // LSH_BANDS
    return F.array(
        *[
            F.xxhash64(*[F.col(mhs_col)[b * r + i] for i in range(r)])
            for b in range(LSH_BANDS)
        ]
    )


def corpus_lsh_index(
    corpus: DataFrame, index_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(index, shingles): the lean probe target — one (band, bucket) row
    per corpus doc per band carrying only the doc id and its band-hash
    array — plus the (doc, shingles) side table verification joins
    against AFTER emit-once pruning. Both build off the session
    signature memo, so batch dedup consumers and the stream share one
    signature pass per corpus.

    With ``index_path`` (a dedup.write_signature_index location) the
    signature pass is LOADED from the persisted cross-run index instead
    of recomputed — the long-running-detector shape: the corpus index is
    refreshed by a scheduled writer job while the stream only reads
    parquet (constants are validated by read_signature_index, so a
    stale-format index raises rather than silently never colliding)."""
    if index_path is not None:
        from mover_spark.operators.dedup import read_signature_index

        sig, _ = read_signature_index(corpus.sparkSession, index_path)
    else:
        sig = _signatures(corpus)
    index = sig.select(
        F.col("doc_id").alias("doc_corpus"), _band_hashes().alias("bh_c")
    ).select(
        "doc_corpus", "bh_c", F.posexplode("bh_c").alias("band", "bucket")
    )
    shingles = sig.select(
        F.col("doc_id").alias("doc_corpus"), F.col("sh").alias("sh_c")
    )
    return index, shingles


def neardup_detect_stream(
    stream_docs: DataFrame,
    index: DataFrame,
    corpus_shingles: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_stream, doc_corpus, jaccard) for every stream document whose
    exact Jaccard with a corpus document reaches `threshold`, surfaced by
    LSH band collision. Stateless — see module docstring."""
    sig = signature_projection(
        stream_docs.select(F.col("doc_id"), F.col("text"))
    ).select(
        F.col("doc_id").alias("doc_stream"),
        F.col("sh").alias("sh_s"),
        _band_hashes().alias("bh_s"),
    ).select(
        "doc_stream",
        "sh_s",
        "bh_s",
        F.posexplode("bh_s").alias("band", "bucket"),
    )
    joined = sig.join(index, on=["band", "bucket"])
    first_band = F.array_position(
        F.zip_with("bh_s", "bh_c", lambda a, b: a == b), F.lit(True)
    )
    return (
        joined.where(first_band == F.col("band") + 1)  # emit-once per pair
        .join(corpus_shingles, on=["doc_corpus"])      # late shingle fetch
        .withColumn(
            "jaccard", F.round(jaccard_col(F.col("sh_s"), F.col("sh_c")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_stream", "doc_corpus", "jaccard")
    )


#: monotone drain names, same convention as streaming/events.py — a fixed
#: queryName would collide on concurrent drains and let a holder of run
#: 1's DataFrame read run 2's partially-filled replacement sink
_DRAIN_SEQ = [0]


def neardup_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the detector with availableNow and return the result batch
    DataFrame — the driver-contract entry (hash-checked against the exact
    cross-side Jaccard pair SQL)."""
    from mover_spark.catalog import Catalog
    from mover_spark.streaming.events import fixture_bytes, run_to_memory

    docs = Catalog(spark, sf_dir).df("documents")
    corpus = docs.where(F.col("doc_id") % STREAM_MOD != 0)
    index, corpus_shingles = corpus_lsh_index(corpus)
    stream = read_documents_stream(spark, sf_dir).where(
        F.col("doc_id") % STREAM_MOD == 0
    )
    _DRAIN_SEQ[0] += 1
    name = f"neardup_stream_{_DRAIN_SEQ[0]}"
    run_to_memory(
        neardup_detect_stream(stream, index, corpus_shingles),
        name,
        output_mode="append",
        # size-adapted like every drain: though the drain itself is
        # stateless, the (band, bucket) equi-join re-shuffles the STATIC
        # index (12 rows/doc) each micro-batch, and at the 100x fixture
        # the 4-partition floor made that sort spill — 321 s vs 155 s at
        # 32 partitions (the one super-linear scaler in the sf100 decade
        # table). At sf10 the floor and 32 measure identical (15.4/17.9
        # vs 15.7/16.2 s isolated cold pairs), so scaling up is free.
        input_bytes=fixture_bytes(sf_dir, "documents"),
    )
    from mover_spark.streaming.events import drained_table

    return drained_table(spark, name).orderBy("doc_stream", "doc_corpus")
