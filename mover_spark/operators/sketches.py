"""Sketch operators: approximate answers in one narrow pass — the 100-TB
path for cardinality, heavy hitters, and join pruning where exact answers
need a shuffle the pipeline can't afford.

- ``kmv_distinct``        K-minimum-values cardinality (Bar-Yossef et al.,
  RANDOM'02): keep the k smallest normalized hashes; estimate
  (k-1)/max_kth. Deterministic (engine-portable md5-derived hash, so the
  DuckDB oracle reproduces it bit-for-bit), mergeable (min-merge), and a
  pure limit+agg — unlike HLL the state is inspectable.
- ``heavy_hitters``       frequent items: single-pass candidate generation
  (Spark's freqItems — Karp/Misra-Gries family, no shuffle), then ONE
  exact aggregation restricted to the candidates via a broadcast semi-join.
  Output is exact; the sketch only bounds what gets counted.
- ``bloom_semi_join``     large⋉large semi-join pre-filter: the filter side
  collapses to a numpy bit array (xxhash64 double hashing, OR-merged from
  one bitmap per partition), broadcast to an Arrow-vectorized probe. No
  shuffle of either side; false positives <= fpp, never false negatives —
  compose with an exact join when exactness is required.

Estimates are approximate vs the TRUE answer but deterministic in their
inputs — KMV hash-checks exactly against the oracle; HLL/Bloom accuracy
bounds are pinned by tests and contract booleans.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 60)  # md5_i64 range: [0, 2^60)


_INTEGRAL_DTYPES = ("tinyint", "smallint", "int", "bigint")


def kmv_distinct(
    df: DataFrame, cols: list[str], k: int = 256, small_keys: bool = False
) -> DataFrame:
    """KMV distinct-count estimate of `cols` tuples: one narrow pass + a
    k-row reduction. Relative error ~ 1/sqrt(k-2) (~6% at k=256).

    Hashing is engine-portable so a DuckDB oracle reproduces the estimate
    EXACTLY — the sketch is approximate vs the true count but deterministic
    in its inputs. A single integral key takes the arithmetic fast path
    (util.mix31_i64: affine mod 2^31-1, pure bigint math) — but that hash's
    portability/bijectivity contract only holds for NONNEGATIVE keys below
    2^31 (negatives diverge from the SQL mirror: Spark pmod vs SQL %;
    values >= 2^31 wrap mod 2^31-1 and add collisions that bias the
    estimate on very large key domains). The fast path therefore requires
    the caller to assert the domain with ``small_keys=True`` (keys known
    nonnegative and < 2^31 — e.g. TPC-H surrogate keys at moderate SF);
    unasserted integral keys, strings, and multi-col tuples
    (unit-separator join of their string forms) pay the md5-derived
    60-bit hash, which is safe on the full value domain."""
    from ..util import MIX31_P, md5_i64, mix31_i64

    dtype = dict(df.dtypes)[cols[0]] if len(cols) == 1 else None
    if small_keys and dtype in _INTEGRAL_DTYPES:
        h, space = mix31_i64(cols[0]), float(MIX31_P)
    else:
        key = (
            F.col(cols[0]).cast("string")
            if len(cols) == 1
            else F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
        )
        h, space = md5_i64(key), HASH_SPACE
    kth = (
        df.select(h.alias("h"))
        .dropDuplicates(["h"])
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept"))
    )
    return kth.select(
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")  # fewer than k distinct: exact
        )
        .otherwise((k - 1) / (F.col("kth") / F.lit(space)))
        .alias("distinct_est")
    )


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.01) -> DataFrame:
    """Items appearing in more than `min_share` of rows. freqItems generates
    a superset of candidates in one pass without shuffling the column's full
    distinct; the exact count then aggregates ONLY candidate rows."""
    spark = df.sparkSession
    total = df.count()
    cand = df.stat.freqItems([col], support=min_share).collect()[0][0]
    cand_df = spark.createDataFrame([(c,) for c in cand], f"{col} {dict(df.dtypes)[col]}")
    return (
        df.join(F.broadcast(cand_df), on=[col], how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_share * total)
        .orderBy(F.desc("cnt"), col)
    )


#: words (uint64) per bloom build/merge chunk — 8 MiB blobs: big enough
#: that a 126 MB bitmap is ~16 rows, small enough that no JVM stage ever
#: materializes a >8 MiB single allocation for the merge
_BLOOM_CHUNK_WORDS = (8 << 20) // 8


def _bloom_params(expected: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64  # whole words
    k = max(1, round(m / expected * math.log(2)))
    return m, k


def _hash_pair(col: str):
    """Two independent 64-bit hashes, JVM-side (double hashing: bit index i
    is (h1 + i*h2) mod m — Kirsch & Mitzenmacher, ESA'06)."""
    return (
        F.xxhash64(F.col(col)).alias("__h1"),
        F.xxhash64(F.col(col), F.lit(0x9E3779B9)).alias("__h2"),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, n_hashes: int, m_bits: int) -> np.ndarray:
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return (
        h1.astype(np.uint64)[:, None] + i * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m_bits)


def bloom_semi_join(
    probe: DataFrame,
    filter_side: DataFrame,
    probe_col: str,
    filter_col: str,
    expected: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Keep probe rows whose key is (probably) present in filter_side.

    Build: one bitmap per partition (mapInPandas), OR-merged on the driver
    — bits cross the wire, never rows. Probe: the bitmap broadcasts and an
    Arrow-vectorized predicate tests all n_hashes bits per batch.

    ``expected`` sizes the bitmap; None (default) counts filter_side first
    — one cheap extra action that keeps the fpp contract at ANY scale. A
    hardcoded value silently degrades as data grows: 10× the keys into the
    same bits turns a 1% filter into a mostly-pass-through one (measured
    6×/decade growth on the composed prefilter query before auto-sizing)."""
    if expected is None:
        expected = max(1, filter_side.count())
    m_bits, n_hashes = _bloom_params(expected, fpp)
    words = m_bits // 64

    def build(batches):
        bitmap = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            if len(pdf):
                pos = _positions(
                    pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), n_hashes, m_bits
                ).ravel()
                np.bitwise_or.at(
                    bitmap, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        # emit CHUNKS, not the whole bitmap: an auto-sized 100M-key filter
        # is ~126 MB per partition bitmap, and shipping n_partitions such
        # blobs through the JVM (the old whole-bitmap treeAggregate did,
        # via Arrow + pickle) was a measured multi-GB transient that
        # flakily OOMed a 16g heap at the 100x fixture. Chunk rows cap the
        # largest single allocation any JVM stage sees at _BLOOM_CHUNK
        # bytes; all-zero chunks (sparse corners of a partition's bitmap)
        # are skipped entirely.
        for c0 in range(0, words, _BLOOM_CHUNK_WORDS):
            chunk = bitmap[c0 : c0 + _BLOOM_CHUNK_WORDS]
            if chunk.any():
                yield pd.DataFrame(
                    {"chunk": [c0 // _BLOOM_CHUNK_WORDS], "bitmap": [chunk.tobytes()]}
                )

    def _or(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, dtype=np.uint64) | np.frombuffer(b, dtype=np.uint64)
        ).tobytes()

    # OR-merge per chunk key executor-side (reduceByKey streams pairwise
    # merges, so a reducer holds at most two chunk blobs at once), then
    # assemble the single full bitmap driver-side — one copy, ~m_bits/8
    # bytes total over the wire regardless of partition count.
    chunk_rows = (
        filter_side.select(*_hash_pair(filter_col))
        .mapInPandas(build, "chunk long, bitmap binary")
        .rdd.map(lambda r: (r.chunk, r.bitmap))
        .reduceByKey(_or)
        .collect()
    )
    full = np.zeros(words, dtype=np.uint64)
    for cid, blob in chunk_rows:
        c0 = cid * _BLOOM_CHUNK_WORDS
        full[c0 : c0 + len(blob) // 8] = np.frombuffer(blob, dtype=np.uint64)
    bc = probe.sparkSession.sparkContext.broadcast(full.tobytes())

    @F.pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint64)
        pos = _positions(h1.to_numpy(), h2.to_numpy(), n_hashes, m_bits)
        hit = (
            bm[(pos >> np.uint64(6)).astype(np.int64)]
            & (np.uint64(1) << (pos & np.uint64(63)))
        ) != 0
        return pd.Series(hit.all(axis=1))

    h1, h2 = _hash_pair(probe_col)
    return (
        probe.withColumn("__h1", F.xxhash64(F.col(probe_col)))
        .withColumn("__h2", F.xxhash64(F.col(probe_col), F.lit(0x9E3779B9)))
        .where(might_contain(F.col("__h1"), F.col("__h2")))
        .drop("__h1", "__h2")
    )


def approx_distinct_check(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rsd: float = 0.02,
    tol: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ cardinality with its accuracy contract checked
    in-query: per group, the exact distinct count next to a boolean
    asserting approx_count_distinct landed within `tol`. The sketch is
    the 100-TB path (fixed kilobytes of state per group, map-side
    mergeable, no distinct-shuffle); the exact count is the per-SF audit.
    Spark's HLL is hash-based and merge-commutative, so the approx value —
    and therefore the boolean — is deterministic for a given dataset."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count_distinct(F.col(key_col)).alias("n_exact"),
            F.approx_count_distinct(key_col, rsd=rsd).alias("n_approx"),
        )
        .select(
            group_col,
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(tol)
            ).alias("within_tol"),
        )
        .orderBy(group_col)
    )


def approx_quantile_check(
    df: DataFrame,
    value_col: str,
    group_col: str,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna) with its rank-error contract
    checked in-query: per group, the exact interpolated median next to a
    boolean asserting the sketch's median lies inside the exact
    [p49, p51] bracket. GK guarantees rank error <= n/accuracy (15 ranks
    at n=150k, far inside the 1%-rank bracket), so the boolean is stable
    under ANY partitioning/merge order even though the sketch value
    itself is not bit-pinned — that is what makes the query
    hash-checkable while still exercising the sketch path a 100-TB
    percentile computation would take."""
    return (
        df.groupBy(group_col)
        .agg(
            # one sorted buffer for all three exact quantiles (the scalar
            # form buffers + sorts the group's values once per quantile)
            F.expr(
                f"percentile({value_col}, array(0.49, 0.5, 0.51))"
            ).alias("px"),
            F.expr(
                f"approx_percentile({value_col}, 0.5, {accuracy})"
            ).alias("ap50"),
        )
        .select(
            group_col,
            F.round(F.col("px")[1], 6).alias("p50_exact"),
            ((F.col("ap50") >= F.col("px")[0]) & (F.col("ap50") <= F.col("px")[2])).alias(
                "sketch_in_bracket"
            ),
        )
        .orderBy(group_col)
    )
