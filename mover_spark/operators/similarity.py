"""Similarity search over the `embeddings` table (array<float>, dim 64).

Two paths:
- ``brute_force_topk``  exact top-k cosine for a query set — one broadcast
  join + per-partition ranking; the correctness baseline and the oracle
  anchor (quantized-integer math, engine-exact; see dedup.qcosine).
- ``lsh_topk``          random-hyperplane LSH: 16-bit signatures, bucket
  join (optionally multi-probe hamming-1), exact re-rank inside buckets.
  The 100-TB path: candidate generation is a hash-partitioned equi-join on
  (bucket), never an all-pairs product; probe count trades recall for cost.

Design for scale: queries are broadcast (they're small by definition);
corpus-side work is embarrassingly parallel; the final top-k is a
per-query-partition window, k rows per query cross the wire.
"""

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import qcosine, quantized_vec

EMB_DIM = 64
# 6 planes -> 64 buckets: sized so buckets stay populated at the test SFs;
# at cluster scale raise toward log2(n_vectors / target_bucket_size)
N_PLANES = 6
_rng = random.Random(7)
#: baked ±1 hyperplanes (deterministic across runs/engines)
HYPERPLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(EMB_DIM)] for _ in range(N_PLANES)
]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query vector. Deterministic ranking:
    quantized-integer cosine, ties broken by neighbor id."""
    from .dedup import qdot

    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    # norms precomputed per side: one interpreted dot-product per candidate
    # pair, not three (see ivf_topk)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc"))
        .withColumn("cnorm", F.sqrt(qdot(F.col("qc"), F.col("qc")).cast("double")))
        .repartition(par)  # nested-loop parallelism follows the corpus side
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq")
    ).withColumn("qnorm", F.sqrt(qdot(F.col("qq"), F.col("qq")).cast("double")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                qdot(F.col("qq"), F.col("qc")).cast("double") / (F.col("qnorm") * F.col("cnorm")), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


N_CENTROIDS = 16
N_PROBE = 4


def _ranked_cells_udf(cents: list[tuple[int, list[int]]]):
    """Vectorized (Arrow/numpy) centroid scorer: for each input quantized
    vector, returns every cell id ranked best-first by (cosine desc, cid asc).

    One int64 matmul per batch — exact: quantized entries are <= 1e3, so
    dot products (< 2^27 per term, < 2^33 summed) never round, making the
    scores bit-identical to the JVM fold and the DuckDB oracle in ANY
    summation order. This is the piece that scales to real quantizers:
    at 4096 centroids a per-row expression tree is untenable, while the
    (batch x dim) @ (dim x cells) matmul stays a single BLAS call."""
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)  # ascending
    C = np.array([v for _, v in cents], dtype=np.int64)  # (m, d)
    cnorms = np.sqrt((C * C).sum(axis=1).astype(np.float64))

    @F.pandas_udf("array<long>")
    def ranked(batch: pd.Series) -> pd.Series:
        M = np.array(batch.tolist(), dtype=np.int64)  # (n, d)
        dots = (M @ C.T).astype(np.float64)
        qn = np.sqrt((M * M).sum(axis=1).astype(np.float64))
        cos = dots / (qn[:, None] * cnorms[None, :])
        # lexsort: primary -cos asc (== cos desc), secondary index asc ==
        # cid asc (cids are sorted) — matches the oracle's ROW_NUMBER order
        order = np.argsort(-cos, axis=1, kind="stable")
        return pd.Series(list(cids[order]))

    return ranked


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    into n_centroids cells; each query exactly re-ranks only its n_probe
    nearest cells — the classic FAISS-style index expressed as DataFrames.

    The quantizer here is deterministic (the n_centroids smallest-id
    vectors) rather than k-means, so results are reproducible and oracle-
    checkable; swapping in trained centroids changes recall, not the plan.
    Scale shape: centroids are collected once (tiny) and shipped inside the
    Arrow-vectorized scorer closure, so cell assignment is a narrow map —
    the only shuffle is the (cell)-keyed candidate join, touching
    n_probe/n_centroids of the corpus per query."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc"))
    cents = [
        (r.neighbor_id, r.qc)
        for r in c.orderBy("neighbor_id").limit(n_centroids).collect()
    ]
    ranked = _ranked_cells_udf(cents)

    from .dedup import qdot

    # norms ride along through the join: the per-candidate re-rank then costs
    # ONE dot-product aggregate instead of three (higher-order functions are
    # interpreted, not codegen'd — tripling them tripled the hot-path cost)
    assigned = c.withColumn(
        "cnorm", F.sqrt(qdot(F.col("qc"), F.col("qc")).cast("double"))
    ).withColumn("cid", ranked(F.col("qc"))[0])
    q = queries.select(F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq"))
    probes = q.withColumn(
        "qnorm", F.sqrt(qdot(F.col("qq"), F.col("qq")).cast("double"))
    ).withColumn("cid", F.explode(F.slice(ranked(F.col("qq")), 1, n_probe)))

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        assigned.join(F.broadcast(probes), on=["cid"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        # multiply order matches the oracle: query norm first
        .withColumn(
            "cosine",
            F.round(
                qdot(F.col("qq"), F.col("qc")).cast("double")
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _signature(qv: Column) -> Column:
    """16-bit random-hyperplane signature of a quantized vector."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(HYPERPLANES):
        arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(qv, arr, lambda x, p: x * p),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.shiftleft(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), j)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probes: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join + exact re-rank.

    probes=0 searches only the query's own bucket; probes=1 additionally
    searches the 16 hamming-1 buckets (recall up, cost x17 — still linear).
    """
    from .dedup import qdot

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc"))
        .withColumn("cnorm", F.sqrt(qdot(F.col("qc"), F.col("qc")).cast("double")))
        .withColumn("bucket", _signature(F.col("qc")))
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq"))
        .withColumn("qnorm", F.sqrt(qdot(F.col("qq"), F.col("qq")).cast("double")))
        .withColumn("sig", _signature(F.col("qq")))
    )

    flips = [F.col("sig")]
    if probes >= 1:
        flips += [F.col("sig").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)]
    q = q.withColumn("bucket", F.explode(F.array(*flips)))

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), on=["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qq", "qc", "qnorm", "cnorm")
        .dropDuplicates(["query_id", "neighbor_id"])  # multi-probe may re-find
        .withColumn(
            "cosine",
            F.round(
                qdot(F.col("qq"), F.col("qc")).cast("double") / (F.col("qnorm") * F.col("cnorm")), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
