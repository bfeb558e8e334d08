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

from __future__ import annotations

import random

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
    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc")
    ).repartition(par)  # nested-loop parallelism follows the corpus side
    q = queries.select(F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(qcosine(F.col("qq"), F.col("qc")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


N_CENTROIDS = 16
N_PROBE = 4


def _lit_vec(vals: list[int]) -> Column:
    return F.array(*[F.lit(int(v)) for v in vals])


def _nearest_centroids(qv: Column, cents: list[tuple[int, list[int]]]) -> Column:
    """Array of (cosine, cid) structs vs every literal centroid, sorted
    best-first (desc cosine, asc cid) — a pure per-row expression."""
    structs = [
        F.struct(
            (-qcosine(qv, _lit_vec(cvec))).alias("neg_cos"), F.lit(cid).cast("long").alias("cid")
        )
        for cid, cvec in cents
    ]
    return F.array_sort(F.array(*structs))  # struct order: neg_cos asc == cos desc, then cid asc


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
    Scale shape: centroids are collected once (tiny) and baked into the
    plan as literals, so cell assignment is a narrow map — the only
    shuffle is the (cell)-keyed candidate join, touching n_probe/n_centroids
    of the corpus per query."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc"))
    cents = [
        (r.neighbor_id, r.qc)
        for r in c.orderBy("neighbor_id").limit(n_centroids).collect()
    ]

    assigned = c.withColumn("cid", _nearest_centroids(F.col("qc"), cents)[0]["cid"])
    q = queries.select(F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq"))
    probes = q.withColumn(
        "cid", F.explode(F.slice(_nearest_centroids(F.col("qq"), cents), 1, n_probe)["cid"])
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        assigned.join(F.broadcast(probes), on=["cid"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(qcosine(F.col("qq"), F.col("qc")), 6))
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
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantized_vec(vec_col).alias("qc")
    ).withColumn("bucket", _signature(F.col("qc")))
    q = queries.select(
        F.col(id_col).alias("query_id"), quantized_vec(vec_col).alias("qq")
    ).withColumn("sig", _signature(F.col("qq")))

    flips = [F.col("sig")]
    if probes >= 1:
        flips += [F.col("sig").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)]
    q = q.withColumn("bucket", F.explode(F.array(*flips)))

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), on=["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qq", "qc")
        .dropDuplicates(["query_id", "neighbor_id"])  # multi-probe may re-find
        .withColumn("cosine", F.round(qcosine(F.col("qq"), F.col("qc")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
