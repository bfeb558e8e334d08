"""Deterministic sampling and dataset splitting.

Training pipelines need REPRODUCIBLE sampling: the same row must land in
the same split on every run, engine, and cluster size — which rules out
`df.sample()`/`sampleBy()` (seeded rand() is partition-order dependent).
The tool here is arithmetic key hashing: Knuth's multiplicative hash of the
row's id is uniform, stable, and expressible in ANY engine (plain bigint
math), so splits are portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio
M32 = 1 << 32


def hash_bucket(id_col: Column | str, buckets: int = 10_000) -> Column:
    """Uniform stable bucket in [0, buckets) from an integer id — Knuth
    multiplicative hashing in plain bigint math (portable to any engine)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c * F.lit(KNUTH), F.lit(M32)), F.lit(buckets))


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, float] | None = None
) -> DataFrame:
    """Tag each row with a deterministic split label. `splits` maps label ->
    fraction (must sum to <= 1; remainder falls into the last label).
    Stable: re-running, re-partitioning, or re-scaling never moves a row."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(id_col)
    expr = None
    lo = 0.0
    labels = list(splits.items())
    for name, frac in labels[:-1]:
        hi = lo + frac
        cond = (b >= int(lo * 10_000)) & (b < int(hi * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Stable `fraction` sample by id hash — same rows every run."""
    return df.where(hash_bucket(id_col) < int(fraction * 10_000))
