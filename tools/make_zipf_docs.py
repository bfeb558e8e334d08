"""Materialize a REALISTIC-VOCABULARY documents fixture for the BM25
scale bench (round-10 verdict item 2).

The standard replicated fixtures carry a ~30-word template vocabulary, so
every query term appears in nearly every document and an inverted index's
postings pruning prunes nothing BY CONSTRUCTION (round-9 measured
bm25_topk_persisted at alpha 0.99 because of this, not because the plan
is wrong). This generator writes a documents table with the same row
counts but a Zipf-distributed ~50k-term vocabulary — the shape real
corpora have — so term-pruned postings scans have something to prune.

Bench-only: correctness/oracle checks stay on the deterministic standard
fixtures; nothing here feeds CORRECTNESS_r*.

Deterministic, no RNG: word ranks come from xxhash64(doc_id, position)
mapped through the Zipf(s=1) inverse CDF (rank ~ V^u, u uniform), so
re-running the generator reproduces the same corpus bit-for-bit.

Usage:  python tools/make_zipf_docs.py [factor] [out_dir]
        # factor like make_sf.py: 100 -> .bench/zipf_sf10 (500k docs),
        # 1000 -> .bench/zipf_sf100 (5M docs); base is 5k docs at sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mover_spark.session import get_spark

BASE_DOCS = 5_000  # documents rows at sf0.1
VOCAB = 50_000


def zipf_documents(spark, n_docs: int):
    """n_docs rows (doc_id, text, lang, source, n_chars) with Zipf text."""
    # u in [0,1) from a position-keyed hash; rank = floor(V^u) gives
    # P(rank = k) ~ 1/k (inverse CDF of Zipf s=1 whose CDF ~ ln k/ln V)
    word = (
        "concat('w', cast(pow({v}, pmod(xxhash64(id, p), 16777216) / 16777216.0) "
        "as int))".format(v=VOCAB)
    )
    return (
        spark.range(n_docs)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.expr(
                    f"transform(sequence(1, 30 + pmod(xxhash64(id), 41)), "
                    f"p -> {word})"
                ),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(
                F.lit("crawl-"), (F.col("id") % 5).cast("string")
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".bench", f"zipf_sf{factor / 10:g}")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-zipf")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = zipf_documents(spark, BASE_DOCS * factor)
    path = os.path.join(out_dir, "documents.parquet")
    docs.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"wrote {n} zipf docs to {path} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
