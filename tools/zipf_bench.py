"""BM25 postings-pruning A/B on the Zipf-vocabulary fixture (round-10
verdict item 2): live bm25_topk (tokenize the corpus per query batch) vs
bm25_from_index (persisted term-sorted index, query-vocabulary source
filter) at sf10/sf100-scale document counts.

On the standard ~30-word-vocabulary fixtures the index's term filter
prunes nothing by construction; here the ~50k-term Zipf corpus lets the
pruned scan demonstrate its shape. Emits one JSON line per run with the
build / live / indexed wall clocks; decades of the indexed number feed
the alpha row in BASELINE.md.

Usage: python tools/zipf_bench.py [.bench/zipf_sf10] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mover_spark.session import get_spark

#: head / torso / tail mix over the w<rank> Zipf vocabulary — ranks match
#: make_zipf_docs.py's V=50000 inverse-CDF naming
QUERIES = [
    (1, "w3 w127 w9421"),
    (2, "w7 w512 w18311"),
    (3, "w2 w941 w27603"),
    (4, "w11 w1733 w40007"),
    (5, "w5 w2210 w33851"),
    (6, "w13 w777 w45127"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/zipf_sf10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    tag = os.path.basename(os.path.normpath(sf_dir))

    from mover_spark.operators.retrieval import (
        bm25_from_index,
        bm25_topk,
        write_text_index,
    )

    spark = get_spark("zipf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    queries = spark.createDataFrame(QUERIES, "query_id int, query_text string")

    t0 = time.time()
    live = bm25_topk(docs, queries, k=10).collect()
    t_live = round(time.time() - t0, 3)

    idx = os.path.join("/tmp/mover_spark_textindex", tag, "zipf")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    write_text_index(docs, idx, n_term_buckets=32)
    t_build = round(time.time() - t0, 3)

    t0 = time.time()
    indexed = bm25_from_index(spark, idx, queries, k=10).collect()
    t_indexed = round(time.time() - t0, 3)

    # same ranking from both paths, or the bench numbers mean nothing
    key = lambda rows: sorted((r.query_id, r.rank, r.doc_id) for r in rows)
    assert key(live) == key(indexed), "live vs indexed ranking diverged"

    row = {
        "fixture": tag,
        "n_docs": docs.count(),
        "live_sec": t_live,
        "index_build_sec": t_build,
        "indexed_sec": t_indexed,
        "n_queries": len(QUERIES),
        "n_results": len(live),
    }
    print(json.dumps(row))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(row, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
