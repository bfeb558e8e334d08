"""Streaming ANN probe A/B with PRODUCTION cell counts (round-10 verdict
item 3): parity (all-cells ADC per batch) vs per-query-cell pruned probe
over a k-means/auto_ivf_params index (~sqrt(n) cells), on the standard
embeddings fixtures at sf10/sf100 scale.

The 16-cell deterministic quantizer that keeps the driver-facing oracle
exact makes pruning a no-op by construction (any few-hundred-query batch
unions all 16 cells). This bench builds the index the way production
would — auto_ivf_params cells from distributed k-means — and runs the
SAME streaming drain twice over it:

- parity: n_probe=None, every batch ADC-scans every code (the quadratic
  correctness shape);
- pruned: per_query_cells=True with n_probe cells per query, so per-batch
  scoring cost is nq * n_probe * (n/cells) — the linear shape.

Reports wall clocks plus recall@k of pruned vs parity (the measured cost
of approximation, not assumed). Bench-only: rows-only evidence for
BASELINE.md; the oracle surface stays on the 16-cell index.

Usage: python tools/annprobe_bench.py [.bench/sf10] [n_probe] [out.json] \
           [stream|batch] [query_mod]

`batch` mode measures ONE micro-batch's probe cost directly through
pq_topk_from_loaded (parity vs per-query-cells) on a query set of
vec_id % query_mod == 0 — the unit a streaming drain repeats. This is
the only honest sf100 A/B: the full 100k-query parity drain is
O(|stream| x |codes|) BY CONSTRUCTION (~hours on this box, the same
reason round 9 declined full-stream sf100 probe rows), while the
per-batch cost is what capacity planning actually multiplies.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mover_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf10"
    n_probe_arg = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    mode = sys.argv[4] if len(sys.argv) > 4 else "stream"
    query_mod = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    tag = os.path.basename(os.path.normpath(sf_dir))

    from mover_spark.catalog import Catalog
    from mover_spark.operators.similarity import (
        auto_ivf_params,
        train_ivf_centroids,
        write_ann_index,
    )
    from mover_spark.streaming.annprobe import (
        STREAM_MOD,
        ann_probe_stream,
        read_embeddings_stream,
    )

    os.environ["SPARK_GRAFT_PROBE_MULTIBATCH_OK"] = "1"
    spark = get_spark("annprobe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = Catalog(spark, sf_dir).df("embeddings")
    corpus = emb.where(F.col("vec_id") % STREAM_MOD != 0)
    n_corpus = corpus.count()
    n_cells, auto_probe = auto_ivf_params(n_corpus)
    n_probe = n_probe_arg or auto_probe

    idx = os.path.join("/tmp/mover_spark_annindex_bench", tag)
    keep = os.environ.get("ANNPROBE_BENCH_KEEP_INDEX") and os.path.exists(
        os.path.join(idx, "meta")
    )
    if not keep:
        shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    if not keep:
        # k-means on a bounded sample: centroid QUALITY is not under test
        # here, cell-count economics are — the sample keeps the build
        # index-sized while producing production-shaped cells
        train_frac = min(1.0, 200_000 / max(n_corpus, 1))
        cents = train_ivf_centroids(
            corpus.sample(train_frac, seed=7), n_cells, max_iter=5
        )
        write_ann_index(corpus, idx, centroids=cents, probe_baseline=False)
    t_build = round(time.time() - t0, 3)

    if mode == "batch":
        from mover_spark.operators.similarity import (
            pq_topk_from_loaded,
            read_ann_index,
        )

        loaded = read_ann_index(spark, idx)
        codes = loaded[0].persist()
        codes.count()  # pin before timing, as a streaming drain would
        loaded = (codes, *loaded[1:])
        qmod = query_mod or 700
        queries = emb.where(F.col("vec_id") % qmod == 0)
        nq = queries.count()

        def one(n_probe_run, per_query):
            t0 = time.time()
            res = pq_topk_from_loaded(
                loaded, queries, n_probe=n_probe_run,
                per_query_cells=per_query,
            ).collect()
            return round(time.time() - t0, 3), {
                (r.query_id, r.neighbor_id) for r in res
            }

        t_pruned, pruned_set = one(n_probe, True)
        t_parity, parity_set = one(None, False)
        row = {
            "fixture": tag,
            "mode": "batch",
            "n_corpus": n_corpus,
            "n_queries_batch": nq,
            "n_cells": n_cells,
            "n_probe": n_probe,
            "index_build_sec": t_build,
            "parity_batch_sec": t_parity,
            "pruned_batch_sec": t_pruned,
            "recall_vs_parity": round(
                len(pruned_set & parity_set) / len(parity_set), 4
            ) if parity_set else None,
        }
        print(json.dumps(row))
        if out_json:
            with open(out_json, "w") as f:
                json.dump(row, f)
        return 0

    def drain(n_probe_run, per_query):
        work = f"/tmp/annprobe_bench_{tag}_{n_probe_run}_{per_query}"
        shutil.rmtree(work, ignore_errors=True)
        stream = read_embeddings_stream(spark, sf_dir).where(
            F.col("vec_id") % STREAM_MOD == 0
        )
        t0 = time.time()
        ann_probe_stream(
            stream,
            idx,
            f"{work}/out",
            f"{work}/ckpt",
            n_probe=n_probe_run,
            per_query_cells=per_query,
        )
        dt = round(time.time() - t0, 3)
        res = spark.read.parquet(f"{work}/out").drop("batch")
        return dt, res

    t_pruned, pruned = drain(n_probe, True)
    t_parity, parity = drain(None, False)

    # recall@k of the pruned probe against the all-cells answer
    hits = pruned.join(parity, ["query_id", "neighbor_id"], "left_semi").count()
    denom = parity.count()
    recall = round(hits / denom, 4) if denom else None

    row = {
        "fixture": tag,
        "n_corpus": n_corpus,
        "n_stream": emb.where(F.col("vec_id") % STREAM_MOD == 0).count(),
        "n_cells": n_cells,
        "n_probe": n_probe,
        "index_build_sec": t_build,
        "parity_sec": t_parity,
        "pruned_sec": t_pruned,
        "recall_vs_parity": recall,
    }
    print(json.dumps(row))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(row, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
