"""Maintenance-operation decade bench (round-10 verdict item 7): prove
the index/snapshot upkeep path stays INDEX-SIZED at the third decade —
repeated daily appends must not inflate later appends or queries
(no alpha > 1 on append-chain length), and compaction must pay an
index-sized parquet rewrite, never a corpus re-encode.

Chains measured on one fixture:

- signature index: base build over docs with doc_id % 11 != 0, then 5
  daily appends (doc_id % 11 == 0 split round-robin), a query after the
  chain, compact_signature_index, query again.
- ANN index:       same shape over embeddings (vec_id % 11), using
  append_to_ann_index / compact_ann_index (drift probes off — this
  measures upkeep, not recall).
- snapshots:       10 append commits of document slices, read latest,
  snapshot_compact, snapshot_vacuum(keep_versions=1), read again.
- text index:      base build, 5 daily append_to_text_index increments,
  a bm25_from_index query after the chain.

Emits one JSON object with per-step seconds. Bench-only (rows-only
evidence for BASELINE.md); correctness of every op is pinned by pytest
equality tests against full rebuilds.

Usage: python tools/maintenance_bench.py [.bench/sf100] [out.json]
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

N_APPENDS = 5


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf100"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    tag = os.path.basename(os.path.normpath(sf_dir))
    work = f"/tmp/mover_spark_maint/{tag}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from mover_spark.catalog import Catalog
    from mover_spark.operators.dedup import (
        append_to_signature_index,
        compact_signature_index,
        dedup_against_index,
        write_signature_index,
    )
    from mover_spark.operators.retrieval import (
        append_to_text_index,
        bm25_from_index,
        write_text_index,
    )
    from mover_spark.operators.similarity import (
        append_to_ann_index,
        compact_ann_index,
        pq_topk_from_index,
        write_ann_index,
    )
    from mover_spark.sources.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_compact,
        snapshot_vacuum,
    )

    spark = get_spark("maint-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir)
    docs = cat.df("documents")
    emb = cat.df("embeddings")
    row: dict = {"fixture": tag, "n_appends": N_APPENDS}

    # ---- signature index chain
    p = f"{work}/sigidx"
    base = docs.where(F.col("doc_id") % 11 != 0)
    row["sig_build_sec"], _ = timed(lambda: write_signature_index(base, p))
    inc_all = docs.where(F.col("doc_id") % 11 == 0)
    sig_appends = []
    for i in range(N_APPENDS):
        inc = inc_all.where(((F.col("doc_id") / 11).cast("long") % N_APPENDS) == i)
        dt, _ = timed(lambda inc=inc: append_to_signature_index(inc, p))
        sig_appends.append(dt)
    row["sig_append_secs"] = sig_appends
    probe = docs.where(F.col("doc_id") % 101 == 0)
    row["sig_query_sec"], _ = timed(
        lambda: dedup_against_index(probe, p).count()
    )
    row["sig_compact_sec"], _ = timed(lambda: compact_signature_index(spark, p))
    row["sig_query_after_compact_sec"], _ = timed(
        lambda: dedup_against_index(probe, p).count()
    )

    # ---- ANN index chain
    p = f"{work}/annidx"
    abase = emb.where(F.col("vec_id") % 11 != 0)
    row["ann_build_sec"], _ = timed(
        lambda: write_ann_index(abase, p, probe_baseline=False)
    )
    ainc_all = emb.where(F.col("vec_id") % 11 == 0)
    ann_appends = []
    for i in range(N_APPENDS):
        inc = ainc_all.where(((F.col("vec_id") / 11).cast("long") % N_APPENDS) == i)
        dt, _ = timed(
            lambda inc=inc: append_to_ann_index(inc, p, probe_drift=False)
        )
        ann_appends.append(dt)
    row["ann_append_secs"] = ann_appends
    aq = emb.where(F.col("vec_id") % 4001 == 0)
    row["ann_query_sec"], _ = timed(
        lambda: pq_topk_from_index(spark, p, aq, k=10).count()
    )
    row["ann_compact_sec"], _ = timed(lambda: compact_ann_index(spark, p))
    row["ann_query_after_compact_sec"], _ = timed(
        lambda: pq_topk_from_index(spark, p, aq, k=10).count()
    )

    # ---- snapshot chain
    p = f"{work}/snap"
    snap_commits = []
    for i in range(10):
        part = docs.where(F.col("doc_id") % 10 == i)
        dt, _ = timed(lambda part=part: snapshot_commit(part, p))
        snap_commits.append(dt)
    row["snap_commit_secs"] = snap_commits
    row["snap_read_sec"], _ = timed(lambda: read_snapshot(spark, p).count())
    row["snap_compact_sec"], _ = timed(lambda: snapshot_compact(spark, p))
    row["snap_vacuum_sec"], deleted = timed(
        lambda: snapshot_vacuum(spark, p, keep_versions=1)
    )
    row["snap_vacuum_deleted"] = len(deleted)
    row["snap_read_after_sec"], _ = timed(
        lambda: read_snapshot(spark, p).count()
    )

    # ---- text index chain
    p = f"{work}/textidx"
    tbase = docs.where(F.col("doc_id") % 11 != 0)
    row["text_build_sec"], _ = timed(lambda: write_text_index(tbase, p))
    text_appends = []
    for i in range(N_APPENDS):
        inc = inc_all.where(((F.col("doc_id") / 11).cast("long") % N_APPENDS) == i)
        dt, _ = timed(lambda inc=inc: append_to_text_index(inc, p))
        text_appends.append(dt)
    row["text_append_secs"] = text_appends
    queries = spark.createDataFrame(
        [(1, "spark window agg"), (2, "hash join table")],
        "query_id int, query_text string",
    )
    row["text_query_sec"], _ = timed(
        lambda: bm25_from_index(spark, p, queries, k=10).count()
    )

    print(json.dumps(row))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(row, f)
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
