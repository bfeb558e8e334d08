#!/bin/bash
# Third-decade (sf10 -> sf100) per-query capture, round-9 protocol:
# one bench.py invocation per (query, fixture) in a FRESH process
# (SPARK_GRAFT_BENCH_REPS=1, cold), detail JSON per cell into
# $OUT (default .bench/r10_decade). Queries whose first call plays an index-writer job
# (the persisted ANN family) run TWICE per fixture — run1 = build+query,
# run2 = indexed (cold process, warm index) — mirroring the round-8
# incremental-dedup A/B protocol in BASELINE.md.
#
# Usage: tools/decade_bench.sh [sf10|sf100|both]
set -u
cd "$(dirname "$0")/.."
OUT=.bench/${DECADE_TAG:-r10_decade}
mkdir -p "$OUT"

ONCE="q21_waiting_suppliers containment_lsh \
mixture_epoch_sample training_shard_summary curation_pipeline_bucketed \
bm25_topk hybrid_retrieval_rrf substring_dedup_clean dedup_keep_best \
snapshot_time_travel snapshot_diff"
# snapshot_time_travel runs first of the two, so ITS cell carries the
# one-time two-commit fixture build; snapshot_diff reads it warm
TWICE="ann_topk_pq_persisted ann_topk_pq_appended ann_topk_ivfpq_persisted \
streaming_ann_probe_pruned bm25_topk_persisted bm25_topk_appended"
# the all-cells PARITY probe is O(|stream| x |codes|) BY CONSTRUCTION
# (correctness surface, not the scale path) — measured at sf10 only;
# the pruned variant above is the decade-pair query
SF10_ONLY="streaming_ann_probe"

run_cell() { # fixture query suffix
  local fx=$1 q=$2 sfx=$3
  local f="$OUT/${fx}_${q}${sfx}.json"
  [ -s "$f" ] && { echo "skip $f"; return; }
  SPARK_GRAFT_SF_DIR=".bench/$fx" SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY="$q" SPARK_GRAFT_BENCH_DETAIL="$f" \
  SPARK_GRAFT_PROBE_MULTIBATCH_OK=1 \
    python bench.py > "$OUT/${fx}_${q}${sfx}.log" 2>&1
  python - "$f" "$fx $q$sfx" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    print(f"{sys.argv[2]}: {d['total_median_sec']}s")
except Exception as e:
    print(f"{sys.argv[2]}: FAILED ({e})")
EOF
}

# expand the documented 'both' (and the no-arg default) BEFORE the
# loop — iterating over the literal word 'both' would run zero cells
[ "${1:-both}" = both ] && set -- sf10 sf100
for fx in "$@"; do
  # fresh index state per fixture so run1 really includes the build
  rm -rf "/tmp/mover_spark_annindex/$fx" "/tmp/mover_spark_annindex_app/$fx" \
    "/tmp/mover_spark_textindex/$fx" "/tmp/mover_spark_snap/$fx" 2>/dev/null || true
  for q in $ONCE; do run_cell "$fx" "$q" ""; done
  if [ "$fx" = sf10 ]; then
    for q in $SF10_ONLY; do
      run_cell "$fx" "$q" "_run1"
      run_cell "$fx" "$q" "_run2"
    done
  fi
  for q in $TWICE; do
    run_cell "$fx" "$q" "_run1"
    run_cell "$fx" "$q" "_run2"
  done
done
echo DONE
