#!/bin/bash
# Round-5 third measurement chain: segmented grid-lookup A/B
# (micro_seglookup) + end-to-end train/serve with the flag ON.  The A/B
# table decides the default; the flag-on bench rows give the end-to-end
# delta if it wins.  Same contract as measure_chain.sh.
set -u
cd "$(dirname "$0")/.."
OUT=${LIDOG_TPU_CHAIN_OUT:-results/r05}
mkdir -p "$OUT"
: > "$OUT/chain_c.log"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain_c.log"
  timeout -k 30 "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT/chain_c.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/chain_c.log"
  echo | tee -a "$OUT/chain_c.log"
}

# 1. The A/B table: plan build at train(B=4) and serve(B=8) shapes.
run micro_seglookup   1500 python benchmarks/micro/micro_seglookup.py
# 2. End-to-end with segmented lookups ON.
run bench_seglookup   1200 LIDOG_TPU_SEG_LOOKUP=1 python bench.py
run bench_infer_b8_seg 1200 LIDOG_TPU_SEG_LOOKUP=1 LIDOG_TPU_INFER_BATCH=8 python bench_infer.py
run bench_infer_b1_seg 1200 LIDOG_TPU_SEG_LOOKUP=1 LIDOG_TPU_INFER_BATCH=1 python bench_infer.py

echo "=== chain_c done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain_c.log"
