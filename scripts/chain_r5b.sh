#!/bin/bash
# Round-5 second measurement chain: chunked-dispatch A/B + the still-open
# VERDICT items (b8 decomposition, sortless decision, per-level plan
# cost).  Same contract as measure_chain.sh: bounded runs, one chip job
# at a time, logs in results/r05/.
set -u
cd "$(dirname "$0")/.."
OUT=${LIDOG_TPU_CHAIN_OUT:-results/r05}
mkdir -p "$OUT"
: > "$OUT/chain_b.log"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain_b.log"
  timeout -k 30 "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT/chain_b.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/chain_b.log"
  echo | tee -a "$OUT/chain_b.log"
}

# 1. Training step with chunked dispatch (was 5.366 scans/s).
run bench_chunked     1200 python bench.py
# 2. Serving b8 with chunked dispatch + its phase decomposition.
run bench_infer_b8_chunked 1200 LIDOG_TPU_INFER_BATCH=8 python bench_infer.py
run bench_infer_decomp_b8  1500 LIDOG_TPU_INFER_BATCH=8 python benchmarks/bench_infer_decomp.py
run bench_infer_b1_chunked 1200 LIDOG_TPU_INFER_BATCH=1 python bench_infer.py
# 3. Sortless decision table (VERDICT r4 #4).
run micro_sortless    1800 python benchmarks/micro/micro_sortless.py
# 4. Per-level plan cost (the unattributed 129 ms).
run micro_zplanlevels 1500 python benchmarks/micro/micro_zplanlevels.py

echo "=== chain_b done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain_b.log"
