#!/bin/bash
# One-shot TPU measurement chain (round 5).  Runs every pending on-chip
# measurement in priority order the moment the axon backend answers;
# each script is bounded (SIGTERM then SIGKILL) so one hang cannot eat
# the window.  Logs: results/r05/<name>.{json,log}
set -u
cd "$(dirname "$0")/.."
OUT=${LIDOG_TPU_CHAIN_OUT:-results/r05}
mkdir -p "$OUT"
: > "$OUT/chain.log"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain.log"
  timeout -k 30 "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT/chain.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/chain.log"
  echo | tee -a "$OUT/chain.log"
}

# 1. THE deliverable: driver-style bench line.
run bench            1200 python bench.py
# 2. Flagship LiDOG step (VERDICT #4: >=0.9x plain).
run bench_lidog      1500 python bench_lidog.py
# 3. Serving Predictor batch 1 (<150 ms gate) and batch 8 (<= b1 gate).
run bench_infer_b1   1200 LIDOG_TPU_INFER_BATCH=1 python bench_infer.py
run bench_infer_b8   1200 LIDOG_TPU_INFER_BATCH=8 python bench_infer.py
# 4. Plan phase breakdown (plan <=15% of step gate).
run bench_zphases    1500 python benchmarks/bench_zphases.py
# 5. Serving decomposition (VERDICT r4 #3a: bridge the 120.8->199.8 ms).
run bench_infer_decomp 1200 python benchmarks/bench_infer_decomp.py
# 6. Plan-internal phase profile (targets for the plan <=15% cut).
run micro_zplanprof   1200 python benchmarks/micro/micro_zplanprof.py

echo "=== chain done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain.log"
