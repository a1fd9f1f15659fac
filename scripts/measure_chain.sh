#!/bin/bash
# One-shot TPU measurement chain (round 4).  Runs every pending on-chip
# measurement in priority order the moment the axon backend answers;
# each script is bounded so one hang cannot eat the window.
# Logs: results/r04/<name>.{json,log}
set -u
cd /root/repo
OUT=results/r04
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain.log"
  timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT/chain.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/chain.log"
  echo | tee -a "$OUT/chain.log"
}

# 1. THE deliverable: driver-style bench line.
run bench            1200 python bench.py
# 2. Sortless A/B (flip default if it wins).
run bench_sortless   1200 LIDOG_TPU_SORTLESS=1 python bench.py
# 3. Flagship LiDOG step (VERDICT #4: >=0.9x plain).
run bench_lidog      1500 python bench_lidog.py
# 4. Serving Predictor batch 1 (VERDICT #7: <100 ms/scan) + sortless b1.
run bench_infer_b1   1200 LIDOG_TPU_INFER_BATCH=1 python bench_infer.py
run bench_infer_b1_sortless 1200 LIDOG_TPU_INFER_BATCH=1 LIDOG_TPU_SORTLESS=1 python bench_infer.py
run bench_infer_b8   1200 LIDOG_TPU_INFER_BATCH=8 python bench_infer.py
# 5. Plan phase breakdown (VERDICT #3: plan <=15% of step).
run bench_zphases    1500 python benchmarks/bench_zphases.py
# 6. Tile-conv A/B decision table (VERDICT #1).
run micro_tileconv   1500 python benchmarks/micro/micro_tileconv.py
# 7. Mosaic dynamic_gather re-probe (windowed-DMA conv gate).
run micro_bisect      900 python benchmarks/micro/micro_bisect.py
# 8. Windowed-DMA conv prototype (if 7 shows the toolchain fixed).
run micro_windowconv 1200 python benchmarks/micro/micro_windowconv.py

echo "=== chain done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/chain.log"
