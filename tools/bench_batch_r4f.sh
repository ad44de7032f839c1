#!/bin/bash
# Round-4 chip queue F (after r4e): cd_mamba at the measured-default scan
# path (seq; seg probed OFF), the LW roofline re-run (r4d's crashed on a
# mid-flight edit), and an rs_mamba infer re-sample (first sample came in
# 0.893 vs baseline — variance check).
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r4e.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi

echo "=== cd_mamba stage decomposition $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_cdmamba_stages.py \
  > artifacts/bench_r04/cdmamba_stages.txt 2>&1
grep -vE "WARNING" artifacts/bench_r04/cdmamba_stages.txt | tail -10

run() {
  local model=$1 mode=$2 batch=$3 iters=$4
  local out=artifacts/bench_r04/${model}_${mode}.json
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> artifacts/bench_r04/${model}_${mode}.log
  cat "$out"
}
run cd_mamba infer 4 10
run cd_mamba train 4 10

echo "=== LW roofline re-run $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_lw_roofline.py \
  > artifacts/bench_r04/lw_roofline.txt 2>&1
grep -vE "WARNING" artifacts/bench_r04/lw_roofline.txt | tail -8

run rs_mamba infer 4 10
echo "R4F DONE $(date +%H:%M:%S)"
