#!/bin/bash
# Round-3 final flagship/LW re-bench (after the A/B-chosen defaults are
# committed), plus the prefix diagnostic if time allows.
set -u
cd /root/repo
mkdir -p artifacts/bench_r03
prev=$(cat /tmp/bench_r3e_py.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
run() {
  local model=$1 mode=$2 batch=$3 iters=$4
  local out=artifacts/bench_r03/${model}_${mode}.json
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> artifacts/bench_r03/${model}_${mode}.log
  cat "$out"
}
run smow_net infer 16 20
run smow_net train 16 20
run smow_net_lw infer 16 20
run smow_net_lw train 16 20
echo "=== prefix probe (infer glue localization) $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_prefix.py > artifacts/bench_r03/prefix_infer.txt 2>&1
tail -12 artifacts/bench_r03/prefix_infer.txt
echo "R3F DONE $(date +%H:%M:%S)"
