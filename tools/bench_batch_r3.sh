#!/bin/bash
# Round-3 measurement batch: LW (post perf pass) + Mamba family, infer+train.
# Sequential — ONE TPU process at a time (CLAUDE.md hazard). Each run writes
# its JSON line to artifacts/bench_r03/<model>_<mode>.json.
set -u
cd /root/repo
mkdir -p artifacts/bench_r03
run() {
  local model=$1 mode=$2 batch=$3 iters=$4
  local out=artifacts/bench_r03/${model}_${mode}.json
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> artifacts/bench_r03/${model}_${mode}.log
  cat "$out"
}
run smow_net_lw infer 16 20
run smow_net_lw train 16 20
run change_mamba infer 4 10
run change_mamba train 4 10
run rs_mamba infer 4 10
run rs_mamba train 4 10
run cd_mamba infer 4 10
run cd_mamba train 4 10
echo "ALL DONE $(date +%H:%M:%S)"
