#!/bin/bash
# Round-5 chip queue C — whole-model confirms + official re-bench at HEAD
# (after the r5b probe verdicts are committed as defaults).
# Launch AFTER r5b (waits on /tmp/r5b.pid).
set -u
cd /root/repo
mkdir -p artifacts/bench_r05
prev=$(cat /tmp/r5b.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi

echo "=== whole-model train A/B (r4 vs r5 lowerings) $(date +%H:%M:%S)"
PB_ITERS=10 XAB_TILE=1024 XAB_PARB=1 python tools/probe_train_ab.py \
  > artifacts/bench_r05/train_ab.txt 2>&1
grep "train step" artifacts/bench_r05/train_ab.txt

run() {
  local model=$1 mode=$2 batch=$3 iters=$4 out=$5
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> "${out%.json}.log"
  cat "$out" || tail -3 "${out%.json}.log"
}

run smow_net infer 16 20 artifacts/bench_r05/smow_net_infer.json
run smow_net train 16 20 artifacts/bench_r05/smow_net_train.json
run smow_net_lw infer 16 20 artifacts/bench_r05/smow_net_lw_infer.json
run smow_net_lw train 16 20 artifacts/bench_r05/smow_net_lw_train.json

echo "=== fresh stage budgets $(date +%H:%M:%S)"
PB_ITERS=20 python tools/profile_breakdown.py \
  > artifacts/bench_r05/infer_stages.txt 2>&1
tail -8 artifacts/bench_r05/infer_stages.txt
PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r05/train_stages.txt 2>&1
tail -6 artifacts/bench_r05/train_stages.txt
PB_ITERS=10 PB_ONLY=ofwparts python tools/profile_breakdown_train.py \
  > artifacts/bench_r05/ofwparts_train.txt 2>&1
tail -5 artifacts/bench_r05/ofwparts_train.txt
PB_ITERS=20 python tools/probe_lw_roofline.py \
  > artifacts/bench_r05/lw_roofline.txt 2>&1
tail -8 artifacts/bench_r05/lw_roofline.txt
echo "R5C DONE $(date +%H:%M:%S)"
