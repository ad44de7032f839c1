#!/bin/bash
# Round-5 chip queue D — zoo TRAIN table (the 13 non-Mamba architectures
# have no recorded train perf; the Mamba family + LW already carry
# *_train baselines). Seeds baselines/BENCH_BASELINE_<model>_train.json.
# Launch AFTER r5c (waits on /tmp/r5c.pid).
set -u
cd /root/repo
mkdir -p artifacts/bench_r05
prev=$(cat /tmp/r5c.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi

run() {
  local model=$1 batch=$2 iters=$3
  local out=artifacts/bench_r05/zoo_${model}_train.json
  echo "=== $model train (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=train BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> "${out%.json}.log"
  cat "$out" || tail -3 "${out%.json}.log"
}

# light U-Nets first (fast compiles), heavies last
run fc_ef        16 20
run a2net        16 20
run tfi_gr       16 20
run seifnet      16 20
run dtcdscn      16 20
run pa_former    16 20
run bit          16 20
run snunet       16 10
run ifn          16 10
run elgcnet      16 10
run scratchformer 16 10
run afcf3d       16 10
run changeformer 16 10

python tools/seed_baselines.py
echo "R5D DONE $(date +%H:%M:%S)"
