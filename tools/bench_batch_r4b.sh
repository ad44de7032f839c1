#!/bin/bash
# Round-4 chip queue B (launch AFTER r4a's verdicts are committed):
# 1. verify-recipe CLI drive (synthetic train + eval + resume)
# 2. official re-bench of flagship/LW at HEAD (fresh BENCH jsons)
# 3. Mamba-family re-records with correct per-model baselines
# 4. fresh stage budgets (roofline columns) for PARITY tables
# 5. cd_mamba stage decomposition
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r4a.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi

echo "=== verify: synthetic train/eval/resume CLIs $(date +%H:%M:%S)"
python -c "from smow_net_tpu.data.dataset import generate_synthetic_dataset;
generate_synthetic_dataset('/tmp/synth', n_train=12, n_val=5, size=64)"
python train.py --model smow_net --data_dir /tmp/synth --epochs 2 \
  --batchsize 4 --trainsize 64 --output_dir /tmp/out_r4 \
  > artifacts/bench_r04/verify_train_cli.log 2>&1
tail -3 artifacts/bench_r04/verify_train_cli.log
python test.py --model smow_net --data_dir /tmp/synth \
  --checkpoint /tmp/out_r4/best --output_dir /tmp/vis_r4 \
  > artifacts/bench_r04/verify_test_cli.log 2>&1
tail -2 artifacts/bench_r04/verify_test_cli.log
python train.py --model smow_net --data_dir /tmp/synth --epochs 3 \
  --batchsize 4 --trainsize 64 --output_dir /tmp/out_r4 \
  --resume /tmp/out_r4/last \
  > artifacts/bench_r04/verify_resume_cli.log 2>&1
grep -i "resumed" artifacts/bench_r04/verify_resume_cli.log || tail -2 artifacts/bench_r04/verify_resume_cli.log

run() {
  local model=$1 mode=$2 batch=$3 iters=$4
  local out=artifacts/bench_r04/${model}_${mode}.json
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> artifacts/bench_r04/${model}_${mode}.log
  cat "$out"
}
run smow_net infer 16 20
run smow_net train 16 20
run smow_net_lw infer 16 20
run smow_net_lw train 16 20

echo "=== fresh stage budgets (roofline) $(date +%H:%M:%S)"
PB_ITERS=20 python tools/profile_breakdown.py \
  > artifacts/bench_r04/infer_stages.txt 2>&1
tail -12 artifacts/bench_r04/infer_stages.txt
PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r04/train_stages.txt 2>&1
tail -8 artifacts/bench_r04/train_stages.txt

echo "=== segmented-scan A/B $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_seg_scan.py \
  > artifacts/bench_r04/seg_scan.txt 2>&1
tail -16 artifacts/bench_r04/seg_scan.txt

echo "=== cd_mamba stage decomposition $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_cdmamba_stages.py \
  > artifacts/bench_r04/cdmamba_stages.txt 2>&1
tail -10 artifacts/bench_r04/cdmamba_stages.txt

run cd_mamba infer 4 10
run cd_mamba train 4 10
run change_mamba infer 4 10
run change_mamba train 4 10
run rs_mamba infer 4 10
run rs_mamba train 4 10
echo "R4B DONE $(date +%H:%M:%S)"
