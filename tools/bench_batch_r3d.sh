#!/bin/bash
# Round-3 chip queue (session 3). Waits for the r3c batch, then:
#  1. verify-skill eval CLI step (test.py on the change_mamba verify ckpt)
#  2. flagship infer+train re-bench (fused token-warp kernel)
#  3. smow_net_lw re-bench (shares the fused token path)
#  4. cd_mamba train (VMEM-limit fix validation) artifact
#  5. change_mamba / rs_mamba re-bench (2B-batched siamese encode)
#  6. OFW+tokens stage re-probe, train and infer
# Sequential — ONE TPU process at a time (CLAUDE.md hazard).
set -u
cd /root/repo
mkdir -p artifacts/bench_r03
prev=$(cat /tmp/bench_r3c.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi
run() {
  local model=$1 mode=$2 batch=$3 iters=$4
  local out=artifacts/bench_r03/${model}_${mode}.json
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 python bench.py > "$out" 2> artifacts/bench_r03/${model}_${mode}.log
  cat "$out"
}
echo "=== token kernel on-TPU check $(date +%H:%M:%S)"
python tools/check_token_tpu.py > artifacts/bench_r03/check_token_tpu.log 2>&1
tail -8 artifacts/bench_r03/check_token_tpu.log
echo "=== verify: test.py eval CLI $(date +%H:%M:%S)"
python test.py --model change_mamba --data_dir /tmp/synth_v \
  --checkpoint /tmp/out_v/best --output_dir /tmp/vis_v \
  > artifacts/bench_r03/verify_test_cli.log 2>&1
tail -3 artifacts/bench_r03/verify_test_cli.log
run smow_net infer 16 20
run smow_net train 16 20
run smow_net_lw infer 16 20
run smow_net_lw train 16 20
run cd_mamba train 4 10
run change_mamba infer 4 10
run change_mamba train 4 10
run rs_mamba infer 4 10
run rs_mamba train 4 10
echo "=== OFW+tokens stage re-probe (train) $(date +%H:%M:%S)"
PB_ONLY=ofwtok PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r03/ofw_stage_train.txt 2>&1
tail -5 artifacts/bench_r03/ofw_stage_train.txt
echo "=== OFW+tokens stage re-probe (infer) $(date +%H:%M:%S)"
PB_ONLY=ofwtok PB_ITERS=20 python tools/profile_breakdown.py \
  > artifacts/bench_r03/ofw_stage_infer.txt 2>&1
tail -8 artifacts/bench_r03/ofw_stage_infer.txt
echo "ALL DONE $(date +%H:%M:%S)"
echo "=== decoder catsplit A/B $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_dec_catsplit.py > artifacts/bench_r03/dec_catsplit.txt 2>&1
tail -8 artifacts/bench_r03/dec_catsplit.txt
echo "R3D EXTENDED DONE $(date +%H:%M:%S)"
echo "=== prefix probe (infer glue localization) $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_prefix.py > artifacts/bench_r03/prefix_infer.txt 2>&1
tail -12 artifacts/bench_r03/prefix_infer.txt
echo "R3D EXTENDED2 DONE $(date +%H:%M:%S)"
echo "=== token chain A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_token_ab.py > artifacts/bench_r03/token_ab.txt 2>&1
tail -10 artifacts/bench_r03/token_ab.txt
echo "R3D EXTENDED3 DONE $(date +%H:%M:%S)"
echo "=== cd_mamba scan-step sweep $(date +%H:%M:%S)"
for st in 32 8; do
  echo "--- SCAN_FUSED_STEP=$st infer"
  SCAN_FUSED_STEP=$st BENCH_MODEL=cd_mamba BENCH_MODE=infer BENCH_BATCH=4 BENCH_ITERS=10 \
    BENCH_DTYPE=bf16 python bench.py 2>/dev/null
done
echo "R3D EXTENDED4 DONE $(date +%H:%M:%S)"
