#!/bin/bash
# Round-3 combined chip queue (session 2), importance-first so an interrupt
# leaves the headline artifacts behind:
#  1. flagship infer+train re-bench (post OFW softmax-normalization fold)
#  2. rs_mamba / cd_mamba bench artifacts (VERDICT #4; cd_mamba post scan-fuse)
#  3. LW roofline probe (VERDICT weak #2 evidence)
#  4. train stage budget + decoder ConvBlock lowering A/B + infer stages
# Sequential — ONE TPU process at a time (CLAUDE.md hazard).
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
run smow_net infer 16 20
run smow_net train 16 20
run rs_mamba infer 4 10
run rs_mamba train 4 10
run cd_mamba infer 4 10
run cd_mamba train 4 10
echo "=== lw roofline $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_lw_roofline.py > artifacts/bench_r03/lw_roofline.txt 2>&1
tail -5 artifacts/bench_r03/lw_roofline.txt
echo "=== train stage budget $(date +%H:%M:%S)"
PB_ITERS=10 python tools/profile_breakdown_train.py > artifacts/bench_r03/train_stages.txt 2>&1
tail -20 artifacts/bench_r03/train_stages.txt
echo "=== decoder framemajor A/B $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_dec_framemajor.py > artifacts/bench_r03/dec_framemajor.txt 2>&1
tail -10 artifacts/bench_r03/dec_framemajor.txt
echo "=== infer stage budget $(date +%H:%M:%S)"
PB_ITERS=20 python tools/profile_breakdown.py > artifacts/bench_r03/infer_stages.txt 2>&1
tail -20 artifacts/bench_r03/infer_stages.txt
echo "=== decoder framemajor A/B fwd-only $(date +%H:%M:%S)"
PB_FWD=1 PB_ITERS=20 python tools/probe_dec_framemajor.py > artifacts/bench_r03/dec_framemajor_fwd.txt 2>&1
tail -10 artifacts/bench_r03/dec_framemajor_fwd.txt
echo "ALL DONE $(date +%H:%M:%S)"
