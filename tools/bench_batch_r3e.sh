#!/bin/bash
# Round-3 chip queue (session 3, reordered): decision probes first —
# token-chain A/B and decoder catsplit/liftfold A/B pick the defaults for
# the final flagship re-bench; OFW stage re-probes close the stage story.
set -u
cd /root/repo
mkdir -p artifacts/bench_r03
prev=$(cat /tmp/current_bench.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== token chain A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_token_ab.py > artifacts/bench_r03/token_ab.txt 2>&1
tail -10 artifacts/bench_r03/token_ab.txt
echo "=== decoder catsplit A/B $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_dec_catsplit.py > artifacts/bench_r03/dec_catsplit.txt 2>&1
tail -9 artifacts/bench_r03/dec_catsplit.txt
echo "=== OFW+tokens stage re-probe (train) $(date +%H:%M:%S)"
PB_ONLY=ofwtok PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r03/ofw_stage_train.txt 2>&1
tail -3 artifacts/bench_r03/ofw_stage_train.txt
echo "R3E DONE $(date +%H:%M:%S)"
