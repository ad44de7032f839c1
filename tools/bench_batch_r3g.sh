#!/bin/bash
# Round-3 chip queue (session 4): the two decision probes, re-run after
# fixing the bugs that crashed them in r3e (probe train kwarg; catsplit
# mixed-dtype trace under init). Their verdicts pick the committed defaults
# (token fused-vs-unfused + bwd tile factor; decoder catsplit/liftfold)
# before the final r3f re-bench.
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
echo "=== OFW+tokens stage re-probe, post-tile-fix (train) $(date +%H:%M:%S)"
PB_ONLY=ofwtok PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r03/ofw_stage_train.txt 2>&1
tail -3 artifacts/bench_r03/ofw_stage_train.txt
echo "R3G DONE $(date +%H:%M:%S)"
