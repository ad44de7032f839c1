#!/bin/bash
# Round-4 chip queue H: rs_mamba siamese-2B A/B (the r3 change shipped
# unbenched for this model; two r4 samples sit 10.7% below baseline).
set -u
cd /root/repo
prev=$(cat /tmp/r4g.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== rs_mamba 2B A/B $(date +%H:%M:%S)"
PB_MODELS=rs_mamba PB_ITERS=10 python tools/probe_mamba_2b.py \
  > artifacts/bench_r04/rs_2b_ab.txt 2>&1
grep -vE "WARNING" artifacts/bench_r04/rs_2b_ab.txt | tail -8
echo "R4H DONE $(date +%H:%M:%S)"
