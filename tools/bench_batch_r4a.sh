#!/bin/bash
# Round-4 chip queue A: decision probes for the new glue-kill lowerings
# (folded OFW flow, classifier-fold epilogue, LW D=64 kernel engagement)
# plus the fused-xattn-layer tile sweep. Waits for any prior queue.
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r3g.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== flow lowering A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_flow_ab.py > artifacts/bench_r04/flow_ab.txt 2>&1
tail -8 artifacts/bench_r04/flow_ab.txt
echo "=== whole-model head+flow A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_head_ab.py > artifacts/bench_r04/head_ab.txt 2>&1
tail -16 artifacts/bench_r04/head_ab.txt
echo "=== xattn layer tile sweep $(date +%H:%M:%S)"
for t in 512 1024 2048; do
  XLAYER_TILE=$t PB_ONLY=xattn PB_ITERS=20 python tools/profile_breakdown.py \
    >> artifacts/bench_r04/xattn_tile.txt 2>&1
done
tail -6 artifacts/bench_r04/xattn_tile.txt
echo "R4A DONE $(date +%H:%M:%S)"
