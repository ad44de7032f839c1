#!/bin/bash
# Round-4 chip queue C (after r4b): localization probes under the new
# defaults — whole-model infer prefix walk, LW roofline re-probe, OFW-parts
# train decomposition, change_mamba stage roofline.
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r4b.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== infer prefix walk $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_prefix.py \
  > artifacts/bench_r04/prefix_infer.txt 2>&1
tail -12 artifacts/bench_r04/prefix_infer.txt
echo "=== LW roofline re-probe $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_lw_roofline.py \
  > artifacts/bench_r04/lw_roofline.txt 2>&1
tail -6 artifacts/bench_r04/lw_roofline.txt
echo "=== OFW parts (train) $(date +%H:%M:%S)"
PB_ONLY=ofwparts PB_ITERS=10 python tools/profile_breakdown_train.py \
  > artifacts/bench_r04/ofwparts_train.txt 2>&1
tail -6 artifacts/bench_r04/ofwparts_train.txt
echo "=== change_mamba stage roofline $(date +%H:%M:%S)"
MB_ITERS=8 python tools/probe_mamba_stages.py \
  > artifacts/bench_r04/change_mamba_stages.txt 2>&1
tail -10 artifacts/bench_r04/change_mamba_stages.txt
echo "R4C DONE $(date +%H:%M:%S)"
