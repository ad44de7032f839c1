#!/bin/bash
# Round-4 chip queue D (after r4b): the r4a remnants that the session cut
# off mid-run (LW half of the head/flow A/B — doubles as the first on-TPU
# engagement of the fused xattn layer kernel at D=64 — and the xattn tile
# sweep), then the r4c localization probes under the new defaults.
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r4b.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== LW head+flow A/B (r4a remnant) $(date +%H:%M:%S)"
PB_MODELS=smow_net_lw PB_ITERS=20 python tools/probe_head_ab.py \
  > artifacts/bench_r04/head_ab_lw.txt 2>&1
tail -8 artifacts/bench_r04/head_ab_lw.txt
echo "=== xattn layer tile sweep $(date +%H:%M:%S)"
for t in 512 1024 2048; do
  XLAYER_TILE=$t PB_ONLY=xattn PB_ITERS=20 python tools/profile_breakdown.py \
    >> artifacts/bench_r04/xattn_tile.txt 2>&1
done
tail -6 artifacts/bench_r04/xattn_tile.txt
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
echo "R4D DONE $(date +%H:%M:%S)"
