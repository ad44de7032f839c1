#!/bin/bash
# Round-4 chip queue E (after r4d): the wide-row seg-scan tiling sweep —
# picks the two-level path's (bt, step, chunk-budget) defaults from data
# (the first on-chip run OOM'd at the old tilings; per-config OOMs are now
# caught in-process).
set -u
cd /root/repo
mkdir -p artifacts/bench_r04
prev=$(cat /tmp/r4d.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== seg-scan wide-tiling sweep $(date +%H:%M:%S)"
PB_ITERS=10 python tools/probe_seg_scan.py \
  > artifacts/bench_r04/seg_scan_sweep.txt 2>&1
grep -E "scan |FAILED" artifacts/bench_r04/seg_scan_sweep.txt | tail -24
echo "R4E DONE $(date +%H:%M:%S)"
