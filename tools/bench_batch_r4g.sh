#!/bin/bash
# Round-4 chip queue G (after r4f): LW-width xattn tile sweep.
set -u
cd /root/repo
prev=$(cat /tmp/r4f.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== LW xattn tile sweep $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_xattn_tile_lw.py \
  > artifacts/bench_r04/xattn_tile_lw.txt 2>&1
grep -vE "WARNING" artifacts/bench_r04/xattn_tile_lw.txt | tail -6
echo "R4G DONE $(date +%H:%M:%S)"
