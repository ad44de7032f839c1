#!/bin/bash
# Round-4 chip queue I: LW warp/token pixel-tile A/B (stage + whole model).
set -u
cd /root/repo
prev=$(cat /tmp/r4h.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 15; done
fi
echo "=== LW token tile A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_token_tile_lw.py \
  > artifacts/bench_r04/token_tile_lw.txt 2>&1
grep -vE "WARNING" artifacts/bench_r04/token_tile_lw.txt | tail -10
echo "R4I DONE $(date +%H:%M:%S)"
