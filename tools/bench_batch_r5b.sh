#!/bin/bash
# Round-5 chip queue B — kernel-lowering probes (VERDICT r4 #1/#2/#3).
# Launch AFTER r5a (waits on /tmp/r5a.pid). Verdicts feed the default flips
# committed before r5c's whole-model confirm + official re-bench.
set -u
cd /root/repo
mkdir -p artifacts/bench_r05
prev=$(cat /tmp/r5a.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi

echo "=== token chain hybrid A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_token_ab.py \
  > artifacts/bench_r05/token_ab.txt 2>&1
grep "token chain" artifacts/bench_r05/token_ab.txt

echo "=== xattn bwd sweep $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_xattn_bwd.py \
  > artifacts/bench_r05/xattn_bwd.txt 2>&1
grep "xattn train" artifacts/bench_r05/xattn_bwd.txt

echo "=== LW pack2 A/B $(date +%H:%M:%S)"
PB_ITERS=20 python tools/probe_lw_pack2.py \
  > artifacts/bench_r05/lw_pack2.txt 2>&1
grep "pack2" artifacts/bench_r05/lw_pack2.txt

echo "R5B DONE $(date +%H:%M:%S)"
