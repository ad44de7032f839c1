"""Sweep the fused-scan bt-cap and slab-step knobs on the dominant
change_mamba shape (VSSBlock C=96 at 64^2, fwd+bwd). Knobs are read at
import (SCAN_FUSED_BT_CAP / SCAN_FUSED_STEP), so run one config per
process:

  for cap in 32768 65536; do for st in 8 16; do
    SCAN_FUSED_BT_CAP=$cap SCAN_FUSED_STEP=$st python tools/probe_scan_bt.py
  done; done

VERDICT (v5e, 2026-08-19): step 16 beats 8 at every cap (~3%); bt caps
past 32768 are noise-to-worse (65536/8 regressed to 14.9 ms — the bwd
h-checkpoint scratch shrinks the chunk). Sweep, VSSBlock C=96 64^2 fwd+bwd:
  cap 32768:  step8 10.42   step16 10.32
  cap 65536:  step8 14.91   step16 10.15
  cap 131072: step8 10.53   step16 10.02
Defaults: cap 32768, step 16.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MB_ONLY", "unused")

import importlib

import jax
import jax.numpy as jnp

sys.argv = [sys.argv[0]]

import tools.probe_mamba_stages as pms  # reuse the timing harness


def main():
    from smow_net_tpu.nn.ssm import VSSBlock
    from smow_net_tpu.ops.pallas import scan_fused

    cap, step = scan_fused._BT_CAP, scan_fused._STEP
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 96),
                          jnp.bfloat16)
    print(f"cap={cap} step={step}:", flush=True)
    pms.timeit(f"  VSSBlock C=96 64^2", VSSBlock(96, 0.1, mlp_ratio=4.0), x)


if __name__ == "__main__":
    main()
