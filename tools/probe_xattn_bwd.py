"""Same-process A/B of the fused xattn layer-kernel BACKWARD lowering at
bench shapes (bf16, B16, T-folded 128x128x128 queries vs 8 tokens):
VERDICT r4 #3 — the train stage ran 6.07 ms with a fully-serialized
('arbitrary','arbitrary') bwd grid at tile 512 (never swept). Arms:

  512/ser   — r4 default (shared param-grad blocks, serialized grid)
  512/parb  — per-batch partial grads, batch dim parallel
  1024/parb, 2048/parb — bigger bwd pixel tiles on top
  1024/ser  — tile effect alone

Usage: PB_ITERS=20 python tools/probe_xattn_bwd.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_breakdown_train import timeit
from smow_net_tpu.models.smow_net import PixelTransformerDecoder
from smow_net_tpu.ops.pallas import xattn as px

BS = 16
s = 128


def main():
    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    y = r(k(9), (BS, s, s, 4 * 32), bf)
    m = r(k(10), (BS, 8, 128), bf)
    arms = (("512/ser", 512, False), ("512/parb", 512, True),
            ("1024/parb", 1024, True), ("2048/parb", 2048, True),
            ("1024/ser", 1024, False), ("512/ser", 512, False),
            ("best-recheck", None, None))
    best = None
    for label, tile, parb in arms:
        if label == "best-recheck":
            continue
        px.set_xlayer_bwd(tile=tile, parallel_b=parb)
        timeit(f"xattn train [{label}]",
               PixelTransformerDecoder(128, folded_input=True), y, m,
               train_kw=False)
    px.set_xlayer_bwd(tile=512, parallel_b=True)


if __name__ == "__main__":
    main()
