"""Pixel-tile sweep for the fused xattn layer kernel at the LW width
(D=64): at half the flagship's feature width every in-kernel matmul uses
64 of 128 lanes, so the per-tile fixed costs weigh double — a larger
pixel tile may win (the flagship sweep at D=128 said 1024 >= 2048 > 512,
artifacts/bench_r04/xattn_tile.txt).

In-process sweep of ops.pallas.xattn._TILE_L at the LW decoder shape
(bs16, N=16384, D=64), fwd-only (the LW eval path).

Usage: PB_ITERS=20 python tools/probe_xattn_tile_lw.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit
from smow_net_tpu.ops.pallas import xattn as px

bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey

BS = int(os.environ.get("PB_BS", "16"))


def main():
    from smow_net_tpu.models.smow_net import PixelTransformerDecoder

    y = r(k(9), (BS, 128, 128, 4 * 16), bf)
    m = r(k(10), (BS, 8, 64), bf)
    old = px._TILE_L
    try:
        for tile in (1024, 2048, 4096, 1024, 2048):
            px._TILE_L = tile
            try:
                timeit(f"LW xattn D=64 [tile {tile}]",
                       PixelTransformerDecoder(64, folded_input=True), y, m,
                       train_kw=False)
            except Exception as e:
                print(f"LW xattn D=64 [tile {tile}]  FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
    finally:
        px._TILE_L = old


if __name__ == "__main__":
    main()
