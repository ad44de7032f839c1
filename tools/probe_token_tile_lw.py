"""Pixel-tile A/B for the Pallas warp/token kernels at the LW shapes
(W*C = 128*16 = 2048, where the 24 MB temporaries budget lands tile 512)
— r3 proved tile size is a first-order effect at W*C=1024 (512 cost the
whole train step 5%+); this checks whether the same holds one octave up,
where tile 1024's ~33 MB of (W*C, tile) temporaries still fit the 48 MB
kernel limit.

Stage probe (LW OFW+tokens fused, eval path) + whole-model LW infer A/B,
in-process via ops.pallas.warp.set_tile_force. Compile OOMs are caught
per-config.

Usage: PB_ITERS=20 python tools/probe_token_tile_lw.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit
from smow_net_tpu.ops.pallas import warp as pw

ITERS = int(os.environ.get("PB_ITERS", "20"))
BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))

bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey


def main():
    from smow_net_tpu.models import get_model
    from smow_net_tpu.models.smow_net import (OFW, TokenTransformerEncoder,
                                              ofw_tokens_fused)

    s = SIZE // 2

    class FusedOFWTok(nn.Module):
        @nn.compact
        def __call__(self, a, train=False):
            return ofw_tokens_fused(
                OFW(16, name="ofw"),
                TokenTransformerEncoder(16, name="tenc"), a, train)

    x0 = r(k(3), (BS, 2, s, s, 16), bf)
    for tile in (None, 512, 1024, None, 1024):
        pw.set_tile_force(tile)
        try:
            timeit(f"LW OFW+tokens [tile {tile or 'auto(512)'}]",
                   FusedOFWTok(), x0)
        except Exception as e:
            print(f"LW OFW+tokens [tile {tile}]  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    pw.set_tile_force(None)

    # whole-model LW infer A/B
    model = get_model("smow_net_lw")
    x1 = r(k(0), (BS, SIZE, SIZE, 3), bf)
    x2 = r(k(1), (BS, SIZE, SIZE, 3), bf)
    variables = model.init(k(2), x1[:1].astype(jnp.float32),
                           x2[:1].astype(jnp.float32), train=False)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, variables)

    def bench(label):
        def loop(a, b):
            def body(_, carry):
                out = model.apply(variables, a + carry.astype(a.dtype), b,
                                  train=False)
                return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(
                    jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))

        c = jax.jit(loop).lower(x1, x2).compile()
        float(c(x1, x2))
        t0 = time.perf_counter()
        float(c(x1, x2))
        dt = time.perf_counter() - t0
        print(f"{label:44s} {dt/ITERS*1e3:8.2f} ms/b  "
              f"{BS*ITERS/dt:8.1f} pairs/s", flush=True)

    for tile in (None, 1024, None, 1024):
        pw.set_tile_force(tile)
        try:
            bench(f"smow_net_lw infer [tile {tile or 'auto'}]")
        except Exception as e:
            print(f"smow_net_lw infer [tile {tile}]  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    pw.set_tile_force(None)


if __name__ == "__main__":
    main()
