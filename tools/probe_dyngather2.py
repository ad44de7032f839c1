"""Probe 2: how wide can tpu.dynamic_gather's lane axis be?

If (8, H*W) lane gathers work, a bilinear warp is 4 gathers + lerps per
8-channel group with a FLAT spatial index — out[c, p] = xflat[c, y*W+x] —
which is the true 2D gather (no chained-axis factorization error).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ITERS = 100


def k_gather1(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...], i_ref[...], axis=1, mode="promise_in_bounds")


def try_width(S, N):
    x = jax.random.normal(jax.random.PRNGKey(0), (S, N), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (S, N), 0, N, jnp.int32)
    try:
        f = lambda x, i: pl.pallas_call(
            k_gather1, out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32))(x, i)
        out = f(x, idx)
        ref = jnp.take_along_axis(x, idx, axis=1)
        ok = bool(jnp.all(out == ref))
        print(f"lane gather ({S}, {N}): compiled, exact={ok}", flush=True)
        if not ok:
            return False

        def loop(x, i):
            def body(_, c):
                o = f(x + c, i)
                return jnp.mean(o) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        comp = jax.jit(loop).lower(x, idx).compile()
        float(comp(x, idx))
        t0 = time.perf_counter()
        float(comp(x, idx))
        dt = (time.perf_counter() - t0) / ITERS
        gbps = (S * N * 8) / dt / 1e9
        print(f"  {dt*1e6:8.1f} us  ({gbps:.0f} GB/s effective)", flush=True)
        return True
    except Exception as e:
        print(f"lane gather ({S}, {N}): FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False


def main():
    try_width(8, 128)
    try_width(8, 256)
    try_width(8, 1024)
    try_width(8, 16384)
    try_width(32, 16384)
    try_width(256, 16384)


if __name__ == "__main__":
    main()
