"""Is XLA's 2-D depthwise conv lowering near the VPU floor at the shapes
that matter (MobileNetV2 backbone layers for SMOW_Net_LW, per-frame view of
the OFW flow chain)? Prints fwd and fwd+bwd ms per layer plus the naive
VPU-flop floor (taps x elements / ~4 TFLOP/s) to locate headroom for a
Pallas depthwise kernel.

Run on TPU: python tools/probe_dw2d.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "20"))
bf = jnp.bfloat16

# (B, H, W, C, stride) — MobileNetV2 dw layers at LW train shapes (two
# backbone passes -> effective batch 32) and the OFW flow chain per-frame
SHAPES = [
    ("mbv2 dw 112^2 C32 s1", 32, 112, 112, 32, 1),
    ("mbv2 dw 112^2 C96 s2", 32, 112, 112, 96, 2),
    ("mbv2 dw 56^2 C144 s1", 32, 56, 56, 144, 1),
    ("mbv2 dw 56^2 C144 s2", 32, 56, 56, 144, 2),
    ("mbv2 dw 28^2 C192 s1", 32, 28, 28, 192, 1),
    ("mbv2 dw 28^2 C192 s2", 32, 28, 28, 192, 2),
    ("mbv2 dw 14^2 C384 s1", 32, 14, 14, 384, 1),
    ("mbv2 dw 14^2 C576 s2", 32, 14, 14, 576, 1),
    ("flow dw 128^2 C32 s2", 32, 128, 128, 32, 2),
    ("flow dw 64^2 C32 s2", 32, 64, 64, 32, 2),
]


def timeit(label, fn, *args, mode="fwd"):
    if mode == "fwd":
        def loop(*xs):
            def body(_, carry):
                out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))
    else:
        def loop(*xs):
            def body(_, carry):
                g = jax.grad(
                    lambda a, k: jnp.sum(fn(a, k).astype(jnp.float32) ** 2)
                    * 1e-9, argnums=(0, 1))(
                        xs[0] + carry.astype(xs[0].dtype), xs[1])
                return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree_util.tree_leaves(g)).astype(
                    jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from smow_net_tpu.ops import convops

    for label, B, H, W, C, s in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), bf)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, C), bf)

        def dw(a, kk, s=s):
            return convops.conv(a, kk, (s, s), (1, 1), groups=C)

        f = timeit(label, dw, x, k, mode="fwd")
        fb = timeit(label, dw, x, k, mode="bwd")
        # naive floor: 9 taps x output elements, VPU ~4e12 flop/s (bf16 fma)
        out_el = B * (H // s) * (W // s) * C
        floor_ms = out_el * 9 * 2 / 4e12 * 1e3
        print(f"{label:26s} fwd {f:7.3f} ms  fwd+bwd {fb:7.3f} ms  "
              f"(vpu floor ~{floor_ms:.3f}/{3 * floor_ms:.3f})", flush=True)


if __name__ == "__main__":
    main()
