"""Is XLA's 2-D depthwise conv lowering near the VPU floor at the shapes
that matter (MobileNetV2 backbone layers for SMOW_Net_LW, per-frame view of
the OFW flow chain)? Prints fwd and fwd+bwd ms per layer plus the naive
VPU-flop floor (taps x elements / ~4 TFLOP/s) to locate headroom for a
Pallas depthwise kernel.

Run on TPU: python tools/probe_dw2d.py

NB the printed "vpu floor" counts tap flops only; the follow-up A/B
(tools/probe_dwpallas.py) showed a hand-written stencil kernel pays ~16
full-array VMEM reads per frame pair for its shifted operands, so the
reachable floor is far higher and XLA's grouped lowering wins.
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


REPS = 8  # chain REPS convs per iteration so the ~1.6 ms in-graph harness
# floor (CLAUDE.md) doesn't bury sub-ms kernels; reported ms is per conv
# (measured minus a REPS=0 harness calibration, divided by REPS)


def main():
    from smow_net_tpu.ops import convops

    for label, B, H, W, C, s in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), bf)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, C), bf)

        def chain(a, kk, s=s, n=REPS):
            y = 0.0
            for i in range(n):
                # independent applications (roll input per rep so XLA can't
                # CSE them); stride-2 shrinks, so sum scalar consumptions
                y = y + jnp.mean(convops.conv(
                    jnp.roll(a, i, axis=1), kk, (s, s), (1, 1),
                    groups=C).astype(jnp.float32))
            return y

        def calib(a, kk, s=s):
            return chain(a, kk, s, 0) + jnp.mean(a.astype(jnp.float32))

        f0 = timeit(label, calib, x, k, mode="fwd")
        f = timeit(label, chain, x, k, mode="fwd")
        fb0 = timeit(label, calib, x, k, mode="bwd")
        fb = timeit(label, chain, x, k, mode="bwd")
        # naive floor: 9 taps x output elements, VPU ~4e12 flop/s (bf16 fma)
        out_el = B * (H // s) * (W // s) * C
        floor_ms = out_el * 9 * 2 / 4e12 * 1e3
        print(f"{label:26s} fwd {(f - f0) / REPS:7.3f} ms  "
              f"fwd+bwd {(fb - fb0) / REPS:7.3f} ms  "
              f"(vpu floor ~{floor_ms:.3f}/{3 * floor_ms:.3f})", flush=True)


if __name__ == "__main__":
    main()
