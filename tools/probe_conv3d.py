"""Probe: XLA Conv3D vs exact temporal-tap decomposition on TPU.

A (3,3,3) conv over (B, T, H, W, C) equals the sum over temporal taps
dt in {-1,0,1} of a (3,3) 2D conv of the dt-shifted frames — 3 batched 2D
convs over B*T images. If XLA lowers Conv3D poorly on TPU, the decomposed
form wins; measured in-graph at SMOW_Net decoder shapes (CLAUDE.md
methodology: sequential carry + full consumption, D2H-read timing).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

B, T = 16, 4
ITERS = 30
DTYPE = jnp.bfloat16


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv3d_decomp(x, w):
    # w: (3, 3, 3, Cin, Cout); tap dt applies w[dt] to frames shifted by dt-1
    Bs, Ts, H, W, C = x.shape
    xt = x.reshape(Bs * Ts, H, W, C)
    outs = []
    for dt in range(3):
        y = jax.lax.conv_general_dilated(
            xt, w[dt], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        outs.append(y.reshape(Bs, Ts, H, W, -1))
    y0, y1, y2 = outs
    z = jnp.zeros_like(y0[:, :1])
    # out[t] = y0[t-1] + y1[t] + y2[t+1] with zero padding in time
    return (jnp.concatenate([z, y0[:, :-1]], 1) + y1
            + jnp.concatenate([y2[:, 1:], z], 1))


def timeit(fn, x, w, label):
    def loop(x, w):
        def body(_, c):
            out = fn(x + c.astype(x.dtype), w)
            return (jnp.mean(out) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(x, w).compile()
    float(c(x, w))
    t0 = time.perf_counter()
    float(c(x, w))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e3:.3f} ms", flush=True)
    return dt


# decoder stages: (H, Cin, Cout) after concat skip connections
for H, Cin, Cout in [(32, 192, 128), (64, 128, 64), (128, 128, 64),
                     (256, 96, 32), (256, 64, 32)]:
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, H, Cin), jnp.float32).astype(DTYPE)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, Cin, Cout), jnp.float32)
         * 0.05).astype(DTYPE)
    # numerics check (CPU-verified elsewhere; cheap sanity here)
    d3 = timeit(conv3d, x, w, f"H{H} {Cin}->{Cout} conv3d")
    dd = timeit(conv3d_decomp, x, w, f"H{H} {Cin}->{Cout} decomp")
    print(f"  speedup {d3/dd:.2f}x", flush=True)
