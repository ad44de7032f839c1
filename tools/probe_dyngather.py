"""Feasibility probe: Mosaic tpu.dynamic_gather via jnp.take_along_axis in a
Pallas kernel, and a full bilinear-warp prototype built on it.

Hypothesis: the one-hot-matmul warp kernel is compute-bound by design
(~8.6 GMAC per 128x128x32 image); a chained row-gather + lane-gather
formulation (out[i,j] = x[Y[i,j], :] then [:, X[i,j]]) does the same warp in
~13 VPU passes over the output grid per channel. Run standalone on the chip
BEFORE rewriting ops/pallas/warp.py around it.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 128
C = 32
B = 32
ITERS = 50


def timeit(label, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    r = c(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = c(*args)
    out = jax.tree_util.tree_leaves(r)[0]
    _ = float(jnp.mean(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt*1e3:8.2f} ms", flush=True)
    return r


# ---------- step 1: single gather ops compile + correctness ----------

def k_gather0(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...], i_ref[...], axis=0, mode="promise_in_bounds")


def k_gather1(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...], i_ref[...], axis=1, mode="promise_in_bounds")


def try_single(axis, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (H, W)).astype(dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, H if axis == 0 else W,
                             jnp.int32)
    kern = k_gather0 if axis == 0 else k_gather1
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        )(x, idx)
        ref = jnp.take_along_axis(x, idx, axis=axis)
        ok = bool(jnp.all(out == ref))
        print(f"gather axis={axis} dtype={dtype.__name__}: compiled, exact={ok}",
              flush=True)
        return ok
    except Exception as e:
        print(f"gather axis={axis} dtype={dtype.__name__}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return False


# ---------- step 2: full warp prototype ----------

def _corner_idxw(grid):
    """grid (B, H, W, 2) in [-1,1] -> int32 corner indices + f32 weights,
    each (B, H, W) (align_corners=True, border)."""
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = jnp.clip((gx + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    iy = jnp.clip((gy + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    x0 = ix0.astype(jnp.int32)
    x1 = jnp.clip(ix0 + 1, 0, W - 1).astype(jnp.int32)
    y0 = iy0.astype(jnp.int32)
    y1 = jnp.clip(iy0 + 1, 0, H - 1).astype(jnp.int32)
    return y0, y1, x0, x1, (1 - ty), ty, (1 - tx), tx


def warp_kernel(y0_ref, y1_ref, x0_ref, x1_ref, wy0_ref, wy1_ref,
                wx0_ref, wx1_ref, img_ref, out_ref, *, C):
    y0 = y0_ref[0]
    y1 = y1_ref[0]
    x0 = x0_ref[0]
    x1 = x1_ref[0]
    wy0 = wy0_ref[0]
    wy1 = wy1_ref[0]
    wx0 = wx0_ref[0]
    wx1 = wx1_ref[0]
    take = functools.partial(jnp.take_along_axis, mode="promise_in_bounds")
    for c in range(C):
        x = img_ref[0, c].astype(jnp.float32)
        r0 = take(x, y0, axis=0)          # r0[i,j] = x[Y0[i,j], j]
        r1 = take(x, y1, axis=0)
        a = take(r0, x0, axis=1) * wx0 + take(r0, x1, axis=1) * wx1
        b = take(r1, x0, axis=1) * wx0 + take(r1, x1, axis=1) * wx1
        out_ref[0, c] = (a * wy0 + b * wy1).astype(out_ref.dtype)


def warp_dyngather(img, grid):
    """img (B, C, H, W), grid (B, H, W, 2) -> (B, C, H, W)."""
    Bc, Cc = img.shape[:2]
    y0, y1, x0, x1, wy0, wy1, wx0, wx1 = _corner_idxw(grid)
    spec2 = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(warp_kernel, C=Cc),
        grid=(Bc,),
        in_specs=[spec2] * 8 + [pl.BlockSpec((1, Cc, H, W), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, Cc, H, W), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
    )(y0, y1, x0, x1, wy0, wy1, wx0, wx1, img)


def warp_ref(img, grid):
    """Pure-XLA reference (NCHW) for correctness."""
    y0, y1, x0, x1, wy0, wy1, wx0, wx1 = _corner_idxw(grid)

    def one(imgb, y0, y1, x0, x1, wy0, wy1, wx0, wx1):
        def g(yy, xx):
            return imgb[:, yy, xx]  # (C, H, W) advanced-indexed by (H,W) maps
        a = g(y0, x0) * wx0 + g(y0, x1) * wx1
        b = g(y1, x0) * wx0 + g(y1, x1) * wx1
        return a * wy0 + b * wy1

    return jax.vmap(one)(img.astype(jnp.float32), y0, y1, x0, x1, wy0, wy1,
                         wx0, wx1).astype(img.dtype)


def main():
    ok0f = try_single(0, jnp.float32)
    ok1f = try_single(1, jnp.float32)
    try_single(0, jnp.bfloat16)
    try_single(1, jnp.bfloat16)
    try_single(0, jnp.int32)
    if not (ok0f and ok1f):
        print("dynamic gather unsupported; abort")
        return

    img = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, W), jnp.float32)
    grid = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2), jnp.float32,
                              -1.1, 1.1)
    out = warp_dyngather(img, grid)
    ref = warp_ref(img, grid)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"warp_dyngather f32 max err vs ref: {err:.2e}", flush=True)

    imgb = img.astype(jnp.bfloat16)
    outb = warp_dyngather(imgb, grid)
    errb = float(jnp.max(jnp.abs(outb.astype(jnp.float32) - ref)))
    print(f"warp_dyngather bf16 max err vs f32 ref: {errb:.2e}", flush=True)

    # timing: ITERS sequential warps inside one executable
    def loop(img, grid):
        def body(_, carry):
            o = warp_dyngather(img + carry.astype(img.dtype), grid)
            return (jnp.mean(o.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    for dt, x in (("f32", img), ("bf16", imgb)):
        c = jax.jit(loop).lower(x, grid).compile()
        float(c(x, grid))
        t0 = time.perf_counter()
        float(c(x, grid))
        el = time.perf_counter() - t0
        print(f"warp_dyngather {dt}: {el/ITERS*1e3:.3f} ms per {B}x{C}x{H}x{W}",
              flush=True)

    # current pallas warp for comparison (takes NHWC)
    from smow_net_tpu.ops.pallas.warp import grid_sample_pallas
    imgn = jnp.transpose(imgb, (0, 2, 3, 1))

    def loop2(imgn, grid):
        def body(_, carry):
            o = grid_sample_pallas(imgn + carry.astype(imgn.dtype), grid)
            return (jnp.mean(o.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop2).lower(imgn, grid).compile()
    float(c(imgn, grid))
    t0 = time.perf_counter()
    float(c(imgn, grid))
    el = time.perf_counter() - t0
    print(f"onehot-matmul warp bf16: {el/ITERS*1e3:.3f} ms per {B}x{H}x{W}x{C}",
          flush=True)


if __name__ == "__main__":
    main()
