"""Time the warp Pallas kernels standalone (no autodiff glue) to locate
where the OFW train-side milliseconds go: primal fwd kernel, full backward
kernel (dx+dw), dw-only kernel, scatter kernel, and the XLA glue
(_corner_indices_weights + its vjp + transposes) in isolation.

Shapes = the fused OFW token path: 32 frames of 128^2, C=8 channels.
In-graph fori_loop with a carry feeding the cotangent/grid so nothing can
be hoisted; full-output consumption."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smow_net_tpu.ops.pallas import warp as pw

B, H, W, C = 32, 128, 128, 8
P = H * W
ITERS = int(os.environ.get("PB_ITERS", "20"))


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves).astype(
                jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt/ITERS*1e3:8.3f} ms", flush=True)


def main():
    r = jax.random.normal
    k = jax.random.PRNGKey
    bf = jnp.bfloat16
    x = r(k(0), (B, H, W, C), bf)
    flow = r(k(1), (B, H, W, 2), bf) * 3.0
    from smow_net_tpu.ops.warp import _flow_grid

    grid = _flow_grid(flow, H, W)
    idxw = pw._corner_indices_weights(grid, H, W, "border", True)
    xt = x.reshape(B, H, W * C).transpose(0, 2, 1)
    gy = r(k(2), (B, H, W, C), bf)
    gt = gy.reshape(B, P, C).transpose(0, 2, 1)

    # 1. primal forward kernel (incl glue) — reference point
    timeit("fwd full (kernel+glue)",
           lambda xx: pw.grid_sample_pallas(xx, grid), x)

    # 2. full backward kernel alone (idxw carried -> not hoistable)
    def bwd_kernel_only(tp, idxw_, xt_, gt_):
        kern = functools.partial(pw._bwd_kernel, H=H, W=W, C=C, border=True)
        return pl.pallas_call(
            kern,
            grid=(B, P // tp),
            in_specs=[
                pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
                jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=pw._BWD_VMEM_LIMIT,
            ),
        )(idxw_, xt_, gt_)

    import functools as _ft
    for tp in (256, 512, 1024):
        timeit(f"bwd kernel only (dx+dw) tp={tp}",
               _ft.partial(bwd_kernel_only, tp), idxw, xt, gt)

    # 3. dw-only kernel alone
    def dw_kernel_only(tp, idxw_, xt_, gt_):
        kern = functools.partial(pw._dw_kernel, H=H, W=W, C=C)
        return pl.pallas_call(
            kern,
            grid=(B, P // tp),
            in_specs=[
                pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=pw._BWD_VMEM_LIMIT,
            ),
        )(idxw_, xt_, gt_)

    for tp in (256, 512, 1024):
        timeit(f"dw kernel only tp={tp}",
               _ft.partial(dw_kernel_only, tp), idxw, xt, gt)

    # 4. scatter kernel (transpose primal, incl glue)
    timeit("scatter full (kernel+glue)",
           lambda gg: pw.grid_sample_transpose_pallas(gg, grid, (H, W)), gy)

    # 5. XLA glue alone: idxw + vjp chain + both transposes
    def glue_only(g_, x_, gy_):
        iw, f_vjp = jax.vjp(
            lambda gr: pw._corner_indices_weights(gr, H, W, "border", True),
            g_)
        xt_ = x_.reshape(B, H, W * C).transpose(0, 2, 1)
        gt_ = gy_.reshape(B, P, C).transpose(0, 2, 1)
        (dgrid,) = f_vjp(iw)
        return xt_, gt_, dgrid

    timeit("glue only (idxw+vjp+transposes)", glue_only, grid, x, gy)

    # 6. end-to-end value_and_grad of flow_warp wrt (x, flow)
    from smow_net_tpu.ops.warp import flow_warp

    def vg(x_, f_):
        def loss(a, b):
            return jnp.sum(flow_warp(a, b).astype(jnp.float32) ** 2) * 1e-9

        return jax.grad(loss, argnums=(0, 1))(x_, f_)

    timeit("flow_warp fwd+grad(x,flow) e2e", vg, x, flow)


if __name__ == "__main__":
    main()
