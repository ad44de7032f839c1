"""Bisect the fused xattn kernel's cost: time stripped-down kernel variants
(DMA floor, +LN, +qproj, +softmax, +outproj, full) back-to-back in one
process at bench shapes (bf16, B16, N=16384, D=128). Deltas attribute the
measured ~2ms to specific in-kernel stages."""
import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, D, H_, M_ = 16, 16384, 128, 8, 8
HM = H_ * M_
TN = int(os.environ.get("XK_TILE", "1024"))
ITERS = 20


def kernel(x_ref, wq_ref, bq_ref, k_ref, v_ref, wo_ref, bo_ref, perm_ref,
           out_ref, *, level):
    x = x_ref[0]
    dt = x.dtype
    if level == 0:  # DMA floor
        out_ref[0] = x
        return
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + 1e-5)
    xn = (x32 - mu) * rstd
    if level == 1:  # LN only
        out_ref[0] = xn.astype(out_ref.dtype)
        return
    dims = lambda c: ((c, (0,)), ((), ()))
    q = jax.lax.dot_general(xn.astype(dt), wq_ref[...].astype(dt),
                            dims((1,)), preferred_element_type=jnp.float32)
    q = q + bq_ref[...].astype(jnp.float32)
    if level == 2:  # + q projection
        out_ref[0] = (xn + jnp.sum(q, axis=1, keepdims=True)).astype(out_ref.dtype)
        return
    dots = jax.lax.dot_general(q.astype(dt), k_ref[0].astype(dt), dims((1,)),
                               preferred_element_type=jnp.float32)
    rmax = jnp.max(dots, axis=-1, keepdims=True)
    e = jnp.exp(dots - rmax)
    g_mat = (jax.lax.broadcasted_iota(jnp.int32, (HM, H_), 0) // M_
             == jax.lax.broadcasted_iota(jnp.int32, (HM, H_), 1))
    den = jax.lax.dot_general(e.astype(dt), g_mat.astype(dt), dims((1,)),
                              preferred_element_type=jnp.float32)
    num = jax.lax.dot_general(e.astype(dt), v_ref[0].astype(dt), dims((1,)),
                              preferred_element_type=jnp.float32)
    o = num / jnp.maximum(den, 1e-30)
    if level == 3:  # + softmax core
        out_ref[0] = (xn + jnp.sum(o, axis=1, keepdims=True)).astype(out_ref.dtype)
        return
    y = jax.lax.dot_general(o.astype(dt), wo_ref[...].astype(dt), dims((1,)),
                            preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32)
    if level == 4:  # + out projection (residual = raw x, no perm matmul)
        out_ref[0] = (y + x32).astype(out_ref.dtype)
        return
    res = jax.lax.dot_general(x, perm_ref[...].astype(dt), dims((1,)),
                              preferred_element_type=jnp.float32)
    out_ref[0] = (y + res).astype(out_ref.dtype)


def run(level):
    const = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    perb = lambda *s: pl.BlockSpec((1,) + s, lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, TN, D), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, level=level),
        grid=(B, N // TN),
        in_specs=[tile, const(D, H_), const(1, H_), perb(H_, HM),
                  perb(HM, H_), const(H_, D), const(1, D), const(D, D)],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16
    args = (
        jax.random.normal(ks[0], (B, N, D), bf),
        jax.random.normal(ks[1], (D, H_), bf) * 0.1,
        jax.random.normal(ks[2], (1, H_), bf),
        jax.random.normal(ks[3], (B, H_, HM), bf),
        jax.random.normal(ks[4], (B, HM, H_), bf),
        jax.random.normal(ks[5], (H_, D), bf) * 0.1,
        jax.random.normal(ks[6], (1, D), bf),
        jnp.eye(D, dtype=bf),
    )

    def loop(*xs):
        def body(_, carry):
            out = f(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    print(f"level {level}: {dt / ITERS * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    for lv in [0, 1, 2, 3, 4, 5]:
        run(lv)
