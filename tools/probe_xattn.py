"""Split the pixel cross-attn decoder stage: fused attention kernel vs the
XLA FeedForward half, standalone at bench shapes (bf16, bs16, 256² model →
decoder N=16384, D=128, M=8). Decides whether an MLP-fusion kernel is the
next win."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
ITERS = int(os.environ.get("PB_ITERS", "20"))
PEAK = 197e12


def timeit(label, module, *args):
    variables = module.init(jax.random.PRNGKey(0), *args)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables)

    def loop(*xs):
        def body(_, carry):
            out = module.apply(variables, xs[0] + carry.astype(xs[0].dtype),
                               *xs[1:])
            return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    try:
        cost = c.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    mfu = flops * ITERS / dt / PEAK
    print(f"{label:34s} {ms:8.2f} ms  {flops/1e9:8.1f} GF  mfu {mfu*100:5.1f}%",
          flush=True)
    return ms


class FusedLayer(nn.Module):
    @nn.compact
    def __call__(self, x, m):
        from smow_net_tpu.nn.layers import CrossTransformerLayer
        return CrossTransformerLayer(128, 8, dim_head=1, mlp_dim=256,
                                     name="layer0")(x, m)


class FFOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        from smow_net_tpu.nn.layers import FeedForward, layer_norm
        return FeedForward(128, 256, name="ff")(layer_norm(name="norm2")(x)) + x


def main():
    N = 128 * 128
    bf = jnp.bfloat16
    r = jax.random.normal
    k = jax.random.PRNGKey
    x = r(k(0), (BS, N, 128), bf)
    m = r(k(1), (BS, 8, 128), bf)
    timeit("fused decoder layer (attn+MLP)", FusedLayer(), x, m)
    if os.environ.get("PB_FF"):
        timeit("FF only (LN+fc1+gelu+fc2+res)", FFOnly(), x)


if __name__ == "__main__":
    main()
