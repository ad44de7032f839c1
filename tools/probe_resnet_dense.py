"""A/B the folded DecomposedConv3d lowering at whole-encoder scale:
grouped(G=2)+mix vs one fused dense conv (blockdiag(spatial)@mix).
Also checks numerical parity between the two lowerings."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
ITERS = int(os.environ.get("PB_ITERS", "20"))
PEAK = 197e12
bf = jnp.bfloat16


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return (s * 1e-9).astype(jnp.float32)
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
    print(f"{label:44s} {ms:8.3f} ms  {flops/1e9:8.1f} GF  mfu {mfu*100:5.1f}%",
          flush=True)
    return ms


def main():
    from smow_net_tpu.nn import resnet3d
    from smow_net_tpu.nn.resnet3d import ResNet3D

    r = jax.random.normal
    k = jax.random.PRNGKey
    x = r(k(0), (BS, 256, 256, 6), bf)
    enc = ResNet3D()
    resnet3d.set_folded_impl("grouped")
    v = enc.init(k(1), x, False)
    v = jax.tree_util.tree_map(
        lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, v)

    # parity (small input, f32)
    xs = r(k(2), (2, 64, 64, 6), jnp.float32)
    vs = enc.init(k(1), xs, False)
    resnet3d.set_folded_impl("grouped")
    a0, fa = jax.jit(lambda a: enc.apply(vs, a, False))(xs)
    resnet3d.set_folded_impl("dense")
    b0, fb = jax.jit(lambda a: enc.apply(vs, a, False))(xs)
    err = max(float(jnp.max(jnp.abs(p - q)) / (jnp.max(jnp.abs(q)) + 1e-9))
              for p, q in zip([a0] + list(fa), [b0] + list(fb)))
    print(f"grouped vs dense encoder parity rel err: {err:.2e}", flush=True)

    for impl in ("grouped", "dense"):
        resnet3d.set_folded_impl(impl)
        timeit(f"encoder whole ({impl})",
               lambda a: enc.apply(v, a, False), x)

    if os.environ.get("PB_SKIP_BWD", "0") == "1":
        return

    # training step matters too: fwd+bwd through the encoder
    def lossf(a):
        x0, feats = enc.apply(v, a, False)
        return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in [x0] + list(feats))

    for impl in ("grouped", "dense"):
        resnet3d.set_folded_impl(impl)
        timeit(f"encoder fwd+bwd ({impl})",
               lambda a: jax.grad(lossf)(a), x)


if __name__ == "__main__":
    main()
