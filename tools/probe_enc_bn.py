"""Ablate BatchNorm from the frame-batched train-mode encoder to see how
much of the fwd+bwd time is BN/elementwise rather than conv MACs.

Variants: full (BN train stats), bneval (running stats — no batch
reductions, still affine+normalize), nobn (BN replaced by identity).
Timing methodology = tools/profile_breakdown_train.py (in-graph fori_loop,
grad, full consumption)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))
ITERS = int(os.environ.get("PB_ITERS", "10"))
PEAK = 197e12


def timeit(label, module, *args):
    train = True
    variables = module.init(jax.random.PRNGKey(0), *args, train=False)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def loss_fn(p, x0):
        p = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), p)
        vs = {"params": p}
        mut = []
        if stats:
            vs["batch_stats"] = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.bfloat16), stats)
            mut = ["batch_stats"]
        out = module.apply(vs, x0, train=train, mutable=mut)
        if mut:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves) * 1e-9

    def loop(x):
        def body(_, carry):
            g = jax.grad(loss_fn)(params, x + carry.astype(x.dtype))
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(g)).astype(
                jnp.float32) * 1e-12

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


def main():
    import flax.linen as nn

    from smow_net_tpu.nn import layers, resnet3d

    x = jax.random.normal(jax.random.PRNGKey(0), (BS, SIZE, SIZE, 6),
                          jnp.bfloat16)
    which = os.environ.get("PB_VARIANT", "all")

    if which in ("all", "full"):
        timeit("enc train (BN batch stats)", resnet3d.ResNet3D(), x)

    if which in ("all", "bneval"):
        orig_apply = resnet3d._bn_apply
        resnet3d._bn_apply = (
            lambda bn, y, train, T, t_batch=False:
            orig_apply(bn, y, False, T, t_batch))
        try:
            timeit("enc train (BN running stats)", resnet3d.ResNet3D(), x)
        finally:
            resnet3d._bn_apply = orig_apply

    if which in ("all", "nobn"):
        class _NoBN(nn.Module):
            name_: str = ""

            @nn.compact
            def __call__(self, y, use_running_average=True):
                return y

        orig = layers.batch_norm
        resnet3d.batch_norm = lambda name="bn": _NoBN(name=name)
        try:
            timeit("enc train (no BN)", resnet3d.ResNet3D(), x)
        finally:
            resnet3d.batch_norm = orig


if __name__ == "__main__":
    main()
