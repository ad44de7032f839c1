"""Where does the change_mamba 256^2 bf16 train step (233.8 ms, batch 4)
go? fwd+bwd timings of the VSSM encoder tower, the per-level STBlock
triples, and single VSSBlocks at each stage shape (in-graph loop, CLAUDE.md
methodology). Decides whether the next Mamba optimization goes at the scan,
the projections, or the decoder assembly."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = int(os.environ.get("MB_BS", "4"))
SIZE = int(os.environ.get("MB_SIZE", "256"))
ITERS = int(os.environ.get("MB_ITERS", "8"))
bf = jnp.bfloat16


def timeit(label, module, *args, method=None):
    kw = {"train": True}
    variables = module.init(jax.random.PRNGKey(0), *args, train=False)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def loss_fn(p, x0, rest):
        p = jax.tree_util.tree_map(lambda w: w.astype(bf), p)
        vs = {"params": p}
        mut = []
        if stats:
            vs["batch_stats"] = stats
            mut = ["batch_stats"]
        out = module.apply(vs, x0, *rest, **kw, mutable=mut,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        if mut:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves) * 1e-9

    def loop(*xs):
        def body(_, carry):
            g = jax.grad(loss_fn)(params, xs[0] + carry.astype(xs[0].dtype),
                                  xs[1:])
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
        byts = float(cost.get("bytes accessed", float("nan")))
    except Exception:
        flops = byts = float("nan")
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    gb = byts * ITERS / dt / 1e9
    tf = flops * ITERS / dt / 1e12
    print(f"{label:38s} {ms:8.2f} ms  {flops/1e9:7.1f} GF {tf:5.1f} TF/s"
          f" ({tf/197*100:4.1f}%)  {byts/1e6:8.1f} MB {gb:6.0f} GB/s"
          f" ({gb/819*100:4.1f}%)", flush=True)


def main():
    import flax.linen as nn

    from smow_net_tpu.models.zoo.change_mamba import STBlock
    from smow_net_tpu.nn.ssm import VSSM, VSSBlock

    r = jax.random.normal
    k = jax.random.PRNGKey
    only = os.environ.get("MB_ONLY", "")

    if only in ("", "enc"):
        x = r(k(0), (BS, SIZE, SIZE, 3), bf)
        timeit("VSSM encoder tower (one pass)",
               VSSM((2, 2, 9, 2), (96, 192, 384, 768),
                    patchembed_version="v2", downsample_version="v2"), x)

    # single VSSBlocks at the four encoder stage shapes
    if only in ("", "blocks"):
        for i, (C, s) in enumerate(
                zip((96, 192, 384, 768), (4, 8, 16, 32))):
            xi = r(k(i + 1), (BS, SIZE // s, SIZE // s, C), bf)
            timeit(f"VSSBlock C={C} {SIZE // s}^2 (x depth)",
                   VSSBlock(C, 0.1, mlp_ratio=4.0), xi)

    # decoder STBlock triples per level (the widest dominates)
    if only in ("", "st"):
        for lvl, (C, s) in enumerate(
                zip((96, 192, 384, 768), (4, 8, 16, 32)), start=1):
            H = SIZE // s

            class Level(nn.Module):
                @nn.compact
                def __call__(self, a, b, train=True):
                    B, Hh, W, Cc = a.shape
                    p1 = STBlock(name="s1")(
                        jnp.concatenate([a, b], -1), train)
                    inter = jnp.stack([a, b], 3).reshape(B, Hh, 2 * W, Cc)
                    p2 = STBlock(name="s2")(inter, train)
                    side = jnp.concatenate([a, b], axis=2)
                    p3 = STBlock(name="s3")(side, train)
                    return p1, p2, p3

            a = r(k(10 + lvl), (BS, H, H, C), bf)
            b = r(k(20 + lvl), (BS, H, H, C), bf)
            timeit(f"decoder level {lvl} STBlocks ({H}^2 C={C})",
                   Level(), a, b)


if __name__ == "__main__":
    main()
