"""Per-block fwd+bwd timing of the SMOW_Net 3D U-Net decoder (train mode,
T-folded, bs16 256^2 model shapes): each ConvTransBlock3d and ConvBlock23d
standalone, to locate the train-side cost inside the 21 ms decoder stage."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "10"))
PEAK = 197e12
bf = jnp.bfloat16
BS = 16


def timeit(label, module, *args):
    variables = module.init(jax.random.PRNGKey(0), *args, train=False)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def loss_fn(p, x0):
        p = jax.tree_util.tree_map(lambda w: w.astype(bf), p)
        vs = {"params": p}
        mut = []
        if stats:
            vs["batch_stats"] = jax.tree_util.tree_map(
                lambda s: s.astype(bf), stats)
            mut = ["batch_stats"]
        if mut:
            out, _ = module.apply(vs, x0, train=True, mutable=mut)
        else:
            out = module.apply(vs, x0, train=True)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9

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
    print(f"{label:34s} {dt/ITERS*1e3:8.2f} ms {flops/1e9:8.1f} GF "
          f"mfu {flops*ITERS/dt/PEAK*100:5.1f}%", flush=True)


def main():
    from smow_net_tpu.models.smow_net import ConvBlock23d, ConvTransBlock3d

    r, k = jax.random.normal, jax.random.PRNGKey
    only = os.environ.get("PB_ONLY", "")
    # (label, module, folded input shape) at the real decoder shapes
    rows = [
        # ConvTrans blocks at their true decoder shapes (input, features)
        ("C3DT1 4->8 1024->256", ConvTransBlock3d(256), (BS, 4, 4, 4 * 256)),
        ("C3DT2 8->16 512->128", ConvTransBlock3d(128), (BS, 8, 8, 4 * 128)),
        ("C3DT3 16->32 256->64", ConvTransBlock3d(64), (BS, 16, 16, 4 * 64)),
        ("C3DT4 32->64 256->64", ConvTransBlock3d(64), (BS, 32, 32, 4 * 64)),
        ("C3DT5 64->128 128->32", ConvTransBlock3d(32), (BS, 64, 64, 4 * 32)),
        # ConvBlocks: post-concat channels -> features
        ("C3D1 2048->128 @8", ConvBlock23d(128), (BS, 8, 8, 4 * 512)),
        ("C3D2 1024->64 @16", ConvBlock23d(64), (BS, 16, 16, 4 * 256)),
        ("C3D3 512->64 @32", ConvBlock23d(64), (BS, 32, 32, 4 * 128)),
        ("C3D4 384->32 @64", ConvBlock23d(32), (BS, 64, 64, 4 * 96)),
        ("C3D5 256->32 @128", ConvBlock23d(32), (BS, 128, 128, 4 * 64)),
    ]
    for i, (label, mod, shape) in enumerate(rows):
        if only and str(i) not in only.split(","):
            continue
        timeit(label, mod, r(k(i), shape, bf))


if __name__ == "__main__":
    main()
