"""Per-stage fwd+bwd timing of the frame-batched train-mode encoder:
stem, maxpool, layer1..layer4 standalone at their true shapes (bs16 pairs,
256^2 -> per-frame batch 32). Locates which convs hold the 17% MFU."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "10"))
PEAK = 197e12
bf = jnp.bfloat16
B2 = 32  # frame-batched


def timeit(label, module, *args, t_batch=True, impl=None):
    from smow_net_tpu.nn import resnet3d

    if impl:
        resnet3d.set_folded_impl(impl)
    kw = {"t_batch": True} if t_batch else {}
    variables = module.init(jax.random.PRNGKey(0), *args, train=False, **kw)
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
            out, _ = module.apply(vs, x0, train=True, **kw, mutable=mut)
        else:
            out = module.apply(vs, x0, train=True, **kw)
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
    print(f"{label:30s} {dt/ITERS*1e3:8.2f} ms {flops/1e9:8.1f} GF "
          f"mfu {flops*ITERS/dt/PEAK*100:5.1f}%", flush=True)


def main():
    import flax.linen as nn

    from smow_net_tpu.nn.resnet3d import BasicBlock3d, DecomposedConv3d

    r, k = jax.random.normal, jax.random.PRNGKey

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True, t_batch=False):
            return DecomposedConv3d(64, 7, 2, 3, name="conv1")(
                x, train=train, t_batch=t_batch)

    class Stage(nn.Module):
        w: int
        s: int

        @nn.compact
        def __call__(self, x, train=True, t_batch=False):
            y = BasicBlock3d(self.w, self.s, name="b0")(x, train, t_batch)
            return BasicBlock3d(self.w, 1, name="b1")(y, train, t_batch)

    only = os.environ.get("PB_ONLY", "")
    stages = [
        ("stem 7x7s2 (+mix)", Stem(), (B2, 256, 256, 3), True, None),
        ("layer1 64 64^2", Stage(64, 1), (B2, 64, 64, 64), True, None),
        ("layer2 128 s2", Stage(128, 2), (B2, 64, 64, 64), True, None),
        ("layer3 256 s2", Stage(256, 2), (B2, 32, 32, 128), True, None),
        ("layer4 512 s2", Stage(512, 2), (B2, 16, 16, 256), True, None),
        # folded dense (s2d stem / blockdiag@mix) under TRAINING — the
        # lane-starved early stages may prefer 2x-MAC full-lane kernels
        ("stem s2d dense TRAIN", Stem(), (16, 256, 256, 6), False, "dense"),
        ("layer1 dense TRAIN", Stage(64, 1), (16, 64, 64, 128), False,
         "dense"),
        ("layer1 grouped TRAIN", Stage(64, 1), (16, 64, 64, 128), False,
         "grouped"),
        ("layer2 dense TRAIN", Stage(128, 2), (16, 64, 64, 128), False,
         "dense"),
    ]
    for i, (label, mod, shape, tb, impl) in enumerate(stages):
        if only and only != str(i):
            continue
        timeit(label, mod, r(k(i), shape, bf), t_batch=tb, impl=impl)


if __name__ == "__main__":
    main()
