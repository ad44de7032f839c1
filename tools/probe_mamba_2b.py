"""Whole-model A/B of the siamese-encoder (2B)-batched pass vs two
sequential passes for rs_mamba and change_mamba (bs4 256² bf16, the bench
config, infer and train).

Why: the r3 2B-batching commit (80f58d9) was recorded for change_mamba
only as vs_baseline 0.992 and never re-benched for rs_mamba; the r4
re-records came in at 0.89-0.98 of the pre-change baselines (rs infer
97.7/97.8 in two samples vs 109.5), so the "optimization" is suspect.

Usage: PB_ITERS=10 python tools/probe_mamba_2b.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import optax

ITERS = int(os.environ.get("PB_ITERS", "10"))
BS = int(os.environ.get("PB_BS", "4"))
SIZE = int(os.environ.get("PB_SIZE", "256"))


def bench_infer(label, model, variables, x1, x2):
    def loop(a, b):
        def body(_, carry):
            out = model.apply(variables, a + carry.astype(a.dtype), b,
                              train=False)
            return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(x1, x2).compile()
    float(c(x1, x2))
    t0 = time.perf_counter()
    float(c(x1, x2))
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt/ITERS*1e3:8.2f} ms/b  {BS*ITERS/dt:8.2f} pairs/s",
          flush=True)


def bench_train(label, model, variables, x1, x2):
    params = variables["params"]
    stats = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, a, b):
        pb = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), p)
        out, _ = model.apply({"params": pb, **stats}, a, b, train=True,
                             mutable=list(stats.keys()),
                             rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.mean(out.astype(jnp.float32) ** 2)

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def loop(a, b):
        def body(_, carry):
            p, s, acc = carry
            g = jax.grad(loss_fn)(p, a + acc.astype(a.dtype), b)
            up, s2 = opt.update(g, s, p)
            p2 = optax.apply_updates(p, up)
            leaf = jax.tree_util.tree_leaves(p2)[0]
            return p2, s2, (jnp.mean(leaf.astype(jnp.float32)) * 1e-9).astype(
                jnp.float32)

        return jax.lax.fori_loop(
            0, ITERS, body, (params, opt_state, jnp.zeros((), jnp.float32)))[2]

    c = jax.jit(loop).lower(x1, x2).compile()
    float(c(x1, x2))
    t0 = time.perf_counter()
    float(c(x1, x2))
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt/ITERS*1e3:8.2f} ms/b  {BS*ITERS/dt:8.2f} pairs/s",
          flush=True)


def main():
    from smow_net_tpu.models import get_model
    from smow_net_tpu.models.zoo import change_mamba as cm
    from smow_net_tpu.models.zoo import rs_mamba as rm

    r, k = jax.random.normal, jax.random.PRNGKey
    x1 = r(k(0), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    x2 = r(k(1), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    mods = {"rs_mamba": rm, "change_mamba": cm}
    names = os.environ.get("PB_MODELS", "rs_mamba,change_mamba").split(",")
    for name in names:
        model = get_model(name)
        variables = model.init(k(2), x1[:1].astype(jnp.float32),
                               x2[:1].astype(jnp.float32), train=False)
        variables = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, variables)
        for enc2b in (True, False, True, False):
            mods[name].set_enc_2b(enc2b)
            bench_infer(f"{name} infer [2b={int(enc2b)}]",
                        model, variables, x1, x2)
        fvars = model.init(k(2), x1[:1].astype(jnp.float32),
                           x2[:1].astype(jnp.float32), train=False)
        for enc2b in (True, False):
            mods[name].set_enc_2b(enc2b)
            bench_train(f"{name} train [2b={int(enc2b)}]",
                        model, fvars, x1, x2)
        mods[name].set_enc_2b(True)


if __name__ == "__main__":
    main()
