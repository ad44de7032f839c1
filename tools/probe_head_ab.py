"""Whole-model inference A/B of the OFW folded-flow lowering
(models/smow_net.set_flow_folded) at bench shapes (bs16 256² bf16) for
smow_net and smow_net_lw.

Verdicts recorded (artifacts/bench_r04/head_ab{,_lw}.txt): flow-fold WINS
whole-model on both (smow_net 12.85 -> 12.58 ms/b, LW 9.72 -> 9.51) —
default ON. The same probe also measured the eval classifier-fold epilogue
(headfuse), which LOST on both (smow_net 13.24, LW 9.96 ms/b) and was
removed (see models/smow_net.py).

Usage: PB_ITERS=20 python tools/probe_head_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "20"))
BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))


def bench_model(label, model, variables, x1, x2):
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
    pps = BS * ITERS / dt
    print(f"{label:44s} {dt/ITERS*1e3:8.2f} ms/b  {pps:8.1f} pairs/s",
          flush=True)


def main():
    from smow_net_tpu.models import get_model
    from smow_net_tpu.models import smow_net as sm

    r, k = jax.random.normal, jax.random.PRNGKey
    x1 = r(k(0), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    x2 = r(k(1), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    names = os.environ.get("PB_MODELS", "smow_net,smow_net_lw").split(",")
    for name in names:
        model = get_model(name)
        variables = model.init(k(2), x1[:1].astype(jnp.float32),
                               x2[:1].astype(jnp.float32), train=False)
        variables = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            variables)
        # numeric cross-check of the folded eval path (bf16 tolerance)
        sm.set_flow_folded(False)
        ref = model.apply(variables, x1[:2], x2[:2], train=False)
        sm.set_flow_folded(True)
        out = model.apply(variables, x1[:2], x2[:2], train=False)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{name}: flowfold max abs err vs baseline = {err:.3e}",
              flush=True)
        assert err < 0.05, err

        for ff in (False, True, False, True):
            sm.set_flow_folded(ff)
            bench_model(f"{name} infer [flow={int(ff)}]",
                        model, variables, x1, x2)
    sm.set_flow_folded(True)


if __name__ == "__main__":
    main()
