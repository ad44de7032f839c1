"""Measure the OFW flow-warp's share of SMOW_Net inference time on TPU:
full forward vs forward with flow_warp monkeypatched to identity.
Decides VERDICT #7 (Pallas warp kernel vs honest docs)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import smow_net_tpu.ops.warp as warp_mod
from smow_net_tpu.models import get_model

BS, SIZE, ITERS = 16, 256, 20


def bench(label):
    model = get_model("smow_net")
    x1 = jax.random.normal(jax.random.PRNGKey(0), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (BS, SIZE, SIZE, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(2),
                           x1[:1].astype(jnp.float32), x2[:1].astype(jnp.float32),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables)

    def fwd_loop(a, b):
        def body(_, carry):
            out = model.apply(variables, a + carry.astype(a.dtype), b, train=False)
            return (jnp.mean(out) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(fwd_loop).lower(x1, x2).compile()
    float(c(x1, x2))  # warm; D2H read forces completion (tunnel-safe)
    t0 = time.perf_counter()
    float(c(x1, x2))
    dt = time.perf_counter() - t0
    print(f"{label}: {dt/ITERS*1000:.2f} ms/batch ({BS*ITERS/dt:.1f} pairs/s)", flush=True)
    return dt


real = bench("with warp")

orig = warp_mod.flow_warp
warp_mod.flow_warp = lambda x, flow, align_corners=True: x
# models imported flow_warp by name? patch wherever it's referenced
import smow_net_tpu.models.smow_net as sm
if hasattr(sm, "flow_warp"):
    sm.flow_warp = warp_mod.flow_warp
nowarp = bench("warp as identity")
print(f"warp share: {(real - nowarp) / real * 100:.1f}% of forward", flush=True)
