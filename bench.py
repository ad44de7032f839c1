#!/usr/bin/env python
"""Benchmark harness: flagship SMOWNet inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported relative to the driver-recorded north-star definition (ratio to
the best previously recorded run if BENCH_BASELINE.json exists, else 1.0).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
MODEL = os.environ.get("BENCH_MODEL", "smow_net")
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")  # bf16 | f32


def main():
    from smow_net_tpu.models import get_model

    model = get_model(MODEL)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (BATCH, SIZE, SIZE, 3), jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x1[:1], x2[:1], train=False)

    if DTYPE == "bf16":
        # bf16 inference: params + activations in bfloat16 (MXU native);
        # accumulation stays fp32 via preferred_element_type in the conv path
        variables = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables
        )
        x1 = x1.astype(jnp.bfloat16)
        x2 = x2.astype(jnp.bfloat16)

    @jax.jit
    def fwd_loop(a, b):
        # ITERS forwards inside ONE executable: measures pure device
        # throughput, excluding host->device dispatch latency (this
        # environment's TPU tunnel adds ~20ms RTT per dispatch otherwise).
        # Each iteration's input depends on the previous output so XLA
        # cannot hoist the (loop-invariant) forward out of the loop.
        def body(_, carry):
            out = model.apply(variables, a + carry.astype(a.dtype), b, train=False)
            # consume the FULL output (a slice would let XLA dead-code-
            # eliminate most of the network inside the loop)
            return (jnp.mean(out) * 1e-9).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    jax.block_until_ready(fwd_loop(x1, x2))  # compile + warm
    t0 = time.perf_counter()
    out = fwd_loop(x1, x2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pairs_per_sec = BATCH * ITERS / dt

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    vs = pairs_per_sec / baseline if baseline else 1.0
    print(json.dumps({
        "metric": f"{MODEL}_infer_pairs_per_sec_{SIZE}",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
