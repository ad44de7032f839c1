#!/usr/bin/env python
"""Benchmark harness: flagship SMOWNet throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.

Modes (BENCH_MODE):
  infer  (default) — jitted forward loop
  train            — jitted fwd+bwd+AdamW loop (mixed-precision when
                     BENCH_DTYPE=bf16, fp32 master params, same as
                     train.py --bf16)

Methodology (CLAUDE.md): ITERS steps inside ONE executable via lax.fori_loop/
scan with a sequential data dependency and full-output consumption — host-
dispatch timing is unreliable over this TPU tunnel. MFU is XLA-counted FLOPs
per iteration x ITERS / wall time / v5e bf16 peak (197 TFLOP/s); XLA's
cost_analysis counts a loop body once, so the xITERS factor is ours.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is the ratio to the best previously recorded run (BENCH_BASELINE.json /
BENCH_BASELINE_train.json) if present, else 1.0.
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
MODE = os.environ.get("BENCH_MODE", "infer")   # infer | train

V5E_BF16_PEAK = 197e12


def _flops(compiled) -> float:
    """XLA-counted FLOPs of ONE loop iteration.

    Verified on this image: `cost_analysis()` counts a lax.fori_loop/scan
    body exactly once regardless of trip count (a single forward and a
    20-iteration loop of it report identical flops), so the per-iteration
    figure IS the whole-program analysis; callers multiply by ITERS.
    """
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return float("nan")


def bench_infer(model):
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

    def fwd_loop(a, b):
        def body(_, carry):
            out = model.apply(variables, a + carry.astype(a.dtype), b, train=False)
            # consume the FULL output (a slice would let XLA dead-code-
            # eliminate most of the network inside the loop)
            return (jnp.mean(out) * 1e-9).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    compiled = jax.jit(fwd_loop).lower(x1, x2).compile()
    float(compiled(x1, x2))  # warm; host transfer forces real completion
    t0 = time.perf_counter()
    # time to a host-side float: block_until_ready alone has been observed
    # to return early over the axon tunnel (a recorded train run "finished"
    # in 1.6ms); a D2H scalar read cannot complete before the computation
    out = float(compiled(x1, x2))
    dt = time.perf_counter() - t0
    assert out == out, "nan from bench loop"
    return dt, _flops(compiled)


def bench_train(model):
    import optax

    from smow_net_tpu.train.loss import bce_dice_loss
    from smow_net_tpu.train.trainer import select_pred

    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (BATCH, SIZE, SIZE, 3), jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3), jnp.float32)
    gt = (jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE)) > 0.9).astype(
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x1[:1], x2[:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip(0.5), optax.adamw(1e-4, weight_decay=1e-4))
    opt_state = tx.init(params)
    compute_dtype = jnp.bfloat16 if DTYPE == "bf16" else None
    a = x1.astype(compute_dtype) if compute_dtype is not None else x1
    b = x2.astype(compute_dtype) if compute_dtype is not None else x2

    def train_loop(params, opt_state, batch_stats, a, b, gt):
        def loss_fn(p, stats, a, rng):
            if compute_dtype is not None:
                p = jax.tree_util.tree_map(lambda w: w.astype(compute_dtype), p)
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, a, b,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            pred = select_pred(out).astype(jnp.float32)
            return bce_dice_loss(pred, gt), mut["batch_stats"]

        def step(carry, i):
            params, opt_state, stats, a = carry
            # per-step dropout key, same as train/trainer.py's folding (a
            # fixed key would bench a slightly unrepresentative program)
            rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, a, rng)
            if compute_dtype is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads)
                stats = jax.tree_util.tree_map(
                    lambda s: s.astype(jnp.float32), stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # sequential data dependency on the input as well
            a = a + loss.astype(a.dtype) * 1e-9
            return (params, opt_state, stats, a), loss

        (params, opt_state, stats, a), losses = jax.lax.scan(
            step, (params, opt_state, batch_stats, a), jnp.arange(ITERS))
        return losses, jnp.sum(losses)

    compiled = jax.jit(train_loop).lower(
        params, opt_state, batch_stats, a, b, gt).compile()
    out = compiled(params, opt_state, batch_stats, a, b, gt)
    float(out[1])  # warm; host transfer forces real completion
    t0 = time.perf_counter()
    out = compiled(params, opt_state, batch_stats, a, b, gt)
    s = float(out[1])  # see bench_infer: D2H read, not block_until_ready
    dt = time.perf_counter() - t0
    assert s == s, "nan loss from bench train loop"
    return dt, _flops(compiled)


def main():
    from smow_net_tpu.models import get_model

    conv3d = os.environ.get("BENCH_CONV3D")
    if conv3d:
        from smow_net_tpu.ops.convops import set_conv3d_impl

        set_conv3d_impl(conv3d)
    model = get_model(MODEL)
    dt, flops = (bench_train if MODE == "train" else bench_infer)(model)
    pairs_per_sec = BATCH * ITERS / dt
    mfu = flops * ITERS / dt / V5E_BF16_PEAK if flops == flops else None

    # baselines are PER MODEL (comparing a zoo model against the flagship's
    # baseline produced meaningless ratios): the flagship keeps the legacy
    # file names, other models read baselines/BENCH_BASELINE_{model}[_train]
    # (seeded from each model's first recorded measurement)
    tag = "_train" if MODE == "train" else ""
    repo = os.path.dirname(os.path.abspath(__file__))
    baseline_file = os.path.join(
        repo, f"BENCH_BASELINE{tag}.json" if MODEL == "smow_net"
        else f"baselines/BENCH_BASELINE_{MODEL}{tag}.json")
    baseline = None
    # Baselines are recorded at each model's canonical batch; comparing a
    # different-batch run (e.g. the reference's batch-1 eval protocol,
    # test.py:48-49) against them is meaningless — skip via BENCH_NO_BASELINE.
    if os.path.exists(baseline_file) and not os.environ.get("BENCH_NO_BASELINE"):
        try:
            baseline = json.load(open(baseline_file)).get("value")
        except Exception:
            baseline = None
    vs = pairs_per_sec / baseline if baseline else 1.0
    suffix = "train" if MODE == "train" else "infer"
    print(json.dumps({
        "metric": f"{MODEL}_{suffix}_pairs_per_sec_{SIZE}",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
