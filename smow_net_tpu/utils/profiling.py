"""Tracing / profiling utilities (SURVEY.md §5).

Replaces the reference's fvcore FLOP counters + wall-clock timers
(compare/vmamba.py:167-239,438-443; train.py:142-148) with XLA-native
accounting: `jax.jit(...).lower(...).compile().cost_analysis()` for
FLOPs/bytes and a block_until_ready timing harness. Also exposes
`enable_nan_debugging` mirroring the reference's `check_nan_inf` pdb hook
(compare/vmamba.py:158-163) via jax's debug_nans.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["count_params", "cost_analysis", "time_fn", "model_report", "enable_nan_debugging"]


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes-accessed estimate of a jitted function."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> Dict[str, float]:
    """Wall-clock a jitted fn with proper device synchronisation."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": 1.0 / dt}


def model_report(model, input_size: int = 256, batch: int = 1, train: bool = False) -> Dict:
    """Params + FLOPs + single-device latency for a registered model."""
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)

    def fwd(a, b):
        return model.apply(variables, a, b, train=train)

    report = {"params": count_params(variables["params"])}
    try:
        report.update(cost_analysis(fwd, x, x))
    except Exception as e:  # cost analysis may be unavailable on some backends
        report["cost_error"] = str(e)
    return report


def enable_nan_debugging():
    """Raise (with location) on any NaN produced inside jit — the TPU-native
    answer to the reference's pdb-based check_nan_inf."""
    jax.config.update("jax_debug_nans", True)
