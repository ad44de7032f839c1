"""Measure change_mamba train-step (fwd+bwd+AdamW) with pallas vs xla scan
backends on the real TPU. In-graph fori_loop with carry dependency +
full-output consumption (CLAUDE.md methodology)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smow_net_tpu.models import get_model
from smow_net_tpu.ops.scan import set_scan_impl

import os as _os
BS = int(_os.environ.get("MB_BS", "4"))
SIZE = int(_os.environ.get("MB_SIZE", "128"))
ITERS = int(_os.environ.get("MB_ITERS", "8"))
REMAT = _os.environ.get("MB_REMAT", "0") == "1"
# bf16 = the production mixed-precision recipe (train.py --bf16): bf16
# compute, fp32 master params. The f32 mode keeps every conv/proj at
# HIGHEST-precision MXU throughput (~6x slower), which can mask the scan
# backend entirely.
DTYPE = _os.environ.get("MB_DTYPE", "f32")
_cd = jnp.bfloat16 if DTYPE == "bf16" else None

model = get_model("change_mamba", use_checkpoint=REMAT)
a = jnp.zeros((BS, SIZE, SIZE, 3), jnp.float32)
b = jnp.zeros((BS, SIZE, SIZE, 3), jnp.float32)
m = jnp.zeros((BS, SIZE, SIZE), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), a[:1, :64, :64], b[:1, :64, :64], train=False)
params, stats = variables["params"], variables.get("batch_stats", {})
tx = optax.adamw(1e-4)
opt_state = tx.init(params)
if _cd is not None:
    a = a.astype(_cd)
    b = b.astype(_cd)


def loss_fn(p, st, a, b, m):
    if _cd is not None:
        p = jax.tree_util.tree_map(lambda w: w.astype(_cd), p)
    out = model.apply({"params": p, "batch_stats": st}, a, b, train=False)
    logits = out[..., 0] if out.ndim == 4 else out
    return jnp.mean((jax.nn.sigmoid(logits.astype(jnp.float32)) - m) ** 2)


def step(carry, _):
    p, o, a, b, m = carry
    loss, grads = jax.value_and_grad(loss_fn)(p, stats, a, b, m)
    upd, o = tx.update(grads, o, p)
    p = optax.apply_updates(p, upd)
    # carry feeds next input: sequential data dependency
    a = a + loss.astype(a.dtype) * 1e-6
    return (p, o, a, b, m), loss


def run(p, o, a, b, m):
    (p, o, a, b, m), losses = jax.lax.scan(step, (p, o, a, b, m), None, length=ITERS)
    return losses, jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.abs(x[..., :1])), p, 0.0)


IMPLS = tuple(_os.environ.get("MB_IMPLS", "pallas,xla").split(","))

for impl in IMPLS:
    set_scan_impl(impl)
    # fresh function object per impl so the jit cache cannot alias the two
    run_c = jax.jit(lambda p, o, a, b, m: run(p, o, a, b, m))
    t0 = time.time()
    losses, chk = run_c(params, opt_state, a, b, m)
    float(chk)  # D2H read forces completion (tunnel-safe)
    compile_and_first = time.time() - t0
    t0 = time.time()
    losses, chk = run_c(params, opt_state, a, b, m)
    float(chk)
    dt = time.time() - t0
    per_step = dt / ITERS
    print(f"{impl}: {per_step*1000:.1f} ms/step ({BS/per_step:.1f} pairs/s) "
          f"[first call {compile_and_first:.1f}s]", flush=True)
