"""Same-process whole-model train-step A/B of the round-5 kernel lowerings
on SMOW_Net (bf16, bs16, 256²): value_and_grad w.r.t. params through the
full model, in-graph loop methodology.

Arms (label, token_train_impl, xattn parallel_b, xattn bwd tile):
  r4       — unfused token chain, serialized bwd at tile 512 (the r4 ship)
  tok      — hybrid token chain only
  xat      — best xattn bwd only (tile/parb from the r5b sweep via env)
  both     — both winners

Usage: PB_ITERS=10 XAB_TILE=512 XAB_PARB=1 python tools/probe_train_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_breakdown_train import timeit
from smow_net_tpu.models.smow_net import SMOWNet
import smow_net_tpu.models.smow_net as sm
from smow_net_tpu.ops import warp as ow
from smow_net_tpu.ops.pallas import xattn as px

BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))
XAB_TILE = int(os.environ.get("XAB_TILE", "512"))
XAB_PARB = os.environ.get("XAB_PARB", "1") != "0"


def main():
    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    a = r(k(0), (BS, SIZE, SIZE, 3), bf)
    b = r(k(1), (BS, SIZE, SIZE, 3), bf)

    arms = (
        ("r4", "unfused", False, 512, False),
        ("tok", "hybrid", False, 512, False),
        ("xat", "unfused", XAB_PARB, XAB_TILE, False),
        ("both", "hybrid", XAB_PARB, XAB_TILE, False),
        ("all+pool", "hybrid", XAB_PARB, XAB_TILE, True),
        ("r4", "unfused", False, 512, False),
        ("both", "hybrid", XAB_PARB, XAB_TILE, False),
    )
    for label, tok, parb, tile, pool in arms:
        ow.set_token_train_impl(tok)
        px.set_xlayer_bwd(tile=tile, parallel_b=parb)
        sm.set_pool_grouped(pool)
        timeit(f"SMOWNet train step [{label}]", SMOWNet(), a, b)
    ow.set_token_train_impl("unfused")
    px.set_xlayer_bwd(tile=512, parallel_b=True)
    sm.set_pool_grouped(False)


if __name__ == "__main__":
    main()
