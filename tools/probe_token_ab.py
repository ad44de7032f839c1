"""Same-process A/B of the OFW token warp chain lowering at model shapes
(32 frames of 128², C=8 logits — bs16 256² recipe), train (fwd+bwd via grad
w.r.t. inputs) and infer:

  unfused — flow_warp + exp(. - stopmax) + flow_warp_transpose + row sums
            (the round-2 model path: 2 fwd + 2 bwd pallas kernels)
  fused/6 — token_softmax_scatter, bwd tile budgeted for 6 half-(W*C,tile)
            temporaries (tile 512 at these shapes)
  fused/3 — same, bwd tile 1024 (what the unfused bwd kernels ran at)

Usage: PB_ITERS=20 python tools/probe_token_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown_train import timeit
from tools.profile_breakdown import timeit as timeit_fwd
from smow_net_tpu.ops import warp as W
from smow_net_tpu.ops.pallas import warp as PW

B, H, Wd, C = 32, 128, 128, 8


class Unfused(nn.Module):
    @nn.compact
    def __call__(self, a, flow):
        n = H * Wd
        aw = W.flow_warp(a, flow)
        stopmax = lambda v: v - jax.lax.stop_gradient(
            jnp.max(v.reshape(B, n, C), axis=1)).reshape(B, 1, 1, C)
        eaw = jnp.exp(stopmax(aw))
        zaw = jnp.sum(eaw.reshape(B, n, C), axis=1)
        ew = W.flow_warp_transpose(eaw, flow)
        return ew, zaw


class Fused(nn.Module):
    @nn.compact
    def __call__(self, a, flow):
        return W.token_softmax_scatter(a, flow)


class Hybrid(nn.Module):
    @nn.compact
    def __call__(self, a, flow):
        return PW.token_scatter_hybrid_pallas(a, W._flow_grid(flow, H, Wd))




def main():
    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    a = r(k(0), (B, H, Wd, C), bf)
    flow = (r(k(1), (B, H, Wd, 2), jnp.float32) * 2.0).astype(bf)
    arms = (("unfused", Unfused(), None),
            ("hybrid", Hybrid(), 3),
            ("unfused", Unfused(), None),
            ("hybrid", Hybrid(), 3))
    if os.environ.get("PB_FUSED_ARM"):
        arms = arms + (("fused/3", Fused(), 3),)
    for label, mod, halves in arms:
        if halves is not None:
            PW.set_token_bwd_tile_factor(halves)
        timeit(f"token chain train [{label}]", mod, a, flow, train_kw=False)
    PW.set_token_bwd_tile_factor(3)


if __name__ == "__main__":
    main()
