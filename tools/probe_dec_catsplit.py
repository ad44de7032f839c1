"""Same-process A/B of the decoder skip lowerings: the whole 5-stage folded
3D U-Net decoder (train fwd+bwd AND inference, bs16 256^2 model shapes) with
ConvBlock23d.conv1 either
  off      — materialized per-frame channel concat of lifted skips,
  split    — stream and lifted skip contracted as two convs summed
             (the concat, up to 134 MB at 128^2, never hits HBM),
  liftfold — split + the T=2->4 temporal lift composed into the skip
             kernel (the lifted skip never hits HBM either).
Inputs are PRE-lift (T=2-folded) skips and the lift runs inside the timed
graph for the first two variants — matching the real model's composition.
See models/smow_net._CATSPLIT/_LIFTFOLD.

Usage: PB_ITERS=10 python tools/probe_dec_catsplit.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown_train import timeit
from smow_net_tpu.models import smow_net as sm
from smow_net_tpu.models.smow_net import (ConvBlock23d, ConvTransBlock3d,
                                          _lift24_folded)
from smow_net_tpu.ops.pooling import max_pool

BS = 16
H = 256


class Decoder(nn.Module):
    force_eval: bool = False

    @nn.compact
    def __call__(self, f1, f2, f3, f4, x0, train=True):
        if self.force_eval:
            train = False
        if sm._LIFTFOLD:
            y = max_pool(_lift24_folded(f4), (2, 2), (2, 2))
        else:
            x0, f1, f2, f3, f4 = map(_lift24_folded, (x0, f1, f2, f3, f4))
            y = max_pool(f4, (2, 2), (2, 2))
        y = ConvTransBlock3d(256, name="C3DT1")(y, train)
        y = ConvBlock23d(128, name="C3D1")((y, f4), train)
        y = ConvTransBlock3d(128, name="C3DT2")(y, train)
        y = ConvBlock23d(64, name="C3D2")((y, f3), train)
        y = ConvTransBlock3d(64, name="C3DT3")(y, train)
        y = ConvBlock23d(64, name="C3D3")((y, f2), train)
        y = ConvTransBlock3d(64, name="C3DT4")(y, train)
        y = ConvBlock23d(32, name="C3D4")((y, f1), train)
        y = ConvTransBlock3d(32, name="C3DT5")(y, train)
        y = ConvBlock23d(32, name="C3D5")((y, x0), train)
        return y


MODES = {"off": (False, False), "split": (True, False),
         "liftfold": (True, True)}


def main():
    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    s = H // 2
    f1 = r(k(4), (BS, s // 2, s // 2, 2 * 32), bf)
    f2 = r(k(5), (BS, s // 4, s // 4, 2 * 64), bf)
    f3 = r(k(6), (BS, s // 8, s // 8, 2 * 128), bf)
    f4 = r(k(7), (BS, s // 16, s // 16, 2 * 256), bf)
    x0l = r(k(8), (BS, s, s, 2 * 32), bf)
    try:
        for mode in ("off", "split", "liftfold", "off", "liftfold"):
            sm.set_convblock_catsplit(*MODES[mode])
            timeit(f"decoder train [{mode}]", Decoder(), f1, f2, f3, f4, x0l)
        for mode in ("off", "split", "liftfold"):
            sm.set_convblock_catsplit(*MODES[mode])
            timeit(f"decoder infer [{mode}]",
                   Decoder(force_eval=True), f1, f2, f3, f4, x0l,
                   train_kw=False)
    finally:
        sm.set_convblock_catsplit(False)


if __name__ == "__main__":
    main()
