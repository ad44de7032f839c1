"""Same-process A/B of the decoder skip-concat lowering: the whole 5-stage
folded 3D U-Net decoder (train fwd+bwd AND inference, bs16 256^2 model
shapes) with ConvBlock23d.conv1 either reading the materialized per-frame
channel concat (catsplit=off) or contracting the decoder stream and skip
tensor as two separate convs summed (catsplit=on — the concat, up to 134 MB
at the 128^2 stage, never hits HBM; see models/smow_net._CATSPLIT).

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
from smow_net_tpu.models.smow_net import ConvBlock23d, ConvTransBlock3d
from smow_net_tpu.ops.pooling import max_pool

BS = 16
H = 256


class Decoder(nn.Module):
    force_eval: bool = False

    @nn.compact
    def __call__(self, f1, f2, f3, f4, x0, train=True):
        if self.force_eval:
            train = False
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


def main():
    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    s = H // 2
    f1 = r(k(4), (BS, s // 2, s // 2, 4 * 32), bf)
    f2 = r(k(5), (BS, s // 4, s // 4, 4 * 64), bf)
    f3 = r(k(6), (BS, s // 8, s // 8, 4 * 128), bf)
    f4 = r(k(7), (BS, s // 16, s // 16, 4 * 256), bf)
    x0l = r(k(8), (BS, s, s, 4 * 32), bf)
    old = sm._CATSPLIT
    try:
        for split in (False, True, False, True):
            sm.set_convblock_catsplit(split)
            timeit(f"decoder train [catsplit={'on' if split else 'off'}]",
                   Decoder(), f1, f2, f3, f4, x0l)
        for split in (False, True):
            sm.set_convblock_catsplit(split)
            timeit(f"decoder infer [catsplit={'on' if split else 'off'}]",
                   Decoder(force_eval=True), f1, f2, f3, f4, x0l,
                   train_kw=False)
    finally:
        sm.set_convblock_catsplit(old)


if __name__ == "__main__":
    main()
