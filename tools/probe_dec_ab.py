"""Same-process A/B of the decoder's ConvTranspose VJP routing: the whole
5-stage folded 3D U-Net decoder (train fwd+bwd, bs16 256^2 model shapes)
with the dilated-autodiff backward vs the phase-form custom VJP
(convops.conv_transpose_s2_hybrid). One process so tunnel variance between
runs cannot masquerade as a win."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from tools.profile_breakdown_train import timeit
from smow_net_tpu.ops import convops
from smow_net_tpu.ops.pooling import max_pool
from smow_net_tpu.models.smow_net import (
    ConvBlock23d, ConvTransBlock3d, _cat_folded)

BS = 16
H = 256


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, f1, f2, f3, f4, x0, train=True):
        y = max_pool(f4, (2, 2), (2, 2))
        y = ConvTransBlock3d(256, name="C3DT1")(y, train)
        y = ConvBlock23d(128, name="C3D1")(_cat_folded(y, f4, 4), train)
        y = ConvTransBlock3d(128, name="C3DT2")(y, train)
        y = ConvBlock23d(64, name="C3D2")(_cat_folded(y, f3, 4), train)
        y = ConvTransBlock3d(64, name="C3DT3")(y, train)
        y = ConvBlock23d(64, name="C3D3")(_cat_folded(y, f2, 4), train)
        y = ConvTransBlock3d(64, name="C3DT4")(y, train)
        y = ConvBlock23d(32, name="C3D4")(_cat_folded(y, f1, 4), train)
        y = ConvTransBlock3d(32, name="C3DT5")(y, train)
        y = ConvBlock23d(32, name="C3D5")(_cat_folded(y, x0, 4), train)
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
    for impl in ("dilated", "hybrid", "dilated", "hybrid"):
        convops.set_convt_s2_impl(impl)
        timeit(f"decoder train [{impl}]", Decoder(), f1, f2, f3, f4, x0l)


if __name__ == "__main__":
    main()
