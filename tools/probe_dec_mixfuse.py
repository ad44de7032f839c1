"""Same-process A/B of the decoder's ConvTrans mix-fusion gate: the whole
5-stage folded 3D U-Net decoder (train fwd+bwd AND inference, bs16 256^2
model shapes) with the cyclic temporal mix composed into the transposed-conv
kernel for stages with F <= gate. gate=0 is the per-frame baseline; 64
fuses C3DT3/4/5 (the lane-starved stages); 128 also fuses C3DT2.

VERDICT (v5e, bf16): gate=64 wins both modes — train 17.07/17.53 ms vs
18.02 at 128 vs 23.4-27.7 per-frame; infer 15.6 vs 15.8 at 128 vs ~23
per-frame. F=128 already fills the lanes per-frame, so fusing it only
adds the 2x FLOPs inflation. _MIXFUSE_MAX_F stays 64 for train AND eval."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from tools.profile_breakdown_train import timeit
from smow_net_tpu.models import smow_net as sm
from smow_net_tpu.ops.pooling import max_pool
from smow_net_tpu.models.smow_net import (
    ConvBlock23d, ConvTransBlock3d, _cat_folded)

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
    gates = [int(g) for g in
             os.environ.get("MF_GATES", "0,64,128,0,64").split(",") if g]
    igates = [int(g) for g in
              os.environ.get("MF_IGATES", "0,64,0,64").split(",") if g]
    for gate in gates:
        sm.set_convt_mixfuse_max_f(gate)
        timeit(f"decoder train [mixfuse<={gate}]",
               Decoder(), f1, f2, f3, f4, x0l)
    for gate in igates:
        sm.set_convt_mixfuse_max_f(gate)
        timeit(f"decoder infer [mixfuse<={gate}]",
               Decoder(force_eval=True), f1, f2, f3, f4, x0l,
               train_kw=False)
    sm.set_convt_mixfuse_max_f(64)


if __name__ == "__main__":
    main()
