"""Same-process A/B of the pack-2 xattn lowering on SMOW_Net_LW
(VERDICT r4 #2): the D=64 cross-attn layer kernel runs with half its 128
lanes idle (10% BW, artifacts/bench_r04/lw_roofline.txt). Pack-2 rides two
pixels per kernel row with block-diagonal weights (ops/xattn._PACK2).

Arms, whole LW model infer + train and the standalone xattn stage:
  off — r4 lowering (one D=64 pixel per row)
  on  — pack-2

Usage: PB_ITERS=20 python tools/probe_lw_pack2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit as timeit_fwd
from tools.profile_breakdown_train import timeit as timeit_train
from smow_net_tpu.models import get_model
from smow_net_tpu.ops import xattn as ox

BS = 16
SIZE = 256
bf = jnp.bfloat16
r, k = jax.random.normal, jax.random.PRNGKey


class LWInfer(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        return get_model("smow_net_lw").__class__(name="m")(a, b, train=False)


def main():
    from smow_net_tpu.models.smow_net_lw import SMOWNetLW
    from smow_net_tpu.models.smow_net import PixelTransformerDecoder

    a = r(k(0), (BS, SIZE, SIZE, 3), bf)
    b = r(k(1), (BS, SIZE, SIZE, 3), bf)

    class Infer(nn.Module):
        @nn.compact
        def __call__(self, x, y, train=False):
            return SMOWNetLW(name="m")(x, y, train=train)

    # standalone LW xattn stage (D=64, folded input, 128^2 queries)
    yq = r(k(9), (BS, 128, 128, 4 * 16), bf)
    mem = r(k(10), (BS, 8, 64), bf)

    for label, on in (("off", False), ("on", True), ("off", False),
                      ("on", True)):
        ox.set_xlayer_pack2(on)
        timeit_fwd(f"LW xattn stage infer [pack2 {label}]",
                   PixelTransformerDecoder(64, folded_input=True), yq, mem,
                   train_kw=False)
    for label, on in (("off", False), ("on", True)):
        ox.set_xlayer_pack2(on)
        timeit_train(f"LW xattn stage train [pack2 {label}]",
                     PixelTransformerDecoder(64, folded_input=True), yq, mem,
                     train_kw=False)
    for label, on in (("off", False), ("on", True)):
        ox.set_xlayer_pack2(on)
        timeit_fwd(f"LW whole infer [pack2 {label}]", Infer(), a, b)
    ox.set_xlayer_pack2(True)


if __name__ == "__main__":
    main()
