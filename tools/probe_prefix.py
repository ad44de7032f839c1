"""Prefix timing of SMOW_Net inference (bf16, bs16, 256²): run the REAL
model body cut at successive exit points, so the marginal time between
consecutive prefixes is each segment's in-context cost — including the
concat/pool/lift glue the standalone stage probes don't see (stage sum ~13 ms
vs 14.9 ms whole-model; this locates the gap).

Usage: PB_ITERS=20 python tools/probe_prefix.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax.numpy as jnp

from tools.profile_breakdown import timeit, BS, SIZE
from smow_net_tpu.models.smow_net import (
    OFW, BasicConv3d, ConvBlock23d, ConvTransBlock3d, PixelTransformerDecoder,
    TokenTransformerEncoder, _lift24_folded, ofw_tokens_fused)
from smow_net_tpu.nn.resnet3d import ResNet3D, unfold_t
from smow_net_tpu.ops.pixel_shuffle import smow_shuffle
from smow_net_tpu.ops.pooling import max_pool
from smow_net_tpu.nn.layers import Conv


class Prefix(nn.Module):
    """SMOWNet.__call__ with an early exit; all live tensors are returned
    (the harness consumes every leaf) so no segment is dead-code-eliminated."""

    upto: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        xf = jnp.concatenate([x1, x2], axis=-1)
        x0, (f1, f2, f3, f4) = ResNet3D(name="resnet")(xf, train)
        if self.upto == 1:
            return x0, f1, f2, f3, f4

        x0 = BasicConv3d(32, name="Conv3d")(x0, train)
        x0u = unfold_t(x0, 2)
        if self.upto >= 3:
            tokens = ofw_tokens_fused(
                OFW(32, name="OFW"),
                TokenTransformerEncoder(32, name="Transformer_Encoder"),
                x0u, train)

        f1 = BasicConv3d(32, name="Conv3d1")(f1, train)
        f2 = BasicConv3d(64, name="Conv3d2")(f2, train)
        f3 = BasicConv3d(128, name="Conv3d3")(f3, train)
        f4 = BasicConv3d(256, name="Conv3d4")(f4, train)
        x0, f1, f2, f3, f4 = map(_lift24_folded, (x0, f1, f2, f3, f4))
        if self.upto == 2:
            return x0, f1, f2, f3, f4
        if self.upto == 3:
            return x0, f1, f2, f3, f4, tokens

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
        if self.upto == 4:
            return y, tokens

        y = PixelTransformerDecoder(128, folded_input=True,
                                    name="Transformer_Decoder")(y, tokens)
        y = Conv(4, 1, use_bias=False, name="classifier_conv")(y)
        return smow_shuffle(nn.sigmoid(y), 2)


def main():
    import jax

    bf = jnp.bfloat16
    r, k = jax.random.normal, jax.random.PRNGKey
    x1 = r(k(0), (BS, SIZE, SIZE, 3), bf)
    x2 = r(k(1), (BS, SIZE, SIZE, 3), bf)
    names = {1: "encoder", 2: "+reduces+lifts", 3: "+OFW+tokens",
             4: "+decoder", 5: "full model"}
    prev = 0.0
    for upto in (1, 2, 3, 4, 5):
        ms = timeit(f"prefix {upto} ({names[upto]})", Prefix(upto), x1, x2,
                    train_kw=False)
        print(f"    marginal: {ms - prev:6.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
