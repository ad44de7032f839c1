"""SMOW_Net_LW — lightweight variant (reference models/SMOW_Net_LW.py:9-98):
siamese (weight-shared) MobileNetV2 2D backbone run on each image, per-stage
stacking into T=2 volumes, the same OFW/token-transformer scheme at inplane
16, and a slimmer decoder whose blocks use (1,3,3) spatial convs plus
bias-free cyclic temporal mixing.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import Conv, ConvTranspose, batch_norm
from ..nn.mobilenetv2 import MobileNetV2
from ..ops.pixel_shuffle import smow_shuffle
from ..ops.pooling import max_pool
from ..ops.resize import resize_linear
from .smow_net import (OFW, PixelTransformerDecoder, TokenTransformerEncoder,
                       ofw_tokens_fused)
from .temporal import CyclicTemporalMix

__all__ = ["SMOWNetLW"]


class ConvTransBlockLW(nn.Module):
    """(1,3,3) ConvTranspose x2-upsample + bias-free cyclic temporal mix + BN
    + LeakyReLU(0.2) (reference models/SMOW_Net_LW.py:102-137)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = ConvTranspose(
            self.features, (1, 3, 3), (1, 2, 2), (0, 1, 1), (0, 1, 1), name="spatial"
        )(x)
        y = CyclicTemporalMix(self.features, use_bias=False, name="tmix")(y)
        y = batch_norm()(y, use_running_average=not train)
        return nn.leaky_relu(y, 0.2)


class ConvBlockLW(nn.Module):
    """(1,3,3) conv + bias-free cyclic temporal mix + BN + LeakyReLU(0.2)
    (reference models/SMOW_Net_LW.py:140-176)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = Conv(self.features, (1, 3, 3), 1, (0, 1, 1), name="spatial")(x)
        y = CyclicTemporalMix(self.features, use_bias=False, name="tmix")(y)
        y = batch_norm()(y, use_running_average=not train)
        return nn.leaky_relu(y, 0.2)


class SMOWNetLW(nn.Module):
    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        backbone = MobileNetV2(name="backbone")
        taps1 = backbone(x1, train)
        taps2 = backbone(x2, train)
        # per-stage T=2 volumes
        x0, f1, f2, f3, f4 = [
            jnp.stack([a, b], axis=1) for a, b in zip(taps1, taps2)
        ]

        tokens = ofw_tokens_fused(
            OFW(16, name="OFW"),
            TokenTransformerEncoder(16, name="Transformer_Encoder"), x0, train)

        lift = lambda v: resize_linear(v, (4,), (1,), align_corners=True)
        x0, f1, f2, f3, f4 = map(lift, (x0, f1, f2, f3, f4))

        y = max_pool(f4, (1, 2, 2), (1, 2, 2))
        y = ConvTransBlockLW(320, name="C3DT1")(y, train)
        y = ConvBlockLW(160, name="C3D1")(jnp.concatenate([y, f4], -1), train)
        y = ConvTransBlockLW(160, name="C3DT2")(y, train)
        y = ConvBlockLW(64, name="C3D2")(jnp.concatenate([y, f3], -1), train)
        y = ConvTransBlockLW(64, name="C3DT3")(y, train)
        y = ConvBlockLW(32, name="C3D3")(jnp.concatenate([y, f2], -1), train)
        y = ConvTransBlockLW(32, name="C3DT4")(y, train)
        y = ConvBlockLW(28, name="C3D4")(jnp.concatenate([y, f1], -1), train)
        y = ConvTransBlockLW(28, name="C3DT5")(y, train)
        y = ConvBlockLW(16, name="C3D5")(jnp.concatenate([y, x0], -1), train)

        y = PixelTransformerDecoder(64, name="Transformer_Decoder")(y, tokens)
        y = Conv(4, 1, use_bias=False, name="classifier_conv")(y)
        y = smow_shuffle(y, 2)
        return nn.sigmoid(y)
