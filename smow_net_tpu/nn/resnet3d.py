"""Inflated (decomposed) 3D ResNet-18 encoder.

TPU-native rebuild of the reference's `ResNet3D`/`Decompose_conv` pattern
(models/SMOW_Net.py:426-585): every pretrained 2D conv becomes a spatial
(1,kh,kw) conv plus three 1x1x1 temporal mixers initialised so the block is
*temporally identity* at step 0 (time_2=eye, time_1=time_3=0), i.e. the
inflated net starts exactly equal to per-frame 2D ResNet. BatchNorm
normalizes over (B,T,H,W) like torch BatchNorm3d.

Activations are (B, T, H, W, C); the encoder is time-preserving (T=2).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pooling import max_pool
from ..utils import torch_init
from .layers import Conv, batch_norm

__all__ = ["DecomposedConv3d", "BasicBlock3d", "ResNet3D"]


class DecomposedConv3d(nn.Module):
    """Spatial conv over each frame + cyclic temporal 1x1x1 mix for T=2
    (reference Decompose_conv, models/SMOW_Net.py:443-473).

    frame1_out = time_2(F1) + time_3(F2); frame2_out = time_1(F1) + time_2(F2),
    with time_2 identity-init and time_1/time_3 zero-init.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        y = Conv(
            self.features, (1, k, k), (1, s, s), (0, p, p), use_bias=self.use_bias,
            name="spatial",
        )(x)
        t_id = Conv(
            self.features, 1, use_bias=False, kernel_init=torch_init.temporal_identity,
            name="time_2",
        )
        t_fwd = Conv(self.features, 1, use_bias=False, kernel_init=torch_init.zeros, name="time_1")
        t_bwd = Conv(self.features, 1, use_bias=False, kernel_init=torch_init.zeros, name="time_3")
        y_id = t_id(y)
        f1 = y_id[:, 0:1] + t_bwd(y[:, 1:2])
        f2 = t_fwd(y[:, 0:1]) + y_id[:, 1:2]
        return jnp.concatenate([f1, f2], axis=1)


class BasicBlock3d(nn.Module):
    """ResNet-18 BasicBlock, decomposed (reference Bottleneck3d,
    models/SMOW_Net.py:542-579 — despite the name it wraps BasicBlocks)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        y = DecomposedConv3d(self.features, 3, self.stride, 1, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = DecomposedConv3d(self.features, 3, 1, 1, name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv(
                self.features, (1, 1, 1), (1, self.stride, self.stride), 0, use_bias=False,
                name="downsample_conv",
            )(x)
            residual = batch_norm("downsample_bn")(residual, use_running_average=not train)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    """Inflated ResNet-18: stem (7x7 spatial + temporal mix) then 4 stages of
    2 BasicBlocks; strides (1,2,2,2); widths (64,128,256,512)."""

    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2

    def setup(self):
        self.stem = DecomposedConv3d(64, 7, 2, 3, name="conv1")
        self.bn1 = batch_norm("bn1")
        stages = []
        for i, w in enumerate(self.widths):
            blocks = []
            for j in range(self.blocks_per_stage):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(BasicBlock3d(w, stride, name=f"layer{i + 1}_{j}"))
            stages.append(blocks)
        self.stages = stages

    def stem_forward(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = self.stem(x)
        y = self.bn1(y, use_running_average=not train)
        return nn.relu(y)

    def __call__(self, x: jnp.ndarray, train: bool):
        """Returns (stem_out, [stage1..stage4 outputs])."""
        x0 = self.stem_forward(x, train)
        y = max_pool(x0, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        feats = []
        for blocks in self.stages:
            for blk in blocks:
                y = blk(y, train)
            feats.append(y)
        return x0, feats
