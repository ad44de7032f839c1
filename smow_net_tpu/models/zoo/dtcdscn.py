"""DTCDSCN — dual-task SE-ResNet siamese encoder with dilated center block
and SCSE decoder. Parity target: reference compare/DTCDSCN.py:168-300 (only
the active "master" difference path is wired there; the commented-out
per-image decoders are dead code and omitted here).
Output: sigmoid probabilities, 1 channel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, Dense, batch_norm
from ...ops.pooling import max_pool
from ...utils import torch_init

__all__ = ["DTCDSCN"]

_conv_init = torch_init.kaiming_normal_fan_out  # normal(0, sqrt(2/fan_out)), DTCDSCN.py:209-212


class SELayer(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = Dense(c // self.reduction, use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = Dense(c, use_bias=False, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = Conv(self.planes, 3, self.stride, 1, use_bias=False, kernel_init=_conv_init,
                 name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, use_bias=False, kernel_init=_conv_init, name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        y = SELayer(name="se")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv(self.planes, 1, self.stride, use_bias=False,
                            kernel_init=_conv_init, name="downsample_conv")(x)
            residual = batch_norm("downsample_bn")(residual, use_running_average=not train)
        return nn.relu(y + residual)


class Dblock(nn.Module):
    """Chained dilated convs (1,2,4,8) with cumulative residual sum
    (compare/DTCDSCN.py:49-69)."""

    channel: int

    @nn.compact
    def __call__(self, x):
        out = x
        y = x
        for i, d in enumerate((1, 2, 4, 8)):
            y = nn.relu(Conv(self.channel, 3, 1, d, dilation=d, kernel_init=_conv_init,
                             bias_init=torch_init.zeros, name=f"dilate{i + 1}")(y))
            out = out + y
        return out


class SCSEBlock(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        chn = jnp.mean(x, axis=(1, 2), keepdims=True)
        chn = Conv(c // self.reduction, 1, use_bias=False, kernel_init=_conv_init,
                   name="ce1")(chn)
        chn = nn.relu(chn)
        chn = nn.sigmoid(Conv(c, 1, use_bias=False, kernel_init=_conv_init, name="ce2")(chn))
        spa = nn.sigmoid(Conv(1, 1, use_bias=False, kernel_init=_conv_init, name="se")(x))
        return x * chn + x * spa


class DecoderBlock(nn.Module):
    n_filters: int

    @nn.compact
    def __call__(self, x, train: bool):
        c4 = x.shape[-1] // 4
        y = Conv(c4, 1, kernel_init=_conv_init, name="conv1")(x)
        y = batch_norm("norm1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = y + SCSEBlock(name="scse")(y)
        y = ConvTranspose(c4, 3, 2, 1, 1, name="deconv2")(y)
        y = batch_norm("norm2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.n_filters, 1, kernel_init=_conv_init, name="conv3")(y)
        y = batch_norm("norm3")(y, use_running_average=not train)
        return nn.relu(y)


class DTCDSCN(nn.Module):
    in_channels: int = 3
    layers: tuple = (3, 4, 6, 3)
    num_classes: int = 1

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        stem_conv = Conv(64, 7, 2, 3, use_bias=False, kernel_init=_conv_init,
                         name="firstconv")
        stem_bn = batch_norm("firstbn")
        stages = []
        for i, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stage = []
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                stage.append(SEBasicBlock(planes, stride, name=f"encoder{i + 1}_{j}"))
            stages.append(stage)

        def encode(x):
            y = stem_conv(x)
            y = stem_bn(y, use_running_average=not train)
            y = nn.relu(y)
            y = max_pool(y, 3, 2, 1)
            feats = []
            for stage in stages:
                for blk in stage:
                    y = blk(y, train)
                feats.append(y)
            return feats

        e1x, e2x, e3x, e4x = encode(xa)
        e1y, e2y, e3y, e4y = encode(xb)

        e4 = Dblock(512, name="dblock_master")(e4x - e4y)
        d4 = DecoderBlock(256, name="decoder4_master")(e4, train) + e3x - e3y
        d3 = DecoderBlock(128, name="decoder3_master")(d4, train) + e2x - e2y
        d2 = DecoderBlock(64, name="decoder2_master")(d3, train) + e1x - e1y
        d1 = DecoderBlock(64, name="decoder1_master")(d2, train)

        out = ConvTranspose(32, 4, 2, 1, name="finaldeconv1_master")(d1)
        out = nn.relu(out)
        out = Conv(32, 3, 1, 1, kernel_init=_conv_init, name="finalconv2_master")(out)
        out = nn.relu(out)
        out = Conv(self.num_classes, 3, 1, 1, kernel_init=_conv_init,
                   name="finalconv3_master")(out)
        return nn.sigmoid(out)
