"""PA_Former — prior-attention token transformer over a DeepLab-style
ResNet-18 (output-stride 16, multi-grid layer4).
Parity target: reference compare/PA_Former.py:544-571 (modules :9-235,
PriorInterpreter :235-273, ResNet variant :399-520).
Output: 2-channel logits at input resolution (DUpsampling scale 4).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import (Conv, Dense, FeedForward, SelfAttentionBlock,
                          CrossTransformerLayer, batch_norm, layer_norm)
from ...ops.pixel_shuffle import smow_shuffle
from ...ops.pooling import max_pool
from ...ops.resize import resize_linear
from ...ops.warp import grid_sample
from ...utils import torch_init

__all__ = ["PAFormer"]

_init = torch_init.kaiming_normal_fan_out


class DeepLabBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = Conv(self.planes, 3, self.stride, self.dilation, dilation=self.dilation,
                 use_bias=False, kernel_init=_init, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, use_bias=False, kernel_init=_init, name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv(self.planes, 1, self.stride, use_bias=False, kernel_init=_init,
                            name="downsample_conv")(x)
            identity = batch_norm("downsample_bn")(identity, use_running_average=not train)
        return nn.relu(y + identity)


class PriorInterpreter(nn.Module):
    """Depthwise strided context + flow warp (compare/PA_Former.py:235-273).
    Unlike the SMOW OFW, the warp grid here is NOT clamped and uses torch
    grid_sample defaults (zeros padding, align_corners=False)."""

    inplane: int

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        y = x
        for i in range(3):
            # k3 s2 and NO padding (PA_Former.py:240-248)
            y = Conv(self.inplane, 3, 2, 0, groups=self.inplane, name=f"down{i}_conv")(y)
            y = batch_norm(f"down{i}_bn")(y, use_running_average=not train)
            y = nn.relu(y)
        y = resize_linear(y, (H, W), (1, 2), align_corners=True)
        flow = Conv(2, 3, 1, 1, use_bias=False, name="flow_make")(
            jnp.concatenate([x, y], -1))
        fy = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
        fx = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32)
        base = jnp.stack(jnp.meshgrid(fx, fy, indexing="xy"), axis=-1)
        norm = jnp.asarray([W, H], jnp.float32)
        grid = base[None] + flow / norm
        return grid_sample(x, grid, padding_mode="zeros", align_corners=False)


class PABackbone(nn.Module):
    """DeepLab ResNet-18, output_stride 16: strides (1,2,2,1), layer4 is a
    3-block multi-grid unit with dilations (2,4,8) (PA_Former.py:400-516)."""

    f_c: int = 64

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(64, 7, 2, 3, use_bias=False, kernel_init=_init, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        low = max_pool(y, 3, 2, 1)

        y = low
        specs = [(64, 2, 1, 1), (128, 2, 2, 1), (256, 2, 2, 1)]
        taps = []
        for li, (planes, blocks, stride, dil) in enumerate(specs):
            for j in range(blocks):
                y = DeepLabBasicBlock(planes, stride if j == 0 else 1, dil,
                                      name=f"layer{li + 1}_{j}")(y, train)
            taps.append(y)
        x2, x3, x4 = taps
        # layer4 multi-grid: blocks (1,2,4) * dilation 2, stride 1
        for j, mg in enumerate((1, 2, 4)):
            y = DeepLabBasicBlock(512, 1, mg * 2, name=f"layer4_{j}")(y, train)

        size = low.shape[1:3]
        up = lambda v: resize_linear(v, size, (1, 2), align_corners=True)
        y = up(y)
        x3u, x4u = up(x3), up(x4)
        q = self.f_c // 4
        y = Conv(q, 1, name="last_conv")(y)
        c2 = Conv(q, 1, name="last_conv2")(x2)
        c3 = Conv(q, 1, name="last_conv3")(x3u)
        c4 = Conv(q, 1, name="last_conv4")(x4u)
        body = PriorInterpreter(self.f_c, name="PI")(low, train)
        return body, jnp.concatenate([c2, c3, c4, y], -1)


class TokenEncoder(nn.Module):
    """compare/PA_Former.py:35-54."""

    in_chan: int = 64
    token_len: int = 8
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.token_len, self.in_chan))
        att = Conv(self.token_len, 1, name="conv_a")(x).reshape(B, H * W, self.token_len)
        att = nn.softmax(att.transpose(0, 2, 1), axis=-1)
        tokens = jnp.einsum("bln,bnc->blc", att, x.reshape(B, H * W, C)) + pos
        t = SelfAttentionBlock(self.in_chan, self.heads, 64, name="attn")(
            layer_norm(name="norm1")(tokens)) + tokens
        return FeedForward(self.in_chan, 64, name="ff")(layer_norm(name="norm2")(t)) + t


class PAFormer(nn.Module):
    n_class: int = 2
    f_c: int = 64

    @nn.compact
    def __call__(self, img1, img2, train: bool = False):
        backbone = PABackbone(self.f_c, name="PriorFExtractor")
        body1, s16_1 = backbone(img1, train)
        body2, s16_2 = backbone(img2, train)

        enc = TokenEncoder(self.f_c, name="token_encoder")
        memory = jnp.concatenate([enc(body1), enc(body2)], axis=-1)  # (B, 8, 2*f_c)

        x16 = jnp.concatenate([s16_1, s16_2], axis=-1)  # (B, H/4, W/4, 2*f_c)
        B, H, W, C = x16.shape
        q = x16.reshape(B, H * W, C)
        q = CrossTransformerLayer(C, 8, dim_head=1, mlp_dim=C * 2, name="token_decoder")(
            q, memory)
        x16 = q.reshape(B, H, W, C)

        y = Conv(self.n_class * 16, 1, use_bias=False, name="decoder_conv")(x16)
        return smow_shuffle(y, 4)
