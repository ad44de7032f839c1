"""SMOW_Net — the flagship bi-temporal change-detection model, TPU-native.

Faithful re-design of the reference architecture (models/SMOW_Net.py:8-101):
inflated ResNet-18 3D encoder over the stacked (T=2) image pair, an
optical-flow-warp (OFW) module expanding T=2 -> T=4, a token-attention
transformer encoder, a 3D U-Net decoder with cyclic temporal-mixing
transposed convs, a cross-attention transformer decoder over (H*W) queries,
and a sub-pixel classifier head.

Layouts are channels-last (B, T, H, W, C); all resizes run as MXU matmuls
(static shapes) and the warp is a batched XLA gather (Pallas variant in
ops/pallas). Unlike the reference, nothing is hard-coded to 256x256 input —
sizes are derived from the traced shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv, ConvTranspose, CrossTransformerLayer, TransformerLayer, batch_norm
from ..nn.resnet3d import ResNet3D
from ..ops.pixel_shuffle import smow_shuffle
from ..ops.pooling import max_pool
from ..ops.resize import resize_linear
from ..ops.warp import flow_warp
from .temporal import CyclicTemporalMix

__all__ = ["SMOWNet", "OFW", "TokenTransformerEncoder", "PixelTransformerDecoder"]


class BasicConv3d(nn.Module):
    """Conv3d + BN + ReLU (reference BasicConv3d, models/SMOW_Net.py:411-423)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = Conv(self.features, self.kernel_size, self.stride, self.padding, name="conv")(x)
        y = batch_norm()(y, use_running_average=not train)
        return nn.relu(y)


class OFW(nn.Module):
    """Optical-flow warp (reference models/SMOW_Net.py:587-637).

    Input (B, 2, H, W, C) -> output (B, 4, H, W, C) = [F1, warp(F1), warp(F2), F2].
    Three depthwise strided 3D convs build a coarse context, trilinearly
    lifted back to input size; a 3x3x3 conv predicts a 2-channel flow per
    frame; each frame is bilinearly warped (border, align_corners=True)."""

    inplane: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        y = x
        for i in range(3):
            y = Conv(
                self.inplane, 3, (1, 2, 2), 1, groups=self.inplane, name=f"down{i}_conv"
            )(y)
            y = batch_norm(f"down{i}_bn")(y, use_running_average=not train)
            y = nn.relu(y)
        # reference hard-codes size=(2,128,128) (models/SMOW_Net.py:607); we
        # use the actual input size — identical for the 256x256 recipe.
        y = resize_linear(y, (T, H, W), (1, 2, 3), align_corners=True)
        flow = Conv(2, 3, 1, 1, use_bias=False, name="flow_make")(
            jnp.concatenate([x, y], axis=-1)
        )  # (B, T, H, W, 2)
        # one batched warp over both frames: the (B, T) -> B*T reshape is a
        # contiguous no-op and frame/flow pairing is preserved element-wise
        w = flow_warp(x.reshape(B * T, H, W, C), flow.reshape(B * T, H, W, 2))
        w = w.reshape(B, T, H, W, C)
        return jnp.stack([x[:, 0], w[:, 0], w[:, 1], x[:, 1]], axis=1)


class TokenTransformerEncoder(nn.Module):
    """Per-timestep soft spatial token pooling + 1-layer MHSA
    (reference Transformer_Encoder, models/SMOW_Net.py:161-190).

    Input (B, 4, H, W, C) -> tokens (B, token_len, 4*C)."""

    in_chan: int = 32
    token_len: int = 8
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        assert T == 4, "token encoder expects T == 4"
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (T, self.token_len, self.in_chan)
        )
        conv_a = Conv(self.token_len, 1, name="conv_a")
        # batch the per-timestep loop: fold T into batch (one conv, one einsum)
        xt = x.reshape(B * T, H, W, C)
        att = conv_a(xt).reshape(B, T, H * W, self.token_len)
        att = jax.nn.softmax(att, axis=2)  # softmax over spatial positions
        feats = x.reshape(B, T, H * W, C)
        tokens = jnp.einsum("btnl,btnc->btlc", att, feats) + pos[None]
        # concat timestep channels: (B, L, T*C) with t-major feature order
        tokens = tokens.transpose(0, 2, 1, 3).reshape(B, self.token_len, T * C)
        dim = T * self.in_chan
        return TransformerLayer(dim, self.heads, dim, dim, name="transformer")(tokens)


class PixelTransformerDecoder(nn.Module):
    """Cross-attention of (H*W) pixel queries vs token memory (reference
    Transformer_Decoder, models/SMOW_Net.py:270-283). Input (B, 4, H, W, C)
    is flattened to (B, H*W, C*T) with channel-major order (torch
    `view(b, c*t, h, w)` semantics)."""

    in_chan: int = 128
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        # (B,T,H,W,C) -> (B,H,W,C,T) -> (B, H*W, C*T): feature idx = c*T + t
        q = x.transpose(0, 2, 3, 4, 1).reshape(B, H * W, C * T)
        q = CrossTransformerLayer(
            self.in_chan, self.heads, dim_head=1, mlp_dim=self.in_chan * 2, name="layer0"
        )(q, m)
        return q.reshape(B, H, W, self.in_chan)


class ConvTransBlock3d(nn.Module):
    """Spatial ConvTranspose (x2 upsample) + cyclic temporal 1x1x1 mixing over
    T=4 + BN + LeakyReLU(0.2) (reference conv_trans_block_3d,
    models/SMOW_Net.py:104-139). frame_j_out = id_mix(F_j) + mix_{j+1}(F_{j+1})
    cyclically, with id_mix identity-init and mix_i zero-init."""

    features: int
    spatial_kernel: int = 5
    spatial_padding: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        k, p = self.spatial_kernel, self.spatial_padding
        y = ConvTranspose(
            self.features, (1, k, k), (1, 2, 2), (0, p, p), (0, 1, 1), name="spatial"
        )(x)
        y = CyclicTemporalMix(self.features, use_bias=True, name="tmix")(y)
        y = batch_norm()(y, use_running_average=not train)
        return nn.leaky_relu(y, 0.2)


class ConvBlock23d(nn.Module):
    """Two 3x3x3 convs with BN; LeakyReLU only between them (reference
    conv_block_2_3d, models/SMOW_Net.py:142-156 — no final activation)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = Conv(self.features, 3, 1, 1, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.leaky_relu(y, 0.2)
        y = Conv(self.features, 3, 1, 1, name="conv2")(y)
        return batch_norm("bn2")(y, use_running_average=not train)


class SMOWNet(nn.Module):
    """Full SMOW_Net. __call__(x1, x2, train) with x1, x2: (B, H, W, 3) in
    [normalized] RGB; returns change probabilities (B, H, W, 1)."""

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.stack([x1, x2], axis=1)  # (B, 2, H, W, 3)
        resnet = ResNet3D(name="resnet")
        x0, (f1, f2, f3, f4) = resnet(x, train)

        x0 = BasicConv3d(32, name="Conv3d")(x0, train)
        tokens = OFW(32, name="OFW")(x0, train)
        tokens = TokenTransformerEncoder(32, name="Transformer_Encoder")(tokens)

        f1 = BasicConv3d(32, name="Conv3d1")(f1, train)
        f2 = BasicConv3d(64, name="Conv3d2")(f2, train)
        f3 = BasicConv3d(128, name="Conv3d3")(f3, train)
        f4 = BasicConv3d(256, name="Conv3d4")(f4, train)

        lift = lambda v: resize_linear(v, (4,), (1,), align_corners=True)
        x0, f1, f2, f3, f4 = map(lift, (x0, f1, f2, f3, f4))

        y = max_pool(f4, (1, 2, 2), (1, 2, 2))
        y = ConvTransBlock3d(256, name="C3DT1")(y, train)
        y = ConvBlock23d(128, name="C3D1")(jnp.concatenate([y, f4], -1), train)
        y = ConvTransBlock3d(128, name="C3DT2")(y, train)
        y = ConvBlock23d(64, name="C3D2")(jnp.concatenate([y, f3], -1), train)
        y = ConvTransBlock3d(64, name="C3DT3")(y, train)
        y = ConvBlock23d(64, name="C3D3")(jnp.concatenate([y, f2], -1), train)
        y = ConvTransBlock3d(64, name="C3DT4")(y, train)
        y = ConvBlock23d(32, name="C3D4")(jnp.concatenate([y, f1], -1), train)
        y = ConvTransBlock3d(32, name="C3DT5")(y, train)
        y = ConvBlock23d(32, name="C3D5")(jnp.concatenate([y, x0], -1), train)

        y = PixelTransformerDecoder(128, name="Transformer_Decoder")(y, tokens)
        y = Conv(4, 1, use_bias=False, name="classifier_conv")(y)
        # sigmoid before the sub-pixel shuffle (elementwise, commutes with the
        # permutation): the post-shuffle tensor is (B, 2H, 2W, 1) whose 1-wide
        # feature axis wastes 127/128 VPU lanes — measured 10x on v5e
        return smow_shuffle(nn.sigmoid(y), 2)
