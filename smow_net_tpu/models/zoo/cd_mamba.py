"""CDMamba — MONAI-SegResNet-style encoder/decoder whose conv blocks are
ConvMamba (bidirectional 1-D selective scan + conv local-relation branch),
with adaptive local/global gated fusion of the two temporal branches.

Parity target: reference compare/cd_mamba.py:27-1595 (recipe train.py:121:
spatial_dims=2, init_filters=16, out_channels=2, mode="AGLGF",
conv_mode="orignal_dinner", up_mode="SRCM", up_conv_mode="deepwise",
norm GROUP(8), blocks_down=[1,2,2,4], blocks_up=[1,1,1], residual=False,
diff_abs="later", stage=2, mamba_act="relu"). The `mamba_ssm` /
`causal_conv1d` CUDA ops (cd_mamba.py:378-396) map to ops/scan.selective_scan
and ops/convops.causal_conv1d. MONAI layers (group norm, conv, nontrainable
upsample) are implemented locally.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import Conv, Dense
from ...ops.convops import causal_conv1d
from ...ops.pooling import max_pool
from ...ops.resize import resize_nearest
from ...ops.scan import selective_scan_auto
from ...utils import torch_init

__all__ = ["CDMamba"]


def _dt_bias_init(dt_min=0.001, dt_max=0.1, floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, floor)
        return dt + jnp.log(-jnp.expm1(-dt))

    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    n = shape[-1]
    return jnp.broadcast_to(jnp.log(jnp.arange(1, n + 1, dtype=dtype)), shape)


class Mamba1DCore(nn.Module):
    """One direction of mamba_inner (pre-gate): causal dwconv -> SiLU ->
    input-dependent (dt, B, C) -> selective scan."""

    d_inner: int
    d_state: int = 16
    dt_rank: int = 2
    d_conv: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        Di, N, R = self.d_inner, self.d_state, self.dt_rank
        kconv = self.param("conv1d_kernel", torch_init.kaiming_uniform_torch(self.d_conv),
                           (self.d_conv, 1, Di))
        bconv = self.param("conv1d_bias", torch_init.uniform_fan_in_bias(self.d_conv), (Di,))
        x = nn.silu(causal_conv1d(x, kconv, groups=Di) + bconv)
        xw = self.param("x_proj_kernel", torch_init.kaiming_uniform_torch(Di), (Di, R + 2 * N))
        dbl = jnp.matmul(x, xw)
        dt, Bm, Cm = jnp.split(dbl, [R, R + N], axis=-1)
        dtw = self.param(
            "dt_proj_kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -(R ** -0.5), R ** -0.5),
            (R, Di),
        )
        dt_bias = self.param("dt_proj_bias", _dt_bias_init(), (Di,))
        delta = jnp.matmul(dt, dtw)
        A = -jnp.exp(self.param("A_log", _a_log_init, (Di, N)).astype(jnp.float32))
        D = self.param("D", torch_init.ones, (Di,))
        return selective_scan_auto(x, delta, A, Bm[:, :, None], Cm[:, :, None], D, dt_bias,
                              delta_softplus=True)


class _LocalRelation(nn.Module):
    """conv_mode='orignal_dinner': conv3 -> SiLU -> conv3 (cd_mamba.py:453-463);
    conv_mode='deepwise': depthwise3x3+pointwise pairs (cd_mamba.py:404-470)."""

    d_inner: int
    conv_mode: str = "orignal_dinner"

    @nn.compact
    def __call__(self, x2d: jnp.ndarray) -> jnp.ndarray:
        if self.conv_mode == "deepwise":
            dm = x2d.shape[-1]
            y = Conv(dm, 3, 1, 1, groups=dm, name="dw1")(x2d)
            y = Conv(dm, 1, name="pw1")(y)
            y = nn.silu(y)
            y = Conv(y.shape[-1], 3, 1, 1, groups=y.shape[-1], name="dw2")(y)
            return Conv(self.d_inner, 1, name="pw2")(y)
        y = Conv(self.d_inner, 3, 1, 1, name="conv1")(x2d)
        y = nn.silu(y)
        return Conv(self.d_inner, 3, 1, 1, name="conv2")(y)


class ConvMamba(nn.Module):
    """Bidirectional mamba + additive conv local-relation branch
    (cd_mamba.py:410-640). Input (B, H, W, D) flattened internally."""

    d_model: int
    expand: int = 2
    d_state: int = 16
    conv_mode: str = "orignal_dinner"

    @nn.compact
    def __call__(self, x2d: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Dm = x2d.shape
        Di = self.expand * self.d_model
        R = math.ceil(self.d_model / 16)
        x = x2d.reshape(B, H * W, Dm)
        local = _LocalRelation(Di, self.conv_mode, name="local_relation")(x2d)
        local = local.reshape(B, H * W, Di)
        xz = Dense(Di * 2, use_bias=False, name="in_proj")(x)
        xx, z = jnp.split(xz, 2, axis=-1)
        fwd = Mamba1DCore(Di, self.d_state, R, name="fwd")(xx)
        bwd = jnp.flip(Mamba1DCore(Di, self.d_state, R, name="bwd")(jnp.flip(xx, 1)), 1)
        y = (fwd + bwd) * nn.silu(z) + local
        return Dense(self.d_model, use_bias=False, name="out_proj")(y).reshape(B, H, W, Dm)


class GatedFusionMamba(nn.Module):
    """Shared body of L_GF_Mamba / G_GL_Mamba (cd_mamba.py:773-1148): the
    bidirectional scan of x gated by a 'query' derived from the other image
    (conv local relation for L, a third mamba for G)."""

    d_model: int
    mode: str  # 'local' | 'global'
    act: Callable = nn.relu
    expand: int = 2
    d_state: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, other: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, L, Dm = x.shape
        Di = self.expand * self.d_model
        R = math.ceil(self.d_model / 16)
        xz = Dense(Di * 2, use_bias=False, name="in_proj")(x)
        xx, z = jnp.split(xz, 2, axis=-1)
        fwd = Mamba1DCore(Di, self.d_state, R, name="fwd")(xx)
        bwd = jnp.flip(Mamba1DCore(Di, self.d_state, R, name="bwd")(jnp.flip(xx, 1)), 1)
        y = (fwd + bwd) * nn.silu(z)
        if self.mode == "local":
            q = _LocalRelation(Di, name="local_relation")(other.reshape(B, H, W, Dm))
            q = q.reshape(B, L, Di)
        else:
            o_xz = Dense(Di * 2, use_bias=False, name="in_proj_global")(other)
            ox, oz = jnp.split(o_xz, 2, axis=-1)
            q = Mamba1DCore(Di, self.d_state, R, name="g")(ox) * nn.silu(oz)
        y = y * self.act(q)
        return Dense(self.d_model, use_bias=False, name="out_proj")(y)


class GF(nn.Module):
    """L_GF / G_GF wrapper: LN both inputs, cross-query both ways
    (cd_mamba.py:121-170). residual=False in the recipe."""

    dim: int
    mode: str
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        B, H, W, C = x1.shape
        f = GatedFusionMamba(self.dim, self.mode, self.act, name="fusionencoder")
        n1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        a = n1(x1.reshape(B, H * W, C))
        b = n2(x2.reshape(B, H * W, C))
        q1 = f(a, b, H, W).reshape(B, H, W, C)
        q2 = f(b, a, H, W).reshape(B, H, W, C)
        return q1, q2


class SRCMLayer(nn.Module):
    """LN -> ConvMamba (+skip_scale*x) -> same LN -> Linear proj
    (cd_mamba.py:27-57; note the reference reuses ONE norm module twice)."""

    out_dim: int
    conv_mode: str = "orignal_dinner"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        skip = self.param("skip_scale", torch_init.ones, (1,))
        flat = x.reshape(B, H * W, C)
        y = ConvMamba(C, conv_mode=self.conv_mode, name="convmamba")(
            norm(flat).reshape(B, H, W, C))
        y = y.reshape(B, H * W, C) + skip * flat
        y = norm(y)
        y = Dense(self.out_dim, name="proj")(y)
        return y.reshape(B, H, W, self.out_dim)


class SRCMBlock(nn.Module):
    """GN8 -> ReLU -> SRCM -> GN8 -> ReLU -> SRCM -> +identity
    (cd_mamba.py:70-118)."""

    channels: int
    conv_mode: str = "orignal_dinner"

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm1")(x)
        y = nn.relu(y)
        y = SRCMLayer(self.channels, conv_mode=self.conv_mode, name="conv1")(y)
        y = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm2")(y)
        y = nn.relu(y)
        y = SRCMLayer(self.channels, conv_mode=self.conv_mode, name="conv2")(y)
        return y + identity


class CDMamba(nn.Module):
    init_filters: int = 16
    in_channels: int = 3
    out_channels: int = 2
    blocks_down: tuple = (1, 2, 2, 4)
    blocks_up: tuple = (1, 1, 1)
    stage: int = 2

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        f = self.init_filters
        chans = [f, f * 2, f * 4, f * 8]

        conv_init = Conv(f, 3, 1, 1, use_bias=False, name="convInit")
        enc_layers = []
        for i, nblocks in enumerate(self.blocks_down):
            stage_mods = {}
            if i > 0:
                stage_mods["down"] = SRCMLayer(chans[i], name=f"enc{i}_down")
            stage_mods["blocks"] = [
                SRCMBlock(chans[i], name=f"enc{i}_block{j}") for j in range(nblocks)
            ]
            enc_layers.append(stage_mods)

        def encode(v):
            v = conv_init(v)
            feats = []
            for i, mods in enumerate(enc_layers):
                if "down" in mods:
                    v = mods["down"](v)
                    v = max_pool(v, 2, 2)
                for blk in mods["blocks"]:
                    v = blk(v, train)
                feats.append(v)
            return feats

        d1 = encode(x1)
        d2 = encode(x2)

        diffs = []
        for i, (a, b) in enumerate(zip(d1, d2)):
            if i < self.stage:
                al, bl = GF(chans[i], "local", name=f"l_gf{i + 1}")(a, b, train)
                ag, bg = GF(chans[i], "global", name=f"g_gf{i + 1}")(a, b, train)
                gate_w = self.param(f"ag{i + 1}_kernel", torch_init.kaiming_uniform_torch(2 * chans[i]),
                                    (2 * chans[i], 2))

                def gate(l, g):
                    pooled = jnp.concatenate(
                        [jnp.mean(l, axis=(1, 2)), jnp.mean(g, axis=(1, 2))], -1)
                    s = nn.softmax(jnp.matmul(pooled, gate_w), axis=-1)
                    return s[:, 0:1, None, None] * l + s[:, 1:2, None, None] * g

                a = gate(al, ag)
                b = gate(bl, bg)
            diffs.append(jnp.abs(a - b))

        diffs = diffs[::-1]
        x = diffs[0]
        for i in range(len(self.blocks_up)):
            c_out = chans[len(chans) - 2 - i]
            # MONAI get_conv_layer default is bias=False (cd_mamba.py:316-321)
            x = Conv(c_out, 1, use_bias=False, name=f"up{i}_conv")(x)
            x = resize_nearest(x, (x.shape[1] * 2, x.shape[2] * 2), (1, 2))
            x = x + diffs[i + 1]
            for j in range(self.blocks_up[i]):
                # decoder blocks use up_conv_mode="deepwise" (recipe)
                x = SRCMBlock(c_out, conv_mode="deepwise", name=f"dec{i}_block{j}")(x, train)

        y = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="final_norm")(x)
        y = nn.relu(y)
        return Conv(self.out_channels, 1, name="conv_final")(y)
