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

__all__ = ["CDMamba", "mamba_cache_init", "mamba_core_step"]


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


def _declare_mamba_params(mod: nn.Module, Di: int, N: int, R: int, d_conv: int):
    """The 7 mamba_inner parameter leaves, declared on `mod`'s scope (shared
    by the single-direction core and the params-only module so the fused
    bidirectional path keeps the exact fwd/bwd param tree)."""
    return dict(
        kconv=mod.param("conv1d_kernel",
                        torch_init.kaiming_uniform_torch(d_conv),
                        (d_conv, 1, Di)),
        bconv=mod.param("conv1d_bias",
                        torch_init.uniform_fan_in_bias(d_conv), (Di,)),
        xw=mod.param("x_proj_kernel", torch_init.kaiming_uniform_torch(Di),
                     (Di, R + 2 * N)),
        dtw=mod.param(
            "dt_proj_kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                            -(R ** -0.5), R ** -0.5),
            (R, Di)),
        dt_bias=mod.param("dt_proj_bias", _dt_bias_init(), (Di,)),
        A_log=mod.param("A_log", _a_log_init, (Di, N)),
        D=mod.param("D", torch_init.ones, (Di,)),
    )


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
        p = _declare_mamba_params(self, Di, N, R, self.d_conv)
        x = nn.silu(causal_conv1d(x, p["kconv"], groups=Di) + p["bconv"])
        dbl = jnp.matmul(x, p["xw"])
        dt, Bm, Cm = jnp.split(dbl, [R, R + N], axis=-1)
        delta = jnp.matmul(dt, p["dtw"])
        A = -jnp.exp(p["A_log"].astype(jnp.float32))
        return selective_scan_auto(x, delta, A, Bm[:, :, None], Cm[:, :, None],
                                   p["D"], p["dt_bias"], delta_softplus=True)


def mamba_cache_init(batch: int, d_inner: int, d_state: int = 16,
                     d_conv: int = 4, dtype=jnp.float32):
    """Decode-time state cache for one scan direction (reference
    Mamba.allocate_inference_cache, compare/cd_mamba.py:733-745):
    conv_state (B, d_conv, Di) rolling window of post-in_proj inputs,
    ssm_state (B, Di, N) fp32 recurrence carry."""
    return (jnp.zeros((batch, d_conv, d_inner), dtype),
            jnp.zeros((batch, d_inner, d_state), jnp.float32))


def mamba_core_step(p: dict, x_t: jnp.ndarray, conv_state: jnp.ndarray,
                    ssm_state: jnp.ndarray):
    """One-token streaming step of `Mamba1DCore` (reference Mamba.step,
    compare/cd_mamba.py:686-730, the decode-time state-cache path):

        roll conv_state; depthwise causal-conv tap; SiLU
        -> (dt, B, C) projections -> one selective-scan step (scan-carry).

    `p` is the `Mamba1DParams` dict; `x_t` is (B, Di) — one timestep of the
    post-in_proj sequence. Returns (y_t, conv_state', ssm_state'). Feeding a
    length-L sequence through this token-by-token reproduces
    `Mamba1DCore.__call__`'s output exactly (tests/test_scan_routing.py).
    TPU note: per-token decode is latency-bound glue; whole sequences go
    through the scan kernels — this exists for parity with the reference's
    streaming-decode capability (a lax.scan over it is the jittable form)."""
    from ...ops.scan import selective_scan_step

    kconv = p["kconv"][:, 0, :]                        # (d_conv, Di)
    conv_state = jnp.concatenate([conv_state[:, 1:], x_t[:, None]], axis=1)
    x = jnp.einsum("bkd,kd->bd", conv_state.astype(jnp.float32),
                   kconv.astype(jnp.float32)).astype(x_t.dtype) + p["bconv"]
    x = nn.silu(x)
    R = p["dtw"].shape[0]
    N = p["A_log"].shape[-1]
    dbl = jnp.matmul(x, p["xw"])
    dt, Bm, Cm = jnp.split(dbl, [R, R + N], axis=-1)
    delta = jnp.matmul(dt, p["dtw"])
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    y, ssm_state = selective_scan_step(
        ssm_state, x, delta, A, Bm[:, None], Cm[:, None],
        p["D"], p["dt_bias"], delta_softplus=True)
    return y, conv_state, ssm_state


class Mamba1DParams(nn.Module):
    """Params-only twin of Mamba1DCore (same scope layout), consumed by the
    fused bidirectional path below."""

    d_inner: int
    d_state: int = 16
    dt_rank: int = 2
    d_conv: int = 4

    @nn.compact
    def __call__(self):
        return _declare_mamba_params(self, self.d_inner, self.d_state,
                                     self.dt_rank, self.d_conv)


def mamba_bidir(x: jnp.ndarray, pf: dict, pb: dict) -> jnp.ndarray:
    """fwd(x) + flip(bwd(flip(x))) as ONE selective scan: the two directions
    are folded into the FEATURE axis (depthwise conv concat, per-direction
    einsum projections) and the scan runs with groups=2 so each direction
    keeps its own (B, C) gates. Exact rewrite of two Mamba1DCore calls —
    quadruples the scan kernel's (batch, group) row count, which is the
    Pallas kernel's parallelism unit (CD-Mamba's L=H*W sequences at tiny
    d_inner gave it almost no rows to tile)."""
    B, L, Di = x.shape
    N = pf["A_log"].shape[-1]
    R = pf["dtw"].shape[0]
    x2 = jnp.concatenate([x, jnp.flip(x, 1)], axis=-1)            # (B, L, 2Di)
    kconv = jnp.concatenate([pf["kconv"], pb["kconv"]], axis=-1)
    bconv = jnp.concatenate([pf["bconv"], pb["bconv"]], axis=-1)
    x2 = nn.silu(causal_conv1d(x2, kconv, groups=2 * Di) + bconv)
    xw = jnp.stack([pf["xw"], pb["xw"]])                          # (2, Di, R+2N)
    xd = x2.reshape(B, L, 2, Di)
    dbl = jnp.einsum("blde,def->bldf", xd, xw)
    dt, Bm, Cm = jnp.split(dbl, [R, R + N], axis=-1)              # (B, L, 2, ·)
    dtw = jnp.stack([pf["dtw"], pb["dtw"]])                       # (2, R, Di)
    delta = jnp.einsum("bldr,dre->blde", dt, dtw).reshape(B, L, 2 * Di)
    A = -jnp.exp(jnp.concatenate([pf["A_log"], pb["A_log"]], 0).astype(jnp.float32))
    D = jnp.concatenate([pf["D"], pb["D"]], 0)
    dt_bias = jnp.concatenate([pf["dt_bias"], pb["dt_bias"]], 0)
    y = selective_scan_auto(x2, delta, A, Bm, Cm, D, dt_bias,
                            delta_softplus=True)
    return y[..., :Di] + jnp.flip(y[..., Di:], 1)


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
        pf = Mamba1DParams(Di, self.d_state, R, name="fwd")()
        pb = Mamba1DParams(Di, self.d_state, R, name="bwd")()
        y = mamba_bidir(xx, pf, pb) * nn.silu(z) + local
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
        pf = Mamba1DParams(Di, self.d_state, R, name="fwd")()
        pb = Mamba1DParams(Di, self.d_state, R, name="bwd")()
        y = mamba_bidir(xx, pf, pb) * nn.silu(z)
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
        # both cross-query directions share f's params and every op inside
        # is batch-independent -> ONE 2B-batched call (exact, halves the
        # scan-call count)
        q = f(jnp.concatenate([a, b], 0), jnp.concatenate([b, a], 0), H, W)
        return (q[:B].reshape(B, H, W, C), q[B:].reshape(B, H, W, C))


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

        # siamese encode as ONE 2B-batched pass: all encoder norms are
        # Layer/GroupNorm (no batch coupling), so this is exact — and it
        # doubles the scan kernels' (batch, group) row tiling
        Bn = x1.shape[0]
        d12 = encode(jnp.concatenate([x1, x2], axis=0))
        d1 = [t[:Bn] for t in d12]
        d2 = [t[Bn:] for t in d12]

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
