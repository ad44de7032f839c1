"""2D selective-scan state-space layers (VMamba core), TPU-native.

Replaces the reference's CUDA/Triton stack — SS2D + cross_selective_scan +
SelectiveScan{Mamba,Core,Oflex} + CrossScan/Merge (compare/vmamba.py:324-435,
552-1179; compare/csm_triton.py) — with one associative-scan primitive
(ops/scan.py) and pure-XLA layout transforms (ops/cross_scan.py).

Everything is channels-last (B, H, W, C). Parameter shapes and inits mirror
the reference so torch checkpoints can be mapped:
  x_proj_weight (K, R+2N, Di), dt_projs_weight (K, Di, R),
  dt_projs_bias (K, Di) [softplus-inverse of logspace-uniform dt],
  A_logs (K*Di, N) = log(1..N), Ds = ones(K*Di).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cross_scan import (cross_merge, cross_merge8, cross_merge_1d,
                              cross_merge_2d, cross_scan, cross_scan8,
                              cross_scan_1b1, cross_scan_1d, cross_scan_2d)
from ..ops.scan import cross_selective_scan
from ..utils import torch_init
from .layers import Conv, Dense, gelu

__all__ = ["SS2D", "VSSBlock", "VSSM", "DropPath"]


def _dt_bias_init(dt_min=0.001, dt_max=0.1, floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, floor)
        return dt + jnp.log(-jnp.expm1(-dt))  # inverse softplus

    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    n = shape[-1]
    row = jnp.log(jnp.arange(1, n + 1, dtype=dtype))
    return jnp.broadcast_to(row, shape)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return x * mask / keep


class SS2D(nn.Module):
    """4-/8-direction 2D selective scan block (reference SS2D forwardv2).

    Reference forward-type coverage (compare/vmamba.py:748-762): v01/v1/v2/
    v3/v4 differ only in WHICH CUDA/Triton backend runs the same math
    (SelectiveScanMamba/Core/Oflex, einsum-vs-conv1d projection, Triton
    cross-scan) and whether fp32 is forced — all collapse onto this module's
    single TPU scan primitive, which always carries the recurrence in fp32
    (ops/pallas/scan_fused.py). The genuine *math* ablations v31d/v32d
    (1-/2-direction CrossScan, compare/vmamba.py:73-137) are selected here
    with `scan_variant="1d"|"2d"` (k_group=4 only).

    The `xv` forward family (reference `__initxv__`/`forwardxv`,
    compare/vmamba.py:824-1067,1181-1304) is selected with
    `forward_type="xv1a"|"xv2a"|"xv3a"` plus the reference's postfixes
    (`act` = GELU out-act, `mul` = multiply by the pre-scan u, out-norm
    postfixes `none`/`dwconv3`/`softmax`/`sigmoid`, `no32` = ignored — the
    TPU kernel always carries the recurrence in fp32): a z-gate-free
    variant where ONE input projection emits u, dt (rank / full-channel /
    per-direction) and per-direction B,C routed through the one-by-one
    cross-scan (CrossScanTriton1b1). Only the live `*a` modes are
    implemented — the reference's xv1/xv2/xv3/xv5/xv6/xv61/xv7 inits sit
    in an `if False:` block (vmamba.py:902-942) and cannot be constructed.
    The non-LayerNorm out-norm postfixes follow the channel-first
    semantics (spatial softmax / depthwise conv over the (H, W) map) —
    the reference's channel-last composition of those norms applies them
    to permuted axes and is shape-inconsistent (vmamba.py:1292-1297), a
    latent bug we do not reproduce."""

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    k_group: int = 4
    dropout: float = 0.0
    scan_variant: str = "cross"  # cross | 1d | 2d (v2 / v31d / v32d)
    forward_type: str = "v2"  # v2-family (default) | xv{1,2,3}a[+postfixes]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.forward_type.startswith("xv"):
            return self._forward_xv(x, train)
        B, H, W, _ = x.shape
        Di = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank
        N = self.d_state
        K = self.k_group

        xz = Dense(Di * 2, use_bias=self.bias, kernel_init=torch_init.trunc_normal(0.02),
                   name="in_proj")(x)
        xx, z = jnp.split(xz, 2, axis=-1)
        z = nn.silu(z)
        if self.d_conv > 1:
            xx = Conv(Di, self.d_conv, 1, (self.d_conv - 1) // 2, groups=Di,
                      use_bias=self.conv_bias, name="conv2d")(xx)
        xx = nn.silu(xx)

        # ---- cross selective scan ----
        if K == 8:
            scan, merge = cross_scan8, cross_merge8
        else:
            assert self.scan_variant in ("cross", "1d", "2d"), self.scan_variant
            scan, merge = {
                "cross": (cross_scan, cross_merge),
                "1d": (cross_scan_1d, cross_merge_1d),
                "2d": (cross_scan_2d, cross_merge_2d),
            }[self.scan_variant]
        xs = scan(xx)                                       # (B, K, L, Di)

        x_proj_w = self.param(
            "x_proj_weight", torch_init.kaiming_uniform_torch(Di), (K, R + 2 * N, Di)
        )
        dt_w = self.param(
            "dt_projs_weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -(R ** -0.5), R ** -0.5),
            (K, Di, R),
        )
        dt_b = self.param("dt_projs_bias", _dt_bias_init(), (K, Di))
        A_logs = self.param("A_logs", _a_log_init, (K * Di, N))
        Ds = self.param("Ds", torch_init.ones, (K * Di,))

        x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w)
        dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
        dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w)

        L = H * W
        A = -jnp.exp(A_logs.astype(jnp.float32))
        # direction-major call: the fused kernel consumes (B, K, L, Di)
        # directly (contiguous reshapes only — no layout transposes)
        ys = cross_selective_scan(xs, dts, A, Bs, Cs, Ds, dt_b.reshape(-1),
                                  delta_softplus=True)      # (B, K, L, Di)
        y = merge(ys, H, W)                                 # (B, L, Di)
        y = nn.LayerNorm(epsilon=1e-5, name="out_norm")(y).reshape(B, H, W, Di)

        y = y * z
        y = Dense(self.d_model, use_bias=self.bias, kernel_init=torch_init.trunc_normal(0.02),
                  name="out_proj")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train, name="do")(y)
        return y

    def _forward_xv(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """forwardxv (reference compare/vmamba.py:1181-1304): dwconv+SiLU on
        the raw d_model input, one fused in-projection, per-direction B/C via
        the 1b1 cross-scan, no z gate. Postfix parsing mirrors __initxv__
        (vmamba.py:869-960): no32, then out-norm tag, then mul, then act."""
        B, H, W, _ = x.shape
        Di = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank
        N = self.d_state
        K = 4  # k_group is fixed at 4 in __initxv__ (vmamba.py:899)

        ft = self.forward_type
        if ft.endswith("no32"):
            ft = ft[: -len("no32")]  # fp32 is unconditional in the TPU kernel
        out_norm_kind = "ln"
        for tag in ("none", "dwconv3", "softmax", "sigmoid"):
            if ft.endswith(tag):
                out_norm_kind, ft = tag, ft[: -len(tag)]
                break
        omul = ft.endswith("mul")
        ft = ft[:-3] if omul else ft
        oact = ft.endswith("act")
        ft = ft[:-3] if oact else ft
        assert ft in ("xv1a", "xv2a", "xv3a"), (
            f"unsupported xv mode {self.forward_type!r}: only the live *a "
            "modes exist (reference vmamba.py:944-960; xv1/xv2/... are dead "
            "if-False code)")
        mode = ft

        if self.d_conv > 1:
            x = Conv(self.d_model, self.d_conv, 1, (self.d_conv - 1) // 2,
                     groups=self.d_model, use_bias=self.conv_bias,
                     name="conv2d")(x)
            x = nn.silu(x)

        dt_width = {"xv1a": R, "xv2a": Di, "xv3a": 4 * R}[mode]
        widths = [Di, dt_width, 4 * N, 4 * N]
        xin = Dense(sum(widths), use_bias=self.bias,
                    kernel_init=torch_init.trunc_normal(0.02), name="in_proj")(x)
        splits = [widths[0], widths[0] + widths[1], widths[0] + widths[1] + widths[2]]
        us_raw, dts_raw, Bs_raw, Cs_raw = jnp.split(xin, splits, axis=-1)

        us = cross_scan(us_raw)                    # (B, 4, L, Di)
        Bs = cross_scan_1b1(Bs_raw)                # (B, 4, L, N)
        Cs = cross_scan_1b1(Cs_raw)
        if mode == "xv2a":
            dts = cross_scan(dts_raw)              # (B, 4, L, Di); no dt proj
        else:
            dt_w = self.param(
                "dt_projs_weight",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -(R ** -0.5), R ** -0.5),
                (K, Di, R),
            )
            dts = (cross_scan if mode == "xv1a" else cross_scan_1b1)(dts_raw)
            dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w)

        dt_b = self.param("dt_projs_bias", _dt_bias_init(), (K, Di))
        A_logs = self.param("A_logs", _a_log_init, (K * Di, N))
        Ds = self.param("Ds", torch_init.ones, (K * Di,))

        A = -jnp.exp(A_logs.astype(jnp.float32))
        ys = cross_selective_scan(us, dts, A, Bs, Cs, Ds, dt_b.reshape(-1),
                                  delta_softplus=True)   # (B, 4, L, Di)
        y = cross_merge(ys, H, W)                        # (B, L, Di)

        if out_norm_kind == "ln":
            y = nn.LayerNorm(epsilon=1e-5, name="out_norm")(y)
            y = y.reshape(B, H, W, Di)
        elif out_norm_kind == "none":
            y = y.reshape(B, H, W, Di)
        elif out_norm_kind == "sigmoid":
            y = jax.nn.sigmoid(y).reshape(B, H, W, Di)
        elif out_norm_kind == "softmax":
            # SoftmaxSpatial (vmamba.py:883-889): softmax over L per channel
            y = jax.nn.softmax(y, axis=1).reshape(B, H, W, Di)
        else:  # dwconv3
            y = y.reshape(B, H, W, Di)
            y = Conv(Di, 3, 1, 1, groups=Di, use_bias=False, name="out_norm")(y)

        if oact:
            y = gelu(y)
        if omul:
            y = y * us_raw  # _us: the pre-scan u channels (vmamba.py:1302)
        y = Dense(self.d_model, use_bias=self.bias,
                  kernel_init=torch_init.trunc_normal(0.02), name="out_proj")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train, name="do")(y)
        return y


class Mlp(nn.Module):
    hidden: int
    out: int
    act: Callable = gelu
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        y = Dense(self.hidden, kernel_init=torch_init.trunc_normal(0.02), name="fc1")(x)
        y = self.act(y)
        y = nn.Dropout(self.drop, deterministic=not train, name="do1")(y)
        y = Dense(self.out, kernel_init=torch_init.trunc_normal(0.02), name="fc2")(y)
        return nn.Dropout(self.drop, deterministic=not train, name="do2")(y)


class VSSBlock(nn.Module):
    """LN -> SS2D -> droppath residual (+ optional LN -> MLP residual)
    (reference compare/vmamba.py:1307-1392)."""

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    mlp_ratio: float = 4.0
    mlp_drop_rate: float = 0.0
    k_group: int = 4
    scan_variant: str = "cross"  # SS2D ablation select (v2/v31d/v32d)
    remat: bool = False  # reference use_checkpoint (vmamba.py:1388-1392):
    #                      rematerialize the SS2D in backward (trades FLOPs
    #                      for the large (B,L,D,N) scan temporaries)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dp = DropPath(self.drop_path, name="drop_path")
        ss2d = nn.remat(SS2D, static_argnums=(2,)) if self.remat else SS2D
        if self.ssm_ratio > 0:
            y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
            y = ss2d(
                self.hidden_dim, self.ssm_d_state, self.ssm_ratio, self.ssm_dt_rank,
                self.ssm_conv, self.ssm_conv_bias, dropout=self.ssm_drop_rate,
                k_group=self.k_group, scan_variant=self.scan_variant, name="op",
            )(y, train)
            x = x + dp(y, train)
        if self.mlp_ratio > 0:
            y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            y = Mlp(int(self.hidden_dim * self.mlp_ratio), self.hidden_dim,
                    drop=self.mlp_drop_rate, name="mlp")(y, train)
            x = x + dp(y, train)
        return x


class VSSM(nn.Module):
    """VSSM backbone returning per-stage (pre-downsample) normed features
    (reference VSSM compare/vmamba.py:1395-1704 + Backbone_VSSM,
    compare/Mamba_backbone.py:7-61). Channels-last taps."""

    depths: tuple = (2, 2, 9, 2)
    dims: tuple = (96, 192, 384, 768)
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    mlp_ratio: float = 4.0
    mlp_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patchembed_version: str = "v2"
    downsample_version: str = "v2"
    k_group: int = 4
    out_indices: tuple = (0, 1, 2, 3)
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        import numpy as np

        dims = list(self.dims)
        d0 = dims[0]
        # patch embed
        if self.patchembed_version == "v1":
            x = Conv(d0, 4, 4, 0, name="patch_embed_conv")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)
        else:  # v2: two stride-2 convs with norm + GELU between
            x = Conv(d0 // 2, 3, 2, 1, name="patch_embed_conv1")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm1")(x)
            x = gelu(x)
            x = Conv(d0, 3, 2, 1, name="patch_embed_conv2")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm2")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        cur = 0
        for i, (dim, depth) in enumerate(zip(dims, self.depths)):
            for j in range(depth):
                x = VSSBlock(
                    dim, float(dpr[cur + j]), self.ssm_d_state, self.ssm_ratio,
                    self.ssm_dt_rank, self.ssm_conv, self.ssm_conv_bias,
                    self.ssm_drop_rate, self.mlp_ratio, self.mlp_drop_rate,
                    k_group=self.k_group, remat=self.use_checkpoint,
                    name=f"layer{i}_block{j}",
                )(x, train)
            cur += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"outnorm{i}")(x))
            if i < len(dims) - 1:
                k = 2 if self.downsample_version == "v2" else 3
                p = 0 if self.downsample_version == "v2" else 1
                x = Conv(dims[i + 1], k, 2, p, name=f"downsample{i}_conv")(x)
                x = nn.LayerNorm(epsilon=1e-5, name=f"downsample{i}_norm")(x)
        return outs
