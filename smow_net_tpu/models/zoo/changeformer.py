"""ChangeFormerV6 — siamese SegFormer-style hierarchical transformer with
conv-diff decoder. Parity target: reference compare/ChangeFormerV6.py:12-618
(embed dims [64,128,320,512], depths [3,3,4,3], heads [1,2,4,8],
sr_ratios [8,4,2,1], drop/attn-drop/drop-path 0.1; recipe embed_dim=256).
Output: 2-channel logits at input resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, Dense, batch_norm, gelu
from ...ops.resize import resize_linear
from ...utils import torch_init

__all__ = ["ChangeFormerV6"]

_conv_init = torch_init.kaiming_normal_fan_out
_lin_init = torch_init.trunc_normal(0.02)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0:
            return x
        if not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        import jax

        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class SRAttention(nn.Module):
    """Spatial-reduction attention (compare/ChangeFormerV6.py:478-537)."""

    dim: int
    num_heads: int
    sr_ratio: int
    drop: float = 0.1
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, x, H, W, train: bool):
        B, N, C = x.shape
        hd = C // self.num_heads
        q = Dense(C, kernel_init=_lin_init, name="q")(x)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        if self.sr_ratio > 1:
            xs = x.reshape(B, H, W, C)
            xs = Conv(C, self.sr_ratio, self.sr_ratio, 0, kernel_init=_conv_init,
                      name="sr")(xs)
            xs = xs.reshape(B, -1, C)
            xs = nn.LayerNorm(epsilon=1e-6, name="norm")(xs)
        else:
            xs = x
        kv = Dense(C * 2, kernel_init=_lin_init, name="kv")(xs)
        m = xs.shape[1]
        kv = kv.reshape(B, m, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * hd ** -0.5
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train, name="attn_do")(attn)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B, N, C)
        y = Dense(C, kernel_init=_lin_init, name="proj")(y)
        return nn.Dropout(self.drop, deterministic=not train, name="proj_do")(y)


class MixMlp(nn.Module):
    dim: int
    hidden: int
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, H, W, train: bool):
        B, N, C = x.shape
        y = Dense(self.hidden, kernel_init=_lin_init, name="fc1")(x)
        y = y.reshape(B, H, W, self.hidden)
        y = Conv(self.hidden, 3, 1, 1, groups=self.hidden, kernel_init=_conv_init,
                 name="dwconv")(y)
        y = y.reshape(B, N, self.hidden)
        y = gelu(y)
        y = nn.Dropout(self.drop, deterministic=not train, name="do1")(y)
        y = Dense(self.dim, kernel_init=_lin_init, name="fc2")(y)
        return nn.Dropout(self.drop, deterministic=not train, name="do2")(y)


class Block(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    drop_path: float

    @nn.compact
    def __call__(self, x, H, W, train: bool):
        dp = DropPath(self.drop_path, name="drop_path")
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x), H, W, train)
        x = x + dp(y, train)
        y = MixMlp(self.dim, self.dim * 4, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x), H, W, train)
        return x + dp(y, train)


def _conv_diff(mdl_prefix, out_c):
    def apply(x, train):
        y = nn.relu(Conv(out_c, 3, 1, 1, name=mdl_prefix + "_conv1")(x))
        y = batch_norm(mdl_prefix + "_bn")(y, use_running_average=not train)
        return nn.relu(Conv(out_c, 3, 1, 1, name=mdl_prefix + "_conv2")(y))

    return apply


class ResidualBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.relu(Conv(c, 3, 1, 1, name="conv1")(x))
        return x + Conv(c, 3, 1, 1, name="conv2")(y) * 0.1


class ChangeFormerV6(nn.Module):
    input_nc: int = 3
    output_nc: int = 2
    embed_dim: int = 256
    embed_dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 3, 4, 3)
    num_heads: tuple = (1, 2, 4, 8)
    sr_ratios: tuple = (8, 4, 2, 1)
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        import numpy as np

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        embeds, blocks, norms = [], [], []
        cur = 0
        for i, (c, d) in enumerate(zip(self.embed_dims, self.depths)):
            # reference passes patch_size=7 to ALL stages (ChangeFormerV6.py:25-28)
            ps = 7
            st = 4 if i == 0 else 2
            embeds.append((Conv(c, ps, st, ps // 2, kernel_init=_conv_init,
                                name=f"patch_embed{i + 1}_proj"),
                           nn.LayerNorm(epsilon=1e-6, name=f"patch_embed{i + 1}_norm")))
            blocks.append([
                Block(c, self.num_heads[i], self.sr_ratios[i], float(dpr[cur + j]),
                      name=f"block{i + 1}_{j}")
                for j in range(d)
            ])
            norms.append(nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}"))
            cur += d

        def encode(x):
            outs = []
            for (proj, pnorm), blks, snorm in zip(embeds, blocks, norms):
                x = proj(x)
                B, H, W, C = x.shape
                t = pnorm(x.reshape(B, H * W, C))
                for blk in blks:
                    t = blk(t, H, W, train)
                t = snorm(t)
                x = t.reshape(B, H, W, C)
                outs.append(x)
            return outs

        f1 = encode(xa)
        f2 = encode(xb)

        e = self.embed_dim
        mlps = [Dense(e, kernel_init=_lin_init, name=f"linear_c{i + 1}") for i in range(4)]
        size = f1[0].shape[1:3]
        up2 = lambda v: resize_linear(v, (v.shape[1] * 2, v.shape[2] * 2), (1, 2), False)
        upc1 = lambda v: resize_linear(v, size, (1, 2), align_corners=False)

        cs = []
        prev = None
        for i in (3, 2, 1, 0):
            a = mlps[i](f1[i])
            b = mlps[i](f2[i])
            d = _conv_diff(f"diff_c{i + 1}", e)(jnp.concatenate([a, b], -1), train)
            if prev is not None:
                d = d + up2(prev)
            prev = d
            cs.append(d)
        c4, c3, c2, c1 = cs
        merged = jnp.concatenate([upc1(c4), upc1(c3), upc1(c2), c1], -1)
        merged = Conv(e, 1, name="linear_fuse")(merged)
        merged = batch_norm("linear_fuse_bn")(merged, use_running_average=not train)

        y = ConvTranspose(e, 4, 2, 1, name="convd2x")(merged)
        y = ResidualBlock(name="dense_2x")(y)
        y = ConvTranspose(e, 4, 2, 1, name="convd1x")(y)
        y = ResidualBlock(name="dense_1x")(y)
        return Conv(self.output_nc, 3, 1, 1, name="change_probability")(y)
