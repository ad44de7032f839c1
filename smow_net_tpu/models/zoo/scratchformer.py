"""ScratchFormer — siamese hierarchical transformer with grid (strided
window) attention, deformable-grid token shuffling, and a SegFormer-style
CEFF-fusion decoder. Parity target: reference compare/ScratchFormer.py:39-628
(embed dims [64,128,320,512], depths [3,3,9,3], dim_head [4,4,8,8],
window 4, layer-scale 1e-6, drop-path 0.1; recipe embed_dim=256).
Output: 2-channel logits at input resolution.

Reference quirks preserved exactly:
  * every patch embed uses a 7x7 kernel (ScratchFormer.py:50 passes
    patch_size=7 for ALL stages; strides 4,2,2,2, padding 3);
  * the attention is GRID attention: the einops pattern
    'b d (w1 x) (w2 y)' makes w1/w2 the OUTER factors, so each window
    holds 4x4 tokens strided H/4 apart (MaxViT-style grid, not local
    windows) with a relative-position bias over the 4x4 grid
    (ScratchFormer.py:518-521, 439-448);
  * DeformableGrid (ScratchFormer.py:603-628) computes offsets for the
    whole batch from batch element 0 ONLY, casts indices with
    truncation-toward-zero, clamps only the TOP end (>= H -> H-1) and
    lets negative indices wrap (torch advanced-indexing semantics);
  * the decoder's make_pred heads are computed and discarded (the model
    returns only the final prediction, ScratchFormer.py:58-63) — we call
    them so the parameters exist (exact param parity) and let XLA
    dead-code-eliminate the compute.

TPU notes: channels-last throughout; the grid rearrange is a free
reshape/transpose pair; the deformable gather is one shared-index row
gather (indices identical across batch and channels by the reference's
own quirk).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.layers import Conv, ConvTranspose, Dense, batch_norm, gelu
from ...ops.resize import resize_linear
from ...utils import torch_init

__all__ = ["ScratchFormer"]

_conv_init = torch_init.kaiming_normal_fan_out
_lin_init = torch_init.trunc_normal(0.02)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        import jax

        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


def _rel_pos_indices(w: int) -> np.ndarray:
    """Static (w*w, w*w) relative-position index table
    (reference ScratchFormer.py:441-446)."""
    pos = np.arange(w)
    grid = np.stack(np.meshgrid(pos, pos, indexing="ij")).reshape(2, -1).T
    rel = grid[:, None, :] - grid[None, :, :] + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


class GridAttention(nn.Module):
    """Grid attention over (B, H, W, C): 4x4 strided windows with relative
    position bias (reference Attention, ScratchFormer.py:417-484, wrapped in
    the grid Rearrange of ScratchFormer.py:518-521)."""

    dim: int
    dim_head: int
    window: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        h = self.dim // self.dim_head
        # 'b d (w1 x) (w2 y) -> b x y w1 w2 d': w1/w2 are the OUTER factors
        t = x.reshape(B, w, H // w, w, W // w, C)
        t = t.transpose(0, 2, 4, 1, 3, 5).reshape(-1, w * w, C)

        qkv = Dense(C * 3, use_bias=False, kernel_init=_lin_init,
                    name="to_qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = w * w
        split = lambda z: z.reshape(-1, n, h, self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = split(q) * self.dim_head ** -0.5, split(k), split(v)

        bias_table = self.param("rel_pos_bias",
                                nn.initializers.normal(1.0),
                                ((2 * w - 1) ** 2, h))
        idx = _rel_pos_indices(w)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, h)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) + bias.transpose(2, 0, 1)[None]
        attn = nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        # 'b h (w1 w2) d -> b w1 w2 (h d)' then the inverse grid rearrange
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, C)
        out = Dense(C, use_bias=False, kernel_init=_lin_init, name="to_out")(out)
        out = out.reshape(B, H // w, W // w, w, w, C)
        return out.transpose(0, 3, 1, 4, 2, 5).reshape(B, H, W, C)


class DeformableGrid(nn.Module):
    """Offset-driven spatial shuffle (reference DeformableGrid,
    ScratchFormer.py:589-628). Quirks preserved: offsets come from batch
    element 0 only, indices truncate toward zero, only the top end is
    clamped, negatives wrap (torch indexing)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        off = Conv(2, 3, 1, 1, name="offset_conv")(x)
        mo = max(H, W) / 4.0
        off = jnp.clip(off[0].astype(jnp.float32), -mo, mo)  # batch 0 only
        xg = jnp.arange(H, dtype=jnp.float32)[:, None] + off[..., 0]
        yg = jnp.arange(W, dtype=jnp.float32)[None, :] + off[..., 1]
        xg = xg.astype(jnp.int32)  # trunc toward zero, like torch .to(long)
        yg = yg.astype(jnp.int32)
        xg = jnp.where(xg >= H, H - 1, xg)
        xg = jnp.where(xg < 0, xg + H, xg)  # torch negative-index wrap
        yg = jnp.where(yg >= W, W - 1, yg)
        yg = jnp.where(yg < 0, yg + W, yg)
        flat = (xg * W + yg).reshape(-1)
        return jnp.take(x.reshape(B, H * W, C), flat, axis=1).reshape(x.shape)


class EncoderBlock(nn.Module):
    """pos-dwconv + grid attention + conv MLP with layer scale
    (reference EncoderBlock, ScratchFormer.py:501-549)."""

    dim: int
    dim_head: int
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        dp = DropPath(self.drop_path, name="drop_path")
        scale1 = self.param("layer_scale_1",
                            nn.initializers.constant(1e-6), (self.dim,))
        scale2 = self.param("layer_scale_2",
                            nn.initializers.constant(1e-6), (self.dim,))

        y = nn.LayerNorm(epsilon=1e-6, name="layer_norm0")(x)
        # depthwise 3x3, replicate padding, no bias (ScratchFormer.py:507)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = Conv(self.dim, 3, 1, 0, groups=self.dim, use_bias=False,
                 kernel_init=_conv_init, name="pos")(y)
        x = x + gelu(y)

        y = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        y = DeformableGrid(self.dim, name="deform_grid")(y)
        y = GridAttention(self.dim, self.dim_head, name="attn")(y)
        x = x + dp(scale1 * y, train)

        y = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        y = Conv(self.dim * 4, 1, use_bias=False, kernel_init=_conv_init,
                 name="mlp_fc1")(y)
        y = Conv(self.dim, 1, use_bias=False, kernel_init=_conv_init,
                 name="mlp_fc2")(gelu(y))
        return x + dp(scale2 * y, train)


class CEFF(nn.Module):
    """Channel-attention fusion of the two temporal branches
    (reference CEFF, ScratchFormer.py:552-587)."""

    dim: int
    reduction: int = 8

    @nn.compact
    def __call__(self, a, b):
        d = max(self.dim // self.reduction, 4)
        u = jnp.mean(a + b, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        z = nn.leaky_relu(
            Conv(d, 1, use_bias=False, name="conv_du")(u), 0.2)
        att = jnp.stack([Conv(self.dim, 1, use_bias=False, name=f"fc{i}")(z)
                         for i in range(2)], axis=1)   # (B, 2, 1, 1, C)
        att = nn.softmax(att, axis=1)
        return a * att[:, 0] + b * att[:, 1]


class ResidualBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.relu(Conv(c, 3, 1, 1, name="conv1")(x))
        return x + Conv(c, 3, 1, 1, name="conv2")(y) * 0.1


def _make_pred(prefix, out_c):
    def apply(x, train):
        y = nn.relu(Conv(out_c, 3, 1, 1, name=prefix + "_conv1")(x))
        y = batch_norm(prefix + "_bn")(y, use_running_average=not train)
        return Conv(out_c, 3, 1, 1, name=prefix + "_conv2")(y)

    return apply


class ScratchFormer(nn.Module):
    input_nc: int = 3
    output_nc: int = 2
    embed_dim: int = 256
    embed_dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 3, 9, 3)
    dim_heads: tuple = (4, 4, 8, 8)
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        embeds, blocks, norms = [], [], []
        for i, (c, d) in enumerate(zip(self.embed_dims, self.depths)):
            st = 4 if i == 0 else 2
            # k7 for EVERY stage (ScratchFormer.py:50 patch_size=7)
            embeds.append((Conv(c, 7, st, 3, kernel_init=_conv_init,
                                name=f"patch_embed{i + 1}_proj"),
                           nn.LayerNorm(epsilon=1e-6,
                                        name=f"patch_embed{i + 1}_norm")))
            # EncoderBlock keeps its default drop_path=0.1 for every block
            # (the reference computes a dpr ramp then never passes it,
            # ScratchFormer.py:212-216)
            blocks.append([
                EncoderBlock(c, self.dim_heads[i], self.drop_path_rate,
                             name=f"block{i + 1}_{j}")
                for j in range(d)
            ])
            norms.append(nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}"))

        def encode(x):
            outs = []
            for (proj, pnorm), blks, snorm in zip(embeds, blocks, norms):
                x = pnorm(proj(x))
                for blk in blks:
                    x = blk(x, train)
                x = snorm(x)
                outs.append(x)
            return outs

        f1 = encode(xa)
        f2 = encode(xb)

        e = self.embed_dim
        mlps = [Dense(e, kernel_init=_lin_init, name=f"linear_c{i + 1}")
                for i in range(4)]
        ceffs = [CEFF(e, name=f"ceff{k + 1}") for k in range(4)]
        size = f1[0].shape[1:3]
        up14 = lambda v: resize_linear(v, size, (1, 2), align_corners=False)

        cs = []
        for i, k in zip((3, 2, 1, 0), range(4)):  # stages 4,3,2,1
            c = ceffs[k](mlps[i](f1[i]), mlps[i](f2[i]))
            # intermediate heads: computed for exact param parity, discarded
            # like the reference's top-level forward (ScratchFormer.py:58-63);
            # XLA dead-code-eliminates them
            _make_pred(f"make_pred_c{i + 1}", self.output_nc)(c, train)
            cs.append(c if i == 0 else up14(c))
        c4, c3, c2, c1 = cs

        merged = Conv(e, 1, name="linear_fuse")(
            jnp.concatenate([c4, c3, c2, c1], -1))
        merged = batch_norm("linear_fuse_bn")(
            merged, use_running_average=not train)

        y = ConvTranspose(e, 4, 2, 1, name="convd2x")(merged)
        y = ResidualBlock(name="dense_2x")(y)
        y = ConvTranspose(e, 4, 2, 1, name="convd1x")(y)
        y = ResidualBlock(name="dense_1x")(y)
        return Conv(self.output_nc, 3, 1, 1, name="change_probability")(y)
