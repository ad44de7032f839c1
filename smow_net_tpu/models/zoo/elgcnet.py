"""ELGCNet — efficient local-global context aggregation.

Parity target: reference compare/ELGCNet.py:141-475 (recipe train.py:108-109:
dec_embed_dim=256; enc_channels [64,96,128,256], depths [3,3,4,3]).
ELGCA splits channels: half depthwise-conv local path; half projected to
heads*(C/4) maps -> pooled q (avg/2) and k (max/2), channel-to-channel
C/4 x C/4 attention (softmax over rows), plus a local feature map.
Output: 2-channel logits at input resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, batch_norm, gelu
from ...ops.pooling import avg_pool, max_pool
from ...ops.resize import resize_linear
from ...utils import torch_init

__all__ = ["ELGCNet"]

_fan_out_init = torch_init.kaiming_normal_fan_out  # matches ELGCNet.py:88-96


def _ln_channels(x, name, mdl):
    """ConvNeXt channels-first LayerNorm == LN over the channel axis only
    (ELGCNet.py:233-256); channels-last: plain LN over the last axis."""
    return nn.LayerNorm(epsilon=1e-6, name=name)(x)


class ELGCA(nn.Module):
    """compare/ELGCNet.py:141-186."""

    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        half, quarter = C // 2, C // 4
        x1, x2 = x[..., :half], x[..., half:]
        x1 = gelu(Conv(half, 3, 1, 1, groups=half, kernel_init=_fan_out_init,
                       name="dwconv")(x1))
        x2 = gelu(Conv(quarter * self.heads, 1, kernel_init=_fan_out_init, name="qkvl")(x2))
        # (B,H,W,heads*quarter) -> (B,heads,quarter,H,W) mirroring torch reshape
        x2 = x2.reshape(B, H, W, self.heads, quarter).transpose(0, 3, 4, 1, 2)
        q = jnp.sum(x2[:, :-3], axis=1)     # (B, quarter, H, W)
        k = x2[:, -3]
        v = x2[:, -2].reshape(B, quarter, H * W)
        lfeat = x2[:, -1]
        # pool on (B, quarter, H, W): move to channels-last for our pool ops
        q = avg_pool(q.transpose(0, 2, 3, 1), 3, 2, 1).transpose(0, 3, 1, 2)
        k = max_pool(k.transpose(0, 2, 3, 1), 2, 2, 0).transpose(0, 3, 1, 2)
        qf = q.reshape(B, quarter, -1)
        kf = k.reshape(B, quarter, -1)
        qk = jnp.einsum("bcn,bdn->bcd", qf, kf)        # (B, quarter, quarter)
        qk = nn.softmax(qk, axis=1).transpose(0, 2, 1)
        out = jnp.einsum("bcd,bdn->bcn", qk, v).reshape(B, quarter, H, W)
        y = jnp.concatenate(
            [x1, lfeat.transpose(0, 2, 3, 1), out.transpose(0, 2, 3, 1)], axis=-1
        )
        return y


class EncoderBlock(nn.Module):
    dim: int
    mlp_ratio: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        y = _ln_channels(x, "layer_norm1", self)
        x = x + ELGCA(self.dim, self.heads, name="attn")(y)
        y = _ln_channels(x, "layer_norm2", self)
        h = self.dim * self.mlp_ratio
        y = gelu(Conv(h, 1, kernel_init=_fan_out_init, name="mlp_fc1")(y))
        y = y + gelu(Conv(h, 3, 1, 1, groups=h, kernel_init=_fan_out_init, name="mlp_pos")(y))
        y = Conv(self.dim, 1, kernel_init=_fan_out_init, name="mlp_fc2")(y)
        return x + y


class ResidualBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.relu(Conv(c, 3, 1, 1, name="conv1")(x))
        y = Conv(c, 3, 1, 1, name="conv2")(y) * 0.1
        return x + y


class ELGCNet(nn.Module):
    input_nc: int = 3
    output_nc: int = 2
    depths: tuple = (3, 3, 4, 3)
    heads: tuple = (4, 4, 4, 4)
    enc_channels: tuple = (64, 96, 128, 256)
    dec_embed_dim: int = 256

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        embeds = []
        blocks = []
        for i, (c, d) in enumerate(zip(self.enc_channels, self.depths)):
            # reference passes patch_size=7 to ALL stages (ELGCNet.py:452-460)
            ps = 7
            stride = 4 if i == 0 else 2
            embeds.append(Conv(c, ps, stride, ps // 2, kernel_init=_fan_out_init,
                               name=f"patch_embed{i + 1}"))
            blocks.append([EncoderBlock(c, 4, self.heads[i], name=f"block{i + 1}_{j}")
                           for j in range(d)])

        def encode(x):
            outs = []
            for embed, blks in zip(embeds, blocks):
                x = embed(x)
                for blk in blks:
                    x = blk(x)
                outs.append(x)
            return outs

        f1 = encode(xa)
        f2 = encode(xb)

        e = self.dec_embed_dim
        projs = [Conv(e, 1, name=f"linear_c{i + 1}") for i in range(4)]
        fuses = [Conv(e, 1, name=f"diff_c{i + 1}") for i in range(4)]
        size = f1[0].shape[1:3]
        diffs = []
        for i in range(4):
            a, b = projs[i](f1[i]), projs[i](f2[i])
            d = gelu(fuses[i](jnp.concatenate([a, b], -1)))
            if i > 0:
                d = resize_linear(d, size, (1, 2), align_corners=False)
            diffs.append(d)
        merged = jnp.concatenate([diffs[3], diffs[2], diffs[1], diffs[0]], -1)
        merged = Conv(e, 1, name="linear_fuse")(merged)
        merged = batch_norm("linear_fuse_bn")(merged, use_running_average=not train)

        y = ConvTranspose(e, 4, 2, 1, name="convd2x")(merged)
        y = ResidualBlock(name="dense_2x")(y)
        y = ConvTranspose(e, 4, 2, 1, name="convd1x")(y)
        y = ResidualBlock(name="dense_1x")(y)
        return Conv(self.output_nc, 3, 1, 1, name="change_probability")(y)
