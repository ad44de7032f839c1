"""BIT — Bitemporal Image Transformer.

Parity target: reference compare/BIT.py:92-229 (recipe train.py:93-94:
output_nc=2, token_len=4, resnet_stages_num=4, with_pos='learned',
enc_depth=1, dec_depth=8, decoder_dim_head=8). ResNet-18 with dilated
layer3/4 (stride 8), x2 nearest upsample + conv_pred to 32ch @ /4,
semantic tokens (4/image), shared transformer over the concat tokens,
per-image cross-attn decoder, abs-diff, x4 bilinear upsample, 2-layer conv
classifier. Returns 2-channel logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, Dense, SelfAttentionBlock, FeedForward, layer_norm, batch_norm
from ...nn.resnet import ResNet
from ...ops.resize import resize_linear, resize_nearest

__all__ = ["BIT"]


class BITCrossAttention(nn.Module):
    """compare/BIT.py:633-680: scale dim^-0.5, separate q/k/v projections."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, m):
        inner = self.heads * self.dim_head
        q = Dense(inner, use_bias=False, name="to_q")(x)
        k = Dense(inner, use_bias=False, name="to_k")(m)
        v = Dense(inner, use_bias=False, name="to_v")(m)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim ** -0.5
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return Dense(self.dim, name="to_out")(out)


class BIT(nn.Module):
    input_nc: int = 3
    output_nc: int = 2
    token_len: int = 4
    resnet_stages_num: int = 4
    with_pos: str = "learned"
    enc_depth: int = 1
    dec_depth: int = 8
    dim_head: int = 64
    decoder_dim_head: int = 8
    heads: int = 8

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        dim, mlp_dim = 32, 64
        n_stages = self.resnet_stages_num - 1  # stages_num counts the stem
        backbone = ResNet(
            layers=(2, 2, 2, 2), replace_stride_with_dilation=(False, True, True),
            num_stages=n_stages, name="resnet",
        )
        conv_pred = Conv(32, 3, 1, 1, name="conv_pred")

        def forward_single(x):
            feats = backbone(x, train)
            y = feats[-1]
            y = resize_nearest(y, (y.shape[1] * 2, y.shape[2] * 2), (1, 2))
            return conv_pred(y)

        f1 = forward_single(x1)
        f2 = forward_single(x2)

        conv_a = Conv(self.token_len, 1, use_bias=False, name="conv_a")

        def tokens(f):
            b, h, w, c = f.shape
            att = conv_a(f).reshape(b, h * w, self.token_len)
            att = nn.softmax(att.transpose(0, 2, 1), axis=-1)  # (b, L, hw)
            return jnp.einsum("bln,bnc->blc", att, f.reshape(b, h * w, c))

        t1, t2 = tokens(f1), tokens(f2)
        tt = jnp.concatenate([t1, t2], axis=1)
        if self.with_pos == "learned":
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (1, self.token_len * 2, dim))
            tt = tt + pos
        for i in range(self.enc_depth):
            tt = SelfAttentionBlock(dim, self.heads, self.dim_head, scale_by_dim=True,
                                    always_project=True, name=f"enc{i}_attn")(
                layer_norm(name=f"enc{i}_norm1")(tt)) + tt
            tt = FeedForward(dim, mlp_dim, name=f"enc{i}_ff")(
                layer_norm(name=f"enc{i}_norm2")(tt)) + tt
        t1, t2 = jnp.split(tt, 2, axis=1)

        # decoder modules are shared between the two temporal branches
        # (the reference applies the same transformer_decoder to x1 and x2)
        dec_layers = [
            (layer_norm(name=f"dec{i}_norm1"),
             BITCrossAttention(dim, self.heads, self.decoder_dim_head, name=f"dec{i}_attn"),
             layer_norm(name=f"dec{i}_norm2"),
             FeedForward(dim, mlp_dim, name=f"dec{i}_ff"))
            for i in range(self.dec_depth)
        ]

        def decode(f, m):
            b, h, w, c = f.shape
            q = f.reshape(b, h * w, c)
            for norm1, attn, norm2, ff in dec_layers:
                q = attn(norm1(q), norm1(m)) + q
                q = ff(norm2(q)) + q
            return q.reshape(b, h, w, c)

        f1 = decode(f1, t1)
        f2 = decode(f2, t2)

        y = jnp.abs(f1 - f2)
        y = resize_linear(y, (y.shape[1] * 4, y.shape[2] * 4), (1, 2), align_corners=False)
        y = Conv(32, 3, 1, 1, use_bias=False, name="classifier_conv1")(y)
        y = batch_norm("classifier_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        return Conv(self.output_nc, 3, 1, 1, name="classifier_conv2")(y)
