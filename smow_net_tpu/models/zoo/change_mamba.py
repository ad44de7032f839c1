"""ChangeMamba — siamese VSSM encoder + spatio-temporal VSS decoder.

Parity target: reference compare/change_mamba.py:25-76 +
compare/ChangeDecoder.py:7-321 (recipe train.py:119: depths [2,2,9,2],
dims 96, ssm_d_state 16, ssm_ratio 2.0, forward_type v2, mlp_ratio 4.0,
drop_path 0.1, downsample v2, patchembed v2, norm ln).

Each decoder level runs three VSS paths over (a) channel-concat, (b)
column-interleaved width-doubled, and (c) side-by-side width-doubled
tensors of the pre/post features (the reference hard-codes .cuda() tensor
assembly, ChangeDecoder.py:204-211 — here it's a stack/reshape), then fuses
5 de-interleaved maps, FPN-style upsample-add, 2-class head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.ssm import VSSM, VSSBlock
from ...ops.resize import resize_linear

__all__ = ["ChangeMamba"]

# Siamese-encode batching A/B (see the call site): True = one (2B)-batched
# encoder pass, False = two sequential passes (the reference's structure).
_ENC_2B = True


def set_enc_2b(v: bool):
    global _ENC_2B
    _ENC_2B = v



class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(self.features, 3, 1, 1, use_bias=False, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, 1, use_bias=False, name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        return nn.relu(y + x)


class STBlock(nn.Module):
    """conv1x1 -> VSSBlock (one spatio-temporal path)."""

    drop_path: float = 0.1
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(128, 1, name="proj")(x)
        return VSSBlock(128, self.drop_path, mlp_ratio=4.0, remat=self.remat,
                        name="vss")(y, train)


class ChangeMamba(nn.Module):
    depths: tuple = (2, 2, 9, 2)
    dims: tuple = (96, 192, 384, 768)
    drop_path_rate: float = 0.1
    use_checkpoint: bool = False  # reference use_checkpoint flag

    @nn.compact
    def __call__(self, pre, post, train: bool = False):
        encoder = VSSM(self.depths, self.dims, drop_path_rate=self.drop_path_rate,
                       patchembed_version="v2", downsample_version="v2",
                       use_checkpoint=self.use_checkpoint, name="encoder")
        # Siamese encode: the VSSM is LayerNorm-only (no batch-coupled
        # stats), so a single (2B)-batched pass is numerically exact —
        # A/B-toggled (tools/probe_mamba_2b.py; the r3 change measured
        # vs_baseline 0.992-0.976 on this model, i.e. neutral-to-negative).
        if _ENC_2B:
            B = pre.shape[0]
            feats = encoder(jnp.concatenate([pre, post], axis=0), train)
            f_pre = [f[:B] for f in feats]
            f_post = [f[B:] for f in feats]
        else:
            f_pre = encoder(pre, train)
            f_post = encoder(post, train)

        def level(i, a, b):
            B, H, W, C = a.shape
            p1 = STBlock(remat=self.use_checkpoint,
                         name=f"st_block_{i}1")(jnp.concatenate([a, b], -1), train)
            inter = jnp.stack([a, b], axis=3).reshape(B, H, 2 * W, C)
            p2 = STBlock(remat=self.use_checkpoint, name=f"st_block_{i}2")(inter, train)
            side = jnp.concatenate([a, b], axis=2)
            p3 = STBlock(remat=self.use_checkpoint, name=f"st_block_{i}3")(side, train)
            parts = [p1, p2[:, :, ::2], p2[:, :, 1::2], p3[:, :, :W], p3[:, :, W:]]
            y = Conv(128, 1, name=f"fuse_layer_{i}")(jnp.concatenate(parts, -1))
            y = batch_norm(f"fuse_bn_{i}")(y, use_running_average=not train)
            return nn.relu(y)

        p4 = level(4, f_pre[3], f_post[3])
        p3 = level(3, f_pre[2], f_post[2])
        p2 = level(2, f_pre[1], f_post[1])
        p1 = level(1, f_pre[0], f_post[0])

        def up_add(x, y):
            return resize_linear(x, y.shape[1:3], (1, 2), align_corners=False) + y

        p3 = ResBlock(128, name="smooth_layer_3")(up_add(p4, p3), train)
        p2 = ResBlock(128, name="smooth_layer_2")(up_add(p3, p2), train)
        p1 = ResBlock(128, name="smooth_layer_1")(up_add(p2, p1), train)

        out = Conv(2, 1, name="main_clf")(p1)
        return resize_linear(out, pre.shape[1:3], (1, 2), align_corners=False)
