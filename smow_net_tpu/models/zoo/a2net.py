"""A2Net — lightweight MobileNetV2 CD net with neighbor feature aggregation,
temporal fusion and supervised attention decoder.
Parity target: reference compare/A2Net.py:270-303 (plus modules :7-268).
Output: sigmoid probabilities, 1 channel (aux masks are dead code upstream).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.mobilenetv2 import MobileNetV2
from ...ops.pooling import max_pool
from ...ops.resize import resize_linear

__all__ = ["A2Net"]


class ConvBR(nn.Module):
    feats: int
    k: int = 3
    pool: bool = False  # MaxPool2d(2,2) before the conv (scaleN_cM variants)

    @nn.compact
    def __call__(self, x, train: bool):
        if self.pool:
            x = max_pool(x, 2, 2)
        y = Conv(self.feats, self.k, 1, (self.k - 1) // 2, name="conv")(x)
        y = batch_norm()(y, use_running_average=not train)
        return nn.relu(y)


class FeatureFusionModule(nn.Module):
    out_d: int

    @nn.compact
    def __call__(self, c_fuse, c, train: bool):
        y = Conv(self.out_d, 3, 1, 1, name="fuse_conv1")(c_fuse)
        y = batch_norm("fuse_bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.out_d, 3, 1, 1, name="fuse_conv2")(y)
        y = batch_norm("fuse_bn2")(y, use_running_average=not train)
        ident = Conv(self.out_d, 1, name="conv_identity")(c)
        return nn.relu(y + ident)


class NeighborFeatureAggregation(nn.Module):
    """compare/A2Net.py:7-110; mid = out_d // 2."""

    out_d: int = 64

    @nn.compact
    def __call__(self, c2, c3, c4, c5, train: bool):
        m = self.out_d // 2
        up = lambda v: resize_linear(v, (v.shape[1] * 2, v.shape[2] * 2), (1, 2), False)
        # scale 2
        s2 = jnp.concatenate(
            [ConvBR(m, name="conv_scale2_c2")(c2, train),
             up(ConvBR(m, name="conv_scale2_c3")(c3, train))], -1)
        s2 = FeatureFusionModule(self.out_d, name="agg_s2")(s2, c2, train)
        # scale 3
        s3 = jnp.concatenate(
            [ConvBR(m, pool=True, name="conv_scale3_c2")(c2, train),
             ConvBR(m, name="conv_scale3_c3")(c3, train),
             up(ConvBR(m, name="conv_scale3_c4")(c4, train))], -1)
        s3 = FeatureFusionModule(self.out_d, name="agg_s3")(s3, c3, train)
        # scale 4
        s4 = jnp.concatenate(
            [ConvBR(m, pool=True, name="conv_scale4_c3")(c3, train),
             ConvBR(m, name="conv_scale4_c4")(c4, train),
             up(ConvBR(m, name="conv_scale4_c5")(c5, train))], -1)
        s4 = FeatureFusionModule(self.out_d, name="agg_s4")(s4, c4, train)
        # scale 5
        s5 = jnp.concatenate(
            [ConvBR(m, pool=True, name="conv_scale5_c4")(c4, train),
             ConvBR(m, name="conv_scale5_c5")(c5, train)], -1)
        s5 = FeatureFusionModule(self.out_d, name="agg_s5")(s5, c5, train)
        return s2, s3, s4, s5


class TemporalFeatureFusionModule(nn.Module):
    """Cascaded dilated residual branches over |x1-x2| (compare/A2Net.py:134-181)."""

    out_d: int

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        d = x1.shape[-1]
        x = jnp.abs(x1 - x2)

        def branch_f(feats, dil, name):
            def f(v):
                y = Conv(feats, 3, 1, dil, dilation=dil, name=name + "_conv")(v)
                return batch_norm(name + "_bn")(y, use_running_average=not train)
            return f

        b1 = branch_f(d, 7, "branch1")(x)
        b2 = branch_f(d, 5, "branch2_f")(nn.relu(Conv(d, 1, name="conv_branch2")(x) + b1))
        b3 = branch_f(d, 3, "branch3_f")(nn.relu(Conv(d, 1, name="conv_branch3")(x) + b2))
        b4 = branch_f(self.out_d, 1, "branch4_f")(
            nn.relu(Conv(d, 1, name="conv_branch4")(x) + b3))
        return nn.relu(Conv(self.out_d, 1, name="conv_branch5")(x) + b4)


class SupervisedAttentionModule(nn.Module):
    mid_d: int

    @nn.compact
    def __call__(self, x, train: bool):
        mask = Conv(1, 1, name="cls")(x)
        mf = nn.sigmoid(mask)
        context = jnp.concatenate([mf, 1.0 - mf], -1)
        context = Conv(self.mid_d, 1, name="conv_context")(context)
        context = batch_norm("context_bn")(context, use_running_average=not train)
        context = nn.relu(context)
        y = x * context
        y = Conv(self.mid_d, 3, 1, 1, name="conv2")(y)
        y = batch_norm("conv2_bn")(y, use_running_average=not train)
        return nn.relu(y), mask


class A2Net(nn.Module):
    input_nc: int = 3
    out_c: int = 1
    en_d: int = 32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        mid = self.en_d * 2
        backbone = MobileNetV2(name="backbone")
        _, a2, a3, a4, a5 = backbone(x1, train)
        _, b2, b3, b4, b5 = backbone(x2, train)
        swa = NeighborFeatureAggregation(mid, name="swa")
        a2, a3, a4, a5 = swa(a2, a3, a4, a5, train)
        b2, b3, b4, b5 = swa(b2, b3, b4, b5, train)
        c2 = TemporalFeatureFusionModule(mid, name="tffm_x2")(a2, b2, train)
        c3 = TemporalFeatureFusionModule(mid, name="tffm_x3")(a3, b3, train)
        c4 = TemporalFeatureFusionModule(mid, name="tffm_x4")(a4, b4, train)
        c5 = TemporalFeatureFusionModule(mid, name="tffm_x5")(a5, b5, train)

        up2 = lambda v: resize_linear(v, (v.shape[1] * 2, v.shape[2] * 2), (1, 2), False)
        p5, _ = SupervisedAttentionModule(mid, name="sam_p5")(c5, train)
        p4 = ConvBR(mid, name="conv_p4")(c4 + up2(p5), train)
        p4, _ = SupervisedAttentionModule(mid, name="sam_p4")(p4, train)
        p3 = ConvBR(mid, name="conv_p3")(c3 + up2(p4), train)
        p3, _ = SupervisedAttentionModule(mid, name="sam_p3")(p3, train)
        p2 = ConvBR(mid, name="conv_p2")(c2 + up2(p3), train)
        mask = Conv(1, 1, name="cls")(p2)
        mask = resize_linear(mask, (mask.shape[1] * 4, mask.shape[2] * 4), (1, 2), False)
        return nn.sigmoid(mask)
