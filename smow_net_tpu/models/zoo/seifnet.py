"""SEIFNet — spatiotemporal difference enhancement (CoDEM w/ coordinate
attention) + adaptive coord-attention fusion (ACFF) over ResNet-18 features.
Parity target: reference compare/SEIFNet.py:55-138,538-684.
Output: 2-channel logits at input resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.resnet import resnet18_config
from ...ops.resize import resize_linear
from .snunet import ChannelAttention

__all__ = ["SEIFNet"]


def h_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class CoordAtt(nn.Module):
    """Coordinate attention returning (a_w, a_h) gates (SEIFNet.py:500-536)."""

    oup: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        xh = jnp.mean(x, axis=2, keepdims=True)           # (b,h,1,c) pooled over w
        xw = jnp.mean(x, axis=1, keepdims=True)           # (b,1,w,c) pooled over h
        xw_t = xw.transpose(0, 2, 1, 3)                   # (b,w,1,c)
        y = jnp.concatenate([xh, xw_t], axis=1)           # (b,h+w,1,c)
        y = Conv(mip, 1, name="conv1")(y)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = h_swish(y)
        yh, yw = y[:, :h], y[:, h:]
        yw = yw.transpose(0, 2, 1, 3)                     # (b,1,w,mip)
        a_h = nn.sigmoid(Conv(self.oup, 1, name="conv_h")(yh))  # (b,h,1,C)
        a_w = nn.sigmoid(Conv(self.oup, 1, name="conv_w")(yw))  # (b,1,w,C)
        return a_w, a_h


class CoDEM2(nn.Module):
    """Difference enhancement (SEIFNet.py:538-576)."""

    dim: int

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        fd = jnp.abs(x1 - x2)
        fc = jnp.concatenate([x1, x2], axis=-1)
        z = Conv(2 * self.dim, 3, 1, 1, name="Conv3")(fc)
        z = batch_norm("BN1")(z, use_running_average=not train)
        z = nn.relu(z)
        z = Conv(self.dim, 1, name="Conv1")(z)
        z = batch_norm("BN2")(z, use_running_average=not train)
        z_c = nn.relu(z)
        a_w, a_h = CoordAtt(self.dim, reduction=16, name="coAtt_1")(fd, train)
        return fd * a_w * a_h + z_c


class ACFF2(nn.Module):
    """Adaptive fusion of low/high features (SEIFNet.py:578-601)."""

    channel_l: int

    @nn.compact
    def __call__(self, f_low, f_high, train: bool):
        f_high = resize_linear(
            f_high, (f_high.shape[1] * 2, f_high.shape[2] * 2), (1, 2), align_corners=True
        )
        f_high = Conv(self.channel_l, 1, name="conv1")(f_high)
        f_high = batch_norm("BN")(f_high, use_running_average=not train)
        f_high = nn.relu(f_high)
        f_sum = f_high + f_low
        w = ChannelAttention(ratio=16, name="ca")(f_sum)
        return f_low * w + f_high * (1.0 - w)


class SAM(nn.Module):
    """CBAM + conv (SEIFNet.py:603-684)."""

    mid_d: int

    @nn.compact
    def __call__(self, x, train: bool):
        # channel attention (shared MLP over avg+max pooled)
        y = ChannelAttention(ratio=16, name="cbam_ca")(x) * x
        avg = jnp.mean(y, axis=-1, keepdims=True)
        mx = jnp.max(y, axis=-1, keepdims=True)
        sa = nn.sigmoid(Conv(1, 7, 1, 3, name="cbam_sa")(jnp.concatenate([avg, mx], -1)))
        y = sa * y
        y = Conv(self.mid_d, 3, 1, 1, name="conv2")(y)
        y = batch_norm("conv2_bn")(y, use_running_average=not train)
        return nn.relu(y)


class SEIFNet(nn.Module):
    input_nc: int = 3
    output_nc: int = 2

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        backbone = resnet18_config(name="backbone")
        _, a0, a1, a2, a3 = backbone(x1, train)
        _, b0, b1, b2, b3 = backbone(x2, train)

        d1 = CoDEM2(64, name="diff1")(a0, b0, train)
        d2 = CoDEM2(128, name="diff2")(a1, b1, train)
        d3 = CoDEM2(256, name="diff3")(a2, b2, train)
        d4 = CoDEM2(512, name="diff4")(a3, b3, train)

        p4 = SAM(512, name="sam_p4")(d4, train)
        p3 = SAM(256, name="sam_p3")(ACFF2(256, name="ACFF3")(d3, p4, train), train)
        p2 = SAM(128, name="sam_p2")(ACFF2(128, name="ACFF2")(d2, p3, train), train)
        p1 = SAM(64, name="sam_p1")(ACFF2(64, name="ACFF1")(d1, p2, train), train)

        up = lambda v, f: resize_linear(v, (v.shape[1] * f, v.shape[2] * f), (1, 2), False)
        p4u = Conv(64, 1, name="conv4")(up(p4, 8))
        p3u = Conv(64, 1, name="conv3")(up(p3, 4))
        p2u = Conv(64, 1, name="conv2")(up(p2, 2))
        p = p1 + p2u + p3u + p4u
        return Conv(self.output_nc, 1, name="conv_final1")(up(p, 4))
