"""AFCF3D_NET — 3D-conv adjacent-level cross-fusion over an inflated
ResNet-18, UNet3++-style time-concat decoder.
Parity target: reference compare/AFCF3D_NET.py:7-470 (recipe: channel=32,
torchvision resnet18). Reuses the shared inflated ResNet3D encoder
(same Decompose pattern as SMOW_Net, AFCF3D_NET.py:524-605).
Weight sharing mirrors the reference: one AFCF2 instance fuses levels 2-4,
and the decoder's conv_upsample/conv_downsample are shared across levels.
Output: sigmoid probabilities, 1 channel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.resnet3d import ResNet3D
from ...ops.resize import resize_linear

__all__ = ["AFCF3D"]


class BasicConv3d(nn.Module):
    features: int
    kernel: tuple = (1, 1, 1)
    stride: tuple = (1, 1, 1)
    padding: tuple = (0, 0, 0)

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(self.features, self.kernel, self.stride, self.padding, name="conv")(x)
        y = batch_norm()(y, use_running_average=not train)
        return nn.relu(y)


class Reduction3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = BasicConv3d(self.features, (1, 1, 1), name="r0")(x, train)
        y = BasicConv3d(self.features, (3, 3, 3), padding=(1, 1, 1), name="r1")(y, train)
        return BasicConv3d(self.features, (3, 3, 3), padding=(1, 1, 1), name="r2")(y, train)


class CMAVariant(nn.Module):
    """Coordinate-attention gate on a (B,H,W,C) map (AFCF3D_NET.py:208-241)."""

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        xh = jnp.mean(x, axis=2, keepdims=True)               # (b,h,1,c)
        xw = jnp.mean(x, axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (b,w,1,c)
        y = jnp.concatenate([xh, xw], axis=1)
        y = Conv(c, 1, name="conv1")(y)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        yh, yw = y[:, :h], y[:, h:]
        a_h = nn.sigmoid(Conv(c, 1, name="conv2")(yh))                # (b,h,1,c)
        a_w = nn.sigmoid(Conv(c, 1, name="conv3")(yw)).transpose(0, 2, 1, 3)  # (b,1,w,c)
        return x * a_w * a_h


def _up2(v):
    """Bilinear x2 spatial upsample of a (B,T,H,W,C) volume, align_corners=True
    (the reference flattens T into channels first — identical result)."""
    return resize_linear(v, (v.shape[2] * 2, v.shape[3] * 2), (2, 3), align_corners=True)


def _se_apply(se, v, train):
    b, t, h, w, c = v.shape
    flat = v.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    flat = se(flat, train)
    return flat.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


class AFCF3D(nn.Module):
    features: int = 32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x = jnp.stack([x1, x2], axis=1)
        size = x1.shape[1:3]
        enc = ResNet3D(name="resnet")
        x0, (f1, f2, f3, f4) = enc(x, train)

        ch = self.features
        xs = [Reduction3D(ch, name=f"reduction{i}")(v, train)
              for i, v in enumerate((x0, f1, f2, f3, f4))]

        # ---- AFCF fusion: AFCF1/AFCF2/AFCF3 each own their up/down convs;
        # the single AFCF2 instance is reused for levels 2-4 (reference
        # Feature_fusion, compare/AFCF3D_NET.py:105-118) ----
        up1 = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name="AFCF1_conv_up")
        up2 = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name="AFCF2_conv_up")
        down2 = BasicConv3d(ch, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="AFCF2_conv_down")
        down3 = BasicConv3d(ch, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="AFCF3_conv_down")

        def cat_block(prefix):
            c1 = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name=prefix + "_cat0")
            c2 = BasicConv3d(ch, (1, 1, 1), name=prefix + "_cat1")
            se = CMAVariant(name=prefix + "_se")
            return c1, c2, se

        def fuse(summed, skip, convs):
            c1, c2, se = convs
            feat = c2(c1(summed, train), train)
            feat = _se_apply(lambda v, tr: se(v, tr), feat, train)
            return feat + skip

        a1 = fuse(xs[0] + up1(_up2(xs[1]), train), xs[0], cat_block("AFCF1"))
        afcf2 = cat_block("AFCF2")
        a2 = fuse(down2(xs[0], train) + xs[1] + up2(_up2(xs[2]), train), xs[1], afcf2)
        a3 = fuse(down2(xs[1], train) + xs[2] + up2(_up2(xs[3]), train), xs[2], afcf2)
        a4 = fuse(down2(xs[2], train) + xs[3] + up2(_up2(xs[4]), train), xs[3], afcf2)
        a5 = fuse(down3(xs[3], train) + xs[4], xs[4], cat_block("AFCF3"))
        x0, f1, f2, f3, f4 = a1, a2, a3, a4, a5

        # ---- UNet3++ decoder: concat along TIME (5 levels x T=2 -> T=10) ----
        dec_up = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name="dec_conv_upsample")
        dec_down = BasicConv3d(ch, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="dec_conv_downsample")

        def down_t(prefix, final=False):
            c1 = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name=prefix + "_0")
            c2 = BasicConv3d(ch, (4, 3, 3), (2, 1, 1), (0, 1, 1), name=prefix + "_1")
            k3 = (4, 1, 1) if final else (3, 1, 1)
            c3 = BasicConv3d(ch, k3, name=prefix + "_2")
            return lambda v: c3(c2(c1(v, train), train), train)

        x0d1 = dec_down(x0, train)
        x0d2 = dec_down(x0d1, train)
        x0d3 = dec_down(x0d2, train)
        x1d2 = dec_down(f1, train)
        x1d3 = dec_down(x1d2, train)
        x2d3 = dec_down(f2, train)

        def level(parts, prefix):
            residual = jnp.concatenate(parts, axis=1)  # concat on T
            c1 = BasicConv3d(ch, (3, 3, 3), padding=(1, 1, 1), name=prefix + "_cat0")
            c2 = BasicConv3d(ch, (1, 1, 1), name=prefix + "_cat1")
            se = CMAVariant(name=prefix + "_se")
            y = c2(c1(residual, train), train)
            y = _se_apply(lambda v, tr: se(v, tr), y, train)
            return residual + y

        x4u = dec_up(_up2(f4), train)
        d3 = down_t("downT3")(level([x4u, f3, x2d3, x1d3, x0d3], "SE_3"))
        x3u = dec_up(_up2(d3), train)
        x4u = dec_up(_up2(x4u), train)
        d2 = down_t("downT2")(level([x4u, x3u, f2, x1d2, x0d2], "SE_2"))
        x2u = dec_up(_up2(d2), train)
        x3u = dec_up(_up2(x3u), train)
        x4u = dec_up(_up2(x4u), train)
        d1 = down_t("downT1")(level([x4u, x3u, x2u, f1, x0d1], "SE_1"))
        x1u = dec_up(_up2(d1), train)
        x2u = dec_up(_up2(x2u), train)
        x3u = dec_up(_up2(x3u), train)
        x4u = dec_up(_up2(x4u), train)
        d0 = down_t("downfinal", final=True)(level([x0, x4u, x3u, x2u, x1u], "SE_0"))

        h = Conv(2 * ch, 1, use_bias=False, name="out_conv1")(d0[:, 0])  # squeeze T=1
        h = batch_norm("out_bn1")(h, use_running_average=not train)
        h = Conv(ch, 1, use_bias=False, name="out_conv2")(h)
        h = batch_norm("out_bn2")(h, use_running_average=not train)
        h = Conv(1, 1, name="out_conv3")(h)
        h = resize_linear(h, size, (1, 2), align_corners=True)
        return nn.sigmoid(h)
