"""SNUNet-CD with ECAM — siamese NestedUNet (UNet++) + ensemble channel
attention. Parity target: reference compare/SNUNet.py:60-148.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, batch_norm
from ...ops.pooling import adaptive_avg_pool, max_pool
from ...utils import torch_init

__all__ = ["SNUNet"]


class ConvBlockNested(nn.Module):
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(self.mid_ch, 3, 1, 1, kernel_init=torch_init.kaiming_normal_fan_out,
                 name="conv1")(x)
        identity = y
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.out_ch, 3, 1, 1, kernel_init=torch_init.kaiming_normal_fan_out,
                 name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        return nn.relu(y + identity)


class ChannelAttention(nn.Module):
    """Avg+max pooled shared-MLP channel gate (compare/SNUNet.py:43-56)."""

    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = Conv(c // self.ratio, 1, use_bias=False,
                   kernel_init=torch_init.kaiming_normal_fan_out, name="fc1")
        fc2 = Conv(c, 1, use_bias=False,
                   kernel_init=torch_init.kaiming_normal_fan_out, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(out)


class SNUNet(nn.Module):
    out_ch: int = 2
    n1: int = 32

    @nn.compact
    def __call__(self, xa, xb, train: bool = False):
        f = [self.n1, self.n1 * 2, self.n1 * 4, self.n1 * 8, self.n1 * 16]
        blocks = {}

        def block(name, mid, out):
            if name not in blocks:
                blocks[name] = ConvBlockNested(mid, out, name=name)
            return blocks[name]

        def up(x, name):
            c = x.shape[-1]
            return ConvTranspose(c, 2, 2, 0, name=name)(x)

        c00 = block("conv0_0", f[0], f[0])
        c10 = block("conv1_0", f[1], f[1])
        c20 = block("conv2_0", f[2], f[2])
        c30 = block("conv3_0", f[3], f[3])
        c40 = block("conv4_0", f[4], f[4])

        x0a = c00(xa, train)
        x1a = c10(max_pool(x0a, 2, 2), train)
        x2a = c20(max_pool(x1a, 2, 2), train)
        x3a = c30(max_pool(x2a, 2, 2), train)
        x0b = c00(xb, train)
        x1b = c10(max_pool(x0b, 2, 2), train)
        x2b = c20(max_pool(x1b, 2, 2), train)
        x3b = c30(max_pool(x2b, 2, 2), train)
        x4b = c40(max_pool(x3b, 2, 2), train)

        cat = lambda *xs: jnp.concatenate(xs, axis=-1)
        x01 = block("conv0_1", f[0], f[0])(cat(x0a, x0b, up(x1b, "Up1_0")), train)
        x11 = block("conv1_1", f[1], f[1])(cat(x1a, x1b, up(x2b, "Up2_0")), train)
        x02 = block("conv0_2", f[0], f[0])(cat(x0a, x0b, x01, up(x11, "Up1_1")), train)
        x21 = block("conv2_1", f[2], f[2])(cat(x2a, x2b, up(x3b, "Up3_0")), train)
        x12 = block("conv1_2", f[1], f[1])(cat(x1a, x1b, x11, up(x21, "Up2_1")), train)
        x03 = block("conv0_3", f[0], f[0])(cat(x0a, x0b, x01, x02, up(x12, "Up1_2")), train)
        x31 = block("conv3_1", f[3], f[3])(cat(x3a, x3b, up(x4b, "Up4_0")), train)
        x22 = block("conv2_2", f[2], f[2])(cat(x2a, x2b, x21, up(x31, "Up3_1")), train)
        x13 = block("conv1_3", f[1], f[1])(cat(x1a, x1b, x11, x12, up(x22, "Up2_2")), train)
        x04 = block("conv0_4", f[0], f[0])(cat(x0a, x0b, x01, x02, x03, up(x13, "Up1_3")), train)

        out = cat(x01, x02, x03, x04)
        intra = x01 + x02 + x03 + x04
        ca1 = ChannelAttention(ratio=16 // 4, name="ca1")(intra)
        ca = ChannelAttention(ratio=16, name="ca")(out)
        out = ca * (out + jnp.tile(ca1, (1, 1, 1, 4)))
        return Conv(self.out_ch, 1, kernel_init=torch_init.kaiming_normal_fan_out,
                    name="conv_final")(out)
