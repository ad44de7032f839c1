"""DSIFN — deeply-supervised image fusion network. Parity target: reference
compare/IFN.py:57-179: two independent (non-siamese) VGG16 bases, 5 fusion
branches with channel/spatial attention, conv+PReLU+BN+Dropout(0.6) blocks,
sigmoid 1-channel output (intermediate supervision heads are dead code in
the reference and omitted).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, batch_norm
from ...nn.vgg import VGG16Features

__all__ = ["DSIFN"]


def _prelu(mdl, x, name):
    alpha = mdl.param(name + "_alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class ChannelAttention(nn.Module):
    ratio: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = Conv(c // self.ratio, 1, use_bias=False, name="fc1")
        fc2 = Conv(c, 1, use_bias=False, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        return nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))


class SpatialAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = Conv(1, 7, 1, 3, use_bias=False, name="conv1")(jnp.concatenate([avg, mx], -1))
        return nn.sigmoid(y)


class ConvBNBlock(nn.Module):
    """conv3x3 + PReLU + BN + Dropout(0.6) (compare/IFN.py:49-55)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(self.features, 3, 1, 1, name="conv")(x)
        y = _prelu(self, y, "prelu")
        y = batch_norm()(y, use_running_average=not train)
        return nn.Dropout(0.6, deterministic=not train, name="do")(y)


class DSIFN(nn.Module):
    @nn.compact
    def __call__(self, t1, t2, train: bool = False):
        f1 = VGG16Features(name="t1_base")(t1)
        f2 = VGG16Features(name="t2_base")(t2)

        def branch(x, convs, ca_name, sa_name, bn_name):
            if ca_name:
                x = ChannelAttention(name=ca_name)(x) * x
            for conv in convs:
                x = conv(x, train)
            x = SpatialAttention(name=sa_name)(x) * x
            return batch_norm(bn_name)(x, use_running_average=not train)

        x = jnp.concatenate([f1[4], f2[4]], -1)
        x = branch(x, [ConvBNBlock(512, name="o1_conv1"), ConvBNBlock(512, name="o1_conv2")],
                   None, "sa1", "bn_sa1")
        x = ConvTranspose(512, 2, 2, name="trans_conv1")(x)

        x = jnp.concatenate([x, f1[3], f2[3]], -1)
        x = branch(x, [ConvBNBlock(512, name="o2_conv1"), ConvBNBlock(256, name="o2_conv2"),
                       ConvBNBlock(256, name="o2_conv3")], "ca2", "sa2", "bn_sa2")
        x = ConvTranspose(256, 2, 2, name="trans_conv2")(x)

        x = jnp.concatenate([x, f1[2], f2[2]], -1)
        x = branch(x, [ConvBNBlock(256, name="o3_conv1"), ConvBNBlock(128, name="o3_conv2"),
                       ConvBNBlock(128, name="o3_conv3")], "ca3", "sa3", "bn_sa3")
        x = ConvTranspose(128, 2, 2, name="trans_conv3")(x)

        x = jnp.concatenate([x, f1[1], f2[1]], -1)
        x = branch(x, [ConvBNBlock(128, name="o4_conv1"), ConvBNBlock(64, name="o4_conv2"),
                       ConvBNBlock(64, name="o4_conv3")], "ca4", "sa4", "bn_sa4")
        x = ConvTranspose(64, 2, 2, name="trans_conv4")(x)

        x = jnp.concatenate([x, f1[0], f2[0]], -1)
        x = branch(x, [ConvBNBlock(64, name="o5_conv1"), ConvBNBlock(32, name="o5_conv2"),
                       ConvBNBlock(16, name="o5_conv3")], "ca5", "sa5", "bn_sa5")
        return nn.sigmoid(Conv(1, 1, name="o5_conv4")(x))
