"""MobileNetV2 feature backbone (reference models/SMOW_Net_LW.py:526-579,
self-contained rebuild; torchvision-compatible weight layout for the
converter). Emits feature taps after blocks [1, 3, 6, 13, 17]:
16ch@/2, 24ch@/4, 32ch@/8, 96ch@/16, 320ch@/32.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from ..utils import torch_init
from .layers import Conv, batch_norm

__all__ = ["MobileNetV2"]

# (expand t, out c, repeats n, stride s)
_SETTINGS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
_TAPS = (1, 3, 6, 13, 17)


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


def _conv(features, k, stride=1, groups=1, name=None):
    pad = (k - 1) // 2
    def kinit(key, shape, dtype=jnp.float32):
        # torch kaiming_normal_(mode='fan_out'): std = sqrt(2 / (out*prod(k)))
        fan_out = shape[-1]
        for s in shape[:-2]:
            fan_out *= s
        import jax
        return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_out)
    return Conv(features, k, stride, pad, groups=groups, use_bias=False,
                kernel_init=kinit, name=name)


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        y = _conv(self.features, self.kernel, self.stride, self.groups, name="conv")(x)
        y = batch_norm()(y, use_running_average=not train)
        return relu6(y)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand))
        use_res = self.stride == 1 and inp == self.features
        y = x
        if self.expand != 1:
            y = ConvBNReLU6(hidden, 1, name="pw")(y, train)
        y = ConvBNReLU6(hidden, 3, self.stride, groups=hidden, name="dw")(y, train)
        y = _conv(self.features, 1, name="pw_linear")(y)
        y = batch_norm("pw_linear_bn")(y, use_running_average=not train)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    """Returns the 5 feature taps used by SMOW_Net_LW."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> List[jnp.ndarray]:
        feats = []
        idx = 0
        y = ConvBNReLU6(32, 3, 2, name=f"features_{idx}")(x, train)
        for t, c, n, s in _SETTINGS:
            for i in range(n):
                idx += 1
                stride = s if i == 0 else 1
                y = InvertedResidual(c, stride, t, name=f"features_{idx}")(y, train)
                if idx in _TAPS:
                    feats.append(y)
        idx += 1
        y = ConvBNReLU6(1280, 1, name=f"features_{idx}")(y, train)
        if idx in _TAPS:
            feats.append(y)
        return feats
