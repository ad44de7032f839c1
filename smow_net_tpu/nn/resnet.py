"""2D ResNet backbone (torchvision layout) with feature taps, used by the
zoo models that vendor torchvision ResNets (e.g. compare/TFI_GR.py:335-446,
compare/SEIFNet.py:259, compare/BIT.py:340-573).

`__call__` returns (c0 stem-relu @/2, c1 @/4, c2 @/8, c3 @/16, c4 @/32).
`replace_stride_with_dilation` mirrors torchvision: a stage keeps stride 1
and dilates instead.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pooling import max_pool
from ..utils import torch_init
from .layers import Conv, batch_norm

__all__ = ["BasicBlock", "ResNet", "resnet18_config", "resnet34_config"]

_init = torch_init.kaiming_normal_fan_out


class BasicBlock(nn.Module):
    """NB: the reference's vendored BasicBlock silently resets dilation>1 to 1
    (compare/BIT.py:260-262 — the NotImplementedError is commented out), so
    replace_stride_with_dilation only removes strides and never dilates. We
    reproduce that quirk: dilation/prev_dilation are accepted but ignored."""

    planes: int
    stride: int = 1
    dilation: int = 1
    prev_dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = Conv(self.planes, 3, self.stride, 1,
                 use_bias=False, kernel_init=_init, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, use_bias=False,
                 kernel_init=_init, name="conv2")(y)
        y = batch_norm("bn2")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv(self.planes, 1, self.stride, use_bias=False, kernel_init=_init,
                            name="downsample_conv")(x)
            identity = batch_norm("downsample_bn")(identity, use_running_average=not train)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    stem_width: int = 64
    num_stages: int = 4  # build/run only the first N stages (e.g. BIT uses 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> Tuple[jnp.ndarray, ...]:
        y = Conv(self.stem_width, 7, 2, 3, use_bias=False, kernel_init=_init, name="conv1")(x)
        y = batch_norm("bn1")(y, use_running_average=not train)
        c0 = nn.relu(y)
        y = max_pool(c0, 3, 2, 1)

        feats = [c0]
        dilation = 1
        widths = self.widths[: self.num_stages]
        for i, (planes, blocks) in enumerate(zip(widths, self.layers)):
            stride = 1 if i == 0 else 2
            dilate = i > 0 and self.replace_stride_with_dilation[i - 1]
            prev_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for j in range(blocks):
                y = BasicBlock(
                    planes,
                    stride=stride if j == 0 else 1,
                    dilation=dilation,
                    prev_dilation=prev_dilation if j == 0 else dilation,
                    name=f"layer{i + 1}_{j}",
                )(y, train)
            feats.append(y)
        return tuple(feats)


def resnet18_config(**kw) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), **kw)


def resnet34_config(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3),
                  replace_stride_with_dilation=(False, True, True), **kw)
