"""TFI_GR — temporal feature interaction + guided refinement.

Parity target: reference compare/TFI_GR.py:7-230. ResNet-18 siamese
backbone; per-scale TFIM (abs-diff enhance + fusion); two rounds of
CIEM (multi-scale channel-attention fusion + pyramid pooling) + GRM
refinement; sum-decoder; sigmoid output (output_nc channels, recipe uses 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.resnet import resnet18_config
from ...ops.pooling import avg_pool
from ...ops.resize import resize_linear
from .snunet import ChannelAttention

__all__ = ["TFIGR"]


def _cbr(mdl_name, feats, k=3, p=1, bias=True):
    def apply(x, train):
        y = Conv(feats, k, 1, p, use_bias=bias, name=mdl_name + "_conv")(x)
        y = batch_norm(mdl_name + "_bn")(y, use_running_average=not train)
        return nn.relu(y)

    return apply


class TFIM(nn.Module):
    """Temporal feature interaction (compare/TFI_GR.py:7-48)."""

    in_d: int
    out_d: int

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        sub = _cbr("conv_sub", self.in_d)(jnp.abs(x1 - x2), train)
        x1 = _cbr("conv_diff_enh1", self.in_d)(x1 * sub + x1, train)
        x2 = _cbr("conv_diff_enh2", self.in_d)(x2 * sub + x2, train)
        xf = _cbr("conv_cat", self.in_d)(jnp.concatenate([x1, x2], -1), train)
        return _cbr("conv_dr", self.out_d, k=1, p=0)(sub + xf, train)


class CIEM(nn.Module):
    """Change information extraction (compare/TFI_GR.py:69-114)."""

    in_d: int

    @nn.compact
    def __call__(self, d5, d4, d3, d2, train: bool):
        size = d2.shape[1:3]
        up = lambda v: resize_linear(v, size, (1, 2), align_corners=True)
        x = jnp.concatenate([up(d5), up(d4), up(d3), d2], -1)
        x = ChannelAttention(ratio=16, name="ca")(x) * x
        x = Conv(self.in_d, 3, 1, 1, use_bias=False, name="conv_dr")(x)
        x = batch_norm("conv_dr_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        outs = [x]
        for i, p in enumerate((2, 4, 8)):
            y = avg_pool(x, p, p)
            y = Conv(self.in_d, 3, 1, 1, use_bias=False, name=f"conv_pool{i + 1}")(y)
            outs.append(y)
        d2p, d3p, d4p, d5p = outs
        return d5p, d4p, d3p, d2p


class GRM(nn.Module):
    """Guided refinement (compare/TFI_GR.py:117-150)."""

    out_d: int

    @nn.compact
    def __call__(self, ds, dps, train: bool):
        names = ("conv_d5", "conv_d4", "conv_d3", "conv_d2")
        return tuple(
            _cbr(n, self.out_d)(d + dp, train) for n, d, dp in zip(names, ds, dps)
        )


class TFIGR(nn.Module):
    input_nc: int = 3
    num_classes: int = 1
    mid_d: int = 64

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        backbone = resnet18_config(name="backbone")
        _, f12, f13, f14, f15 = backbone(x1, train)
        _, f22, f23, f24, f25 = backbone(x2, train)

        d5 = TFIM(512, self.mid_d, name="TFIM5")(f15, f25, train)
        d4 = TFIM(256, self.mid_d, name="TFIM4")(f14, f24, train)
        d3 = TFIM(128, self.mid_d, name="TFIM3")(f13, f23, train)
        d2 = TFIM(64, self.mid_d, name="TFIM2")(f12, f22, train)

        dps = CIEM(self.mid_d, name="CIEM1")(d5, d4, d3, d2, train)
        d5, d4, d3, d2 = GRM(self.mid_d, name="GRM1")((d5, d4, d3, d2), dps, train)
        dps = CIEM(self.mid_d, name="CIEM2")(d5, d4, d3, d2, train)
        d5, d4, d3, d2 = GRM(self.mid_d, name="GRM2")((d5, d4, d3, d2), dps, train)

        # decoder: repeated shared conv_sum1 (reference reuses conv_sum1 for
        # all three sums, compare/TFI_GR.py:178-182) — instantiate once so
        # flax shares the parameters across the three calls
        up = lambda v, ref: resize_linear(v, ref.shape[1:3], (1, 2), align_corners=True)
        sum_conv = Conv(self.mid_d, 3, 1, 1, name="decoder_conv_sum1_conv")
        sum_bn = batch_norm("decoder_conv_sum1_bn")
        conv_sum1 = lambda v, tr: nn.relu(sum_bn(sum_conv(v), use_running_average=not tr))
        d4 = conv_sum1(d4 + up(d5, d4), train)
        d3 = conv_sum1(d3 + up(d4, d3), train)
        d2 = conv_sum1(d2 + up(d3, d2), train)
        mask = Conv(self.num_classes, 1, use_bias=False, name="decoder_cls")(d2)
        mask = resize_linear(mask, x1.shape[1:3], (1, 2), align_corners=True)
        return nn.sigmoid(mask)
