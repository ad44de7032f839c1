"""VGG-16 feature extractor (torchvision layout) with taps after ReLUs
{3, 8, 15, 22, 29}: 64@/1, 128@/2, 256@/4, 512@/8, 512@/16.
Used by DSIFN (reference compare/IFN.py:7-19).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv
from ..ops.pooling import max_pool

__all__ = ["VGG16Features"]

# (out_channels, n_convs) per stage; taps are after the last ReLU of each stage
_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        idx = 0
        for s, (c, n) in enumerate(_STAGES):
            if s > 0:
                x = max_pool(x, 2, 2)
                idx += 1
            for _ in range(n):
                x = nn.relu(Conv(c, 3, 1, 1, name=f"conv_{idx}")(x))
                idx += 2
            feats.append(x)
        return feats
