"""FC-EF — early-fusion fully-convolutional U-Net (Daudt 2018).

Parity target: reference compare/FC_EF.py:10-148. A/B are concatenated on
channels; 4 conv stages with channel Dropout2d(0.2) and max-pool; decoder
mirrors with transposed convs and skip concats; returns 2-channel logits
(the reference defines LogSoftmax but never applies it, FC_EF.py:90,148).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, ConvTranspose, batch_norm

__all__ = ["FCEF"]


class FCEF(nn.Module):
    label_nbr: int = 2
    input_nbr: int = 3

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ...ops.pooling import max_pool

        def cbr(x, feats, name, transpose=False):
            mod = ConvTranspose if transpose else Conv
            y = mod(feats, 3, 1, 1, name=name)(x)
            y = batch_norm(name + "_bn")(y, use_running_average=not train)
            y = nn.relu(y)
            return nn.Dropout(0.2, broadcast_dims=(1, 2), deterministic=not train,
                              name=name + "_do")(y)

        x = jnp.concatenate([x1, x2], axis=-1)
        # encoder
        x11 = cbr(x, 16, "conv11")
        x12 = cbr(x11, 16, "conv12")
        x1p = max_pool(x12, 2, 2)
        x21 = cbr(x1p, 32, "conv21")
        x22 = cbr(x21, 32, "conv22")
        x2p = max_pool(x22, 2, 2)
        x31 = cbr(x2p, 64, "conv31")
        x32 = cbr(x31, 64, "conv32")
        x33 = cbr(x32, 64, "conv33")
        x3p = max_pool(x33, 2, 2)
        x41 = cbr(x3p, 128, "conv41")
        x42 = cbr(x41, 128, "conv42")
        x43 = cbr(x42, 128, "conv43")
        x4p = max_pool(x43, 2, 2)

        def up(x, feats, skip, name):
            y = ConvTranspose(feats, 3, 2, 1, 1, name=name)(x)
            # reference pads with replication if odd-size mismatch
            # (FC_EF.py:120); with even inputs shapes already match.
            dh = skip.shape[1] - y.shape[1]
            dw = skip.shape[2] - y.shape[2]
            if dh or dw:
                y = jnp.pad(y, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="edge")
            return jnp.concatenate([y, skip], axis=-1)

        y = up(x4p, 128, x43, "upconv4")
        y = cbr(y, 128, "conv43d", transpose=True)
        y = cbr(y, 128, "conv42d", transpose=True)
        y = cbr(y, 64, "conv41d", transpose=True)
        y = up(y, 64, x33, "upconv3")
        y = cbr(y, 64, "conv33d", transpose=True)
        y = cbr(y, 64, "conv32d", transpose=True)
        y = cbr(y, 32, "conv31d", transpose=True)
        y = up(y, 32, x22, "upconv2")
        y = cbr(y, 32, "conv22d", transpose=True)
        y = cbr(y, 16, "conv21d", transpose=True)
        y = up(y, 16, x12, "upconv1")
        y = cbr(y, 16, "conv12d", transpose=True)
        return ConvTranspose(self.label_nbr, 3, 1, 1, name="conv11d")(y)
