"""Cyclic temporal 1x1x1 mixing over T=4 frames, shared by SMOW_Net's
conv_trans_block_3d (models/SMOW_Net.py:104-139) and SMOW_Net_LW's decoder
blocks (models/SMOW_Net_LW.py:102-176).

frame_j_out = id_mix(F_j) + mix_{j+1}(F_{j+1})  (cyclic), where id_mix is
identity-initialised and each mix_i zero-initialised, so the block starts as
a per-frame identity. All five mixers are 1x1x1 convs == per-frame matmuls;
we evaluate them as two batched einsums (MXU) instead of ten sliced convs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils import torch_init

__all__ = ["CyclicTemporalMix"]


class CyclicTemporalMix(nn.Module):
    features: int
    use_bias: bool = True  # SMOW_Net uses biased mixers; LW uses bias=False

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """y: (B, 4, H, W, C) or T-folded (B, H, W, 4*C), same layout out."""
        C = self.features
        w_id = self.param("time_5_kernel", torch_init.temporal_identity, (1, 1, 1, C, C))
        # four per-frame mixers stacked: (4, C, C), zero-init
        w_mix = self.param("time_mix_kernel", torch_init.zeros, (4, C, C))
        if y.ndim == 4:
            # folded: one (4C, 4C) block matrix — out_j = id(F_j) +
            # mix_{j+1}(F_{j+1}): block (row=in frame i, col=out frame j)
            # is w_id at i==j plus w_mix[i] at i==(j+1)%4
            wid = w_id[0, 0, 0]
            zero = jnp.zeros_like(wid)
            rows = []
            for i in range(4):
                blocks = [wid if i == j else (w_mix[i] if i == (j + 1) % 4 else zero)
                          for j in range(4)]
                rows.append(jnp.concatenate(blocks, axis=1))
            M = jnp.concatenate(rows, axis=0)
            out = jnp.matmul(y, M.astype(y.dtype))
            if self.use_bias:
                b_id = self.param("time_5_bias", torch_init.uniform_fan_in_bias(C), (C,))
                b_mix = self.param("time_mix_bias", torch_init.uniform_fan_in_bias(C), (4, C))
                bias = jnp.concatenate([b_id + b_mix[(j + 1) % 4] for j in range(4)])
                out = out + bias.astype(out.dtype)
            return out
        y_id = jnp.einsum("bthwc,cd->bthwd", y, w_id[0, 0, 0])
        y_mix = jnp.einsum("bthwc,tcd->bthwd", y, w_mix)
        if self.use_bias:
            b_id = self.param("time_5_bias", torch_init.uniform_fan_in_bias(C), (C,))
            b_mix = self.param("time_mix_bias", torch_init.uniform_fan_in_bias(C), (4, C))
            y_id = y_id + b_id
            y_mix = y_mix + b_mix[None, :, None, None, :]
        # out_j = id(F_j) + mix_{j+1}(F_{j+1}) cyclically
        return y_id + jnp.roll(y_mix, shift=-1, axis=1)
