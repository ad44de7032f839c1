"""Cyclic temporal 1x1x1 mixing over T=4 frames, shared by SMOW_Net's
conv_trans_block_3d (models/SMOW_Net.py:104-139) and SMOW_Net_LW's decoder
blocks (models/SMOW_Net_LW.py:102-176).

frame_j_out = id_mix(F_j) + mix_{j+1}(F_{j+1})  (cyclic), where id_mix is
identity-initialised and each mix_i zero-initialised, so the block starts as
a per-frame identity. All five mixers are 1x1x1 convs == per-frame matmuls;
we evaluate them as two batched einsums (MXU) instead of ten sliced convs.

`fused_blocks()` exposes the mix as a (4, 4, C, C) block tensor so a caller
can compose it into a preceding linear op (ConvTransBlock3d folds it into
the transposed-conv kernel itself, filling all 128 MXU lanes on the
narrow-channel decoder stages).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils import torch_init

__all__ = ["CyclicTemporalMix"]


class CyclicTemporalMix(nn.Module):
    features: int
    use_bias: bool = True  # SMOW_Net uses biased mixers; LW uses bias=False

    def setup(self):
        C = self.features
        self.w_id = self.param(
            "time_5_kernel", torch_init.temporal_identity, (1, 1, 1, C, C))
        # four per-frame mixers stacked: (4, C, C), zero-init
        self.w_mix = self.param("time_mix_kernel", torch_init.zeros, (4, C, C))
        if self.use_bias:
            self.b_id = self.param(
                "time_5_bias", torch_init.uniform_fan_in_bias(C), (C,))
            self.b_mix = self.param(
                "time_mix_bias", torch_init.uniform_fan_in_bias(C), (4, C))

    def fused_blocks(self) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """The mix as a block tensor: (Mb, bias) with Mb (4, 4, C, C) where
        block (i, j) maps input frame i to output frame j —
        out_j = sum_i F_i @ Mb[i, j] (+ bias[j*C:(j+1)*C]). Mb[i, i] = id
        mixer, Mb[(j+1)%4, j] = mix_{j+1}, zero elsewhere."""
        C = self.features
        wid = self.w_id[0, 0, 0]
        zero = jnp.zeros_like(wid)
        Mb = jnp.stack([
            jnp.stack([wid if i == j else
                       (self.w_mix[i] if i == (j + 1) % 4 else zero)
                       for j in range(4)], axis=0)
            for i in range(4)], axis=0)
        bias = None
        if self.use_bias:
            bias = jnp.concatenate(
                [self.b_id + self.b_mix[(j + 1) % 4] for j in range(4)])
        return Mb, bias

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """y: (B, 4, H, W, C) or T-folded (B, H, W, 4*C), same layout out."""
        if y.ndim == 4:
            # folded: one (4C, 4C) block matrix — see fused_blocks()
            Mb, bias = self.fused_blocks()
            C = self.features
            M = Mb.transpose(0, 2, 1, 3).reshape(4 * C, 4 * C)
            out = jnp.matmul(y, M.astype(y.dtype))
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        y_id = jnp.einsum("bthwc,cd->bthwd", y, self.w_id[0, 0, 0])
        y_mix = jnp.einsum("bthwc,tcd->bthwd", y, self.w_mix)
        if self.use_bias:
            y_id = y_id + self.b_id
            y_mix = y_mix + self.b_mix[None, :, None, None, :]
        # out_j = id(F_j) + mix_{j+1}(F_{j+1}) cyclically
        return y_id + jnp.roll(y_mix, shift=-1, axis=1)
