"""RS-Mamba (RSM_CD) — omnidirectional (8-direction) selective-scan SSM for
change detection. Parity target: reference compare/rs_mamba.py:1072-1361
(recipe train.py:117: drop_path 0.2, dims 96, depths [2,2,9,2], d_state 16,
ssm_ratio 2.0, mlp_ratio 4.0, downsample v3, patchembed v2).

The OSSM's 8-direction scan (compare/rs_mamba.py:241-383, k_group=8
:704) maps to ops/cross_scan.cross_scan8 (axis-aligned + diagonal traversals
as static permutations). Siamese encoder, per-scale concat-fuse, nearest-up
decoder, 2-class head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Conv, batch_norm
from ...nn.ssm import VSSBlock
from ...ops.resize import resize_linear, resize_nearest

__all__ = ["RSMCD"]

# Siamese-encode batching A/B (see the call site): True = one (2B)-batched
# encoder pass, False = two sequential passes (the reference's structure).
_ENC_2B = True


def set_enc_2b(v: bool):
    global _ENC_2B
    _ENC_2B = v



class RSMCD(nn.Module):
    depths: tuple = (2, 2, 9, 2)
    dims: tuple = (96, 192, 384, 768)
    drop_path_rate: float = 0.2
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        import numpy as np

        dims = list(self.dims)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # patch embed v2 (two stride-2 convs)
        pe = [
            Conv(dims[0] // 2, 3, 2, 1, name="patch_embed_conv1"),
            nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm1"),
            Conv(dims[0], 3, 2, 1, name="patch_embed_conv2"),
            nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm2"),
        ]

        def embed(v):
            v = pe[0](v)
            v = pe[1](v)
            v = nn.gelu(v, approximate=False)
            v = pe[2](v)
            return pe[3](v)

        # encoder stages: downsample (v3) BEFORE blocks for stages 1..3
        downs = [
            (Conv(dims[i], 3, 2, 1, name=f"down{i}_conv"),
             nn.LayerNorm(epsilon=1e-5, name=f"down{i}_norm"))
            for i in range(1, 4)
        ]
        stage_blocks = []
        cur = 0
        for i, (dim, depth) in enumerate(zip(dims, self.depths)):
            stage_blocks.append([
                VSSBlock(dim, float(dpr[cur + j]), self.ssm_d_state, self.ssm_ratio,
                         mlp_ratio=self.mlp_ratio, k_group=8,
                         remat=self.use_checkpoint, name=f"enc{i}_block{j}")
                for j in range(depth)
            ])
            cur += depth

        def encode(v):
            v = embed(v)
            feats = []
            for i, blocks in enumerate(stage_blocks):
                if i > 0:
                    conv, norm = downs[i - 1]
                    v = norm(conv(v))
                for blk in blocks:
                    v = blk(v, train)
                feats.append(v)
            return feats

        # Siamese encode: the encoder is LayerNorm-only (no batch-coupled
        # stats), so a single (2B)-batched pass is numerically exact —
        # A/B-toggled (tools/probe_mamba_2b.py): the r3 change shipped
        # unbenched for this model and the r4 re-records came in BELOW the
        # pre-change baseline (infer 97.7 vs 109.5).
        if _ENC_2B:
            B = x1.shape[0]
            f12 = encode(jnp.concatenate([x1, x2], axis=0))
            f1 = [f[:B] for f in f12]
            f2 = [f[B:] for f in f12]
        else:
            f1 = encode(x1)
            f2 = encode(x2)

        def fuse(i, a, b):
            y = Conv(dims[i], 1, use_bias=False, name=f"fuse_block{i + 1}")(
                jnp.concatenate([a, b], -1))
            y = batch_norm(f"fuse_bn{i + 1}")(y, use_running_average=not train)
            return nn.relu(y)

        fs = [fuse(i, a, b) for i, (a, b) in enumerate(zip(f1, f2))]

        def decode(i, de, en):
            de = resize_nearest(de, (de.shape[1] * 2, de.shape[2] * 2), (1, 2))
            y = Conv(dims[i], 1, use_bias=False, name=f"decoder_block{i + 1}")(
                jnp.concatenate([de, en], -1))
            y = batch_norm(f"decoder_bn{i + 1}")(y, use_running_average=not train)
            return nn.relu(y)

        d3 = decode(2, fs[3], fs[2])
        d2 = decode(1, d3, fs[1])
        d1 = decode(0, d2, fs[0])

        y = Conv(dims[0] // 2, 3, 1, 1, name="up_conv1")(d1)
        y = batch_norm("up_bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = resize_linear(y, (y.shape[1] * 2, y.shape[2] * 2), (1, 2), align_corners=True)
        y = Conv(8, 3, 1, 1, name="up_conv2")(y)
        y = batch_norm("up_bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = resize_linear(y, (y.shape[1] * 2, y.shape[2] * 2), (1, 2), align_corners=True)
        return Conv(2, 7, 1, 3, name="conv_out_change")(y)
