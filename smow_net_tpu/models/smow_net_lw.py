"""SMOW_Net_LW — lightweight variant (reference models/SMOW_Net_LW.py:9-98):
siamese (weight-shared) MobileNetV2 2D backbone run on each image, per-stage
stacking into T=2 volumes, the same OFW/token-transformer scheme at inplane
16, and a slimmer decoder whose blocks use (1,3,3) spatial convs plus
bias-free cyclic temporal mixing.

TPU layout (round 3): the decoder runs **T-folded** (B, H, W, T*C) like the
flagship — per-frame channel widths here are 16-320, mostly under the MXU's
128 lanes, so the folded form with the cyclic mix composed INTO the conv /
transposed-conv kernels (narrow stages, `_MIXFUSE_MAX_F` gate shared with
models/smow_net.py) keeps all lanes live and drops the mix matmuls and
fold/unfold transposes. At eval the siamese backbone runs ONCE on the
(2B)-batched image pair — exact with BN running stats; train keeps the
reference's two sequential passes for batch-stat parity. The sigmoid runs
before `smow_shuffle` (elementwise commutes with the permutation; the
post-shuffle (B, 2H, 2W, 1) tensor wastes 127/128 VPU lanes)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvParams
from ..nn.layers import batch_norm
from ..nn.mobilenetv2 import MobileNetV2
from ..nn.resnet3d import unfold_t
from ..ops import convops
from ..ops.pixel_shuffle import smow_shuffle
from ..ops.pooling import max_pool
from . import smow_net as _sn
from .smow_net import (OFW, PixelTransformerDecoder, TokenTransformerEncoder,
                       _bn_folded, _cat_folded, _lift24_folded,
                       ofw_tokens_fused)
from .temporal import CyclicTemporalMix

__all__ = ["SMOWNetLW"]


class ConvTransBlockLW(nn.Module):
    """(1,3,3) ConvTranspose x2-upsample + bias-free cyclic temporal mix + BN
    + LeakyReLU(0.2) (reference models/SMOW_Net_LW.py:102-137). T-folded
    input (B, H, W, 4*Cin); narrow stages (features <= the shared
    `_MIXFUSE_MAX_F` gate) compose the mix into ONE dense T-folded convT
    kernel (same identity as models/smow_net.py::ConvTransBlock3d)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        T, F = 4, self.features
        mix = CyclicTemporalMix(F, use_bias=False, name="tmix")
        B, H, W, TC = x.shape
        Cin = TC // T
        kernel, bias = ConvParams((1, 3, 3, Cin, F),
                                  transpose_fan=True, name="spatial")()
        if F <= _sn._MIXFUSE_MAX_F:
            Mb, _ = mix.fused_blocks()
            Kf = jnp.einsum("hwcf,ijfg->hwicjg", kernel[0], Mb)
            Kf = Kf.reshape(3, 3, T * Cin, T * F)
            btot = jnp.einsum("f,ijfg->jg", bias, Mb).reshape(T * F)
            y = convops.conv_transpose(x, Kf.astype(x.dtype),
                                       (2, 2), (1, 1), (1, 1))
            y = y + btot.astype(y.dtype)
        else:
            xu = unfold_t(x, T).reshape(B * T, H, W, Cin)
            y = convops.conv_transpose(xu, kernel[0].astype(x.dtype),
                                       (2, 2), (1, 1), (1, 1))
            Ho, Wo = y.shape[1], y.shape[2]
            y = y.reshape(B, T, Ho, Wo, F).transpose(0, 2, 3, 1, 4)
            y = y.reshape(B, Ho, Wo, T * F) + jnp.tile(bias, T).astype(x.dtype)
            y = mix(y)
        y = _bn_folded(batch_norm(), y, train, T)
        return nn.leaky_relu(y, 0.2)


class ConvBlockLW(nn.Module):
    """(1,3,3) conv + bias-free cyclic temporal mix + BN + LeakyReLU(0.2)
    (reference models/SMOW_Net_LW.py:140-176), T-folded; narrow stages fuse
    the mix into a dense block conv kernel.

    Narrow stages also accept a PAIR (decoder stream, skip): the per-frame
    concat never materializes (conv linearity, models/smow_net._CATSPLIT)
    and under _LIFTFOLD the skip arrives PRE-LIFT (T=2-folded) with the
    fixed trilinear T=2->4 lift composed into its kernel half — the (1,3,3)
    conv has no temporal taps, so the composition is just
    Kb'[.., s*C+c, ..] = sum_i L24[i, s] Kb[.., i*C+c, ..]."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool) -> jnp.ndarray:
        T, F = 4, self.features
        mix = CyclicTemporalMix(F, use_bias=False, name="tmix")
        pair = isinstance(x, tuple)
        if pair and not (_sn._CATSPLIT and F <= _sn._MIXFUSE_MAX_F):
            a, b = x
            if _sn._LIFTFOLD:                    # skip arrives pre-lift
                b = _lift24_folded(b)
            x = _cat_folded(a, b, T)
            pair = False
        if pair:
            a, b = x
            Ca = a.shape[-1] // T
            lifted = not _sn._LIFTFOLD
            Cb = b.shape[-1] // (T if lifted else 2)
            kernel, bias = ConvParams((1, 3, 3, Ca + Cb, F), name="spatial")()
            Mb, _ = mix.fused_blocks()
            dt = jnp.promote_types(a.dtype, b.dtype)
            a, b = a.astype(dt), b.astype(dt)
            Kfa = jnp.einsum("hwcf,ijfg->hwicjg", kernel[0][:, :, :Ca], Mb)
            Kfa = Kfa.reshape(3, 3, T * Ca, T * F)
            Kfb = jnp.einsum("hwcf,ijfg->hwicjg", kernel[0][:, :, Ca:], Mb)
            if not lifted:
                c = 1.0 / 3.0
                L24 = jnp.asarray([[1.0, 0.0], [1 - c, c], [c, 1 - c],
                                   [0.0, 1.0]], Kfb.dtype)
                Kfb = jnp.einsum("is,hwicjg->hwscjg", L24, Kfb)
                Kfb = Kfb.reshape(3, 3, 2 * Cb, T * F)
            else:
                Kfb = Kfb.reshape(3, 3, T * Cb, T * F)
            btot = jnp.einsum("f,ijfg->jg", bias, Mb).reshape(T * F)
            y = (convops.conv(a, Kfa.astype(dt), 1, 1)
                 + convops.conv(b, Kfb.astype(dt), 1, 1)
                 + btot.astype(dt))
            y = _bn_folded(batch_norm(), y, train, T)
            return nn.leaky_relu(y, 0.2)
        B, H, W, TC = x.shape
        Cin = TC // T
        kernel, bias = ConvParams((1, 3, 3, Cin, F), name="spatial")()
        if F <= _sn._MIXFUSE_MAX_F:
            Mb, _ = mix.fused_blocks()
            Kf = jnp.einsum("hwcf,ijfg->hwicjg", kernel[0], Mb)
            Kf = Kf.reshape(3, 3, T * Cin, T * F)
            btot = jnp.einsum("f,ijfg->jg", bias, Mb).reshape(T * F)
            y = convops.conv(x, Kf.astype(x.dtype), 1, 1) + btot.astype(x.dtype)
        else:
            xu = unfold_t(x, T).reshape(B * T, H, W, Cin)
            y = convops.conv(xu, kernel[0].astype(x.dtype), 1, 1)
            y = y.reshape(B, T, H, W, F).transpose(0, 2, 3, 1, 4)
            y = y.reshape(B, H, W, T * F) + jnp.tile(bias, T).astype(x.dtype)
            y = mix(y)
        y = _bn_folded(batch_norm(), y, train, T)
        return nn.leaky_relu(y, 0.2)


class SMOWNetLW(nn.Module):
    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        backbone = MobileNetV2(name="backbone")
        if train:
            # two passes: BN batch stats computed per image, like the
            # reference's sequential siamese calls
            taps1 = backbone(x1, True)
            taps2 = backbone(x2, True)
        else:
            # eval: BN uses running stats, so one (2B)-batched pass is
            # numerically exact and halves the per-op overhead
            B = x1.shape[0]
            taps = backbone(jnp.concatenate([x1, x2], axis=0), False)
            taps1 = [t[:B] for t in taps]
            taps2 = [t[B:] for t in taps]

        # per-stage T=2 volumes, built directly T-folded (B, H, W, 2C)
        x0f, f1, f2, f3, f4 = [
            jnp.concatenate([a, b], axis=-1) for a, b in zip(taps1, taps2)
        ]

        tokens = ofw_tokens_fused(
            OFW(16, name="OFW"),
            TokenTransformerEncoder(16, name="Transformer_Encoder"),
            unfold_t(x0f, 2), train)

        if _sn._LIFTFOLD:
            # skips stay T=2-folded; ConvBlockLW composes the lift into the
            # skip kernel half (narrow stages) — only the seed is lifted
            y = max_pool(_lift24_folded(f4), (2, 2), (2, 2))
        else:
            x0f, f1, f2, f3, f4 = map(
                _lift24_folded, (x0f, f1, f2, f3, f4))
            y = max_pool(f4, (2, 2), (2, 2))
        y = ConvTransBlockLW(320, name="C3DT1")(y, train)
        y = ConvBlockLW(160, name="C3D1")((y, f4), train)
        y = ConvTransBlockLW(160, name="C3DT2")(y, train)
        y = ConvBlockLW(64, name="C3D2")((y, f3), train)
        y = ConvTransBlockLW(64, name="C3DT3")(y, train)
        y = ConvBlockLW(32, name="C3D3")((y, f2), train)
        y = ConvTransBlockLW(32, name="C3DT4")(y, train)
        y = ConvBlockLW(28, name="C3D4")((y, f1), train)
        y = ConvTransBlockLW(28, name="C3DT5")(y, train)
        y = ConvBlockLW(16, name="C3D5")((y, x0f), train)

        kc, _ = ConvParams((1, 1, 64, 4), use_bias=False,
                           name="classifier_conv")()
        y = PixelTransformerDecoder(64, folded_input=True,
                                    name="Transformer_Decoder")(y, tokens)
        y = convops.conv(y, kc.astype(y.dtype))
        return smow_shuffle(nn.sigmoid(y), 2)
