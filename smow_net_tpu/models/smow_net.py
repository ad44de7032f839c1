"""SMOW_Net — the flagship bi-temporal change-detection model, TPU-native.

Faithful re-design of the reference architecture (models/SMOW_Net.py:8-101):
inflated ResNet-18 3D encoder over the stacked (T=2) image pair, an
optical-flow-warp (OFW) module expanding T=2 -> T=4, a token-attention
transformer encoder, a 3D U-Net decoder with cyclic temporal-mixing
transposed convs, a cross-attention transformer decoder over (H*W) queries,
and a sub-pixel classifier head.

Layouts are channels-last and, since round 2, **T-folded**: the encoder,
skip reduces, temporal lifts and the whole 3D U-Net decoder keep activations
as (B, H, W, T*C) (frame-major channels). Every temporally-dense conv then
runs as one block-banded 2-D conv with NO transpose sandwich, the temporal
mixers are single full-width matmuls, and BatchNorm sees frames through a
free (B,H,W,T,C) reshape — measured 2.4x on the big decoder convs (v5e).
The OFW warp and token attention run per-frame (unfolded); resizes are MXU
matmuls; the warp is a Pallas one-hot-matmul kernel (ops/pallas/warp.py).
Unlike the reference, nothing is hard-coded to 256x256 input — sizes are
derived from the traced shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv, ConvParams, CrossTransformerLayer, TransformerLayer, batch_norm
from ..nn.resnet3d import ResNet3D, unfold_t, fold_t
from ..ops import convops
from ..ops.pixel_shuffle import smow_shuffle
from ..ops.pooling import max_pool
from ..ops.resize import resize_linear
from ..ops.warp import flow_warp
from .temporal import CyclicTemporalMix

__all__ = ["SMOWNet", "OFW", "TokenTransformerEncoder",
           "PixelTransformerDecoder", "ofw_tokens_fused"]


def _bn_folded(bn: nn.Module, y: jnp.ndarray, train: bool, T: int) -> jnp.ndarray:
    B, H, W, TC = y.shape
    z = y.reshape(B, H, W, T, TC // T)
    z = bn(z, use_running_average=not train)
    return z.reshape(B, H, W, TC)


def _cat_folded(a: jnp.ndarray, b: jnp.ndarray, T: int) -> jnp.ndarray:
    """Per-frame channel concat of two T-folded tensors."""
    B, H, W, _ = a.shape
    za = a.reshape(B, H, W, T, -1)
    zb = b.reshape(B, H, W, T, -1)
    return jnp.concatenate([za, zb], axis=-1).reshape(B, H, W, -1)


def _lift24_folded(v: jnp.ndarray) -> jnp.ndarray:
    """Temporal lift T=2 -> T=4 (trilinear, align_corners=True) on a folded
    tensor: frames [F0, 2/3 F0 + 1/3 F1, 1/3 F0 + 2/3 F1, F1] — exactly the
    reference's F.interpolate weights (models/SMOW_Net.py:64-73), computed as
    lane-wide lerps with no transpose."""
    C = v.shape[-1] // 2
    f0 = v[..., :C]
    f1 = v[..., C:]
    c = 1.0 / 3.0
    m1 = (f0 * (1 - c) + f1 * c).astype(v.dtype)
    m2 = (f0 * c + f1 * (1 - c)).astype(v.dtype)
    return jnp.concatenate([f0, m1, m2, f1], axis=-1)


class BasicConv3d(nn.Module):
    """Conv3d + BN + ReLU (reference BasicConv3d, models/SMOW_Net.py:411-423).
    Accepts (B,T,H,W,C) or T-folded (B,H,W,T*C) (pointwise convs only)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    temporal: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if x.ndim == 5:
            y = Conv(self.features, self.kernel_size, self.stride, self.padding, name="conv")(x)
            y = batch_norm()(y, use_running_average=not train)
            return nn.relu(y)
        assert self.kernel_size == 1 and self.stride == 1 and self.padding == 0
        T = self.temporal
        B, H, W, TC = x.shape
        kernel, bias = ConvParams((1, 1, 1, TC // T, self.features), name="conv")()
        z = x.reshape(B, H, W, T, TC // T)
        z = jnp.matmul(z, kernel[0, 0, 0].astype(z.dtype)) + bias.astype(z.dtype)
        z = batch_norm()(z, use_running_average=not train)
        return nn.relu(z).reshape(B, H, W, T * self.features)


# OFW.flow lowering: the three depthwise stride-2 Conv3d + the 3x3x3 flow
# conv run on the T-FOLDED (B, H, W, T*C) layout as dense block-banded 2-D
# convs (the depthwise kernel densified to a diagonal block — same trick as
# the encoder's blockdiag@mix lowering), the trilinear lift degenerating to
# a per-frame bilinear resize (T: 2->2 is identity under align_corners).
# DEFAULT ON by measurement (tools/probe_flow_ab.py on-chip, bs16 256²
# bf16: infer 2.60 -> 2.09 ms, train 3.36 -> 2.97 ms at 83-89% of HBM
# peak; artifacts/bench_r04/flow_ab.txt).
_FLOW_FOLDED = True


def set_flow_folded(v: bool):
    global _FLOW_FOLDED
    _FLOW_FOLDED = v


# Token pooling lowering: frame-grouped (2 dots of 2L rows) vs per-frame
# (4 dots of L rows). A/B'd on chip round 5; default by measurement.
_POOL_GROUPED = False


def set_pool_grouped(v: bool):
    global _POOL_GROUPED
    _POOL_GROUPED = v


# Probed and REMOVED (tools/probe_head_ab.py, whole-model on-chip): an
# eval-mode classifier fold (head conv + sigmoid as the fused cross-attn
# kernel's epilogue) LOST on both models — smow_net infer 12.85 -> 13.24
# ms/b, smow_net_lw 9.72 -> 9.96 (artifacts/bench_r04/head_ab{,_lw}.txt).
# The separate head conv reads the (B, N, D) tensor XLA already has in
# flight and fuses with the shuffle; the epilogue instead serialized the
# classifier matmul into every layer-kernel tile.


class OFW(nn.Module):
    """Optical-flow warp (reference models/SMOW_Net.py:587-637).

    Input (B, 2, H, W, C) -> output (B, 4, H, W, C) = [F1, warp(F1), warp(F2), F2].
    Three depthwise strided 3D convs build a coarse context, trilinearly
    lifted back to input size; a 3x3x3 conv predicts a 2-channel flow per
    frame; each frame is bilinearly warped (border, align_corners=True).
    `flow()` exposes the flow field so the fused token path can move the
    warps onto the cheap side (see `ofw_tokens_fused`)."""

    inplane: int

    def setup(self):
        # ConvParams share the exact `<name>/{kernel,bias}` tree with the
        # reference-shaped Conv modules, so both flow lowerings and the
        # torch converter see identical parameters
        self.downs = [
            ConvParams((3, 3, 3, 1, self.inplane), name=f"down{i}_conv")
            for i in range(3)
        ]
        self.down_bns = [batch_norm(f"down{i}_bn") for i in range(3)]
        self.flow_make_p = ConvParams((3, 3, 3, 2 * self.inplane, 2),
                                      use_bias=False, name="flow_make")

    def _flow_5d(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        T, H, W = x.shape[1], x.shape[2], x.shape[3]
        y = x
        for cp, bn in zip(self.downs, self.down_bns):
            k, b = cp()
            y = convops.conv(y, k.astype(y.dtype), (1, 2, 2), 1, 1,
                             groups=self.inplane) + b.astype(y.dtype)
            y = nn.relu(bn(y, use_running_average=not train))
        # reference hard-codes size=(2,128,128) (models/SMOW_Net.py:607); we
        # use the actual input size — identical for the 256x256 recipe.
        y = resize_linear(y, (T, H, W), (1, 2, 3), align_corners=True)
        kf, _ = self.flow_make_p()
        return convops.conv(jnp.concatenate([x, y], axis=-1),
                            kf.astype(y.dtype), 1, 1)

    def _flow_folded(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        eye = jnp.eye(C)
        xf = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        y = xf
        for cp, bn in zip(self.downs, self.down_bns):
            k, b = cp()
            kd = eye[None, None, None].astype(k.dtype) * k[:, :, :, 0][:, :, :, None]
            Kf = convops.tdense_kernel(kd, T)
            y = convops.conv(y, Kf.astype(y.dtype), (2, 2), (1, 1))
            y = y + jnp.tile(b, T).astype(y.dtype)
            y = _bn_folded(bn, y, train, T)
            y = nn.relu(y)
        y = resize_linear(y, (H, W), (1, 2), align_corners=True)
        kf, _ = self.flow_make_p()
        out = convops.conv(_cat_folded(xf, y, T),
                           convops.tdense_kernel(kf, T).astype(y.dtype),
                           (1, 1), (1, 1))
        return out.reshape(B, H, W, T, 2).transpose(0, 3, 1, 2, 4)

    def flow(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """(B, 2, H, W, C) -> per-frame flow field (B, 2, H, W, 2)."""
        if _FLOW_FOLDED:
            return self._flow_folded(x, train)
        return self._flow_5d(x, train)

    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        flow = self.flow(x, train)
        # one batched warp over both frames: the (B, T) -> B*T reshape is a
        # contiguous no-op and frame/flow pairing is preserved element-wise
        w = flow_warp(x.reshape(B * T, H, W, C), flow.reshape(B * T, H, W, 2))
        w = w.reshape(B, T, H, W, C)
        return jnp.stack([x[:, 0], w[:, 0], w[:, 1], x[:, 1]], axis=1)


class TokenTransformerEncoder(nn.Module):
    """Per-timestep soft spatial token pooling + 1-layer MHSA
    (reference Transformer_Encoder, models/SMOW_Net.py:161-190).

    Input (B, 4, H, W, C) -> tokens (B, token_len, 4*C)."""

    in_chan: int = 32
    token_len: int = 8
    heads: int = 8

    def setup(self):
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (4, self.token_len, self.in_chan))
        self.conv_a = Conv(self.token_len, 1, name="conv_a")
        dim = 4 * self.in_chan
        self.transformer = TransformerLayer(dim, self.heads, dim, dim,
                                            name="transformer")

    def attention_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pointwise token-attention logits (any batch of frames)."""
        return self.conv_a(x)

    def finish(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 4, token_len, C) pooled tokens -> transformer output."""
        B = tokens.shape[0]
        tokens = tokens + self.pos_embedding[None]
        # concat timestep channels: (B, L, T*C) with t-major feature order
        tokens = tokens.transpose(0, 2, 1, 3).reshape(
            B, self.token_len, 4 * self.in_chan)
        return self.transformer(tokens)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        assert T == 4, "token encoder expects T == 4"
        # batch the per-timestep loop: fold T into batch (one conv, one einsum)
        xt = x.reshape(B * T, H, W, C)
        att = self.conv_a(xt).reshape(B, T, H * W, self.token_len)
        att = jax.nn.softmax(att, axis=2)  # softmax over spatial positions
        feats = x.reshape(B, T, H * W, C)
        return self.finish(jnp.einsum("btnl,btnc->btlc", att, feats))


def ofw_tokens_fused(ofw: OFW, tenc: TokenTransformerEncoder, x: jnp.ndarray,
                     train: bool) -> jnp.ndarray:
    """OFW + token pooling with the warps moved to the CHEAP side.

    The OFW output [F0, warp(F0), warp(F1), F1] is consumed only by the
    token encoder, whose per-frame use of a warped frame W(F) is
      att = softmax_n(conv_a(W(F)))     and     tok_l = sum_n att[n,l] W(F)[n].
    conv_a is pointwise-linear and border-mode bilinear weights sum to 1, so
    conv_a(W(F)) == W(conv_a(F)); and the pooled sum obeys the adjoint
    identity sum_n att[n] W(F)[n] == sum_m WT(att)[m] F[m]. Hence we warp
    the `token_len`-channel attention logits forward and scatter the
    softmaxed maps back (both C=8) instead of warping the C=32 features —
    half the one-hot-matmul work, bit-identical math up to fp rounding
    (reference behavior: models/SMOW_Net.py:612-637 + 161-190)."""
    from ..ops.warp import token_softmax_scatter

    B, T, H, W, C = x.shape
    L = tenc.token_len
    n = H * W
    flow = ofw.flow(x, train)                     # (B, 2, H, W, 2)
    xb = x.reshape(B * 2, H, W, C)
    fb = flow.reshape(B * 2, H, W, 2)
    a = tenc.attention_logits(xb)                 # (B*2, H, W, L) logits
    # softmax with the NORMALIZATION FOLDED OUT of the n=H*W axis: the
    # per-(frame, l) 1/Z scalar commutes through both the (linear) scatter
    # and the pooling einsum, so only exp(x - max) ever touches the 16k-
    # position tensors and the divide runs on the (B, L, C) tokens — one
    # fewer elementwise pass (fwd and bwd) over each (B, n, L) map, and the
    # stacked (B, 4, n, L) softmax tensor never materializes.
    # Frames 1,2: warp -> exp -> scatter. Backend chosen by measurement
    # (tools/probe_token_ab.py on-chip, artifacts/bench_r03/token_ab.txt):
    #   infer: fused single Pallas kernel 2.93 ms vs unfused 3.57 -> FUSED
    #   train: routed via ops.warp.token_softmax_scatter_train — the r4 A/B
    #   picked the unfused 2-kernel chain over fused-both-ways (7.90 vs
    #   9.27; the monolithic bwd pipelines worse at W*C=1024); round 5 adds
    #   the hybrid fused-fwd + split-bwd lowering, A/B'd the same way.
    stopmax = lambda v: v - jax.lax.stop_gradient(
        jnp.max(v.reshape(B * 2, n, L), axis=1)).reshape(B * 2, 1, 1, L)
    if train:
        from ..ops.warp import token_softmax_scatter_train

        ew, zaw = token_softmax_scatter_train(a, fb)
    else:
        ew, zaw = token_softmax_scatter(a, fb)
    ew = ew.reshape(B, 2, n, L)
    zaw = zaw.reshape(B, 2, L)
    ea = jnp.exp(stopmax(a))
    za = jnp.sum(ea.reshape(B, 2, n, L), axis=2)   # (B, 2, L)
    ea = ea.reshape(B, 2, n, L)
    f0 = x[:, 0].reshape(B, n, C)
    f1 = x[:, 1].reshape(B, n, C)
    # tiny clamp: with the shared-max shift, z can underflow to 0 when a
    # map's warped-logit spread exceeds ~87 (ops/warp.token_softmax_scatter
    # contract); the legacy per-warped-max shift guaranteed z >= 1
    tiny = jnp.asarray(1e-30, jnp.float32).astype(x.dtype)
    if _POOL_GROUPED:
        # frame-grouped pooling: ONE einsum per source frame with the two
        # destination frames' maps lane-concatenated — 2 dots of 2L=16 rows
        # instead of 4 dots of L=8 (the n=H*W contraction's MXU row
        # utilization doubles, and the bwd dot count halves). Same math.
        e0 = jnp.concatenate([ea[:, 0], ew[:, 0]], axis=-1)   # (B, n, 2L)
        e1 = jnp.concatenate([ew[:, 1], ea[:, 1]], axis=-1)
        t0 = jnp.einsum("bnl,bnc->blc", e0, f0)               # (B, 2L, C)
        t1 = jnp.einsum("bnl,bnc->blc", e1, f1)
        z0 = jnp.concatenate([za[:, 0], zaw[:, 0]], axis=-1)  # (B, 2L)
        z1 = jnp.concatenate([zaw[:, 1], za[:, 1]], axis=-1)
        t0 = t0 / jnp.maximum(z0, tiny)[..., None]
        t1 = t1 / jnp.maximum(z1, tiny)[..., None]
        tok = jnp.stack([t0[:, :L], t0[:, L:], t1[:, :L], t1[:, L:]], axis=1)
    else:
        pool = lambda e, f, z: (jnp.einsum("bnl,bnc->blc", e, f)
                                / jnp.maximum(z, tiny)[..., None])
        tok = jnp.stack([
            pool(ea[:, 0], f0, za[:, 0]), pool(ew[:, 0], f0, zaw[:, 0]),
            pool(ew[:, 1], f1, zaw[:, 1]), pool(ea[:, 1], f1, za[:, 1]),
        ], axis=1)                                 # (B, 4, L, C)
    return tenc.finish(tok)


class PixelTransformerDecoder(nn.Module):
    """Cross-attention of (H*W) pixel queries vs token memory (reference
    Transformer_Decoder, models/SMOW_Net.py:270-283). Input (B, 4, H, W, C)
    — or T-folded (B, H, W, 4*C) with `folded_input` — is flattened to
    (B, H*W, C*T) with channel-major order (torch `view(b, c*t, h, w)`
    semantics)."""

    in_chan: int = 128
    heads: int = 8
    folded_input: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        perm = None
        if self.folded_input:
            B, H, W, TC = x.shape
            T = 4
            C = TC // T
            # t-major folded channels -> c-major features: a fixed lane
            # permutation P[t*C+c, c*T+t] = 1, folded into the attention
            # layer (q-projection weights + one-hot residual matmul) so no
            # standalone transpose pass ever touches the 16k-pixel tensor.
            import numpy as np
            t_idx, c_idx = np.divmod(np.arange(TC), C)       # row = t*C+c
            cols = c_idx * T + t_idx
            p_np = np.zeros((TC, TC), np.float32)
            p_np[np.arange(TC), cols] = 1.0
            perm = jnp.asarray(p_np, dtype=x.dtype)
            q = x.reshape(B, H * W, TC)
        else:
            B, T, H, W, C = x.shape
            # (B,T,H,W,C) -> (B,H,W,C,T) -> (B, H*W, C*T): feature idx = c*T + t
            q = x.transpose(0, 2, 3, 4, 1).reshape(B, H * W, C * T)
        q = CrossTransformerLayer(
            self.in_chan, self.heads, dim_head=1, mlp_dim=self.in_chan * 2, name="layer0"
        )(q, m, perm=perm)
        return q.reshape(B, H, W, q.shape[-1])


# ConvTransBlock3d folded lowering: fuse the cyclic temporal mix INTO the
# transposed-conv kernel when the per-frame channel width would starve the
# MXU's 128 lanes. out_j = sum_i convT(x_i; K) @ Mb[i,j] == one dense
# T-folded convT with kernel Kf[.., i*Cin+c, j*F+g] = sum_f K[..,c,f]
# Mb[i,j,f,g] — 2x the per-frame FLOPs (8/16 frame blocks nonzero) but all
# 4F lanes live, and the separate mix matmul + unfold/fold disappear.
# Stages with F >= this threshold keep the per-frame form (lanes already
# saturated there; dense would just double the FLOPs).
_MIXFUSE_MAX_F = 64


def set_convt_mixfuse_max_f(v: int):
    """A/B toggle: fuse convT+mix for stages with features <= v (0 = off)."""
    global _MIXFUSE_MAX_F
    _MIXFUSE_MAX_F = v


class ConvTransBlock3d(nn.Module):
    """Spatial ConvTranspose (x2 upsample) + cyclic temporal 1x1x1 mixing over
    T=4 + BN + LeakyReLU(0.2) (reference conv_trans_block_3d,
    models/SMOW_Net.py:104-139). frame_j_out = id_mix(F_j) + mix_{j+1}(F_{j+1})
    cyclically, with id_mix identity-init and mix_i zero-init.
    Accepts (B,4,H,W,C) or T-folded (B,H,W,4C). Folded, narrow stages
    (features <= _MIXFUSE_MAX_F) run ONE dense T-folded convT with the mix
    composed into the kernel (see above); wide stages run the spatial convT
    per-frame batched (grouped transposed convs measured slower on v5e) and
    apply the mix as a folded matmul."""

    features: int
    spatial_kernel: int = 5
    spatial_padding: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        k, p = self.spatial_kernel, self.spatial_padding
        folded = x.ndim == 4
        T = 4
        F = self.features
        mix = CyclicTemporalMix(F, use_bias=True, name="tmix")
        if folded:
            B, H, W, TC = x.shape
            Cin = TC // T
            kernel, bias = ConvParams((1, k, k, Cin, F),
                                      transpose_fan=True, name="spatial")()
            if F <= _MIXFUSE_MAX_F:
                Mb, mbias = mix.fused_blocks()
                Kf = jnp.einsum("hwcf,ijfg->hwicjg", kernel[0], Mb)
                Kf = Kf.reshape(k, k, T * Cin, T * F)
                btot = (jnp.einsum("f,ijfg->jg", bias, Mb).reshape(T * F)
                        + mbias)
                y = convops.conv_transpose(x, Kf.astype(x.dtype),
                                           (2, 2), (p, p), (1, 1))
                y = y + btot.astype(y.dtype)
            else:
                # Spatial convT lowering within the per-frame form: dilated
                # convT everywhere, fwd AND bwd. Both phase-packed rewrites
                # were probed in place, REJECTED, and deleted — measured
                # verdicts in ops/convops.py (above causal_conv1d).
                xu = unfold_t(x, T).reshape(B * T, H, W, Cin)
                y = convops.conv_transpose(xu, kernel[0].astype(x.dtype),
                                           (2, 2), (p, p), (1, 1))
                y = fold_t(y.reshape(B, T, y.shape[1], y.shape[2], F))
                y = y + jnp.tile(bias, T).astype(y.dtype)
                y = mix(y)
        else:
            from ..nn.layers import ConvTranspose

            y = ConvTranspose(
                self.features, (1, k, k), (1, 2, 2), (0, p, p), (0, 1, 1), name="spatial"
            )(x)
            y = mix(y)
        if folded:
            y = _bn_folded(batch_norm(), y, train, T)
        else:
            y = batch_norm()(y, use_running_average=not train)
        return nn.leaky_relu(y, 0.2)


# ConvBlock23d skip-concat lowering: conv1 reads the decoder stream and the
# skip tensor as SEPARATE convs (conv(concat(y, f)) == conv(y; k[:Cy]) +
# conv(f; k[Cy:]) by linearity of the contraction) so the concatenated
# tensor — up to 134 MB at the 128² stage — never materializes in HBM.
# Param tree unchanged (the declared kernel is sliced at trace time).
# DEFAULTS SET BY MEASUREMENT (tools/probe_dec_catsplit.py on-chip,
# artifacts/bench_r03/dec_catsplit.txt, bs16 256² bf16, lifts in-graph):
#   whole decoder train  off 16.74 ms | split 12.75 | liftfold 12.41
#   whole decoder infer  off 15.98 ms | split 12.61 | liftfold 11.91
_CATSPLIT = True
# Second rung (implies the split): the skip operand arrives PRE-LIFT
# (T=2-folded) and conv1 contracts it with the lift-composed kernel
# (ops/convops.tdense_lift24_kernel) — the T=4 lifted skip (67 MB at the
# 128² stage) never materializes. Wins on-chip (see above): default ON.
_LIFTFOLD = True


def set_convblock_catsplit(v: bool, liftfold: bool = False):
    global _CATSPLIT, _LIFTFOLD
    _CATSPLIT = v
    _LIFTFOLD = liftfold and v


class ConvBlock23d(nn.Module):
    """Two 3x3x3 convs with BN; LeakyReLU only between them (reference
    conv_block_2_3d, models/SMOW_Net.py:142-156 — no final activation).
    Accepts (B,4,H,W,C) or T-folded (B,H,W,4C) — folded runs the block-banded
    tdense kernels directly, with no transposes. The folded form also accepts
    a PAIR (decoder stream, skip) and contracts each addend separately
    instead of materializing their per-frame channel concat (see _CATSPLIT)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool) -> jnp.ndarray:
        pair = isinstance(x, tuple)
        if pair and not _CATSPLIT:
            x = _cat_folded(x[0], x[1], 4)
            pair = False
        if not pair and x.ndim == 5:
            y = Conv(self.features, 3, 1, 1, name="conv1")(x)
            y = batch_norm("bn1")(y, use_running_average=not train)
            y = nn.leaky_relu(y, 0.2)
            y = Conv(self.features, 3, 1, 1, name="conv2")(y)
            return batch_norm("bn2")(y, use_running_average=not train)
        T = 4
        if pair:
            a, b = x
            Ca = a.shape[-1] // T
            # under _LIFTFOLD the skip arrives T=2-folded (pre-lift)
            Cb = b.shape[-1] // (2 if _LIFTFOLD else T)
            Cin = Ca + Cb
            k1, b1 = ConvParams((3, 3, 3, Cin, self.features), name="conv1")()
            # stream and skip can trace at different dtypes under init
            # (f32 params upstream vs bf16 inputs): contract both at the
            # promoted dtype so each conv sees matching operand dtypes
            dt = jnp.promote_types(a.dtype, b.dtype)
            a, b, k1 = a.astype(dt), b.astype(dt), k1.astype(dt)
            y = convops.conv3d_folded(a, k1[:, :, :, :Ca], T)
            if _LIFTFOLD:
                y = y + convops.conv3d_folded_lift24(b, k1[:, :, :, Ca:])
            else:
                y = y + convops.conv3d_folded(b, k1[:, :, :, Ca:], T)
        else:
            Cin = x.shape[-1] // T
            k1, b1 = ConvParams((3, 3, 3, Cin, self.features), name="conv1")()
            y = convops.conv3d_folded(x, k1.astype(x.dtype), T)
        y = y + jnp.tile(b1, T).astype(y.dtype)
        y = _bn_folded(batch_norm("bn1"), y, train, T)
        y = nn.leaky_relu(y, 0.2)
        k2, b2 = ConvParams((3, 3, 3, self.features, self.features), name="conv2")()
        y = convops.conv3d_folded(y, k2.astype(y.dtype), T)
        y = y + jnp.tile(b2, T).astype(y.dtype)
        return _bn_folded(batch_norm("bn2"), y, train, T)


class SMOWNet(nn.Module):
    """Full SMOW_Net. __call__(x1, x2, train) with x1, x2: (B, H, W, 3) in
    [normalized] RGB; returns change probabilities (B, H, W, 1)."""

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # T-folded pair: (B, H, W, 6) — no stack/transpose at all
        xf = jnp.concatenate([x1, x2], axis=-1)
        resnet = ResNet3D(name="resnet")
        x0, (f1, f2, f3, f4) = resnet(xf, train)  # all T=2-folded

        x0 = BasicConv3d(32, name="Conv3d")(x0, train)
        x0u = unfold_t(x0, 2)  # the OFW warps per frame
        tokens = ofw_tokens_fused(
            OFW(32, name="OFW"),
            TokenTransformerEncoder(32, name="Transformer_Encoder"), x0u, train)

        f1 = BasicConv3d(32, name="Conv3d1")(f1, train)
        f2 = BasicConv3d(64, name="Conv3d2")(f2, train)
        f3 = BasicConv3d(128, name="Conv3d3")(f3, train)
        f4 = BasicConv3d(256, name="Conv3d4")(f4, train)

        if _LIFTFOLD:
            # skips stay T=2-folded — ConvBlock23d contracts them with the
            # lift-composed kernel; only the decoder seed needs the lift
            y = max_pool(_lift24_folded(f4), (2, 2), (2, 2))
        else:
            x0, f1, f2, f3, f4 = map(_lift24_folded, (x0, f1, f2, f3, f4))
            y = max_pool(f4, (2, 2), (2, 2))
        y = ConvTransBlock3d(256, name="C3DT1")(y, train)
        y = ConvBlock23d(128, name="C3D1")((y, f4), train)
        y = ConvTransBlock3d(128, name="C3DT2")(y, train)
        y = ConvBlock23d(64, name="C3D2")((y, f3), train)
        y = ConvTransBlock3d(64, name="C3DT3")(y, train)
        y = ConvBlock23d(64, name="C3D3")((y, f2), train)
        y = ConvTransBlock3d(64, name="C3DT4")(y, train)
        y = ConvBlock23d(32, name="C3D4")((y, f1), train)
        y = ConvTransBlock3d(32, name="C3DT5")(y, train)
        y = ConvBlock23d(32, name="C3D5")((y, x0), train)

        # classifier declared layout-free (ConvParams) so the torch
        # converter sees the same `classifier_conv/kernel` tree as Conv(4, 1)
        kc, _ = ConvParams((1, 1, 128, 4), use_bias=False,
                           name="classifier_conv")()
        y = PixelTransformerDecoder(128, folded_input=True,
                                    name="Transformer_Decoder")(y, tokens)
        y = convops.conv(y, kc.astype(y.dtype))
        # sigmoid before the sub-pixel shuffle (elementwise, commutes with the
        # permutation): the post-shuffle tensor is (B, 2H, 2W, 1) whose 1-wide
        # feature axis wastes 127/128 VPU lanes — measured 10x on v5e
        return smow_shuffle(nn.sigmoid(y), 2)
