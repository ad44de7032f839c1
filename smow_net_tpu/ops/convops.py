"""Functional N-D convolution helpers (channels-last) with exact PyTorch
shape/padding semantics, including `ConvTranspose*d`'s `output_padding`
(reference: models/SMOW_Net.py:107 uses ConvTranspose3d(k=(1,5,5), s=(1,2,2),
p=(0,2,2), output_padding=(0,1,1))).

Kernels are stored in forward-conv layout `(*spatial, in/groups, out)` so
every call lowers to one `lax.conv_general_dilated` (MXU-friendly); transposed
convolution is expressed as input-dilated convolution with a spatially
flipped kernel — the torch->jax weight converter performs the flip/transpose
once at load time, never at step time.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv", "conv_transpose", "to_tuple", "causal_conv1d",
           "set_conv3d_impl", "tdense_kernel", "tsplit_kernels",
           "conv3d_folded", "tdense_lift24_kernel", "conv3d_folded_lift24"]

# 3-D convs with a short temporal kernel admit two exact rewrites:
#   "decomposed" — kt batched 2-D convs over (B*T) frames + temporal shifts
#     (measured SLOWER than native on v5e, tools/probe_conv3d.py);
#   "tdense"     — fold T into channels with a block-banded dense
#     (kh, kw, T*Cin, T*Cout) 2-D kernel. Output lanes go from Cout (often
#     32 = 25% of the MXU's 128) to T*Cout; measured 1.2-2.3x on v5e at
#     the decoder shapes and FLOP-neutral at T=2 (tools/probe_conv3d_tfold.py).
# "auto" uses tdense when the rewrite applies (unit temporal stride/dilation,
# 'same' temporal padding, ungrouped, small T).
_CONV3D_IMPL = "auto"


def set_conv3d_impl(name: str):
    assert name in ("auto", "xla", "decomposed", "tdense", "tsplit"), name
    global _CONV3D_IMPL
    _CONV3D_IMPL = name


def tdense_kernel(kernel: jnp.ndarray, T: int) -> jnp.ndarray:
    """Block-banded T-folded kernel: (kt, kh, kw, Cin, Cout) ->
    (kh, kw, T*Cin, T*Cout) so a temporal-kernel 3-D conv runs as ONE 2-D
    conv on frame-major-folded (B, H, W, T*C) activations (unit temporal
    stride/dilation, 'same' temporal padding)."""
    kt, kh, kw, Cin, Cout = kernel.shape
    half = kt // 2
    K2 = jnp.zeros((kh, kw, T * Cin, T * Cout), kernel.dtype)
    for to in range(T):
        for dt in range(kt):
            ti = to + dt - half
            if 0 <= ti < T:
                K2 = K2.at[:, :, ti * Cin:(ti + 1) * Cin,
                           to * Cout:(to + 1) * Cout].set(kernel[dt])
    return K2


def tdense_lift24_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(kt, kh, kw, Cin, Cout) -> (kh, kw, 2*Cin, 4*Cout): the T=4 tdense
    banded kernel with the fixed trilinear T=2->4 temporal lift
    (align_corners frames [F0, (2F0+F1)/3, (F0+2F1)/3, F1], see
    models/smow_net._lift24_folded) composed in, so the conv reads the
    PRE-LIFT (B, H, W, 2*Cin) tensor directly: out[j] = sum_t band[j,t]
    (sum_s L[t,s] u[s]) = sum_s (sum_t band[j,t] L[t,s]) u[s]. Same MAC
    count as the banded T=4 form (the lift densifies the 8/16 band into
    8 T-blocks of a (2 -> 4) map) but the lifted tensor never exists."""
    kt, kh, kw, Cin, Cout = kernel.shape
    half = kt // 2
    c = 1.0 / 3.0
    L = ((1.0, 0.0), (1 - c, c), (c, 1 - c), (0.0, 1.0))  # (T4, S2)
    K2 = jnp.zeros((kh, kw, 2 * Cin, 4 * Cout), kernel.dtype)
    for to in range(4):
        for dt in range(kt):
            ti = to + dt - half
            if not 0 <= ti < 4:
                continue
            for s in range(2):
                w = L[ti][s]
                if w:
                    K2 = K2.at[:, :, s * Cin:(s + 1) * Cin,
                               to * Cout:(to + 1) * Cout].add(
                                   w * kernel[dt])
    return K2


def conv3d_folded_lift24(x2: jnp.ndarray, kernel: jnp.ndarray,
                         stride=(1, 1), pad=(1, 1)) -> jnp.ndarray:
    """conv3d_folded(lift24(x2), kernel, T=4) without materializing the
    lift: x2 is the T=2-folded (B, H, W, 2*Cin) tensor."""
    return conv(x2, tdense_lift24_kernel(kernel), stride, pad)


def tsplit_kernels(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a (3, kh, kw, Cin, Cout) temporal-banded kernel for T=4 into
    two contiguous-slab 2-D kernels (kh, kw, 3*Cin, 2*Cout): K_A maps input
    frames {0,1,2} to output frames {0,1}, K_B maps {1,2,3} to {2,3}. Each
    half has one zero block of six, so the pair executes 9*2*(3Cin)*(2Cout)
    = 108*Cin*Cout MACs vs tdense's 144 (both vs 90 useful) while keeping
    contiguous lane slabs and full contraction width."""
    kt, kh, kw, Cin, Cout = kernel.shape
    assert kt == 3, kt

    def build(to0, ti0):
        K = jnp.zeros((kh, kw, 3 * Cin, 2 * Cout), kernel.dtype)
        for j, to in enumerate((to0, to0 + 1)):
            for ti in range(ti0, ti0 + 3):
                dt = ti - to + 1  # y[to] takes tap K[dt] from frame to+dt-1
                if 0 <= dt < 3:
                    K = K.at[:, :, (ti - ti0) * Cin:(ti - ti0 + 1) * Cin,
                             j * Cout:(j + 1) * Cout].set(kernel[dt])
        return K

    return build(0, 0), build(2, 1)


def conv3d_folded(x: jnp.ndarray, kernel: jnp.ndarray, T: int,
                  stride=(1, 1), pad=(1, 1)) -> jnp.ndarray:
    """3-D conv with unit temporal stride/dilation and 'same' temporal
    padding on a T-FOLDED (B, H, W, T*Cin) tensor; kernel
    (kt, kh, kw, Cin, Cout). Default: ONE tdense block-banded conv. The
    two-slab banded split ("tsplit": 25% fewer MACs, contiguous lane slabs)
    measured SLOWER on v5e at the decoder shapes (8.67 vs 7.32 ms for the
    5-stage decoder, MFU 32 -> 21%) — the off-boundary channel slices
    relayout and the two convs + concat lose XLA's single-conv fusion —
    so it stays opt-in for future re-evaluation."""
    kt = kernel.shape[0]
    dt = x.dtype
    if _CONV3D_IMPL == "tsplit" and T == 4 and kt == 3:
        Cin = kernel.shape[3]
        ka, kb = tsplit_kernels(kernel)
        pads = [(pad[0], pad[0]), (pad[1], pad[1])]
        ya = lax.conv_general_dilated(
            x[..., :3 * Cin], ka, stride, pads,
            dimension_numbers=_dim_numbers(2), preferred_element_type=dt)
        yb = lax.conv_general_dilated(
            x[..., Cin:], kb, stride, pads,
            dimension_numbers=_dim_numbers(2), preferred_element_type=dt)
        return jnp.concatenate([ya, yb], axis=-1)
    return conv(x, tdense_kernel(kernel, T), stride, pad)


def _conv3d_tdense(x, kernel, stride, pad, dilation):
    """Exact T-into-channels rewrite (see module comment). The extra
    multiply-adds against the static zero blocks cost (T*kt - #bands)/T*kt
    more FLOPs (T=4, kt=3: 1.6x; T=2: none) but run at full lane width."""
    B, T, H, W, Cin = x.shape
    kt, kh, kw, _, Cout = kernel.shape
    K2 = tdense_kernel(kernel, T)
    xt = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * Cin)
    y = lax.conv_general_dilated(
        xt, K2, window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=dilation, dimension_numbers=_dim_numbers(2),
        preferred_element_type=x.dtype)
    Ho, Wo = y.shape[1], y.shape[2]
    return y.reshape(B, Ho, Wo, T, Cout).transpose(0, 3, 1, 2, 4)


def _conv3d_decomposed(x, kernel, stride, pad, dilation, groups):
    """Exact rewrite of a (kt, kh, kw) conv with stride_t=1, dil_t=1,
    pad_t=kt//2 as kt 2-D convs over B*T frames + temporal shifts."""
    B, T, H, W, C = x.shape
    kt = kernel.shape[0]
    xt = x.reshape(B * T, H, W, C)
    half = kt // 2
    out = None
    for dt in range(kt):
        y = lax.conv_general_dilated(
            xt, kernel[dt], window_strides=stride[1:],
            padding=[(pad[1], pad[1]), (pad[2], pad[2])],
            rhs_dilation=dilation[1:], dimension_numbers=_dim_numbers(2),
            feature_group_count=groups, preferred_element_type=x.dtype,
        )
        y = y.reshape(B, T, *y.shape[1:])
        shift = dt - half  # out[t] takes tap dt from frame t + shift
        if shift < 0:
            z = jnp.zeros_like(y[:, :(-shift)])
            y = jnp.concatenate([z, y[:, :shift]], axis=1)
        elif shift > 0:
            z = jnp.zeros_like(y[:, :shift])
            y = jnp.concatenate([y[:, shift:], z], axis=1)
        out = y if out is None else out + y
    return out


# Depthwise convs (groups == C): a shift-multiply rewrite (tap-offset
# strided slices x per-channel FMAs) was probed as an alternative to the
# XLA grouped-conv lowering and REJECTED: strided taps relayout on TPU
# (3.4x slower at the OFW down-conv shapes) and stride-1 taps measured
# within noise of XLA's own lowering at SS2D/MobileNetV2/ELGCNet shapes
# (tools/probe_dw.py). A calibrated re-probe (tools/probe_dw2d.py) made the
# STRIDE-2 3x3 cases look 10-30x above the VPU flop floor, so an
# Depthwise stride-2 convs: an s2d-phase-blocked Pallas kernel (nine taps
# as four full-lane FMAs on 2x2-phase-folded lanes + a fold matmul) was
# built and PROBED-THEN-DELETED (v5e 2026-08-18, round-3 history
# `ops/pallas/dwconv.py` / `tools/probe_dwpallas.py`): XLA's grouped
# lowering won every shape (flow 128^2 C32: 0.46/1.40 ms fwd/fwd+bwd vs
# pallas 0.71/2.02; mbv2 112^2 C96 s2: 0.27/1.00 vs 1.30/2.83). The naive
# tap-flop floor ignores the VMEM traffic of the shifted-operand builds
# (~16 full-array reads per frame pair) — XLA is near the real floor.


def to_tuple(v, n: int) -> Tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(int(u) for u in v)
    return (int(v),) * n


def _dim_numbers(n: int):
    spatial = "DHW"[-n:] if n <= 3 else None
    assert spatial is not None, f"unsupported spatial rank {n}"
    return lax.conv_dimension_numbers(
        (1,) * (n + 2), (1,) * (n + 2), ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    )


def conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
) -> jnp.ndarray:
    """`y = conv(x, kernel)` matching torch Conv{1,2,3}d (cross-correlation).

    x: (B, *spatial, C_in); kernel: (*k, C_in/groups, C_out).
    `padding` is an int or per-dim ints (symmetric), like torch.
    """
    n = x.ndim - 2
    stride = to_tuple(stride, n)
    dilation = to_tuple(dilation, n)
    pad = to_tuple(padding, n)
    if (all(k == 1 for k in kernel.shape[:n]) and all(p == 0 for p in pad)
            and groups == 1):
        # pointwise conv == matmul over the feature axis. Measured on v5e:
        # the conv_general lowering of a 1x1 costs ~4.5x more than the
        # equivalent matmul (layout conversions around the conv op); this
        # path also covers strided 1x1 downsamples via pre-slicing.
        if any(s != 1 for s in stride):
            ix = tuple(slice(None, None, s) for s in stride)
            x = x[(slice(None),) + ix]
        return jnp.matmul(x, kernel.reshape(kernel.shape[-2], kernel.shape[-1]))
    if (n == 3 and _CONV3D_IMPL == "decomposed" and kernel.shape[0] > 1
            and kernel.shape[0] % 2 == 1 and stride[0] == 1
            and dilation[0] == 1 and pad[0] == kernel.shape[0] // 2):
        return _conv3d_decomposed(x, kernel, stride, pad, dilation, groups)
    if (n == 3 and _CONV3D_IMPL in ("auto", "tdense") and kernel.shape[0] > 1
            and kernel.shape[0] % 2 == 1 and stride[0] == 1
            and dilation[0] == 1 and pad[0] == kernel.shape[0] // 2
            and groups == 1 and 2 <= x.shape[1] <= 8):
        # applies from T=2 up: a standalone encoder probe suggested the
        # T=2 transposes were a 1.8 ms loss, but the in-model A/B said
        # otherwise (617 vs 594 pairs/s full-forward with/without T=2
        # folding) — XLA fuses the layout change into neighbours the
        # standalone probe can't see. Decoder win at T=4: 16.0 -> 7.6 ms.
        return _conv3d_tdense(x, kernel, stride[1:], pad[1:], dilation[1:])
    if (n == 3 and kernel.shape[0] == 1 and stride[0] == 1 and pad[0] == 0
            and dilation[0] == 1):
        # temporally-pointwise 3-D conv == batched 2-D conv over B*T frames
        # (the reshape is a contiguous no-op); keeps XLA on its native 2-D
        # TPU conv path instead of the generic 3-D lowering
        B, T = x.shape[:2]
        y = conv(x.reshape(B * T, *x.shape[2:]), kernel[0], stride[1:],
                 pad[1:], dilation[1:], groups)
        return y.reshape(B, T, *y.shape[1:])
    pads = [(p, p) for p in pad]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pads,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(n),
        feature_group_count=groups,
        preferred_element_type=x.dtype,  # NB: TPU MXU accumulates fp32 in
        # hardware regardless; requesting f32 output here breaks the conv
        # transpose rule under autodiff with bf16 operands
    )


def conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride=1,
    padding=0,
    output_padding=0,
    groups: int = 1,
) -> jnp.ndarray:
    """torch ConvTranspose{1,2,3}d semantics, channels-last.

    kernel: (*k, C_in/groups, C_out) already in *forward-conv* layout, i.e.
    spatially flipped and in/out-transposed relative to torch's
    (C_in, C_out/groups, *k). Output size per dim: (i-1)*s - 2p + k + op.
    """
    n = x.ndim - 2
    stride = to_tuple(stride, n)
    pad = to_tuple(padding, n)
    opad = to_tuple(output_padding, n)
    ks = kernel.shape[:n]
    if (n == 3 and ks[0] == 1 and stride[0] == 1 and pad[0] == 0
            and opad[0] == 0):
        # temporally-pointwise transposed conv (e.g. the decoder's
        # (1,5,5)/(1,2,2) upsamplers) == batched 2-D transposed conv
        B, T = x.shape[:2]
        y = conv_transpose(x.reshape(B * T, *x.shape[2:]), kernel[0],
                           stride[1:], pad[1:], opad[1:], groups)
        return y.reshape(B, T, *y.shape[1:])
    pads = [(k - 1 - p, k - 1 - p + op) for k, p, op in zip(ks, pad, opad)]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,) * n,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_dim_numbers(n),
        feature_group_count=groups,
        preferred_element_type=x.dtype,  # NB: TPU MXU accumulates fp32 in
        # hardware regardless; requesting f32 output here breaks the conv
        # transpose rule under autodiff with bf16 operands
    )


# Stride-2 transposed-conv rewrites, both PROBED-THEN-DELETED (round-3
# history has `conv_transpose_s2_phase` / `conv_transpose_s2_hybrid` +
# `tools/probe_dec_ab.py` / `probe_convt_train.py`): the k5/s2 convT always
# lowers as the lhs-dilated conv.
#  - phase-packed form (one 3x3 conv over 2x2-phase-packed kernels + a
#    sub-pixel shuffle): wins the standalone op probe at h>=32 but LOSES in
#    place (ConvTrans stack 3.36 -> 4.4 ms) — the shuffle pass breaks
#    fusion with the temporal fold/BN that follows;
#  - hybrid (dilated fwd + phase-form custom VJP via linear_transpose):
#    whole-decoder train A/B dilated 21.42/21.48 ms vs hybrid 22.48/22.42
#    (bs16 256^2 bf16) — the dy shuffle/unshuffle costs more than XLA's
#    fused lhs-dilated wgrad saves.


def causal_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """Left-padded depthwise/grouped causal conv over the length axis.

    x: (B, L, C); kernel: (K, C/groups, C). TPU-native replacement for the
    reference's `causal_conv1d` CUDA op (reference: compare/cd_mamba.py:379).
    """
    k = kernel.shape[0]
    n = 1
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=_dim_numbers(n),
        feature_group_count=groups,
        preferred_element_type=x.dtype,  # NB: TPU MXU accumulates fp32 in
        # hardware regardless; requesting f32 output here breaks the conv
        # transpose rule under autodiff with bf16 operands
    )
