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
# s2d-phase-blocked Pallas kernel was built (ops/pallas/dwconv.py: the nine
# taps as four full-lane FMAs on 2x2-phase-folded lanes + a fold matmul).
# VERDICT (tools/probe_dwpallas.py, v5e 2026-08-18): REJECTED for routing —
# XLA wins every shape (flow 128^2 C32: 0.46/1.40 ms fwd/fwd+bwd vs pallas
# 0.71/2.02; mbv2 112^2 C96 s2: 0.27/1.00 vs 1.30/2.83). The naive tap floor
# ignores the VMEM traffic of the shifted-operand builds (~16 full-array
# reads per frame pair), which is where the stencil formulation actually
# lives; XLA's grouped lowering is near that real floor. The kernel stays
# available behind set_dw_impl("pallas") as measurement apparatus.
_DW_IMPL = "xla"


def set_dw_impl(name: str):
    """Depthwise stride-2 backend: 'xla' (default — measured faster at all
    probed shapes) or 'pallas' (the s2d-phase kernel, kept for probes)."""
    assert name in ("xla", "pallas"), name
    global _DW_IMPL
    _DW_IMPL = name


def _dw_s2_route(x5, kernel4):
    if _DW_IMPL != "pallas":
        return None
    from .pallas.dwconv import dw3x3_s2_pallas, dw_s2_supported

    if not dw_s2_supported(x5.shape):
        return None
    return dw3x3_s2_pallas(x5, kernel4)


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
    if (groups > 1 and groups == x.shape[-1] == kernel.shape[-1]
            and kernel.shape[-2] == 1 and all(d == 1 for d in dilation)):
        # depthwise 3x3 spatial-stride-2 pad-1 -> Pallas s2d-phase kernel
        if (n == 2 and kernel.shape[:2] == (3, 3) and stride == (2, 2)
                and pad == (1, 1)):
            y5 = _dw_s2_route(x[:, None], kernel[None, :, :, 0, :])
            if y5 is not None:
                return y5[:, 0]
        if (n == 3 and kernel.shape[:3] in ((1, 3, 3), (3, 3, 3))
                and stride[0] == 1 and stride[1:] == (2, 2)
                and pad[0] == kernel.shape[0] // 2 and pad[1:] == (1, 1)):
            y5 = _dw_s2_route(x, kernel[..., 0, :])
            if y5 is not None:
                return y5
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


def convt_s2_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Phase-pack a (5, 5, Cin, F) stride-2 transposed-conv kernel (forward
    layout, torch p=2/op=1) into ONE (3, 3, Cin, 4F) stride-1 conv kernel.

    out[2m+a] = sum_d xd[2m+a+d-2] W[d] keeps only d = 2e-a, so each output
    phase (a, b) is a 3x3 conv over x[m-1..m+1] with kernel W[2e_h-a, 2e_w-b]
    (zero where the tap index leaves [0,4]).

    PROBED AND REJECTED for the SMOW decoder (v5e, bf16): despite the
    dilated form's 12.7% MFU, the phase form measured SLOWER in place
    (ConvTrans stack 3.36 -> 4.4 ms) — the extra sub-pixel-shuffle pass
    over the upsampled tensor plus the 36/25 tap padding cost more than
    the zero-dilated rows. Kept as a building block (exactness-tested)."""
    K00 = kernel[0::2, 0::2]
    K01 = jnp.pad(kernel[0::2, 1::2], ((0, 0), (1, 0), (0, 0), (0, 0)))
    K10 = jnp.pad(kernel[1::2, 0::2], ((1, 0), (0, 0), (0, 0), (0, 0)))
    K11 = jnp.pad(kernel[1::2, 1::2], ((1, 0), (1, 0), (0, 0), (0, 0)))
    return jnp.concatenate([K00, K01, K10, K11], axis=-1)


def conv_transpose_s2_phase(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=5, s=2, p=2, output_padding=1) as a phase-packed
    3x3 conv + sub-pixel shuffle. Exact rewrite of conv_transpose(x, kernel,
    2, 2, 1); x: (B, h, w, Cin) -> (B, 2h, 2w, F)."""
    B, h, w, _ = x.shape
    F = kernel.shape[-1]
    kp = convt_s2_phase_kernel(kernel)
    y = lax.conv_general_dilated(
        x, kp, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_dim_numbers(2),
        preferred_element_type=x.dtype)
    y = y.reshape(B, h, w, 2, 2, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * h, 2 * w, F)


def _phase_conv(x: jnp.ndarray, kp: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, kp, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_dim_numbers(2),
        preferred_element_type=x.dtype)


@jax.custom_vjp
def conv_transpose_s2_hybrid(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=5, s=2, p=2, op=1) with a split lowering:

    - FORWARD: the lhs-dilated conv (same as `conv_transpose(x, k, 2, 2, 1)`)
      — fuses with the surrounding temporal fold/BN, and the phase-packed
      rewrite measured slower forward-only in place (see
      conv_transpose_s2_phase);
    - BACKWARD: both grads taken through the exact phase-packed 3x3 form
      via `jax.linear_transpose` (no extra forward pass): dx is a plain 3x3
      conv and dkernel a standard stride-1 wgrad, instead of XLA's wgrad
      that walks an lhs-dilated window (the dominant cost of the decoder's
      training backward — tools/probe_convt_train.py).

    PROBED AND REJECTED in place (same-process A/B, tools/probe_dec_ab.py,
    bs16 256^2 bf16 whole-decoder train): dilated 21.42/21.48 ms vs hybrid
    22.48/22.42 ms. The phase adjoint's dy shuffle/unshuffle costs more
    than XLA's fused lhs-dilated wgrad saves. Kept (grads pinned by
    tests/test_convops.py::test_convt_s2_hybrid_grads_match_autodiff) as
    the measured record; default routing stays "dilated".
    """
    return conv_transpose(x, kernel, 2, 2, 1)


def _cts2_fwd(x, kernel):
    return conv_transpose_s2_hybrid(x, kernel), (x, kernel)


def _cts2_bwd(res, dy):
    x, kernel = res
    B, h, w, _ = x.shape
    F = kernel.shape[-1]
    # inverse of the sub-pixel shuffle in conv_transpose_s2_phase
    dyp = dy.reshape(B, h, 2, w, 2, F).transpose(0, 1, 3, 2, 4, 5)
    dyp = dyp.reshape(B, h, w, 4 * F)
    kp = convt_s2_phase_kernel(kernel)
    dx = jax.linear_transpose(lambda x_: _phase_conv(x_, kp), x)(dyp)[0]
    dkp = jax.linear_transpose(lambda k_: _phase_conv(x, k_), kp)(dyp)[0]
    dkernel = jax.linear_transpose(convt_s2_phase_kernel, kernel)(dkp)[0]
    return dx, dkernel


conv_transpose_s2_hybrid.defvjp(_cts2_fwd, _cts2_bwd)

# A/B toggle for the k5/s2/p2/op1 transposed-conv VJP routing (the forward
# is the identical dilated lowering either way). "dilated" measured faster
# in place — see conv_transpose_s2_hybrid's docstring.
_CONVT_S2_IMPL = "dilated"


def set_convt_s2_impl(name: str):
    assert name in ("hybrid", "dilated"), name
    global _CONVT_S2_IMPL
    _CONVT_S2_IMPL = name


def conv_transpose_s2_auto(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    if _CONVT_S2_IMPL == "hybrid":
        return conv_transpose_s2_hybrid(x, kernel)
    return conv_transpose(x, kernel, 2, 2, 1)


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
