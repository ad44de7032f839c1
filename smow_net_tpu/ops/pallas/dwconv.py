"""Pallas TPU kernel for 3x3 depthwise conv, spatial stride 2, pad 1 —
the OFW flow down-chain (models/smow_net.py OFW, reference
models/SMOW_Net.py:593-605) and MobileNetV2's strided dw layers.

Why: XLA's grouped-conv lowering is 10-30x off the VPU flop floor at
small-C / large-spatial depthwise shapes (tools/probe_dw2d.py: the first
OFW down conv costs 0.60 ms fwd / 1.76 ms fwd+bwd at bs16 where the tap
arithmetic is worth ~0.02/0.06 ms), and the earlier shift-multiply probe
showed strided taps relayout catastrophically in XLA (tools/probe_dw.py).

TPU-native design — space-to-depth phases on the LANE axis:

  z[b, t, i, j, (2*pr + pc)*C + c] = x[b, t, 2i+pr, 2j+pc, c]

A stride-2 3x3 tap (u, v) reads block position (i + di, j + dj) with
(di, dj) in {0, -1}^2 and phase (pr, pc) determined by tap parity, so the
NINE taps become FOUR full-128-lane FMAs per (t_out, t_in) frame pair:

  acc[i,j,:] =  kA . z[i, j] + kB . z[i-1, j]
             + kC . z[i, j-1] + kD . z[i-1, j-1]

with kA..kD 4C-wide per-lane constants assembled from the conv kernel
(`_build_kvecs`, pure XLA, differentiated with jax.vjp in the backward),
followed by a tiny (H2*W2, 4C) @ (4C, C) phase-fold matmul on the MXU.
Temporal taps of the 3x3x3 T=2 flow convs ride the (t_out, t_in) loop
(dt = t_in - t_out + 1). Shifted operands are edge-zeroed concats — no
strided access anywhere. The custom VJP is one more kernel of the same
structure: dz mirrors the stencil with +1 shifts on the lane-replicated
cotangent, and the 16 kvec gradients are lane-wise multiply-reduces,
accumulated across the batch grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dw3x3_s2_pallas", "dw_s2_supported"]

_VMEM_LIMIT = 64 * 1024 * 1024


def dw_s2_supported(x_shape) -> bool:
    """(B, T, H, W, C) shapes the kernel handles: even H/W, lane-tileable
    C, T in {1, 2} (the flow chain's temporal extent), and f32 working set
    within VMEM."""
    if len(x_shape) != 5:
        return False
    B, T, H, W, C = x_shape
    return (
        T in (1, 2)
        and H % 2 == 0 and W % 2 == 0
        and H >= 8 and W >= 8
        and C % 8 == 0
        and (H // 2) * (W // 2) * 4 * C * 4 <= 8 * 1024 * 1024
    )


def _build_kvecs(k: jnp.ndarray, T: int) -> jnp.ndarray:
    """(kt, 3, 3, C) conv kernel -> (T, T, 4, 4C) per-lane tap constants.

    Lane layout (2*pr + pc)*C + c matches `_blocked`; shift groups are
    g0=(0,0), g1=(-1,0), g2=(0,-1), g3=(-1,-1). Tap (u, v) of the stride-2
    conv maps to group/phase via u: 0 -> (di=-1, pr=1), 1 -> (0, 0),
    2 -> (0, 1) (same for v/columns). Temporal: dt = t_in - t_out + 1
    must index a real temporal tap (centered kt, 'same' padding)."""
    kt, kh, kw, C = k.shape
    assert kh == 3 and kw == 3
    kv = jnp.zeros((T, T, 4, 4 * C), k.dtype)
    # (u index, di, pr) triples per the mapping above
    rows = [(0, -1, 1), (1, 0, 0), (2, 0, 1)]
    gidx = {(0, 0): 0, (-1, 0): 1, (0, -1): 2, (-1, -1): 3}
    for t_out in range(T):
        for t_in in range(T):
            dt = t_in - t_out + kt // 2
            if not 0 <= dt < kt:
                continue
            for (u, di, pr) in rows:
                for (v, dj, pc) in rows:
                    g = gidx[(di, dj)]
                    ph = 2 * pr + pc
                    kv = kv.at[t_out, t_in, g,
                               ph * C:(ph + 1) * C].set(k[dt, u, v])
    return kv


def _blocked(x: jnp.ndarray) -> jnp.ndarray:
    B, T, H, W, C = x.shape
    z = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
    z = z.transpose(0, 1, 2, 4, 3, 5, 6)
    return z.reshape(B, T, H // 2, W // 2, 4 * C)


def _unblock(z: jnp.ndarray) -> jnp.ndarray:
    B, T, H2, W2, C4 = z.shape
    C = C4 // 4
    x = z.reshape(B, T, H2, W2, 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, 2 * H2, 2 * W2, C)


def _shift_m(a, di, dj):
    """Edge-zeroed (-di, -dj) in {0, 1}^2 'minus' shift: row/col i reads
    i - 1 (the forward stencil's z[i-1] operand)."""
    H2, W2, _ = a.shape
    if di:
        a = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)
    if dj:
        a = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    return a


def _shift_p(a, di, dj):
    """Edge-zeroed 'plus' shift (the stencil transpose): row i reads i+1."""
    if di:
        a = jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)
    if dj:
        a = jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)
    return a


_GROUPS = ((0, 0), (1, 0), (0, 1), (1, 1))  # (di, dj) magnitudes


def _fwd_kernel(z_ref, kv_ref, out_ref, *, T: int, C: int):
    _, _, H2, W2, C4 = z_ref.shape
    fold = (jax.lax.broadcasted_iota(jnp.int32, (C4, C), 0) % C
            == jax.lax.broadcasted_iota(jnp.int32, (C4, C), 1)
            ).astype(jnp.float32)
    zs = [z_ref[0, t].astype(jnp.float32) for t in range(T)]
    for t_out in range(T):
        acc = None
        for t_in in range(T):
            for g, (di, dj) in enumerate(_GROUPS):
                kv = kv_ref[t_out, t_in, g, :].astype(jnp.float32)
                term = _shift_m(zs[t_in], di, dj) * kv[None, None, :]
                acc = term if acc is None else acc + term
        y = jax.lax.dot_general(
            acc.reshape(H2 * W2, C4), fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, t_out] = y.reshape(H2, W2, C).astype(out_ref.dtype)


def _bwd_kernel(z_ref, kv_ref, g_ref, dz_ref, dkv_ref, *, T: int, C: int):
    _, _, H2, W2, C4 = z_ref.shape
    greps = [
        jnp.concatenate([g_ref[0, t].astype(jnp.float32)] * 4, axis=-1)
        for t in range(T)
    ]
    zs = [z_ref[0, t].astype(jnp.float32) for t in range(T)]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dkv_ref[...] = jnp.zeros_like(dkv_ref)

    for t_in in range(T):
        dz = None
        for t_out in range(T):
            for g, (di, dj) in enumerate(_GROUPS):
                kv = kv_ref[t_out, t_in, g, :].astype(jnp.float32)
                term = _shift_p(greps[t_out], di, dj) * kv[None, None, :]
                dz = term if dz is None else dz + term
                # dkv[t_out, t_in, g] = sum_{i,j} shift_m(z_in) . grep_out
                prod = _shift_m(zs[t_in], di, dj) * greps[t_out]
                dkv_ref[t_out, t_in, g, :] += jnp.sum(prod, axis=(0, 1))
        dz_ref[0, t_in] = dz.astype(dz_ref.dtype)


def _forward(z, kv, T, C, interpret=False):
    B = z.shape[0]
    H2, W2 = z.shape[2], z.shape[3]
    kernel = functools.partial(_fwd_kernel, T=T, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, H2, W2, 4 * C), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T, 4, 4 * C), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, H2, W2, C), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H2, W2, C), z.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(z, kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw3x3_s2_pallas(x, k, interpret=False):
    """Depthwise conv of x (B, T, H, W, C) with k (kt, 3, 3, C), temporal
    stride 1 / 'same' (kt in {1, 3}), spatial stride 2, pad 1. Returns
    (B, T, H/2, W/2, C). Exact same math as the XLA grouped lowering."""
    B, T, H, W, C = x.shape
    kv = _build_kvecs(k, T)
    return _forward(_blocked(x), kv, T, C, interpret)


def _fwd(x, k, interpret):
    B, T, H, W, C = x.shape
    kv = _build_kvecs(k, T)
    z = _blocked(x)
    return _forward(z, kv, T, C, interpret), (z, k)


def _bwd(interpret, res, gy):
    z, k = res
    B, T, H2, W2, C4 = z.shape
    C = C4 // 4
    kv, kvjp = jax.vjp(lambda kk: _build_kvecs(kk, T), k)
    kernel = functools.partial(_bwd_kernel, T=T, C=C)
    dz, dkv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, H2, W2, C4), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T, 4, C4), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, H2, W2, C), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, H2, W2, C4), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T, 4, C4), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(z.shape, z.dtype),
            jax.ShapeDtypeStruct((T, T, 4, C4), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(z, kv, gy)
    (dk,) = kvjp(dkv.astype(kv.dtype))
    return _unblock(dz), dk


dw3x3_s2_pallas.defvjp(_fwd, _bwd)
