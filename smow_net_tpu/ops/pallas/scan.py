"""Pallas TPU kernel for the S6 selective scan (SURVEY.md N2/N3).

Why a kernel: the `lax.associative_scan` path materialises the (B, L, D, N)
gate/update tensors in HBM and walks them log2(L) times; the recurrence is
HBM-bound. This kernel streams the sequence once: each grid program owns one
batch row and a block of channels, keeps the (BD, N) hidden state in VMEM,
and walks L in chunks with all elementwise work on the VPU — one HBM read
per input element, one write per output element.

Forward only; the op carries a custom VJP whose backward recomputes through
the (differentiable) associative-scan reference implementation, so training
numerics match ops/scan.py exactly. Use for inference-critical paths.

Layout: dA, dBu are precomputed outside as (B, L, D, N) *slices per channel
block* to keep the kernel simple and fusable; the heavy win is the single-
pass recurrence. The kernel treats the trailing (D_blk * N) as lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scan import selective_scan as _reference_scan

__all__ = ["selective_scan_pallas"]


def _scan_kernel(dA_ref, dBu_ref, h_ref, *, length: int, step: int):
    """One grid program owns one (batch, channel-block): refs are
    (1, 1, L, DN). Walks L in `step`-row slabs; within a slab the recurrence
    unrolls over rows (static python loop -> straight-line VPU code)."""
    dn = dA_ref.shape[-1]

    def slab(i, h):
        base = i * step
        a = dA_ref[0, 0, pl.ds(base, step), :]
        b = dBu_ref[0, 0, pl.ds(base, step), :]
        rows = []
        for r in range(step):
            h = a[r] * h + b[r]
            rows.append(h)
        h_ref[0, 0, pl.ds(base, step), :] = jnp.stack(rows, axis=0)
        return h

    jax.lax.fori_loop(0, length // step, slab, jnp.zeros((dn,), jnp.float32))


def _scan_states(dA: jnp.ndarray, dBu: jnp.ndarray, block_d: int = 8) -> jnp.ndarray:
    """dA, dBu: (B, L, D, N) fp32 -> h: (B, L, D, N) via the Pallas kernel."""
    B, L, D, N = dA.shape
    bd = min(block_d, D)
    while D % bd:
        bd -= 1
    dblocks = D // bd
    dA2 = dA.reshape(B, L, dblocks, bd * N).transpose(0, 2, 1, 3)
    dBu2 = dBu.reshape(B, L, dblocks, bd * N).transpose(0, 2, 1, 3)

    step = 8
    while L % step:
        step //= 2
    kernel = functools.partial(_scan_kernel, length=L, step=step)
    spec = pl.BlockSpec((1, 1, L, bd * N), lambda b, d: (b, d, 0, 0),
                        memory_space=pltpu.VMEM)
    h = pl.pallas_call(
        kernel,
        grid=(B, dblocks),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, dblocks, L, bd * N), jnp.float32),
    )(dA2, dBu2)
    return h.transpose(0, 2, 1, 3).reshape(B, L, D, N)


def _forward(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus):
    B, L, Dch = u.shape
    _, _, G, N = Bmat.shape
    Cg = Dch // G
    uf = u.astype(jnp.float32)
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    dA = jnp.exp(dt[..., None] * A.astype(jnp.float32))
    Bf = Bmat.astype(jnp.float32)
    dBu = (dt * uf).reshape(B, L, G, Cg)[..., None] * Bf[:, :, :, None, :]
    dBu = dBu.reshape(B, L, Dch, N)

    h = _scan_states(dA, dBu)

    y = jnp.einsum("blgcn,blgn->blgc", h.reshape(B, L, G, Cg, N),
                   Cmat.astype(jnp.float32))
    y = y.reshape(B, L, Dch)
    if D is not None:
        y = y + uf * D.astype(jnp.float32)
    return y.astype(u.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def selective_scan_pallas(u, delta, A, Bmat, Cmat, D=None,
                          delta_bias=None, delta_softplus=False):
    """Same contract as ops.scan.selective_scan; Pallas single-pass forward."""
    return _forward(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus)


def _fwd(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus):
    y = _forward(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus)
    return y, (u, delta, A, Bmat, Cmat, D, delta_bias)


def _bwd(delta_softplus, res, g):
    u, delta, A, Bmat, Cmat, D, delta_bias = res

    def ref(u, delta, A, Bmat, Cmat, D, delta_bias):
        return _reference_scan(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus)

    _, vjp = jax.vjp(ref, u, delta, A, Bmat, Cmat, D, delta_bias)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)
