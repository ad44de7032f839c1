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


def _scan_kernel(dA_ref, dBu_ref, h_ref, state, *, chunk: int, step: int):
    """Grid (B, D_blocks, L_chunks); the L axis is a *sequential* grid
    dimension — `state` (VMEM scratch) carries the hidden state across
    chunk iterations. Within a chunk the recurrence unrolls over `step`-row
    slabs (straight-line VPU code)."""
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def slab(i, h):
        # h: (1, dn) — TPU vector ops want >= 2-D
        base = i * step
        a = dA_ref[0, 0, pl.ds(base, step), :]
        b = dBu_ref[0, 0, pl.ds(base, step), :]
        rows = []
        for r in range(step):
            h = a[r : r + 1, :] * h + b[r : r + 1, :]
            rows.append(h)
        h_ref[0, 0, pl.ds(base, step), :] = jnp.concatenate(rows, axis=0)
        return h

    h = jax.lax.fori_loop(0, chunk // step, slab, state[:, :])
    state[:, :] = h


def _scan_states(dA: jnp.ndarray, dBu: jnp.ndarray, block_d: int = 8,
                 max_chunk: int = 1024) -> jnp.ndarray:
    """dA, dBu: (B, L, D, N) fp32 -> h: (B, L, D, N) via the Pallas kernel."""
    B, L, D, N = dA.shape
    bd = min(block_d, D)
    while D % bd:
        bd -= 1
    dblocks = D // bd
    dn = bd * N
    dA2 = dA.reshape(B, L, dblocks, dn).transpose(0, 2, 1, 3)
    dBu2 = dBu.reshape(B, L, dblocks, dn).transpose(0, 2, 1, 3)

    chunk = min(max_chunk, L)
    while L % chunk:
        chunk //= 2
    step = 8
    while chunk % step:
        step //= 2
    kernel = functools.partial(_scan_kernel, chunk=chunk, step=step)
    spec = pl.BlockSpec((1, 1, chunk, dn), lambda b, d, l: (b, d, l, 0),
                        memory_space=pltpu.VMEM)
    h = pl.pallas_call(
        kernel,
        grid=(B, dblocks, L // chunk),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, dblocks, L, dn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, dn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
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
