"""Pallas TPU kernel for the S6 selective scan (SURVEY.md N2/N3).

Why a kernel: the `lax.associative_scan` path materialises the (B, L, D, N)
gate/update tensors in HBM and walks them log2(L) times; the recurrence is
HBM-bound. This kernel streams the sequence once: each grid program owns one
batch row and a block of channels, keeps the (BD, N) hidden state in VMEM,
and walks L in chunks with all elementwise work on the VPU — one HBM read
per input element, one write per output element.

The op carries an analytic custom VJP (see _bwd): the backward recomputes h
with one streaming pass, runs the reverse-time adjoint recurrence as a second
pass of the same kernel, and leaves the remaining gradient algebra to fused
XLA elementwise/einsum ops — training gets the same single-pass win as
inference (reference backward: compare/vmamba.py:253-321).

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


def _bwd(delta_softplus, res, gy):
    """Analytic backward with two more streaming-kernel passes (mirrors the
    reference CUDA ext's fwd+bwd pair, compare/vmamba.py:253-321):

      1. recompute h forward (memory-light: nothing (B,L,D,N)-sized is saved
         from the forward pass);
      2. reverse-time scan for the state adjoint
         g_t = C_t*dy_t + a_{t+1} * g_{t+1}
         (the same kernel run on the flipped, shifted-coefficient sequence);
      3. all remaining gradients are fused elementwise/einsum contractions.
    """
    u, delta, A, Bmat, Cmat, D, delta_bias = res
    B, L, Dch = u.shape
    _, _, G, N = Bmat.shape
    Cg = Dch // G

    uf = u.astype(jnp.float32)
    dt_in = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt_in = dt_in + delta_bias.astype(jnp.float32)
    dt = jax.nn.softplus(dt_in) if delta_softplus else dt_in
    Af = A.astype(jnp.float32)
    Bf = Bmat.astype(jnp.float32)
    Cf = Cmat.astype(jnp.float32)
    gyf = gy.astype(jnp.float32)

    a = jnp.exp(dt[..., None] * Af)                              # (B, L, D, N)
    dtu = (dt * uf).reshape(B, L, G, Cg)
    b = dtu[..., None] * Bf[:, :, :, None, :]
    b = b.reshape(B, L, Dch, N)

    h = _scan_states(a, b)                                       # recompute

    # reverse-time adjoint scan
    c = gyf.reshape(B, L, G, Cg)[..., None] * Cf[:, :, :, None, :]
    c = c.reshape(B, L, Dch, N)
    a_next = jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)
    g = jnp.flip(_scan_states(jnp.flip(a_next, 1), jnp.flip(c, 1)), 1)

    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
    g4 = g.reshape(B, L, G, Cg, N)
    h4 = h.reshape(B, L, G, Cg, N)

    # y = C.h (+ D u) direct terms
    dC = jnp.einsum("blgc,blgcn->blgn", gyf.reshape(B, L, G, Cg), h4)
    dD = jnp.sum(gyf * uf, axis=(0, 1)) if D is not None else None
    du = gyf * D.astype(jnp.float32) if D is not None else jnp.zeros_like(uf)

    # b_t = dt*u*B  -> du, ddt, dB
    gB = jnp.einsum("blgcn,blgn->blgc", g4, Bf).reshape(B, L, Dch)
    du = du + gB * dt
    ddt = gB * uf
    dB = jnp.einsum("blgcn,blgc->blgn", g4, dtu)

    # a_t = exp(dt*A) -> ddt, dA
    gha = g * h_prev * a
    ddt = ddt + jnp.einsum("bldn,dn->bld", gha, Af)
    dA = jnp.einsum("bldn,bld->dn", gha, dt)

    if delta_softplus:
        ddt = ddt * jax.nn.sigmoid(dt_in)
    ddelta_bias = (jnp.sum(ddt, axis=(0, 1)).astype(delta_bias.dtype)
                   if delta_bias is not None else None)
    return (du.astype(u.dtype), ddt.astype(delta.dtype), dA.astype(A.dtype),
            dB.astype(Bmat.dtype), dC.astype(Cmat.dtype),
            dD.astype(D.dtype) if D is not None else None, ddelta_bias)


selective_scan_pallas.defvjp(_fwd, _bwd)
