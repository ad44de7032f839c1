"""Fully-fused Pallas TPU selective scan (S6) — the speed-of-light design.

The chunked kernel in ops/pallas/scan.py streams the recurrence but still
materialises the N-expanded gate tensors dA = exp(dt*A) and dBu = dt*u*B
— (B, L, D, N) fp32 in HBM, N=16x the payload — plus their layout copies.
Measured on v5e those materialisations dominate Mamba training end-to-end
(change_mamba train steps are scan-backend-insensitive at 412 ms/step
because both backends pay the same HBM traffic).

This kernel fuses the whole op, mirroring the reference CUDA kernel's
structure (compare/vmamba.py:253-321 wraps selective_scan_cuda which does
exactly this): HBM holds only the natural-sized operands

    u, delta: (B, L, D)   A: (D, N)   B, C: (B, L, G, N)   y: (B, L, D)

and everything N-expanded lives in VMEM for one chunk at a time:

  grid = (B*G, L/chunk); each program owns one (batch, group) pair and the
  full Cg = D/G channel slice (lanes). The hidden state h is an (N, Cg)
  VMEM scratch carried across the sequential chunk axis. Per step-row slab:
    dt   = softplus(delta + bias)              (step, Cg) VPU
    a_r  = exp(dt_r * A)                       (N, Cg)    VPU, per row
    b_r  = B_r^T (dt_r * u_r)                  (N,1)*(1,Cg) broadcast
    h    = a_r * h + b_r                       (N, Cg) fused multiply-add
    y_r  = sum_n C_r[n] h[n,:] + D u_r        sublane reduction
  B/C rows are lifted from lanes to sublanes with one (step, N) -> (N, step)
  transpose per slab (tiny XLU shuffle), so every per-row factor broadcasts
  along its natural axis and no one-hot matmuls are needed.

HBM traffic per element drops from ~6 N-expanded round trips to one read of
each input and one write of y (~30x less at N=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selective_scan_fused", "selective_scan_fused_grouped",
           "fused_supported"]

import os as _os

# v5e VMEM is 128 MiB; 64 MiB was measured 928 KiB short for the cd_mamba
# ConvMamba backward at (bt=8, L=65536, Cg=32, N=16) — the double-buffered
# operand slabs plus the h-checkpoint scratch land at 64.91 MiB
# (artifacts/bench_r03/cd_mamba_train.log). 100 MiB leaves compile headroom
# without starving the rest of the program.
_VMEM_LIMIT = int(_os.environ.get("SCAN_FUSED_VMEM_LIMIT",
                                  str(100 * 1024 * 1024)))

# per-row op-size target for the bt tiling (elements) and the unrolled
# rows per slab. v5e sweep at the dominant change_mamba shape (VSSBlock
# C=96 64^2, tools/probe_scan_bt.py): step 16 beats 8 by ~3% at every cap;
# caps past 32768 are noise-to-worse (the bwd h-checkpoint scratch budget
# shrinks the chunk, adding grid steps).
_BT_CAP = int(_os.environ.get("SCAN_FUSED_BT_CAP", "32768"))
_STEP = int(_os.environ.get("SCAN_FUSED_STEP", "16"))

# Wide-row programs: the two-level (segmented) path expands BG to BG*S rows
# and _pick_bt packs up to 128 of them per program — per-program scoped VMEM
# scales with bt, and the default chunk budgets compiled to a 113.04 MiB
# scoped request at (rows=256, K=4096, Cg=32, N=16), over the 100 MiB cap
# (artifacts/bench_r04/seg_scan.txt, first on-chip run). Above
# _WIDE_ROW_ELEMS per-row elements (= bt*N*Cg; 24576 is the largest tiling
# proven on chip — change_mamba's bt=16, Cg=96), shrink the chunk budgets so
# per-program block bytes stay at the proven scale and halve the slab unroll
# (the unrolled step temporaries are (bt, N, Cg)-sized and grow with bt).
# Defaults validated by tools/probe_seg_scan.py's on-chip config sweep.
_WIDE_ROW_ELEMS = int(_os.environ.get("SCAN_FUSED_WIDE_ROW_ELEMS", "24576"))
_FWD_BUDGET_WIDE = int(_os.environ.get("SCAN_FUSED_FWD_BUDGET_WIDE",
                                       str(1 << 20)))
_BWD_BUDGET_WIDE = int(_os.environ.get("SCAN_FUSED_BWD_BUDGET_WIDE",
                                       str(4 << 20)))
_STEP_WIDE = int(_os.environ.get("SCAN_FUSED_STEP_WIDE", "8"))

# Non-wide chunk budgets — the single source for both the _pick_chunk*
# defaults and _tiling (they silently diverged when duplicated as literals).
_FWD_BUDGET = 4 << 20
_BWD_BUDGET = 8 << 20


def _tiling(BG, L, Cg, N, bwd=False):
    """(bt, chunk, step) for one kernel call, applying the wide-row budget
    shrink above the proven per-row element count."""
    bt = _pick_bt(BG, Cg, N)
    wide = bt * N * Cg > _WIDE_ROW_ELEMS
    if bwd:
        chunk = _pick_chunk_bwd(L, Cg, N, bt,
                                _BWD_BUDGET_WIDE if wide else _BWD_BUDGET)
    else:
        chunk = _pick_chunk(L, Cg, bt,
                            _FWD_BUDGET_WIDE if wide else _FWD_BUDGET)
    step = _STEP_WIDE if wide else _STEP
    while chunk % step:
        step //= 2
    return bt, chunk, step


def _pick_bt(BG: int, Cg: int, N: int) -> int:
    """How many (batch, group) pairs ride one program. The recurrence's
    per-row ops are (N, Cg)-sized — a few KB at SS2D shapes — so a single
    pair leaves the VPU issuing tiny ops with the per-row loop overhead
    dominating, and the BG independent programs serialize on the core.
    Batch pairs until each per-row op is ~32-64K elements."""
    bt = 1
    while (bt * 2 <= BG and BG % (bt * 2) == 0
           and bt * N * Cg <= _BT_CAP):
        bt *= 2
    return bt


def _pick_chunk_bwd(L: int, Cg: int, N: int, bt: int,
                    budget_bytes: int = _BWD_BUDGET) -> int:
    """The reverse kernel keeps the recomputed (chunk, bt, N, Cg) h states
    in VMEM scratch; size the chunk so that stays under the budget."""
    chunk = 1024
    while chunk * bt * N * Cg * 4 > budget_bytes and chunk > 8:
        chunk //= 2
    while L % chunk:
        chunk //= 2
    return max(chunk, 1)


def _pick_chunk(L: int, Cg: int, bt: int = 1,
                budget_bytes: int = _FWD_BUDGET) -> int:
    """Largest power-of-two chunk dividing L whose (bt, chunk, Cg) fp32
    block stays under the budget (u, dt, y blocks each hold one)."""
    chunk = 1024
    while bt * chunk * Cg * 4 > budget_bytes and chunk > 8:
        chunk //= 2
    while L % chunk:
        chunk //= 2
    return max(chunk, 1)


def fused_supported(L: int, Cg: int) -> bool:
    """The kernel needs a power-of-two-friendly chunking of L and a
    lane-tileable channel slice."""
    return L % _pick_chunk(L, Cg) == 0 and Cg % 8 == 0 and _pick_chunk(L, Cg) >= 8


def _fwd_kernel(dt_ref, u_ref, B_ref, C_ref, A_ref, D_ref, h0_ref, y_ref,
                h_st, *, chunk: int, step: int, softplus: bool):
    """All refs carry a leading `bt` (batch*group tile) dim: per-row ops are
    (bt, N, Cg)-sized, amortizing the sequential row loop's overhead over
    bt pairs instead of serializing bt single-pair programs. `h0_ref` seeds
    the recurrence (zeros for a from-rest scan; per-segment carries on the
    two-level long-L path)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_st[...] = h0_ref[...]

    A = A_ref[...]                  # (bt, N, Cg) fp32 (already -exp(A_log))
    Dv = D_ref[...]                 # (bt, 1, Cg)

    def slab(i, h):
        base = i * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        u = u_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        dtu = dt * u                                     # (bt, step, Cg)
        BsT = jnp.swapaxes(
            B_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        CsT = jnp.swapaxes(
            C_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        rows = []
        for r in range(step):
            a_r = jnp.exp(dt[:, r : r + 1, :] * A)           # (bt, N, Cg)
            b_r = BsT[:, :, r : r + 1] * dtu[:, r : r + 1, :]
            h = a_r * h + b_r
            y_r = jnp.sum(CsT[:, :, r : r + 1] * h, axis=1, keepdims=True)
            rows.append(y_r + Dv * u[:, r : r + 1, :])
        y_ref[:, pl.ds(base, step), :] = jnp.concatenate(rows, axis=1)
        return h

    h = jax.lax.fori_loop(0, chunk // step, slab, h_st[...])
    h_st[...] = h


def _carry_kernel(dt_ref, u_ref, B_ref, A_ref, h0_ref, hend_ref, h_st,
                  *, chunk: int, step: int, softplus: bool):
    """Forward sweep emitting ONLY the final hidden state (the two-level
    path's pass 1: per-segment local carries, massively parallel over
    segments). No y write — ~Cg/(N*Cg) of the fwd kernel's output traffic."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_st[...] = h0_ref[...]

    A = A_ref[...]

    def slab(i, h):
        base = i * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        u = u_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        dtu = dt * u
        BsT = jnp.swapaxes(
            B_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        for r in range(step):
            h = jnp.exp(dt[:, r : r + 1, :] * A) * h \
                + BsT[:, :, r : r + 1] * dtu[:, r : r + 1, :]
        return h

    h = jax.lax.fori_loop(0, chunk // step, slab, h_st[...])
    h_st[...] = h

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        hend_ref[...] = h


def _adjcarry_kernel(dt_ref, C_ref, dy_ref, A_ref, gloc_ref, g_st, an_st,
                     *, chunk: int, step: int, softplus: bool):
    """Reverse sweep emitting ONLY the local adjoint carry at the segment's
    first row (g_l = C_l dy_l + a_{l+1} g_{l+1}, walked right-to-left with
    zero incoming). Needs no hidden states — dt/C/dy reads only."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        g_st[:] = jnp.zeros_like(g_st)
        an_st[:] = jnp.zeros_like(an_st)

    A = A_ref[...]

    def slab(j, carry):
        g, a_next = carry
        base = (chunk // step - 1 - j) * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        CsT = jnp.swapaxes(
            C_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        dy = dy_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        for r in range(step - 1, -1, -1):
            g = CsT[:, :, r : r + 1] * dy[:, r : r + 1, :] + a_next * g
            a_next = jnp.exp(dt[:, r : r + 1, :] * A)
        return g, a_next

    g, a_next = jax.lax.fori_loop(0, chunk // step, slab,
                                  (g_st[...], an_st[...]))
    g_st[...] = g
    an_st[...] = a_next

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        gloc_ref[...] = g


def _ckpt_kernel(dt_ref, u_ref, B_ref, A_ref, h0_ref, hck_ref, h_st,
                 *, chunk: int, step: int, softplus: bool):
    """Forward sweep that only records the hidden state at each chunk START
    (the reverse kernel recomputes within-chunk states from these)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_st[...] = h0_ref[...]

    hck_ref[:, 0] = h_st[...]
    A = A_ref[...]

    def slab(i, h):
        base = i * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        u = u_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        dtu = dt * u
        BsT = jnp.swapaxes(
            B_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        for r in range(step):
            h = jnp.exp(dt[:, r : r + 1, :] * A) * h \
                + BsT[:, :, r : r + 1] * dtu[:, r : r + 1, :]
        return h

    h_st[...] = jax.lax.fori_loop(0, chunk // step, slab, h_st[...])


def _bwd_kernel(dt_ref, u_ref, B_ref, C_ref, dy_ref, A_ref, hck_ref,
                g0_ref, a0_ref,
                dus_ref, ddt_ref, dB_ref, dC_ref, dA_ref,
                h_scr, g_st, an_st, dA_st,
                *, chunk: int, step: int, softplus: bool, N: int):
    """Reverse sweep (the grid's L axis walks chunks last-to-first via the
    index maps): recompute h within the chunk from its checkpoint, then run
    the adjoint recurrence g_l = C_l (x) dy_l + a_{l+1} g_{l+1} backward,
    emitting every gradient as natural-(B,L,D)/(B,L,N)-sized outputs.
    (g0_ref, a0_ref) seed the adjoint carry from the right (zeros for the
    rightmost/whole-sequence case; per-segment incoming adjoints on the
    two-level path)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        g_st[...] = g0_ref[...]
        an_st[...] = a0_ref[...]
        dA_st[:] = jnp.zeros_like(dA_st)

    A = A_ref[...]                  # (bt, N, Cg)

    # ---- forward recompute: h_scr[r] = state BEFORE row r ----
    def slab_fwd(j, h):
        base = j * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        u = u_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        dtu = dt * u
        BsT = jnp.swapaxes(
            B_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        for r in range(step):
            h_scr[pl.ds(base + r, 1)] = h[None]
            h = jnp.exp(dt[:, r : r + 1, :] * A) * h \
                + BsT[:, :, r : r + 1] * dtu[:, r : r + 1, :]
        return h

    jax.lax.fori_loop(0, chunk // step, slab_fwd, hck_ref[:, 0])

    # ---- reverse adjoint walk ----
    def slab_bwd(j, carry):
        g, a_next = carry
        # keep the offset in (k * step) form — Mosaic must statically prove
        # sublane-dim slice offsets are multiples of 8
        base = (chunk // step - 1 - j) * step
        dt = dt_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        if softplus:
            dt = jax.nn.softplus(dt)
        u = u_ref[:, pl.ds(base, step), :].astype(jnp.float32)
        dtu = dt * u
        BsT = jnp.swapaxes(
            B_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        CsT = jnp.swapaxes(
            C_ref[:, pl.ds(base, step), :].astype(jnp.float32), 1, 2)
        dy = dy_ref[:, pl.ds(base, step), :].astype(jnp.float32)

        dus_rows, ddt_rows, dB_cols, dC_cols = [], [], [], []
        for r in range(step - 1, -1, -1):
            h_prev = h_scr[pl.ds(base + r, 1)][0]          # (bt, N, Cg)
            a_r = jnp.exp(dt[:, r : r + 1, :] * A)
            b_r = BsT[:, :, r : r + 1] * dtu[:, r : r + 1, :]
            h_l = a_r * h_prev + b_r
            g = CsT[:, :, r : r + 1] * dy[:, r : r + 1, :] + a_next * g
            a_next = a_r
            gha = g * h_prev * a_r                          # (bt, N, Cg)
            s = jnp.sum(g * BsT[:, :, r : r + 1], axis=1, keepdims=True)
            dus_rows.append(dt[:, r : r + 1, :] * s)
            ddt_rows.append(u[:, r : r + 1, :] * s
                            + jnp.sum(gha * A, axis=1, keepdims=True))
            dA_st[...] += gha * dt[:, r : r + 1, :]
            dB_cols.append(jnp.sum(g * dtu[:, r : r + 1, :], axis=2,
                                   keepdims=True))
            dC_cols.append(jnp.sum(h_l * dy[:, r : r + 1, :], axis=2,
                                   keepdims=True))

        # rows were collected last-to-first; restore ascending order
        dus_ref[:, pl.ds(base, step), :] = jnp.concatenate(
            dus_rows[::-1], 1)
        ddt_ref[:, pl.ds(base, step), :] = jnp.concatenate(
            ddt_rows[::-1], 1)
        dB_ref[:, pl.ds(base, step), :] = jnp.swapaxes(
            jnp.concatenate(dB_cols[::-1], 2), 1, 2)
        dC_ref[:, pl.ds(base, step), :] = jnp.swapaxes(
            jnp.concatenate(dC_cols[::-1], 2), 1, 2)
        return g, a_next

    g, a_next = jax.lax.fori_loop(
        0, chunk // step, slab_bwd, (g_st[...], an_st[...]))
    g_st[...] = g
    an_st[...] = a_next

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        dA_ref[...] = dA_st[...]


def _expand_rows(A2, G, BG):
    """Per-group (G, ...) rows -> per-(batch, group) (BG, ...) rows."""
    return jnp.tile(A2, (BG // G,) + (1,) * (A2.ndim - 1))


def _fwd_core(dt2, u2, B2, C2, A2, Dv, dims, delta_softplus, interpret,
              h0=None):
    """Forward pallas call on grouped (B*G, L, Cg) operands."""
    BG, L, Cg, G, N = dims
    bt, chunk, step = _tiling(BG, L, Cg, N)
    # per-group A/D -> per-(batch, group) rows (bg = b*G + g -> index % G)
    # so a bt-tile block spanning groups reads its own rows; KB-scale tiles
    A_full = _expand_rows(A2, G, BG)
    D_full = _expand_rows(Dv, G, BG)
    if h0 is None:
        h0 = jnp.zeros((BG, N, Cg), jnp.float32)

    kernel = functools.partial(_fwd_kernel, chunk=chunk, step=step,
                               softplus=delta_softplus)
    seq = pl.BlockSpec((bt, chunk, Cg), lambda bg, l: (bg, l, 0),
                       memory_space=pltpu.VMEM)
    seqn = pl.BlockSpec((bt, chunk, N), lambda bg, l: (bg, l, 0),
                        memory_space=pltpu.VMEM)
    nc = pl.BlockSpec((bt, N, Cg), lambda bg, l: (bg, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BG // bt, L // chunk),
        in_specs=[
            seq, seq, seqn, seqn, nc,
            pl.BlockSpec((bt, 1, Cg), lambda bg, l: (bg, 0, 0),
                         memory_space=pltpu.VMEM),
            nc,
        ],
        out_specs=seq,
        out_shape=jax.ShapeDtypeStruct((BG, L, Cg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, N, Cg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(dt2, u2, B2, C2, A_full, D_full, h0)


def _carry_core(dt2, u2, B2, A_full, h0, dims, delta_softplus, interpret):
    """Per-row final hidden states (no y): pass 1 of the two-level path."""
    BG, L, Cg, G, N = dims
    bt, chunk, step = _tiling(BG, L, Cg, N)
    kernel = functools.partial(_carry_kernel, chunk=chunk, step=step,
                               softplus=delta_softplus)
    seq = pl.BlockSpec((bt, chunk, Cg), lambda bg, l: (bg, l, 0),
                       memory_space=pltpu.VMEM)
    seqn = pl.BlockSpec((bt, chunk, N), lambda bg, l: (bg, l, 0),
                        memory_space=pltpu.VMEM)
    nc = pl.BlockSpec((bt, N, Cg), lambda bg, l: (bg, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BG // bt, L // chunk),
        in_specs=[seq, seq, seqn, nc, nc],
        out_specs=nc,
        out_shape=jax.ShapeDtypeStruct((BG, N, Cg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, N, Cg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(dt2, u2, B2, A_full, h0)


def _adjcarry_core(dt2, C2, dy2, A_full, dims, delta_softplus, interpret):
    """Per-row local adjoint carries (zero incoming): bwd pass 1."""
    BG, L, Cg, G, N = dims
    bt, chunk, step = _tiling(BG, L, Cg, N)
    Lc = L // chunk
    kernel = functools.partial(_adjcarry_kernel, chunk=chunk, step=step,
                               softplus=delta_softplus)
    rseq = pl.BlockSpec((bt, chunk, Cg), lambda bg, l: (bg, Lc - 1 - l, 0),
                        memory_space=pltpu.VMEM)
    rseqn = pl.BlockSpec((bt, chunk, N), lambda bg, l: (bg, Lc - 1 - l, 0),
                         memory_space=pltpu.VMEM)
    nc = pl.BlockSpec((bt, N, Cg), lambda bg, l: (bg, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BG // bt, Lc),
        in_specs=[rseq, rseqn, rseq, nc],
        out_specs=nc,
        out_shape=jax.ShapeDtypeStruct((BG, N, Cg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, N, Cg), jnp.float32),
                        pltpu.VMEM((bt, N, Cg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(dt2, C2, dy2, A_full)


def _bwd_core(dt2, u2, B2, C2, dy2, A2, dims, delta_softplus, interpret,
              h0=None, g0=None, a0=None):
    """Checkpoint + reverse-sweep pallas calls on grouped operands.
    Returns (dus, ddt2, dB2, dC2, dA2) in grouped layouts. h0/g0/a0 seed
    the forward state and the incoming-from-the-right adjoint carry
    (zeros = whole-sequence case)."""
    BG, L, Cg, G, N = dims
    bt, chunk, step = _tiling(BG, L, Cg, N, bwd=True)
    Lc = L // chunk
    A_full = _expand_rows(A2, G, BG)
    if h0 is None:
        h0 = jnp.zeros((BG, N, Cg), jnp.float32)
    if g0 is None:
        g0 = jnp.zeros((BG, N, Cg), jnp.float32)
    if a0 is None:
        a0 = jnp.zeros((BG, N, Cg), jnp.float32)

    seq = pl.BlockSpec((bt, chunk, Cg), lambda bg, l: (bg, l, 0),
                       memory_space=pltpu.VMEM)
    seqn = pl.BlockSpec((bt, chunk, N), lambda bg, l: (bg, l, 0),
                        memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((bt, N, Cg), lambda bg, l: (bg, 0, 0),
                          memory_space=pltpu.VMEM)
    ck_spec = pl.BlockSpec((bt, 1, N, Cg), lambda bg, l: (bg, l, 0, 0),
                           memory_space=pltpu.VMEM)

    ck_kernel = functools.partial(_ckpt_kernel, chunk=chunk, step=step,
                                  softplus=delta_softplus)
    hck = pl.pallas_call(
        ck_kernel,
        grid=(BG // bt, Lc),
        in_specs=[seq, seq, seqn, a_spec, a_spec],
        out_specs=ck_spec,
        out_shape=jax.ShapeDtypeStruct((BG, Lc, N, Cg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, N, Cg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(dt2, u2, B2, A_full, h0)

    # reverse-order index maps: grid step l processes chunk Lc-1-l
    rseq = pl.BlockSpec((bt, chunk, Cg), lambda bg, l: (bg, Lc - 1 - l, 0),
                        memory_space=pltpu.VMEM)
    rseqn = pl.BlockSpec((bt, chunk, N), lambda bg, l: (bg, Lc - 1 - l, 0),
                         memory_space=pltpu.VMEM)
    rck = pl.BlockSpec((bt, 1, N, Cg), lambda bg, l: (bg, Lc - 1 - l, 0, 0),
                       memory_space=pltpu.VMEM)

    bw_kernel = functools.partial(_bwd_kernel, chunk=chunk, step=step,
                                  softplus=delta_softplus, N=N)
    return pl.pallas_call(
        bw_kernel,
        grid=(BG // bt, Lc),
        in_specs=[rseq, rseq, rseqn, rseqn, rseq, a_spec, rck, a_spec,
                  a_spec],
        out_specs=(rseq, rseq, rseqn, rseqn,
                   pl.BlockSpec((bt, N, Cg), lambda bg, l: (bg, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((BG, L, Cg), jnp.float32),
            jax.ShapeDtypeStruct((BG, L, Cg), jnp.float32),
            jax.ShapeDtypeStruct((BG, L, N), jnp.float32),
            jax.ShapeDtypeStruct((BG, L, N), jnp.float32),
            jax.ShapeDtypeStruct((BG, N, Cg), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, bt, N, Cg), jnp.float32),
            pltpu.VMEM((bt, N, Cg), jnp.float32),
            pltpu.VMEM((bt, N, Cg), jnp.float32),
            pltpu.VMEM((bt, N, Cg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(dt2, u2, B2, C2, dy2, A_full, hck, g0, a0)


# ---------------------------------------------------------------------------
# Two-level (segmented) long-L path. The kernels above walk L sequentially
# per (batch, group) row; at CD-Mamba shapes (L = 65536, 16 rows) that
# serial walk IS the model's floor. Segmenting L into S pieces makes the
# walk parallel over BG*S rows at ~2x the recurrence FLOPs:
#   fwd:  pass 1 per-segment local carries (h0 = 0, no y) -> tiny XLA
#         combine over segment summaries (P_s = exp(A * sum_seg dt), an
#         associative scan over S) -> pass 2 the normal fwd kernel seeded
#         with each segment's true incoming state.
#   bwd:  same trick on the reversed adjoint recurrence
#         g_l = C_l dy_l + a_{l+1} g_{l+1} (per-segment local adjoint
#         carries -> reverse combine with Q_s = exp(A * shifted segment
#         dt-sum) -> seeded ckpt + reverse kernels per segment).
# All cross-segment objects are (BG, S, N, Cg) — KBs, never L-sized.
# ---------------------------------------------------------------------------

# Default OFF (sentinel): the on-chip sweep at cd_mamba's dominant shapes
# (tools/probe_seg_scan.py, artifacts/bench_r04/seg_scan_sweep.txt) says the
# two-level path LOSES at every compiling tiling — enc0 (BG=16, L=65536)
# infer 15.39 ms seq vs 19.8-21.3 seg, train 52.2 vs 59.5-62.5; enc1
# likewise. With bt-tiled rows the recurrence is VPU-THROUGHPUT-bound, not
# row-loop-overhead-bound, so the segmented form's second full-L pass (+
# combine) is pure extra element work. The machinery stays (correct,
# tested, and the sweep doubles as the cd_mamba scan-ceiling evidence);
# set SCAN_SEG_MIN_L to re-enable for genuinely loop-bound shapes
# (BG*bt small at huge L).
_SEG_MIN_L = int(_os.environ.get("SCAN_SEG_MIN_L", str(1 << 30)))
_SEG_TARGET_ROWS = int(_os.environ.get("SCAN_SEG_TARGET_ROWS", "256"))
_SEG_MIN_K = int(_os.environ.get("SCAN_SEG_MIN_K", "2048"))


def _seg_S(BG: int, L: int) -> int:
    """Segment count: power of two dividing L, targeting ~_SEG_TARGET_ROWS
    parallel rows while each segment keeps >= _SEG_MIN_K steps. 1 = don't
    segment."""
    if L < _SEG_MIN_L:
        return 1
    S = 1
    while (BG * S * 2 <= _SEG_TARGET_ROWS and L % (S * 2) == 0
           and L // (S * 2) >= _SEG_MIN_K):
        S *= 2
    return S


def _seg_rows(t, S):
    """(BG, L, c) -> (BG*S, L/S, c) — contiguous, free."""
    BG, L, c = t.shape
    return t.reshape(BG * S, L // S, c)


def _seg_csums(dt2, S, softplus):
    """Per-segment dt sums and first-row dts: ((BG, S, Cg), (BG, S, Cg))."""
    BG, L, Cg = dt2.shape
    c = dt2.astype(jnp.float32)
    if softplus:
        c = jax.nn.softplus(c)
    cs = c.reshape(BG, S, L // S, Cg)
    return jnp.sum(cs, axis=2), cs[:, :, 0]


def _fwd_segmented(dt2, u2, B2, C2, A_full, D_full, dims, S,
                   delta_softplus, interpret):
    BG, L, Cg, _, N = dims
    K = L // S
    sdims = (BG * S, K, Cg, BG * S, N)      # G == rows: expansion is a no-op
    A_seg = jnp.repeat(A_full, S, axis=0)
    D_seg = jnp.repeat(D_full, S, axis=0)
    dts, us, Bs, Cs = (_seg_rows(t, S) for t in (dt2, u2, B2, C2))

    h0 = jnp.zeros((BG * S, N, Cg), jnp.float32)
    hend = _carry_core(dts, us, Bs, A_seg, h0, sdims, delta_softplus,
                       interpret).reshape(BG, S, N, Cg)
    csum, _ = _seg_csums(dt2, S, delta_softplus)
    P = jnp.exp(csum[:, :, None, :] * A_full[:, None])      # (BG, S, N, Cg)

    def op(a, b):  # compose "apply a then b": h -> Pb (Pa h + ha) + hb
        Pa, ha = a
        Pb, hb = b
        return Pa * Pb, Pb * ha + hb

    _, Hinc = jax.lax.associative_scan(op, (P, hend), axis=1)
    Hprev = jnp.pad(Hinc[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    y = _fwd_core(dts, us, Bs, Cs, A_seg, D_seg, sdims, delta_softplus,
                  interpret, h0=Hprev.reshape(BG * S, N, Cg))
    return y.reshape(BG, L, Cg), Hprev


def _bwd_segmented(dt2, u2, B2, C2, dy2, A_full, dims, S,
                   delta_softplus, interpret):
    BG, L, Cg, _, N = dims
    K = L // S
    sdims = (BG * S, K, Cg, BG * S, N)
    A_seg = jnp.repeat(A_full, S, axis=0)
    dts, us, Bs, Cs, dys = (_seg_rows(t, S)
                            for t in (dt2, u2, B2, C2, dy2))

    # forward carries (recomputed; natural-sized)
    h0 = jnp.zeros((BG * S, N, Cg), jnp.float32)
    hend = _carry_core(dts, us, Bs, A_seg, h0, sdims, delta_softplus,
                       interpret).reshape(BG, S, N, Cg)
    csum, cfirst = _seg_csums(dt2, S, delta_softplus)
    Af = A_full[:, None]                                    # (BG, 1, N, Cg)
    P = jnp.exp(csum[:, :, None, :] * Af)

    def fwd_op(a, b):
        Pa, ha = a
        Pb, hb = b
        return Pa * Pb, Pb * ha + hb

    _, Hinc = jax.lax.associative_scan(fwd_op, (P, hend), axis=1)
    Hprev = jnp.pad(Hinc[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))

    # local adjoint carries and the reverse combine
    gloc = _adjcarry_core(dts, Cs, dys, A_seg, sdims, delta_softplus,
                          interpret).reshape(BG, S, N, Cg)
    cnext = jnp.pad(cfirst[:, 1:], ((0, 0), (0, 1), (0, 0)))  # c at row (s+1)K
    Q = jnp.exp((csum - cfirst + cnext)[:, :, None, :] * Af)

    def rev_op(a, b):
        # reverse scan passes (a=suffix-accumulated T_{s+1..}, b=current
        # T_s); the composed transform applies a FIRST then b:
        # E -> gb + Qb (ga + Qa E)
        Qa, ga = a
        Qb, gb = b
        return Qb * Qa, gb + Qb * ga

    _, Etrue = jax.lax.associative_scan(rev_op, (Q, gloc), axis=1,
                                        reverse=True)
    # segment s's incoming adjoint = true g at row (s+1)K; its a0 = a there
    g0 = jnp.pad(Etrue[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    a0 = jnp.exp(cnext[:, :, None, :] * Af)
    a0 = a0.at[:, -1].set(0.0)

    dus, ddt2, dB2, dC2, dA2 = _bwd_core(
        dts, us, Bs, Cs, dys, A_seg, sdims, delta_softplus, interpret,
        h0=Hprev.reshape(BG * S, N, Cg), g0=g0.reshape(BG * S, N, Cg),
        a0=a0.reshape(BG * S, N, Cg))
    unseg = lambda t: t.reshape(BG, L, t.shape[-1])
    return (unseg(dus), unseg(ddt2), unseg(dB2), unseg(dC2),
            jnp.sum(dA2.reshape(BG, S, N, Cg), axis=1))


def _regrouped(u, delta, A, Bmat, Cmat, delta_bias):
    """(B, L, G*Cg)/(B, L, G, N) operands -> per-(batch, group) layouts for
    the kernels. The copies here are all natural-sized — N-times smaller
    than anything the unfused paths materialise."""
    B, L, Dch = u.shape
    _, _, G, N = Bmat.shape
    Cg = Dch // G

    def regroup(t):
        return (t.reshape(B, L, G, Cg).transpose(0, 2, 1, 3)
                .reshape(B * G, L, Cg))

    u2 = regroup(u)
    dt2 = regroup(delta if delta_bias is None
                  else delta.astype(jnp.float32)
                  + delta_bias.astype(jnp.float32).reshape(1, 1, Dch))
    B2 = Bmat.transpose(0, 2, 1, 3).reshape(B * G, L, N)
    C2 = Cmat.transpose(0, 2, 1, 3).reshape(B * G, L, N)
    A2 = A.astype(jnp.float32).reshape(G, Cg, N).transpose(0, 2, 1)  # (G,N,Cg)
    return u2, dt2, B2, C2, A2, (B, L, Dch, G, Cg, N), regroup


def _forward_impl(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
                  interpret):
    u2, dt2, B2, C2, A2, (B, L, Dch, G, Cg, N), _ = _regrouped(
        u, delta, A, Bmat, Cmat, delta_bias)
    Dv = (D.astype(jnp.float32) if D is not None
          else jnp.zeros((Dch,), jnp.float32)).reshape(G, 1, Cg)
    dims = (B * G, L, Cg, G, N)
    S = _seg_S(B * G, L)
    if S > 1:
        y, _ = _fwd_segmented(dt2, u2, B2, C2, _expand_rows(A2, G, B * G),
                              _expand_rows(Dv, G, B * G), dims, S,
                              delta_softplus, interpret)
    else:
        y = _fwd_core(dt2, u2, B2, C2, A2, Dv, dims, delta_softplus,
                      interpret)
    y = (y.reshape(B, G, L, Cg).transpose(0, 2, 1, 3).reshape(B, L, Dch))
    return y.astype(u.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def selective_scan_fused(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                         delta_softplus=False, interpret=False):
    """Same contract as ops.scan.selective_scan: u/delta (B, L, Dch),
    A (Dch, N), Bmat/Cmat (B, L, G, N), D/delta_bias (Dch,).
    Returns y (B, L, Dch) in u's dtype; fp32 internals. Forward AND
    backward are fully fused Pallas kernels."""
    return _forward_impl(u, delta, A, Bmat, Cmat, D, delta_bias,
                         delta_softplus, interpret)


def _fused_fwd(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
               interpret):
    y = _forward_impl(u, delta, A, Bmat, Cmat, D, delta_bias,
                      delta_softplus, interpret)
    return y, (u, delta, A, Bmat, Cmat, D, delta_bias)


def _fused_bwd(delta_softplus, interpret, res, gy):
    u, delta, A, Bmat, Cmat, D, delta_bias = res
    u2, dt2, B2, C2, A2, (B, L, Dch, G, Cg, N), regroup = _regrouped(
        u, delta, A, Bmat, Cmat, delta_bias)
    dy2 = regroup(gy.astype(jnp.float32))

    dims = (B * G, L, Cg, G, N)
    S = _seg_S(B * G, L)
    if S > 1:
        dus, ddt2, dB2, dC2, dA2 = _bwd_segmented(
            dt2, u2, B2, C2, dy2, _expand_rows(A2, G, B * G), dims, S,
            delta_softplus, interpret)
    else:
        dus, ddt2, dB2, dC2, dA2 = _bwd_core(
            dt2, u2, B2, C2, dy2, A2, dims, delta_softplus, interpret)

    def ungroup(t):  # (B*G, L, Cg) -> (B, L, Dch)
        return (t.reshape(B, G, L, Cg).transpose(0, 2, 1, 3)
                .reshape(B, L, Dch))

    gyf = gy.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    du = ungroup(dus)
    if D is not None:
        du = du + gyf * D.astype(jnp.float32)
        dD = jnp.sum(gyf * uf, axis=(0, 1)).astype(D.dtype)
    else:
        dD = None
    ddt = ungroup(ddt2)
    if delta_softplus:
        dt_in = delta.astype(jnp.float32)
        if delta_bias is not None:
            dt_in = dt_in + delta_bias.astype(jnp.float32).reshape(1, 1, Dch)
        ddt = ddt * jax.nn.sigmoid(dt_in)
    ddelta_bias = (jnp.sum(ddt, axis=(0, 1)).astype(delta_bias.dtype)
                   if delta_bias is not None else None)
    dB = (dB2.reshape(B, G, L, N).transpose(0, 2, 1, 3)).astype(Bmat.dtype)
    dC = (dC2.reshape(B, G, L, N).transpose(0, 2, 1, 3)).astype(Cmat.dtype)
    dA = (jnp.sum(dA2.reshape(B, G, N, Cg), axis=0).transpose(0, 2, 1)
          .reshape(Dch, N)).astype(A.dtype)
    return (du.astype(u.dtype), ddt.astype(delta.dtype), dA, dB, dC, dD,
            ddelta_bias)


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Grouped-layout entry: SS2D produces (B, K, L, D) direction-major tensors;
# feeding them to the standard contract costs two full-tensor transposes that
# the kernel regrouping immediately undoes. This wrapper takes the grouped
# layout directly — every reshape below is contiguous (free).
# ---------------------------------------------------------------------------


def _grouped_args(xs, dts, A, Bs, Cs, delta_bias):
    B, K, L, D = xs.shape
    N = Bs.shape[-1]
    u2 = xs.reshape(B * K, L, D)
    if delta_bias is not None:
        dts = (dts.astype(jnp.float32)
               + delta_bias.astype(jnp.float32).reshape(1, K, 1, D))
    dt2 = dts.reshape(B * K, L, D)
    B2 = Bs.reshape(B * K, L, N)
    C2 = Cs.reshape(B * K, L, N)
    A2 = A.astype(jnp.float32).reshape(K, D, N).transpose(0, 2, 1)  # (K,N,D)
    return u2, dt2, B2, C2, A2, (B, K, L, D, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def selective_scan_fused_grouped(xs, dts, A, Bs, Cs, D=None, delta_bias=None,
                                 delta_softplus=False, interpret=False):
    """Direction-major contract: xs/dts (B, K, L, Dk), Bs/Cs (B, K, L, N),
    A/D/delta_bias flattened over (K*Dk). Returns ys (B, K, L, Dk)."""
    return _grouped_forward(xs, dts, A, Bs, Cs, D, delta_bias,
                            delta_softplus, interpret)


def _grouped_forward(xs, dts, A, Bs, Cs, D, delta_bias, delta_softplus,
                     interpret):
    u2, dt2, B2, C2, A2, (B, K, L, Dk, N) = _grouped_args(
        xs, dts, A, Bs, Cs, delta_bias)
    Dv = (D.astype(jnp.float32) if D is not None
          else jnp.zeros((K * Dk,), jnp.float32)).reshape(K, 1, Dk)
    dims = (B * K, L, Dk, K, N)
    S = _seg_S(B * K, L)
    if S > 1:
        y, _ = _fwd_segmented(dt2, u2, B2, C2, _expand_rows(A2, K, B * K),
                              _expand_rows(Dv, K, B * K), dims, S,
                              delta_softplus, interpret)
    else:
        y = _fwd_core(dt2, u2, B2, C2, A2, Dv, dims, delta_softplus,
                      interpret)
    return y.reshape(B, K, L, Dk).astype(xs.dtype)


def _grouped_fwd(xs, dts, A, Bs, Cs, D, delta_bias, delta_softplus,
                 interpret):
    y = _grouped_forward(xs, dts, A, Bs, Cs, D, delta_bias, delta_softplus,
                         interpret)
    return y, (xs, dts, A, Bs, Cs, D, delta_bias)


def _grouped_bwd(delta_softplus, interpret, res, gy):
    xs, dts, A, Bs, Cs, D, delta_bias = res
    u2, dt2, B2, C2, A2, (B, K, L, Dk, N) = _grouped_args(
        xs, dts, A, Bs, Cs, delta_bias)
    dy2 = gy.astype(jnp.float32).reshape(B * K, L, Dk)

    dims = (B * K, L, Dk, K, N)
    S = _seg_S(B * K, L)
    if S > 1:
        dus, ddt2, dB2, dC2, dA2 = _bwd_segmented(
            dt2, u2, B2, C2, dy2, _expand_rows(A2, K, B * K), dims, S,
            delta_softplus, interpret)
    else:
        dus, ddt2, dB2, dC2, dA2 = _bwd_core(
            dt2, u2, B2, C2, dy2, A2, dims, delta_softplus, interpret)

    gyf = gy.astype(jnp.float32)
    uf = xs.astype(jnp.float32)
    du = dus.reshape(B, K, L, Dk)
    if D is not None:
        du = du + gyf * D.astype(jnp.float32).reshape(1, K, 1, Dk)
        dD = jnp.sum(gyf * uf, axis=(0, 2)).reshape(K * Dk).astype(D.dtype)
    else:
        dD = None
    ddt = ddt2.reshape(B, K, L, Dk)
    if delta_softplus:
        dt_in = dts.astype(jnp.float32)
        if delta_bias is not None:
            dt_in = dt_in + delta_bias.astype(jnp.float32).reshape(
                1, K, 1, Dk)
        ddt = ddt * jax.nn.sigmoid(dt_in)
    ddelta_bias = (jnp.sum(ddt, axis=(0, 2)).reshape(K * Dk)
                   .astype(delta_bias.dtype)
                   if delta_bias is not None else None)
    dB = dB2.reshape(B, K, L, N).astype(Bs.dtype)
    dC = dC2.reshape(B, K, L, N).astype(Cs.dtype)
    dA = (jnp.sum(dA2.reshape(B, K, N, Dk), axis=0).transpose(0, 2, 1)
          .reshape(K * Dk, N)).astype(A.dtype)
    return (du.astype(xs.dtype), ddt.astype(dts.dtype), dA, dB, dC, dD,
            ddelta_bias)


selective_scan_fused_grouped.defvjp(_grouped_fwd, _grouped_bwd)
