"""Pallas TPU kernel for bilinear grid sampling (the OFW warp hot path).

Why a kernel: measured on v5e, the XLA gather formulation of `grid_sample`
is 44% of the whole SMOW_Net forward (47.5ms -> 26.5ms/batch-16 with the
warp removed; tools/profile_warp.py). TPU has no fast per-element gather —
XLA lowers the 4 corner gathers to a slow dynamic-gather loop.

TPU-native design: bilinear sampling *is* a sparse matmul, so feed the MXU
one-hot matrices instead of asking the VPU to gather:

  out[p, c] = sum_{i,j} w_i(p) u_j(p) x[y_i(p), x_j(p), c]

Per tile of `tile_p` output pixels (grid = (B, P/tile_p)):
  1. build exact 0/1 one-hot row selectors OH_k[h, p] = (h == y_k[p]) and
     gather both corner ROWS with two MXU matmuls
     v_k = x^T @ OH_k  ((W*C, H) @ (H, tile_p)) — exact in any dtype since
     each output sums exactly one nonzero product;
  2. lerp the rows vertically in fp32;
  3. select/lerp columns with a fused expanded weight mask
     wh[w*C+c, p] = u_0(p)[w==x_0(p)] + u_1(p)[w==x_1(p)] (VPU, fp32);
  4. reduce the W axis by log2(W) static tensor-halving adds — lane
     congruence mod C is preserved, so no lane-splitting reshape and no
     second matmul is needed.

The whole input image (e.g. 128x128x32 bf16 = 1 MB) stays VMEM-resident
across the pixel-tile grid axis. Corner gathers are bit-exact; the only
arithmetic is the fp32 lerp, so the kernel matches the XLA path to the
output-dtype ulp.

Backward: analytic custom VJP with a second kernel of the same one-hot
machinery — dx is the transposed one-hot matmul (scatter-as-matmul,
accumulated across pixel tiles in VMEM), and the grid gradient needs only
the four separable lerp-weight gradients (corner indices get zero grads),
chained through the index/weight precompute via jax.vjp of its pure-XLA
elementwise math. No gather or scatter HLO anywhere in fwd or bwd.

Reference hot loop: models/SMOW_Net.py:612-637 (F.grid_sample bilinear,
border, align_corners=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grid_sample_pallas", "grid_sample_transpose_pallas",
           "grid_sample_transpose_vjp_pallas", "pallas_warp_supported",
           "token_scatter_pallas"]

# 256 pixels per tile: per-program fixed overhead (dispatch, idxw loads,
# output writes) was a measurable share of kernel time at 128; doubling the
# tile halves program count and gives the MXU larger matmuls. VMEM limits
# are raised accordingly (v5e has 128 MB).
_TILE_P = 256
# The backward kernel's ~10 live (W*C, tile) temporaries double with the
# tile; train-step A/Bs favoured the smaller tile for the backward pass
# while the forward keeps 256.
_TILE_P_BWD = 128
# The transpose (scatter-as-matmul) kernel is a primal op on the fused OFW
# token path and keeps only ~3 (W*C, tile) temporaries — no image block, no
# weight-grad work — so it (and the forward kernel) pick their pixel tile
# dynamically. Per-tile fixed cost (mask build, dxt accumulate pass)
# dominates at C=8: measured marginal 1.7 -> 0.8 ms for 32 frames of 128^2
# going 128 -> 1024 (tools/profile_breakdown.py PB_ONLY=ofwparts); the
# forward kernel gains ~10% at 1024 too.


# A/B override for _pick_tile (tools/probe_token_tile_lw.py). Verdict at
# the LW warp shapes (W*C = 2048, where the 24 MB budget lands tile 512):
# NULL — stage 4.26-4.51 ms and whole-model LW infer 1698-1715 pairs/s
# with tile 512 and 1024 alike (artifacts/bench_r04/token_tile_lw.txt);
# the r3 first-order sensitivity is specific to W*C<=1024, so the budget
# stands. None = use the budget.
_TILE_FORCE = None


def set_tile_force(v):
    global _TILE_FORCE
    _TILE_FORCE = v


def _pick_tile(P: int, wc: int, floor: int) -> int:
    """Largest pixel tile <= 1024 dividing P whose ~4 (W*C, tile) fp32
    temporaries stay within ~24 MB of VMEM (the image block, index rows and
    pipelining head-room take the rest of the 48 MB limit)."""
    if _TILE_FORCE is not None:
        if P % _TILE_FORCE == 0:
            return _TILE_FORCE
        # A silently-ignored force would make an A/B probe report a spurious
        # NULL (both arms running the budget tile); make the fallback loud.
        import warnings
        warnings.warn(
            f"warp _TILE_FORCE={_TILE_FORCE} does not divide P={P}; "
            "falling back to the budget tile", stacklevel=2)
    cap = max(floor, (24 * 1024 * 1024) // (wc * 4 * 4))
    t = 128
    while t * 2 <= min(cap, 1024) and P % (t * 2) == 0:
        t *= 2
    return t
# The backward kernel keeps ~10 (W*C, tile) fp32 temporaries live (one-hots,
# lerps, expanded grads) plus the image and dx-accumulator blocks; at
# tile=128 and W*C=4096 that needs ~18 MB of scoped VMEM (measured 17.96 MB
# on v5e), over Mosaic's conservative 16 MB default. The tile can't shrink
# (128 lanes is the minimum block), so raise the limit — v5e has 128 MB.
_BWD_VMEM_LIMIT = 48 * 1024 * 1024


def _prec(dtype):
    """MXU matmuls truncate f32 operands to bf16 at default precision; the
    one-hot gathers are only exact if the value operand survives intact."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _kernel(idxw_ref, xt_ref, out_ref, *, H: int, W: int, C: int):
    tp = out_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]   # (1, tp) fp32, integer-valued
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    xt = xt_ref[0]  # (W*C, H)
    # Mosaic iota must be integer-typed; indices arrive fp32 -> cast once
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    dims = (((1,), (0,)), ((), ()))
    # f32 operands need HIGHEST or the MXU truncates them to bf16 mid-gather
    prec = _prec(xt.dtype)
    # fold the vertical lerp INTO the gather: one matmul against
    # M = wy0*OH0 + wy1*OH1 replaces two corner-row gathers + a VPU lerp
    # (2x fewer MXU passes — this matmul is the kernel's dominant cost; the
    # bwd kernel's wvt matmul uses the same folding). Each output sums two
    # products accumulated in fp32; for bf16 inputs the weights round to
    # bf16 (~2^-9 rel, inside the output dtype's own ulp).
    m = (wy0 * (ioh == y0.astype(jnp.int32))
         + wy1 * (ioh == y1.astype(jnp.int32))).astype(xt.dtype)
    v = jax.lax.dot_general(xt, m, dims, preferred_element_type=jnp.float32,
                            precision=prec)  # (W*C, tp) fp32, lerped rows

    # horizontal lerp mask: build the (W, tp) form and broadcast each row
    # C times along sublanes — the direct (W*C, tp) iota-compare build was
    # ~6 VPU passes over a 32x-larger tile and dominated the kernel
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    fh = (wx0 * (iw == x0.astype(jnp.int32))
          + wx1 * (iw == x1.astype(jnp.int32)))
    wh = jnp.broadcast_to(fh[:, None, :], (W, C, tp)).reshape(W * C, tp)
    t = v * wh
    # fold W down to C: halving adds keep lane index congruent mod C
    rows = W * C
    while rows > C:
        rows //= 2
        t = t[:rows, :] + t[rows:, :]
    out_ref[0] = t.astype(out_ref.dtype)


def _bwd_kernel(idxw_ref, xt_ref, gt_ref, dxt_ref, dw_ref, *,
                H: int, W: int, C: int):
    """Per pixel-tile, three matmuls around ONE expanded operand:

      whg[w*C+c, p] = wh[w,p] g[c,p]          (single (W*C, tile) expand)
      dx  += whg @ Wv^T                        (scatter, accumulated)
      z    = xt^T @ whg                        -> dwy_k = sum_h OH_k . z
      v    = xt @ Wv                           -> vertically-lerped rows
      s[w,p] = sum_c v[w*C+c,p] g[c,p]         -> dwx_j = sum_w fx_j . s

    The v-matmul route makes BOTH horizontal weight grads a (W, tile)-sized
    VPU fold (dwx_j[p] = sum_c g . v[x_j*C+c, p]), so the per-corner
    (W*C, tile) expansions (wg0/wg1) and the border-mode difference trick of
    the previous kernel disappear; border and zeros modes share one path
    (the idxw weights already carry the zeros masks)."""
    tp = dw_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    xt = xt_ref[0]          # (W*C, H)
    gt = gt_ref[0]          # (C, tp)
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    oh0 = (ioh == y0.astype(jnp.int32)).astype(jnp.float32)
    oh1 = (ioh == y1.astype(jnp.int32)).astype(jnp.float32)
    prec = _prec(xt.dtype)

    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    fx0 = (iw == x0.astype(jnp.int32)).astype(jnp.float32)
    fx1 = (iw == x1.astype(jnp.int32)).astype(jnp.float32)
    wh = wx0 * fx0 + wx1 * fx1                  # (W, tp) masked lerp row
    gf = gt.astype(jnp.float32)
    whg = (wh[:, None, :] * gf[None, :, :]).reshape(W * C, tp).astype(xt.dtype)
    wvt = wy0 * oh0 + wy1 * oh1                 # (H, tp)

    dims0 = (((0,), (0,)), ((), ()))
    z = jax.lax.dot_general(xt, whg, dims0,
                            preferred_element_type=jnp.float32,
                            precision=prec)     # (H, tp)
    v = jax.lax.dot_general(xt, wvt.astype(xt.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)     # (W*C, tp)
    s = jnp.sum(v.reshape(W, C, tp) * gf[None, :, :], axis=1)  # (W, tp)
    zero = jnp.zeros((1, tp), jnp.float32)
    dw_ref[0] = jnp.concatenate([
        zero, zero,
        jnp.sum(oh0 * z, axis=0, keepdims=True),
        jnp.sum(oh1 * z, axis=0, keepdims=True),
        zero, zero,
        jnp.sum(fx0 * s, axis=0, keepdims=True),
        jnp.sum(fx1 * s, axis=0, keepdims=True),
    ], axis=0)

    contrib = jax.lax.dot_general(
        whg, wvt.astype(xt.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dxt_ref[0] = jnp.zeros_like(dxt_ref[0])

    dxt_ref[0] += contrib


def _t_vjp_kernel(idxw_ref, xbt_ref, gt_ref, dg_ref, dw_ref, *,
                  H: int, W: int, C: int):
    """The ENTIRE VJP of the transpose (scatter) op in one pass, given the
    primal pixel tensor g and the image-side cotangent Xb:

      v    = Xb^T-layout @ Wv                  (vertically-lerped rows of Xb)
      dg   = fold_W(v . Wh_exp)                (the forward warp of Xb)
      s[w,p] = sum_c v[w*C+c,p] g[c,p]         -> dwx_j = sum_w fx_j . s
      z    = Xb @ (Wh (x) g)                   -> dwy_k = sum_h OH_k . z

    Two matmuls total, where the previous route paid three across two
    kernels (a standalone forward-warp pallas_call for dg + a dw-only
    kernel with two per-corner expanded matmuls) and built every one-hot
    mask twice."""
    tp = dw_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    xbt = xbt_ref[0]        # (W*C, H) — the image-side cotangent, transposed
    gt = gt_ref[0]          # (C, tp)  — the primal pixel tensor
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    oh0 = (ioh == y0.astype(jnp.int32)).astype(jnp.float32)
    oh1 = (ioh == y1.astype(jnp.int32)).astype(jnp.float32)
    prec = _prec(xbt.dtype)

    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    fx0 = (iw == x0.astype(jnp.int32)).astype(jnp.float32)
    fx1 = (iw == x1.astype(jnp.int32)).astype(jnp.float32)
    wh = wx0 * fx0 + wx1 * fx1                  # (W, tp)
    gf = gt.astype(jnp.float32)
    wvt = wy0 * oh0 + wy1 * oh1                 # (H, tp)

    v = jax.lax.dot_general(xbt, wvt.astype(xbt.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)     # (W*C, tp)
    # dg: horizontal lerp of the gathered rows — the forward kernel's tail
    whx = jnp.broadcast_to(wh[:, None, :], (W, C, tp)).reshape(W * C, tp)
    t = v * whx
    rows = W * C
    while rows > C:
        rows //= 2
        t = t[:rows, :] + t[rows:, :]
    dg_ref[0] = t.astype(dg_ref.dtype)

    s = jnp.sum(v.reshape(W, C, tp) * gf[None, :, :], axis=1)  # (W, tp)
    whg = (wh[:, None, :] * gf[None, :, :]).reshape(W * C, tp).astype(xbt.dtype)
    z = jax.lax.dot_general(xbt, whg, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)     # (H, tp)
    zero = jnp.zeros((1, tp), jnp.float32)
    dw_ref[0] = jnp.concatenate([
        zero, zero,
        jnp.sum(oh0 * z, axis=0, keepdims=True),
        jnp.sum(oh1 * z, axis=0, keepdims=True),
        zero, zero,
        jnp.sum(fx0 * s, axis=0, keepdims=True),
        jnp.sum(fx1 * s, axis=0, keepdims=True),
    ], axis=0)


def grid_sample_transpose_vjp_pallas(g, grid, xbar, padding_mode="border",
                                     align_corners=True, interpret=False):
    """(dg, dgrid) of `grid_sample_transpose_pallas(g, grid)` against the
    image-side cotangent `xbar` — one fused kernel (see _t_vjp_kernel)."""
    B, H, W, C = xbar.shape
    _, Hg, Wg, _ = grid.shape
    P = Hg * Wg
    idxw, f_vjp = jax.vjp(
        lambda gr: _corner_indices_weights(gr, H, W, padding_mode,
                                           align_corners),
        grid)
    xbt = xbar.reshape(B, H, W * C).transpose(0, 2, 1)
    gt = g.reshape(B, P, C).transpose(0, 2, 1)

    tp = _pick_tile(P, W * C * 3 // 2, floor=_TILE_P_BWD)
    kernel = functools.partial(_t_vjp_kernel, H=H, W=W, C=C)
    dg, dw = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, P), g.dtype),
            jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, xbt, gt)
    (dgrid,) = f_vjp(dw)
    return dg.transpose(0, 2, 1).reshape(B, Hg, Wg, C), dgrid


def _t_kernel(idxw_ref, gt_ref, dxt_ref, *, H: int, W: int, C: int):
    """Transposed sampling (scatter-as-matmul): dx^T (W*C, H) +=
    (Wh_exp . G_exp) @ Wv^T per pixel tile — the dx half of `_bwd_kernel`
    without the primal image or weight-gradient work. Used as a primal op
    by the fused OFW token path (sum_n att[n] . warp(x)[n] ==
    sum_m x[m] . warpT(att)[m])."""
    tp = gt_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    gt = gt_ref[0]          # (C, tp)
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    fx0 = (iw == x0.astype(jnp.int32)).astype(jnp.float32)
    fx1 = (iw == x1.astype(jnp.int32)).astype(jnp.float32)
    wh = jnp.broadcast_to((wx0 * fx0 + wx1 * fx1)[:, None, :],
                          (W, C, tp)).reshape(W * C, tp)
    g_exp = jnp.broadcast_to(gt.astype(jnp.float32)[None, :, :],
                             (W, C, tp)).reshape(W * C, tp)
    wvt = (wy0 * (ioh == y0.astype(jnp.int32))
           + wy1 * (ioh == y1.astype(jnp.int32)))
    contrib = jax.lax.dot_general(
        (wh * g_exp), wvt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dxt_ref[0] = jnp.zeros_like(dxt_ref[0])

    dxt_ref[0] += contrib


def grid_sample_transpose_pallas(g, grid, out_hw, padding_mode="border",
                                 align_corners=True, interpret=False):
    """Adjoint of `grid_sample_pallas` as a primal op: scatter `g`
    (B, Hg, Wg, C) through the sampling matrix of `grid` into an
    (B, H, W, C) image (fp32 accumulation, cast to g.dtype). Not
    differentiable on its own — callers wrap it (see ops/warp.py)."""
    B, Hg, Wg, C = g.shape
    H, W = out_hw
    P = Hg * Wg
    idxw = _corner_indices_weights(grid, H, W, padding_mode, align_corners)
    gt = g.reshape(B, P, C).transpose(0, 2, 1)

    tp = _pick_tile(P, W * C, floor=128)
    kernel = functools.partial(_t_kernel, H=H, W=W, C=C)
    dxt = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, gt)
    return dxt.transpose(0, 2, 1).reshape(B, H, W, C).astype(g.dtype)


def pallas_warp_supported(x_shape, grid_shape) -> bool:
    """Shapes the kernel handles efficiently (else fall back to XLA).

    The input image block (W*C, H) must fit VMEM alongside ~4 (W*C, 128)
    fp32 temporaries, H rides the lane axis, and W must be a power of two
    for the halving reduction."""
    B, H, W, C = x_shape
    _, Hg, Wg, _ = grid_shape
    P = Hg * Wg
    return (
        P % 128 == 0
        and W * C <= 4096
        and (W & (W - 1)) == 0
        and H % 8 == 0
        and H <= 512
        and C % 8 == 0
        and C <= 128
    )


def _corner_indices_weights(grid, H, W, padding_mode, align_corners):
    """Separable corner indices + lerp weights, (B, P) fp32 each.

    Same semantics as ops/warp.grid_sample (torch bilinear): border clamps
    coordinates pre-floor; zeros folds per-axis validity into the weights
    (w00 = wx0*wy0 etc. stays exactly the 4-corner weight because the mask
    factorizes per axis)."""
    B = grid.shape[0]
    gx = grid[..., 0].reshape(B, -1).astype(jnp.float32)
    gy = grid[..., 1].reshape(B, -1).astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5
    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    wx0, wx1 = 1.0 - tx, tx
    wy0, wy1 = 1.0 - ty, ty
    if padding_mode == "zeros":
        wx0 = wx0 * ((ix0 >= 0) & (ix0 < W))
        wx1 = wx1 * ((ix0 + 1 >= 0) & (ix0 + 1 < W))
        wy0 = wy0 * ((iy0 >= 0) & (iy0 < H))
        wy1 = wy1 * ((iy0 + 1 >= 0) & (iy0 + 1 < H))
    x0c = jnp.clip(ix0, 0, W - 1)
    x1c = jnp.clip(ix0 + 1, 0, W - 1)
    y0c = jnp.clip(iy0, 0, H - 1)
    y1c = jnp.clip(iy0 + 1, 0, H - 1)
    return jnp.stack([y0c, y1c, wy0, wy1, x0c, x1c, wx0, wx1], axis=1)


def _forward(x, grid, padding_mode, align_corners, interpret=False):
    B, H, W, C = x.shape
    _, Hg, Wg, _ = grid.shape
    P = Hg * Wg
    idxw = _corner_indices_weights(grid, H, W, padding_mode, align_corners)
    xt = x.reshape(B, H, W * C).transpose(0, 2, 1)  # (B, W*C, H), w-major lanes

    tp = _pick_tile(P, W * C, floor=_TILE_P)
    kernel = functools.partial(_kernel, H=H, W=W, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, P), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, xt)
    return out.transpose(0, 2, 1).reshape(B, Hg, Wg, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_pallas(x, grid, padding_mode="border", align_corners=True,
                       interpret=False):
    """Drop-in for ops.warp.grid_sample on supported shapes (see
    pallas_warp_supported); exact corner gathers, fp32 lerp."""
    return _forward(x, grid, padding_mode, align_corners, interpret)


def _fwd(x, grid, padding_mode, align_corners, interpret):
    return _forward(x, grid, padding_mode, align_corners, interpret), (x, grid)


def _bwd(padding_mode, align_corners, interpret, res, gy):
    x, grid = res
    B, H, W, C = x.shape
    _, Hg, Wg, _ = grid.shape
    P = Hg * Wg
    # index/weight precompute is pure elementwise XLA — differentiate it
    # with jax.vjp so clamp/mask semantics match the XLA path's autodiff
    idxw, f_vjp = jax.vjp(
        lambda g: _corner_indices_weights(g, H, W, padding_mode, align_corners),
        grid)
    xt = x.reshape(B, H, W * C).transpose(0, 2, 1)
    gt = gy.reshape(B, P, C).transpose(0, 2, 1)

    # the bwd kernel keeps ~4 expanded (W*C, tile) temporaries (wg0/wg1/whg
    # + one live product) -> its own budget; at the fused OFW path's C=8
    # (W*C=1024) this reaches 1024 pixels, while C=32 (W*C=4096) stays at
    # the hardware-validated 128
    tp = _pick_tile(P, W * C * 3 // 2, floor=_TILE_P_BWD)
    kernel = functools.partial(_bwd_kernel, H=H, W=W, C=C)
    dxt, dw = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, xt, gt)

    dx = dxt.transpose(0, 2, 1).reshape(B, H, W, C).astype(x.dtype)
    (dgrid,) = f_vjp(dw)
    return dx, dgrid


grid_sample_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused token-path warp: the OFW token pipeline's whole warped-softmax-scatter
# chain  aw = S a;  eaw = exp(aw - m);  ew = S^T eaw;  zaw = sum_n eaw
# (models/smow_net.py ofw_tokens_fused) as ONE kernel forward and ONE kernel
# backward. Unfused, this is 2 fwd + 2 bwd pallas_calls (warp, scatter, and
# their VJPs) that all rebuild the same one-hot masks from the same flow
# field, plus XLA elementwise passes and an HBM roundtrip for aw/eaw between
# them. Exactness of the shared max: border-mode bilinear weights are convex
# (>= 0, sum 1), so aw <= max_n a and m = max_n a is a safe softmax shift;
# softmax is shift-invariant, so the result is mathematically identical to
# shifting by max_n aw. eaw is never materialized in HBM — the backward
# recomputes it from the v_a gather it needs for the grid gradient anyway.
# ---------------------------------------------------------------------------


def _tok_kernel(idxw_ref, xt_ref, m_ref, ew_ref, z_ref, *,
                H: int, W: int, C: int, eaw_ref=None):
    """Per pixel tile: gather+lerp the logits (1 matmul), exponentiate
    against the per-(frame, l) shift m, accumulate zaw, and scatter the
    unnormalized exp back into the image grid (1 matmul). With `eaw_ref`
    (the hybrid train variant) the per-tile exp is also written out as a
    residual for the split backward."""
    tp = idxw_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    xt = xt_ref[0]                                  # (W*C, H) logits
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    prec = _prec(xt.dtype)
    wvt = (wy0 * (ioh == y0.astype(jnp.int32))
           + wy1 * (ioh == y1.astype(jnp.int32)))   # (H, tp)
    fh = (wx0 * (iw == x0.astype(jnp.int32))
          + wx1 * (iw == x1.astype(jnp.int32)))     # (W, tp)
    v = jax.lax.dot_general(xt, wvt.astype(xt.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)         # (W*C, tp)
    whx = jnp.broadcast_to(fh[:, None, :], (W, C, tp)).reshape(W * C, tp)
    t = v * whx
    rows = W * C
    while rows > C:
        rows //= 2
        t = t[:rows, :] + t[rows:, :]               # aw (C, tp) fp32
    m = m_ref[0][:, 0:1]                            # (C, 1)
    eaw = jnp.exp(t - m)                            # (C, tp) fp32
    if eaw_ref is not None:
        eaw_ref[0] = eaw.astype(eaw_ref.dtype)

    part = jnp.sum(eaw, axis=1, keepdims=True)      # (C, 1)
    whg = (fh[:, None, :] * eaw[None, :, :]).reshape(W * C, tp)
    contrib = jax.lax.dot_general(
        whg.astype(xt.dtype), wvt.astype(xt.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (W*C, H)

    @pl.when(pl.program_id(1) == 0)
    def _():
        ew_ref[0] = jnp.zeros_like(ew_ref[0])
        z_ref[0] = jnp.zeros_like(z_ref[0])

    ew_ref[0] += contrib
    z_ref[0] += jnp.broadcast_to(part, (C, 128))


def _tok_bwd_kernel(idxw_ref, at_ref, ebt_ref, mz_ref, dat_ref, dw_ref, *,
                    H: int, W: int, C: int):
    """The entire VJP of the token warp chain in one pass. Inputs: the primal
    logits a (as (W*C, H)), the image-side cotangent of ew, and the tiny
    per-(frame, l) [m; dzaw] rows. Per pixel tile, five matmuls:

      v_a  = a-gather        -> recompute aw -> eaw; dwx2-fold source
      v_eb = ewbar-gather    -> dg = S ewbar (fold);  dwx1-fold source
      daw  = (dg + dzaw) * eaw
      da  += (Wh (x) daw) @ Wv^T                      (scatter, accumulated)
      z_a  = a @ (Wh (x) daw);  z_e = ewbar @ (Wh (x) eaw)
      dwy_k = sum_h OH_k . (z_a + z_e)   (the two grid-grads sum — same grid)
    """
    tp = idxw_ref.shape[-1]
    y0 = idxw_ref[0, 0:1, :]
    y1 = idxw_ref[0, 1:2, :]
    wy0 = idxw_ref[0, 2:3, :]
    wy1 = idxw_ref[0, 3:4, :]
    x0 = idxw_ref[0, 4:5, :]
    x1 = idxw_ref[0, 5:6, :]
    wx0 = idxw_ref[0, 6:7, :]
    wx1 = idxw_ref[0, 7:8, :]

    at = at_ref[0]                                  # (W*C, H) primal logits
    ebt = ebt_ref[0]                                # (W*C, H) ew cotangent
    ioh = jax.lax.broadcasted_iota(jnp.int32, (H, tp), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, tp), 0)
    oh0 = (ioh == y0.astype(jnp.int32)).astype(jnp.float32)
    oh1 = (ioh == y1.astype(jnp.int32)).astype(jnp.float32)
    fx0 = (iw == x0.astype(jnp.int32)).astype(jnp.float32)
    fx1 = (iw == x1.astype(jnp.int32)).astype(jnp.float32)
    wvt = wy0 * oh0 + wy1 * oh1                     # (H, tp)
    fh = wx0 * fx0 + wx1 * fx1                      # (W, tp)
    whx = jnp.broadcast_to(fh[:, None, :], (W, C, tp)).reshape(W * C, tp)
    prec = _prec(at.dtype)
    dims_g = (((1,), (0,)), ((), ()))               # gather: (WC,H)@(H,tp)
    dims_z = (((0,), (0,)), ((), ()))               # z: contract WC

    v_a = jax.lax.dot_general(at, wvt.astype(at.dtype), dims_g,
                              preferred_element_type=jnp.float32,
                              precision=prec)       # (W*C, tp)
    v_eb = jax.lax.dot_general(ebt, wvt.astype(ebt.dtype), dims_g,
                               preferred_element_type=jnp.float32,
                               precision=prec)      # (W*C, tp)

    def fold(t):
        rows = W * C
        while rows > C:
            rows //= 2
            t = t[:rows, :] + t[rows:, :]
        return t

    aw = fold(v_a * whx)                            # (C, tp)
    dg = fold(v_eb * whx)                           # (C, tp) = S ewbar
    m = mz_ref[0][:C, 0:1]                          # (C, 1)
    dz = mz_ref[0][C:, 0:1]                         # (C, 1)
    eaw = jnp.exp(aw - m)
    daw = (dg + dz) * eaw                           # (C, tp)

    whg_daw = (fh[:, None, :] * daw[None, :, :]).reshape(W * C, tp)
    whg_eaw = (fh[:, None, :] * eaw[None, :, :]).reshape(W * C, tp)
    contrib = jax.lax.dot_general(
        whg_daw.astype(at.dtype), wvt.astype(at.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)                             # (W*C, H)
    z_a = jax.lax.dot_general(at, whg_daw.astype(at.dtype), dims_z,
                              preferred_element_type=jnp.float32,
                              precision=prec)       # (H, tp)
    z_e = jax.lax.dot_general(ebt, whg_eaw.astype(ebt.dtype), dims_z,
                              preferred_element_type=jnp.float32,
                              precision=prec)       # (H, tp)
    z_sum = z_a + z_e
    s_a = jnp.sum(v_a.reshape(W, C, tp) * daw[None, :, :], axis=1)  # (W, tp)
    s_e = jnp.sum(v_eb.reshape(W, C, tp) * eaw[None, :, :], axis=1)
    s_sum = s_a + s_e
    zero = jnp.zeros((1, tp), jnp.float32)
    dw_ref[0] = jnp.concatenate([
        zero, zero,
        jnp.sum(oh0 * z_sum, axis=0, keepdims=True),
        jnp.sum(oh1 * z_sum, axis=0, keepdims=True),
        zero, zero,
        jnp.sum(fx0 * s_sum, axis=0, keepdims=True),
        jnp.sum(fx1 * s_sum, axis=0, keepdims=True),
    ], axis=0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dat_ref[0] = jnp.zeros_like(dat_ref[0])

    dat_ref[0] += contrib


def _tok_forward(a, grid, m, interpret=False):
    B, H, W, C = a.shape
    P = H * W
    idxw = _corner_indices_weights(grid, H, W, "border", True)
    at = a.reshape(B, H, W * C).transpose(0, 2, 1)
    mb = jnp.broadcast_to(m.astype(jnp.float32)[:, :, None], (B, C, 128))

    # budget the tile like the unfused forward kernel (W*C): the fused body
    # keeps ~4 (W*C, tile) fp32 temporaries but they fit the 48 MB limit at
    # tile 1024, and halving the tile doubled per-tile fixed cost (the first
    # chip run at tile 512 measured ~0.5 ms slower across the OFW stage)
    tp = _pick_tile(P, W * C, floor=_TILE_P)
    kernel = functools.partial(_tok_kernel, H=H, W=W, C=C)
    ewt, z = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, at, mb)
    ew = ewt.transpose(0, 2, 1).reshape(B, H, W, C).astype(a.dtype)
    return ew, z[:, :, 0].astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def token_scatter_pallas(a, grid, interpret=False):
    """(ew, zaw) of the token warp chain: ew = S^T exp(S a - m),
    zaw = sum_n exp(S a - m) with m = stop_grad(max_n a) per (frame, l) —
    border mode, align_corners=True (the OFW recipe). a: (B, H, W, C) logits,
    grid: (B, H, W, 2). One fused kernel each way; see module comment."""
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2)))
    return _tok_forward(a, grid, m, interpret)


def _tok_fwd(a, grid, interpret):
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2)))
    return _tok_forward(a, grid, m, interpret), (a, grid, m)


# tile-budget factor for the fused token backward, in (W*C, tile) fp32
# temporaries: 6 (=3x the forward's pair) budgets conservatively and lands
# tile 512 at the OFW shapes; 3 lands 1024 — the tile the two unfused bwd
# kernels ran at. A/B'd on-chip (tools/probe_token_ab.py).
_TOK_BWD_WC_HALVES = 3


def set_token_bwd_tile_factor(halves: int):
    global _TOK_BWD_WC_HALVES
    _TOK_BWD_WC_HALVES = halves


def _tok_bwd(interpret, res, cots):
    a, grid, m = res
    ew_bar, dz = cots
    B, H, W, C = a.shape
    P = H * W
    idxw, f_vjp = jax.vjp(
        lambda g: _corner_indices_weights(g, H, W, "border", True), grid)
    at = a.reshape(B, H, W * C).transpose(0, 2, 1)
    ebt = ew_bar.reshape(B, H, W * C).transpose(0, 2, 1).astype(a.dtype)
    mz = jnp.concatenate([m.astype(jnp.float32),
                          dz.astype(jnp.float32)], axis=1)
    mzb = jnp.broadcast_to(mz[:, :, None], (B, 2 * C, 128))

    tp = _pick_tile(P, W * C * _TOK_BWD_WC_HALVES // 2, floor=_TILE_P_BWD)
    kernel = functools.partial(_tok_bwd_kernel, H=H, W=W, C=C)
    dat, dw = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, at, ebt, mzb)
    da = dat.transpose(0, 2, 1).reshape(B, H, W, C).astype(a.dtype)
    (dgrid,) = f_vjp(dw)
    return da, dgrid


token_scatter_pallas.defvjp(_tok_fwd, _tok_bwd)


# ---------------------------------------------------------------------------
# Hybrid train variant (VERDICT r4 #1): FUSED forward + SPLIT backward.
# The r4 A/B (artifacts/bench_r03/token_ab.txt) compared fused-fwd+fused-bwd
# (9.27 ms) against unfused-fwd+unfused-bwd (7.90) — the cross combination
# was never measured, yet the two verdicts are separable: the fused forward
# won its half (infer 2.93 vs 3.57) and the unfused two-kernel backward won
# its half (the monolithic bwd kernel keeps both image blocks + every
# expanded temporary live and pipelines worse). This op pairs the winning
# halves: the one-kernel forward (extended to write its in-VMEM exp as a
# residual) with the proven split backward — the scatter-VJP kernel and the
# warp-bwd kernel — sharing ONE idxw precompute/VJP where the unfused chain
# paid two. The backward is already at its 5-gather-matmul-pass floor (each
# pass is (W*C, H)x(H, tile) one-hot work on the MXU), so the forward and
# the duplicated XLA glue are exactly the parts with headroom.
# ---------------------------------------------------------------------------


def _tok_kernel_hyb(idxw_ref, xt_ref, m_ref, ew_ref, z_ref, eaw_ref, *,
                    H: int, W: int, C: int):
    _tok_kernel(idxw_ref, xt_ref, m_ref, ew_ref, z_ref,
                H=H, W=W, C=C, eaw_ref=eaw_ref)


def _tok_forward_hyb(a, grid, m, interpret=False):
    B, H, W, C = a.shape
    P = H * W
    idxw = _corner_indices_weights(grid, H, W, "border", True)
    at = a.reshape(B, H, W * C).transpose(0, 2, 1)
    mb = jnp.broadcast_to(m.astype(jnp.float32)[:, :, None], (B, C, 128))

    tp = _pick_tile(P, W * C, floor=_TILE_P)
    kernel = functools.partial(_tok_kernel_hyb, H=H, W=W, C=C)
    ewt, z, eaw = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 128), jnp.float32),
            # a.dtype residual: the unfused chain materialized eaw at the
            # model dtype too, so the split backward sees identical numerics
            jax.ShapeDtypeStruct((B, C, P), a.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, at, mb)
    ew = ewt.transpose(0, 2, 1).reshape(B, H, W, C).astype(a.dtype)
    return ew, z[:, :, 0].astype(a.dtype), eaw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def token_scatter_hybrid_pallas(a, grid, interpret=False):
    """Same contract as `token_scatter_pallas` (ew, zaw of the warped-softmax
    -scatter chain, shared-max shift); train-tuned lowering — see the section
    comment."""
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2)))
    ew, z, _ = _tok_forward_hyb(a, grid, m, interpret)
    return ew, z


def _tok_hyb_fwd(a, grid, interpret):
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2)))
    ew, z, eaw = _tok_forward_hyb(a, grid, m, interpret)
    return (ew, z), (a, grid, eaw)


def _tok_hyb_bwd(interpret, res, cots):
    a, grid, eaw = res
    ew_bar, dz = cots
    B, H, W, C = a.shape
    P = H * W
    idxw, f_vjp = jax.vjp(
        lambda g: _corner_indices_weights(g, H, W, "border", True), grid)
    ebt = ew_bar.reshape(B, H, W * C).transpose(0, 2, 1).astype(a.dtype)

    # scatter-VJP kernel: dg = S ew_bar (+ the scatter op's grid grads)
    tp = _pick_tile(P, W * C * 3 // 2, floor=_TILE_P_BWD)
    dg, dw_e = pl.pallas_call(
        functools.partial(_t_vjp_kernel, H=H, W=W, C=C),
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, P), a.dtype),
            jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, ebt, eaw)

    # chain rule through exp and the zaw row-sum (XLA elementwise, kernel-
    # layout (B, C, P) tensors — no transposes)
    daw = ((dg.astype(jnp.float32) + dz.astype(jnp.float32)[:, :, None])
           * eaw.astype(jnp.float32)).astype(a.dtype)

    # warp-bwd kernel: da (scatter of daw) + the warp op's grid grads
    at = a.reshape(B, H, W * C).transpose(0, 2, 1)
    dat, dw_a = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, C=C),
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W * C, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tp), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W * C, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, P), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(idxw, at, daw)

    da = dat.transpose(0, 2, 1).reshape(B, H, W, C).astype(a.dtype)
    (dgrid,) = f_vjp(dw_e + dw_a)
    return da, dgrid


token_scatter_hybrid_pallas.defvjp(_tok_hyb_fwd, _tok_hyb_bwd)


