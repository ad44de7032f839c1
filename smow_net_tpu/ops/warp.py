"""Bilinear grid sampling (the OFW optical-flow warp hot loop).

Reproduces torch `F.grid_sample(mode='bilinear')` semantics exactly for
`padding_mode in {'border','zeros'}` and both `align_corners` flags
(reference hot path: models/SMOW_Net.py:612-637 uses border + align_corners
+ grid clamped to [-1,1]).

TPU-first design: sampling coordinates are data-dependent, so the op is a
batched gather. The portable path flattens (H, W) and issues a single
`take_along_axis` per corner (4 gathers total); but TPU has no fast
per-element gather (measured: 44% of the SMOW_Net forward), so on TPU
`grid_sample_auto` routes supported shapes to the one-hot-matmul Pallas
kernel in `smow_net_tpu.ops.pallas.warp` — exact corner gathers on the MXU.
`set_warp_impl("xla"|"pallas"|"auto")` overrides.

Layout: channels-last. `x: (B, H, W, C)`, `grid: (B, Hg, Wg, 2)` with
grid[..., 0] = x-coordinate (width), grid[..., 1] = y-coordinate (height),
both in [-1, 1] — identical to torch's convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "grid_sample_auto", "grid_sample_transpose",
           "set_warp_impl", "flow_warp", "flow_warp_transpose",
           "token_softmax_scatter", "token_softmax_scatter_train",
           "set_token_train_impl"]

_IMPL = "auto"


def set_warp_impl(name: str):
    """Select the grid_sample backend: 'xla', 'pallas', or 'auto'
    (pallas on TPU for supported shapes, xla otherwise)."""
    assert name in ("auto", "xla", "pallas"), name
    global _IMPL
    _IMPL = name


def grid_sample_auto(x, grid, padding_mode="border", align_corners=True):
    impl = _IMPL
    if impl == "auto":
        import jax as _jax

        from .pallas.warp import pallas_warp_supported

        impl = "pallas" if (_jax.default_backend() == "tpu"
                            and pallas_warp_supported(x.shape, grid.shape)
                            ) else "xla"
    if impl == "pallas":
        from .pallas.warp import grid_sample_pallas

        return grid_sample_pallas(x, grid, padding_mode, align_corners)
    return grid_sample(x, grid, padding_mode, align_corners)


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear sample `x` at `grid` locations. Returns (B, Hg, Wg, C)."""
    assert padding_mode in ("border", "zeros"), padding_mode
    B, H, W, C = x.shape
    _, Hg, Wg, two = grid.shape
    assert two == 2

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = _unnormalize(gx, W, align_corners)
    iy = _unnormalize(gy, H, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    ix0i = ix0.astype(jnp.int32)
    iy0i = iy0.astype(jnp.int32)
    ix1i = ix0i + 1
    iy1i = iy0i + 1

    if padding_mode == "zeros":
        # validity per corner before clamping
        vx0 = (ix0i >= 0) & (ix0i < W)
        vx1 = (ix1i >= 0) & (ix1i < W)
        vy0 = (iy0i >= 0) & (iy0i < H)
        vy1 = (iy1i >= 0) & (iy1i < H)

    ix0c = jnp.clip(ix0i, 0, W - 1)
    ix1c = jnp.clip(ix1i, 0, W - 1)
    iy0c = jnp.clip(iy0i, 0, H - 1)
    iy1c = jnp.clip(iy1i, 0, H - 1)

    flat = x.reshape(B, H * W, C)
    n = Hg * Wg

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, n, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(B, Hg, Wg, C)

    v00 = gather(iy0c, ix0c)
    v01 = gather(iy0c, ix1c)
    v10 = gather(iy1c, ix0c)
    v11 = gather(iy1c, ix1c)

    w00 = ((1 - tx) * (1 - ty))[..., None]
    w01 = (tx * (1 - ty))[..., None]
    w10 = ((1 - tx) * ty)[..., None]
    w11 = (tx * ty)[..., None]

    if padding_mode == "zeros":
        w00 = w00 * (vx0 & vy0)[..., None]
        w01 = w01 * (vx1 & vy0)[..., None]
        w10 = w10 * (vx0 & vy1)[..., None]
        w11 = w11 * (vx1 & vy1)[..., None]

    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_transpose(g, grid, out_hw, padding_mode="border",
                          align_corners=True):
    """Adjoint of `grid_sample` as a *primal* op: out[m, c] = sum_n
    S[n, m] g[n, c] where S is grid's bilinear sampling matrix into an
    (H, W) = out_hw image. Enables the exact rewrite
    sum_n a[n] . warp(x)[n] == sum_m x[m] . warpT(a)[m] so consumers can
    warp the CHEAP side (e.g. 8 attention channels instead of 32 feature
    channels in the OFW token path).

    VJP: d/dg = grid_sample (S is linear), d/dgrid via the adjoint identity
    (the grid-cotangent of a forward warp of the g-cotangent)."""
    impl = _IMPL
    if impl == "auto":
        from .pallas.warp import pallas_warp_supported

        B, Hg, Wg, C = g.shape
        x_like = (B, out_hw[0], out_hw[1], C)
        impl = "pallas" if (jax.default_backend() == "tpu"
                            and pallas_warp_supported(x_like, grid.shape)
                            and (Hg * Wg) % 128 == 0) else "xla"
    if impl == "pallas":
        from .pallas.warp import grid_sample_transpose_pallas

        return grid_sample_transpose_pallas(g, grid, out_hw, padding_mode,
                                            align_corners)
    B, Hg, Wg, C = g.shape
    x0 = jnp.zeros((B, out_hw[0], out_hw[1], C), g.dtype)
    _, vjp = jax.vjp(
        lambda x: grid_sample(x, grid, padding_mode, align_corners), x0)
    return vjp(g)[0]


def _gst_fwd(g, grid, out_hw, padding_mode, align_corners):
    return grid_sample_transpose(g, grid, out_hw, padding_mode,
                                 align_corners), (g, grid)


def _gst_bwd(out_hw, padding_mode, align_corners, res, cot):
    g, grid = res
    from .pallas.warp import pallas_warp_supported

    if (_IMPL in ("auto", "pallas") and jax.default_backend() == "tpu"
            and pallas_warp_supported(cot.shape, grid.shape)):
        # one fused kernel for the whole VJP: dg (the forward warp of the
        # cotangent) and dgrid share the vertical-gather matmul and every
        # one-hot mask (see pallas/warp._t_vjp_kernel)
        from .pallas.warp import grid_sample_transpose_vjp_pallas

        dg, dgrid = grid_sample_transpose_vjp_pallas(
            g, grid, cot, padding_mode, align_corners)
    else:
        dg = grid_sample_auto(cot, grid, padding_mode, align_corners)
        _, vjpf = jax.vjp(
            lambda c, gr: grid_sample_auto(c, gr, padding_mode, align_corners),
            cot, grid)
        _, dgrid = vjpf(g)
    return dg.astype(g.dtype), dgrid


grid_sample_transpose.defvjp(_gst_fwd, _gst_bwd)


def _flow_grid(flow: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    fy = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    fx = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32)
    base = jnp.stack(jnp.meshgrid(fx, fy, indexing="xy"), axis=-1)  # (H, W, 2)
    norm = jnp.asarray([W, H], dtype=jnp.float32)
    return jnp.clip(base[None] + flow.astype(jnp.float32) / norm, -1.0, 1.0)


def flow_warp_transpose(g: jnp.ndarray, flow: jnp.ndarray,
                        align_corners: bool = True) -> jnp.ndarray:
    """Adjoint of `flow_warp` as a primal op (same grid construction);
    differentiable in both `g` and `flow`."""
    B, H, W, _ = g.shape
    grid = _flow_grid(flow, H, W)
    return grid_sample_transpose(g, grid, (H, W), "border", align_corners)


def token_softmax_scatter(a: jnp.ndarray, flow: jnp.ndarray):
    """The OFW token path's warped-softmax-scatter chain as one op:

        aw  = flow_warp(a, flow)              (bilinear, border, align=True)
        eaw = exp(aw - m),  m = stop_grad(max_n a)  per (frame, l)
        ew  = flow_warp_transpose(eaw, flow)
        zaw = sum_n eaw

    Returns (ew, zaw). CONTRACT: ew is NOT a normalized warped softmax —
    both ew and zaw carry a shared per-(frame, l) scale exp(max_n aw - m)
    relative to the legacy unfused chain (which shifted by max_n aw); results
    are exact only after the caller divides ew by zaw (softmax normalization
    is shift-invariant). Consumers must always pair them (see
    models/smow_net.py ofw_tokens_fused). Also unlike the legacy shift, zaw
    >= 1 is NOT guaranteed: if a map's warped-logit spread exceeds ~87 (f32)
    every exp underflows and zaw -> 0; divide as ew / max(zaw, tiny).

    Using max_n a as the softmax shift is exact: border
    bilinear weights are convex so aw <= max_n a, and downstream softmax
    normalization is shift-invariant. On TPU (supported shapes) this runs as
    ONE Pallas kernel forward and one backward (pallas/warp.token_scatter_
    pallas) — the unfused composition pays 2 fwd + 2 bwd kernels that all
    rebuild the same one-hot masks, plus an HBM roundtrip for aw/eaw."""
    B, H, W, C = a.shape
    impl = _IMPL
    if impl == "auto":
        from .pallas.warp import pallas_warp_supported

        impl = "pallas" if (jax.default_backend() == "tpu"
                            and pallas_warp_supported(a.shape, (B, H, W, 2))
                            ) else "xla"
    grid = _flow_grid(flow, H, W)
    if impl == "pallas":
        from .pallas.warp import token_scatter_pallas

        return token_scatter_pallas(a, grid)
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2), keepdims=True))
    aw = grid_sample_auto(a, grid, "border", True)
    eaw = jnp.exp(aw - m)
    ew = grid_sample_transpose(eaw, grid, (H, W), "border", True)
    return ew, jnp.sum(eaw, axis=(1, 2))


# Train-side lowering of the token warp chain (same math as
# token_softmax_scatter; the infer side always takes the fused kernel):
#   unfused — flow_warp + exp + flow_warp_transpose (2+2 kernels; r3 verdict)
#   fused   — token_scatter_pallas fwd AND bwd (lost the r4 train A/B)
#   hybrid  — fused forward + the unfused split backward sharing one idxw
#             VJP (pallas/warp.token_scatter_hybrid_pallas)
# Default HYBRID by the round-5 on-chip A/B (tools/probe_token_ab.py,
# artifacts/bench_r05/token_ab.txt): hybrid 7.87/7.97 ms vs unfused
# 8.02/8.24 at the bs16 256^2 chain shapes. A hybrid2 variant (fused fwd +
# ONE channel-stacked bwd kernel collapsing the split bwd's five gather
# matmuls into three) was built, verified, probed and DELETED: 9.35/9.51 ms
# — like r4's monolithic fused bwd, the big single-kernel matmuls pipeline
# worse than the two split kernels at W*C=1024.
_TOK_TRAIN_IMPL = __import__("os").environ.get("TOK_TRAIN_IMPL", "hybrid")


def set_token_train_impl(name: str):
    assert name in ("unfused", "fused", "hybrid"), name
    global _TOK_TRAIN_IMPL
    _TOK_TRAIN_IMPL = name


def token_softmax_scatter_train(a: jnp.ndarray, flow: jnp.ndarray):
    """Train-path `token_softmax_scatter`: identical (ew, zaw) contract,
    lowering selected by `set_token_train_impl` (A/B'd on chip)."""
    B, H, W, C = a.shape
    from .pallas.warp import pallas_warp_supported

    on_tpu = (jax.default_backend() == "tpu"
              and pallas_warp_supported(a.shape, (B, H, W, 2))
              and _IMPL in ("auto", "pallas"))
    impl = _TOK_TRAIN_IMPL if on_tpu else "unfused"
    # The hybrid lowering is proven only at W*C <= 1024 (the flagship
    # chain, where it won the r5 A/B). At SMOW_Net_LW's W*C = 2048 the
    # hybrid program reproducibly faults the TPU worker on-chip
    # ("TPU worker process crashed", 2x at bs16 256^2 — bench_r05
    # smow_net_lw_train.log history), so larger shapes take the unfused
    # split chain, which also matches the r4-verdict routing there.
    if impl == "hybrid" and W * C > 1024:
        impl = "unfused"
    if impl == "fused":
        return token_softmax_scatter(a, flow)
    if impl == "hybrid":
        from .pallas.warp import token_scatter_hybrid_pallas

        return token_scatter_hybrid_pallas(a, _flow_grid(flow, H, W))
    # unfused composition (the round-2/3 train path)
    n = H * W
    m = jax.lax.stop_gradient(jnp.max(a.reshape(B, n, C), axis=1))
    aw = flow_warp(a, flow)
    eaw = jnp.exp(aw - m.reshape(B, 1, 1, C))
    zaw = jnp.sum(eaw.reshape(B, n, C), axis=1)
    ew = flow_warp_transpose(eaw, flow)
    return ew, zaw


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Warp `x` (B, H, W, C) by a pixel-space `flow` (B, H, W, 2).

    Matches the reference OFW warp (models/SMOW_Net.py:612-631): an identity
    grid `linspace(-1, 1)` plus `flow / (W, H)`, clamped to [-1, 1], sampled
    with bilinear / border / align_corners=True.
    """
    B, H, W, _ = x.shape
    grid = _flow_grid(flow, H, W)
    return grid_sample_auto(x, grid, padding_mode="border", align_corners=align_corners)
