"""Fused dim_head=1 cross-attention (the SMOW_Net pixel decoder hot path).

The reference `Transformer_Decoder` (models/SMOW_Net.py:270-303) runs one
CrossTransformerLayer whose Cross_Attention has per-head dim 1 — a
per-(pixel, head) softmax over the 8 memory tokens. `cross_attn_head1`
computes

    y = to_out(softmax_m(LN(x P) wq  ⊗  k · scale) · v) + x P

for x (B, N, D) pre-norm queries, k/v (B, M, h) projected memory, and an
optional lane permutation P (the decoder's t-major->c-major fold). On TPU
(`cross_attn_head1_auto`) supported shapes route to the fully-fused Pallas
kernel in `smow_net_tpu.ops.pallas.xattn`; the portable XLA path below
keeps the same broadcast-softmax formulation as nn/layers.py.

`set_xattn_impl("xla"|"pallas"|"auto")` overrides (tests force "pallas"
with interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_attn_head1", "cross_attn_head1_auto", "cross_layer_head1",
           "cross_layer_head1_auto",
           "set_xattn_impl"]

_IMPL = "auto"
_INTERPRET = False

# Pack-2 lowering for narrow (D<=64) layers (VERDICT r4 #2): the LW decoder
# runs this kernel at D=64 with half the 128 VPU lanes idle — pack TWO
# pixels per kernel row ((B, N, 64) -> (B, N/2, 128)) with block-diagonal
# weights so every lane is live. Mathematically identical (per-segment LN
# in-kernel; grads flow back through the differentiable packing, so the
# block-diagonal construction's VJP extracts/sums parameter grads for free).
_PACK2 = __import__("os").environ.get("XLAYER_PACK2", "1") != "0"


def set_xlayer_pack2(v: bool):
    global _PACK2
    _PACK2 = v


def set_xattn_impl(name: str, interpret: bool = False):
    assert name in ("auto", "xla", "pallas"), name
    global _IMPL, _INTERPRET
    _IMPL = name
    _INTERPRET = interpret


def _bd2(a):
    """Block-diagonal doubling (p, q) -> (2p, 2q); batched for 3-D."""
    z = jnp.zeros_like(a)
    if a.ndim == 2:
        return jnp.concatenate([jnp.concatenate([a, z], 1),
                                jnp.concatenate([z, a], 1)], 0)
    return jnp.concatenate([jnp.concatenate([a, z], 2),
                            jnp.concatenate([z, a], 2)], 1)


def _tile2(b):
    """Tile a (1, q) bias to (1, 2q)."""
    return jnp.concatenate([b, b], axis=-1)


def _expansions(k, v, scale):
    """(B, M, h) k/v -> MXU expansion matrices (B, h, h*M) / (B, h*M, h)
    with lane index l = h*M + m (head-major groups of M)."""
    B, M, h = k.shape
    sel = jnp.repeat(jnp.eye(h, dtype=k.dtype), M, axis=1)   # (h, h*M)
    kT = (k * scale).transpose(0, 2, 1).reshape(B, h * M)
    vT = v.transpose(0, 2, 1).reshape(B, h * M)
    k_exp = sel[None] * kT[:, None, :]
    v_exp = sel.T[None] * vT[:, :, None]
    return k_exp, v_exp


def _fold_q(ln_scale, ln_bias, wq, perm):
    """LN statistics are permutation-invariant, so the decoder's lane
    permutation and the LN affine fold into the q projection:
    LN(xP) wq == normalize(x) (P diag(scale) wq) + bias @ wq."""
    wq_eff = ln_scale[:, None] * wq
    if perm is not None:
        wq_eff = perm.astype(wq_eff.dtype) @ wq_eff
    bq_eff = (ln_bias @ wq)[None, :]
    return wq_eff, bq_eff


def cross_attn_head1(x, ln_scale, ln_bias, wq, k, v, w_out, b_out, *,
                     scale, perm=None, eps=1e-5):
    """Portable XLA path (same math/ordering as the fused kernel)."""
    dt = x.dtype
    if perm is not None:
        # one-hot lane permutation: HIGHEST keeps it exact for f32 on TPU
        x_c = jnp.matmul(x, perm.astype(dt),
                         precision=jax.lax.Precision.HIGHEST)
    else:
        x_c = x
    x32 = x_c.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ln_scale + ln_bias).astype(dt)
    q = jnp.matmul(xn, wq.astype(dt))                        # (B, N, h)
    kT = (k * scale).transpose(0, 2, 1)[:, None]             # (B, 1, h, M)
    vT = v.transpose(0, 2, 1)[:, None]
    dots = q[:, :, :, None].astype(jnp.float32) * kT.astype(jnp.float32)
    attn = jax.nn.softmax(dots, axis=-1)
    o = jnp.sum(attn * vT.astype(jnp.float32), axis=-1).astype(dt)
    return jnp.matmul(o, w_out.astype(dt)) + b_out.astype(dt) + x_c


def cross_layer_head1(x, ln1_scale, ln1_bias, wq, k, v, w_out, b_out,
                      ln2_scale, ln2_bias, w1, b1, w2, b2, *,
                      scale, perm=None, eps=1e-5):
    """Portable XLA path for the FULL decoder layer: dim_head=1 cross-
    attention (+residual) then PreNorm MLP with exact GELU (+residual) —
    the reference TransformerDecoder layer (models/SMOW_Net.py:285-303)."""
    y1 = cross_attn_head1(x, ln1_scale, ln1_bias, wq, k, v, w_out, b_out,
                          scale=scale, perm=perm, eps=eps)
    dt = y1.dtype
    y32 = y1.astype(jnp.float32)
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(y32 * y32, axis=-1, keepdims=True) - mu * mu
    yn = ((y32 - mu) * jax.lax.rsqrt(var + eps)
          * ln2_scale + ln2_bias).astype(dt)
    h = jnp.matmul(yn, w1.astype(dt)) + b1.astype(dt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dt)
    return jnp.matmul(h, w2.astype(dt)) + b2.astype(dt) + y1


def cross_layer_head1_auto(x, ln1_scale, ln1_bias, wq, k, v, w_out, b_out,
                           ln2_scale, ln2_bias, w1, b1, w2, b2, *,
                           scale, perm=None, eps=1e-5):
    """Route the full layer to the fused Pallas kernel on TPU (supported
    shapes), else the portable path above."""
    from .pallas.xattn import cross_layer_head1_pallas, xlayer_supported

    B, N, Dm = x.shape
    M, h = k.shape[1], k.shape[2]
    hidden = w1.shape[1]
    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if (jax.default_backend() == "tpu"
                            and xlayer_supported(N, Dm, h, M, hidden)) else "xla"
    if impl == "pallas" and not xlayer_supported(N, Dm, h, M, hidden):
        impl = "xla"
    if impl == "xla":
        return cross_layer_head1(
            x, ln1_scale, ln1_bias, wq, k, v, w_out, b_out,
            ln2_scale, ln2_bias, w1, b1, w2, b2,
            scale=scale, perm=perm, eps=eps)
    wq_eff, bq_eff = _fold_q(ln1_scale, ln1_bias, wq, perm)
    k_exp, v_exp = _expansions(k, v, scale)
    # [V|G] combined so num and den come from one matmul
    sel = jnp.repeat(jnp.eye(h, dtype=v_exp.dtype), M, axis=1)  # (h, h*M)
    vg_exp = jnp.concatenate(
        [v_exp, jnp.broadcast_to(sel.T[None], v_exp.shape)], axis=-1)
    w1_eff = ln2_scale[:, None] * w1
    b1_eff = (ln2_bias @ w1 + b1)[None, :]
    has_perm = perm is not None
    perm_in = (perm if has_perm else jnp.zeros((Dm, Dm), x.dtype))

    from .pallas.xattn import _TILE_L, _TILE_L_BWD

    pack = (_PACK2 and Dm <= 64
            and N % (2 * max(_TILE_L, _TILE_L_BWD)) == 0
            and 2 * h * M <= 128
            and xlayer_supported(N // 2, 2 * Dm, 2 * h, M, 2 * hidden))
    if pack:
        y2 = cross_layer_head1_pallas(
            x.reshape(B, N // 2, 2 * Dm), _bd2(wq_eff), _tile2(bq_eff),
            _bd2(k_exp), _bd2(vg_exp), _bd2(w_out), _tile2(b_out[None, :]),
            _bd2(perm_in), _bd2(w1_eff), _tile2(b1_eff), _bd2(w2),
            _tile2(b2[None, :]), eps, has_perm, _INTERPRET, 2)
        return y2.reshape(B, N, Dm)
    return cross_layer_head1_pallas(
        x, wq_eff, bq_eff, k_exp, vg_exp, w_out, b_out[None, :], perm_in,
        w1_eff, b1_eff, w2, b2[None, :], eps, has_perm, _INTERPRET)


def cross_attn_head1_auto(x, ln_scale, ln_bias, wq, k, v, w_out, b_out, *,
                          scale, perm=None, eps=1e-5):
    from .pallas.xattn import cross_attn_head1_pallas, xattn_supported

    B, N, D = x.shape
    M, h = k.shape[1], k.shape[2]
    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if (jax.default_backend() == "tpu"
                            and xattn_supported(N, D, h, M)) else "xla"
    if impl == "pallas":
        if not xattn_supported(N, D, h, M):
            impl = "xla"
    if impl == "xla":
        return cross_attn_head1(x, ln_scale, ln_bias, wq, k, v, w_out,
                                b_out, scale=scale, perm=perm, eps=eps)
    wq_eff, bq_eff = _fold_q(ln_scale, ln_bias, wq, perm)
    k_exp, v_exp = _expansions(k, v, scale)
    has_perm = perm is not None
    perm_in = (perm if has_perm else jnp.zeros((D, D), x.dtype))
    return cross_attn_head1_pallas(
        x, wq_eff, bq_eff, k_exp, v_exp, w_out, b_out[None, :], perm_in,
        eps, has_perm, _INTERPRET)
