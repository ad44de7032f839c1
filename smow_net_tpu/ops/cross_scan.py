"""Cross-scan / cross-merge layout transforms for 2D selective scans.

TPU-native equivalent of the reference Triton kernels
(compare/csm_triton.py:7-257) and the torch fallbacks
(compare/vmamba.py:27-69): pure transpose/flip/reshape, which XLA folds into
layout assignment — no custom kernel needed (SURVEY.md N1).

Direction order matches the reference CrossScan:
  0: row-major,  1: column-major (transposed),
  2: reversed row-major,  3: reversed column-major.

The 8-direction variants add the four diagonal traversals used by RS-Mamba
(compare/rs_mamba.py:241-383), implemented with a precomputed diagonal
permutation (gather with a static index vector — compiled to a single
data-formatting op).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["cross_scan", "cross_merge", "cross_scan8", "cross_merge8",
           "cross_scan_1d", "cross_merge_1d", "cross_scan_2d",
           "cross_merge_2d", "cross_scan_1b1"]


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 4, H*W, C)."""
    B, H, W, C = x.shape
    x0 = x.reshape(B, H * W, C)
    x1 = x.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    x2 = jnp.flip(x0, axis=1)
    x3 = jnp.flip(x1, axis=1)
    return jnp.stack([x0, x1, x2, x3], axis=1)


def cross_merge(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 4, H*W, C) -> (B, H*W, C): sum of the four de-traversed scans."""
    B, K, L, C = ys.shape
    y0 = ys[:, 0]
    y1 = ys[:, 1].reshape(B, W, H, C).transpose(0, 2, 1, 3).reshape(B, L, C)
    y2 = jnp.flip(ys[:, 2], axis=1)
    y3 = jnp.flip(ys[:, 3], axis=1).reshape(B, W, H, C).transpose(0, 2, 1, 3).reshape(B, L, C)
    return y0 + y1 + y2 + y3


def cross_scan_1b1(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4*c) -> (B, 4, H*W, c): one-by-one cross-scan — channel
    group k rides traversal k ONLY (reference CrossScanTriton1b1,
    compare/csm_triton.py:138-180,235-257; consumed by the SS2D xv forward
    family's per-direction dt/B/C tensors, compare/vmamba.py:1236-1268).
    Channel grouping matches the reference's `.view(B, 4, -1, H, W)` split."""
    B, H, W, KC = x.shape
    c = KC // 4
    assert KC == 4 * c
    g = [x[..., k * c:(k + 1) * c] for k in range(4)]
    x0 = g[0].reshape(B, H * W, c)
    x1 = g[1].transpose(0, 2, 1, 3).reshape(B, H * W, c)
    x2 = jnp.flip(g[2].reshape(B, H * W, c), axis=1)
    x3 = jnp.flip(g[3].transpose(0, 2, 1, 3).reshape(B, H * W, c), axis=1)
    return jnp.stack([x0, x1, x2, x3], axis=1)


def cross_scan_1d(x: jnp.ndarray) -> jnp.ndarray:
    """SS2D 1-direction ablation (reference CrossScan_Ab_1direction,
    compare/vmamba.py:112-123): the row-major traversal repeated K=4 times —
    the scan runs 4 identical directions so parameter shapes match v2."""
    B, H, W, C = x.shape
    x0 = x.reshape(B, 1, H * W, C)
    return jnp.broadcast_to(x0, (B, 4, H * W, C))


def cross_merge_1d(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 4, H*W, C) -> (B, H*W, C) (CrossMerge_Ab_1direction,
    compare/vmamba.py:126-137): plain sum over K."""
    return jnp.sum(ys, axis=1)


def cross_scan_2d(x: jnp.ndarray) -> jnp.ndarray:
    """SS2D 2-direction ablation (reference CrossScan_Ab_2direction,
    compare/vmamba.py:73-89): [x, x, flip(x), flip(x)] — forward and
    reversed row-major only, each doubled, no transposed traversals."""
    B, H, W, C = x.shape
    x0 = x.reshape(B, H * W, C)
    x2 = jnp.flip(x0, axis=1)
    return jnp.stack([x0, x0, x2, x2], axis=1)


def cross_merge_2d(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 4, H*W, C) -> (B, H*W, C) (CrossMerge_Ab_2direction,
    compare/vmamba.py:92-109): sum of the two forward scans plus the two
    un-flipped reverse scans."""
    fwd = ys[:, 0] + ys[:, 1]
    rev = jnp.flip(ys[:, 2] + ys[:, 3], axis=1)
    return fwd + rev


@functools.lru_cache(maxsize=None)
def _diag_perm(H: int, W: int) -> np.ndarray:
    """Row-major -> the reference's *wrapped* diagonal traversal
    (compare/rs_mamba.py:252-261 diagonal_gather): gather x[i, (i+s) % W]
    along each row, then transpose, i.e. for each shift s (outer, 0..W-1)
    walk i (inner, 0..H-1) picking column (i+s) mod W. Every "diagonal" has
    exactly H elements and wraps around the right edge — NOT the textbook
    variable-length anti-diagonal order."""
    s = np.arange(W, dtype=np.int32)[:, None]      # shift (outer)
    i = np.arange(H, dtype=np.int32)[None, :]      # row (inner)
    return (i * W + (i + s) % W).reshape(-1)


@functools.lru_cache(maxsize=None)
def _antidiag_perm(H: int, W: int) -> np.ndarray:
    """Reference antidiagonal_gather (compare/rs_mamba.py:241-250): column
    (s - i) mod W, same wrapped, shift-outer/row-inner ordering."""
    s = np.arange(W, dtype=np.int32)[:, None]
    i = np.arange(H, dtype=np.int32)[None, :]
    return (i * W + (s - i) % W).reshape(-1)


@functools.lru_cache(maxsize=None)
def _inverse_perm(perm_bytes: bytes, n: int) -> np.ndarray:
    perm = np.frombuffer(perm_bytes, dtype=np.int32)
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    return inv


def cross_scan8(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 8, H*W, C): 4 axis-aligned + diagonal,
    anti-diagonal and their reverses (RS-Mamba omnidirectional scan)."""
    B, H, W, C = x.shape
    flat = x.reshape(B, H * W, C)
    four = cross_scan(x)
    dperm = jnp.asarray(_diag_perm(H, W))
    aperm = jnp.asarray(_antidiag_perm(H, W))
    d0 = jnp.take(flat, dperm, axis=1)
    a0 = jnp.take(flat, aperm, axis=1)
    d1 = jnp.flip(d0, axis=1)
    a1 = jnp.flip(a0, axis=1)
    return jnp.concatenate([four, jnp.stack([d0, a0, d1, a1], axis=1)], axis=1)


def cross_merge8(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 8, H*W, C) -> (B, H*W, C)."""
    B, K, L, C = ys.shape
    out = cross_merge(ys[:, :4], H, W)
    dperm = _diag_perm(H, W)
    aperm = _antidiag_perm(H, W)
    dinv = jnp.asarray(_inverse_perm(dperm.tobytes(), L))
    ainv = jnp.asarray(_inverse_perm(aperm.tobytes(), L))
    out = out + jnp.take(ys[:, 4], dinv, axis=1)
    out = out + jnp.take(ys[:, 5], ainv, axis=1)
    out = out + jnp.take(jnp.flip(ys[:, 6], axis=1), dinv, axis=1)
    out = out + jnp.take(jnp.flip(ys[:, 7], axis=1), ainv, axis=1)
    return out
