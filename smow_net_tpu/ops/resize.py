"""Linear (bi-/tri-linear) resize with exact PyTorch `F.interpolate` semantics.

The reference model relies on `F.interpolate(..., mode='trilinear',
align_corners=True)` (reference: models/SMOW_Net.py:65-73,607) and bilinear
upsampling in several zoo models. TPU-first design: because all shapes are
static under jit, we pre-compute the per-axis interpolation matrix as a host
constant and apply it as a dense matmul (`einsum`) per resized axis — this
runs on the MXU and fuses with neighbouring ops, instead of emitting gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["interp_matrix", "resize_linear", "resize_nearest"]


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            pos = np.zeros(1, dtype=np.float64)
        else:
            pos = i * (in_size - 1) / (out_size - 1)
    else:
        # PyTorch half-pixel: src = (dst + 0.5) * scale - 0.5, clamped at 0.
        pos = (i + 0.5) * (in_size / out_size) - 0.5
        pos = np.maximum(pos, 0.0)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = pos - lo
    w_lo = 1.0 - w_hi
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += w_lo
    m[np.arange(out_size), hi] += w_hi
    return m.astype(np.float32)


def interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    return _interp_matrix_np(int(in_size), int(out_size), bool(align_corners))


def _apply_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(interp_matrix(in_size, out_size, align_corners), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, m.T)
    return jnp.moveaxis(y, -1, axis)


def resize_linear(x: jnp.ndarray, sizes, axes, align_corners: bool = True) -> jnp.ndarray:
    """Resize `axes` of `x` to `sizes` with separable linear interpolation.

    Matches torch `F.interpolate(mode='linear'/'bilinear'/'trilinear')` for the
    given `align_corners` flag. `axes`/`sizes` are parallel sequences.
    """
    assert len(sizes) == len(axes)
    for axis, out_size in zip(axes, sizes):
        x = _apply_axis(x, axis, int(out_size), align_corners)
    return x


def resize_nearest(x: jnp.ndarray, sizes, axes) -> jnp.ndarray:
    """Nearest-neighbour resize matching torch `F.interpolate(mode='nearest')`
    (floor(dst * in/out) source indexing)."""
    for axis, out_size in zip(axes, sizes):
        in_size = x.shape[axis]
        out_size = int(out_size)
        if in_size == out_size:
            continue
        idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
        idx = np.clip(idx.astype(np.int64), 0, in_size - 1)
        x = jnp.take(x, jnp.asarray(idx), axis=axis)
    return x
