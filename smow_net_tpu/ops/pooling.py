"""Pooling ops (channels-last) matching torch MaxPool/AvgPool semantics.

Reference uses MaxPool3d(k=(1,2,2), s=(1,2,2)) (models/SMOW_Net.py:158-159)
and the stem MaxPool2d(3, 2, padding=1) decomposed to 3D with time_dim=1
(models/SMOW_Net.py:480-497). Implemented with `lax.reduce_window`, which XLA
maps directly onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .convops import to_tuple

__all__ = ["max_pool", "avg_pool", "adaptive_avg_pool"]


def max_pool(x: jnp.ndarray, kernel, stride=None, padding=0) -> jnp.ndarray:
    """x: (B, *spatial, C). Padding is symmetric ints per dim (torch style);
    padded elements are -inf (never selected), matching torch."""
    n = x.ndim - 2
    k = to_tuple(kernel, n)
    s = to_tuple(stride if stride is not None else kernel, n)
    p = to_tuple(padding, n)
    dims = (1,) + k + (1,)
    strides = (1,) + s + (1,)
    pads = ((0, 0),) + tuple((pp, pp) for pp in p) + ((0, 0),)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, init, lax.max, dims, strides, pads)


def avg_pool(x: jnp.ndarray, kernel, stride=None, padding=0, count_include_pad: bool = True) -> jnp.ndarray:
    n = x.ndim - 2
    k = to_tuple(kernel, n)
    s = to_tuple(stride if stride is not None else kernel, n)
    p = to_tuple(padding, n)
    dims = (1,) + k + (1,)
    strides = (1,) + s + (1,)
    pads = ((0, 0),) + tuple((pp, pp) for pp in p) + ((0, 0),)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if count_include_pad or all(pp == 0 for pp in p):
        denom = 1.0
        for kk in k:
            denom *= kk
        return summed / denom
    ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / counts


def adaptive_avg_pool(x: jnp.ndarray, out_sizes) -> jnp.ndarray:
    """torch AdaptiveAvgPool over all spatial dims; only global (1,..) and
    integer-divisible sizes are supported (covers all reference uses)."""
    n = x.ndim - 2
    outs = to_tuple(out_sizes, n)
    ks = []
    for dim, o in zip(x.shape[1:-1], outs):
        assert dim % o == 0, (dim, o)
        ks.append(dim // o)
    return avg_pool(x, tuple(ks), tuple(ks), 0)
