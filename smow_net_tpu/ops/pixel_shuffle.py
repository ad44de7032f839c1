"""Sub-pixel upsampling.

`smow_shuffle` reproduces the reference Classifier's bespoke permute/view
chain (models/SMOW_Net.py:390-408), which is NOT the standard
`F.pixel_shuffle` channel ordering — the reference splits channels into the
width axis first and swaps H/W twice. We keep bit-exact index semantics
(pure reshape/transpose, free under XLA layout assignment). `pixel_shuffle`
is the standard torch op, used by zoo models.

Layout: channels-last (B, H, W, C).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["smow_shuffle", "pixel_shuffle"]


def smow_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*s, W*s, C/s^2) with the reference Classifier's
    exact element ordering (models/SMOW_Net.py:395-406)."""
    B, H, W, C = x.shape
    s = scale
    y = x.reshape(B, H, W * s, C // s)
    y = jnp.transpose(y, (0, 2, 1, 3))          # (B, W*s, H, C/s)
    y = y.reshape(B, W * s, H * s, C // (s * s))
    return jnp.transpose(y, (0, 2, 1, 3))       # (B, H*s, W*s, C/s^2)


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Standard torch `F.pixel_shuffle` with channels-last layout: channel
    index decomposes as (C_out, r, r) with C_out slowest."""
    B, H, W, C = x.shape
    r = scale
    c_out = C // (r * r)
    y = x.reshape(B, H, W, c_out, r, r)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))    # (B, H, r, W, r, C_out)
    return y.reshape(B, H * r, W * r, c_out)
