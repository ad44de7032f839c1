"""Parameter initializers matching PyTorch layer defaults.

Training-dynamics parity with the reference depends on init distributions
(torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) on the weight and
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias). Our kernels are stored
channels-last `(*k, in/groups, out)`, so fan_in = prod(shape[:-1]).

For ConvTranspose, torch computes fans on its (in, out/groups, *k) layout,
giving fan_in = (out/groups) * prod(k); pass `fan_in` explicitly there.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["kaiming_uniform_torch", "uniform_fan_in_bias", "zeros", "temporal_identity",
           "kaiming_normal_fan_out", "ones", "normal", "trunc_normal"]


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') on a
    channels-last kernel (*k, in/g, out): fan_out = out * prod(k)."""
    fan_out = shape[-1]
    for s in shape[:-2]:
        fan_out *= s
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / max(fan_out, 1))


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def normal(std: float = 0.01):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def trunc_normal(std: float = 0.02):
    """timm trunc_normal_: truncated to ±2 std."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def kaiming_uniform_torch(fan_in: int | None = None):
    """torch kaiming_uniform_(a=sqrt(5)): bound = sqrt(6 / ((1 + 5) * fan_in))
    = 1/sqrt(fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        f = fan_in if fan_in is not None else int(jnp.prod(jnp.asarray(shape[:-1])))
        bound = 1.0 / math.sqrt(max(f, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_fan_in_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def temporal_identity(key, shape, dtype=jnp.float32):
    """Identity init for a 1x1(x1) temporal-mixing kernel stored as
    (*1s, in, out): eye over the (in, out) plane (reference zero/identity
    temporal-mixer init, models/SMOW_Net.py:113-117,456-458)."""
    in_c, out_c = shape[-2], shape[-1]
    eye = jnp.eye(in_c, out_c, dtype=dtype)
    return jnp.broadcast_to(eye, shape)
