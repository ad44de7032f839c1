"""Pallas s2d-phase depthwise stride-2 kernel (ops/pallas/dwconv.py) vs the
XLA grouped-conv lowering — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.ops import convops
from smow_net_tpu.ops.pallas.dwconv import dw3x3_s2_pallas, dw_s2_supported


def _ref(x, k):
    """XLA grouped depthwise conv, (B, T, H, W, C) x (kt, 3, 3, C)."""
    T, C = x.shape[1], x.shape[-1]
    kt = k.shape[0]
    kern = k[..., None, :]  # (*k, in/groups=1, C)
    if kt == 1 and T == 1:
        return convops.conv(x[:, 0], kern[0], (2, 2), (1, 1),
                            groups=C)[:, None]
    return convops.conv(x, kern, (1, 2, 2), (kt // 2, 1, 1), groups=C)


@pytest.mark.parametrize("T,kt", [(1, 1), (2, 3), (2, 1)])
def test_matches_xla(T, kt):
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, T, 16, 24, 8), jnp.float32)
    k = jax.random.normal(kk, (kt, 3, 3, 8), jnp.float32)
    ref = _ref(x, k)
    out = dw3x3_s2_pallas(x, k, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,kt", [(1, 1), (2, 3)])
def test_grads_match_xla(T, kt):
    kx, kk = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, T, 16, 16, 8), jnp.float32)
    k = jax.random.normal(kk, (kt, 3, 3, 8), jnp.float32)

    gp = jax.grad(lambda a, b: jnp.sum(dw3x3_s2_pallas(a, b, True) ** 2),
                  argnums=(0, 1))(x, k)
    gx = jax.grad(lambda a, b: jnp.sum(_ref(a, b) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gating():
    assert dw_s2_supported((16, 2, 128, 128, 32))
    assert dw_s2_supported((32, 1, 112, 112, 96))
    assert not dw_s2_supported((16, 3, 128, 128, 32))   # T > 2
    assert not dw_s2_supported((16, 2, 127, 128, 32))   # odd H
    assert not dw_s2_supported((16, 2, 16, 16, 12))     # C % 8
    assert not dw_s2_supported((1, 1, 512, 512, 128))   # VMEM


def test_conv_route_defaults_to_xla():
    # the pallas route lost its on-TPU A/B (see convops.py verdict): the
    # conv dispatcher must stay on XLA unless explicitly forced
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 16, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 1, 8))
    out = convops.conv(x, k, (1, 2, 2), (1, 1, 1), groups=8)
    assert out.shape == (2, 2, 8, 8, 8)
