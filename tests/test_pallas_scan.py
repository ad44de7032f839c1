"""Pallas selective-scan kernel vs the associative-scan reference
(interpret mode on CPU; the driver/bench exercises the compiled TPU path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import smow_net_tpu.ops.pallas.scan as ps

    monkeypatch.setattr(ps.pl, "pallas_call", patched)
    yield


def test_pallas_scan_matches_reference():
    from smow_net_tpu.ops.pallas.scan import selective_scan_pallas
    from smow_net_tpu.ops.scan import selective_scan

    rng = np.random.default_rng(0)
    b, L, Dch, N, G = 2, 32, 16, 4, 2
    u = jnp.asarray(rng.normal(size=(b, L, Dch)), jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, L, Dch)) * 0.5, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(Dch, N)), jnp.float32)) * 0.5
    B = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(Dch,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Dch,)) * 0.1, jnp.float32)

    ref = selective_scan(u, delta, A, B, C, D, bias, True)
    out = selective_scan_pallas(u, delta, A, B, C, D, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_scan_grad_matches_reference():
    from smow_net_tpu.ops.pallas.scan import selective_scan_pallas
    from smow_net_tpu.ops.scan import selective_scan

    rng = np.random.default_rng(1)
    b, L, Dch, N, G = 1, 16, 4, 3, 1
    u = jnp.asarray(rng.normal(size=(b, L, Dch)), jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, L, Dch)) * 0.5, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(Dch, N)), jnp.float32)) * 0.5
    B = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)

    g1 = jax.grad(lambda u: jnp.sum(
        selective_scan_pallas(u, delta, A, B, C, None, None, True) ** 2))(u)
    g2 = jax.grad(lambda u: jnp.sum(
        selective_scan(u, delta, A, B, C, None, None, True) ** 2))(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_pallas_scan_grad_all_inputs():
    """Analytic backward vs autodiff-through-associative-scan, every input,
    grouped channels, with D/delta_bias/softplus on (SS2D configuration)."""
    from smow_net_tpu.ops.pallas.scan import selective_scan_pallas
    from smow_net_tpu.ops.scan import selective_scan

    rng = np.random.default_rng(2)
    b, L, Dch, N, G = 2, 24, 12, 4, 3
    u = jnp.asarray(rng.normal(size=(b, L, Dch)), jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, L, Dch)) * 0.5, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(Dch, N)), jnp.float32)) * 0.5
    B = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(Dch,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Dch,)) * 0.1, jnp.float32)
    gy = jnp.asarray(rng.normal(size=(b, L, Dch)), jnp.float32)

    def run(fn):
        out, vjp = jax.vjp(lambda *a: fn(*a, True), u, delta, A, B, C, D, bias)
        return out, vjp(gy)

    out_p, grads_p = run(selective_scan_pallas)
    out_r, grads_r = run(selective_scan)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for name, gp, gr in zip(("u", "delta", "A", "B", "C", "D", "bias"),
                            grads_p, grads_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
