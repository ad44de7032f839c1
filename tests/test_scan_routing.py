"""Scan backend routing at awkward shapes (VERDICT r2 weak #6): the 'auto'
fallback ladder in ops/scan.py must pick the fused kernel only where
`fused_supported` holds, degrade to the chunked pallas / xla tiers
elsewhere, and every tier must agree numerically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smow_net_tpu.ops.pallas.scan_fused import fused_supported
from smow_net_tpu.ops.scan import (route_scan_impl, selective_scan,
                                   selective_scan_auto, set_scan_impl)


def make_inputs(B=2, L=64, D=16, G=2, N=4, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(B, L, D)) * 0.1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.normal(size=(D, N)) * 0.2), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B, L, G, N)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, L, G, N)), jnp.float32)
    Dv = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    return u, dt, A, Bm, Cm, Dv, db


def test_fused_supported_gates():
    # SS2D-like shapes: supported
    assert fused_supported(4096, 96)        # 64x64, Cg=96
    assert fused_supported(65536, 96)       # 256x256
    # odd pixel counts (e.g. 250x250 = 2^2 * 5^6): no pow2 chunk >= 8
    assert not fused_supported(250 * 250, 96)
    # channel slice not lane-tileable
    assert not fused_supported(4096, 12)
    assert not fused_supported(4096, 4)


def test_route_ladder():
    u, dt, A, Bm, Cm, Dv, db = make_inputs(L=64, D=16, G=2, N=4)
    # CPU/GPU: always xla
    assert route_scan_impl("cpu", u, A, Bm) == "xla"
    # TPU, fused-supported shape (Cg = D/G = 8, L = 64)
    assert route_scan_impl("tpu", u, A, Bm) == "fused"
    # TPU, odd L -> not fused; block_d*N lane packing decides pallas vs xla
    u_odd, dt, A, Bm_odd, *_ = make_inputs(L=125, D=16, G=2, N=4)
    assert route_scan_impl("tpu", u_odd, A, Bm_odd) in ("pallas", "xla")
    assert route_scan_impl("tpu", u_odd, A, Bm_odd) != "fused"
    # TPU, Cg % 8 != 0 (D=12, G=2 -> Cg=6) -> not fused
    u2, dt2, A2, Bm2, *_ = make_inputs(L=64, D=12, G=2, N=4)
    assert route_scan_impl("tpu", u2, A2, Bm2) != "fused"


@pytest.mark.parametrize("L,D,G,N", [
    (125, 16, 2, 4),      # odd L (250x250-class shape, scaled down)
    (64, 12, 2, 4),       # Cg % 8 != 0
    (100, 24, 3, 8),      # both: non-pow2 L and G=3
])
def test_awkward_shapes_fall_back_and_agree(L, D, G, N):
    """auto must yield xla-exact numerics on shapes the kernels reject."""
    u, dt, A, Bm, Cm, Dv, db = make_inputs(L=L, D=D, G=G, N=N)
    ref = selective_scan(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
    out = selective_scan_auto(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
    assert ref.shape == (u.shape[0], L, D)


def test_forced_fused_interpret_matches_xla_on_supported_shape():
    """The fused tier itself (interpret mode on CPU) at a fused-supported
    shape, against the xla oracle — the numerics the TPU router picks."""
    from smow_net_tpu.ops.pallas.scan_fused import selective_scan_fused

    u, dt, A, Bm, Cm, Dv, db = make_inputs(L=64, D=16, G=2, N=4)
    ref = selective_scan(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
    out = selective_scan_fused(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_set_scan_impl_override_roundtrip():
    u, dt, A, Bm, Cm, Dv, db = make_inputs(L=64, D=16, G=2, N=4)
    ref = selective_scan(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
    try:
        set_scan_impl("xla")
        out = selective_scan_auto(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)
    finally:
        set_scan_impl("auto")


def test_selective_scan_step_matches_full_scan():
    """Token-by-token decode (selective_scan_step carry) == full-sequence
    selective_scan, the reference selective_state_update contract
    (compare/cd_mamba.py:714-727)."""
    import jax

    from smow_net_tpu.ops.scan import selective_scan_step

    u, dt, A, Bm, Cm, Dv, db = make_inputs(L=19, D=12, G=2, N=4)
    ref = selective_scan(u, dt, A, Bm, Cm, Dv, db, delta_softplus=True)
    B, L, D = u.shape
    h0 = jnp.zeros((B, D, A.shape[-1]), jnp.float32)

    def step(h, t):
        y, h = selective_scan_step(h, u[:, t], dt[:, t], A, Bm[:, t], Cm[:, t],
                                   Dv, db, delta_softplus=True)
        return h, y

    _, ys = jax.lax.scan(step, h0, jnp.arange(L))
    out = jnp.swapaxes(ys, 0, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mamba_core_step_matches_core_module():
    """Streaming one-token decode of the CD-Mamba core (conv cache + scan
    carry) == the whole-sequence Mamba1DCore (reference Mamba.step,
    compare/cd_mamba.py:686-730)."""
    import jax

    from smow_net_tpu.models.zoo.cd_mamba import (Mamba1DCore, Mamba1DParams,
                                                  mamba_cache_init,
                                                  mamba_core_step)

    B, L, Di, N, R, K = 2, 11, 8, 4, 2, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, Di)), jnp.float32)
    core = Mamba1DCore(Di, N, R, K)
    v = core.init(jax.random.PRNGKey(0), x)
    ref = core.apply(v, x)

    pmod = Mamba1DParams(Di, N, R, K)
    p = pmod.apply(v)
    conv_state, ssm_state = mamba_cache_init(B, Di, N, K)

    def step(carry, t):
        cs, hs = carry
        y, cs, hs = mamba_core_step(p, x[:, t], cs, hs)
        return (cs, hs), y

    _, ys = jax.lax.scan(step, (conv_state, ssm_state), jnp.arange(L))
    out = jnp.swapaxes(ys, 0, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
