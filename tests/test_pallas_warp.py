"""Pallas warp kernel (ops/pallas/warp.py) vs the XLA gather path —
interpret mode on CPU. On-TPU numbers live in PARITY.md (tools/profile_warp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.ops.pallas.warp import grid_sample_pallas, pallas_warp_supported
from smow_net_tpu.ops.warp import flow_warp, grid_sample

# P = 16*16 = 256 (tile-aligned), W power of two, C multiple of 8
B, H, W, C = 2, 16, 16, 8


def _rand(key):
    kx, kg = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    # grid beyond [-1,1] to exercise border clamp / zeros masking
    grid = jax.random.uniform(kg, (B, H, W, 2), jnp.float32, -1.3, 1.3)
    return x, grid


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_xla_path(padding_mode, align_corners):
    x, grid = _rand(0)
    ref = grid_sample(x, grid, padding_mode, align_corners)
    out = grid_sample_pallas(x, grid, padding_mode, align_corners, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_exact_on_integer_grid():
    # one-hot gather is bit-exact when the grid unnormalizes to exact
    # integers: with align_corners=False and W a power of two,
    # g = (2k+1)/W - 1 gives ix = ((g+1)*W - 1)/2 = k exactly
    x, _ = _rand(1)
    fx = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
    fy = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
    grid = jnp.broadcast_to(
        jnp.stack(jnp.meshgrid(fx, fy, indexing="xy"), -1), (B, H, W, 2))
    out = grid_sample_pallas(x, grid, "border", False, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_flow_warp_auto_uses_xla_on_cpu():
    # on CPU the auto path must stay on the (golden-tested) XLA gather
    x, _ = _rand(2)
    flow = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, 2)) * 2.0
    ref = flow_warp(x, flow)
    assert ref.shape == x.shape


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grad_matches_xla_path(padding_mode, align_corners):
    # the analytic kernel VJP (dx scatter-as-matmul + separable weight
    # grads chained through the index precompute) must equal XLA autodiff
    x, grid = _rand(4)

    def loss_pl(x, g):
        return jnp.sum(
            grid_sample_pallas(x, g, padding_mode, align_corners, True) ** 2)

    def loss_xla(x, g):
        return jnp.sum(grid_sample(x, g, padding_mode, align_corners) ** 2)

    gp = jax.grad(loss_pl, argnums=(0, 1))(x, grid)
    gx = jax.grad(loss_xla, argnums=(0, 1))(x, grid)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_supported_gating():
    assert pallas_warp_supported((16, 128, 128, 32), (16, 128, 128, 2))
    assert pallas_warp_supported((16, 128, 128, 16), (16, 128, 128, 2))
    assert not pallas_warp_supported((1, 100, 100, 32), (1, 100, 100, 2))  # W not pow2
    assert not pallas_warp_supported((1, 256, 256, 32), (1, 256, 256, 2))  # W*C > 4096
    assert not pallas_warp_supported((1, 16, 16, 3), (1, 16, 16, 2))  # C % 8


def _token_chain_ref(a, grid):
    """Unfused reference of token_scatter_pallas: warp -> exp(. - max_n a)
    -> scatter, plus the zaw row sums (all XLA, differentiable)."""
    Bq, Hq, Wq, Cq = a.shape
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2), keepdims=True))
    aw = grid_sample(a, grid, "border", True)
    eaw = jnp.exp(aw - m)
    x0 = jnp.zeros((Bq, Hq, Wq, Cq), a.dtype)
    _, vjpf = jax.vjp(lambda x: grid_sample(x, grid, "border", True), x0)
    return vjpf(eaw)[0], jnp.sum(eaw, axis=(1, 2))


def test_token_scatter_forward():
    from smow_net_tpu.ops.pallas.warp import token_scatter_pallas

    x, grid = _rand(11)
    ref_ew, ref_z = _token_chain_ref(x, grid)
    ew, z = token_scatter_pallas(x, grid, True)
    np.testing.assert_allclose(np.asarray(ew), np.asarray(ref_ew),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z),
                               rtol=1e-5, atol=1e-5)


def test_token_scatter_grads():
    from smow_net_tpu.ops.pallas.warp import token_scatter_pallas

    x, grid = _rand(12)
    r1 = jax.random.normal(jax.random.PRNGKey(13), x.shape)
    r2 = jax.random.normal(jax.random.PRNGKey(14), (B, C))

    def loss_pl(a, g):
        ew, z = token_scatter_pallas(a, g, True)
        return jnp.sum(ew * r1) + jnp.sum(z * r2)

    def loss_ref(a, g):
        ew, z = _token_chain_ref(a, g)
        return jnp.sum(ew * r1) + jnp.sum(z * r2)

    gp = jax.grad(loss_pl, argnums=(0, 1))(x, grid)
    gx = jax.grad(loss_ref, argnums=(0, 1))(x, grid)
    for got, want in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_token_softmax_scatter_fallback_matches_unfused():
    # the ops.warp router on CPU must produce the same (ew, zaw) pair —
    # after normalization, identical to the legacy per-output-max chain
    from smow_net_tpu.ops.warp import token_softmax_scatter

    x, _ = _rand(15)
    flow = jax.random.normal(jax.random.PRNGKey(16), (B, H, W, 2)) * 2.0
    from smow_net_tpu.ops.warp import _flow_grid

    grid = _flow_grid(flow, H, W)
    ref_ew, ref_z = _token_chain_ref(x, grid)
    ew, z = token_softmax_scatter(x, flow)
    np.testing.assert_allclose(np.asarray(ew / z[:, None, None, :]),
                               np.asarray(ref_ew / ref_z[:, None, None, :]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_transpose_vjp_fused_kernel(padding_mode):
    """grid_sample_transpose_vjp_pallas (the one-kernel VJP of the scatter
    op) == autodiff of the XLA scatter: dg is the forward warp of the image
    cotangent, dgrid the scatter's grid gradient."""
    import jax

    from smow_net_tpu.ops.pallas.warp import grid_sample_transpose_vjp_pallas
    from smow_net_tpu.ops.warp import grid_sample

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 16, 16, 8
    g = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    xbar = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, size=(B, H, W, 2)), jnp.float32)

    # scatter(g) == vjp of the sampler; differentiate <xbar, scatter(g)>
    def inner(gg, gr):
        x0 = jnp.zeros((B, H, W, C), jnp.float32)
        _, vjpf = jax.vjp(
            lambda x: grid_sample(x, gr, padding_mode, True), x0)
        return jnp.sum(vjpf(gg)[0] * xbar)

    ref_dg, ref_dgrid = jax.grad(inner, argnums=(0, 1))(g, grid)
    dg, dgrid = grid_sample_transpose_vjp_pallas(
        g, grid, xbar, padding_mode, True, interpret=True)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(ref_dg),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dgrid), np.asarray(ref_dgrid),
                               atol=2e-4, rtol=2e-4)


def test_token_scatter_hybrid_forward_and_grads():
    """The hybrid (fused-fwd + split-bwd) train lowering must match the
    unfused XLA chain in outputs and all grads (VERDICT r4 #1)."""
    from smow_net_tpu.ops.pallas.warp import token_scatter_hybrid_pallas

    x, grid = _rand(17)
    ew, z = token_scatter_hybrid_pallas(x, grid, True)
    ref_ew, ref_z = _token_chain_ref(x, grid)
    np.testing.assert_allclose(np.asarray(ew), np.asarray(ref_ew),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z),
                               rtol=1e-5, atol=1e-5)

    r1 = jax.random.normal(jax.random.PRNGKey(18), x.shape)
    r2 = jax.random.normal(jax.random.PRNGKey(19), (B, C))

    def loss_hyb(a, g):
        ew, z = token_scatter_hybrid_pallas(a, g, True)
        return jnp.sum(ew * r1) + jnp.sum(z * r2)

    def loss_ref(a, g):
        ew, z = _token_chain_ref(a, g)
        return jnp.sum(ew * r1) + jnp.sum(z * r2)

    gp = jax.grad(loss_hyb, argnums=(0, 1))(x, grid)
    gx = jax.grad(loss_ref, argnums=(0, 1))(x, grid)
    for got, want in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_token_train_router_cpu_fallback():
    """token_softmax_scatter_train must fall back to the unfused chain off
    TPU for every impl setting (normalized outputs identical)."""
    from smow_net_tpu.ops import warp as warp_mod

    x, _ = _rand(20)
    flow = jax.random.normal(jax.random.PRNGKey(21), (B, H, W, 2)) * 2.0
    grid = warp_mod._flow_grid(flow, H, W)
    ref_ew, ref_z = _token_chain_ref(x, grid)
    for impl in ("unfused", "fused", "hybrid"):
        try:
            warp_mod.set_token_train_impl(impl)
            ew, z = warp_mod.token_softmax_scatter_train(x, flow)
        finally:
            warp_mod.set_token_train_impl("unfused")
        np.testing.assert_allclose(
            np.asarray(ew / z[:, None, None, :]),
            np.asarray(ref_ew / ref_z[:, None, None, :]),
            rtol=1e-5, atol=1e-5)
