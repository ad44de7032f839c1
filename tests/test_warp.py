import numpy as np
import pytest
import torch
import torch.nn.functional as F

from smow_net_tpu.ops import flow_warp, grid_sample


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(padding, align):
    rng = np.random.default_rng(0)
    B, C, H, W = 2, 5, 9, 13
    Hg, Wg = 7, 8
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(B, Hg, Wg, 2)).astype(np.float32)

    ref = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode=padding, align_corners=align,
    ).numpy()

    x_cl = np.transpose(x, (0, 2, 3, 1))
    out = np.asarray(grid_sample(x_cl, grid, padding_mode=padding, align_corners=align))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity():
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 16, 16, 3
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    fy = np.linspace(-1, 1, H, dtype=np.float32)
    fx = np.linspace(-1, 1, W, dtype=np.float32)
    gx, gy = np.meshgrid(fx, fy, indexing="xy")
    grid = np.stack([gx, gy], -1)[None]
    out = np.asarray(grid_sample(x, grid, "border", True))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


def test_flow_warp_matches_reference_semantics():
    """Replicates the OFW warp formula (models/SMOW_Net.py:612-631) in torch:
    identity linspace grid + flow/(W,H), clamped, border, align_corners."""
    rng = np.random.default_rng(2)
    B, C, H, W = 2, 4, 12, 10
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    flow = rng.normal(scale=3.0, size=(B, 2, H, W)).astype(np.float32)

    xt = torch.from_numpy(x)
    ft = torch.from_numpy(flow)
    h_grid = torch.linspace(-1.0, 1.0, H).view(-1, 1).repeat(1, W)
    w_grid = torch.linspace(-1.0, 1.0, W).repeat(H, 1)
    base = torch.cat((w_grid.unsqueeze(2), h_grid.unsqueeze(2)), 2).repeat(B, 1, 1, 1)
    norm = torch.tensor([[[[W, H]]]], dtype=torch.float32)
    field = ft.permute(0, 2, 3, 1) / norm
    ref = F.grid_sample(
        xt, (base + field).clamp(-1, 1), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).numpy()

    x_cl = np.transpose(x, (0, 2, 3, 1))
    f_cl = np.transpose(flow, (0, 2, 3, 1))
    out = np.asarray(flow_warp(x_cl, f_cl))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


import jax.numpy as jnp


def test_flow_warp_transpose_is_adjoint():
    """<warp(x), g> == <x, warpT(g)> for random x, g, flow — pins the
    transposed sampler used by the fused OFW token path."""
    import jax

    from smow_net_tpu.ops.warp import flow_warp, flow_warp_transpose

    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (2, 16, 16, 8))
    g = jax.random.normal(k(1), (2, 16, 16, 8))
    flow = jax.random.normal(k(2), (2, 16, 16, 2)) * 4.0
    lhs = jnp.sum(flow_warp(x, flow) * g)
    rhs = jnp.sum(x * flow_warp_transpose(g, flow))
    assert abs(float(lhs - rhs)) < 1e-3


def test_flow_warp_transpose_grads():
    """VJP of the transposed warp: d/dg == forward warp of the cotangent;
    d/dflow checked against finite differences."""
    import jax

    from smow_net_tpu.ops.warp import flow_warp_transpose

    k = jax.random.PRNGKey
    g = jax.random.normal(k(0), (1, 8, 8, 4))
    flow = jax.random.normal(k(1), (1, 8, 8, 2)) * 2.0

    def f(g, flow):
        return jnp.sum(flow_warp_transpose(g, flow) ** 2)

    dg, dflow = jax.grad(f, argnums=(0, 1))(g, flow)
    eps = 1e-3
    for idx in [(0, 3, 4, 0), (0, 1, 2, 1)]:
        d = jnp.zeros_like(flow).at[idx].set(eps)
        fd = (f(g, flow + d) - f(g, flow - d)) / (2 * eps)
        assert abs(float(fd) - float(dflow[idx])) < 0.1 * max(1.0, abs(float(fd)))
    d = jnp.zeros_like(g).at[0, 2, 2, 3].set(eps)
    fd = (f(g + d, flow) - f(g - d, flow)) / (2 * eps)
    assert abs(float(fd) - float(dg[0, 2, 2, 3])) < 0.1 * max(1.0, abs(float(fd)))
