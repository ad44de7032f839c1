import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.ops.cross_scan import cross_merge, cross_merge8, cross_scan, cross_scan8
from smow_net_tpu.ops.scan import selective_scan


def naive_selective_scan(u, delta, A, B, C, D=None, delta_bias=None, softplus=False):
    """Straight-line float64 reference of the S6 recurrence."""
    b, L, Dch = u.shape
    _, _, G, N = B.shape
    Cg = Dch // G
    dt = delta.astype(np.float64)
    if delta_bias is not None:
        dt = dt + delta_bias
    if softplus:
        dt = np.log1p(np.exp(dt))
    y = np.zeros((b, L, Dch))
    for bi in range(b):
        h = np.zeros((Dch, N))
        for l in range(L):
            for d in range(Dch):
                g = d // Cg
                h[d] = np.exp(dt[bi, l, d] * A[d]) * h[d] + dt[bi, l, d] * B[bi, l, g] * u[bi, l, d]
                y[bi, l, d] = np.dot(C[bi, l, g], h[d])
    if D is not None:
        y = y + u * D
    return y


@pytest.mark.parametrize("G,softplus", [(1, True), (2, False)])
def test_selective_scan_matches_naive(G, softplus):
    rng = np.random.default_rng(0)
    b, L, Dch, N = 2, 12, 8, 4
    u = rng.normal(size=(b, L, Dch)).astype(np.float32)
    delta = rng.normal(size=(b, L, Dch)).astype(np.float32) * 0.5
    A = -np.exp(rng.normal(size=(Dch, N))).astype(np.float32) * 0.5
    B = rng.normal(size=(b, L, G, N)).astype(np.float32)
    C = rng.normal(size=(b, L, G, N)).astype(np.float32)
    D = rng.normal(size=(Dch,)).astype(np.float32)
    bias = rng.normal(size=(Dch,)).astype(np.float32) * 0.1

    ref = naive_selective_scan(u, delta, A, B, C, D, bias, softplus)
    out = np.asarray(selective_scan(u, delta, A, B, C, D, bias, softplus))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_selective_scan_grad_finite():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(1, 16, 4)), jnp.float32)
    delta = jnp.asarray(rng.normal(size=(1, 16, 4)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4, 3)), jnp.float32))
    B = jnp.asarray(rng.normal(size=(1, 16, 1, 3)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(1, 16, 1, 3)), jnp.float32)

    def loss(u):
        return jnp.sum(selective_scan(u, delta, A, B, C, delta_softplus=True) ** 2)

    g = jax.grad(loss)(u)
    assert np.isfinite(np.asarray(g)).all()


def test_cross_scan_order():
    H, W, C = 3, 4, 2
    x = np.arange(H * W * C, dtype=np.float32).reshape(1, H, W, C)
    s = np.asarray(cross_scan(x))
    flat = x.reshape(1, H * W, C)
    np.testing.assert_array_equal(s[:, 0], flat)
    np.testing.assert_array_equal(s[:, 1], x.transpose(0, 2, 1, 3).reshape(1, H * W, C))
    np.testing.assert_array_equal(s[:, 2], flat[:, ::-1])


def test_cross_merge_inverts_scan():
    rng = np.random.default_rng(2)
    H, W, C = 5, 7, 3
    x = rng.normal(size=(2, H, W, C)).astype(np.float32)
    merged = np.asarray(cross_merge(cross_scan(x), H, W))
    np.testing.assert_allclose(merged, 4 * x.reshape(2, H * W, C), rtol=1e-6)


def test_cross_scan8_and_merge():
    rng = np.random.default_rng(3)
    H, W, C = 4, 6, 2
    x = rng.normal(size=(1, H, W, C)).astype(np.float32)
    s8 = np.asarray(cross_scan8(x))
    assert s8.shape == (1, 8, H * W, C)
    # each traversal is a permutation of the pixels
    for k in range(8):
        a = np.sort(s8[0, k, :, 0])
        b = np.sort(x[0, :, :, 0].ravel())
        np.testing.assert_allclose(a, b)
    # diagonal traversal starts at (0,0) and next is (0,1) or (1,0)
    np.testing.assert_array_equal(s8[0, 4, 0], x[0, 0, 0])
    merged = np.asarray(cross_merge8(s8, H, W))
    np.testing.assert_allclose(merged, 8 * x.reshape(1, H * W, C), rtol=1e-5)


def test_cross_scan8_matches_reference_torch():
    """Pin the 8-direction traversal order to the reference's torch
    CrossScan/CrossMerge (compare/rs_mamba.py:241-383), incl. the *wrapped*
    modular diagonal gather order."""
    import sys
    import torch

    sys.path.insert(0, "tests")
    from ref_stubs import install_csm_triton_stub, install_fvcore_stub, load_reference_module

    install_fvcore_stub()
    install_csm_triton_stub()
    ref = load_reference_module("/root/reference/compare/rs_mamba.py", "ref_rsm_cs")

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 5, 7, 3
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)

    ref_xs = ref.CrossScan.apply(torch.from_numpy(x)).numpy()  # (B, 8, C, L)
    ours = np.asarray(cross_scan8(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(ours, (0, 1, 3, 2)), ref_xs, rtol=0, atol=0)

    ys = rng.normal(size=(B, 8, C, H, W)).astype(np.float32)
    ref_merged = ref.CrossMerge.apply(torch.from_numpy(ys)).numpy()  # (B, C, L)
    ours_m = np.asarray(cross_merge8(
        jnp.asarray(np.transpose(ys.reshape(B, 8, C, H * W), (0, 1, 3, 2))), H, W))
    np.testing.assert_allclose(np.transpose(ours_m, (0, 2, 1)), ref_merged, rtol=1e-6, atol=1e-6)


def test_vssblock_remat_equivalence():
    """use_checkpoint (nn.remat) must not change outputs or grads."""
    import jax

    from smow_net_tpu.nn.ssm import VSSBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    plain = VSSBlock(16, 0.0, ssm_d_state=4, mlp_ratio=2.0)
    remat = VSSBlock(16, 0.0, ssm_d_state=4, mlp_ratio=2.0, remat=True)
    v = plain.init(jax.random.PRNGKey(0), x, False)

    y1, g1 = jax.value_and_grad(lambda p: jnp.sum(plain.apply(p, x, False) ** 2))(v)
    y2, g2 = jax.value_and_grad(lambda p: jnp.sum(remat.apply(p, x, False) ** 2))(v)
    np.testing.assert_allclose(float(y1), float(y2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_cross_scan_ablations_match_reference_torch():
    """Pin the SS2D 1-/2-direction ablation layouts to the reference torch
    autograd functions (compare/vmamba.py:73-137, forward_types v31d/v32d)."""
    import sys

    import torch

    sys.path.insert(0, "tests")
    from ref_stubs import (disable_cuda_calls, install_csm_triton_stub,
                           install_fvcore_stub, install_timm_stub)

    install_fvcore_stub()
    install_csm_triton_stub()
    install_timm_stub()
    disable_cuda_calls()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        vm = importlib.import_module("compare.vmamba")
    finally:
        sys.path.remove("/root/reference")

    from smow_net_tpu.ops.cross_scan import (cross_merge_1d, cross_merge_2d,
                                             cross_scan_1d, cross_scan_2d)

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 3, 5, 4
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    xcl = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ys = rng.normal(size=(B, 4, C, H, W)).astype(np.float32)
    yscl = jnp.asarray(np.transpose(ys.reshape(B, 4, C, H * W), (0, 1, 3, 2)))

    for scan, merge, ref_s, ref_m in (
        (cross_scan_1d, cross_merge_1d,
         vm.CrossScan_Ab_1direction, vm.CrossMerge_Ab_1direction),
        (cross_scan_2d, cross_merge_2d,
         vm.CrossScan_Ab_2direction, vm.CrossMerge_Ab_2direction),
    ):
        ref_xs = ref_s.apply(torch.from_numpy(x)).numpy()       # (B,4,C,L)
        ours = np.transpose(np.asarray(scan(xcl)), (0, 1, 3, 2))
        np.testing.assert_array_equal(ours, ref_xs)
        ref_merged = ref_m.apply(torch.from_numpy(ys)).numpy()  # (B,C,L)
        ours_m = np.transpose(np.asarray(merge(yscl, H, W)), (0, 2, 1))
        np.testing.assert_allclose(ours_m, ref_merged, rtol=1e-6, atol=1e-6)


def test_ss2d_scan_variants():
    """scan_variant='1d'/'2d' run with v2-identical parameter shapes and
    produce results distinct from the default cross scan."""
    import jax

    from smow_net_tpu.nn.ssm import SS2D

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 16)), jnp.float32)
    base = SS2D(16, d_state=4)
    v = base.init(jax.random.PRNGKey(0), x)
    shapes = jax.tree_util.tree_map(jnp.shape, v)
    outs = {}
    for variant in ("cross", "1d", "2d"):
        mod = SS2D(16, d_state=4, scan_variant=variant)
        assert jax.tree_util.tree_map(jnp.shape, mod.init(
            jax.random.PRNGKey(0), x)) == shapes
        y, g = jax.value_and_grad(
            lambda p: jnp.sum(mod.apply(p, x) ** 2))(v)
        assert np.isfinite(float(y))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
        outs[variant] = float(y)
    assert outs["cross"] != outs["1d"] != outs["2d"]
