"""SS2D `xv` forward-family parity (VERDICT r4 missing #1).

The reference routes forward_type="xv*" to __initxv__/forwardxv
(compare/vmamba.py:590-591, 824-1067, 1181-1304): a z-gate-free SS2D where
one fused in-projection emits u, dt and PER-DIRECTION B/C routed through
CrossScanTriton1b1 (compare/csm_triton.py:235). No wired recipe reaches it
(the Changemamba recipe pins forward_type="v2", reference train.py:119), but
it is importable reference capability — pinned here against the reference's
own torch code with the naive scan + functional cross-scan stubs injected.
"""

import importlib
import sys

import numpy as np
import pytest
import torch

from ref_stubs import (construct_quiet, install_csm_triton_stub,
                       install_fvcore_stub, install_timm_stub,
                       make_naive_selective_scan)

import jax
import jax.numpy as jnp

from smow_net_tpu.nn.ssm import SS2D


def _load_vmamba():
    install_timm_stub()
    install_fvcore_stub()
    install_csm_triton_stub()
    sys.path.insert(0, "/root/reference")
    try:
        vm = importlib.import_module("compare.vmamba")
    finally:
        sys.path.remove("/root/reference")
    naive = make_naive_selective_scan()
    vm.SelectiveScanMamba = naive
    vm.SelectiveScanCore = naive
    vm.SelectiveScanOflex = naive
    return vm


def _convert(sd, has_dtw, has_outnorm_ln):
    """Reference xv state_dict -> our flax params."""
    p = {
        "in_proj": {"kernel": np.ascontiguousarray(sd["in_proj.weight"].numpy().T)},
        "dt_projs_bias": sd["dt_projs_bias"].numpy(),
        "A_logs": sd["A_logs"].numpy(),
        "Ds": sd["Ds"].numpy(),
        "out_proj": {"kernel": np.ascontiguousarray(sd["out_proj.weight"].numpy().T)},
    }
    if "conv2d.weight" in sd:
        p["conv2d"] = {
            "kernel": np.transpose(sd["conv2d.weight"].numpy(), (2, 3, 1, 0)),
            "bias": sd["conv2d.bias"].numpy(),
        }
    if has_dtw:
        p["dt_projs_weight"] = sd["dt_projs_weight"].numpy()
    if has_outnorm_ln:
        p["out_norm"] = {"scale": sd["out_norm.weight"].numpy(),
                         "bias": sd["out_norm.bias"].numpy()}
    return p


@pytest.mark.parametrize("ftype", [
    "xv1a", "xv2a", "xv3a",      # the three live modes (vmamba.py:944-960)
    "xv1aactmul",                # GELU out-act + multiply-by-u postfixes
    "xv2aact",
])
def test_ss2d_xv_output_parity(ftype):
    vm = _load_vmamba()
    torch.manual_seed(0)
    with construct_quiet():
        ref = vm.SS2D(d_model=32, d_state=8, ssm_ratio=2.0, dt_rank="auto",
                      forward_type=ftype, channel_first=False)
    ref.eval()
    sd = {k: v.detach() for k, v in ref.state_dict().items()}

    ours = SS2D(32, d_state=8, ssm_ratio=2.0, dt_rank="auto",
                forward_type=ftype)
    params = _convert(sd, has_dtw="dt_projs_weight" in sd, has_outnorm_ln=True)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ftype", ["xv1anone", "xv3asigmoid"])
def test_ss2d_xv_elementwise_outnorms(ftype):
    """Identity / sigmoid out-norms are layout-independent, so the oracle
    comparison is valid under channel_first=False too."""
    vm = _load_vmamba()
    torch.manual_seed(1)
    with construct_quiet():
        ref = vm.SS2D(d_model=32, d_state=8, ssm_ratio=2.0, dt_rank="auto",
                      forward_type=ftype, channel_first=False)
    ref.eval()
    sd = {k: v.detach() for k, v in ref.state_dict().items()}
    ours = SS2D(32, d_state=8, ssm_ratio=2.0, dt_rank="auto",
                forward_type=ftype)
    params = _convert(sd, has_dtw="dt_projs_weight" in sd, has_outnorm_ln=False)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ftype", ["xv1asoftmax", "xv2adwconv3"])
def test_ss2d_xv_spatial_outnorms_run(ftype):
    """softmax/dwconv3 out-norms follow the channel-first semantics (spatial
    softmax per channel / depthwise 3x3 over the map). The reference's
    channel_first=False composition applies them to permuted axes
    (vmamba.py:1292-1297) — a latent bug we do not reproduce, so no oracle
    comparison; pin shape, finiteness, and the softmax's defining property."""
    ours = SS2D(32, d_state=8, ssm_ratio=2.0, forward_type=ftype)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), x)
    out = ours.apply(variables, x)
    assert out.shape == (1, 8, 8, 32)
    assert np.isfinite(np.asarray(out)).all()
    if "softmax" in ftype:
        # grads flow through the spatial softmax
        g = jax.grad(lambda v: jnp.sum(jnp.sin(ours.apply(v, x))))(variables)
        assert all(np.isfinite(l).all() for l in jax.tree_util.tree_leaves(g))


def test_cross_scan_1b1_matches_reference_torch():
    """Pin the JAX 1b1 layout to the functional torch stub (which implements
    the Triton index math, csm_triton.py:138-180)."""
    from smow_net_tpu.ops.cross_scan import cross_scan_1b1

    install_csm_triton_stub()
    csm = sys.modules["csm_triton"]
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 4, 5, 6, 7)).astype(np.float32)  # (B,K,c,H,W)
    want = csm.CrossScanTriton1b1.apply(torch.from_numpy(x)).numpy()  # (B,4,c,L)
    # ours: channels-last (B,H,W,K*c) with channel groups [k*c:(k+1)*c]
    xl = np.transpose(x, (0, 3, 4, 1, 2)).reshape(2, 6, 7, 4 * 5)
    got = np.asarray(cross_scan_1b1(jnp.asarray(xl)))  # (B,4,L,c)
    np.testing.assert_allclose(np.transpose(got, (0, 1, 3, 2)), want,
                               rtol=1e-6, atol=1e-6)
