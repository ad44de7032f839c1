"""Golden numerical parity: reference SMOW_Net (torch, random init) vs our
SMOWNet after weight conversion. The reference model file is loaded from
/root/reference as a black-box oracle (never copied); a minimal
torchvision-compatible resnet18 is built here since torchvision is absent.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn

REF = "/root/reference/models/SMOW_Net.py"


def build_resnet18():
    """Minimal torchvision-layout resnet18 (attribute names only; weights
    random) — just enough for the reference's Decompose_* constructors."""

    class BasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.stride = stride
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False), tnn.BatchNorm2d(out)
                )
            else:
                self.downsample = None

    class ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            inp = 64
            for li, w in enumerate(widths, start=1):
                blocks = []
                for bi in range(2):
                    stride = 2 if (li > 1 and bi == 0) else 1
                    blocks.append(BasicBlock(inp, w, stride))
                    inp = w
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    return ResNet18()


def build_reference_smownet():
    """Random-init reference SMOW_Net (eval mode), loaded as a black box."""
    if not os.path.exists(REF):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_smow_net", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    model = mod.SMOW_Net(build_resnet18())
    model.eval()
    return model


@pytest.fixture(scope="module")
def reference_model():
    return build_reference_smownet()


@pytest.mark.slow
def test_smownet_parity_256(reference_model):
    import jax
    import jax.numpy as jnp

    from smow_net_tpu.models import get_model
    from smow_net_tpu.train.convert import load_smownet_state_dict

    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    x2 = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = reference_model(torch.from_numpy(x1), torch.from_numpy(x2)).numpy()

    sd = {k: v.detach().numpy() for k, v in reference_model.state_dict().items()}
    model = get_model("smow_net")
    a = jnp.asarray(np.transpose(x1, (0, 2, 3, 1)))
    b = jnp.asarray(np.transpose(x2, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), a[:, :64, :64], b[:, :64, :64], train=False)
    variables = load_smownet_state_dict(sd, variables)
    out = np.asarray(model.apply(variables, a, b, train=False))
    out = np.transpose(out, (0, 3, 1, 2))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_smownet_lw_parity_256():
    import jax
    import jax.numpy as jnp

    from ref_stubs import construct_quiet, load_reference_module
    from smow_net_tpu.models import get_model
    from smow_net_tpu.train.convert import load_smownet_lw_state_dict

    ref_mod = load_reference_module("/root/reference/models/SMOW_Net_LW.py", "ref_smow_lw")
    torch.manual_seed(0)
    with construct_quiet():
        reference = ref_mod.SMOW_Net_LW()
    reference.eval()

    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    x2 = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = reference(torch.from_numpy(x1), torch.from_numpy(x2)).numpy()

    sd = {k: v.detach().numpy() for k, v in reference.state_dict().items()}
    model = get_model("smow_net_lw")
    a = jnp.asarray(np.transpose(x1, (0, 2, 3, 1)))
    b = jnp.asarray(np.transpose(x2, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), a[:, :64, :64], b[:, :64, :64], train=False)
    variables = load_smownet_lw_state_dict(sd, variables)
    out = np.asarray(model.apply(variables, a, b, train=False))
    out = np.transpose(out, (0, 3, 1, 2))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_fc_ef_output_parity():
    """Zoo output parity beyond parameter counts: convert a random-init
    reference FC_EF and compare full outputs (eval mode)."""
    import jax
    import jax.numpy as jnp

    from ref_stubs import load_reference_module
    from smow_net_tpu.models import get_model
    from smow_net_tpu.train.convert import t2j_conv, t2j_conv_transpose

    ref_mod = load_reference_module("/root/reference/compare/FC_EF.py", "ref_fcef_p")
    torch.manual_seed(1)
    reference = ref_mod.FC_EF(3, 2)
    reference.eval()
    sd = {k: v.detach().numpy() for k, v in reference.state_dict().items()}

    model = get_model("fc_ef")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    encoder = {f"conv{i}{j}" for i, n in ((1, 2), (2, 2), (3, 3), (4, 3))
               for j in range(1, n + 1)}
    for name in list(params.keys()):
        if name.endswith("_bn"):
            src = "bn" + name[4:-3]  # convXY_bn -> bnXY (incl. trailing 'd')
            params[name]["scale"] = sd[src + ".weight"]
            params[name]["bias"] = sd[src + ".bias"]
            stats[name]["mean"] = sd[src + ".running_mean"]
            stats[name]["var"] = sd[src + ".running_var"]
        else:
            w = sd[name + ".weight"]
            conv = t2j_conv(w) if name in encoder else t2j_conv_transpose(w)
            assert params[name]["kernel"].shape == conv.shape, name
            params[name]["kernel"] = conv
            params[name]["bias"] = sd[name + ".bias"]

    rng = np.random.default_rng(3)
    a = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    b = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = reference(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                      jnp.asarray(np.transpose(b, (0, 2, 3, 1))), train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
