"""Pretrained-backbone ingestion (train.py --pretrained; VERDICT #4).

Converts a random torchvision-layout resnet18 state_dict and asserts:
  * the 2D path (TFI_GR/SEIFNet-style nn/resnet.ResNet) reproduces the torch
    backbone's stage outputs;
  * the inflated path (SMOW_Net's ResNet3D) reproduces the torch stem
    per-frame at T=2 (temporal mixers are identity at init,
    models/SMOW_Net.py:113-117 semantics).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_convert_parity import build_resnet18


def torch_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_resnet18_2d_ingestion_matches_torch_stages():
    from smow_net_tpu.nn.resnet import ResNet
    from smow_net_tpu.train.pretrained import load_resnet18_2d

    torch.manual_seed(0)
    ref = build_resnet18()
    ref.eval()
    sd = torch_sd(ref)

    model = ResNet(layers=(2, 2, 2, 2))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    load_resnet18_2d(sd, params, stats)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        t = torch.from_numpy(img)
        y = ref.relu(ref.bn1(ref.conv1(t)))
        y = F.max_pool2d(y, 3, 2, 1)
        torch_feats = []
        for li in range(1, 5):
            for blk in getattr(ref, f"layer{li}"):
                identity = y
                z = F.relu(blk.bn1(blk.conv1(y)))
                z = blk.bn2(blk.conv2(z))
                if blk.downsample is not None:
                    identity = blk.downsample(y)
                y = F.relu(z + identity)
            torch_feats.append(y.numpy())

    feats = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(np.transpose(img, (0, 2, 3, 1))), train=False)
    for ours, theirs in zip(feats[1:], torch_feats):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, rtol=1e-4, atol=1e-4)


def test_resnet18_inflated_ingestion_stem_per_frame():
    from smow_net_tpu.models import get_model
    from smow_net_tpu.train.pretrained import load_pretrained_backbone

    torch.manual_seed(1)
    ref = build_resnet18()
    ref.eval()
    sd = torch_sd(ref)

    import tempfile

    model = get_model("smow_net")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **sd)
        variables = load_pretrained_backbone("smow_net", f.name, variables)

    # spatial kernels must be the inflated 2D kernels
    k3d = np.asarray(variables["params"]["resnet"]["conv1"]["spatial"]["kernel"])
    k2d = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))[None]
    np.testing.assert_allclose(k3d, k2d, rtol=0, atol=0)

    # stem at T=2 equals the torch 2D stem applied per frame (identity mixers)
    from smow_net_tpu.nn.resnet3d import DecomposedConv3d

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    vol = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))[:, None]
    vol = jnp.concatenate([vol, vol], axis=1)  # (1, T=2, H, W, 3)

    stem = DecomposedConv3d(64, 7, 2, 3)
    sub = {"params": variables["params"]["resnet"]["conv1"]}
    out = np.asarray(stem.apply(sub, vol))
    with torch.no_grad():
        ref_out = ref.conv1(torch.from_numpy(img)).numpy()
    for t in range(2):
        np.testing.assert_allclose(
            np.transpose(out[:, t], (0, 3, 1, 2)), ref_out, rtol=1e-4, atol=1e-4)


def test_load_state_dict_file_roundtrip(tmp_path):
    from smow_net_tpu.train.pretrained import load_state_dict_file

    torch.manual_seed(2)
    ref = build_resnet18()
    p = tmp_path / "r18.pth"
    torch.save(ref.state_dict(), str(p))
    sd = load_state_dict_file(str(p))
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert isinstance(sd["conv1.weight"], np.ndarray)
