"""Pretrained-backbone ingestion for training (SURVEY.md §5; VERDICT #4).

The reference always starts from ImageNet weights: SMOW_Net inflates a
torchvision resnet18 (reference train.py:84-85), SMOW_Net_LW pulls torch-hub
mobilenet_v2 (models/SMOW_Net_LW.py:581-589), IFN uses torchvision vgg16
(compare/IFN.py:7), BIT/TFI_GR/SEIFNet vendored resnet18s fetch the
torchvision URL. This environment has no network, so `train.py --pretrained
<file>` ingests a user-supplied state_dict (.pth via torch, or .npz) and maps
it onto the matching backbone subtree of our flax variables.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .convert import _bn, load_mobilenet_v2, load_resnet18_into_resnet3d, t2j_conv

__all__ = ["load_state_dict_file", "load_pretrained_backbone", "load_resnet18_2d"]


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def load_resnet18_2d(sd: Dict[str, np.ndarray], params, stats) -> None:
    """Map a torchvision-layout resnet18 state_dict onto an nn/resnet.py
    ResNet subtree (in place). Stages beyond the subtree (e.g. BIT builds
    only 3) are skipped."""

    def put_bn(dst_p, dst_s, src):
        p, s = _bn(sd, src)
        dst_p["scale"] = p["scale"].astype(np.float32)
        dst_p["bias"] = p["bias"].astype(np.float32)
        dst_s["mean"] = s["mean"].astype(np.float32)
        dst_s["var"] = s["var"].astype(np.float32)

    params["conv1"]["kernel"] = t2j_conv(sd["conv1.weight"]).astype(np.float32)
    put_bn(params["bn1"], stats["bn1"], "bn1")
    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            if name not in params:
                continue  # truncated backbone (e.g. BIT's 3-stage resnet)
            src = f"layer{li}.{bi}"
            blk_p, blk_s = params[name], stats[name]
            for ci in (1, 2):
                k = t2j_conv(sd[f"{src}.conv{ci}.weight"])
                assert blk_p[f"conv{ci}"]["kernel"].shape == k.shape, (name, ci)
                blk_p[f"conv{ci}"]["kernel"] = k.astype(np.float32)
                put_bn(blk_p[f"bn{ci}"], blk_s[f"bn{ci}"], f"{src}.bn{ci}")
            if "downsample_conv" in blk_p and f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"]["kernel"] = t2j_conv(
                    sd[f"{src}.downsample.0.weight"]).astype(np.float32)
                put_bn(blk_p["downsample_bn"], blk_s["downsample_bn"],
                       f"{src}.downsample.1")


def _load_vgg16_features(sd: Dict[str, np.ndarray], params, prefix: str) -> None:
    """torchvision vgg16 `features.N` convs -> our nn/vgg.py `conv_N` naming
    (used twice by IFN's non-siamese t1_base/t2_base)."""
    for name in list(params[prefix].keys()):
        if not name.startswith("conv_"):
            continue
        idx = name.split("_")[1]
        params[prefix][name]["kernel"] = t2j_conv(
            sd[f"features.{idx}.weight"]).astype(np.float32)
        params[prefix][name]["bias"] = sd[f"features.{idx}.bias"].astype(np.float32)


def load_pretrained_backbone(model_name: str, path: str, variables) -> dict:
    """Ingest a pretrained state_dict into the backbone subtree of
    `variables` for the given model. Returns new variables."""
    import jax

    sd = load_state_dict_file(path)
    name = model_name.lower()

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    if name in ("smow_net", "afcf3d"):
        # both inflate a resnet18 into the "resnet" ResNet3D subtree
        # (models/SMOW_Net.py:426-532; AFCF3D_NET.py:524-605)
        sub = load_resnet18_into_resnet3d(
            sd, {"params": params["resnet"], "batch_stats": stats["resnet"]})
        params["resnet"], stats["resnet"] = sub["params"], sub["batch_stats"]
    elif name in ("smow_net_lw", "a2net"):
        sub = {"params": params["backbone"], "batch_stats": stats["backbone"]}
        # torch-hub mobilenet_v2 checkpoints prefix with "features."
        bb = load_mobilenet_v2(sd, sub)
        params["backbone"], stats["backbone"] = bb["params"], bb["batch_stats"]
    elif name in ("tfi_gr", "seifnet"):
        load_resnet18_2d(sd, params["backbone"], stats["backbone"])
    elif name == "bit":
        load_resnet18_2d(sd, params["resnet"], stats["resnet"])
    elif name == "ifn":
        _load_vgg16_features(sd, params, "t1_base")
        _load_vgg16_features(sd, params, "t2_base")
    else:
        raise ValueError(
            f"no pretrained-backbone recipe for model '{model_name}'; the "
            "reference initializes this model from scratch or via its own URL")
    return {"params": params, "batch_stats": stats}
