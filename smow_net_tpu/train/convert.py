"""PyTorch -> JAX weight conversion (SURVEY.md §5 checkpoint ingestion).

Supports the reference's pretrained-weight entry points:
  * torchvision `resnet18` state_dict -> inflated `ResNet3D` params
    (reference builds SMOW_Net from ImageNet resnet18, train.py:84-85;
    inflation semantics models/SMOW_Net.py:426-519: 2D kernels become the
    (1,kh,kw) spatial kernels, temporal mixers keep their zero/identity init)
  * torch-hub `mobilenet_v2` state_dict -> our MobileNetV2
  * full reference-trained `SMOW_Net` state_dict -> SMOWNet variables
    (for F1/IoU parity evaluation of reference checkpoints)

Tensor layout rules (torch -> ours, channels-last):
  Conv{2,3}d   (O, I/g, *k)   -> (*k, I/g, O)
  ConvTransp.  (I, O/g, *k)   -> flip(*k) + regroup -> (*k, I/g, O)
  Linear       (O, I)         -> (I, O)
  BatchNorm    weight/bias -> scale/bias; running stats -> batch_stats
State dicts are plain name->numpy dicts (load .pth with torch on CPU and
`{k: v.numpy() for k, v in sd.items()}`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "t2j_conv", "t2j_conv_transpose", "t2j_linear",
    "load_resnet18_into_resnet3d", "load_mobilenet_v2", "load_smownet_state_dict",
]


def t2j_conv(w: np.ndarray, extra_time_dim: bool = False) -> np.ndarray:
    """(O, I/g, *k) -> (*k, I/g, O); optionally prepend a size-1 time axis."""
    nk = w.ndim - 2
    out = np.transpose(w, tuple(range(2, 2 + nk)) + (1, 0))
    if extra_time_dim:
        out = out[None]
    return np.ascontiguousarray(out)


def t2j_conv_transpose(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """(I, O/g, *k) -> forward-conv layout (*k, I/g, O): flip + regroup."""
    nk = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, 2 + nk)))
    in_c, out_pg = w.shape[:2]
    in_pg = in_c // groups
    w = w.reshape((groups, in_pg, out_pg) + w.shape[2:])
    perm = tuple(range(3, 3 + nk)) + (1, 0, 2)
    w = np.transpose(w, perm)
    return np.ascontiguousarray(w.reshape(w.shape[:nk] + (in_pg, groups * out_pg)))


def t2j_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def load_resnet18_into_resnet3d(sd: Dict[str, np.ndarray], variables):
    """Overwrite the ResNet3D subtree of `variables` (params+batch_stats)
    with an inflated torchvision resnet18 state_dict. Returns new variables.
    Temporal mixers are untouched (identity-at-init inflation)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    params = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        expected = np.asarray(node[path[-1]]).shape
        assert value.shape == expected, (path, value.shape, expected)
        node[path[-1]] = value.astype(np.float32)

    # stem
    put(params, ("conv1", "spatial", "kernel"), t2j_conv(sd["conv1.weight"], True))
    bn_p, bn_s = _bn(sd, "bn1")
    put(params, ("bn1", "scale"), bn_p["scale"])
    put(params, ("bn1", "bias"), bn_p["bias"])
    put(stats, ("bn1", "mean"), bn_s["mean"])
    put(stats, ("bn1", "var"), bn_s["var"])

    for li in range(1, 5):
        for bi in range(2):
            t = f"layer{li}.{bi}"
            o = f"layer{li}_{bi}"
            for ci in (1, 2):
                put(params, (o, f"conv{ci}", "spatial", "kernel"),
                    t2j_conv(sd[f"{t}.conv{ci}.weight"], True))
                p, s = _bn(sd, f"{t}.bn{ci}")
                put(params, (o, f"bn{ci}", "scale"), p["scale"])
                put(params, (o, f"bn{ci}", "bias"), p["bias"])
                put(stats, (o, f"bn{ci}", "mean"), s["mean"])
                put(stats, (o, f"bn{ci}", "var"), s["var"])
            if f"{t}.downsample.0.weight" in sd:
                put(params, (o, "downsample_conv", "kernel"),
                    t2j_conv(sd[f"{t}.downsample.0.weight"], True))
                p, s = _bn(sd, f"{t}.downsample.1")
                put(params, (o, "downsample_bn", "scale"), p["scale"])
                put(params, (o, "downsample_bn", "bias"), p["bias"])
                put(stats, (o, "downsample_bn", "mean"), s["mean"])
                put(stats, (o, "downsample_bn", "var"), s["var"])

    return {"params": params, "batch_stats": stats}


def load_mobilenet_v2(sd: Dict[str, np.ndarray], variables):
    """torch-hub mobilenet_v2 features.* state_dict -> our MobileNetV2
    subtree. Returns new variables dict."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def cbr(dst, src):
        cbr_inner(params[dst], stats[dst], sd, src)

    cbr("features_0", "features.0")
    if "features_18" in params:
        cbr("features_18", "features.18")

    for idx in range(1, 18):
        dst = params[f"features_{idx}"]
        dstst = stats[f"features_{idx}"]
        src = f"features.{idx}.conv"
        sub = 0
        if "pw" in dst:  # expand_ratio != 1
            cbr_inner(dst["pw"], dstst["pw"], sd, f"{src}.{sub}")
            sub += 1
        cbr_inner(dst["dw"], dstst["dw"], sd, f"{src}.{sub}")
        sub += 1
        # pw-linear conv + bn
        k = t2j_conv(sd[f"{src}.{sub}.weight"])
        assert np.asarray(dst["pw_linear"]["kernel"]).shape == k.shape
        dst["pw_linear"]["kernel"] = k.astype(np.float32)
        p, s = _bn(sd, f"{src}.{sub + 1}")
        dst["pw_linear_bn"].update(p)
        dstst["pw_linear_bn"].update({"mean": s["mean"], "var": s["var"]})

    return {"params": params, "batch_stats": stats}


def cbr_inner(dst_p, dst_s, sd, src):
    k = t2j_conv(sd[src + ".0.weight"])
    assert np.asarray(dst_p["conv"]["kernel"]).shape == k.shape, (src, k.shape)
    dst_p["conv"]["kernel"] = k.astype(np.float32)
    p, s = _bn(sd, src + ".1")
    dst_p["bn"].update(p)
    dst_s["bn"].update({"mean": s["mean"], "var": s["var"]})


def load_smownet_state_dict(sd: Dict[str, np.ndarray], variables):
    """Map a reference-trained SMOW_Net state_dict onto SMOWNet variables
    (parity evaluation). Handles the encoder via
    load_resnet18-style rules plus all decoder/transformer modules."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def setv(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        assert np.asarray(node[path[-1]]).shape == value.shape, \
            (path, value.shape, np.asarray(node[path[-1]]).shape)
        node[path[-1]] = value.astype(np.float32)

    def bn_into(dst_path, src, has_stats=True):
        p, s = _bn(sd, src)
        setv(params, dst_path + ("scale",), p["scale"])
        setv(params, dst_path + ("bias",), p["bias"])
        if has_stats:
            setv(stats, dst_path + ("mean",), s["mean"])
            setv(stats, dst_path + ("var",), s["var"])

    def dconv_into(dst, src, bias=False):
        """reference Decompose_conv (spatial + 3 temporal mixers)."""
        setv(params, dst + ("spatial", "kernel"), t2j_conv(sd[src + ".conv3d_spatial.weight"]))
        if bias and src + ".conv3d_spatial.bias" in sd:
            setv(params, dst + ("spatial", "bias"), sd[src + ".conv3d_spatial.bias"])
        for i in (1, 2, 3):
            setv(params, dst + (f"time_{i}", "kernel"),
                 t2j_conv(sd[f"{src}.conv3d_time_{i}.weight"]))

    # ---- encoder ----
    dconv_into(("resnet", "conv1"), "resnet.conv1")
    bn_into(("resnet", "bn1"), "resnet.bn1")
    for li in range(1, 5):
        for bi in range(2):
            src = f"resnet.layer{li}.{bi}"
            dst = ("resnet", f"layer{li}_{bi}")
            dconv_into(dst + ("conv1",), src + ".conv1")
            dconv_into(dst + ("conv2",), src + ".conv2")
            bn_into(dst + ("bn1",), src + ".bn1")
            bn_into(dst + ("bn2",), src + ".bn2")
            if f"{src}.downsample.0.weight" in sd:
                setv(params, dst + ("downsample_conv", "kernel"),
                     t2j_conv(sd[f"{src}.downsample.0.weight"]))
                if f"{src}.downsample.0.bias" in sd:
                    # inflate_conv keeps the (absent) 2D bias; usually None
                    pass
                bn_into(dst + ("downsample_bn",), f"{src}.downsample.1")

    # ---- BasicConv3d reductions ----
    for name in ("Conv3d", "Conv3d1", "Conv3d2", "Conv3d3", "Conv3d4"):
        setv(params, (name, "conv", "kernel"), t2j_conv(sd[name + ".conv_bn.0.weight"]))
        setv(params, (name, "conv", "bias"), sd[name + ".conv_bn.0.bias"])
        bn_into((name, "bn"), name + ".conv_bn.1")

    # ---- OFW ----
    for i, idx in enumerate((0, 3, 6)):
        g = sd[f"OFW.down.{idx}.weight"].shape[0]
        setv(params, ("OFW", f"down{i}_conv", "kernel"), t2j_conv(sd[f"OFW.down.{idx}.weight"]))
        setv(params, ("OFW", f"down{i}_conv", "bias"), sd[f"OFW.down.{idx}.bias"])
        bn_into(("OFW", f"down{i}_bn"), f"OFW.down.{idx + 1}")
    setv(params, ("OFW", "flow_make", "kernel"), t2j_conv(sd["OFW.flow_make.weight"]))

    # ---- token transformer encoder ----
    te = "Transformer_Encoder"
    setv(params, (te, "pos_embedding"), sd[te + ".pos_embedding"])
    setv(params, (te, "conv_a", "kernel"), t2j_conv(sd[te + ".conv_a.weight"]))
    setv(params, (te, "conv_a", "bias"), sd[te + ".conv_a.bias"])
    tl = te + ".transformer.layers.0"
    setv(params, (te, "transformer", "norm1", "scale"), sd[tl + ".0.norm.weight"])
    setv(params, (te, "transformer", "norm1", "bias"), sd[tl + ".0.norm.bias"])
    setv(params, (te, "transformer", "attn", "to_qkv", "kernel"),
         t2j_linear(sd[tl + ".0.fn.to_qkv.weight"]))
    setv(params, (te, "transformer", "attn", "to_out", "kernel"),
         t2j_linear(sd[tl + ".0.fn.to_out.0.weight"]))
    setv(params, (te, "transformer", "attn", "to_out", "bias"), sd[tl + ".0.fn.to_out.0.bias"])
    setv(params, (te, "transformer", "norm2", "scale"), sd[tl + ".1.norm.weight"])
    setv(params, (te, "transformer", "norm2", "bias"), sd[tl + ".1.norm.bias"])
    setv(params, (te, "transformer", "ff", "fc1", "kernel"), t2j_linear(sd[tl + ".1.fn.net.0.weight"]))
    setv(params, (te, "transformer", "ff", "fc1", "bias"), sd[tl + ".1.fn.net.0.bias"])
    setv(params, (te, "transformer", "ff", "fc2", "kernel"), t2j_linear(sd[tl + ".1.fn.net.3.weight"]))
    setv(params, (te, "transformer", "ff", "fc2", "bias"), sd[tl + ".1.fn.net.3.bias"])

    # ---- decoder 3D blocks ----
    for name, feats in (("C3DT1", 256), ("C3DT2", 128), ("C3DT3", 64), ("C3DT4", 64), ("C3DT5", 32)):
        setv(params, (name, "spatial", "kernel"),
             t2j_conv_transpose(sd[name + ".conv3d_spatial.weight"]))
        setv(params, (name, "spatial", "bias"), sd[name + ".conv3d_spatial.bias"])
        # time_5 identity mixer; time_1..4 stacked (ConvT (I,O,1,1,1) -> (C,C))
        w5 = sd[name + ".conv3d_time_5.weight"][:, :, 0, 0, 0]
        setv(params, (name, "tmix", "time_5_kernel"), w5[None, None, None])
        mix = np.stack([sd[f"{name}.conv3d_time_{i}.weight"][:, :, 0, 0, 0] for i in (1, 2, 3, 4)])
        setv(params, (name, "tmix", "time_mix_kernel"), mix)
        setv(params, (name, "tmix", "time_5_bias"), sd[name + ".conv3d_time_5.bias"])
        setv(params, (name, "tmix", "time_mix_bias"),
             np.stack([sd[f"{name}.conv3d_time_{i}.bias"] for i in (1, 2, 3, 4)]))
        bn_into((name, "bn"), name + ".batch")

    for name in ("C3D1", "C3D2", "C3D3", "C3D4", "C3D5"):
        base = name + ".conv_block_2_3d"
        setv(params, (name, "conv1", "kernel"), t2j_conv(sd[base + ".0.weight"]))
        setv(params, (name, "conv1", "bias"), sd[base + ".0.bias"])
        bn_into((name, "bn1"), base + ".1")
        setv(params, (name, "conv2", "kernel"), t2j_conv(sd[base + ".3.weight"]))
        setv(params, (name, "conv2", "bias"), sd[base + ".3.bias"])
        bn_into((name, "bn2"), base + ".4")

    # ---- pixel transformer decoder ----
    td = "Transformer_Decoder.transformer_decoder.layers.0"
    dst = ("Transformer_Decoder", "layer0")
    setv(params, dst + ("norm1", "scale"), sd[td + ".0.fn.norm.weight"])
    setv(params, dst + ("norm1", "bias"), sd[td + ".0.fn.norm.bias"])
    for nm in ("q", "k", "v"):
        setv(params, dst + ("attn", f"to_{nm}", "kernel"),
             t2j_linear(sd[f"{td}.0.fn.fn.to_{nm}.weight"]))
    setv(params, dst + ("attn", "to_out", "kernel"), t2j_linear(sd[td + ".0.fn.fn.to_out.0.weight"]))
    setv(params, dst + ("attn", "to_out", "bias"), sd[td + ".0.fn.fn.to_out.0.bias"])
    setv(params, dst + ("norm2", "scale"), sd[td + ".1.fn.norm.weight"])
    setv(params, dst + ("norm2", "bias"), sd[td + ".1.fn.norm.bias"])
    setv(params, dst + ("ff", "fc1", "kernel"), t2j_linear(sd[td + ".1.fn.fn.net.0.weight"]))
    setv(params, dst + ("ff", "fc1", "bias"), sd[td + ".1.fn.fn.net.0.bias"])
    setv(params, dst + ("ff", "fc2", "kernel"), t2j_linear(sd[td + ".1.fn.fn.net.3.weight"]))
    setv(params, dst + ("ff", "fc2", "bias"), sd[td + ".1.fn.fn.net.3.bias"])

    # ---- classifier head ----
    setv(params, ("classifier_conv", "kernel"), t2j_conv(sd["decoder.conv1.weight"]))

    return {"params": params, "batch_stats": stats}


def load_smownet_lw_state_dict(sd: Dict[str, np.ndarray], variables):
    """Map a reference-trained SMOW_Net_LW state_dict onto SMOWNetLW
    variables (models/SMOW_Net_LW.py:9-98)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def setv(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        assert np.asarray(node[path[-1]]).shape == value.shape, \
            (path, value.shape, np.asarray(node[path[-1]]).shape)
        node[path[-1]] = value.astype(np.float32)

    def bn_into(dst_path, src):
        p, s = _bn(sd, src)
        setv(params, dst_path + ("scale",), p["scale"])
        setv(params, dst_path + ("bias",), p["bias"])
        setv(stats, dst_path + ("mean",), s["mean"])
        setv(stats, dst_path + ("var",), s["var"])

    # ---- backbone (prefix "backbone.") ----
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    bb_vars = load_mobilenet_v2(
        bb_sd, {"params": params["backbone"], "batch_stats": stats["backbone"]}
    )
    params["backbone"] = bb_vars["params"]
    stats["backbone"] = bb_vars["batch_stats"]

    # ---- OFW ----
    for i, idx in enumerate((0, 3, 6)):
        setv(params, ("OFW", f"down{i}_conv", "kernel"), t2j_conv(sd[f"OFW.down.{idx}.weight"]))
        setv(params, ("OFW", f"down{i}_conv", "bias"), sd[f"OFW.down.{idx}.bias"])
        bn_into(("OFW", f"down{i}_bn"), f"OFW.down.{idx + 1}")
    setv(params, ("OFW", "flow_make", "kernel"), t2j_conv(sd["OFW.flow_make.weight"]))

    # ---- token transformer encoder (in_chan=16) ----
    te = "Transformer_Encoder"
    setv(params, (te, "pos_embedding"), sd[te + ".pos_embedding"])
    setv(params, (te, "conv_a", "kernel"), t2j_conv(sd[te + ".conv_a.weight"]))
    setv(params, (te, "conv_a", "bias"), sd[te + ".conv_a.bias"])
    tl = te + ".transformer.layers.0"
    setv(params, (te, "transformer", "norm1", "scale"), sd[tl + ".0.norm.weight"])
    setv(params, (te, "transformer", "norm1", "bias"), sd[tl + ".0.norm.bias"])
    setv(params, (te, "transformer", "attn", "to_qkv", "kernel"),
         t2j_linear(sd[tl + ".0.fn.to_qkv.weight"]))
    setv(params, (te, "transformer", "attn", "to_out", "kernel"),
         t2j_linear(sd[tl + ".0.fn.to_out.0.weight"]))
    setv(params, (te, "transformer", "attn", "to_out", "bias"), sd[tl + ".0.fn.to_out.0.bias"])
    setv(params, (te, "transformer", "norm2", "scale"), sd[tl + ".1.norm.weight"])
    setv(params, (te, "transformer", "norm2", "bias"), sd[tl + ".1.norm.bias"])
    setv(params, (te, "transformer", "ff", "fc1", "kernel"), t2j_linear(sd[tl + ".1.fn.net.0.weight"]))
    setv(params, (te, "transformer", "ff", "fc1", "bias"), sd[tl + ".1.fn.net.0.bias"])
    setv(params, (te, "transformer", "ff", "fc2", "kernel"), t2j_linear(sd[tl + ".1.fn.net.3.weight"]))
    setv(params, (te, "transformer", "ff", "fc2", "bias"), sd[tl + ".1.fn.net.3.bias"])

    # ---- decoder 3D blocks ----
    for name in ("C3DT1", "C3DT2", "C3DT3", "C3DT4", "C3DT5"):
        setv(params, (name, "spatial", "kernel"),
             t2j_conv_transpose(sd[name + ".conv3d_spatial.weight"]))
        setv(params, (name, "spatial", "bias"), sd[name + ".conv3d_spatial.bias"])
        # temporal mixers are bias-free ConvTranspose3d (I,O,1,1,1) -> (C,C)
        w5 = sd[name + ".conv3d_time_5.weight"][:, :, 0, 0, 0]
        setv(params, (name, "tmix", "time_5_kernel"), w5[None, None, None])
        mix = np.stack([sd[f"{name}.conv3d_time_{i}.weight"][:, :, 0, 0, 0] for i in (1, 2, 3, 4)])
        setv(params, (name, "tmix", "time_mix_kernel"), mix)
        bn_into((name, "bn"), name + ".batch")

    for name in ("C3D1", "C3D2", "C3D3", "C3D4", "C3D5"):
        setv(params, (name, "spatial", "kernel"), t2j_conv(sd[name + ".conv3d_s.weight"]))
        setv(params, (name, "spatial", "bias"), sd[name + ".conv3d_s.bias"])
        # temporal mixers here are plain Conv3d (O,I,1,1,1): transpose to (I,O)
        w5 = sd[name + ".conv3d_t5.weight"][:, :, 0, 0, 0].T
        setv(params, (name, "tmix", "time_5_kernel"), w5[None, None, None])
        mix = np.stack([sd[f"{name}.conv3d_t{i}.weight"][:, :, 0, 0, 0].T for i in (1, 2, 3, 4)])
        setv(params, (name, "tmix", "time_mix_kernel"), mix)
        bn_into((name, "bn"), name + ".b")

    # ---- pixel transformer decoder (in_chan=64) ----
    td = "Transformer_Decoder.transformer_decoder.layers.0"
    dst = ("Transformer_Decoder", "layer0")
    setv(params, dst + ("norm1", "scale"), sd[td + ".0.fn.norm.weight"])
    setv(params, dst + ("norm1", "bias"), sd[td + ".0.fn.norm.bias"])
    for nm in ("q", "k", "v"):
        setv(params, dst + ("attn", f"to_{nm}", "kernel"),
             t2j_linear(sd[f"{td}.0.fn.fn.to_{nm}.weight"]))
    setv(params, dst + ("attn", "to_out", "kernel"), t2j_linear(sd[td + ".0.fn.fn.to_out.0.weight"]))
    setv(params, dst + ("attn", "to_out", "bias"), sd[td + ".0.fn.fn.to_out.0.bias"])
    setv(params, dst + ("norm2", "scale"), sd[td + ".1.fn.norm.weight"])
    setv(params, dst + ("norm2", "bias"), sd[td + ".1.fn.norm.bias"])
    setv(params, dst + ("ff", "fc1", "kernel"), t2j_linear(sd[td + ".1.fn.fn.net.0.weight"]))
    setv(params, dst + ("ff", "fc1", "bias"), sd[td + ".1.fn.fn.net.0.bias"])
    setv(params, dst + ("ff", "fc2", "kernel"), t2j_linear(sd[td + ".1.fn.fn.net.3.weight"]))
    setv(params, dst + ("ff", "fc2", "bias"), sd[td + ".1.fn.fn.net.3.bias"])

    setv(params, ("classifier_conv", "kernel"), t2j_conv(sd["decoder.conv1.weight"]))

    return {"params": params, "batch_stats": stats}
