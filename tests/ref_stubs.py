"""Minimal stand-ins for libraries the reference imports but this image
lacks (timm), letting reference model files load as black-box parity oracles.
Installed into sys.modules before importing a reference file."""

import sys
import types

import torch
import torch.nn as nn


def install_timm_stub():
    if "timm" in sys.modules:
        return

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_reference_module(path, name):
    import importlib.util

    install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # neutralise pretrained-weight downloads (zero-egress env); random
    # weights are fine for structural/param-count parity
    fake_fetch = lambda *a, **k: {}
    for attr in ("load_state_dict_from_url", "load_url"):
        if hasattr(mod, attr):
            setattr(mod, attr, fake_fetch)
    if hasattr(mod, "model_zoo"):
        mod.model_zoo.load_url = fake_fetch
    return mod


class construct_quiet:
    """Context manager: no-op torch load_state_dict so reference models
    constructed with pretrained=True don't fail on the empty fake fetch."""

    def __enter__(self):
        self._orig = nn.Module.load_state_dict
        nn.Module.load_state_dict = lambda self, sd, strict=True, **k: None
        return self

    def __exit__(self, *exc):
        nn.Module.load_state_dict = self._orig
        return False


def install_fvcore_stub():
    if "fvcore" in sys.modules:
        return
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    for name in ("FlopCountAnalysis", "flop_count_str", "flop_count", "parameter_count"):
        setattr(fvnn, name, lambda *a, **k: None)
    fv.nn = fvnn
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fvnn


def install_csm_triton_stub():
    """The reference's Triton cross-scan module (imports triton, absent)."""
    if "csm_triton" in sys.modules:
        return
    m = types.ModuleType("csm_triton")

    class _Never(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *a):
            raise RuntimeError("triton stub")

    m.CrossScanTriton = _Never
    m.CrossMergeTriton = _Never
    m.CrossScanTriton1b1 = _Never
    sys.modules["csm_triton"] = m


def install_monai_stub():
    if "monai" in sys.modules:
        return

    def _pair_pad(k):
        return k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)

    def get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size=3,
                       stride=1, bias=False):
        assert spatial_dims == 2
        return nn.Conv2d(in_channels, out_channels, kernel_size, stride,
                         _pair_pad(kernel_size), bias=bias)

    def get_upsample_layer(spatial_dims, channels, upsample_mode=None, scale_factor=2):
        return nn.Upsample(scale_factor=scale_factor, mode="nearest")

    def get_norm_layer(name, spatial_dims=2, channels=1):
        kind, kwargs = (name if isinstance(name, (tuple, list)) else (name, {}))
        assert str(kind).lower() == "group"
        return nn.GroupNorm(kwargs.get("num_groups", 8), channels)

    def get_act_layer(act):
        kind = act[0] if isinstance(act, (tuple, list)) else act
        return {"relu": nn.ReLU(), "silu": nn.SiLU()}[str(kind).lower()]

    class UpsampleMode(str):
        NONTRAINABLE = "nontrainable"

        def __new__(cls, v="nontrainable"):
            return str.__new__(cls, v)

    class _DropoutFactory:
        DROPOUT = "dropout"

        def __getitem__(self, key):
            return nn.Dropout2d

    modules = {
        "monai": types.ModuleType("monai"),
        "monai.networks": types.ModuleType("monai.networks"),
        "monai.networks.blocks": types.ModuleType("monai.networks.blocks"),
        "monai.networks.blocks.convolutions": types.ModuleType("monai.networks.blocks.convolutions"),
        "monai.networks.blocks.segresnet_block": types.ModuleType("monai.networks.blocks.segresnet_block"),
        "monai.networks.layers": types.ModuleType("monai.networks.layers"),
        "monai.networks.layers.factories": types.ModuleType("monai.networks.layers.factories"),
        "monai.networks.layers.utils": types.ModuleType("monai.networks.layers.utils"),
        "monai.utils": types.ModuleType("monai.utils"),
    }
    modules["monai.networks.blocks.convolutions"].Convolution = nn.Conv2d
    sb = modules["monai.networks.blocks.segresnet_block"]
    sb.ResBlock = nn.Identity
    sb.get_conv_layer = get_conv_layer
    sb.get_upsample_layer = get_upsample_layer
    modules["monai.networks.layers.factories"].Dropout = _DropoutFactory()
    lu = modules["monai.networks.layers.utils"]
    lu.get_act_layer = get_act_layer
    lu.get_norm_layer = get_norm_layer
    modules["monai.utils"].UpsampleMode = UpsampleMode
    sys.modules.update(modules)


def install_causal_conv1d_stub():
    """cd_mamba.py:378-381's ImportError fallback is itself buggy
    (`a, b = None` unpack) — provide the module so the try-branch wins."""
    if "causal_conv1d" in sys.modules:
        return
    m = types.ModuleType("causal_conv1d")
    m.causal_conv1d_fn = lambda *a, **k: None
    m.causal_conv1d_update = lambda *a, **k: None
    sys.modules["causal_conv1d"] = m


def install_torchvision_stub():
    """Provide torchvision.models.vgg16 (features only) for IFN."""
    if "torchvision" in sys.modules:
        return

    def vgg16(pretrained=False, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_c = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_c = v

        class VGG(nn.Module):
            def __init__(self):
                super().__init__()
                self.features = nn.Sequential(*layers)

        return VGG()

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.vgg16 = vgg16
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
