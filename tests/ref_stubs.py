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
