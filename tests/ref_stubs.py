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
    """The reference's Triton cross-scan module (imports triton, absent).

    Functional pure-torch equivalents of the three Triton autograd wrappers
    (compare/csm_triton.py:183-257): the kernels write four traversals —
    identity, transpose, reverse, reverse-transpose (p_y1..p_y4 index math,
    csm_triton.py:29-40) — matching the torch CrossScan/CrossMerge
    (compare/vmamba.py:27-69). Differentiable via plain autograd, so the
    reference's forwardxv path runs on CPU as a parity oracle."""
    if "csm_triton" in sys.modules:
        return
    m = types.ModuleType("csm_triton")

    def _scan4(x):  # (B, C, H, W) -> (B, 4, C, L)
        xf = x.flatten(2)
        xt = x.transpose(2, 3).flatten(2)
        return torch.stack(
            [xf, xt, torch.flip(xf, dims=[-1]), torch.flip(xt, dims=[-1])],
            dim=1)

    def _merge4(y, H, W):  # (B, 4, C, H*W) traversal-layout slabs -> (B, C, L)
        B, K, C, L = y.shape
        r0 = y[:, 0]
        r1 = y[:, 1].view(B, C, W, H).transpose(2, 3).reshape(B, C, L)
        r2 = torch.flip(y[:, 2], dims=[-1])
        r3 = torch.flip(y[:, 3], dims=[-1]).view(B, C, W, H).transpose(2, 3).reshape(B, C, L)
        return r0 + r1 + r2 + r3

    class _CrossScanTriton:
        @staticmethod
        def apply(x):  # (B, C, H, W) -> (B, 4, C, L)
            return _scan4(x)

    class _CrossMergeTriton:
        @staticmethod
        def apply(y):  # (B, K, C, H, W) -> (B, C, L)
            B, K, C, H, W = y.shape
            return _merge4(y.reshape(B, K, C, H * W), H, W)

    class _CrossScanTriton1b1:
        @staticmethod
        def apply(x):  # (B, 4, C, H, W) -> (B, 4, C, L): slab k, traversal k
            B, K, C, H, W = x.shape
            xf = x.flatten(3)
            return torch.stack(
                [xf[:, 0],
                 x[:, 1].transpose(2, 3).flatten(2),
                 torch.flip(xf[:, 2], dims=[-1]),
                 torch.flip(x[:, 3].transpose(2, 3).flatten(2), dims=[-1])],
                dim=1)

    m.CrossScanTriton = _CrossScanTriton
    m.CrossMergeTriton = _CrossMergeTriton
    m.CrossScanTriton1b1 = _CrossScanTriton1b1
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


def make_naive_selective_scan():
    """A pure-torch autograd.Function with the CUDA selective_scan interface
    (compare/vmamba.py:253-321): inject as SelectiveScanMamba/Core/Oflex so
    the reference SS2D stack runs on CPU as a parity oracle."""

    class NaiveSelectiveScan(torch.autograd.Function):
        @staticmethod
        def forward(ctx, u, delta, A, B, C, D=None, delta_bias=None,
                    delta_softplus=False, *args):
            # u, delta: (b, KD, L); A: (KD, N); B, C: (b, K, N, L); D: (KD,)
            u = u.float()
            delta = delta.float()
            b, kd, L = u.shape
            _, K, N, _ = B.shape
            rep = kd // K
            if delta_bias is not None:
                delta = delta + delta_bias.float().view(1, -1, 1)
            if delta_softplus:
                delta = torch.nn.functional.softplus(delta)
            Bp = B.float().repeat_interleave(rep, dim=1)  # (b, KD, N, L)
            Cp = C.float().repeat_interleave(rep, dim=1)
            dA = torch.exp(delta.unsqueeze(2) * A.float().view(1, kd, N, 1))
            dBu = delta.unsqueeze(2) * Bp * u.unsqueeze(2)
            h = u.new_zeros(b, kd, N)
            ys = []
            for t in range(L):
                h = h * dA[..., t] + dBu[..., t]
                ys.append((h * Cp[..., t]).sum(-1))
            y = torch.stack(ys, dim=-1)  # (b, KD, L)
            if D is not None:
                y = y + D.float().view(1, -1, 1) * u
            return y

    return NaiveSelectiveScan


def disable_cuda_calls():
    """Neutralise hard-coded .cuda() calls (e.g. ChangeDecoder.py:204,211)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def make_naive_mamba_inner_fn_no_out_proj():
    """Pure-torch stand-in for mamba_ssm's fused mamba_inner_fn_no_out_proj
    (used by cd_mamba.py:600-640): causal dwconv + silu, x_proj split,
    low-rank dt, selective scan with z-gating; returns (b, d, l)."""
    import torch.nn.functional as F

    def fn(xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
           A, B=None, C=None, D=None, delta_bias=None, B_proj_bias=None,
           C_proj_bias=None, delta_softplus=True):
        bsz, _, L = xz.shape
        d = xz.shape[1] // 2
        x, z = xz.chunk(2, dim=1)
        x = F.conv1d(x, conv1d_weight, conv1d_bias,
                     padding=conv1d_weight.shape[-1] - 1, groups=d)[..., :L]
        x = F.silu(x)
        x_dbl = F.linear(x.transpose(1, 2).reshape(bsz * L, d), x_proj_weight)
        R = delta_proj_weight.shape[1]
        n = A.shape[-1]
        delta = (delta_proj_weight @ x_dbl[:, :R].t()).reshape(d, bsz, L).permute(1, 0, 2)
        Bv = x_dbl[:, R:R + n].reshape(bsz, L, n).permute(0, 2, 1)
        Cv = x_dbl[:, R + n:].reshape(bsz, L, n).permute(0, 2, 1)
        if delta_bias is not None:
            delta = delta + delta_bias.view(1, -1, 1)
        if delta_softplus:
            delta = F.softplus(delta)
        delta = delta.float()
        dA = torch.exp(delta.unsqueeze(2) * A.view(1, d, n, 1))
        dBu = delta.unsqueeze(2) * Bv.float().unsqueeze(1) * x.float().unsqueeze(2)
        h = x.new_zeros(bsz, d, n, dtype=torch.float32)
        ys = []
        for t in range(L):
            h = h * dA[..., t] + dBu[..., t]
            ys.append((h * Cv[..., t].float().unsqueeze(1)).sum(-1))
        y = torch.stack(ys, dim=-1)
        if D is not None:
            y = y + D.view(1, -1, 1) * x.float()
        return y * F.silu(z.float())

    return fn
