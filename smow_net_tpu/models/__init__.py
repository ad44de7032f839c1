"""Model registry.

The reference selects models by comment-toggling in `build_model`
(train.py:83-123); here every architecture registers under a name with its
reference construction recipe as default kwargs, selected via `--model`.
Imports are lazy so optional heavy families (mamba) don't tax start-up.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Tuple

# name -> (module, class, default kwargs from the reference recipes train.py:86-121)
_REGISTRY: Dict[str, Tuple[str, str, Dict[str, Any]]] = {
    "smow_net": ("smow_net_tpu.models.smow_net", "SMOWNet", {}),
    "smow_net_lw": ("smow_net_tpu.models.smow_net_lw", "SMOWNetLW", {}),
    "fc_ef": ("smow_net_tpu.models.zoo.fc_ef", "FCEF", {"label_nbr": 2}),
    "snunet": ("smow_net_tpu.models.zoo.snunet", "SNUNet", {"out_ch": 2}),
    "dtcdscn": ("smow_net_tpu.models.zoo.dtcdscn", "DTCDSCN", {}),
    "ifn": ("smow_net_tpu.models.zoo.ifn", "DSIFN", {}),
    "bit": (
        "smow_net_tpu.models.zoo.bit",
        "BIT",
        {"output_nc": 2, "token_len": 4, "resnet_stages_num": 4, "with_pos": "learned",
         "enc_depth": 1, "dec_depth": 8, "decoder_dim_head": 8},
    ),
    "pa_former": ("smow_net_tpu.models.zoo.pa_former", "PAFormer", {"n_class": 2}),
    "afcf3d": ("smow_net_tpu.models.zoo.afcf3d", "AFCF3D", {"features": 32}),
    "seifnet": ("smow_net_tpu.models.zoo.seifnet", "SEIFNet", {"output_nc": 2}),
    "tfi_gr": ("smow_net_tpu.models.zoo.tfi_gr", "TFIGR", {"num_classes": 1}),
    "a2net": ("smow_net_tpu.models.zoo.a2net", "A2Net", {"out_c": 1}),
    "elgcnet": ("smow_net_tpu.models.zoo.elgcnet", "ELGCNet", {"dec_embed_dim": 256}),
    "changeformer": ("smow_net_tpu.models.zoo.changeformer", "ChangeFormerV6", {"embed_dim": 256}),
    "scratchformer": ("smow_net_tpu.models.zoo.scratchformer", "ScratchFormer",
                      {"embed_dim": 256}),
    "rs_mamba": ("smow_net_tpu.models.zoo.rs_mamba", "RSMCD", {}),
    "change_mamba": ("smow_net_tpu.models.zoo.change_mamba", "ChangeMamba", {}),
    "cd_mamba": ("smow_net_tpu.models.zoo.cd_mamba", "CDMamba", {}),
}


def list_models():
    return sorted(_REGISTRY)


def get_model(name: str, **overrides):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    module, cls, defaults = _REGISTRY[name]
    kwargs = dict(defaults)
    kwargs.update(overrides)
    mod = importlib.import_module(module)
    return getattr(mod, cls)(**kwargs)
