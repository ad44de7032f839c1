"""Reference (PyTorch) checkpoint ingestion for eval and warm-start.

Mirrors the reference's checkpoint-loading path (/root/reference/test.py:97-102:
``torch.load(best.pth)`` with an optional DataParallel ``module.`` strip) and
routes the state_dict through the model-appropriate converter:

  * smow_net / smow_net_lw -> the dedicated full-model loaders in
    train/convert.py (layout rules documented there)
  * every zoo model        -> convert_generic + the spec tables in
    train/zoo_specs.py (the same specs the golden-parity tests pin)

Exposed to users as ``test.py --torch_ckpt best.pth`` (evaluate a
reference-trained model on TPU) and ``train.py --torch_ckpt`` (warm-start).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["load_torch_state_dict", "strip_module_prefix", "ingest_torch_checkpoint",
           "supported_models"]


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop a DataParallel 'module.' prefix when every key carries it
    (reference test.py: ``{k[7:]: v for k, v in state_dict_multi.items()}``)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pth on CPU -> plain name->numpy dict (module. stripped).
    Accepts a raw state_dict, a {'state_dict': ...} wrapper, or a pickled
    nn.Module."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and all(
            not hasattr(v, "numpy") for k, v in obj.items() if k != "state_dict"):
        obj = obj["state_dict"]
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in obj.items()}
    return strip_module_prefix(sd)


def supported_models():
    from .zoo_specs import ZOO_CONVERT_SPECS

    return ("smow_net", "smow_net_lw") + tuple(sorted(ZOO_CONVERT_SPECS))


def ingest_torch_checkpoint(model_name: str, path_or_sd, variables,
                            strict: bool = True):
    """Convert a reference-trained torch checkpoint onto our flax variables.

    variables: the model's freshly-initialised {'params', 'batch_stats'} tree
    (shapes drive layout disambiguation). Returns the new variables tree.
    With strict=True the zoo route asserts full bidirectional coverage
    (every flax leaf written, every torch key consumed or allow-listed).
    """
    if isinstance(path_or_sd, str):
        sd = load_torch_state_dict(path_or_sd)
    else:
        sd = strip_module_prefix({k: np.asarray(v) for k, v in path_or_sd.items()})

    if model_name == "smow_net":
        from .convert import load_smownet_state_dict

        return load_smownet_state_dict(sd, variables)
    if model_name == "smow_net_lw":
        from .convert import load_smownet_lw_state_dict

        return load_smownet_lw_state_dict(sd, variables)

    from .convert_zoo import convert_generic
    from .zoo_specs import ZOO_CONVERT_SPECS

    spec = ZOO_CONVERT_SPECS.get(model_name)
    if spec is None:
        raise ValueError(
            f"no torch-checkpoint converter for model '{model_name}'; "
            f"supported: {', '.join(supported_models())}")
    if callable(spec):
        return spec(sd, variables)
    kwargs = dict(spec)
    allow = kwargs.pop("allow_unconsumed", ())
    new_vars, report = convert_generic(sd, variables, **kwargs)
    if strict:
        report.check(allow)
    return new_vars
