"""Orbax checkpointing: resumable training (params + opt state + step + PRNG
+ best metric), unlike the reference's best-only `state_dict` overwrite
(train.py:150-154). Also restores plain best-params checkpoints for eval.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "save_best_params", "restore_best_params"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_host(payload), force=True)


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=_to_host(template))
    return ckptr.restore(path)


def save_best_params(path: str, params, batch_stats):
    save_checkpoint(path, {"params": params, "batch_stats": batch_stats})


def restore_best_params(path: str):
    out = restore_checkpoint(path)
    return out["params"], out["batch_stats"]
