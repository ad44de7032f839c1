"""Generic PyTorch state_dict -> flax variables converter for the zoo.

The zoo's flax modules intentionally mirror the reference's torch attribute
names (e.g. ``conv0_0/conv1`` vs torch ``conv0_0.conv1``), so conversion is
driven structurally: walk the flax param tree, derive the torch key for each
module via dotted-path join plus per-model regex renames, and apply the
layout transforms from train/convert.py (conv OIHW->HWIO, convT flip+regroup,
linear transpose, BN weight/bias/running stats).

Used by tests/test_zoo_output_parity.py to pin every zoo model's *outputs*
(not just param counts) to the reference modules under /root/reference/compare.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from .convert import t2j_conv, t2j_conv_transpose, t2j_linear

__all__ = ["convert_generic", "ConversionReport"]


class ConversionReport:
    def __init__(self):
        self.assigned: Dict[str, str] = {}   # flax dotted path -> torch prefix
        self.unconsumed: set = set()         # torch keys never read
        self.unassigned: list = []           # flax leaves never written

    def check(self, allow_unconsumed: Sequence[str] = ()):
        """Assert full bidirectional coverage; `allow_unconsumed` is a list of
        regexes for torch keys that are legitimately dead in the reference."""
        assert not self.unassigned, f"unassigned flax leaves: {self.unassigned[:10]}"
        leftover = [k for k in sorted(self.unconsumed)
                    if not any(re.match(p, k) for p in allow_unconsumed)]
        assert not leftover, f"unconsumed torch keys: {leftover[:10]}"


def _apply_renames(dotted: str, renames: Sequence[Tuple[str, str]]) -> str:
    for pat, rep in renames:
        dotted = re.sub(pat, rep, dotted)
    return dotted


def convert_generic(
    sd: Dict[str, np.ndarray],
    variables,
    renames: Sequence[Tuple[str, str]] = (),
    transpose_conv: Sequence[str] = (),
    hook: Optional[Callable] = None,
) -> Tuple[dict, ConversionReport]:
    """Build new variables from a torch state_dict.

    renames: (regex, replacement) rewrites applied to the flax dotted path
        (module path, '.'-joined, without the leaf name) to get the torch
        module prefix.
    transpose_conv: regexes over the *flax* dotted module path marking
        ConvTranspose modules whose square in==out kernels can't be
        auto-disambiguated by shape.
    hook: optional callable (flax_dotted_path, leaf_name, expected_shape, sd)
        -> np.ndarray or None, consulted first for non-standard leaves.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = (jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
             if "batch_stats" in variables else {})
    report = ConversionReport()
    consumed: set = set()

    def take(key: str) -> np.ndarray:
        consumed.add(key)
        return sd[key]

    def is_transpose(dotted: str) -> bool:
        return any(re.search(p, dotted) for p in transpose_conv)

    def stats_node(path):
        node = stats
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node if isinstance(node, dict) else None

    def assign_kernel(node, dotted: str, prefix: str):
        kshape = np.asarray(node["kernel"]).shape
        w = take(prefix + ".weight")
        if w.ndim == 2:
            v = t2j_linear(w)
        else:
            forced_t = is_transpose(dotted)
            v = None
            if not forced_t:
                cand = t2j_conv(w)
                if cand.shape == kshape:
                    v = cand
            if v is None:
                g = w.shape[0] // kshape[-2]
                cand = t2j_conv_transpose(w, groups=g)
                if cand.shape == kshape:
                    v = cand
            if v is None:
                raise AssertionError(
                    f"{dotted}: no conv layout matches torch {w.shape} -> flax {kshape}")
        assert v.shape == kshape, (dotted, v.shape, kshape)
        node["kernel"] = v.astype(np.float32)
        if "bias" in node and not isinstance(node["bias"], dict):
            b = take(prefix + ".bias")
            assert b.shape == np.asarray(node["bias"]).shape, (dotted, "bias")
            node["bias"] = b.astype(np.float32)
        report.assigned[dotted] = prefix

    def assign_norm(node, snode, dotted: str, prefix: str):
        node["scale"] = take(prefix + ".weight").astype(np.float32)
        node["bias"] = take(prefix + ".bias").astype(np.float32)
        if snode is not None and "mean" in snode:
            snode["mean"] = take(prefix + ".running_mean").astype(np.float32)
            snode["var"] = take(prefix + ".running_var").astype(np.float32)
        report.assigned[dotted] = prefix

    def assign_other(node, key: str, dotted: str, leaf: str):
        shape = np.asarray(node[key]).shape
        full = f"{dotted}.{leaf}" if dotted else leaf
        if hook is not None:
            v = hook(dotted, leaf, shape, sd)
            if v is not None:
                if isinstance(v, tuple):
                    v, src = v
                    consumed.add(src)
                assert np.asarray(v).shape == shape, (full, np.asarray(v).shape, shape)
                node[key] = np.asarray(v, dtype=np.float32)
                report.assigned[full] = "<hook>"
                return
        cand = _apply_renames(full, renames)
        if cand in sd and sd[cand].shape == shape:
            node[key] = take(cand).astype(np.float32)
            report.assigned[full] = cand
        else:
            report.unassigned.append(full)

    def walk(node, path):
        dotted = ".".join(path)
        prefix = _apply_renames(dotted, renames)
        keys = set(k for k in node if not isinstance(node[k], dict))
        if "kernel" in keys:
            assign_kernel(node, dotted, prefix)
            keys -= {"kernel", "bias"}
        if "scale" in keys and "bias" in keys:
            assign_norm(node, stats_node(path), dotted, prefix)
            keys -= {"scale", "bias"}
        for k in sorted(keys):
            assign_other(node, k, dotted, k)
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))

    walk(params, ())
    report.unconsumed = {k for k in sd
                         if k not in consumed and "num_batches_tracked" not in k}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, report
