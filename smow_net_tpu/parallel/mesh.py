"""Device mesh + sharding helpers.

The reference is single-GPU (train.py:2 pins CUDA_VISIBLE_DEVICES="0"); the
TPU-native framework treats data parallelism over ICI as first-class: a 1-D
`Mesh` over all local devices, batch arrays sharded on the 'data' axis,
parameters replicated. XLA inserts the gradient all-reduces. The same code
path runs on 1 chip (trivial mesh) and on a pod slice.

Extra mesh axes ('model' for TP, future 'pipe'/'seq') are accepted by
`make_mesh` so models can annotate weight shardings without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "global_shard_batch", "fsdp_sharding"]


def make_mesh(devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Multi-host batch assembly (SURVEY §2.5): each process holds only its
    local slice of the global batch; `jax.make_array_from_process_local_data`
    stitches the per-process host arrays into one global jax.Array sharded
    over the mesh's data axis, without any cross-host data movement. Also
    valid single-process (local data == global data), which is how the unit
    tests pin the API path."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch (pytree of arrays, leading batch dim) sharded
    across the mesh's data axis. On a multi-process runtime (pod slice) the
    batch is treated as this process's local slice and routed through
    `global_shard_batch`."""
    if jax.process_count() > 1:
        return global_shard_batch(batch, mesh, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def fsdp_sharding(mesh: Mesh, tree, axis: str = "data", min_elems: int = 2 ** 14):
    """FSDP/ZeRO-style sharding tree: each large leaf is sharded along its
    largest divisible dimension over `axis`; small leaves (BN stats, biases,
    scalars) stay replicated. Under jit, XLA inserts the per-layer
    all-gathers in forward/backward and keeps grads + optimizer state
    sharded (reduce-scatter) — the standard GSPMD weight-sharding recipe.

    Use axis="data" on a 1-D mesh for ZeRO over the batch axis, or a
    dedicated "model" axis of a 2-D mesh for FSDP orthogonal to DP."""
    n = mesh.shape[axis]

    def rule(x):
        shape = getattr(x, "shape", ())
        size = 1
        for s in shape:
            size *= s
        if n == 1 or not shape or size < min_elems:
            return NamedSharding(mesh, P())
        for d in sorted(range(len(shape)), key=lambda d: shape[d], reverse=True):
            if shape[d] % n == 0:
                spec = [None] * len(shape)
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)
