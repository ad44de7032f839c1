"""Multi-host input path (SURVEY §2.5, VERDICT r2 missing #3): the
per-process DataLoader sharding and the
``jax.make_array_from_process_local_data`` batch-assembly route, pinned
single-process (where local == global) on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from smow_net_tpu.data.dataset import CDDataset, DataLoader, generate_synthetic_dataset
from smow_net_tpu.parallel.mesh import (batch_sharding, global_shard_batch,
                                        make_mesh, shard_batch)


def test_global_shard_batch_matches_device_put():
    mesh = make_mesh()
    batch = {"A": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
             "valid": np.ones((8,), np.float32)}
    g = global_shard_batch(batch, mesh)
    d = shard_batch(batch, mesh)
    for k in batch:
        assert g[k].sharding.is_equivalent_to(batch_sharding(mesh), g[k].ndim)
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(d[k]))

    # and the global array is directly consumable by a sharded jit program
    @jax.jit
    def s(b):
        return jnp.sum(b["A"]) + jnp.sum(b["valid"])

    np.testing.assert_allclose(float(s(g)), float(np.sum(batch["A"]) + 8.0))


def test_dataloader_host_shards_are_disjoint_and_equal(tmp_path):
    root = str(tmp_path / "d")
    generate_synthetic_dataset(root, n_train=10, n_val=2, size=32)
    ds = CDDataset(root, "train")

    def names_seen(shard_id, num_shards):
        loader = DataLoader(ds, 2, shuffle=True, seed=7, num_workers=1,
                            num_shards=num_shards, shard_id=shard_id)
        seen = []
        for batch in loader:
            # identify items by content hash of the mask
            for b in range(batch["mask"].shape[0]):
                if batch["valid"][b] > 0.5:
                    seen.append(batch["mask"][b].tobytes())
        return seen

    s0 = names_seen(0, 2)
    s1 = names_seen(1, 2)
    assert len(s0) == len(s1) == 5  # 10 items, equal truncated shards
    assert not (set(s0) & set(s1))  # disjoint

    # same number of steps on every host (lockstep collectives)
    l0 = DataLoader(ds, 2, shuffle=True, seed=7, num_shards=2, shard_id=0)
    l1 = DataLoader(ds, 2, shuffle=True, seed=7, num_shards=2, shard_id=1)
    assert len(l0) == len(l1)
