"""Paired change-detection dataset + host data loader.

Directory layout (reference utils/dataset.py:13-36): `A/`, `B/`, `label/`
and `list/{train,val,test}.txt` with one file name per line. Images are read
with matplotlib's imread (PNG -> float32 [0,1], like the reference); masks
are binarized as `clip(m*255, 0, 1)` (utils/dataset.py:98-99).

TPU-first loader: thread-pool decode/augment (cv2/numpy release the GIL),
batches assembled as pinned numpy arrays and device_put sharded over the
mesh 'data' axis with double-buffered prefetch, so the host pipeline overlaps
TPU steps (the reference relies on torch DataLoader workers, train.py:76-81).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import Dict, Iterator, Optional

import numpy as np

from .transforms import apply_params, imagenet_normalize, sample_params

__all__ = ["CDDataset", "DataLoader", "prefetch_to_device", "generate_synthetic_dataset"]


def _imread(path: str) -> np.ndarray:
    from matplotlib.image import imread

    img = imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def _binarize(mask: np.ndarray) -> np.ndarray:
    if mask.ndim == 3:
        mask = mask[..., 0]
    return np.clip(mask * 255.0, 0.0, 1.0).astype(np.float32)


class CDDataset:
    """Index-addressable paired dataset with reference-matching augmentation."""

    def __init__(self, data_path: str, mode: str, seed: int = 2022, augment: Optional[bool] = None):
        self.mode = mode
        self._a = join(data_path, "A")
        self._b = join(data_path, "B")
        self._label = join(data_path, "label")
        with open(join(data_path, "list", mode + ".txt")) as f:
            self.names = [ln.strip() for ln in f if ln.strip()]
        self.augment = (mode == "train") if augment is None else augment
        self._seed = seed

    def __len__(self) -> int:
        return len(self.names)

    def get(self, idx: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        name = self.names[idx]
        a = _imread(join(self._a, name))[..., :3]
        b = _imread(join(self._b, name))[..., :3]
        m = _binarize(_imread(join(self._label, name)))
        if not self.augment:
            return {"A": imagenet_normalize(a), "B": imagenet_normalize(b),
                    "mask": m.astype(np.float32)}
        rng = np.random.default_rng((self._seed, epoch, idx))
        p = sample_params(rng)
        from ..runtime import native

        if native.available():
            a = np.ascontiguousarray(a, np.float32)
            b = np.ascontiguousarray(b, np.float32)
            m = np.ascontiguousarray(m, np.float32)
            native.augment_sample(
                a, b, m, p["flip_d"], p["angle"],
                p["a"]["cb"], p["a"]["alpha"], p["a"]["beta"], p["a"]["blur"],
                p["b"]["cb"], p["b"]["alpha"], p["b"]["beta"], p["b"]["blur"],
                normalize=True,
            )
            return {"A": a, "B": b, "mask": m}
        a, b, m = apply_params(p, a, b, m)
        return {"A": imagenet_normalize(a), "B": imagenet_normalize(b),
                "mask": m.astype(np.float32)}


class DataLoader:
    """Shuffling, batching, threaded decode. Yields numpy dict batches with a
    'valid' (B,) mask; the final short batch is zero-padded to full size so
    jit sees one shape (metrics weight by 'valid')."""

    def __init__(self, dataset: CDDataset, batch_size: int, shuffle: bool, seed: int = 2022,
                 num_workers: int = 8, drop_last: bool = False, pad_last: bool = True,
                 num_shards: int = 1, shard_id: int = 0):
        """num_shards/shard_id: multi-host partitioning — each process reads
        a disjoint strided slice of the (identically seeded) shuffled order,
        truncated to equal length so all hosts run the same number of steps.
        batch_size is the PER-PROCESS batch size."""
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self.epoch = 0

    def _shard_len(self) -> int:
        n = len(self.ds)
        return n // self.num_shards if self.num_shards > 1 else n

    def __len__(self) -> int:
        n = self._shard_len()
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id :: self.num_shards][: self._shard_len()]
        n = len(order)
        epoch = self.epoch
        self.epoch += 1
        for start in range(0, n, self.bs):
            idxs = order[start : start + self.bs]
            if len(idxs) < self.bs and self.drop_last:
                break
            items = list(self.pool.map(lambda i: self.ds.get(int(i), epoch), idxs))
            valid = np.zeros((self.bs,), np.float32)
            valid[: len(items)] = 1.0
            while self.pad_last and len(items) < self.bs:
                items.append({k: np.zeros_like(v) for k, v in items[0].items()})
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
            batch["valid"] = valid[: len(items)] if not self.pad_last else valid
            yield batch


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Double-buffered host->HBM prefetch; batches sharded over the mesh."""
    import collections

    import jax

    from ..parallel.mesh import shard_batch

    def put(batch):
        if mesh is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        # shard_batch routes through make_array_from_process_local_data on
        # a multi-process runtime (pod slice), plain device_put otherwise
        return shard_batch(batch, mesh)

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def generate_synthetic_dataset(root: str, n_train: int = 8, n_val: int = 4, size: int = 64,
                               seed: int = 0) -> str:
    """Tiny synthetic LEVIR-like dataset (PNG pairs + binary masks) for smoke
    tests and benchmarks."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for sub in ("A", "B", "label", "list"):
        os.makedirs(join(root, sub), exist_ok=True)
    splits = {"train": n_train, "val": n_val, "test": n_val}
    counter = 0
    for split, count in splits.items():
        names = []
        for _ in range(count):
            name = f"img_{counter:04d}.png"
            counter += 1
            base = rng.uniform(0.2, 0.8, size=(size, size, 3)).astype(np.float32)
            a = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1)
            b = a.copy()
            mask = np.zeros((size, size), np.float32)
            # paint a random "changed" rectangle into B
            x0, y0 = rng.integers(0, size // 2, 2)
            w, h = rng.integers(size // 8, size // 2, 2)
            b[y0 : y0 + h, x0 : x0 + w] = rng.uniform(0, 1, 3)
            mask[y0 : y0 + h, x0 : x0 + w] = 1.0
            Image.fromarray((a * 255).astype(np.uint8)).save(join(root, "A", name))
            Image.fromarray((np.clip(b, 0, 1) * 255).astype(np.uint8)).save(join(root, "B", name))
            Image.fromarray((mask * 255).astype(np.uint8)).save(join(root, "label", name))
            names.append(name)
        with open(join(root, "list", split + ".txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root
