"""Host-side paired augmentations (numpy/cv2), matching the reference's
albumentations pipeline (utils/dataset.py:86-95) semantically:

  shared (same params for A, B, mask):  Flip(p=.5, d in {-1,0,1}),
                                        Rotate(limit=5, p=.5, reflect-101,
                                        bilinear for images / nearest for mask)
  per-image "aberration":               RandomBrightnessContrast(±0.2, p=.5,
                                        brightness_by_max), GaussianBlur(k in
                                        {3,5}, p=.5)

albumentations is not vendored; these are independent implementations of the
documented transform math on float32 [0,1] HWC arrays.
"""

from __future__ import annotations

import cv2
import numpy as np

__all__ = ["shared_geometric", "aberration", "imagenet_normalize", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _flip(img: np.ndarray, d: int) -> np.ndarray:
    # cv2 flip codes: 0 vertical, 1 horizontal, -1 both
    if d == 0:
        return img[::-1]
    if d == 1:
        return img[:, ::-1]
    return img[::-1, ::-1]


def _rotate(img: np.ndarray, angle: float, nearest: bool) -> np.ndarray:
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    flags = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    out = cv2.warpAffine(img.astype(np.float32), m, (w, h), flags=flags,
                         borderMode=cv2.BORDER_REFLECT_101)
    return out


def shared_geometric(rng: np.random.Generator, a: np.ndarray, b: np.ndarray, mask: np.ndarray):
    """Identical flip/rotate applied to both images and the mask."""
    if rng.random() < 0.5:
        d = int(rng.integers(-1, 2))
        a, b, mask = _flip(a, d), _flip(b, d), _flip(mask, d)
    if rng.random() < 0.5:
        angle = float(rng.uniform(-5.0, 5.0))
        a = _rotate(a, angle, nearest=False)
        b = _rotate(b, angle, nearest=False)
        mask = _rotate(mask.astype(np.float32), angle, nearest=True)
    return np.ascontiguousarray(a), np.ascontiguousarray(b), np.ascontiguousarray(mask)


def aberration(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Per-image photometric jitter on float [0,1]."""
    if rng.random() < 0.5:
        alpha = 1.0 + float(rng.uniform(-0.2, 0.2))  # contrast
        beta = float(rng.uniform(-0.2, 0.2))         # brightness (by max=1.0)
        img = img * alpha + beta
    if rng.random() < 0.5:
        k = int(rng.choice([3, 5]))
        img = cv2.GaussianBlur(img.astype(np.float32), (k, k), 0)
    return np.ascontiguousarray(img)


def imagenet_normalize(img: np.ndarray) -> np.ndarray:
    return ((img.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def sample_params(rng: np.random.Generator) -> dict:
    """Draw all augmentation randomness up front (identical draw order to
    the sequential path, so native and numpy pipelines produce the same
    datasets for the same seeds)."""
    p = {"flip_d": -2, "angle": 0.0}
    if rng.random() < 0.5:
        p["flip_d"] = int(rng.integers(-1, 2))
    if rng.random() < 0.5:
        p["angle"] = float(rng.uniform(-5.0, 5.0))
    for img in ("a", "b"):
        cb = rng.random() < 0.5
        alpha = 1.0 + float(rng.uniform(-0.2, 0.2)) if cb else 1.0
        beta = float(rng.uniform(-0.2, 0.2)) if cb else 0.0
        blur = int(rng.choice([3, 5])) if rng.random() < 0.5 else 0
        p[img] = {"cb": cb, "alpha": alpha, "beta": beta, "blur": blur}
    return p


def apply_params(p: dict, a: np.ndarray, b: np.ndarray, mask: np.ndarray):
    """Numpy/cv2 application of pre-sampled params (reference semantics)."""
    if p["flip_d"] != -2:
        a, b, mask = _flip(a, p["flip_d"]), _flip(b, p["flip_d"]), _flip(mask, p["flip_d"])
    if p["angle"] != 0.0:
        a = _rotate(a, p["angle"], nearest=False)
        b = _rotate(b, p["angle"], nearest=False)
        mask = _rotate(mask.astype(np.float32), p["angle"], nearest=True)
    outs = []
    for img, key in ((a, "a"), (b, "b")):
        q = p[key]
        if q["cb"]:
            img = img * q["alpha"] + q["beta"]
        if q["blur"]:
            img = cv2.GaussianBlur(np.ascontiguousarray(img, np.float32),
                                   (q["blur"], q["blur"]), 0)
        outs.append(np.ascontiguousarray(img))
    return outs[0], outs[1], np.ascontiguousarray(mask)
