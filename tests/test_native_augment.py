"""Native C++ augmentation engine vs the cv2/numpy reference transforms."""

import numpy as np
import pytest

from smow_net_tpu.data.transforms import (
    _flip, _rotate, aberration, imagenet_normalize, shared_geometric,
)
from smow_net_tpu.runtime import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def _rand(h=33, w=29):
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    m = (rng.uniform(size=(h, w)) > 0.5).astype(np.float32)
    return a, b, m


def test_flip_matches(lib):
    for d in (-1, 0, 1):
        a, b, m = _rand()
        ra, rb, rm = _flip(a, d).copy(), _flip(b, d).copy(), _flip(m, d).copy()
        native.augment_sample(a, b, m, d, 0.0, False, 1, 0, 0, False, 1, 0, 0,
                              normalize=False)
        np.testing.assert_array_equal(a, ra)
        np.testing.assert_array_equal(m, rm)


def test_rotate_matches_cv2(lib):
    a, b, m = _rand(64, 64)
    ra = _rotate(a, 4.2, nearest=False)
    rm = _rotate(m, 4.2, nearest=True)
    native.augment_sample(a, b, m, -2, 4.2, False, 1, 0, 0, False, 1, 0, 0,
                          normalize=False)
    np.testing.assert_allclose(a, ra, rtol=1e-4, atol=1e-4)
    # nearest-rotated masks may disagree exactly on .5 rounding boundaries
    assert (m != rm).mean() < 0.01


def test_brightness_contrast_blur_normalize(lib):
    a, b, m = _rand(32, 32)
    import cv2

    ra = a * 1.1 + 0.05
    ra = cv2.GaussianBlur(ra, (5, 5), 0)
    ra = imagenet_normalize(ra)
    rb = imagenet_normalize(b.copy())
    native.augment_sample(a, b, m, -2, 0.0, True, 1.1, 0.05, 5,
                          False, 1, 0, 0, normalize=True)
    np.testing.assert_allclose(a, ra, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(b, rb, rtol=1e-5, atol=1e-5)


def test_native_and_numpy_paths_agree(lib, tmp_path):
    """The dataset must produce identical batches with and without the
    native engine (same seeds)."""
    from smow_net_tpu.data.dataset import CDDataset, generate_synthetic_dataset
    from smow_net_tpu.runtime import native as nat

    root = generate_synthetic_dataset(str(tmp_path), n_train=4, n_val=1, size=32)
    ds = CDDataset(root, "train")
    items_native = [ds.get(i, epoch=1) for i in range(4)]
    # force the numpy fallback
    orig = nat.available
    nat.available = lambda: False
    try:
        items_np = [ds.get(i, epoch=1) for i in range(4)]
    finally:
        nat.available = orig
    for a, b in zip(items_native, items_np):
        np.testing.assert_allclose(a["A"], b["A"], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(a["mask"], b["mask"], atol=1.0)
        assert (a["mask"] != b["mask"]).mean() < 0.02  # nearest-rotate ties
