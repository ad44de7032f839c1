import numpy as np
import torch
import torch.nn.functional as F

from smow_net_tpu.ops import pixel_shuffle, smow_shuffle


def _reference_classifier_shuffle(x: torch.Tensor, scale: int) -> torch.Tensor:
    """Behavioral spec of the reference Classifier permute/view chain
    (models/SMOW_Net.py:390-408), re-stated for golden comparison."""
    N, C, H, W = x.shape
    y = x.permute(0, 2, 3, 1)
    y = y.contiguous().view(N, H, W * scale, C // scale)
    y = y.permute(0, 2, 1, 3)
    y = y.contiguous().view(N, W * scale, H * scale, C // (scale * scale))
    return y.permute(0, 3, 2, 1)


def test_smow_shuffle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 5, 7)).astype(np.float32)
    ref = _reference_classifier_shuffle(torch.from_numpy(x), 2).numpy()
    out = np.asarray(smow_shuffle(np.transpose(x, (0, 2, 3, 1)), 2))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref)


def test_pixel_shuffle_standard():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, 5, 7)).astype(np.float32)
    ref = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    out = np.asarray(pixel_shuffle(np.transpose(x, (0, 2, 3, 1)), 2))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref)
