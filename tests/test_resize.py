import numpy as np
import pytest
import torch
import torch.nn.functional as F

from smow_net_tpu.ops import resize_linear, resize_nearest


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("t_in,t_out", [(2, 4), (4, 2), (3, 7)])
def test_trilinear_time_axis(align, t_in, t_out):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, t_in, 6, 5)).astype(np.float32)  # torch NCDHW
    ref = F.interpolate(
        torch.from_numpy(x), size=(t_out, 6, 5), mode="trilinear", align_corners=align
    ).numpy()
    # ours is channels-last (B, T, H, W, C)
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    out = np.asarray(resize_linear(x_cl, (t_out,), (1,), align_corners=align))
    out = np.transpose(out, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(9, 13), (64, 64), (3, 50)])
def test_bilinear_full(align, size):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 17, 11)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=size, mode="bilinear", align_corners=align).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    out = np.asarray(resize_linear(x_cl, size, (1, 2), align_corners=align))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(8, 8), (30, 14)])
def test_nearest(size):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 15, 21)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    out = np.asarray(resize_nearest(x_cl, size, (1, 2)))
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


@pytest.mark.parametrize("align", [True, False])
def test_trilinear_all_axes(align):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, 2, 16, 16)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=(4, 32, 32), mode="trilinear", align_corners=align
    ).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    out = np.asarray(resize_linear(x_cl, (4, 32, 32), (1, 2, 3), align_corners=align))
    out = np.transpose(out, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
