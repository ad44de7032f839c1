import numpy as np
import pytest
import torch
import torch.nn as nn

from smow_net_tpu.ops import causal_conv1d, conv, conv_transpose


def t2j_conv_weight(w: np.ndarray) -> np.ndarray:
    """torch conv weight (out, in/g, *k) -> ours (*k, in/g, out)."""
    nk = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nk)) + (1, 0))


def t2j_convT_weight(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """torch ConvTranspose weight (in, out/g, *k) -> forward-conv layout
    (*k, in/g, out): flip spatial, regroup."""
    nk = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, 2 + nk)))
    in_c, out_pg = w.shape[:2]
    in_pg = in_c // groups
    # (g, in/g, out/g, *k) -> (*k, in/g, g, out/g) -> (*k, in/g, out)
    w = w.reshape((groups, in_pg, out_pg) + w.shape[2:])
    perm = tuple(range(3, 3 + nk)) + (1, 0, 2)
    w = np.transpose(w, perm)
    return np.ascontiguousarray(w.reshape(w.shape[:nk] + (in_pg, groups * out_pg)))


@pytest.mark.parametrize("groups,dilation,stride,pad", [(1, 1, 1, 1), (4, 1, 2, 0), (1, 2, 1, 2)])
def test_conv2d(groups, dilation, stride, pad):
    rng = np.random.default_rng(0)
    B, Cin, Cout, H, W = 2, 8, 12, 14, 15
    m = nn.Conv2d(Cin, Cout, 3, stride=stride, padding=pad, dilation=dilation, groups=groups)
    x = rng.normal(size=(B, Cin, H, W)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    k = t2j_conv_weight(m.weight.detach().numpy())
    out = np.asarray(
        conv(np.transpose(x, (0, 2, 3, 1)), k, stride=stride, padding=pad, dilation=dilation, groups=groups)
    ) + m.bias.detach().numpy()
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv3d_stem_like():
    rng = np.random.default_rng(1)
    m = nn.Conv3d(3, 16, kernel_size=(1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3))
    x = rng.normal(size=(1, 3, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    k = t2j_conv_weight(m.weight.detach().numpy())
    out = np.asarray(
        conv(np.transpose(x, (0, 2, 3, 4, 1)), k, stride=(1, 2, 2), padding=(0, 3, 3))
    ) + m.bias.detach().numpy()
    out = np.transpose(out, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_depthwise_conv3d():
    # OFW downsample: groups == channels (models/SMOW_Net.py:591-601)
    rng = np.random.default_rng(2)
    C = 8
    m = nn.Conv3d(C, C, kernel_size=3, stride=(1, 2, 2), padding=1, groups=C)
    x = rng.normal(size=(1, C, 2, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    k = t2j_conv_weight(m.weight.detach().numpy())
    out = np.asarray(
        conv(np.transpose(x, (0, 2, 3, 4, 1)), k, stride=(1, 2, 2), padding=1, groups=C)
    ) + m.bias.detach().numpy()
    out = np.transpose(out, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "k,s,p,op",
    [((1, 5, 5), (1, 2, 2), (0, 2, 2), (0, 1, 1)), ((1, 3, 3), (1, 2, 2), (0, 1, 1), (0, 1, 1))],
)
def test_conv_transpose3d(k, s, p, op):
    rng = np.random.default_rng(3)
    Cin, Cout = 6, 10
    m = nn.ConvTranspose3d(Cin, Cout, kernel_size=k, stride=s, padding=p, output_padding=op)
    x = rng.normal(size=(2, Cin, 4, 7, 9)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    kk = t2j_convT_weight(m.weight.detach().numpy())
    out = np.asarray(
        conv_transpose(np.transpose(x, (0, 2, 3, 4, 1)), kk, stride=s, padding=p, output_padding=op)
    ) + m.bias.detach().numpy()
    out = np.transpose(out, (0, 4, 1, 2, 3))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_grouped():
    rng = np.random.default_rng(4)
    m = nn.ConvTranspose2d(8, 12, kernel_size=4, stride=2, padding=1, groups=4)
    x = rng.normal(size=(2, 8, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    kk = t2j_convT_weight(m.weight.detach().numpy(), groups=4)
    out = np.asarray(
        conv_transpose(np.transpose(x, (0, 2, 3, 1)), kk, stride=2, padding=1, output_padding=0, groups=4)
    ) + m.bias.detach().numpy()
    out = np.transpose(out, (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_causal_conv1d():
    rng = np.random.default_rng(5)
    C, K, L = 6, 4, 20
    m = nn.Conv1d(C, C, K, padding=K - 1, groups=C, bias=False)
    x = rng.normal(size=(1, C, L)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()[..., :L]  # torch pads both sides; crop right
    k = t2j_conv_weight(m.weight.detach().numpy())
    out = np.asarray(causal_conv1d(np.transpose(x, (0, 2, 1)), k, groups=C))
    out = np.transpose(out, (0, 2, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv3d_decomposed_matches_native():
    import jax
    import jax.numpy as jnp

    from smow_net_tpu.ops import convops

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 10, 10, 6), jnp.float32)
    for groups, cin, cout, stride in [(1, 6, 8, 1), (1, 6, 8, (1, 2, 2)), (6, 1, 6, 1)]:
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout)) * 0.1
        ref = convops.conv(x, w, stride, 1, 1, groups)
        convops.set_conv3d_impl("decomposed")
        try:
            out = convops.conv(x, w, stride, 1, 1, groups)
        finally:
            convops.set_conv3d_impl("auto")
        assert out.shape == ref.shape
        import numpy as np
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
