"""Fused dim_head=1 cross-attention kernel (ops/pallas/xattn.py) vs the
portable XLA path — interpret mode on CPU. On-TPU numbers live in PARITY.md.

Covers the reference Transformer_Decoder semantics
(/root/reference/models/SMOW_Net.py:270-303, 337-381): fwd parity with and
without the folded lane permutation, full VJP parity (x, LN affine, all
four projections), and the decoder-level wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.ops import xattn

B, N, D, H_, M_ = 2, 512, 128, 8, 8


def _inputs(seed, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (B, N, D), dtype)
    ln_scale = jax.random.normal(ks[1], (D,), jnp.float32) * 0.2 + 1.0
    ln_bias = jax.random.normal(ks[2], (D,), jnp.float32) * 0.1
    wq = jax.random.normal(ks[3], (D, H_), dtype) * 0.1
    k = jax.random.normal(ks[4], (B, M_, H_), dtype)
    v = jax.random.normal(ks[5], (B, M_, H_), dtype)
    wo = jax.random.normal(ks[6], (H_, D), dtype) * 0.1
    bo = jax.random.normal(ks[7], (D,), dtype) * 0.1
    return x, ln_scale, ln_bias, wq, k, v, wo, bo


def _perm():
    rng = np.random.default_rng(0)
    cols = rng.permutation(D)
    p = np.zeros((D, D), np.float32)
    p[np.arange(D), cols] = 1.0
    return jnp.asarray(p)


@pytest.fixture(autouse=True)
def _restore_impl():
    # shrink the layer-kernel pixel tiles so the fused layer actually
    # engages at the test N=512 (with the production 1024/512 defaults,
    # xlayer_supported(512, ...) is False and the forced-"pallas" layer
    # tests silently compared the XLA path against itself — round-5 fix)
    from smow_net_tpu.ops.pallas import xattn as px

    px.set_xlayer_tiles(fwd=256, bwd=256)
    yield
    px.set_xlayer_tiles(fwd=1024, bwd=512)
    xattn.set_xattn_impl("auto")


def test_layer_kernel_engages_at_test_shapes():
    from smow_net_tpu.ops.pallas.xattn import xlayer_supported

    assert xlayer_supported(N, D, H_, M_, 2 * D)
    assert xlayer_supported(N // 2, 2 * 64, 2 * H_, M_, 2 * 128)  # pack2


@pytest.mark.parametrize("use_perm", [False, True])
def test_fwd_matches_xla(use_perm):
    args = _inputs(0)
    perm = _perm() if use_perm else None
    ref = xattn.cross_attn_head1(*args, scale=D ** -0.5, perm=perm)
    xattn.set_xattn_impl("pallas", interpret=True)
    out = xattn.cross_attn_head1_auto(*args, scale=D ** -0.5, perm=perm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_perm", [False, True])
def test_grads_match_xla(use_perm):
    args = _inputs(1)
    perm = _perm() if use_perm else None
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, N, D), jnp.float32)

    def loss(impl):
        def f(*a):
            if impl == "pallas":
                xattn.set_xattn_impl("pallas", interpret=True)
            else:
                xattn.set_xattn_impl("xla")
            y = xattn.cross_attn_head1_auto(*a, scale=D ** -0.5, perm=perm)
            return jnp.sum(y * cot)
        return jax.grad(f, argnums=tuple(range(8)))(*args)

    g_ref = loss("xla")
    g_pal = loss("pallas")
    names = ["x", "ln_scale", "ln_bias", "wq", "k", "v", "wo", "bo"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_decoder_folded_perm_equals_manual_cmajor():
    """PixelTransformerDecoder's folded path (perm handed to the layer) must
    equal explicitly transposing to c-major and running perm-less."""
    from smow_net_tpu.models.smow_net import PixelTransformerDecoder

    b, h, w, t, c = 2, 8, 8, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, t * c))
    m = jax.random.normal(jax.random.PRNGKey(3), (b, 8, 128))
    dec = PixelTransformerDecoder(128, folded_input=True)
    variables = dec.init(jax.random.PRNGKey(0), x, m)
    out = dec.apply(variables, x, m)

    # manual: t-major -> c-major, feed through the same layer without perm
    from smow_net_tpu.nn.layers import CrossTransformerLayer

    xc = x.reshape(b, h * w, t, c).transpose(0, 1, 3, 2).reshape(b, h * w, c * t)
    layer = CrossTransformerLayer(128, 8, dim_head=1, mlp_dim=256)
    lvars = {"params": variables["params"]["layer0"]}
    ref = layer.apply(lvars, xc, m).reshape(b, h, w, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _layer_inputs(seed, dtype=jnp.float32, hidden=256):
    ks = jax.random.split(jax.random.PRNGKey(seed), 14)
    x = jax.random.normal(ks[0], (B, N, D), dtype)
    ln1_s = jax.random.normal(ks[1], (D,), jnp.float32) * 0.2 + 1.0
    ln1_b = jax.random.normal(ks[2], (D,), jnp.float32) * 0.1
    wq = jax.random.normal(ks[3], (D, H_), dtype) * 0.1
    k = jax.random.normal(ks[4], (B, M_, H_), dtype)
    v = jax.random.normal(ks[5], (B, M_, H_), dtype)
    wo = jax.random.normal(ks[6], (H_, D), dtype) * 0.1
    bo = jax.random.normal(ks[7], (D,), dtype) * 0.1
    ln2_s = jax.random.normal(ks[8], (D,), jnp.float32) * 0.2 + 1.0
    ln2_b = jax.random.normal(ks[9], (D,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[10], (D, hidden), dtype) * 0.1
    b1 = jax.random.normal(ks[11], (hidden,), dtype) * 0.1
    w2 = jax.random.normal(ks[12], (hidden, D), dtype) * 0.1
    b2 = jax.random.normal(ks[13], (D,), dtype) * 0.1
    return (x, ln1_s, ln1_b, wq, k, v, wo, bo, ln2_s, ln2_b, w1, b1, w2, b2)


@pytest.mark.parametrize("use_perm", [False, True])
def test_layer_fwd_matches_xla(use_perm):
    args = _layer_inputs(5)
    perm = _perm() if use_perm else None
    ref = xattn.cross_layer_head1(*args, scale=D ** -0.5, perm=perm)
    xattn.set_xattn_impl("pallas", interpret=True)
    out = xattn.cross_layer_head1_auto(*args, scale=D ** -0.5, perm=perm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("use_perm", [False, True])
def test_layer_grads_match_xla(use_perm):
    args = _layer_inputs(6)
    perm = _perm() if use_perm else None
    cot = jax.random.normal(jax.random.PRNGKey(11), (B, N, D), jnp.float32)

    def grads(impl):
        def f(*a):
            if impl == "pallas":
                xattn.set_xattn_impl("pallas", interpret=True)
            else:
                xattn.set_xattn_impl("xla")
            y = xattn.cross_layer_head1_auto(*a, scale=D ** -0.5, perm=perm)
            return jnp.sum(y * cot)
        return jax.grad(f, argnums=tuple(range(14)))(*args)

    g_ref = grads("xla")
    g_pal = grads("pallas")
    names = ["x", "ln1_s", "ln1_b", "wq", "k", "v", "wo", "bo",
             "ln2_s", "ln2_b", "w1", "b1", "w2", "b2"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=5e-4, atol=5e-4,
            err_msg=f"layer grad mismatch for {name}")


def test_bf16_fwd_close(
):
    args = _inputs(4, jnp.bfloat16)
    args = args[:1] + args[1:3] + args[3:]  # ln affine stays f32
    ref = xattn.cross_attn_head1(*args, scale=D ** -0.5, perm=None)
    xattn.set_xattn_impl("pallas", interpret=True)
    out = xattn.cross_attn_head1_auto(*args, scale=D ** -0.5, perm=None)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_layer_supported_at_lw_width():
    """D=64 (the LW decoder) must route to the fused kernel and agree with
    the portable path (the r3 gate d % 128 silently excluded it)."""
    from smow_net_tpu.ops.pallas.xattn import xlayer_supported

    assert xlayer_supported(4096, 64, 8, 8, 128)
    d = 64
    ks = jax.random.split(jax.random.PRNGKey(31), 14)
    x = jax.random.normal(ks[0], (B, N, d), jnp.float32)
    a = (x,
         jax.random.normal(ks[1], (d,), jnp.float32) * 0.2 + 1.0,
         jax.random.normal(ks[2], (d,), jnp.float32) * 0.1,
         jax.random.normal(ks[3], (d, H_), jnp.float32) * 0.1,
         jax.random.normal(ks[4], (B, M_, H_), jnp.float32),
         jax.random.normal(ks[5], (B, M_, H_), jnp.float32),
         jax.random.normal(ks[6], (H_, d), jnp.float32) * 0.1,
         jax.random.normal(ks[7], (d,), jnp.float32) * 0.1,
         jax.random.normal(ks[8], (d,), jnp.float32) * 0.2 + 1.0,
         jax.random.normal(ks[9], (d,), jnp.float32) * 0.1,
         jax.random.normal(ks[10], (d, 128), jnp.float32) * 0.1,
         jax.random.normal(ks[11], (128,), jnp.float32) * 0.1,
         jax.random.normal(ks[12], (128, d), jnp.float32) * 0.1,
         jax.random.normal(ks[13], (d,), jnp.float32) * 0.1)
    ref = xattn.cross_layer_head1(*a, scale=d ** -0.5)
    xattn.set_xattn_impl("pallas", interpret=True)
    out = xattn.cross_layer_head1_auto(*a, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    g_ref = jax.grad(lambda x_: jnp.sum(
        xattn.cross_layer_head1(x_, *a[1:], scale=d ** -0.5) ** 2))(x)
    g_out = jax.grad(lambda x_: jnp.sum(
        xattn.cross_layer_head1_auto(x_, *a[1:], scale=d ** -0.5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_layer_bwd_parallel_b_toggle_equivalent():
    """The per-batch-partials backward (parallel-b) and the shared-block
    backward must produce identical grads (VERDICT r4 #3 lowering A/B)."""
    from smow_net_tpu.ops.pallas import xattn as px

    args = _layer_inputs(7)
    cot = jax.random.normal(jax.random.PRNGKey(12), (B, N, D), jnp.float32)

    def grads(parb):
        def f(*a):
            xattn.set_xattn_impl("pallas", interpret=True)
            y = xattn.cross_layer_head1_auto(*a, scale=D ** -0.5, perm=None)
            return jnp.sum(y * cot)
        try:
            px.set_xlayer_bwd(parallel_b=parb)
            return jax.grad(f, argnums=tuple(range(14)))(*args)
        finally:
            px.set_xlayer_bwd(parallel_b=True)
            xattn.set_xattn_impl("auto")

    ga = grads(False)
    gb = grads(True)
    # per-batch partials are summed outside the kernel, i.e. a different
    # fp32 accumulation order than the serialized in-kernel accumulate —
    # identical math, ~1e-5 reassociation noise
    for x_, y_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("use_perm", [False, True])
def test_layer_pack2_matches_xla(use_perm):
    """Pack-2 lowering at the LW width (D=64): two pixels per kernel row
    with block-diagonal weights must equal the XLA layer exactly — outputs
    and all 14 input grads (VERDICT r4 #2)."""
    from smow_net_tpu.ops import xattn as ox

    D2, hidden = 64, 128
    ks = jax.random.split(jax.random.PRNGKey(31), 14)
    x = jax.random.normal(ks[0], (2, N, D2), jnp.float32)
    args = (x,
            jax.random.normal(ks[1], (D2,), jnp.float32) * 0.2 + 1.0,
            jax.random.normal(ks[2], (D2,), jnp.float32) * 0.1,
            jax.random.normal(ks[3], (D2, H_), jnp.float32) * 0.1,
            jax.random.normal(ks[4], (2, M_, H_), jnp.float32),
            jax.random.normal(ks[5], (2, M_, H_), jnp.float32),
            jax.random.normal(ks[6], (H_, D2), jnp.float32) * 0.1,
            jax.random.normal(ks[7], (D2,), jnp.float32) * 0.1,
            jax.random.normal(ks[8], (D2,), jnp.float32) * 0.2 + 1.0,
            jax.random.normal(ks[9], (D2,), jnp.float32) * 0.1,
            jax.random.normal(ks[10], (D2, hidden), jnp.float32) * 0.1,
            jax.random.normal(ks[11], (hidden,), jnp.float32) * 0.1,
            jax.random.normal(ks[12], (hidden, D2), jnp.float32) * 0.1,
            jax.random.normal(ks[13], (D2,), jnp.float32) * 0.1)
    if use_perm:
        import numpy as onp
        T, C = 4, D2 // 4
        t_idx, c_idx = onp.divmod(onp.arange(D2), C)
        p = onp.zeros((D2, D2), onp.float32)
        p[onp.arange(D2), c_idx * T + t_idx] = 1.0
        perm = jnp.asarray(p)
    else:
        perm = None
    cot = jax.random.normal(jax.random.PRNGKey(32), (2, N, D2), jnp.float32)

    def run(impl, pack):
        def f(*a):
            if impl == "pallas":
                xattn.set_xattn_impl("pallas", interpret=True)
            else:
                xattn.set_xattn_impl("xla")
            y = xattn.cross_layer_head1_auto(*a, scale=D2 ** -0.5, perm=perm)
            return jnp.sum(y * cot), y
        try:
            ox.set_xlayer_pack2(pack)
            (loss, y), g = jax.value_and_grad(
                f, argnums=tuple(range(14)), has_aux=True)(*args)
        finally:
            ox.set_xlayer_pack2(True)
            xattn.set_xattn_impl("auto")
        return y, g

    y_ref, g_ref = run("xla", False)
    y_p, g_p = run("pallas", True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=5e-5, atol=5e-5)
    names = ["x", "ln1_s", "ln1_b", "wq", "k", "v", "wo", "bo",
             "ln2_s", "ln2_b", "w1", "b1", "w2", "b2"]
    for name, gr, gp in zip(names, g_ref, g_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=5e-4, atol=5e-4,
            err_msg=f"pack2 grad mismatch for {name}")
