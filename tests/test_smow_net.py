import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smow_net_tpu.models.smow_net import SMOWNet


@pytest.fixture(scope="module")
def model_and_vars():
    model = SMOWNet()
    x1 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    x2 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    out = model.apply(variables, x1, x2, train=False)
    assert out.shape == (2, 64, 64, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    out, mutated = model.apply(variables, x1, x2, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 1)
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_temporal_identity_init():
    """At init the inflated encoder must be temporally identity: swapping the
    two input frames must permute (not change) the stem output frames."""
    from smow_net_tpu.nn.resnet3d import ResNet3D

    enc = ResNet3D()
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.stack([x1, x2], 1), train=False)

    def stem(a, b):
        x = jnp.stack([a, b], axis=1)
        return enc.apply(variables, x, False, method=ResNet3D.stem_forward)

    s12 = np.asarray(stem(x1, x2))
    s21 = np.asarray(stem(x2, x1))
    np.testing.assert_allclose(s12[:, 0], s21[:, 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s12[:, 1], s21[:, 0], rtol=1e-5, atol=1e-5)


def test_fused_ofw_tokens_matches_legacy():
    """The fused OFW+token path (warp the 8-channel attention maps, scatter
    back) must equal the legacy path (warp the 32-channel features) — exact
    rewrite via conv/warp commutation + the sampling adjoint."""
    import flax.linen as nn
    import jax

    from smow_net_tpu.models.smow_net import (
        OFW, TokenTransformerEncoder, ofw_tokens_fused)

    class Legacy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            t = OFW(16, name="OFW")(x, train)
            return TokenTransformerEncoder(16, name="Transformer_Encoder")(t)

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return ofw_tokens_fused(
                OFW(16, name="OFW"),
                TokenTransformerEncoder(16, name="Transformer_Encoder"),
                x, train)

    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (2, 2, 32, 32, 16))
    leg, fus = Legacy(), Fused()
    v = leg.init(k(1), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fus.init(k(1), x)))
    o1 = leg.apply(v, x)
    o2 = fus.apply(v, x)
    assert float(jnp.max(jnp.abs(o1 - o2))) < 1e-5


def test_convt_mixfuse_matches_per_frame():
    """ConvTransBlock3d folded: the dense mix-fused kernel (cyclic temporal
    mix composed INTO the transposed conv, filling all lanes on narrow
    stages) is an exact linear rewrite of per-frame convT + folded mix —
    outputs, batch stats and parameter grads agree to fp32 tolerance.
    (time_5_bias is excluded from the grad check: a per-channel-constant
    shift that train-mode BN cancels exactly, so its gradient is
    mathematically zero and both paths return only fp noise.)"""
    from smow_net_tpu.models import smow_net as sm

    r, k = jax.random.normal, jax.random.PRNGKey
    B, H, W, Cin, F = 2, 6, 5, 12, 8
    x = r(k(0), (B, H, W, 4 * Cin), jnp.float32)
    m = sm.ConvTransBlock3d(F)
    try:
        sm.set_convt_mixfuse_max_f(0)
        v = m.init(k(1), x, False)
        # perturb so the mix isn't identity/zero init
        v = jax.tree_util.tree_map(
            lambda p: p + 0.05 * r(k(2), p.shape, p.dtype), v)
        v2 = m.init(k(1), x, False)
        ref, mut_ref = m.apply(v, x, True, mutable=["batch_stats"])
        ref_e = m.apply(v, x, False)
        sm.set_convt_mixfuse_max_f(F)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(m.init(k(1), x, False)))
        del v2
        got, mut_got = m.apply(v, x, True, mutable=["batch_stats"])
        got_e = m.apply(v, x, False)

        def loss(p, fuse):
            sm.set_convt_mixfuse_max_f(F if fuse else 0)
            out, _ = m.apply(p, x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out))

        g1 = jax.grad(lambda p: loss(p, False))(v)
        g2 = jax.grad(lambda p: loss(p, True))(v)
    finally:
        sm.set_convt_mixfuse_max_f(64)
    for a, b in [(ref, got), (ref_e, got_e)]:
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g1)[0],
                            jax.tree_util.tree_leaves(g2)):
        if "time_5_bias" in jax.tree_util.keystr(path):
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_folded_dense_impl_matches_grouped():
    """The fused dense lowering of DecomposedConv3d (blockdiag(spatial)@mix
    as ONE conv kernel) is an exact rewrite of grouped-conv+mix: whole
    encoder outputs agree in inference; auto mode under train=True uses the
    frame-batched layout (T into batch, four (F,F) mix matmuls) which is the
    same math as grouped up to fp summation order — values, batch stats and
    parameter grads all agree to fp32 tolerance."""
    from smow_net_tpu.nn import resnet3d
    from smow_net_tpu.nn.resnet3d import ResNet3D

    r, k = jax.random.normal, jax.random.PRNGKey
    x = r(k(0), (2, 64, 64, 6), jnp.float32)
    enc = ResNet3D()
    v = enc.init(k(1), x, False)
    try:
        resnet3d.set_folded_impl("grouped")
        a0, fa = enc.apply(v, x, False)
        (d0, fd), md = enc.apply(v, x, True, mutable=["batch_stats"])
        resnet3d.set_folded_impl("auto")
        b0, fb = enc.apply(v, x, False)  # inference -> dense
        (c0, fc), mc = enc.apply(v, x, True, mutable=["batch_stats"])  # batched
    finally:
        resnet3d.set_folded_impl("auto")
    for p, q in zip([a0] + list(fa), [b0] + list(fb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=5e-5, rtol=1e-4)
    for p, q in zip([c0] + list(fc), [d0] + list(fd)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=2e-4, rtol=1e-3)
    for p, q in zip(jax.tree_util.tree_leaves(mc["batch_stats"]),
                    jax.tree_util.tree_leaves(md["batch_stats"])):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=2e-5, rtol=1e-4)

    def loss(params, impl):
        resnet3d.set_folded_impl(impl)
        try:
            (o, f), _ = enc.apply({"params": params,
                                   "batch_stats": v["batch_stats"]},
                                  x, True, mutable=["batch_stats"])
        finally:
            resnet3d.set_folded_impl("auto")
        return jnp.sum(o ** 2) + sum(jnp.sum(z ** 2) for z in f)

    gg = jax.grad(lambda p: loss(p, "grouped"))(v["params"])
    gb = jax.grad(lambda p: loss(p, "batched"))(v["params"])
    for p, q in zip(jax.tree_util.tree_leaves(gg),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=5e-3 * max(1e-3, float(np.max(np.abs(p)))),
                                   rtol=2e-3)


def test_convblock_catsplit_equivalence():
    """conv(concat(y, f)) == conv(y; k[:Cy]) + conv(f; k[Cy:]) — the
    skip-concat split lowering must match the concat form exactly (same
    params, fp-assoc tolerance)."""
    from smow_net_tpu.models import smow_net as sn

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(2, 16, 16, 4 * 8)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(2, 16, 16, 4 * 8)), jnp.float32)
    blk = sn.ConvBlock23d(16)
    try:
        sn.set_convblock_catsplit(False)
        variables = blk.init(jax.random.PRNGKey(0), (y, f), False)
        ref = blk.apply(variables, (y, f), False)
        sn.set_convblock_catsplit(True)
        out = blk.apply(variables, (y, f), False)
    finally:
        sn.set_convblock_catsplit(True, liftfold=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_convblock_liftfold_equivalence():
    """Skip contraction with the T=2->4 lift composed into the kernel must
    equal lifting the skip then contracting (same params)."""
    from smow_net_tpu.models import smow_net as sn

    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=(2, 16, 16, 4 * 8)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(2, 16, 16, 2 * 8)), jnp.float32)
    f4 = sn._lift24_folded(f2)
    blk = sn.ConvBlock23d(16)
    try:
        sn.set_convblock_catsplit(True)
        variables = blk.init(jax.random.PRNGKey(0), (y, f4), False)
        ref = blk.apply(variables, (y, f4), False)
        sn.set_convblock_catsplit(True, liftfold=True)
        out = blk.apply(variables, (y, f2), False)
    finally:
        sn.set_convblock_catsplit(True, liftfold=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flow_folded_matches_5d():
    """OFW.flow T-folded lowering (dense block-banded convs + per-frame
    bilinear lift) is an exact rewrite of the 5-D depthwise path — outputs,
    train-mode batch stats, and parameter grads agree to fp32 tolerance."""
    import flax.linen as nn

    from smow_net_tpu.models import smow_net as sm

    class Flow(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return sm.OFW(12, name="ofw").flow(x, train)

    r, k = jax.random.normal, jax.random.PRNGKey
    x = r(k(0), (2, 2, 16, 16, 12), jnp.float32)
    m = Flow()
    try:
        sm.set_flow_folded(False)
        v = m.init(k(1), x)
        v = jax.tree_util.tree_map(
            lambda p: p + 0.05 * r(k(2), p.shape, p.dtype), v)
        ref_e = m.apply(v, x, False)
        ref_t, mut_ref = m.apply(v, x, True, mutable=["batch_stats"])

        def loss(p):
            return jnp.sum(m.apply({**v, "params": p}, x, True,
                                   mutable=["batch_stats"])[0] ** 2)

        g_ref = jax.grad(loss)(v["params"])

        sm.set_flow_folded(True)
        assert (jax.tree_util.tree_structure(m.init(k(1), x))
                == jax.tree_util.tree_structure(v))
        out_e = m.apply(v, x, False)
        out_t, mut = m.apply(v, x, True, mutable=["batch_stats"])
        g = jax.grad(loss)(v["params"])
    finally:
        sm.set_flow_folded(False)

    np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut), jax.tree_util.tree_leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_convblock_lw_pair_liftfold_equivalence():
    """ConvBlockLW pair form: split skip contraction (narrow stages) with
    the lift composed into the skip kernel == concat of the lifted skip."""
    from smow_net_tpu.models import smow_net as sn
    from smow_net_tpu.models.smow_net_lw import ConvBlockLW

    rng = np.random.default_rng(6)
    for F, Ca, Cb in ((16, 12, 8), (80, 12, 8)):  # narrow + wide(>gate)
        y = jnp.asarray(rng.normal(size=(2, 8, 8, 4 * Ca)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(2, 8, 8, 2 * Cb)), jnp.float32)
        f4 = sn._lift24_folded(f2)
        blk = ConvBlockLW(F)
        try:
            sn.set_convblock_catsplit(False)
            v = blk.init(jax.random.PRNGKey(0), (y, f4), False)
            ref = blk.apply(v, (y, f4), False)
            sn.set_convblock_catsplit(True, liftfold=True)
            assert (jax.tree_util.tree_structure(
                blk.init(jax.random.PRNGKey(0), (y, f2), False))
                == jax.tree_util.tree_structure(v))
            out = blk.apply(v, (y, f2), False)
        finally:
            sn.set_convblock_catsplit(True, liftfold=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"F={F}")


def test_pool_grouped_equivalent():
    """Frame-grouped token pooling must equal the per-frame form exactly
    (pure reassociation of the same dots)."""
    import smow_net_tpu.models.smow_net as sm
    from smow_net_tpu.models import get_model

    import jax
    import jax.numpy as jnp
    import numpy as np

    model = get_model("smow_net")
    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    try:
        sm.set_pool_grouped(False)
        out_a = model.apply(variables, x1, x2, train=False)
        sm.set_pool_grouped(True)
        out_b = model.apply(variables, x1, x2, train=False)
    finally:
        sm.set_pool_grouped(False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=2e-6, atol=2e-6)
