"""Fully-fused Pallas selective scan (ops/pallas/scan_fused.py) vs the
associative-scan reference — forward and the fused two-kernel backward,
interpret mode on CPU. The bench tools exercise the compiled TPU path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smow_net_tpu.ops.pallas.scan_fused import selective_scan_fused
from smow_net_tpu.ops.scan import selective_scan


def _inputs(seed, b, L, Dch, N, G, bias=True, sp=True):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(b, L, Dch)), jnp.float32)
    # without softplus a negative raw dt makes exp(dt*A) > 1 and the
    # recurrence grows exponentially over L — keep dt positive there so the
    # comparison measures kernel parity, not amplified fp reordering
    delta = jnp.asarray(rng.normal(size=(b, L, Dch)) * 0.5, jnp.float32)
    if not sp:
        delta = jnp.abs(delta)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(Dch, N)), jnp.float32)) * 0.5
    B = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, L, G, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(Dch,)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(Dch,)) * 0.1, jnp.float32) if bias else None
    return u, delta, A, B, C, D, db


@pytest.mark.parametrize("b,L,Dch,N,G,sp,bias", [
    (2, 64, 96, 16, 4, True, True),    # SS2D-like grouped config
    (1, 64, 32, 8, 1, False, False),   # single group, no extras
    (2, 48, 32, 16, 2, True, True),    # L with a non-power-of-two factor
])
def test_fused_forward_matches_reference(b, L, Dch, N, G, sp, bias):
    u, delta, A, B, C, D, db = _inputs(0, b, L, Dch, N, G, bias, sp)
    ref = selective_scan(u, delta, A, B, C, D, db, sp)
    out = selective_scan_fused(u, delta, A, B, C, D, db, sp, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_bf16():
    u, delta, A, B, C, D, db = _inputs(3, 2, 64, 48, 16, 2)
    ub, dtb = u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16)
    Bb, Cb = B.astype(jnp.bfloat16), C.astype(jnp.bfloat16)
    ref = selective_scan(ub, dtb, A, Bb, Cb, D, db, True)
    out = selective_scan_fused(ub, dtb, A, Bb, Cb, D, db, True, interpret=True)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    assert err / (np.max(np.abs(np.asarray(ref, np.float32))) + 1e-9) < 2e-2


@pytest.mark.parametrize("b,L,Dch,N,G,sp,bias", [
    (2, 64, 48, 16, 2, True, True),
    (1, 96, 32, 8, 1, False, False),
])
def test_fused_grad_all_inputs(b, L, Dch, N, G, sp, bias):
    """The fused checkpoint+reverse-sweep backward vs autodiff through the
    associative scan: every differentiable input."""
    u, delta, A, B, C, D, db = _inputs(7, b, L, Dch, N, G, bias, sp)
    gy = jnp.asarray(np.random.default_rng(9).normal(size=(b, L, Dch)),
                     jnp.float32)
    args = (u, delta, A, B, C, D) + ((db,) if bias else ())
    names = ("u", "delta", "A", "B", "C", "D", "bias")[: len(args)]

    def run(fn, **kw):
        out, vjp = jax.vjp(lambda *a: fn(*a, delta_softplus=sp, **kw), *args)
        return out, vjp(gy)

    out_f, grads_f = run(selective_scan_fused, interpret=True)
    out_r, grads_r = run(selective_scan)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for name, gf, gr in zip(names, grads_f, grads_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_multi_chunk_grad():
    """L spanning several kernel chunks exercises the cross-chunk adjoint
    carry and the checkpoint plumbing (chunk forced small via big Cg)."""
    import smow_net_tpu.ops.pallas.scan_fused as sf

    orig_f, orig_b = sf._pick_chunk, sf._pick_chunk_bwd
    sf._pick_chunk = lambda L, Cg, bt=1, budget_bytes=0: 16
    sf._pick_chunk_bwd = lambda L, Cg, N, bt=1, budget_bytes=0: 16
    try:
        u, delta, A, B, C, D, db = _inputs(11, 1, 64, 16, 8, 1)
        gy = jnp.asarray(np.random.default_rng(12).normal(size=(1, 64, 16)),
                         jnp.float32)
        args = (u, delta, A, B, C, D, db)
        out_f, vjp_f = jax.vjp(
            lambda *a: selective_scan_fused(*a, delta_softplus=True,
                                            interpret=True), *args)
        out_r, vjp_r = jax.vjp(
            lambda *a: selective_scan(*a, delta_softplus=True), *args)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        for name, gf, gr in zip(("u", "delta", "A", "B", "C", "D", "bias"),
                                vjp_f(gy), vjp_r(gy)):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-4, atol=2e-4, err_msg=name)
    finally:
        sf._pick_chunk, sf._pick_chunk_bwd = orig_f, orig_b


def test_segmented_two_level_matches_reference():
    """The two-level long-L path (per-segment parallel walks + XLA combine
    + seeded emit/adjoint kernels) == the associative-scan oracle, forward
    and all 7 input grads. Segmentation forced at small L via the module
    thresholds."""
    from smow_net_tpu.ops.pallas import scan_fused as sf

    b, L, Dch, N, G = 2, 128, 32, 8, 2
    u, delta, A, B, C, D, db = _inputs(11, b, L, Dch, N, G, True, True)
    old = (sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS)
    try:
        sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS = 64, 16, 64
        assert sf._seg_S(b * G, L) > 1
        ref = selective_scan(u, delta, A, B, C, D, db, True)
        out = selective_scan_fused(u, delta, A, B, C, D, db, True,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        cot = jnp.asarray(np.random.default_rng(5).normal(
            size=(b, L, Dch)), jnp.float32)

        def loss(fn):
            def f(*a):
                return jnp.sum(fn(*a) * cot)
            return jax.grad(f, argnums=tuple(range(7)))(
                u, delta, A, B, C, D, db)

        g_ref = loss(lambda *a: selective_scan(*a, True))
        g_out = loss(lambda *a: selective_scan_fused(*a, True,
                                                     interpret=True))
        names = ["u", "delta", "A", "B", "C", "D", "db"]
        for nm, gr, go in zip(names, g_ref, g_out):
            np.testing.assert_allclose(
                np.asarray(go), np.asarray(gr), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch for {nm}")
    finally:
        sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS = old


def test_segmented_grouped_matches_flat():
    """selective_scan_fused_grouped under forced segmentation == the flat
    contract on transposed operands (fwd + grads wrt xs/dts)."""
    from smow_net_tpu.ops.pallas import scan_fused as sf
    from smow_net_tpu.ops.pallas.scan_fused import selective_scan_fused_grouped

    b, K, L, Dk, N = 1, 2, 128, 16, 8
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.normal(size=(b, K, L, Dk)), jnp.float32)
    dts = jnp.asarray(rng.normal(size=(b, K, L, Dk)) * 0.5, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(K * Dk, N)), jnp.float32)) * 0.5
    Bs = jnp.asarray(rng.normal(size=(b, K, L, N)), jnp.float32)
    Cs = jnp.asarray(rng.normal(size=(b, K, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(K * Dk,)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(K * Dk,)) * 0.1, jnp.float32)

    u = xs.transpose(0, 2, 1, 3).reshape(b, L, K * Dk)
    dt = dts.transpose(0, 2, 1, 3).reshape(b, L, K * Dk)
    Bm = Bs.transpose(0, 2, 1, 3)
    Cm = Cs.transpose(0, 2, 1, 3)
    ref = selective_scan(u, dt, A, Bm, Cm, D, db, True)
    ref = ref.reshape(b, L, K, Dk).transpose(0, 2, 1, 3)

    old = (sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS)
    try:
        sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS = 64, 16, 64
        assert sf._seg_S(b * K, L) > 1
        out = selective_scan_fused_grouped(xs, dts, A, Bs, Cs, D, db, True,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        g = jax.grad(lambda a, d: jnp.sum(jnp.sin(
            selective_scan_fused_grouped(a, d, A, Bs, Cs, D, db, True,
                                         interpret=True))),
            argnums=(0, 1))(xs, dts)
        gr = jax.grad(lambda a, d: jnp.sum(jnp.sin(
            selective_scan(
                a.transpose(0, 2, 1, 3).reshape(b, L, K * Dk),
                d.transpose(0, 2, 1, 3).reshape(b, L, K * Dk),
                A, Bm, Cm, D, db, True).reshape(b, L, K, Dk)
            .transpose(0, 2, 1, 3))), argnums=(0, 1))(xs, dts)
        for go, gref in zip(g, gr):
            np.testing.assert_allclose(np.asarray(go), np.asarray(gref),
                                       rtol=2e-4, atol=2e-4)
    finally:
        sf._SEG_MIN_L, sf._SEG_MIN_K, sf._SEG_TARGET_ROWS = old


@pytest.mark.parametrize(
    "BG,L,Cg,N,bt,wide",
    [
        # change_mamba VSSBlock 64^2 (B4, K4): exactly AT the 24576 gate —
        # proven-on-chip largest non-wide tiling (CLAUDE.md perf notes)
        (16, 4096, 96, 16, 16, False),
        # cd_mamba enc0 bidirectional batched call
        (16, 65536, 32, 16, 16, False),
        # cd_mamba GF both-direction batched call
        (32, 65536, 32, 16, 32, False),
        # rs_mamba OSSM (B4, K8, Cg=192): wide — budget-shrunk tilings
        (32, 4096, 192, 16, 16, True),
    ],
)
def test_wide_row_classification_pinned(BG, L, Cg, N, bt, wide):
    """The wide-row gate (bt*N*Cg > _WIDE_ROW_ELEMS) sits exactly at
    change_mamba's proven shape; a drive-by change to _BT_CAP / the gate /
    _pick_bt would silently flip a bench-critical model between the full and
    shrunken chunk budgets (~3% step-unroll cost). Pin the classification of
    the bench-critical tuples (ADVICE r4)."""
    from smow_net_tpu.ops.pallas import scan_fused as sf

    got_bt = sf._pick_bt(BG, Cg, N)
    assert got_bt == bt, (got_bt, bt)
    assert (got_bt * N * Cg > sf._WIDE_ROW_ELEMS) == wide
    # and the budget actually applied follows the classification
    fwd_bt, fwd_chunk, fwd_step = sf._tiling(BG, L, Cg, N)
    assert fwd_bt == bt
    assert fwd_step == (sf._STEP_WIDE if wide else sf._STEP)
