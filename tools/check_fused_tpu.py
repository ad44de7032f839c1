"""On-TPU parity + timing of the fused selective-scan kernel vs the
associative-scan reference at real SS2D/STBlock shapes, forward and VJP."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from smow_net_tpu.ops.pallas.scan_fused import selective_scan_fused
from smow_net_tpu.ops.scan import selective_scan

ITERS = int(os.environ.get("CF_ITERS", "10"))


def make(seed, b, L, G, Cg, N):
    D = G * Cg
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    u = jax.random.normal(ks[0], (b, L, D), jnp.float32)
    delta = jax.random.normal(ks[1], (b, L, D), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32) * 0.3)
    Bm = jax.random.normal(ks[3], (b, L, G, N), jnp.float32)
    Cm = jax.random.normal(ks[4], (b, L, G, N), jnp.float32)
    Dv = jax.random.normal(ks[5], (D,), jnp.float32)
    db = jax.random.normal(ks[6], (D,), jnp.float32) * 0.1
    gy = jax.random.normal(ks[7], (b, L, D), jnp.float32)
    return u, delta, A, Bm, Cm, Dv, db, gy


def timeit(fn, args, label):
    """In-graph loop with carry dependency + full consumption (CLAUDE.md)."""
    def loop(*a):
        def body(_, carry):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (jnp.mean(out) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {label}: {dt:.2f} ms", flush=True)
    return dt


# STBlock shape (Di=256, K=4) and an early-VSSM shape (Di=192, K=4)
for (b, L, G, Cg, N) in [(4, 2048, 4, 256, 16), (4, 4096, 4, 192, 16)]:
    u, delta, A, Bm, Cm, Dv, db, gy = make(0, b, L, G, Cg, N)
    print(f"shape b{b} L{L} G{G} Cg{Cg} N{N}:", flush=True)

    ref = jax.jit(lambda *a: selective_scan(*a, delta_softplus=True))(
        u, delta, A, Bm, Cm, Dv, db)
    out = jax.jit(lambda *a: selective_scan_fused(*a, delta_softplus=True))(
        u, delta, A, Bm, Cm, Dv, db)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(ref))) + 1e-9
    print(f"  fwd rel err {err/sc:.2e}", flush=True)
    assert err / sc < 1e-4, err

    def vjp_of(fn):
        def f(*a):
            out, vjp = jax.vjp(lambda *x: fn(*x, delta_softplus=True), *a[:-1])
            return sum(jnp.sum(jnp.abs(g.astype(jnp.float32))) for g in vjp(a[-1]))
        return f

    gs_f = jax.jit(vjp_of(selective_scan_fused))(u, delta, A, Bm, Cm, Dv, db, gy)
    gs_r = jax.jit(vjp_of(selective_scan))(u, delta, A, Bm, Cm, Dv, db, gy)
    rel = abs(float(gs_f) - float(gs_r)) / (abs(float(gs_r)) + 1e-9)
    print(f"  grad-magnitude rel diff {rel:.2e}", flush=True)
    assert rel < 1e-3, rel

    timeit(lambda *a: selective_scan_fused(*a, delta_softplus=True),
           (u, delta, A, Bm, Cm, Dv, db), "fused fwd")
    timeit(lambda *a: selective_scan(*a, delta_softplus=True),
           (u, delta, A, Bm, Cm, Dv, db), "xla fwd")

    def train_like(fn):
        def f(u, delta, A, Bm, Cm, Dv, db, gy):
            def loss(*x):
                return jnp.sum(fn(*x, delta_softplus=True) * gy)
            gs = jax.grad(loss, argnums=(0, 1, 3, 4))(u, delta, A, Bm, Cm, Dv, db)
            return sum(jnp.sum(jnp.abs(g)) for g in gs) * 1e-12
        return f

    for name, fn in [("fused", selective_scan_fused), ("xla", selective_scan)]:
        g = train_like(fn)

        def loop(u, *rest):
            def body(_, carry):
                return g(u + carry.astype(u.dtype), *rest).astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        c = jax.jit(loop).lower(u, delta, A, Bm, Cm, Dv, db, gy).compile()
        float(c(u, delta, A, Bm, Cm, Dv, db, gy))
        t0 = time.perf_counter()
        float(c(u, delta, A, Bm, Cm, Dv, db, gy))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"  {name} fwd+bwd: {dt:.2f} ms", flush=True)

print("FUSED_TPU_OK", flush=True)
