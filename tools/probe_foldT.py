"""Probe the fold-T layout rewrites before integrating them.

Fold-T = keep activations as (B, H, W, T*C) (frame-major channels) so that
per-frame spatial convs become grouped 2-D convs (tiled kernels), temporal
1x1x1 mixers become single full-width (TC, TC) matmuls, and tdense 3-D convs
lose their transpose sandwiches. Each probe checks numerics against the
current path, then times both with the in-graph loop (NB: the harness has a
~1.4 ms/iter floor — compare differences, not absolutes).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax import lax

from smow_net_tpu.ops import convops

BS = 16
bf = jnp.bfloat16
ITERS = 20
r = jax.random.normal
k = jax.random.PRNGKey


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return (s * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    print(f"{label:46s} {dt/ITERS*1e3:8.3f} ms", flush=True)


def check(label, a, b, tol=3e-2):
    if a.ndim == 5:  # (B,T,H,W,C) vs folded (B,H,W,T*C)
        B, T, H, W, C = a.shape
        a = a.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"  parity {label}: {err:.2e} {'OK' if err <= tol else 'FAIL'}",
          flush=True)


def fold(x):  # (B,T,H,W,C) -> (B,H,W,T*C)
    B, T, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)


# ---------- A. DecomposedConv3d: current vs folded ----------

def probe_decomp():
    Cin = Cout = 64
    x = r(k(0), (BS, 2, 128, 128, Cin), bf)
    ks = r(k(1), (1, 3, 3, Cin, Cout), bf) * 0.05
    w1 = r(k(2), (Cout, Cout), bf) * 0.05
    w2 = r(k(3), (Cout, Cout), bf) * 0.05
    w3 = r(k(4), (Cout, Cout), bf) * 0.05

    def cur(x, ks, w1, w2, w3):
        y = convops.conv(x, ks, (1, 1, 1), (0, 1, 1))
        y_id = jnp.matmul(y, w2)
        f1 = y_id[:, 0:1] + jnp.matmul(y[:, 1:2], w3)
        f2 = jnp.matmul(y[:, 0:1], w1) + y_id[:, 1:2]
        return jnp.concatenate([f1, f2], axis=1)

    def folded(xf, ks, w1, w2, w3):
        tiled = jnp.concatenate([ks[0], ks[0]], axis=-1)
        y = convops.conv(xf, tiled, (1, 1), (1, 1), 1, 2)
        M = jnp.concatenate([
            jnp.concatenate([w2, w1], axis=1),
            jnp.concatenate([w3, w2], axis=1)], axis=0)
        return jnp.matmul(y, M)

    xf = fold(x)
    check("decomp", cur(x, ks, w1, w2, w3), folded(xf, ks, w1, w2, w3))
    timeit("decomp conv current (B,T,H,W,C)", cur, x, ks, w1, w2, w3)
    timeit("decomp conv folded (B,H,W,2C)", folded, xf, ks, w1, w2, w3)


# ---------- B. tdense 3x3x3 conv: current vs folded ----------

def probe_tdense():
    Cin, Cout, T = 64, 32, 4
    x = r(k(5), (BS, T, 128, 128, Cin), bf) * 0.3
    w = r(k(6), (3, 3, 3, Cin, Cout), bf) * 0.05

    def cur(x, w):
        return convops.conv(x, w, 1, 1)

    def folded(xf, w):
        K2 = convops.tdense_kernel(w, T)
        return convops.conv(xf, K2, (1, 1), (1, 1))

    xf = fold(x)
    check("tdense", cur(x, w), folded(xf, w))
    timeit("tdense conv current (transp sandwich)", cur, x, w)
    timeit("tdense conv folded (none)", folded, xf, w)


# ---------- C. ConvTranspose (1,5,5)x(1,2,2): current vs folded ----------

def probe_ctrans():
    Cin, Cout, T = 64, 64, 4
    x = r(k(7), (BS, T, 64, 64, Cin), bf) * 0.3
    w = r(k(8), (1, 5, 5, Cin, Cout), bf) * 0.02

    def cur(x, w):
        return convops.conv_transpose(x, w, (1, 2, 2), (0, 2, 2), (0, 1, 1))

    def folded(xf, w):
        tiled = jnp.concatenate([w[0]] * T, axis=-1)
        return convops.conv_transpose(xf, tiled, (2, 2), (2, 2), (1, 1), T)

    xf = fold(x)
    check("ctrans", cur(x, w), folded(xf, w))
    timeit("ctrans current", cur, x, w)
    timeit("ctrans folded grouped", folded, xf, w)


# ---------- D. stem 7x7/2 on 3ch: per-frame vs folded grouped ----------

def probe_stem():
    x = r(k(9), (BS, 2, 256, 256, 3), bf)
    ks = r(k(10), (1, 7, 7, 3, 64), bf) * 0.05

    def cur(x, ks):
        return convops.conv(x, ks, (1, 2, 2), (0, 3, 3))

    def folded(xf, ks):
        tiled = jnp.concatenate([ks[0], ks[0]], axis=-1)
        return convops.conv(xf, tiled, (2, 2), (3, 3), 1, 2)

    xf = fold(x)
    check("stem", cur(x, ks), folded(xf, ks))
    timeit("stem current", cur, x, ks)
    timeit("stem folded grouped", folded, xf, ks)


def main():
    which = os.environ.get("PROBES", "decomp,tdense,ctrans,stem")
    for name in which.split(","):
        globals()[f"probe_{name}"]()


if __name__ == "__main__":
    main()
