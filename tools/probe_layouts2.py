"""Round-2 layout probes, part 2: the cross-attention decoder's FFN and
LayerNorms (measured 1.5 ms and 0.45 ms real each on v5e at 7%/0.1% MFU —
the whole stage's matmuls should take ~0.2 ms).

Harness floor is ~1.4 ms/iter (CLAUDE.md) — compare differences.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = 16
N = 128 * 128
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


def check(label, a, b, tol):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"  parity {label}: {err:.2e} {'OK' if err <= tol else 'FAIL'}",
          flush=True)


def probe_ffn():
    x = r(k(0), (BS, N, 128), bf)
    w1 = r(k(1), (128, 256), bf) * 0.05
    b1 = r(k(2), (256,), bf)
    w2 = r(k(3), (256, 128), bf) * 0.05
    b2 = r(k(4), (128,), bf)

    def cur(x, w1, b1, w2, b2):
        y = jnp.matmul(x, w1) + b1
        y = jax.nn.gelu(y, approximate=False)
        return jnp.matmul(y, w2) + b2

    def flat2d(x, w1, b1, w2, b2):
        x2 = x.reshape(BS * N, 128)
        y = jnp.matmul(x2, w1) + b1
        y = jax.nn.gelu(y, approximate=False)
        return (jnp.matmul(y, w2) + b2).reshape(BS, N, 128)

    def gelu_f32(x, w1, b1, w2, b2):
        y = jnp.matmul(x, w1) + b1
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
        return jnp.matmul(y, w2) + b2

    def gelu_tanh(x, w1, b1, w2, b2):
        y = jnp.matmul(x, w1) + b1
        y = jax.nn.gelu(y, approximate=True)
        return jnp.matmul(y, w2) + b2

    def no_gelu(x, w1, b1, w2, b2):
        y = jnp.matmul(x, w1) + b1
        return jnp.matmul(y, w2) + b2

    check("flat2d", cur(x, w1, b1, w2, b2), flat2d(x, w1, b1, w2, b2), 1e-6)
    timeit("ffn rank-3 matmul + erf gelu (current)", cur, x, w1, b1, w2, b2)
    timeit("ffn 2d-reshaped matmuls", flat2d, x, w1, b1, w2, b2)
    timeit("ffn erf-gelu in f32", gelu_f32, x, w1, b1, w2, b2)
    timeit("ffn tanh-gelu (not exact)", gelu_tanh, x, w1, b1, w2, b2)
    timeit("ffn no gelu (floor ref)", no_gelu, x, w1, b1, w2, b2)


def probe_ln():
    import flax.linen as nn

    x = r(k(5), (BS, N, 128), bf)

    class LN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.LayerNorm(epsilon=1e-5, name="n")(x)

    m = LN()
    v = m.init(k(6), x)
    v = jax.tree_util.tree_map(lambda p: p.astype(bf), v)

    def cur(x):
        return m.apply(v, x)

    sc = v["params"]["n"]["scale"]
    bi = v["params"]["n"]["bias"]

    def manual(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + 1e-5)
        return (y * sc.astype(jnp.float32) + bi.astype(jnp.float32)).astype(x.dtype)

    check("ln", cur(x), manual(x), 2e-2)
    timeit("flax LayerNorm", cur, x)
    timeit("manual f32 LN", manual, x)


def main():
    which = os.environ.get("PROBES", "ffn,ln")
    for name in which.split(","):
        globals()[f"probe_{name}"]()


if __name__ == "__main__":
    main()
