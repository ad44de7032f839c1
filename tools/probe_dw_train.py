"""fwd+bwd A/B of the OFW flow() depthwise strided 3D convs (the train-side
cost of OFW.flow, ~3.3 ms marginal): XLA grouped depthwise vs shift-multiply
vs masked-dense (diagonal-masked full conv — 32x the MACs but on the MXU;
exact same math, zero terms included) vs block-grouped masked-dense
(groups of G channels dense).

VERDICT (v5e, 2026-08-18): XLA grouped 3.20 ms ~= masked dense 3.15 >>
blocked G=16 6.81 > blocked G=8 8.70 > shift-multiply 410. XLA's
depthwise lowering is the floor; intermediate feature_group_counts are
pathologically slow. Keep the grouped form in OFW.flow.

Chain = the three downs of OFW.flow at bs16 256^2 model shapes:
(16,2,128,128,32) -> three depthwise 3x3x3 convs, spatial stride 2, pad 1.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import itertools
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "10"))
bf = jnp.bfloat16
B, T, H, W, C = 16, 2, 128, 128, 32


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            g = jax.grad(lambda a, ks: jnp.sum(
                fn(a, ks).astype(jnp.float32) ** 2) * 1e-9,
                argnums=(0, 1))(xs[0] + carry.astype(xs[0].dtype), xs[1])
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(g)).astype(
                jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:46s} {ms:8.3f} ms", flush=True)


def chain_grouped(x, kernels):
    from smow_net_tpu.ops import convops

    y = x
    for kd in kernels:
        y = jax.nn.relu(convops.conv(y, kd, (1, 2, 2), 1, 1, C))
    return y


def chain_dense(x, kernels):
    from smow_net_tpu.ops import convops

    eye = jnp.eye(C, dtype=bf)
    y = x
    for kd in kernels:
        kdd = eye * kd[:, :, :, 0][:, :, :, None, :]  # (3,3,3,C,C) diagonal
        y = jax.nn.relu(convops.conv(y, kdd, (1, 2, 2), 1))
    return y


def make_chain_blocked(G):
    """Block-diagonal masked-dense: groups of G channels run as dense
    G->G blocks (feature_group_count=C//G), a midpoint between XLA's
    per-channel grouped lowering (G=1) and full masked dense (G=C)."""
    from smow_net_tpu.ops import convops

    def chain(x, kernels):
        # out channel c (group c//G) uses in-block input lane c%G only:
        # kblk[..., j, c] = kd[..., 0, c] * (j == c % G)
        mask = (jnp.arange(G)[:, None]
                == (jnp.arange(C) % G)[None, :]).astype(bf)      # (G, C)
        y = x
        for kd in kernels:
            kblk = kd[:, :, :, 0][:, :, :, None, :] * mask[None, None, None]
            y = jax.nn.relu(convops.conv(y, kblk, (1, 2, 2), 1, 1, C // G))
        return y

    return chain


def chain_shift(x, kernels):
    y = x
    for kd in kernels:
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        Ho = (y.shape[2] + 1) // 2
        Wo = (y.shape[3] + 1) // 2
        acc = 0.0
        for tt, hh, ww in itertools.product(range(3), repeat=3):
            sl = yp[:, tt:tt + T,
                    hh:hh + (Ho - 1) * 2 + 1:2,
                    ww:ww + (Wo - 1) * 2 + 1:2, :]
            acc = acc + sl * kd[tt, hh, ww, 0]
        y = jax.nn.relu(acc)
    return y


def main():
    r, k = jax.random.normal, jax.random.PRNGKey
    x = r(k(0), (B, T, H, W, C), bf)
    kernels = [r(k(i + 1), (3, 3, 3, 1, C), bf) * 0.1 for i in range(3)]

    # parity first
    a = chain_grouped(x, kernels)
    b = chain_dense(x, kernels)
    c = chain_shift(x, kernels)
    print("parity dense ", float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                                 - b.astype(jnp.float32)))))
    print("parity shift ", float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                                 - c.astype(jnp.float32)))))
    for G in (8, 16):
        d = make_chain_blocked(G)(x, kernels)
        print(f"parity blk{G} ", float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - d.astype(jnp.float32)))))

    timeit("3x dw downs fwd+bwd XLA grouped", chain_grouped, x, kernels)
    timeit("3x dw downs fwd+bwd masked dense", chain_dense, x, kernels)
    timeit("3x dw downs fwd+bwd blocked G=8", make_chain_blocked(8), x, kernels)
    timeit("3x dw downs fwd+bwd blocked G=16", make_chain_blocked(16), x, kernels)
    if os.environ.get("PB_SHIFT"):
        timeit("3x dw downs fwd+bwd shift-multiply", chain_shift, x, kernels)


if __name__ == "__main__":
    main()
