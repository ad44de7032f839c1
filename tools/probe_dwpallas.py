"""A/B the Pallas s2d-phase depthwise stride-2 kernel vs the XLA grouped
lowering at the OFW flow-chain and MobileNetV2 stage-transition shapes
(fwd and fwd+bwd, calibrated chained-reps methodology as probe_dw2d).

VERDICT (v5e, 2026-08-18): XLA wins every shape —
  flow dw3d 128^2 C32    xla 0.461/1.395 ms   pallas 0.711/2.019
  flow dw3d  64^2 C32    xla 0.045/0.238      pallas 0.127/0.541
  flow dw3d  32^2 C32    xla 0.016/0.029      pallas 0.054/0.118
  mbv2 dw 112^2 C96 s2   xla 0.271/0.998      pallas 1.302/2.831
  mbv2 dw  56^2 C144 s2  xla 0.055/0.249      pallas 0.937/1.636
The stencil formulation's real cost is VMEM traffic for the shifted-operand
builds, not tap flops; XLA's grouped lowering is already near that floor.
Routing stays on XLA (convops._DW_IMPL = "xla")."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "20"))
REPS = 8
bf = jnp.bfloat16

# (label, B, T, H, W, C, kt)
SHAPES = [
    ("flow dw3d 128^2 C32", 16, 2, 128, 128, 32, 3),
    ("flow dw3d 64^2 C32", 16, 2, 64, 64, 32, 3),
    ("flow dw3d 32^2 C32", 16, 2, 32, 32, 32, 3),
    ("mbv2 dw 112^2 C96 s2", 32, 1, 112, 112, 96, 1),
    ("mbv2 dw 56^2 C144 s2", 32, 1, 56, 56, 144, 1),
]


def timeit(fn, *args, mode="fwd"):
    if mode == "fwd":
        def loop(*xs):
            def body(_, carry):
                return (fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                        * 1e-9).astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))
    else:
        def loop(*xs):
            def body(_, carry):
                g = jax.grad(lambda a, k: fn(a, k) * 1e-9, argnums=(0, 1))(
                    xs[0] + carry.astype(xs[0].dtype), xs[1])
                return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree_util.tree_leaves(g)).astype(
                    jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from smow_net_tpu.ops import convops

    for label, B, T, H, W, C, kt in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C), bf)
        k = jax.random.normal(jax.random.PRNGKey(1), (kt, 3, 3, 1, C), bf)

        def chain(a, kk, n=REPS):
            y = 0.0
            for i in range(n):
                y = y + jnp.sum(convops.conv(
                    jnp.roll(a, i, axis=2), kk, (1, 2, 2),
                    (kt // 2, 1, 1), groups=C).astype(jnp.float32) ** 2)
            return y

        def calib(a, kk):
            return chain(a, kk, 0) + jnp.sum(a.astype(jnp.float32) ** 2)

        out = {}
        for impl in ("xla", "pallas"):
            convops.set_dw_impl(impl)
            f0 = timeit(calib, x, k, mode="fwd")
            f = timeit(chain, x, k, mode="fwd")
            b0 = timeit(calib, x, k, mode="bwd")
            b = timeit(chain, x, k, mode="bwd")
            out[impl] = ((f - f0) / REPS, (b - b0) / REPS)
        convops.set_dw_impl("auto")
        # numerical parity at these shapes on hardware
        convops.set_dw_impl("xla")
        ref = convops.conv(x, k, (1, 2, 2), (kt // 2, 1, 1), groups=C)
        convops.set_dw_impl("pallas")
        got = convops.conv(x, k, (1, 2, 2), (kt // 2, 1, 1), groups=C)
        convops.set_dw_impl("auto")
        import numpy as np
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        print(f"{label:22s} xla {out['xla'][0]:6.3f}/{out['xla'][1]:6.3f} ms"
              f"  pallas {out['pallas'][0]:6.3f}/{out['pallas'][1]:6.3f} ms"
              f"  rel_err {err / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
