"""fwd+bwd A/B of the decoder's ConvTranspose2d(5, s2, p2, op1) lowering at
every decoder stage shape (per-frame batched, bs16 -> 64 frames):
  dilated — lax.conv_transpose-equivalent (current: lhs-dilated conv)
  phase   — phase-packed 3x3 conv + sub-pixel shuffle (rejected for
            inference fwd, but its BACKWARD is a standard conv bwd while
            the dilated form's wgrad walks an lhs-dilated window)
Grads taken wrt x AND kernel (the model trains the kernel)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smow_net_tpu.ops import convops

ITERS = int(os.environ.get("PB_ITERS", "10"))
bf = jnp.bfloat16
BT = 64  # bs16 x T=4 frames


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            g = jax.grad(lambda a, kk: jnp.sum(
                fn(a, kk).astype(jnp.float32) ** 2) * 1e-9,
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
    print(f"{label:44s} {ms:8.3f} ms", flush=True)


def main():
    r, k = jax.random.normal, jax.random.PRNGKey
    # (h, Cin, F) per decoder ConvTrans stage
    shapes = [(4, 256, 256), (8, 128, 128), (16, 64, 64), (32, 64, 64),
              (64, 32, 32)]
    only = os.environ.get("PB_ONLY", "")
    for i, (h, cin, f) in enumerate(shapes):
        if only and str(i) not in only.split(","):
            continue
        x = r(k(i), (BT, h, h, cin), bf)
        kd = r(k(10 + i), (5, 5, cin, f), bf) * 0.05

        a = convops.conv_transpose(x, kd, 2, 2, 1)
        b = convops.conv_transpose_s2_phase(x, kd)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"stage {i} ({h}->{2*h}, {cin}->{f}) parity {err:.2e}")
        timeit(f"  dilated {h}^2 {cin}->{f}",
               lambda xx, kk: convops.conv_transpose(xx, kk, 2, 2, 1), x, kd)
        timeit(f"  phase   {h}^2 {cin}->{f}",
               convops.conv_transpose_s2_phase, x, kd)


if __name__ == "__main__":
    main()
