"""On-TPU parity of the fused decoder-layer kernel vs the XLA path at model
shapes (N=16384, D=128, M=8, hidden=256): forward and all-14-input grads,
bf16 and f32. Records the numbers quoted in PARITY.md."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smow_net_tpu.ops import xattn

B, N, D, H_, M_ = 4, 16384, 128, 8, 8


def inputs(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 14)
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
    w1 = jax.random.normal(ks[10], (D, 256), dtype) * 0.1
    b1 = jax.random.normal(ks[11], (256,), dtype) * 0.1
    w2 = jax.random.normal(ks[12], (256, D), dtype) * 0.1
    b2 = jax.random.normal(ks[13], (D,), dtype) * 0.1
    return (x, ln1_s, ln1_b, wq, k, v, wo, bo, ln2_s, ln2_b, w1, b1, w2, b2)


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)


def main():
    for dtype in (jnp.bfloat16, jnp.float32):
        args = inputs(dtype)
        cot = jax.random.normal(jax.random.PRNGKey(9), (B, N, D), jnp.float32)

        def loss(*a, impl):
            xattn.set_xattn_impl(impl)
            y = xattn.cross_layer_head1_auto(*a, scale=D ** -0.5, perm=None)
            return jnp.sum(y.astype(jnp.float32) * cot)

        f_ref = jax.jit(lambda *a: xattn.cross_layer_head1(
            *a, scale=D ** -0.5, perm=None))
        xattn.set_xattn_impl("pallas")
        f_pal = jax.jit(lambda *a: xattn.cross_layer_head1_auto(
            *a, scale=D ** -0.5, perm=None))
        y_ref = f_ref(*args)
        y_pal = f_pal(*args)
        # CPU f32 oracle: TPU's default-precision XLA matmuls truncate f32
        # operands to bf16, so the on-TPU "reference" is itself inexact —
        # judge both against exact-f32 CPU math.
        cpu = jax.devices("cpu")[0]
        args_cpu = jax.tree_util.tree_map(
            lambda t: jax.device_put(np.asarray(t, np.float32), cpu), args)
        with jax.default_device(cpu):
            y_cpu = jax.jit(lambda *a: xattn.cross_layer_head1(
                *a, scale=D ** -0.5, perm=None))(*args_cpu)
        print(f"{dtype.__name__} fwd rel pallas-vs-xla {rel(y_pal, y_ref):.2e}"
              f"  pallas-vs-cpu {rel(y_pal, y_cpu):.2e}"
              f"  xla-vs-cpu {rel(y_ref, y_cpu):.2e}", flush=True)

        g_ref = jax.jit(jax.grad(
            lambda *a: loss(*a, impl="xla"),
            argnums=tuple(range(14))))(*args)
        g_pal = jax.jit(jax.grad(
            lambda *a: loss(*a, impl="pallas"),
            argnums=tuple(range(14))))(*args)
        worst = max(rel(p, r) for p, r in zip(g_pal, g_ref))
        print(f"{dtype.__name__} grad worst rel {worst:.2e}", flush=True)
        xattn.set_xattn_impl("auto")


if __name__ == "__main__":
    main()
