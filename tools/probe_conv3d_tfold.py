"""Probe: 3x3x3 conv at decoder shapes — XLA native 3-D lowering vs an
exact dense T-into-channels rewrite.

The rewrite: out[t_o] = sum_dt k[dt] * in[t_o+dt-1] is a block-banded map
between T*Cin and T*Cout channels; embedding it in a dense (3,3,T*Cin,T*Cout)
2-D conv does 10/16 extra FLOPs at T=4/kt=3 but lifts output lanes from
Cout=32 to T*Cout=128 (full MXU lane width). Transposes to/from the
(B,H,W,T*C) layout are counted in the timing."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax import lax

from smow_net_tpu.ops.convops import _dim_numbers, conv

ITERS = int(os.environ.get("PC_ITERS", "20"))


def t_dense_kernel(kernel):
    """(kt, kh, kw, Cin, Cout) -> (kh, kw, T*Cin, T*Cout) block-banded."""
    kt, kh, kw, Cin, Cout = kernel.shape
    half = kt // 2
    T = 4
    K2 = jnp.zeros((kh, kw, T * Cin, T * Cout), kernel.dtype)
    for to in range(T):
        for dt in range(kt):
            ti = to + dt - half
            if 0 <= ti < T:
                K2 = K2.at[:, :, ti * Cin:(ti + 1) * Cin,
                           to * Cout:(to + 1) * Cout].set(kernel[dt])
    return K2


def bench(label, fn, *args):
    def loop(x, *rest):
        def body(_, carry):
            out = fn(x + carry.astype(x.dtype), *rest)
            return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {label}: {dt:.3f} ms", flush=True)
    return dt


for (B, T, H, Cin, Cout) in [(16, 4, 128, 64, 32), (16, 4, 128, 32, 32),
                             (16, 4, 64, 64, 32), (16, 4, 64, 128, 64)]:
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, H, Cin), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, Cin, Cout),
                          jnp.bfloat16) * 0.05
    print(f"shape B{B} T{T} {H}x{H} {Cin}->{Cout}:", flush=True)

    native = bench("native conv3d", lambda x, k: conv(x, k, 1, 1), x, k)

    K2 = t_dense_kernel(k)

    def tfold(x, K2):
        B, T, H, W, C = x.shape
        xt = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        y = lax.conv_general_dilated(
            xt, K2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=_dim_numbers(2),
            preferred_element_type=x.dtype)
        Cout = K2.shape[-1] // T
        return y.reshape(B, H, W, T, Cout).transpose(0, 3, 1, 2, 4)

    tf = bench("t-dense 2d conv", tfold, x, K2)

    ref = conv(x, k, 1, 1)
    out = tfold(x, K2)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    print(f"  rel err {err/sc:.2e}  speedup {native/tf:.2f}x", flush=True)
