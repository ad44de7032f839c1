"""A/B the depthwise-conv lowering (shift-multiply vs XLA grouped conv) at
the zoo's stride-1 shapes: SS2D's 3x3 dw (change_mamba), MobileNetV2's dw,
ELGCNet/ChangeFormer mixer dw.

VERDICT (v5e, bf16): within noise everywhere at stride 1, and the shift
form is 3.4x SLOWER for strided convs (tap slices relayout). XLA already
lowers depthwise convolutions to VPU elementwise work — the rewrite was
dropped from ops/convops.py; this probe reproduces the decision."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import itertools
import time

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PB_ITERS", "20"))
bf = jnp.bfloat16


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            s = jnp.mean(out.astype(jnp.float32))
            return (s * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:46s} {ms:8.3f} ms", flush=True)
    return ms


def dw_shift(x, kernel, stride, pad, dilation):
    """Depthwise conv as tap-shifted elementwise FMAs (exact rewrite)."""
    n = x.ndim - 2
    from smow_net_tpu.ops.convops import to_tuple
    stride, pad, dilation = (to_tuple(stride, n), to_tuple(pad, n),
                             to_tuple(dilation, n))
    ks = kernel.shape[:n]
    xp = jnp.pad(x, [(0, 0)] + [(p, p) for p in pad] + [(0, 0)])
    outs = [
        (xp.shape[1 + i] - dilation[i] * (ks[i] - 1) - 1) // stride[i] + 1
        for i in range(n)
    ]
    acc = None
    for taps in itertools.product(*(range(kk) for kk in ks)):
        sl = (slice(None),) + tuple(
            slice(taps[i] * dilation[i],
                  taps[i] * dilation[i] + (outs[i] - 1) * stride[i] + 1,
                  stride[i])
            for i in range(n)) + (slice(None),)
        term = xp[sl] * kernel[taps + (0,)]
        acc = term if acc is None else acc + term
    return acc


def main():
    from smow_net_tpu.ops import convops

    r, k = jax.random.normal, jax.random.PRNGKey
    cases = [
        ("ss2d dw 3x3 s1 C=192 64^2 B4", (4, 64, 64, 192), (3, 3, 1, 192), 1, 1),
        ("mbv2 dw 3x3 s1 C=192 32^2 B32", (32, 32, 32, 192), (3, 3, 1, 192), 1, 1),
        ("elgc dw 3x3 s1 C=48 64^2 B16", (16, 64, 64, 48), (3, 3, 1, 48), 1, 1),
        ("dw1d k4 s1 C=384 L=1024 B8", (8, 1024, 384), (4, 1, 384), 1, 3),
    ]
    for label, xs, ks, s, p in cases:
        x = r(k(0), xs, bf)
        w = r(k(1), ks, bf) * 0.1
        timeit(f"{label} [xla]",
               lambda a, _w=w, _s=s, _p=p, _g=xs[-1]:
               convops.conv(a, _w, _s, _p, 1, _g), x)
        timeit(f"{label} [shift]",
               lambda a, _w=w, _s=s, _p=p: dw_shift(a, _w, _s, _p, 1), x)


if __name__ == "__main__":
    main()
