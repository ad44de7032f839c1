"""Why is a pallas pass-through copy over (16,16384,128) bf16 only ~90GB/s?
Time copy-kernel variants: grid semantics, 3D-vs-2D operand, tile size.
Informs the fused decoder-layer kernel's pipeline configuration."""
import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, D = 16, 16384, 128


def copy3(x_ref, out_ref):
    out_ref[0] = x_ref[0]


def copy2(x_ref, out_ref):
    out_ref[...] = x_ref[...]


def run(label, f, args):
    def loop(*xs):
        def body(_, carry):
            out = f(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            return (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / 20 * 1e3
    gbps = 2 * B * N * D * 2 / (dt / 20) / 1e9
    print(f"{label:44s} {ms:7.3f} ms  {gbps:6.0f} GB/s", flush=True)


def main():
    x3 = jax.random.normal(jax.random.PRNGKey(0), (B, N, D), jnp.bfloat16)
    x2 = x3.reshape(B * N, D)

    def v3(sem, tn):
        return pl.pallas_call(
            copy3, grid=(B, N // tn),
            in_specs=[pl.BlockSpec((1, tn, D), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tn, D), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem))

    def v2(sem, tn):
        return pl.pallas_call(
            copy2, grid=(B * N // tn,),
            in_specs=[pl.BlockSpec((tn, D), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tn, D), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * N, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem))

    run("3D (par,arb) tn=1024", v3(("parallel", "arbitrary"), 1024), (x3,))
    run("3D (par,par) tn=1024", v3(("parallel", "parallel"), 1024), (x3,))
    run("2D (arb) tn=1024", v2(("arbitrary",), 1024), (x2,))
    run("2D (par) tn=1024", v2(("parallel",), 1024), (x2,))
    run("2D (par) tn=8192", v2(("parallel",), 8192), (x2,))
    run("xla identity-ish (x*1.0001)",
        jax.jit(lambda x: x * jnp.bfloat16(1.0001)), (x3,))


if __name__ == "__main__":
    main()
