"""On-TPU parity check: grid_sample_pallas vs the XLA gather path at the
flagship OFW shapes, bf16 and f32, border/zeros x align flags."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smow_net_tpu.ops.pallas.warp import grid_sample_pallas
from smow_net_tpu.ops.warp import grid_sample

B, H, W, C = 16, 128, 128, 32

for dtype in (jnp.bfloat16, jnp.float32):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32).astype(dtype)
    grid = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2), jnp.float32, -1.2, 1.2)
    for pm in ("border", "zeros"):
        for ac in (True, False):
            ref = np.asarray(jax.jit(
                lambda x, g: grid_sample(x, g, pm, ac))(x, grid), np.float32)
            out = np.asarray(jax.jit(
                lambda x, g: grid_sample_pallas(x, g, pm, ac))(x, grid), np.float32)
            err = np.max(np.abs(out - ref))
            scale = np.max(np.abs(ref)) + 1e-9
            print(f"{np.dtype(np.float32).name if dtype==jnp.float32 else 'bf16'} "
                  f"{pm} ac={ac}: max_abs_err={err:.3e} (rel {err/scale:.3e})",
                  flush=True)
            tol = 1e-5 if dtype == jnp.float32 else 3e-2
            assert err / scale < tol, (dtype, pm, ac, err)
print("PALLAS_WARP_TPU_PARITY_OK", flush=True)


# grad parity (analytic kernel VJP vs XLA autodiff) at flagship shapes, fp32
def _gp():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, H, W, C), jnp.float32)
    grid = jax.random.uniform(jax.random.PRNGKey(3), (4, H, W, 2), jnp.float32, -1.2, 1.2)
    lp = jax.jit(jax.grad(lambda x, g: jnp.sum(grid_sample_pallas(x, g, "border", True) ** 2), argnums=(0, 1)))
    lx = jax.jit(jax.grad(lambda x, g: jnp.sum(grid_sample(x, g, "border", True) ** 2), argnums=(0, 1)))
    gp = lp(x, grid)
    gx = lx(x, grid)
    for name, a, b in [("dx", gp[0], gx[0]), ("dgrid", gp[1], gx[1])]:
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        print(f"grad {name}: rel_err={err:.3e}", flush=True)
        assert err < 1e-4, (name, err)

_gp()
print("PALLAS_WARP_TPU_GRAD_OK", flush=True)


# transpose-op VJP (fused _t_vjp_kernel) vs XLA autodiff at the fused OFW
# token shapes (C=8 pixel-side), fp32
def _tp():
    from smow_net_tpu.ops import warp as w

    Ct = 8
    g = jax.random.normal(jax.random.PRNGKey(4), (4, H, W, Ct), jnp.float32)
    flow = jax.random.normal(jax.random.PRNGKey(5), (4, H, W, 2), jnp.float32) * 3.0
    xbar = jax.random.normal(jax.random.PRNGKey(6), (4, H, W, Ct), jnp.float32)

    def loss(g, f):
        return jnp.sum(w.flow_warp_transpose(g, f) * xbar)

    gp = jax.jit(jax.grad(loss, argnums=(0, 1)))(g, flow)
    w.set_warp_impl("xla")
    try:
        gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(g, flow)
    finally:
        w.set_warp_impl("auto")
    for name, a, b in [("dg", gp[0], gx[0]), ("dflow", gp[1], gx[1])]:
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        print(f"transpose-vjp {name}: rel_err={err:.3e}", flush=True)
        assert err < 1e-4, (name, err)

_tp()
print("PALLAS_WARP_TPU_TVJP_OK", flush=True)
