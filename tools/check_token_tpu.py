"""On-TPU parity check for the fused token-warp kernel
(ops/pallas/warp.token_scatter_pallas) vs the unfused XLA chain
(warp -> exp(. - max_n a) -> scatter + row sums) at the flagship OFW token
shapes (C = token_len = 8), fwd and grads, f32 and bf16."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smow_net_tpu.ops.pallas.warp import token_scatter_pallas
from smow_net_tpu.ops.warp import grid_sample

B, H, W, C = 8, 128, 128, 8


def ref_chain(a, grid):
    m = jax.lax.stop_gradient(jnp.max(a, axis=(1, 2), keepdims=True))
    aw = grid_sample(a, grid, "border", True)
    eaw = jnp.exp(aw - m)
    x0 = jnp.zeros(a.shape, a.dtype)
    _, vjpf = jax.vjp(lambda x: grid_sample(x, grid, "border", True), x0)
    return vjpf(eaw)[0], jnp.sum(eaw, axis=(1, 2))


for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
    name = "f32" if dtype == jnp.float32 else "bf16"
    a = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                          jnp.float32).astype(dtype)
    grid = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2),
                              jnp.float32, -1.2, 1.2)
    ew_r, z_r = jax.jit(ref_chain)(a, grid)
    ew_p, z_p = jax.jit(lambda a, g: token_scatter_pallas(a, g))(a, grid)
    for tag, got, want in (("ew", ew_p, ew_r), ("zaw", z_p, z_r)):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        print(f"{name} {tag}: rel_err={err:.3e}", flush=True)
        assert err < tol, (name, tag, err)
print("TOKEN_TPU_FWD_OK", flush=True)

a = jax.random.normal(jax.random.PRNGKey(2), (4, H, W, C), jnp.float32)
grid = jax.random.uniform(jax.random.PRNGKey(3), (4, H, W, 2),
                          jnp.float32, -1.2, 1.2)
r1 = jax.random.normal(jax.random.PRNGKey(4), a.shape)
r2 = jax.random.normal(jax.random.PRNGKey(5), (4, C))


def loss(f):
    def inner(a, g):
        ew, z = f(a, g)
        return jnp.sum(ew * r1) + jnp.sum(z * r2)
    return jax.jit(jax.grad(inner, argnums=(0, 1)))


gp = loss(lambda a, g: token_scatter_pallas(a, g))(a, grid)
gr = loss(ref_chain)(a, grid)
for tag, got, want in (("da", gp[0], gr[0]), ("dgrid", gp[1], gr[1])):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"grad {tag}: rel_err={err:.3e}", flush=True)
    assert err < 1e-4, (tag, err)
print("TOKEN_TPU_GRAD_OK", flush=True)
