"""Stage-by-stage fwd+bwd timing of SMOW_Net on TPU (bf16 compute, fp32
params, batch 16, 256x256): value_and_grad through each stage standalone,
in-graph loop methodology. Locates where the 2.4x bwd/fwd ratio lives."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))
ITERS = int(os.environ.get("PB_ITERS", "10"))
PEAK = 197e12


def timeit(label, module, *args, train_kw=True):
    kw = {"train": True} if train_kw else {}
    init_kw = {"train": False} if train_kw else {}
    variables = module.init(jax.random.PRNGKey(0), *args, **init_kw)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def loss_fn(p, x0, rest):
        p = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), p)
        vs = {"params": p}
        mut = []
        if stats:
            vs["batch_stats"] = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.bfloat16), stats)
            mut = ["batch_stats"]
        out = module.apply(vs, x0, *rest, **kw, mutable=mut)
        if mut:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves) * 1e-9

    # paramless pieces (bare warps/einsums): differentiate w.r.t. inputs
    argnums = 0 if params else (1, 2)

    def loop(*xs):
        def body(_, carry):
            g = jax.grad(loss_fn, argnums=argnums)(
                params, xs[0] + carry.astype(xs[0].dtype), xs[1:])
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(g)).astype(
                jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    try:
        cost = c.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        byts = float(cost.get("bytes accessed", float("nan")))
    except Exception:
        flops = byts = float("nan")
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    mfu = flops * ITERS / dt / PEAK
    gb = byts * ITERS / dt / 1e9
    print(f"{label:34s} {ms:8.2f} ms  {flops/1e9:8.1f} GF  mfu {mfu*100:5.1f}%"
          f"  {byts/1e6:8.1f} MB {gb:6.0f} GB/s ({gb/819*100:4.1f}%)",
          flush=True)


def main():
    import flax.linen as nn

    impl = os.environ.get("PB_FOLDED", "")
    if impl:
        from smow_net_tpu.nn import resnet3d

        resnet3d.set_folded_impl("auto", auto_train=impl)

    from smow_net_tpu.models.smow_net import (
        OFW, ConvBlock23d, ConvTransBlock3d, PixelTransformerDecoder,
        TokenTransformerEncoder)
    from smow_net_tpu.nn.resnet3d import ResNet3D
    from smow_net_tpu.ops.pooling import max_pool

    from smow_net_tpu.models.smow_net import _cat_folded, ofw_tokens_fused

    H = SIZE
    bf = jnp.bfloat16
    r = jax.random.normal
    k = jax.random.PRNGKey
    only = os.environ.get("PB_ONLY", "")
    full = only == ""

    # T-folded inputs everywhere — the layouts the real train step uses
    x = r(k(0), (BS, H, H, 6), bf)
    if full or only == "enc":
        timeit("resnet3d encoder (folded)", ResNet3D(), x)

    x0r = r(k(2), (BS, 2, H // 2, H // 2, 32), bf)

    class FusedOFWTok(nn.Module):
        @nn.compact
        def __call__(self, a, train=True):
            return ofw_tokens_fused(OFW(32, name="ofw"),
                                    TokenTransformerEncoder(32, name="te"),
                                    a, train)

    if full or only == "ofwtok":
        timeit("OFW+tokens fused (model path)", FusedOFWTok(), x0r)

    if only == "ofwparts":
        from smow_net_tpu.ops.warp import flow_warp, flow_warp_transpose

        class FlowOnly(nn.Module):
            @nn.compact
            def __call__(self, a, train=True):
                return OFW(32, name="ofw").flow(a, train)

        timeit("  OFW flow() only", FlowOnly(), x0r)

        s2 = H // 2
        a8 = r(k(40), (2 * BS, s2, s2, 8), bf)
        fl8 = r(k(41), (2 * BS, s2, s2, 2), bf) * 3.0

        class W8(nn.Module):
            @nn.compact
            def __call__(self, a, f):
                return flow_warp(a, f)

        timeit("  warp fwd C=8", W8(), a8, fl8, train_kw=False)

        class WT8(nn.Module):
            @nn.compact
            def __call__(self, a, f):
                return flow_warp_transpose(a, f)

        timeit("  warp scat C=8", WT8(), a8, fl8, train_kw=False)

        class Pool2(nn.Module):
            @nn.compact
            def __call__(self, att, f0):
                return jnp.einsum("btnl,bnc->btlc", att, f0)

        att = r(k(43), (BS, 2, s2 * s2, 8), bf)
        f0 = r(k(44), (BS, s2 * s2, 32), bf)
        timeit("  pool einsum", Pool2(), att, f0, train_kw=False)

    from smow_net_tpu.models.smow_net import _lift24_folded

    class Decoder(nn.Module):
        # mirrors SMOWNet's composition under the liftfold default: skips
        # arrive PRE-lift (T=2-folded) as pairs; only the seed is lifted
        @nn.compact
        def __call__(self, f1, f2, f3, f4, x0, train=True):
            y = max_pool(_lift24_folded(f4), (2, 2), (2, 2))
            y = ConvTransBlock3d(256, name="C3DT1")(y, train)
            y = ConvBlock23d(128, name="C3D1")((y, f4), train)
            y = ConvTransBlock3d(128, name="C3DT2")(y, train)
            y = ConvBlock23d(64, name="C3D2")((y, f3), train)
            y = ConvTransBlock3d(64, name="C3DT3")(y, train)
            y = ConvBlock23d(64, name="C3D3")((y, f2), train)
            y = ConvTransBlock3d(64, name="C3DT4")(y, train)
            y = ConvBlock23d(32, name="C3D4")((y, f1), train)
            y = ConvTransBlock3d(32, name="C3DT5")(y, train)
            y = ConvBlock23d(32, name="C3D5")((y, x0), train)
            return y

    s = H // 2
    f1 = r(k(4), (BS, s // 2, s // 2, 2 * 32), bf)
    f2 = r(k(5), (BS, s // 4, s // 4, 2 * 64), bf)
    f3 = r(k(6), (BS, s // 8, s // 8, 2 * 128), bf)
    f4 = r(k(7), (BS, s // 16, s // 16, 2 * 256), bf)
    x0l = r(k(8), (BS, s, s, 2 * 32), bf)
    if full or only == "dec":
        timeit("3D U-Net decoder folded (5 stages)", Decoder(),
               f1, f2, f3, f4, x0l)

    y = r(k(9), (BS, s, s, 4 * 32), bf)
    m = r(k(10), (BS, 8, 128), bf)
    if full or only == "xattn":
        timeit("pixel cross-attn decoder",
               PixelTransformerDecoder(128, folded_input=True), y, m,
               train_kw=False)


if __name__ == "__main__":
    main()
