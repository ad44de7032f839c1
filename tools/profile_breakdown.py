"""Stage-by-stage timing of SMOW_Net inference on TPU (bf16, batch 16,
256x256): each stage is compiled standalone with the in-graph sequential-
loop methodology (CLAUDE.md) so its share of the 464-pairs/s forward and its
achieved FLOP/s are visible. Decides where the next kernel/fusion goes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))
ITERS = int(os.environ.get("PB_ITERS", "20"))
PEAK = 197e12
PEAK_B = 819  # GB/s, v5e HBM


def timeit(label, module, *args, train_kw=True):
    """module(*args [, train=False]) timed with an in-graph fori_loop that
    feeds a scalar carry back into the first arg (full-output consumption)."""
    kw = {"train": False} if train_kw else {}
    variables = module.init(jax.random.PRNGKey(0), *args, **kw)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables)

    def loop(*xs):
        def body(_, carry):
            out = module.apply(variables, xs[0] + carry.astype(xs[0].dtype),
                               *xs[1:], **kw)
            if isinstance(out, tuple):
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            else:
                s = jnp.mean(out.astype(jnp.float32))
            return (s * 1e-9).astype(jnp.float32)
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
    float(c(*args))  # warm
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    mfu = flops * ITERS / dt / PEAK
    gb = byts * ITERS / dt / 1e9
    print(f"{label:34s} {ms:8.2f} ms  {flops/1e9:8.1f} GF  mfu {mfu*100:5.1f}%"
          f"  {byts/1e6:8.1f} MB {gb:6.0f} GB/s ({gb/PEAK_B*100:4.1f}%)",
          flush=True)
    return ms


def main():
    import flax.linen as nn

    impl = os.environ.get("PB_CONV3D")
    if impl:
        from smow_net_tpu.ops.convops import set_conv3d_impl
        set_conv3d_impl(impl)

    from smow_net_tpu.models.smow_net import (
        OFW, BasicConv3d, ConvBlock23d, ConvTransBlock3d,
        PixelTransformerDecoder, TokenTransformerEncoder)
    from smow_net_tpu.nn.resnet3d import ResNet3D
    from smow_net_tpu.ops.pixel_shuffle import smow_shuffle
    from smow_net_tpu.ops.pooling import max_pool
    from smow_net_tpu.ops.resize import resize_linear

    H = SIZE
    bf = jnp.bfloat16
    r = jax.random.normal
    k = jax.random.PRNGKey
    only = os.environ.get("PB_ONLY", "")
    full = only == ""

    x = r(k(0), (BS, H, H, 6), bf)  # T-folded pair
    if full:
        timeit("resnet3d encoder (folded)", ResNet3D(), x)

    x0 = r(k(1), (BS, H // 2, H // 2, 2 * 64), bf)
    if full:
        timeit("Conv3d reduce (64->32 @128)", BasicConv3d(32), x0)

    x0r = r(k(2), (BS, 2, H // 2, H // 2, 32), bf)
    if full:
        timeit("OFW (flow conv + 2 warps)", OFW(32), x0r)

    t4 = r(k(3), (BS, 4, H // 2, H // 2, 32), bf)
    if full:
        timeit("token transformer encoder", TokenTransformerEncoder(32), t4,
               train_kw=False)

    from smow_net_tpu.models.smow_net import ofw_tokens_fused

    class FusedOFWTok(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return ofw_tokens_fused(OFW(32, name="ofw"),
                                    TokenTransformerEncoder(32, name="te"),
                                    x, train)

    class FlowOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return OFW(32, name="ofw").flow(x, train)

    if full or only == "ofwtok":
        timeit("OFW+tokens fused (model path)", FusedOFWTok(), x0r)
        timeit("  OFW flow() only", FlowOnly(), x0r)

    if only == "ofwparts":
        from smow_net_tpu.ops.warp import flow_warp, flow_warp_transpose
        from smow_net_tpu.ops.pallas import warp as pwarp

        s2 = H // 2
        a8 = r(k(40), (2 * BS, s2, s2, 8), bf)
        fl8 = r(k(41), (2 * BS, s2, s2, 2), bf) * 3.0

        class W8(nn.Module):
            @nn.compact
            def __call__(self, a, f):
                return flow_warp(a, f)

        for tile in (256, 512, 1024):
            pwarp._TILE_P = tile
            timeit(f"  warp fwd  C=8 tile={tile}", W8(), a8, fl8,
                   train_kw=False)
        pwarp._TILE_P = 256

        class WT8(nn.Module):
            @nn.compact
            def __call__(self, a, f):
                return flow_warp_transpose(a, f)

        for tile in (128, 512, 1024):
            pwarp._TILE_P_T = tile
            timeit(f"  warp scat C=8 tile={tile}", WT8(), a8, fl8,
                   train_kw=False)
        pwarp._TILE_P_T = 512

        lg = r(k(42), (BS, 4, s2 * s2, 8), bf)

        class SM(nn.Module):
            @nn.compact
            def __call__(self, a):
                return jax.nn.softmax(a, axis=2)

        timeit("  softmax over 16k (B,4,n,8)", SM(), lg, train_kw=False)

        att = r(k(43), (BS, 2, s2 * s2, 8), bf)
        f0 = r(k(44), (BS, s2 * s2, 32), bf)

        class Pool(nn.Module):
            @nn.compact
            def __call__(self, a, f):
                return jnp.einsum("btnl,bnc->btlc", a, f)

        timeit("  pool einsum (B,2,n,8)x(B,n,32)", Pool(), att, f0,
               train_kw=False)

    from smow_net_tpu.models.smow_net import _lift24_folded

    class Decoder(nn.Module):
        # mirrors SMOWNet's composition under the liftfold default: skips
        # arrive PRE-lift (T=2-folded) as pairs; only the seed is lifted
        @nn.compact
        def __call__(self, f1, f2, f3, f4, x0, train=False):
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
        timeit("3D U-Net decoder folded (5 stages)", Decoder(), f1, f2, f3, f4, x0l)

    if only == "dparts":
        class TransOnly(nn.Module):
            @nn.compact
            def __call__(self, f4, train=False):
                y = max_pool(f4, (2, 2), (2, 2))
                y = ConvTransBlock3d(256, name="T1")(y, train)
                y = ConvTransBlock3d(128, name="T2")(y, train)
                y = ConvTransBlock3d(64, name="T3")(y, train)
                y = ConvTransBlock3d(64, name="T4")(y, train)
                y = ConvTransBlock3d(32, name="T5")(y, train)
                return y

        f4 = r(k(7), (BS, H // 32, H // 32, 4 * 256), bf)
        timeit("decoder ConvTrans blocks only (x5)", TransOnly(), f4)

        class ConvsOnly(nn.Module):
            @nn.compact
            def __call__(self, a, b, c, d, e, train=False):
                return (ConvBlock23d(128, name="C1")(a, train),
                        ConvBlock23d(64, name="C2")(b, train),
                        ConvBlock23d(64, name="C3")(c, train),
                        ConvBlock23d(32, name="C4")(d, train),
                        ConvBlock23d(32, name="C5")(e, train))

        class BareConvT(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                # the five levels' per-frame transposed convs, chained, no
                # unfold/fold/mix/BN: isolates the lhs-dilated conv cost
                from smow_net_tpu.nn.layers import ConvParams
                from smow_net_tpu.ops import convops as cv
                y = x
                for i, (cin, f) in enumerate(
                        [(256, 256), (256, 128), (128, 64), (64, 64), (64, 32)]):
                    kern, _ = ConvParams((5, 5, cin, f), transpose_fan=True,
                                         name=f"k{i}")()
                    y = cv.conv_transpose(y, kern.astype(y.dtype), (2, 2),
                                          (2, 2), (1, 1))
                return y

        xb = r(k(8), (BS * 4, H // 64, H // 64, 256), bf)
        timeit("bare per-frame convT chain (x5)", BareConvT(), xb)

        s8 = H // 2
        ins = (r(k(20), (BS, s8 // 16, s8 // 16, 4 * 512), bf),
               r(k(21), (BS, s8 // 8, s8 // 8, 4 * 256), bf),
               r(k(22), (BS, s8 // 4, s8 // 4, 4 * 128), bf),
               r(k(23), (BS, s8 // 2, s8 // 2, 4 * 96), bf),
               r(k(24), (BS, s8, s8, 4 * 64), bf))
        timeit("decoder ConvBlock23d only (x5)", ConvsOnly(), *ins)

    y = r(k(9), (BS, s, s, 4 * 32), bf)
    m = r(k(10), (BS, 8, 128), bf)
    if full or only == "xattn":
        timeit("pixel cross-attn decoder", PixelTransformerDecoder(128, folded_input=True),
               y, m, train_kw=False)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, y):
            from smow_net_tpu.nn.layers import Conv
            y = Conv(4, 1, use_bias=False, name="classifier_conv")(y)
            return nn.sigmoid(smow_shuffle(y, 2))

    yq = r(k(11), (BS, s, s, 128), bf)
    if full:
        timeit("classifier head + shuffle", Head(), yq, train_kw=False)

    # under the liftfold default only the decoder-seed lift remains (the
    # four skip lifts are composed into the ConvBlock23d kernels)
    class Lift(nn.Module):
        @nn.compact
        def __call__(self, a):
            from smow_net_tpu.models.smow_net import _lift24_folded
            return _lift24_folded(a)

    l4 = r(k(16), (BS, s // 16, s // 16, 2 * 256), bf)
    if full:
        timeit("temporal lift (seed only)", Lift(), l4, train_kw=False)

    if os.environ.get("PB_XATTN", "0") == "1":
        from smow_net_tpu.nn.layers import (
            CrossAttentionBlock, Dense, FeedForward, layer_norm)

        N = (H // 2) * (H // 2)
        q128 = r(k(30), (BS, N, 128), bf)
        m8 = r(k(31), (BS, 8, 128), bf)

        class LN(nn.Module):
            @nn.compact
            def __call__(self, x):
                return layer_norm(name="n")(x)

        timeit("  xattn/layernorm 16k x 128", LN(), q128, train_kw=False)

        class QKV(nn.Module):
            @nn.compact
            def __call__(self, x, m):
                return (Dense(8, use_bias=False, name="q")(x),
                        Dense(8, use_bias=False, name="k")(m),
                        Dense(8, use_bias=False, name="v")(m))

        timeit("  xattn/to_q+k+v", QKV(), q128, m8, train_kw=False)

        class Core(nn.Module):
            @nn.compact
            def __call__(self, x, m):
                return CrossAttentionBlock(128, 8, 1, name="a")(x, m)

        timeit("  xattn/core(+proj)", Core(), q128, m8, train_kw=False)

        class FF(nn.Module):
            @nn.compact
            def __call__(self, x):
                return FeedForward(128, 256, name="ff")(x)

        timeit("  xattn/ffn 128->256->128", FF(), q128, train_kw=False)

    if os.environ.get("PB_OFW", "0") == "1":
        from smow_net_tpu.nn.layers import Conv as LConv
        from smow_net_tpu.nn.layers import batch_norm
        from smow_net_tpu.ops.warp import flow_warp, grid_sample
        from smow_net_tpu.ops.pallas.warp import grid_sample_pallas

        class Down3(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = x
                for i in range(3):
                    y = LConv(32, 3, (1, 2, 2), 1, groups=32,
                              name=f"down{i}_conv")(y)
                    y = batch_norm(f"down{i}_bn")(y, use_running_average=True)
                    y = nn.relu(y)
                return y

        timeit("  OFW/down convs (3 dw)", Down3(), x0r)

        class LiftBack(nn.Module):
            @nn.compact
            def __call__(self, y):
                return resize_linear(y, (2, s, s), (1, 2, 3),
                                     align_corners=True)

        yc = r(k(20), (BS, 2, s // 8, s // 8, 32), bf)
        timeit("  OFW/trilinear lift", LiftBack(), yc, train_kw=False)

        class FlowMake(nn.Module):
            @nn.compact
            def __call__(self, xy):
                return LConv(2, 3, 1, 1, use_bias=False, name="flow_make")(xy)

        xy = r(k(21), (BS, 2, s, s, 64), bf)
        timeit("  OFW/flow conv 3x3x3", FlowMake(), xy, train_kw=False)

        class Warp2(nn.Module):
            @nn.compact
            def __call__(self, x, flow):
                return (flow_warp(x[:, 0], flow[:, 0]),
                        flow_warp(x[:, 1], flow[:, 1]))

        fl = r(k(22), (BS, 2, s, s, 2), bf)
        timeit("  OFW/2 warps (auto)", Warp2(), x0r, fl, train_kw=False)


if __name__ == "__main__":
    main()
