"""Where does the folded ResNet3D encoder's time go, and is grouped conv
(feature_group_count=2, frame-tiled kernels) the right lowering?

A/Bs (bf16, in-graph sequential loop, full-output consumption):
  * whole encoder, stem alone, each stage alone;
  * per-stage spatial conv: grouped G=2 vs block-diagonal dense (2x FLOPs,
    full lanes) vs frame-batched dense (transpose T into batch);
  * stem: current per-frame 7x7 s2 (Cin=3) vs space-to-depth 4x4 s1 (Cin=12).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
from jax import lax

BS = int(os.environ.get("PB_BS", "16"))
ITERS = int(os.environ.get("PB_ITERS", "20"))
PEAK = 197e12
bf = jnp.bfloat16
DN4 = ("NHWC", "HWIO", "NHWC")


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return (s * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    try:
        cost = c.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    mfu = flops * ITERS / dt / PEAK
    print(f"{label:44s} {ms:8.3f} ms  {flops/1e9:8.1f} GF  mfu {mfu*100:5.1f}%",
          flush=True)
    return ms


def main():
    r = jax.random.normal
    k = jax.random.PRNGKey
    which = os.environ.get("PB_WHICH", "all")

    if which in ("all", "stages"):
        from smow_net_tpu.nn.resnet3d import ResNet3D, BasicBlock3d

        x = r(k(0), (BS, 256, 256, 6), bf)
        enc = ResNet3D()
        v = enc.init(k(1), x, False)
        v = jax.tree_util.tree_map(
            lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, v)
        timeit("encoder whole (folded)", lambda a: enc.apply(v, a, False), x)

        timeit("encoder stem only",
               lambda a: enc.apply(v, a, False, method=ResNet3D.stem_forward), x)

        shapes = [(64, 64, 64, 1), (64, 64, 128, 2), (128, 32, 256, 2),
                  (256, 16, 512, 2)]
        for i, (cin, hw, cout, s0) in enumerate(shapes):
            xi = r(k(2 + i), (BS, hw, hw, 2 * cin), bf)

            import flax.linen as nn

            class St(nn.Module):
                @nn.compact
                def __call__(self, a, train=False):
                    a = BasicBlock3d(cout, s0, name="b0")(a, train)
                    return BasicBlock3d(cout, 1, name="b1")(a, train)

            st = St()
            vs = st.init(k(10 + i), xi)
            vs = jax.tree_util.tree_map(
                lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, vs)
            timeit(f"layer{i+1} (2 blocks, {cin}->{cout})",
                   lambda a, _st=st, _v=vs: _st.apply(_v, a), xi)

    if which in ("all", "convs"):
        # spatial-conv lowering A/B at each stage's dominant shape
        for cin, hw in [(64, 64), (128, 32), (256, 16), (512, 8)]:
            xg = r(k(20), (BS, hw, hw, 2 * cin), bf)
            kg = r(k(21), (3, 3, cin, 2 * cin), bf) * 0.05  # frame-tiled
            timeit(f"conv {cin}ch {hw}^2 grouped G=2",
                   lambda a, _k=kg: lax.conv_general_dilated(
                       a, _k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN4,
                       feature_group_count=2), xg)

            kd = r(k(22), (3, 3, 2 * cin, 2 * cin), bf) * 0.05  # block-diag dense
            timeit(f"conv {cin}ch {hw}^2 dense blockdiag",
                   lambda a, _k=kd: lax.conv_general_dilated(
                       a, _k, (1, 1), [(1, 1), (1, 1)],
                       dimension_numbers=DN4), xg)

            xb = r(k(23), (2 * BS, hw, hw, cin), bf)
            kb = r(k(24), (3, 3, cin, cin), bf) * 0.05
            timeit(f"conv {cin}ch {hw}^2 frame-batched dense",
                   lambda a, _k=kb: lax.conv_general_dilated(
                       a, _k, (1, 1), [(1, 1), (1, 1)],
                       dimension_numbers=DN4), xb)

            def grouped_via_transpose(a, _k=kb):
                B, H, W, TC = a.shape
                z = a.reshape(B, H, W, 2, TC // 2).transpose(0, 3, 1, 2, 4)
                z = z.reshape(2 * B, H, W, TC // 2)
                z = lax.conv_general_dilated(
                    z, _k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN4)
                C2 = z.shape[-1]
                z = z.reshape(B, 2, H, W, C2).transpose(0, 2, 3, 1, 4)
                return z.reshape(B, H, W, 2 * C2)
            timeit(f"conv {cin}ch {hw}^2 transpose+batched+back",
                   grouped_via_transpose, xg)

    if which in ("all", "stem"):
        # stem A/B: per-frame 7x7 s2 Cin=3 vs space-to-depth 4x4 s1 Cin=12
        xs = r(k(30), (2 * BS, 256, 256, 3), bf)
        k7 = r(k(31), (7, 7, 3, 64), bf) * 0.05
        timeit("stem conv 7x7 s2 Cin=3 (current)",
               lambda a, _k=k7: lax.conv_general_dilated(
                   a, _k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=DN4), xs)

        # exact rewrite: pad k7 to 8x8 at offset (1,1); out[i]=sum_u k8[u] x[2i+u-4]
        k8 = jnp.zeros((8, 8, 3, 64), bf).at[1:8, 1:8].set(k7)
        # s2d view: x2[j, d] = x[2j+d]; window u=2p+d -> 4 taps p in [-2..1]
        k4 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 4 * 3, 64)  # (p_h, p_w, (dh,dw,c), out)

        def s2d_stem(a, _k=k4):
            B, H, W, C = a.shape
            z = a.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
            z = z.reshape(B, H // 2, W // 2, 4 * C)
            return lax.conv_general_dilated(
                z, _k, (1, 1), [(2, 1), (2, 1)], dimension_numbers=DN4)
        timeit("stem s2d conv 4x4 s1 Cin=12", s2d_stem, xs)

        # parity check (f32, CPU-precision tolerances don't matter on-device)
        a = r(k(32), (2, 256, 256, 3), jnp.float32)
        kf = r(k(33), (7, 7, 3, 64), jnp.float32) * 0.05
        ref = lax.conv_general_dilated(a, kf, (2, 2), [(3, 3), (3, 3)],
                                       dimension_numbers=DN4)
        k8f = jnp.zeros((8, 8, 3, 64), jnp.float32).at[1:8, 1:8].set(kf)
        k4f = k8f.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        k4f = k4f.reshape(4, 4, 12, 64)
        B, H, W, C = a.shape
        z = a.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(B, H // 2, W // 2, 4 * C)
        got = lax.conv_general_dilated(z, k4f, (1, 1), [(2, 1), (2, 1)],
                                       dimension_numbers=DN4)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"s2d stem parity rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
