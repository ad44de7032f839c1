"""SMOW_Net_LW roofline probe (VERDICT r2 weak #2): per-stage INFERENCE
timing with XLA-counted FLOPs AND bytes-accessed, reporting achieved
TFLOP/s vs the v5e bf16 peak (197) and achieved GB/s vs HBM peak (819).

The LW model is depthwise-separable: its backbone's dw convs do ~9 MACs per
activation byte, so the binding resource is HBM bandwidth, not the MXU —
MFU is the wrong ceiling. A stage running at >=60-70% of HBM peak is at its
roofline regardless of its MFU.

In-graph loop + full-output consumption methodology (CLAUDE.md).

Usage: PB_ITERS=20 python tools/probe_lw_roofline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

BS = int(os.environ.get("PB_BS", "16"))
SIZE = int(os.environ.get("PB_SIZE", "256"))
ITERS = int(os.environ.get("PB_ITERS", "20"))
PEAK_F = 197e12
PEAK_B = 819e9

bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey


def timeit(label, module, *args):
    variables = module.init(k(0), *args)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(bf) if p.dtype == jnp.float32 else p, variables)

    def loop(*xs):
        def body(_, carry):
            out = module.apply(variables, xs[0] + carry.astype(xs[0].dtype),
                               *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves) * 1e-9

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    byts = float(cost.get("bytes accessed", float("nan")))
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    tf = flops * ITERS / dt / 1e12
    gb = byts * ITERS / dt / 1e9
    print(f"{label:28s} {ms:7.2f} ms  {flops/1e9:7.1f} GF {byts/1e6:8.1f} MB"
          f"  {tf:6.1f} TF/s ({tf/197*100:4.1f}%)  {gb:6.0f} GB/s"
          f" ({gb/819*100:4.1f}%)", flush=True)


def main():
    from smow_net_tpu.models.smow_net import (OFW, PixelTransformerDecoder,
                                              TokenTransformerEncoder,
                                              ofw_tokens_fused)
    from smow_net_tpu.models.smow_net_lw import ConvBlockLW, ConvTransBlockLW
    from smow_net_tpu.nn.mobilenetv2 import MobileNetV2
    from smow_net_tpu.nn.resnet3d import unfold_t
    from smow_net_tpu.models.smow_net import _cat_folded
    from smow_net_tpu.ops.pooling import max_pool

    H = SIZE

    class Backbone(nn.Module):
        @nn.compact
        def __call__(self, x):
            # eval-mode single (2B)-batched pass, as the model runs it
            return MobileNetV2(name="backbone")(x, False)

    x2b = r(k(0), (2 * BS, H, H, 3), bf)
    timeit("backbone (2B)-batched", Backbone(), x2b)

    class FusedOFWTok(nn.Module):
        @nn.compact
        def __call__(self, a):
            return ofw_tokens_fused(OFW(16, name="ofw"),
                                    TokenTransformerEncoder(16, name="te"),
                                    a, False)

    s = H // 2
    x0 = r(k(2), (BS, 2, s, s, 16), bf)
    timeit("OFW+tokens fused", FusedOFWTok(), x0)

    from smow_net_tpu.models.smow_net import _lift24_folded

    class Decoder(nn.Module):
        # mirrors SMOWNetLW under the liftfold default: pre-lift pair skips
        @nn.compact
        def __call__(self, f1, f2, f3, f4, x0l):
            y = max_pool(_lift24_folded(f4), (2, 2), (2, 2))
            y = ConvTransBlockLW(320, name="C3DT1")(y, False)
            y = ConvBlockLW(160, name="C3D1")((y, f4), False)
            y = ConvTransBlockLW(160, name="C3DT2")(y, False)
            y = ConvBlockLW(64, name="C3D2")((y, f3), False)
            y = ConvTransBlockLW(64, name="C3DT3")(y, False)
            y = ConvBlockLW(32, name="C3D3")((y, f2), False)
            y = ConvTransBlockLW(32, name="C3DT4")(y, False)
            y = ConvBlockLW(28, name="C3D4")((y, f1), False)
            y = ConvTransBlockLW(28, name="C3DT5")(y, False)
            y = ConvBlockLW(16, name="C3D5")((y, x0l), False)
            return y

    # LW backbone taps at 256²: x0 128²x16, f1 64²x24, f2 32²x32, f3 16²x96,
    # f4 8²x320 (MobileNetV2 stages), T=2-folded (pre-lift)
    f1 = r(k(4), (BS, s // 2, s // 2, 2 * 24), bf)
    f2 = r(k(5), (BS, s // 4, s // 4, 2 * 32), bf)
    f3 = r(k(6), (BS, s // 8, s // 8, 2 * 96), bf)
    f4 = r(k(7), (BS, s // 16, s // 16, 2 * 320), bf)
    x0l = r(k(8), (BS, s, s, 2 * 16), bf)
    timeit("LW decoder folded", Decoder(), f1, f2, f3, f4, x0l)

    y = r(k(9), (BS, s, s, 4 * 16), bf)
    m = r(k(10), (BS, 8, 64), bf)
    timeit("pixel cross-attn (64)",
           PixelTransformerDecoder(64, folded_input=True), y, m)


if __name__ == "__main__":
    main()
