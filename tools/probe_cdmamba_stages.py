"""Stage-by-stage cd_mamba INFERENCE budget at bench shapes (bs4 256² bf16
— the model's bench batch), answering VERDICT r3 #4: of the 20.7 pairs/s,
what fraction is scan kernel vs glue, and does the (batch, group) tiling
fill slabs at the full-res L=65536 / Di=32 scans?

Stages (reference compare/cd_mamba.py:190-370):
  convInit+enc0       1 SRCMBlock  @256², C=16  (2 ConvMamba, L=65536, Di=32)
  enc1                down + 2 blocks @128², C=32
  enc2                down + 2 blocks @64²,  C=64
  enc3                down + 4 blocks @32²,  C=128
  L_GF+G_GF stage 1   @256² C=16 (3+1 bidirectional scans x2 directions)
  L_GF+G_GF stage 2   @128² C=32
  decoder             3 up-stages (deepwise SRCMBlocks)
  scan-only micro     the fused bidir scan at enc0's exact call shape

In-graph loop + full-output consumption (CLAUDE.md methodology).
Usage: PB_ITERS=10 python tools/probe_cdmamba_stages.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit

BS = int(os.environ.get("PB_BS", "4"))
SIZE = int(os.environ.get("PB_SIZE", "256"))

bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey


def main():
    from smow_net_tpu.models.zoo.cd_mamba import (GF, ConvMamba, SRCMBlock,
                                                  SRCMLayer)
    from smow_net_tpu.ops.pooling import max_pool
    from smow_net_tpu.ops.resize import resize_nearest
    from smow_net_tpu.nn.layers import Conv

    H = SIZE
    only = os.environ.get("PB_ONLY", "")
    full = only == ""

    class Enc0(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            v = Conv(16, 3, 1, 1, use_bias=False, name="convInit")(x)
            return SRCMBlock(16, name="b0")(v, train)

    # siamese 2B-batched, as the model runs it
    x2b = r(k(0), (2 * BS, H, H, 3), bf)
    if full or only == "enc0":
        timeit("convInit+enc0 (2B @256² C16)", Enc0(), x2b)

    class Stage(nn.Module):
        ch: int
        nblocks: int

        @nn.compact
        def __call__(self, x, train=False):
            v = SRCMLayer(self.ch, name="down")(x)
            v = max_pool(v, 2, 2)
            for j in range(self.nblocks):
                v = SRCMBlock(self.ch, name=f"b{j}")(v, train)
            return v

    if full:
        timeit("enc1 (2B @128² C32)", Stage(32, 2),
               r(k(1), (2 * BS, H, H, 16), bf))
        timeit("enc2 (2B @64² C64)", Stage(64, 2),
               r(k(2), (2 * BS, H // 2, H // 2, 32), bf))
        timeit("enc3 (2B @32² C128)", Stage(128, 4),
               r(k(3), (2 * BS, H // 4, H // 4, 64), bf))

    class GFStage(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, a, b, train=False):
            al, bl = GF(self.ch, "local", name="l_gf")(a, b, train)
            ag, bg = GF(self.ch, "global", name="g_gf")(a, b, train)
            return al + ag, bl + bg

    if full or only == "gf1":
        timeit("L_GF+G_GF stage1 (@256² C16)", GFStage(16),
               r(k(4), (BS, H, H, 16), bf), r(k(5), (BS, H, H, 16), bf))
    if full:
        timeit("L_GF+G_GF stage2 (@128² C32)", GFStage(32),
               r(k(6), (BS, H // 2, H // 2, 32), bf),
               r(k(7), (BS, H // 2, H // 2, 32), bf))

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, d0, d1, d2, d3, train=False):
            chans = [16, 32, 64, 128]
            diffs = [d3, d2, d1, d0]
            x = diffs[0]
            for i in range(3):
                c_out = chans[2 - i]
                x = Conv(c_out, 1, use_bias=False, name=f"up{i}_conv")(x)
                x = resize_nearest(x, (x.shape[1] * 2, x.shape[2] * 2), (1, 2))
                x = x + diffs[i + 1]
                x = SRCMBlock(c_out, conv_mode="deepwise",
                              name=f"dec{i}_b0")(x, train)
            return x

    if full:
        timeit("decoder (3 up-stages)", Dec(),
               r(k(8), (BS, H, H, 16), bf),
               r(k(9), (BS, H // 2, H // 2, 32), bf),
               r(k(10), (BS, H // 4, H // 4, 64), bf),
               r(k(11), (BS, H // 8, H // 8, 128), bf))

    # scan-kernel micro at enc0's exact fused-bidir call shape:
    # mamba_bidir concats directions into features -> selective_scan at
    # (2B, L=65536, 2*Di=64), G=2
    from smow_net_tpu.ops.scan import selective_scan_auto

    class ScanOnly(nn.Module):
        @nn.compact
        def __call__(self, u, dt, Bm, Cm):
            A = -jnp.exp(self.param("Al", nn.initializers.zeros, (64, 16)))
            D = self.param("D", nn.initializers.ones, (64,))
            db = self.param("db", nn.initializers.zeros, (64,))
            return selective_scan_auto(u, dt, A, Bm, Cm, D, db,
                                       delta_softplus=True)

    L = H * H
    if full or only == "scan":
        timeit("scan micro (2B, L=65536, D=64, G=2)", ScanOnly(),
               r(k(12), (2 * BS, L, 64), bf),
               r(k(13), (2 * BS, L, 64), bf) * 0.1,
               r(k(14), (2 * BS, L, 2, 16), bf),
               r(k(15), (2 * BS, L, 2, 16), bf), train_kw=False)


if __name__ == "__main__":
    main()
