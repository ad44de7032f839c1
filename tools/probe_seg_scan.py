"""On-chip A/B of the two-level (segmented) long-L scan path at cd_mamba's
dominant shapes, fwd and fwd+bwd:

  enc0  (2B=8,  L=65536, D=64, G=2)  — full-res bidir ConvMamba
  gf1   (B=8,   L=65536, D=64, G=2)  — 2B-batched GF cross-queries
  enc1  (8,     L=16384, D=128, G=2)

Toggled via the module's _SEG_MIN_L threshold (same process).
Usage: PB_ITERS=10 python tools/probe_seg_scan.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit as timeit_fwd
from tools.profile_breakdown_train import timeit
from smow_net_tpu.ops.pallas import scan_fused as sf
from smow_net_tpu.ops.scan import selective_scan_auto

bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey


class Scan(nn.Module):
    d: int

    @nn.compact
    def __call__(self, u, dt, Bm, Cm):
        A = -jnp.exp(self.param("Al", nn.initializers.zeros, (self.d, 16)))
        D = self.param("D", nn.initializers.ones, (self.d,))
        db = self.param("db", nn.initializers.zeros, (self.d,))
        return selective_scan_auto(u, dt, A, Bm, Cm, D, db,
                                   delta_softplus=True)


def run(tag, B, L, D, G, train):
    u = r(k(0), (B, L, D), bf)
    dt = r(k(1), (B, L, D), bf) * 0.1
    Bm = r(k(2), (B, L, G, 16), bf)
    Cm = r(k(3), (B, L, G, 16), bf)
    t = timeit if train else timeit_fwd
    for label, minl in (("seq", 1 << 30), ("seg", 16384),
                        ("seq", 1 << 30), ("seg", 16384)):
        sf._SEG_MIN_L = minl
        t(f"scan {tag} {'train' if train else 'infer'} [{label}]",
          Scan(D), u, dt, Bm, Cm, train_kw=False)
    sf._SEG_MIN_L = 16384


def main():
    for train in (False, True):
        run("enc0 8xL64k D64", 8, 65536, 64, 2, train)
        run("enc1 8xL16k D128", 8, 16384, 128, 2, train)


if __name__ == "__main__":
    main()
