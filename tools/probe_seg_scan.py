"""On-chip A/B + tiling sweep of the two-level (segmented) long-L scan path
at cd_mamba's dominant shapes, fwd and fwd+bwd:

  enc0  (2B=8,  L=65536, D=64, G=2)  — full-res bidir ConvMamba
  enc1  (8,     L=16384, D=128, G=2)

The seg path packs bt up to 128 rows per program, which scales per-program
scoped VMEM with bt — the first on-chip run OOM'd at 113 MiB scoped vs the
100 MiB cap (artifacts/bench_r04/seg_scan.txt). This probe sweeps the
wide-row tiling knobs (bt cap / unroll step / chunk budgets) IN-PROCESS,
catching per-config compile OOMs, so the shipped defaults come from data.

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

M = 1 << 20


class Scan(nn.Module):
    d: int

    @nn.compact
    def __call__(self, u, dt, Bm, Cm):
        A = -jnp.exp(self.param("Al", nn.initializers.zeros, (self.d, 16)))
        D = self.param("D", nn.initializers.ones, (self.d,))
        db = self.param("db", nn.initializers.zeros, (self.d,))
        return selective_scan_auto(u, dt, A, Bm, Cm, D, db,
                                   delta_softplus=True)


# (label, bt_cap, step_wide, fwd_budget, bwd_budget); bt_cap picks the
# wide-row tile via _pick_bt (elements = bt*N*Cg)
CFGS = [
    ("bt128 s8 1M/4M", 32768, 8, 1 * M, 4 * M),
    ("bt64  s8 1M/4M", 16384, 8, 1 * M, 4 * M),
    ("bt64  s16 1M/4M", 16384, 16, 1 * M, 4 * M),
    ("bt32  s16 2M/8M", 8192, 16, 2 * M, 8 * M),
]


def run(tag, B, L, D, G, train, cfgs=CFGS):
    u = r(k(0), (B, L, D), bf)
    dt = r(k(1), (B, L, D), bf) * 0.1
    Bm = r(k(2), (B, L, G, 16), bf)
    Cm = r(k(3), (B, L, G, 16), bf)
    t = timeit if train else timeit_fwd
    mode = "train" if train else "infer"
    old = (sf._SEG_MIN_L, sf._BT_CAP, sf._STEP_WIDE,
           sf._FWD_BUDGET_WIDE, sf._BWD_BUDGET_WIDE, sf._WIDE_ROW_ELEMS)
    try:
        # treat every bt >= 32 rows as wide so each config's budgets apply
        sf._WIDE_ROW_ELEMS = 8192
        sf._SEG_MIN_L = 1 << 30
        t(f"scan {tag} {mode} [seq]", Scan(D), u, dt, Bm, Cm, train_kw=False)
        sf._SEG_MIN_L = 16384
        for label, btcap, stepw, fwdb, bwdb in cfgs:
            sf._BT_CAP = btcap
            sf._STEP_WIDE = stepw
            sf._FWD_BUDGET_WIDE = fwdb
            sf._BWD_BUDGET_WIDE = bwdb
            try:
                t(f"scan {tag} {mode} [seg {label}]", Scan(D), u, dt, Bm, Cm,
                  train_kw=False)
            except Exception as e:  # compile OOM -> next config
                print(f"scan {tag} {mode} [seg {label}]  FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
    finally:
        (sf._SEG_MIN_L, sf._BT_CAP, sf._STEP_WIDE,
         sf._FWD_BUDGET_WIDE, sf._BWD_BUDGET_WIDE,
         sf._WIDE_ROW_ELEMS) = old


def main():
    for train in (False, True):
        run("enc0 8xL64k D64", 8, 65536, 64, 2, train)
    # enc1 at the default config only (whatever is set in the module)
    for train in (False, True):
        run("enc1 8xL16k D128", 8, 16384, 128, 2, train, cfgs=CFGS[:1])


if __name__ == "__main__":
    main()
