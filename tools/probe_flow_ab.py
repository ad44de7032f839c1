"""Same-process A/B of the OFW flow() lowering at model shapes (bs16 256²
recipe: (16, 2, 128, 128, 32) bf16), infer and train:

  5d     — three depthwise stride-2 Conv3d (NDHWC grouped) + BN/ReLU,
           trilinear lift, 3x3x3 flow conv (the round-1..3 path)
  folded — T-folded dense block-banded 2-D convs (depthwise densified to
           diagonal blocks), per-frame bilinear lift, tdense flow conv
           (models/smow_net.set_flow_folded)

Also decomposes the folded path (downs / lift / flow conv marginals) via
cumulative prefixes.

Usage: PB_ITERS=20 python tools/probe_flow_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools.profile_breakdown import timeit as timeit_fwd
from tools.profile_breakdown_train import timeit
from smow_net_tpu.models import smow_net as sm
from smow_net_tpu.models.smow_net import OFW

BS = int(os.environ.get("PB_BS", "16"))
H = int(os.environ.get("PB_SIZE", "256")) // 2


class Flow(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return OFW(32, name="ofw").flow(x, train)


def main():
    bf = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (BS, 2, H, H, 32), bf)
    for label, folded in (("5d", False), ("folded", True),
                          ("5d", False), ("folded", True)):
        sm.set_flow_folded(folded)
        timeit_fwd(f"flow infer [{label}]", Flow(), x)
    for label, folded in (("5d", False), ("folded", True),
                          ("folded", True)):
        sm.set_flow_folded(folded)
        timeit(f"flow train [{label}]", Flow(), x)
    sm.set_flow_folded(False)


if __name__ == "__main__":
    main()
