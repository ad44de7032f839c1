"""A/B: decoder ConvBlock23d lowering in TRAIN (fwd+bwd, bf16, bs16, 256²
recipe shapes) — folded tdense (current default; dense T*C kernel, 1.6x
FLOPs, full lanes) vs frame-major decomposed (unfold_t once, kt batched 2-D
convs over B*T frames + temporal shifts — 1.0x FLOPs but per-frame lane
width and two relayouts). The unfold/fold relayouts are INSIDE the timed
graph. Per-stage; same in-graph-loop harness as profile_breakdown_train.py
(harness floor ~1.3-1.7 ms at these sizes).

Usage: PB_ITERS=10 python tools/probe_dec_framemajor.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from profile_breakdown_train import timeit  # reuse the harness

from smow_net_tpu.models.smow_net import ConvBlock23d
from smow_net_tpu.nn.resnet3d import fold_t, unfold_t
from smow_net_tpu.ops import convops

BS = int(os.environ.get("PB_BS", "16"))
bf = jnp.bfloat16
r = jax.random.normal
k = jax.random.PRNGKey

# (name, H, per-frame Cin, features) at the 256² recipe
STAGES = [
    ("C3D1", 8, 512, 128),
    ("C3D2", 16, 256, 64),
    ("C3D3", 32, 128, 64),
    ("C3D4", 64, 96, 32),
    ("C3D5", 128, 64, 32),
]


class FM(nn.Module):
    """Frame-major wrapper: unfold -> ConvBlock23d 5-D branch -> refold,
    with the global conv3d impl forced to 'decomposed'."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvBlock23d(self.features, name="blk")(unfold_t(x, 4), train)
        return fold_t(y)


class Eval(nn.Module):
    """train_kw adapter: run the wrapped block in EVAL mode under the
    train-harness signature (fwd-only measured via grad w.r.t. inputs is
    still fwd+bwd; use probe_lw_roofline.timeit for pure fwd)."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.inner(x, False)


def main():
    fwd_only = os.environ.get("PB_FWD", "") == "1"
    if fwd_only:
        from probe_lw_roofline import timeit as timeit_fwd
    for name, h, cin, feat in STAGES:
        x = r(k(hash(name) % 1000), (BS, h, h, 4 * cin), bf)
        for label, impl, mod in (
            ("folded tdense", "auto", ConvBlock23d(feat)),
            ("frame-major dec", "decomposed", FM(feat)),
        ):
            convops.set_conv3d_impl(impl)
            if fwd_only:
                timeit_fwd(f"{name} {h}x{h} {label} [fwd]", Eval(mod), x)
            else:
                timeit(f"{name} {h}x{h} {label}", mod, x)
        convops.set_conv3d_impl("auto")


if __name__ == "__main__":
    main()
