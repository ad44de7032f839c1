"""Inflated (decomposed) 3D ResNet-18 encoder.

TPU-native rebuild of the reference's `ResNet3D`/`Decompose_conv` pattern
(models/SMOW_Net.py:426-585): every pretrained 2D conv becomes a spatial
(1,kh,kw) conv plus three 1x1x1 temporal mixers initialised so the block is
*temporally identity* at step 0 (time_2=eye, time_1=time_3=0), i.e. the
inflated net starts exactly equal to per-frame 2D ResNet. BatchNorm
normalizes over (B,T,H,W) like torch BatchNorm3d.

Two activation layouts, same parameter tree:
  * unfolded (B, T, H, W, C) — the reference-shaped path;
  * T-folded (B, H, W, T*C), frame-major channels — the TPU-fast path:
    spatial convs run as grouped 2-D convs with frame-tiled kernels and the
    three temporal mixers collapse into ONE full-width (2C, 2C) matmul,
    removing the per-block slice/concat traffic (measured on v5e).
The layout is chosen by input rank; params/initializers are identical.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import convops
from ..ops.pooling import max_pool
from ..utils import torch_init
from .layers import batch_norm

__all__ = ["DecomposedConv3d", "BasicBlock3d", "ResNet3D", "fold_t", "unfold_t",
           "set_folded_impl"]

# Folded-path lowering for DecomposedConv3d:
#   "grouped" — grouped spatial conv (G=2, frame-tiled kernel) + one (2C,2C)
#               temporal-mix matmul;
#   "dense"   — the two fused into ONE ungrouped conv whose kernel is
#               blockdiag(spatial) @ mix. 2x MACs, full MXU lanes (the
#               encoder's C=64..512 stages run the MXU half-empty as groups).
#   "batched" — frame axis moved into BATCH for the whole backbone
#               ((2B, H, W, C), frame-major): spatial convs are plain dense
#               convs at per-frame width (standard ResNet shapes XLA tiles
#               well, and their wgrad is a standard conv-wgrad over 2B batch
#               instead of a grouped one), temporal mixers are four (F, F)
#               matmuls on the frame halves (same MACs as the folded (2F,2F)
#               form, no transposes); outputs fold to (B, H, W, 2C) only at
#               the 4+1 stage boundaries.
#   "auto"    — dense for inference, batched under training. Measured on v5e
#               (bs16, 256², bf16): whole-encoder fwd+bwd 18.24 -> 16.61 ms
#               vs grouped (tools/profile_breakdown_train.py PB_ONLY=enc;
#               dense trains worse still — its doubled MACs dominate
#               dgrad/wgrad, 22.4 ms, tools/probe_resnet_dense.py).
_FOLDED_IMPL = "auto"
_AUTO_TRAIN = "batched"


def set_folded_impl(name: str, auto_train: str | None = None):
    assert name in ("auto", "grouped", "dense", "batched"), name
    global _FOLDED_IMPL, _AUTO_TRAIN
    _FOLDED_IMPL = name
    if auto_train is not None:
        assert auto_train in ("grouped", "batched"), auto_train
        _AUTO_TRAIN = auto_train


def _folded_mode(train: bool) -> str:
    if _FOLDED_IMPL == "auto":
        return _AUTO_TRAIN if train else "dense"
    return _FOLDED_IMPL


def fold_t(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, T*C), frame-major channels."""
    B, T, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)


def unfold_t(x: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B, H, W, T*C) -> (B, T, H, W, C)."""
    B, H, W, TC = x.shape
    return x.reshape(B, H, W, T, TC // T).transpose(0, 3, 1, 2, 4)


def folded_to_batched(x: jnp.ndarray, T: int = 2) -> jnp.ndarray:
    """(B, H, W, T*C) -> (B*T, H, W, C), b-major batch (frame fastest) so a
    dp-sharded batch axis stays local — a t-major merge would reshard."""
    B, H, W, TC = x.shape
    z = x.reshape(B, H, W, T, TC // T).transpose(0, 3, 1, 2, 4)
    return z.reshape(B * T, H, W, TC // T)


def batched_to_folded(x: jnp.ndarray, T: int = 2) -> jnp.ndarray:
    """(B*T, H, W, C) -> (B, H, W, T*C), frame-major channels."""
    BT, H, W, C = x.shape
    z = x.reshape(BT // T, T, H, W, C).transpose(0, 2, 3, 1, 4)
    return z.reshape(BT // T, H, W, T * C)


class _Kern(nn.Module):
    """Declares a bare conv kernel param under this module's name, so both
    layout paths share one declaration (tree path: <name>/kernel)."""

    shape: Tuple[int, ...]
    init: Callable

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.init, self.shape)


def _bn_apply(bn: nn.Module, y: jnp.ndarray, train: bool, T: int,
              t_batch: bool = False) -> jnp.ndarray:
    """BatchNorm with (C,) stats on any layout. Folded tensors are viewed
    as (B, H, W, T, C) — a free reshape — so stats pool over frames exactly
    like torch BatchNorm3d; frame-batched tensors pool frames through the
    batch axis directly."""
    if t_batch:
        return bn(y, use_running_average=not train)
    if y.ndim == 4:
        B, H, W, TC = y.shape
        z = y.reshape(B, H, W, T, TC // T)
        z = bn(z, use_running_average=not train)
        return z.reshape(B, H, W, TC)
    return bn(y, use_running_average=not train)


def _s2d_conv_7s2(x: jnp.ndarray, kd: jnp.ndarray) -> jnp.ndarray:
    """Exact space-to-depth rewrite of a 7x7 stride-2 pad-3 conv as a 4x4
    stride-1 conv on 2x2-blocked input (4x the input channels). The stem's
    tiny C_in leaves the MXU almost idle on the direct form; s2d quadruples
    the contraction depth and halves the spatial extent. Derivation: pad the
    kernel to 8x8 at offset (1,1); out[i] = sum_u k8[u] x[2i+u-4]; writing
    u = 2p+d gives a 4-tap conv over s2d pixels with padding (2,1).
    Parity: tools/probe_resnet.py (2.3e-7 f32), tests/test_smow_net.py."""
    k, _, Ci, Co = kd.shape
    assert k == 7, k
    k8 = jnp.pad(kd, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, Ci, Co).transpose(0, 2, 1, 3, 4, 5)
    k4 = k4.reshape(4, 4, 4 * Ci, Co)
    B, H, W, C = x.shape
    z = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    z = z.reshape(B, H // 2, W // 2, 4 * C)
    from jax import lax
    return lax.conv_general_dilated(
        z, k4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=z.dtype)


class DecomposedConv3d(nn.Module):
    """Spatial conv over each frame + cyclic temporal 1x1x1 mix for T=2
    (reference Decompose_conv, models/SMOW_Net.py:443-473).

    frame1_out = time_2(F1) + time_3(F2); frame2_out = time_1(F1) + time_2(F2),
    with time_2 identity-init and time_1/time_3 zero-init.
    Accepts (B,2,H,W,C) or T-folded (B,H,W,2C)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, fold_output: bool = False,
                 train: bool = False, t_batch: bool = False,
                 impl: str = "") -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        F = self.features
        folded = x.ndim == 4 and not t_batch
        Cin = x.shape[-1] // 2 if folded else x.shape[-1]
        assert not self.use_bias, "reference decompose convs are bias-free"
        ks = _Kern((1, k, k, Cin, F),
                   torch_init.kaiming_uniform_torch(Cin * k * k), name="spatial")()
        k_id = _Kern((1, 1, 1, F, F), torch_init.temporal_identity, name="time_2")()
        k_fwd = _Kern((1, 1, 1, F, F), torch_init.zeros, name="time_1")()
        k_bwd = _Kern((1, 1, 1, F, F), torch_init.zeros, name="time_3")()
        dt = x.dtype
        W1, W2, W3 = k_fwd[0, 0, 0], k_id[0, 0, 0], k_bwd[0, 0, 0]
        mix = jnp.concatenate([
            jnp.concatenate([W2, W1], axis=1),
            jnp.concatenate([W3, W2], axis=1)], axis=0).astype(dt)
        if t_batch:
            # frame-batched: plain dense conv over (2B, H, W, Cin), then the
            # temporal mix as four (F, F) matmuls on the frame halves —
            # identical MACs to the folded (2F, 2F) matmul, zero transposes,
            # and the conv's wgrad is a standard batch-2B conv-wgrad instead
            # of XLA's grouped lowering (measured 1.1x whole-encoder
            # fwd+bwd; see _FOLDED_IMPL notes). Batch is b-major (frame
            # fastest), so the frame halves are a (B, 2, ...) view.
            y = convops.conv(x, ks[0].astype(dt), (s, s), (p, p))
            Bb, Ho, Wo = y.shape[0] // 2, y.shape[1], y.shape[2]
            yv = y.reshape(Bb, 2, Ho, Wo, F)
            y1, y2 = yv[:, 0], yv[:, 1]
            o1 = jnp.matmul(y1, mix[:F, :F]) + jnp.matmul(y2, mix[F:, :F])
            o2 = jnp.matmul(y1, mix[:F, F:]) + jnp.matmul(y2, mix[F:, F:])
            return jnp.stack([o1, o2], axis=1).reshape(2 * Bb, Ho, Wo, F)
        if not folded:
            y = convops.conv(x, ks.astype(dt), (1, s, s), (0, p, p))
            if fold_output:
                return jnp.matmul(fold_t(y), mix)
            y_id = convops.conv(y, k_id.astype(dt))
            f1 = y_id[:, 0:1] + convops.conv(y[:, 1:2], k_bwd.astype(dt))
            f2 = convops.conv(y[:, 0:1], k_fwd.astype(dt)) + y_id[:, 1:2]
            return jnp.concatenate([f1, f2], axis=1)
        # folded input: pick dense vs grouped ("batched" needs the caller to
        # pass frame-batched tensors and is handled above; a folded call
        # under batched mode keeps the grouped lowering unless the caller
        # forces a mode via `impl` — the hybrid train encoder forces dense
        # for the lane-starved stem/layer1)
        if (impl or _folded_mode(train)) == "dense":
            # ONE dense conv: kernel = blockdiag(frame-tiled spatial) @ mix,
            # i.e. K[h,w,t*Cin+c, o] = sum_f ks[h,w,c,f] * mix[t*F+f, o].
            # 2x the MACs of the grouped form but full MXU lanes on both
            # sides and no separate mix pass (measured faster on v5e at the
            # encoder's small-C stages; tools/probe_resnet.py).
            kd = jnp.einsum("hwcf,tfo->hwtco", ks[0].astype(dt),
                            mix.reshape(2, F, 2 * F)).reshape(
                                k, k, 2 * Cin, 2 * F)
            if k == 7 and s == 2 and p == 3:
                return _s2d_conv_7s2(x, kd)
            return convops.conv(x, kd, (s, s), (p, p))
        # folded: grouped spatial conv (frame-tiled kernel), one (2F,2F) mix
        tiled = jnp.concatenate([ks[0], ks[0]], axis=-1).astype(dt)
        y = convops.conv(x, tiled, (s, s), (p, p), 1, 2)
        return jnp.matmul(y, mix)


class BasicBlock3d(nn.Module):
    """ResNet-18 BasicBlock, decomposed (reference Bottleneck3d,
    models/SMOW_Net.py:542-579 — despite the name it wraps BasicBlocks)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 t_batch: bool = False, impl: str = "") -> jnp.ndarray:
        folded = x.ndim == 4 and not t_batch
        in_c = x.shape[-1] // 2 if folded else x.shape[-1]
        residual = x
        y = DecomposedConv3d(self.features, 3, self.stride, 1,
                             name="conv1")(x, train=train, t_batch=t_batch,
                                           impl=impl)
        y = _bn_apply(batch_norm("bn1"), y, train, 2, t_batch)
        y = nn.relu(y)
        y = DecomposedConv3d(self.features, 3, 1, 1,
                             name="conv2")(y, train=train, t_batch=t_batch,
                                           impl=impl)
        y = _bn_apply(batch_norm("bn2"), y, train, 2, t_batch)
        if self.stride != 1 or in_c != self.features:
            kd = _Kern((1, 1, 1, in_c, self.features),
                       torch_init.kaiming_uniform_torch(in_c),
                       name="downsample_conv")()
            if t_batch:
                xs = x[:, ::self.stride, ::self.stride, :]
                residual = jnp.matmul(xs, kd[0, 0, 0].astype(xs.dtype))
            elif folded:
                xs = x[:, ::self.stride, ::self.stride, :]
                B, H, W, _ = xs.shape
                z = xs.reshape(B, H, W, 2, in_c)
                z = jnp.matmul(z, kd[0, 0, 0].astype(z.dtype))
                residual = z.reshape(B, H, W, 2 * self.features)
            else:
                residual = convops.conv(x, kd.astype(x.dtype),
                                        (1, self.stride, self.stride), 0)
            residual = _bn_apply(batch_norm("downsample_bn"), residual, train,
                                 2, t_batch)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    """Inflated ResNet-18: stem (7x7 spatial + temporal mix) then 4 stages of
    2 BasicBlocks; strides (1,2,2,2); widths (64,128,256,512).

    Input (B,2,H,W,3) runs the reference-shaped path; input (B,H,W,6)
    (T-folded pair) runs the folded path and returns folded features. The
    stem's 7x7 spatial conv always runs per-frame batched (grouped convs on
    3 input channels measured slower on v5e); the folded path folds right
    after it."""

    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2

    def setup(self):
        self.stem = DecomposedConv3d(64, 7, 2, 3, name="conv1")
        self.bn1 = batch_norm("bn1")
        stages = []
        for i, w in enumerate(self.widths):
            blocks = []
            for j in range(self.blocks_per_stage):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(BasicBlock3d(w, stride, name=f"layer{i + 1}_{j}"))
            stages.append(blocks)
        self.stages = stages

    def stem_forward(self, x: jnp.ndarray, train: bool,
                     t_batch: bool = False) -> jnp.ndarray:
        folded = x.ndim == 4 and not t_batch
        if t_batch:
            y = self.stem(x, train=train, t_batch=True)
        elif folded:
            if _folded_mode(train) in ("dense", "batched"):
                # fused s2d stem: blockdiag(7x7)@mix as one 4x4 dense conv
                # on 2x2-blocked input — no unfold/fold transposes, no
                # standalone mix pass (_s2d_conv_7s2). The hybrid batched
                # train mode uses it too (full lanes on the Cin=3 stem).
                y = self.stem(x, train=train, impl="dense")
            else:
                # unfold -> per-frame batched 7x7 (grouped convs on 3 input
                # channels measured slower) -> fold before the temporal mix;
                # everything downstream stays folded
                y = self.stem(unfold_t(x, 2), fold_output=True)
        else:
            y = self.stem(x)
        y = _bn_apply(self.bn1, y, train, 2, t_batch)
        return nn.relu(y)

    def __call__(self, x: jnp.ndarray, train: bool):
        """Returns (stem_out, [stage1..stage4 outputs]) in the input layout."""
        folded = x.ndim == 4
        # hybrid frame-batched backbone for training (per-stage winners on
        # v5e, tools/probe_enc_stages.py fwd+bwd marginal ms):
        #   stem   — folded dense s2d (3.58 vs 5.18 batched): Cin=3 leaves
        #            the MXU idle per-frame; blockdiag@mix fills 128 lanes;
        #   layer1 — folded dense blockdiag (3.61 vs 6.97 batched / 8.42
        #            grouped): C=64 runs half-lane in per-frame width;
        #   layer2-4 — frame-batched (dense is a wash at C=128 and loses
        #            at C>=256 where its 2x MACs stop buying lanes).
        # One folded->batched transpose after layer1; stage outputs are
        # folded either way.
        if folded and _folded_mode(train) == "batched":
            x0 = self.stem_forward(x, train)          # folded dense s2d
            y = max_pool(x0, (3, 3), (2, 2), (1, 1))
            feats = []
            for i, blocks in enumerate(self.stages):
                if i == 0:
                    for blk in blocks:
                        y = blk(y, train, impl="dense")
                    feats.append(y)
                    y = folded_to_batched(y, 2)
                    continue
                for blk in blocks:
                    y = blk(y, train, t_batch=True)
                feats.append(batched_to_folded(y, 2))
            return x0, feats
        x0 = self.stem_forward(x, train)
        if folded:
            y = max_pool(x0, (3, 3), (2, 2), (1, 1))
        else:
            y = max_pool(x0, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        feats = []
        for blocks in self.stages:
            for blk in blocks:
                y = blk(y, train)
            feats.append(y)
        return x0, feats
