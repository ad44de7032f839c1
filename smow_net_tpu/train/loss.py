"""BCE + (1 - soft Dice) loss (reference utils/loss_f.py:8-18).

Expects sigmoid probabilities (the reference applies sigmoid or softmax
channel-1 select before the loss, train.py:170-174). BCE matches torch
nn.BCELoss including its log clamp at -100; Dice is computed over the whole
batch with eps=1e-7.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bce_dice_loss", "bce_loss", "dice_loss"]


def _weights(pred: jnp.ndarray, valid) -> jnp.ndarray:
    """Broadcast a per-sample (B,) validity mask over pixels."""
    if valid is None:
        return jnp.ones_like(pred)
    w = valid.reshape(valid.shape[0], *([1] * (pred.ndim - 1)))
    return jnp.broadcast_to(w.astype(pred.dtype), pred.shape)


def bce_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid=None) -> jnp.ndarray:
    # clip before the logs: at bf16-saturated predictions (exactly 0/1 after
    # the cast) the gradient of a clamped log is 0 * inf = NaN otherwise;
    # inactive for fp32 interior values, so torch-golden parity holds
    pred = jnp.clip(pred, 1e-12, 1.0 - 1e-7)
    log_p = jnp.maximum(jnp.log(pred), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-pred), -100.0)
    elem = -(gt * log_p + (1.0 - gt) * log_1p)
    w = _weights(pred, valid)
    return jnp.sum(elem * w) / jnp.maximum(jnp.sum(w), 1.0)


def dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid=None, eps: float = 1e-7) -> jnp.ndarray:
    w = _weights(pred, valid)
    inter = jnp.sum(gt * pred * w)
    dice = (2.0 * inter + eps) / (jnp.sum(gt * w) + jnp.sum(pred * w) + eps)
    return 1.0 - dice


def bce_dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid=None) -> jnp.ndarray:
    return bce_loss(pred, gt, valid) + dice_loss(pred, gt, valid)
