"""Change-detection metrics from an accumulated 2x2 confusion matrix
(reference utils/metric_tool.py:93-155).

TPU-first: the per-step confusion-matrix update runs **on device** (4 scalar
reductions fused into the step) and is accumulated into a (2,2) array carried
with the train state — unlike the reference, which syncs predictions to host
every step (train.py:182-185). The host sees the matrix once per epoch.

Matrix layout: cm[gt, pred] — cm[0,0]=TN, cm[0,1]=FP, cm[1,0]=FN, cm[1,1]=TP.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["confusion_matrix", "cm2score", "cm2F1", "ConfuseMatrixMeter"]

_EPS = float(np.finfo(np.float32).eps)


def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray, threshold: float = 0.5,
                     valid=None) -> jnp.ndarray:
    """pred: probabilities (any shape); gt: {0,1} labels. Returns (2,2) f32.
    `valid`: optional (B,) per-sample weights (padded-batch masking)."""
    p = (pred > threshold).astype(jnp.float32)
    g = (gt > 0.5).astype(jnp.float32)
    if valid is None:
        w = jnp.ones_like(p)
    else:
        w = jnp.broadcast_to(
            valid.reshape(valid.shape[0], *([1] * (pred.ndim - 1))).astype(jnp.float32), p.shape
        )
    tp = jnp.sum(w * g * p)
    fn = jnp.sum(w * g * (1.0 - p))
    fp = jnp.sum(w * (1.0 - g) * p)
    tn = jnp.sum(w * (1.0 - g) * (1.0 - p))
    return jnp.stack([jnp.stack([tn, fp]), jnp.stack([fn, tp])])


def cm2score(cm: np.ndarray) -> Dict[str, float]:
    """Reference cm2score (utils/metric_tool.py:93-129): acc, change-class
    IoU = tp/(total - tn), F1, precision, recall."""
    hist = np.asarray(cm, dtype=np.float64)
    tn, fp = hist[0]
    fn, tp = hist[1]
    total = hist.sum()
    acc = (tp + tn) / (total + _EPS)
    recall = tp / (tp + fn + _EPS)
    precision = tp / (tp + fp + _EPS)
    f1 = 2 * recall * precision / (recall + precision + _EPS)
    iou = tp / (total - tn + _EPS)
    return {"acc": float(acc), "iou": float(iou), "F1": float(f1),
            "precision": float(precision), "recall": float(recall)}


def cm2F1(cm: np.ndarray) -> float:
    return cm2score(cm)["F1"]


class ConfuseMatrixMeter:
    """Host-side accumulator mirroring the reference meter API."""

    def __init__(self, n_class: int = 2):
        assert n_class == 2
        self.sum = np.zeros((2, 2), dtype=np.float64)

    def update_cm(self, cm) -> float:
        cm = np.asarray(cm, dtype=np.float64)
        self.sum += cm
        return cm2F1(cm)

    def get_scores(self) -> Dict[str, float]:
        return cm2score(self.sum)

    def clear(self):
        self.sum = np.zeros((2, 2), dtype=np.float64)
