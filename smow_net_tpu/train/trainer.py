"""Training core: train/eval steps compiled once over the device mesh.

Mirrors the reference loop (train.py:157-247) with TPU-native changes:
  * whole step (fwd, loss, bwd, clip, AdamW, BN-stat update, confusion
    matrix) is ONE jitted program; batch sharded over the mesh 'data' axis,
    params replicated — XLA inserts the gradient all-reduces
  * per-element grad clamp to ±clip via optax.clip (reference
    utils/func.py:4-8)
  * confusion matrix accumulates on device (reference syncs to host every
    step, train.py:182-185); host reads it once per epoch
  * prediction head handling matches train.py:170-174: 1-channel -> squeeze,
    2-channel -> sigmoid + channel 1
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel.mesh import batch_sharding, replicated_sharding
from .loss import bce_dice_loss
from .metrics import confusion_matrix

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step", "select_pred"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    cm: jnp.ndarray  # accumulated (2,2) confusion matrix
    loss_sum: jnp.ndarray
    loss_count: jnp.ndarray
    rng: jnp.ndarray  # base PRNG key for per-step dropout
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def reset_metrics(self):
        return self.replace(
            cm=jnp.zeros((2, 2), jnp.float32),
            loss_sum=jnp.zeros((), jnp.float32),
            loss_count=jnp.zeros((), jnp.float32),
        )


def select_pred(out: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,1) -> squeeze; (B,H,W,2) -> sigmoid + channel 1 (train.py:170-174)."""
    if out.shape[-1] == 1:
        return out[..., 0]
    return jax.nn.sigmoid(out)[..., 1]


def make_optimizer(schedule: Callable, weight_decay: float = 1e-4, clip: float = 0.5,
                   optimizer: str = "adamw", momentum: float = 0.9) -> optax.GradientTransformation:
    if optimizer == "adamw":
        opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    elif optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay), optax.sgd(schedule, momentum=momentum)
        )
    else:
        raise ValueError(optimizer)
    parts = [optax.clip(clip)] if clip and clip > 0 else []
    return optax.chain(*parts, opt)


def create_train_state(model, rng, sample_batch, tx) -> TrainState:
    init_rng, step_rng = jax.random.split(rng)
    variables = model.init(init_rng, sample_batch["A"], sample_batch["B"], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        cm=jnp.zeros((2, 2), jnp.float32),
        loss_sum=jnp.zeros((), jnp.float32),
        loss_count=jnp.zeros((), jnp.float32),
        rng=step_rng,
        tx=tx,
    )


def make_train_step(model, mesh=None, donate: bool = True, compute_dtype=None,
                    state_sharding=None):
    """compute_dtype=jnp.bfloat16 enables mixed precision: master params and
    grads stay fp32; forward/backward run in bf16 (fp32 MXU accumulation via
    the conv ops); the loss is evaluated on fp32-cast predictions.

    state_sharding: optional sharding pytree for the TrainState (e.g. from
    parallel.mesh.fsdp_sharding) — params/optimizer state stay sharded
    across steps; XLA inserts the per-layer all-gathers/reduce-scatters."""

    def step_fn(state: TrainState, batch):
        x1, x2, gt = batch["A"], batch["B"], batch["mask"]
        valid = batch.get("valid")
        if compute_dtype is not None:
            x1 = x1.astype(compute_dtype)
            x2 = x2.astype(compute_dtype)

        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            p = params
            if compute_dtype is not None:
                p = jax.tree_util.tree_map(lambda w: w.astype(compute_dtype), params)
            out, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                x1, x2, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            pred = select_pred(out).astype(jnp.float32)
            return bce_dice_loss(pred, gt, valid), (pred, mut)

        (loss, (pred, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_stats = mut["batch_stats"]
        if compute_dtype is not None:
            grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            new_stats = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), new_stats)
        mut = {"batch_stats": new_stats}
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        cm = state.cm + confusion_matrix(pred, gt, valid=valid)
        return state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=mut["batch_stats"],
            opt_state=opt_state,
            cm=cm,
            loss_sum=state.loss_sum + loss,
            loss_count=state.loss_count + 1.0,
        ), loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    st = rep if state_sharding is None else state_sharding
    return jax.jit(
        step_fn,
        in_shardings=(st, data),
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh=None):
    def step_fn(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["A"], batch["B"], train=False,
        )
        pred = select_pred(out)
        valid = batch.get("valid")
        loss = bce_dice_loss(pred, batch["mask"], valid)
        return confusion_matrix(pred, batch["mask"], valid=valid), loss, pred

    if mesh is None:
        return jax.jit(step_fn)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn, in_shardings=(rep, rep, data), out_shardings=(rep, rep, data)
    )
