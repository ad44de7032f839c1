import numpy as np
import pytest
import torch

from smow_net_tpu.train.loss import bce_dice_loss
from smow_net_tpu.train.metrics import cm2score, confusion_matrix
from smow_net_tpu.train.schedule import get_schedule


def test_bce_dice_matches_reference_formula():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, size=(4, 16, 16)).astype(np.float32)
    gt = (rng.uniform(size=(4, 16, 16)) > 0.7).astype(np.float32)
    # independent torch replication of utils/loss_f.py:8-18
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    bce = torch.nn.BCELoss()(tp, tg)
    inter = (tg * tp).sum()
    dice = (2 * inter + 1e-7) / (tg.sum() + tp.sum() + 1e-7)
    ref = float(bce + 1 - dice)
    ours = float(bce_dice_loss(pred, gt))
    assert abs(ours - ref) < 1e-5


def test_confusion_matrix_and_scores():
    rng = np.random.default_rng(1)
    pred = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    gt = (rng.uniform(size=(3, 8, 8)) > 0.5).astype(np.float32)
    cm = np.asarray(confusion_matrix(pred, gt))
    p = (pred > 0.5).astype(int)
    g = gt.astype(int)
    ref = np.bincount(2 * g.ravel() + p.ravel(), minlength=4).reshape(2, 2)
    np.testing.assert_array_equal(cm, ref)
    s = cm2score(cm)
    tn, fp, fn, tp = ref.ravel()
    assert abs(s["iou"] - tp / (ref.sum() - tn)) < 1e-6
    assert abs(s["acc"] - (tp + tn) / ref.sum()) < 1e-6


def test_confusion_matrix_valid_mask():
    pred = np.ones((2, 4, 4), np.float32)
    gt = np.ones((2, 4, 4), np.float32)
    cm = np.asarray(confusion_matrix(pred, gt, valid=np.asarray([1.0, 0.0])))
    assert cm[1, 1] == 16  # only the valid sample counted


def test_cosine_schedule_matches_torch():
    base, total = 1e-4, 50
    sched = get_schedule("cosine", base, epochs=5, iters_per_epoch=10)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    ref_sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total, eta_min=1e-6)
    for step in range(total):
        ref_lr = opt.param_groups[0]["lr"]
        assert abs(float(sched(step)) - ref_lr) < 1e-10, step
        opt.step()
        ref_sched.step()


def test_multistep_schedule():
    sched = get_schedule("step", 1e-3, epochs=6, iters_per_epoch=10,
                         lr_decay_epochs=[2, 4], lr_decay_rate=0.1)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(25)) - 1e-4) < 1e-9
    assert abs(float(sched(45)) - 1e-5) < 1e-9


def test_bf16_train_step_runs_and_learns():
    import jax
    import jax.numpy as jnp

    from smow_net_tpu.models import get_model
    from smow_net_tpu.train.schedule import get_schedule
    from smow_net_tpu.train.trainer import create_train_state, make_optimizer, make_train_step

    model = get_model("fc_ef")
    batch = {
        "A": jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32),
        "B": jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)), jnp.float32),
        "mask": (jnp.arange(32)[None, :, None] < 16).astype(jnp.float32)
                * jnp.ones((2, 32, 32), jnp.float32),
    }
    tx = make_optimizer(get_schedule("cosine", 1e-3, 1, 8), 1e-4, 0.5)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(model, compute_dtype=jnp.bfloat16, donate=False)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # master params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(state.params))
