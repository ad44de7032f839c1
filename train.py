#!/usr/bin/env python
"""Training driver (TPU-native mirror of the reference train.py).

Example:
    python train.py --model smow_net --data_dir /data/LEVIR-CD-256 \
        --batchsize 16 --epochs 200 --output_dir ./output

Differences from the reference (all deliberate, documented in SURVEY.md):
  * --model flag + registry instead of comment-toggling (train.py:83-123)
  * whole train step jitted over a device mesh (DP over ICI); confusion
    matrix stays on device, read once per epoch
  * orbax resumable checkpoints (--resume) next to the best-IoU checkpoint
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_option():
    p = argparse.ArgumentParser("smow_net_tpu training")
    p.add_argument("--model", type=str, default="smow_net")
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--trainsize", type=int, default=256)
    p.add_argument("--data_dir", type=str, default="./LEVIR-CD-256")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--optim", type=str, default="adamw", choices=["adamw", "sgd"])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="cosine", choices=["cosine", "step"])
    p.add_argument("--warmup_epoch", type=int, default=-1)
    p.add_argument("--warmup_multiplier", type=float, default=100.0)
    p.add_argument("--lr_decay_epochs", type=int, nargs="*", default=[])
    p.add_argument("--lr_decay_steps", type=int, default=20)
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--clip", type=float, default=0.5)
    p.add_argument("--output_dir", type=str, default="./output")
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--pretrained", type=str, default="",
                   help="pretrained backbone state_dict (.pth/.npz): ImageNet "
                        "resnet18 for smow_net/afcf3d/bit/tfi_gr/seifnet, "
                        "mobilenet_v2 for smow_net_lw/a2net, vgg16 for ifn "
                        "(mirrors reference train.py:84-85)")
    p.add_argument("--torch_ckpt", type=str, default="",
                   help="warm-start from a reference-trained PyTorch "
                        "state_dict (.pth); full-model conversion incl. the "
                        "DataParallel 'module.' strip (reference test.py:97-102)")
    p.add_argument("--bf16", action="store_true", help="mixed-precision training: bf16 forward/backward, fp32 master params")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO/FSDP-style weight sharding: params + optimizer "
                        "state sharded over the mesh data axis (XLA inserts "
                        "per-layer all-gathers / reduce-scatters); frees "
                        "HBM for larger models/batches on pod slices")
    p.add_argument("--remat", action="store_true",
                   help="activation rematerialization for the Mamba models "
                        "(reference use_checkpoint, vmamba.py:1388-1392): "
                        "recompute SS2D in backward to fit large batches")
    p.add_argument("--profile", type=str, default="",
                   help="write a jax.profiler trace of training steps "
                        "11-15 of the first epoch to this directory "
                        "(view with tensorboard/xprof; SURVEY §5 tracing)")
    return p.parse_args()


def main(opt):
    from smow_net_tpu.data.dataset import CDDataset, DataLoader, prefetch_to_device
    from smow_net_tpu.models import get_model
    from smow_net_tpu.parallel.mesh import make_mesh, replicated_sharding
    from smow_net_tpu.train import checkpoint as ckpt
    from smow_net_tpu.train.metrics import cm2score
    from smow_net_tpu.train.schedule import get_schedule
    from smow_net_tpu.train.trainer import (
        create_train_state, make_eval_step, make_optimizer, make_train_step,
    )

    os.makedirs(opt.output_dir, exist_ok=True)
    np.random.seed(opt.seed)

    train_ds = CDDataset(opt.data_dir, "train", seed=opt.seed)
    val_ds = CDDataset(opt.data_dir, "val", seed=opt.seed)
    # multi-host (pod slice): each process loads a disjoint shard and
    # contributes its local slice of the global batch (SURVEY §2.5)
    nproc, pid = jax.process_count(), jax.process_index()
    train_loader = DataLoader(train_ds, opt.batchsize, shuffle=True, seed=opt.seed,
                              num_workers=opt.num_workers,
                              num_shards=nproc, shard_id=pid)
    val_loader = DataLoader(val_ds, opt.batchsize, shuffle=False, seed=opt.seed,
                            num_workers=opt.num_workers,
                            num_shards=nproc, shard_id=pid)
    iters_per_epoch = len(train_loader)

    mesh = make_mesh()
    overrides = {}
    if getattr(opt, "remat", False):
        if opt.model not in ("change_mamba", "rs_mamba"):
            raise SystemExit(f"--remat supports change_mamba/rs_mamba, not {opt.model}")
        overrides["use_checkpoint"] = True
    model = get_model(opt.model, **overrides)
    schedule = get_schedule(
        opt.lr_scheduler, opt.lr, opt.epochs, iters_per_epoch,
        warmup_epochs=opt.warmup_epoch, warmup_multiplier=opt.warmup_multiplier,
        lr_decay_epochs=opt.lr_decay_epochs, lr_decay_steps=opt.lr_decay_steps,
        lr_decay_rate=opt.lr_decay_rate,
    )
    tx = make_optimizer(schedule, opt.weight_decay, opt.clip, opt.optim, opt.momentum)

    s = opt.trainsize
    sample = {
        "A": jnp.zeros((1, s, s, 3), jnp.float32),
        "B": jnp.zeros((1, s, s, 3), jnp.float32),
        "mask": jnp.zeros((1, s, s), jnp.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(opt.seed), sample, tx)
    if opt.pretrained:
        from smow_net_tpu.train.pretrained import load_pretrained_backbone

        variables = load_pretrained_backbone(
            opt.model, opt.pretrained,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"loaded pretrained backbone from {opt.pretrained}")
    if opt.torch_ckpt:
        from smow_net_tpu.train.ingest import ingest_torch_checkpoint

        variables = ingest_torch_checkpoint(
            opt.model, opt.torch_ckpt,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats", state.batch_stats))
        print(f"warm-started from torch checkpoint {opt.torch_ckpt}")
    state = jax.device_put(state, replicated_sharding(mesh))

    start_epoch = 1
    best_iou = -1.0
    if opt.resume:
        # restore with a template so optax NamedTuple states keep their type
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step,
                    "epoch": 0, "best_iou": 0.0}
        restored = ckpt.restore_checkpoint(opt.resume, template)
        state = state.replace(
            step=jnp.asarray(restored["step"]), params=restored["params"],
            batch_stats=restored["batch_stats"], opt_state=restored["opt_state"],
        )
        state = jax.device_put(state, replicated_sharding(mesh))
        start_epoch = int(restored["epoch"]) + 1
        best_iou = float(restored.get("best_iou", -1.0))
        print(f"resumed from {opt.resume} at epoch {start_epoch}")

    compute_dtype = jnp.bfloat16 if opt.bf16 else None
    state_sharding = None
    if opt.fsdp:
        from smow_net_tpu.parallel.mesh import fsdp_sharding

        state_sharding = fsdp_sharding(mesh, state)
        state = jax.device_put(state, state_sharding)
    train_step = make_train_step(model, mesh, compute_dtype=compute_dtype,
                                 state_sharding=state_sharding)
    eval_step = make_eval_step(model, mesh)
    jsonl = open(os.path.join(opt.output_dir, "metrics.jsonl"), "a")

    import collections

    for epoch in range(start_epoch, opt.epochs + 1):
        t0 = time.time()
        state = state.reset_metrics()
        # windowed loss meter (reference AvgMeter(num=40), utils/func.py:11-31);
        # device arrays are held lazily and only synced at print time
        window = collections.deque(maxlen=40)
        tracing = False
        for i, batch in enumerate(prefetch_to_device(iter(train_loader), mesh), start=1):
            # profile a post-warmup window (step 11, after compile + cache
            # effects settle) so the trace shows steady-state step structure;
            # short epochs fall back to starting at step 1
            if opt.profile and epoch == start_epoch:
                if i == (11 if iters_per_epoch >= 16 else 1):
                    jax.profiler.start_trace(opt.profile)
                    tracing = True
                elif tracing and i == (16 if iters_per_epoch >= 16 else
                                       min(6, iters_per_epoch)):
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), state.params)
                    jax.profiler.stop_trace()
                    tracing = False
                    print(f"profiler trace written to {opt.profile}")
            state, loss = train_step(state, batch)
            window.append(loss)
            if i % 100 == 0 or i == iters_per_epoch:
                avg = float(np.mean([float(l) for l in window]))
                print(
                    f"Epoch [{epoch:03d}/{opt.epochs:03d}], Step [{i:04d}/{iters_per_epoch:04d}],"
                    f" Loss: {avg:.4f}"
                )
        if tracing:  # epoch too short to hit the stop step
            jax.profiler.stop_trace()
            print(f"profiler trace written to {opt.profile}")
        train_scores = cm2score(np.asarray(state.cm))
        train_loss = float(state.loss_sum / jnp.maximum(state.loss_count, 1))
        print(f"Epoch {epoch} train: {train_scores} loss={train_loss:.4f} "
              f"({time.time() - t0:.1f}s)")
        with open(os.path.join(opt.output_dir, "train.txt"), "a") as f:
            f.write(f"Epoch: {epoch}, IoU: {train_scores['iou']:.4f}\n")

        # validation
        cm = np.zeros((2, 2))
        vloss, vcount = 0.0, 0
        for batch in prefetch_to_device(iter(val_loader), mesh):
            c, l, _ = eval_step(state.params, state.batch_stats, batch)
            cm += np.asarray(c)
            vloss += float(l)
            vcount += 1
        val_scores = cm2score(cm)
        print(f"Epoch {epoch} val:   {val_scores} loss={vloss / max(vcount, 1):.4f}")
        with open(os.path.join(opt.output_dir, "val.txt"), "a") as f:
            f.write(f"Epoch: {epoch}, IoU: {val_scores['iou']:.4f}\n")
        jsonl.write(json.dumps({"epoch": epoch, "train": train_scores, "val": val_scores,
                                "train_loss": train_loss, "time": time.time() - t0}) + "\n")
        jsonl.flush()

        if val_scores["iou"] > best_iou:
            best_iou = val_scores["iou"]
            ckpt.save_best_params(os.path.join(opt.output_dir, "best"),
                                  state.params, state.batch_stats)
            print(f"new best IoU {best_iou:.4f} -> saved best checkpoint")
        ckpt.save_checkpoint(
            os.path.join(opt.output_dir, "last"),
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step, "epoch": epoch,
             "best_iou": best_iou},
        )
    jsonl.close()


if __name__ == "__main__":
    main(parse_option())
