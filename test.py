#!/usr/bin/env python
"""Evaluation / inference driver (TPU-native mirror of the reference test.py):
loads a checkpoint, runs inference over the test split, writes per-image
TP(white)/TN(black)/FP(red)/FN(green) visualisations (reference
test.py:142-150) and prints mean loss + metric summary."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def parse_option():
    p = argparse.ArgumentParser("smow_net_tpu evaluation")
    p.add_argument("--model", type=str, default="smow_net")
    p.add_argument("--data_dir", type=str, default="./LEVIR-CD-256")
    p.add_argument("--checkpoint", type=str, default="",
                   help="orbax checkpoint dir written by train.py")
    p.add_argument("--torch_ckpt", type=str, default="",
                   help="reference-trained PyTorch state_dict (.pth); "
                        "converted on the fly (incl. the DataParallel "
                        "'module.' strip, reference test.py:97-102) so "
                        "reference checkpoints can be evaluated directly")
    p.add_argument("--trainsize", type=int, default=256,
                   help="model init size for --torch_ckpt conversion")
    p.add_argument("--output_dir", type=str, default="./test_output")
    p.add_argument("--batchsize", type=int, default=1)
    p.add_argument("--save_vis", action="store_true", default=True)
    p.add_argument("--no_save_vis", dest="save_vis", action="store_false")
    return p.parse_args()


def colorize(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """TP white, TN black, FP red, FN green (BGR for cv2)."""
    h, w = pred.shape
    vis = np.zeros((h, w, 3), np.uint8)
    tp = (pred == 1) & (gt == 1)
    fp = (pred == 1) & (gt == 0)
    fn = (pred == 0) & (gt == 1)
    vis[tp] = (255, 255, 255)
    vis[fp] = (0, 0, 255)
    vis[fn] = (0, 255, 0)
    return vis


def main(opt):
    import cv2

    from smow_net_tpu.data.dataset import CDDataset, DataLoader, prefetch_to_device
    from smow_net_tpu.models import get_model
    from smow_net_tpu.train import checkpoint as ckpt
    from smow_net_tpu.train.metrics import cm2score
    from smow_net_tpu.train.trainer import make_eval_step

    os.makedirs(opt.output_dir, exist_ok=True)
    ds = CDDataset(opt.data_dir, "test")
    loader = DataLoader(ds, opt.batchsize, shuffle=False, num_workers=8)
    model = get_model(opt.model)
    if opt.torch_ckpt:
        import jax.numpy as jnp

        from smow_net_tpu.train.ingest import ingest_torch_checkpoint

        s = opt.trainsize
        x = jnp.zeros((1, s, s, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
        variables = ingest_torch_checkpoint(opt.model, opt.torch_ckpt, variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    elif opt.checkpoint:
        params, batch_stats = ckpt.restore_best_params(opt.checkpoint)
    else:
        raise SystemExit("one of --checkpoint / --torch_ckpt is required")
    eval_step = make_eval_step(model)

    cm = np.zeros((2, 2))
    total_loss, count, img_idx = 0.0, 0, 0
    for batch in prefetch_to_device(iter(loader)):
        c, loss, pred = eval_step(params, batch_stats, batch)
        cm += np.asarray(c)
        total_loss += float(loss)
        count += 1
        if opt.save_vis:
            pred_np = (np.asarray(pred) > 0.5).astype(np.uint8)
            gt_np = (np.asarray(batch["mask"]) > 0.5).astype(np.uint8)
            valid = np.asarray(batch["valid"])
            for b in range(pred_np.shape[0]):
                if valid[b] < 0.5:
                    continue
                name = ds.names[img_idx] if img_idx < len(ds.names) else f"{img_idx}.png"
                cv2.imwrite(os.path.join(opt.output_dir, name),
                            colorize(pred_np[b], gt_np[b]))
                img_idx += 1

    print(f"mean loss: {total_loss / max(count, 1):.4f}")
    scores = cm2score(cm)
    for k, v in scores.items():
        print(f"{k}: {v:.4f}")
    return scores


if __name__ == "__main__":
    main(parse_option())
