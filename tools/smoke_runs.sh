#!/bin/bash
# Recorded end-to-end TPU smoke runs (VERDICT #9): short synthetic trainings
# through the real train.py -> test.py CLIs, artifacts committed in-repo.
set -e
cd /root/repo
python -c "from smow_net_tpu.data.dataset import generate_synthetic_dataset; generate_synthetic_dataset('/tmp/synth64', n_train=24, n_val=8, size=64)"
for m in smow_net snunet change_mamba; do
  out=artifacts/smoke_r02/$m
  rm -rf $out && mkdir -p $out
  python train.py --model $m --data_dir /tmp/synth64 --epochs 3 --batchsize 4 \
    --trainsize 64 --lr 3e-4 --output_dir $out 2>&1 | tail -20 > $out/train_tail.log
  python test.py --model $m --data_dir /tmp/synth64 --checkpoint $out/best \
    --output_dir $out/vis > $out/test.log 2>&1 || true
  # keep only small text artifacts in git (ckpts/pngs stay untracked)
  tail -5 $out/test.log || true
done
echo SMOKE_DONE
