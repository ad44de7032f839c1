#!/bin/bash
# Round-5 chip queue A — pure measurement at r4 HEAD (no code changes needed):
# 1. rs_mamba infer multi-sample (VERDICT r4 #4: settle the 0.892 with a
#    documented multi-sample-median baseline policy)
# 2. reference inference protocol: batch-1 latency for smow_net + LW
#    (VERDICT r4 #3 "missing": test.py:48-49 eval is batch-1)
# 3. one-shot measured infer table for ALL 16 zoo models (VERDICT r4 weak #7)
set -u
cd /root/repo
mkdir -p artifacts/bench_r05

echo "=== verify: synthetic train/eval/resume CLIs $(date +%H:%M:%S)"
python -c "from smow_net_tpu.data.dataset import generate_synthetic_dataset;
generate_synthetic_dataset('/tmp/synth', n_train=12, n_val=5, size=64)"
python train.py --model smow_net --data_dir /tmp/synth --epochs 2 \
  --batchsize 4 --trainsize 64 --output_dir /tmp/out_r5 \
  > artifacts/bench_r05/verify_train_cli.log 2>&1
tail -3 artifacts/bench_r05/verify_train_cli.log
python test.py --model smow_net --data_dir /tmp/synth \
  --checkpoint /tmp/out_r5/best --output_dir /tmp/vis_r5 \
  > artifacts/bench_r05/verify_test_cli.log 2>&1
tail -2 artifacts/bench_r05/verify_test_cli.log
python train.py --model smow_net --data_dir /tmp/synth --epochs 3 \
  --batchsize 4 --trainsize 64 --output_dir /tmp/out_r5 \
  --resume /tmp/out_r5/last \
  > artifacts/bench_r05/verify_resume_cli.log 2>&1
grep -i "resumed" artifacts/bench_r05/verify_resume_cli.log || tail -2 artifacts/bench_r05/verify_resume_cli.log
python -c "import jax; jax.config.update('jax_platforms','cpu'); \
  jax.config.update('jax_num_cpu_devices',8); \
  import __graft_entry__ as g; g.dryrun_multichip(8)" \
  > artifacts/bench_r05/verify_dryrun.log 2>&1
tail -1 artifacts/bench_r05/verify_dryrun.log

run() {
  local model=$1 mode=$2 batch=$3 iters=$4 out=$5
  shift 5
  echo "=== $model $mode (batch $batch) $(date +%H:%M:%S)"
  BENCH_MODEL=$model BENCH_MODE=$mode BENCH_BATCH=$batch BENCH_ITERS=$iters \
    BENCH_DTYPE=bf16 "$@" python bench.py > "$out" 2> "${out%.json}.log"
  cat "$out" || tail -3 "${out%.json}.log"
}

echo "== rs_mamba multi-sample (3 fresh processes) =="
for i in 1 2 3; do
  run rs_mamba infer 4 10 artifacts/bench_r05/rs_mamba_infer_s$i.json
done

echo "== batch-1 latency (reference eval protocol) =="
run smow_net infer 1 50 artifacts/bench_r05/smow_net_infer_bs1.json \
  env BENCH_NO_BASELINE=1
run smow_net_lw infer 1 50 artifacts/bench_r05/smow_net_lw_infer_bs1.json \
  env BENCH_NO_BASELINE=1

echo "== zoo infer table (16 models, 256^2 bf16) =="
for m in fc_ef snunet dtcdscn ifn bit pa_former afcf3d seifnet tfi_gr \
         a2net elgcnet changeformer scratchformer; do
  run $m infer 16 20 artifacts/bench_r05/zoo_${m}_infer.json
done
for m in rs_mamba change_mamba; do
  run $m infer 4 10 artifacts/bench_r05/zoo_${m}_infer.json
done
run cd_mamba infer 4 5 artifacts/bench_r05/zoo_cd_mamba_infer.json
echo "R5A DONE $(date +%H:%M:%S)"
