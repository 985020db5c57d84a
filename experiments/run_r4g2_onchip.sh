#!/bin/bash
# R4G2 — resume of R4G after the axon tunnel dropped mid-training (epoch 18
# checkpointed; --checkpoint resumes in place).  Holds PREEMPT_CHIP for the
# whole queue so R4F/R4H stay paused, and removes it at exit.
set -uo pipefail
cd /root/repo
COARSE=experiments/train_synth/exp_keypoints_heatmap_synth
FINE=experiments/train_synth/exp_keypoints_crop_synth
OUT=experiments/accuracy_suite

settle() {
  sleep 5
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 60
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {
  local msg="$1"; shift
  git add "$@" || true
  git commit -q -m "$msg" || true
}

echo "R4G2 started $(date -u)"
touch experiments/PREEMPT_CHIP
trap 'rm -f experiments/PREEMPT_CHIP' EXIT

echo "== R4G2-0. wait for tunnel =="
bash experiments/wait_tunnel.sh 7200 || { echo "tunnel never returned"; exit 1; }

settle || exit 1
echo "== R4G2-I. resume crop-model training (checkpointed at epoch 18) =="
timeout 3600 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_crop_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 --checkpoint \
    2>&1 | tee -a experiments/train_synth/keypoints_crop.log | tail -6
commit_stage "Crop-refine stage-2 model: 50-epoch training artifacts" \
    experiments/train_synth/keypoints_crop.log "$FINE"

settle || exit 1
echo "== R4G2-II. two-pass eval (coarse / two-pass / oracle) =="
timeout 2400 python experiments/crop_refine_eval.py \
    --coarse "$COARSE" --fine "$FINE" \
    --data /tmp/dspeed_syn/still --split test --limit 2000 \
    --out "$OUT/crop_refine.json" \
    2>&1 | tee "$OUT/crop_refine.log" | tail -10
commit_stage "Two-pass crop-refine eval: coarse vs two-pass vs oracle-box rows" \
    "$OUT/crop_refine.json" "$OUT/crop_refine.log" "$COARSE/crop_refine.json"

rm -f experiments/PREEMPT_CHIP
date -u > experiments/r4g.done
echo "R4G2 complete $(date -u); preempt flag removed"
