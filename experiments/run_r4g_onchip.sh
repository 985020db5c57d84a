#!/bin/bash
# R4G — crop-refine stage-2 training + two-pass eval (preempts the R4F sweep
# tail between cases via experiments/PREEMPT_CHIP; R4F resumes after).
#   I.   wait until R4F yields the chip (it checks the flag between cases)
#   II.  50-epoch crop-model training (warm start: trained full-frame
#        heatmap model — identical architecture)
#   III. two-pass eval: coarse-only vs two-pass vs oracle-box, EPnP+RANSAC
#   IV.  remove the preempt flag so R4F finishes (deadline-gated) and runs
#        its quiet-chip bench
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

echo "R4G started $(date -u)"
touch experiments/PREEMPT_CHIP
trap 'rm -f experiments/PREEMPT_CHIP' EXIT

echo "== R4G-I. waiting for R4F to yield the chip =="
for i in $(seq 1 60); do
  if [ -e experiments/r4f.done ]; then echo "R4F already complete"; break; fi
  if ! kill -0 "$(cat /tmp/r4f.pid 2>/dev/null)" 2>/dev/null; then
    echo "R4F not running"; break
  fi
  if tail -2 experiments/r4f_queue.log | grep -q "preempted"; then
    echo "R4F paused at the preempt gate"; break
  fi
  sleep 30
done

settle || exit 1
echo "== R4G-II. crop-model 50-epoch training =="
[ -d "$FINE/checkpoints" ] || rm -rf "$FINE"
WS=$COARSE/model/parameters.msgpack
timeout 3600 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_crop_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 --checkpoint \
    --warm-start "$WS" \
    2>&1 | tee experiments/train_synth/keypoints_crop.log | tail -6
commit_stage "Crop-refine stage-2 model: 50-epoch training artifacts" \
    experiments/train_synth/keypoints_crop.log "$FINE"

settle || exit 1
echo "== R4G-III. two-pass eval (coarse / two-pass / oracle) =="
timeout 2400 python experiments/crop_refine_eval.py \
    --coarse "$COARSE" --fine "$FINE" \
    --data /tmp/dspeed_syn/still --split test --limit 2000 \
    --out "$OUT/crop_refine.json" \
    2>&1 | tee "$OUT/crop_refine.log" | tail -10
commit_stage "Two-pass crop-refine eval: coarse vs two-pass vs oracle-box rows" \
    "$OUT/crop_refine.json" "$OUT/crop_refine.log"

rm -f experiments/PREEMPT_CHIP
date -u > experiments/r4g.done
echo "R4G complete $(date -u); preempt flag removed"
