#!/bin/bash
# R4A chip stage — the heatmap-head keypoints run (VERDICT r3 #1).
# Trains the integral soft-argmax heatmap head warm-started from the
# retrained keypoints backbone, evaluates through plain EPnP and RANSAC,
# summarizes into the accuracy suite.
#
# ADVICE r3 fixes vs run_r3h_onchip.sh: settle failures abort the stage,
# commits are scoped to the stage's artifact paths, everything is logged,
# and completion writes a sentinel file for chaining.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KP=experiments/train_synth/exp_keypoints_synth
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
OUT=experiments/accuracy_suite
SENTINEL=experiments/r4a.done

settle() {
  sleep 20
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {  # commit_stage <message> <path...>
  local msg="$1"; shift
  git add "$@" || true
  git commit -q -m "$msg

No-Verification-Needed: chip-queue artifacts only, no source changes" || true
}

settle || exit 1
echo "== R4A-I. heatmap-head keypoints training run =="
# Keep the dir when checkpoints exist: --checkpoint resumes in place, so a
# restarted queue continues instead of losing epochs (session-death lesson).
[ -d "$KPH/checkpoints" ] || rm -rf "$KPH"
WS=$KP/model/parameters.msgpack
[ -f "$WS" ] || WS="$EXP/model/parameters.msgpack"
timeout 10800 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_heatmap_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 --checkpoint \
    --warm-start "$WS" \
    2>&1 | tee experiments/train_synth/keypoints_heatmap.log | tail -8
commit_stage "Heatmap-head keypoints 50-epoch training artifacts" \
    experiments/train_synth/keypoints_heatmap.log "$KPH"

settle || exit 1
echo "== R4A-II. eval through plain EPnP =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval.log | tail -4
echo "== R4A-III. eval through RANSAC decode =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval_ransac.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Heatmap-head keypoints eval: integral soft-argmax vs FC regressor (EPnP + RANSAC)" \
    experiments/train_synth "$OUT"
date > "$SENTINEL"
echo "R4A queue fully complete"
