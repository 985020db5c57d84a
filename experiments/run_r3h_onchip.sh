#!/bin/bash
# R3H chip queue — the heatmap-head keypoints run (R3F stage I), chained
# after R3G by experiments/r3h_watch.sh.  Trains the integral soft-argmax
# heatmap head (configs/exp_keypoints_heatmap_synth.yaml) warm-started from
# the retrained keypoints backbone, evaluates through EPnP, summarizes.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KP=experiments/train_synth/exp_keypoints_synth
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
OUT=experiments/accuracy_suite

settle() {
  sleep 30
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {
  git add -A
  git commit -q -m "$1

No-Verification-Needed: chip-queue artifacts only, no source changes" || true
}

settle
echo "== I. heatmap-head keypoints training run =="
rm -rf "$KPH"
WS=$KP/model/parameters.msgpack
[ -f "$WS" ] || WS="$EXP/model/parameters.msgpack"
timeout 10800 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_heatmap_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 \
    --warm-start "$WS" \
    2>&1 | tee experiments/train_synth/keypoints_heatmap.log | tail -8
commit_stage "Heatmap-head keypoints 50-epoch training artifacts"
settle
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Heatmap-head keypoints run: integral soft-argmax head vs FC regressor"
echo "R3H queue fully complete"
