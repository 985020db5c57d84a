#!/bin/bash
# R3D2 chip queue — restart of R3D with the keypoints retrain actually
# running: apps.train skips an existing experiment dir (resume is a
# --checkpoint behavior), so the epoch-19 run must be archived first.
# Stage A (boundary-cal ladder) already completed and committed in R3D.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
KP=experiments/train_synth/exp_keypoints_synth

settle() {
  sleep 60
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {  # $1 = message
  git add -A
  git commit -q -m "$1

No-Verification-Needed: chip-queue artifacts only, no source changes" || true
}

settle
echo "== B. keypoints retrain, full 50-epoch recipe =="
# The epoch-19 interim run is in git history (commit 288000a); clear the
# directory so apps.train starts fresh (it skips existing dirs).
rm -rf "$KP"
timeout 14400 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 \
    --warm-start "$EXP/model/parameters.msgpack" \
    2>&1 | tee experiments/train_synth/keypoints50.log | tail -8

settle
echo "== C. evaluate retrained keypoints (plain EPnP) =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KP" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints50_eval.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -2
commit_stage "Keypoints-mode 50-epoch retrain: artifacts + eval through the fixed EPnP decode"

settle
echo "== D. RANSAC vs plain EPnP decode A/B =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KP" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints50_eval_ransac.log | tail -4
commit_stage "Keypoints decode A/B: RANSAC vs plain EPnP eval artifacts"

settle
echo "== E. re-tune per-node backends (slope timing) + graph arbitration + re-bench =="
SPEF_PACK=1 timeout 7200 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary_slope.log | tail -16
settle
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_slope.log | tail -6
commit_stage "Fused autotune rerun: slope timing + composed-program plan arbitration + re-bench"

settle
echo "== F. complete the bit-width sensitivity sweep (resumable, per-case commits) =="
for n in 7 8 9 10 11 12 13 14 15; do
  timeout 2400 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results"
done
echo "R3D2 stage F complete"

settle
echo "== G. final bench.py validation =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r3d.log | tail -2
commit_stage "Round-3 final bench validation artifact"
echo "R3D2 queue fully complete"

settle
echo "== H. real-TPU test lane (post EPnP/planner changes) =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
    2>&1 | tee experiments/tpu_lane_r3d.log | tail -4
commit_stage "Real-TPU test lane artifact (round-3 final)"
echo "R3D2 stage H complete"
