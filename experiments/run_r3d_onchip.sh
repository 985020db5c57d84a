#!/bin/bash
# R3D chip queue — post-EPnP-fix work items.
#
#   A. calibrated boundary ladder — crashed pre-fix on KeyError 'act_qmax'
#      (quant/calibrate.py now skips float-interior sites); completes the
#      QAT-budget pareto's boundary column.
#   B. keypoints-mode retrain at the full 50-epoch recipe: the first run was
#      (a) cut at epoch 19 by the R3C deadline and (b) selected its best
#      epoch by the pre-fix diverged valid ESA — both fixed now.
#   C. re-evaluate the retrained keypoints model through the fixed decode,
#      regenerate ACCURACY.md.
#
# Each stage commits its artifacts on completion so results survive the
# driver session boundary (VERDICT r2 missing #1: results invisible to git).
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite

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
echo "== A. calibrated boundary ladder (percentile + 3 QAT epochs) =="
timeout 3600 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe boundary --qat-epochs 3 --calibrate percentile --device-data \
    --out "$OUT/ladder_boundarycal" \
    2>&1 | tee "$OUT/ladder_boundarycal.log" | tail -12
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -2
commit_stage "Boundary calibrate-then-QAT ladder artifacts (post calibrate-fix rerun)"

settle
echo "== B. keypoints retrain, full 50-epoch recipe =="
# Overwrites the epoch-19 run (already committed); drop its stale eval
# sidecars so the summarizer can't read old-model numbers.
rm -f experiments/train_synth/exp_keypoints_synth/eval_score_error*
timeout 14400 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 \
    --warm-start "$EXP/model/parameters.msgpack" \
    2>&1 | tee experiments/train_synth/keypoints50.log | tail -8

settle
echo "== C. evaluate retrained keypoints + regenerate ACCURACY.md =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment experiments/train_synth/exp_keypoints_synth --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints50_eval.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -2
commit_stage "Keypoints-mode 50-epoch retrain: artifacts + eval through the fixed EPnP decode"

echo "R3D chip queue complete"

settle
echo "== D. RANSAC vs plain EPnP decode on the retrained keypoints model =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment experiments/train_synth/exp_keypoints_synth --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints50_eval_ransac.log | tail -4
commit_stage "Keypoints decode A/B: RANSAC vs plain EPnP eval artifacts"
echo "R3D stage D complete"

settle
echo "== E. re-tune per-node backends with slope timing + re-bench hybrid =="
SPEF_PACK=1 timeout 6000 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary_slope.log | tail -14
settle
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_slope.log | tail -6
commit_stage "Fused autotune rerun with slope timing: honest per-node backend plan + hybrid re-bench"
echo "R3D stage E complete"

settle
echo "== F. complete the bit-width sensitivity sweep (resumable, per-case commits) =="
for n in 7 8 9 10 11 12 13 14 15; do
  timeout 2400 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py \
      experiments/train_synth/exp_dspeed_synth experiments/accuracy_suite 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results"
done
echo "R3D stage F complete"

settle
echo "== G. final bench.py validation =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r3d.log | tail -2
commit_stage "Round-3 final bench validation artifact"
echo "R3D queue fully complete"
