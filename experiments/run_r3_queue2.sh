#!/bin/bash
# Round-3 chip queue, part 2 (after run_r3_suite.sh):
#   1. re-evaluate the stale weight-only stage of the r2 default ladder
#      (step 1 of run_r3_suite.sh hit the 0-d-array stride bug that was
#      fixed in 552cbef after the queue had already started);
#   2. green real-TPU test lane, committed as an artifact (VERDICT r2 #6);
#   3. keypoints-mode accuracy run: train the keypoint regression head on
#      the 24k-still synthetic set, eval through batched EPnP (VERDICT #4);
#   4. bit-width sensitivity sweep, incremental/resumable (VERDICT #3).
# One TPU job at a time; tunnel-teardown settle between jobs.
set -uo pipefail
EXP=${1:-experiments/train_synth/exp_dspeed_synth}
OUT=${2:-experiments/accuracy_suite}

settle() {
  sleep 150
  for i in 1 2 3; do
    timeout 240 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== 0. Re-evaluate int8 stages hit by the unsigned-grid wrap fix =="
# w8a8 evaluated at 0.61 vs QAT 0.17 purely from int8 wrap of q>127 acts;
# boundary15's unsigned stem/head edges were exposed to the same wrap.
for lad in ladder_w8a8 ladder_boundary15; do
  timeout 3600 python experiments/reeval_int8.py "$OUT/$lad/config" \
      2>&1 | tee /tmp/reeval_int8_$lad.log | tail -6
  tail -40 /tmp/reeval_int8_$lad.log > "$OUT/reeval_int8_$lad.log"
  settle
done

echo "== 1. Re-evaluate weight-only on the r2 default ladder =="
timeout 3600 python experiments/reeval_weight_only.py "$OUT/ladder_default/config" \
    2>&1 | tee /tmp/reeval2.log | tail -5
tail -5 /tmp/reeval2.log > "$OUT/reeval_weight_only.log"

settle
echo "== 2. Real-TPU test lane =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -v \
    2>&1 | tee experiments/tpu_lane_r3.log | tail -8

settle
echo "== 3. Keypoints-mode training run =="
timeout 14400 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    2>&1 | tee experiments/train_synth/keypoints.log | tail -20

settle
echo "== 4. Bit-width sensitivity sweep (resumable) =="
timeout 21600 python experiments/bitwidth_sweep.py \
    --experiment "$EXP" --qat-epochs 3 --out experiments/bitwidth_sweep \
    2>&1 | tee experiments/bitwidth_sweep.log | tail -20

echo "== 5. Regenerate ACCURACY.md from all suite outputs =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" \
    2>&1 | tail -3

echo "R3 queue2 complete"
