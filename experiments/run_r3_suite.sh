#!/bin/bash
# Round-3 accuracy queue (VERDICT r2 "Next round" #1):
#   1. re-evaluate the stale weight-only stage of the r2 default ladder
#      (pre-clip-fix ESA 3.05 -> coherent number);
#   2. w8a8 ladder — uniform 8-bit weights+acts, the TVM/TensorRT-class
#      recipe (reference int8 ESA 0.2088-0.2208), 15 QAT epochs at the
#      fine-tune LR recipe;
#   3. boundary-recipe ladder with 15 QAT epochs (r2 ran only 3).
# One TPU job at a time; tunnel-teardown settle between jobs.
set -uo pipefail
EXP=${1:-experiments/train_synth/exp_dspeed_synth}
OUT=${2:-experiments/accuracy_suite}
mkdir -p "$OUT"

settle() {
  sleep 150
  for i in 1 2 3; do
    timeout 240 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== 1. Re-evaluate weight-only on the r2 default ladder =="
timeout 3600 python experiments/reeval_weight_only.py "$OUT/ladder_default/config" \
    2>&1 | tail -5 | tee "$OUT/reeval_weight_only.log"

settle
echo "== 2. w8a8 ladder (15 QAT epochs, fine-tune LR) =="
timeout 10800 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe w8a8 --qat-epochs 15 --device-data --out "$OUT/ladder_w8a8" \
    2>&1 | tee "$OUT/ladder_w8a8.log" | tail -30

settle
echo "== 3. Boundary ladder (15 QAT epochs, fine-tune LR) =="
timeout 10800 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe boundary --qat-epochs 15 --device-data --out "$OUT/ladder_boundary15" \
    2>&1 | tee "$OUT/ladder_boundary15.log" | tail -30

echo "R3 queue complete: $OUT"
