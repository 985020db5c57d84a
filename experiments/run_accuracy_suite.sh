#!/bin/bash
# Post-training accuracy suite (VERDICT r1 item 3: "produce an accuracy
# result"): evaluate the trained flagship, run the quantization ladder
# (float / QAT / weight-only / int8) with ESA deltas, and the temporal
# report over the 11 D-SPEED video sequences.
#
# Inputs: a finished `apps.train` experiment dir + the synthetic D-SPEED set.
# One TPU job at a time — run only when the chip is free.
#
# Usage: bash experiments/run_accuracy_suite.sh \
#            experiments/train_synth/exp_dspeed_synth /tmp/dspeed_syn
set -euo pipefail
EXP=${1:-experiments/train_synth/exp_dspeed_synth}
DATA=${2:-/tmp/dspeed_syn}
OUT=${3:-experiments/accuracy_suite}
mkdir -p "$OUT"

# The tunneled TPU backend wedges if a new client initializes while the
# previous one's teardown is settling — wait + probe between jobs.
settle() {
  sleep 150
  for i in 1 2 3; do
    timeout 240 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== 1. Float evaluation of the trained model =="
python -m spef_tpu.apps.eval --experiment "$EXP" --batch-size 64 --cache-dataset \
    2>&1 | tail -20 | tee "$OUT/eval_float.log"

settle
# Recipe notes (measured, round 3 — see ACCURACY.md):
#   * --calibrate percentile initializes every learned activation grid from
#     float-activation statistics (calibrate-then-QAT, build_nvidia.py
#     methodology) — without it short fine-tunes rank warm-up noise;
#   * 15 QAT epochs reach ~0.15 test ESA on the boundary recipe vs ~0.19
#     at 3 epochs (float baseline 0.126).
echo "== 2. Quantization ladder (QAT warm-start from the trained fp32) =="
python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --calibrate percentile --qat-epochs 15 --device-data --out "$OUT/ladder_default" \
    2>&1 | tail -30 | tee "$OUT/ladder_default.log"

settle
echo "== 3. Boundary-recipe ladder (TPU-speed recipe accuracy cost) =="
python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe boundary --calibrate percentile --qat-epochs 15 --device-data \
    --out "$OUT/ladder_boundary" \
    2>&1 | tail -30 | tee "$OUT/ladder_boundary.log"

settle
echo "== 4. Temporal report over the 11 video sequences =="
python -m spef_tpu.apps.temporal_eval --experiment "$EXP" \
    --data "$DATA/video" --plots --out "$OUT/temporal" \
    2>&1 | tail -20 | tee "$OUT/temporal.log"

echo "Suite complete: $OUT"
