#!/bin/bash
# R3C chip queue — takes over after the bit-width sweep releases the chip.
#
# Stage order reflects the remaining VERDICT r2 priorities against the round
# budget (hard chip deadline passed as $1, default 21:30 UTC):
#   A. cap the running sweep at >=11 cases (VERDICT #3 asks 10-15) or the
#      stage deadline, whichever first — the sweep is resumable by design;
#   B. fused autotune with per-block backend timing + hybrid fused bench
#      (VERDICT #2 done-criterion: fused bit-exact end-to-end >= 17.7k fps);
#   C. PTQ-calibrated w8a8 ladder — the reference's build_nvidia.py PTQ
#      recipe (no QAT), the true TVM/TRT analogue (VERDICT #1);
#   D. keypoints-mode training run, epochs sized to the time left
#      (VERDICT #4);
#   E. regenerate ACCURACY.md from all suite outputs (CPU).
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
DEADLINE=$(date -d "${1:-21:30}" +%s)
SWEEP_PID=${2:-}
mkdir -p experiments/fused_r3 "$OUT"

left() { echo $(( DEADLINE - $(date +%s) )); }

settle() {
  sleep 90
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== A. sweep cap (>=11 cases or $(date -d @$DEADLINE -u)) =="
if [ -n "$SWEEP_PID" ]; then
  while kill -0 "$SWEEP_PID" 2>/dev/null; do
    N=$(python -c "import json;print(len(json.load(open('experiments/bitwidth_sweep/results.json'))))" 2>/dev/null || echo 0)
    # Leave >=3.6h for stages B-D; cut the sweep once 11 cases landed or
    # the clock forces the issue (results.json is written after each case).
    if [ "$N" -ge 11 ] || [ "$(left)" -lt 14400 ]; then
      echo "capping sweep at $N cases ($(left)s left)"
      kill "$SWEEP_PID" 2>/dev/null
      sleep 20
      kill -9 "$SWEEP_PID" 2>/dev/null
      break
    fi
    sleep 120
  done
  echo "sweep done/capped: $(python -c "import json;print(sorted(json.load(open('experiments/bitwidth_sweep/results.json'))))" 2>/dev/null)"
fi

settle
echo "== B1. fused autotune (packed, boundary, per-block backend) =="
SPEF_PACK=1 timeout 4500 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary_hybrid.log | tail -12

settle
echo "== B2. bench fused(hybrid)+carry (boundary, parity) =="
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_hybrid.log | tail -12

settle
echo "== C. PTQ-calibrated w8a8 ladder (no QAT, percentile) =="
timeout 3600 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe w8a8 --qat-epochs 0 --calibrate percentile --device-data \
    --out "$OUT/ladder_w8a8ptq" \
    2>&1 | tee "$OUT/ladder_w8a8ptq.log" | tail -12

settle
echo "== C2. calibrated w8a8 ladder (percentile + 3 QAT epochs) =="
timeout 3600 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe w8a8 --qat-epochs 3 --calibrate percentile --device-data \
    --out "$OUT/ladder_w8a8cal" \
    2>&1 | tee "$OUT/ladder_w8a8cal.log" | tail -12

settle
echo "== C3. calibrated boundary ladder (percentile + 3 QAT epochs) =="
timeout 3600 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe boundary --qat-epochs 3 --calibrate percentile --device-data \
    --out "$OUT/ladder_boundarycal" \
    2>&1 | tee "$OUT/ladder_boundarycal.log" | tail -12

settle
echo "== D. keypoints-mode training run =="
# Size epochs to the remaining window: ~5.5 min/epoch measured on the
# flagship (same backbone/dataset), reserve 25 min for final eval + EPnP.
KP_EPOCHS=$(( ($(left) - 1500) / 330 ))
[ "$KP_EPOCHS" -gt 40 ] && KP_EPOCHS=40
[ "$KP_EPOCHS" -lt 8 ] && KP_EPOCHS=8
echo "keypoints epochs: $KP_EPOCHS ($(left)s left)"
timeout $(( $(left) > 600 ? $(left) : 600 )) python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs "$KP_EPOCHS" \
    --warm-start "$EXP/model/parameters.msgpack" \
    2>&1 | tee experiments/train_synth/keypoints.log | tail -20

echo "== E. Regenerate ACCURACY.md from all suite outputs =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" \
    2>&1 | tail -3

settle
echo "== F. bench.py driver-entry validation (boundary-carry headline) =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r3.log | tail -3

echo "R3C chip queue complete"
