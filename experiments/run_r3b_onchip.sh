#!/bin/bash
# Round-3 (session B) unattended on-chip pipeline. The /tmp dataset and all
# gitignored ladder binaries (QAT msgpack + int8_graph.pkl) were wiped with
# the working tree between driver segments, so the int8 stages hit by the
# unsigned-grid wrap fix cannot be re-evaluated — they are REBUILT here, and
# this time the QAT checkpoint + int8 graph are force-committed afterwards so
# reevals stay possible (see commit step in the session notes).
#
# Priority order (most valuable first, in case the TPU tunnel dies):
#   1. float-eval verification that the regenerated dataset reproduces the
#      committed flagship numbers (valid 0.1293 / test 0.1258);
#   2. real-TPU test lane artifact (VERDICT r2 #6);
#   3. phase-major fused-kernel tune + bench, boundary recipe (VERDICT #2,
#      target fused >= 17.7k fps);
#   4. ladder_w8a8 rebuild, 15 QAT epochs (corrects the wrap-bug int8 0.61);
#   5. keypoints-mode accuracy run (VERDICT #4);
#   6. bit-width sensitivity sweep (VERDICT #3);
#   7. ladder_default rebuild, 3 QAT epochs (corrects stale weight-only 3.05);
#   8. fused tune+bench default recipe + stage probe;
#   9. ACCURACY.md regeneration (CPU).
# One TPU job at a time; tunnel-teardown settle between jobs.
set -uo pipefail
cd "$(dirname "$0")/.."
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
mkdir -p experiments/fused_r3 "$OUT"

settle() {
  sleep 150
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== 0. dataset =="
bash experiments/gen_dataset.sh || exit 1

echo "== 1. float-eval dataset verification =="
timeout 3600 python -m spef_tpu.apps.eval --experiment "$EXP" \
    --batch-size 64 --cache-dataset \
    2>&1 | tail -20 | tee "$OUT/eval_float_r3b.log"

settle
echo "== 2. real-TPU test lane =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -v \
    2>&1 | tee experiments/tpu_lane_r3.log | tail -8

settle
echo "== 3a. fused autotune (packed, boundary) =="
SPEF_PACK=1 timeout 4800 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary.log | tail -10
settle
echo "== 3b. bench fused+carry (boundary, parity) =="
SPEF_PACK=1 timeout 4800 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary.log | tail -20

settle
echo "== 4. ladder_w8a8 rebuild (15 QAT epochs) =="
timeout 10800 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --recipe w8a8 --qat-epochs 15 --device-data --out "$OUT/ladder_w8a8" \
    2>&1 | tee "$OUT/ladder_w8a8.log" | tail -12

settle
echo "== 5. keypoints-mode training run =="
timeout 14400 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    2>&1 | tee experiments/train_synth/keypoints.log | tail -20

settle
echo "== 6. bit-width sensitivity sweep (resumable) =="
timeout 21600 python experiments/bitwidth_sweep.py \
    --experiment "$EXP" --qat-epochs 3 --out experiments/bitwidth_sweep \
    2>&1 | tee experiments/bitwidth_sweep.log | tail -20

settle
echo "== 7. ladder_default rebuild (3 QAT epochs) =="
timeout 7200 python -m spef_tpu.apps.build_int8 \
    --config "$EXP/config.yaml" \
    --fp32-checkpoint "$EXP/model/parameters.msgpack" \
    --qat-epochs 3 --device-data --out "$OUT/ladder_default" \
    2>&1 | tee "$OUT/ladder_default.log" | tail -12

settle
echo "== 8a. fused autotune (packed, default) =="
SPEF_PACK=1 timeout 4800 python benchmarks/tune_fused.py --recipe default \
    2>&1 | tee experiments/fused_r3/tune_default.log | tail -10
settle
echo "== 8b. bench fused+carry (default, parity) =="
SPEF_PACK=1 timeout 4800 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe default --parity \
    2>&1 | tee experiments/fused_r3/bench_default.log | tail -20
settle
echo "== 8c. stage probe (packed) =="
SPEF_PACK=1 timeout 3600 python benchmarks/probe_stage.py \
    2>&1 | tee experiments/fused_r3/probe_stage.log | tail -20

echo "== 9. Regenerate ACCURACY.md from all suite outputs =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" \
    2>&1 | tail -3

echo "R3B on-chip pipeline complete"
