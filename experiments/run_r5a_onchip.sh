#!/bin/bash
# R5A chip queue — VERDICT r4 order:
#   1. crop-refine two-pass eval (two rounds overdue; predicted+oracle rows)
#   2. bit-width sweep tail subset=11..16 (scheduled EARLY, not last)
#   3. crop-refine weight-only ladder row
#   4. crop-refine engine throughput benchmark
#   5. ACCURACY.md refresh
#   6. quiet-chip bench validation (non-negotiable regression gate)
# Starts by waiting for the axon tunnel (down since ~08:13, r4g2 shape).
# Every stage is bounded; the chip is quiet at script exit.
set -uo pipefail
cd /root/repo
SWEEP=experiments/bitwidth_sweep
EXP=experiments/train_synth/exp_dspeed_synth
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

wait_preempt() {
  while [ -e experiments/PREEMPT_CHIP ]; do
    echo "preempted: experiments/PREEMPT_CHIP present, waiting ($(date -u +%H:%M:%S))"
    sleep 60
  done
}

echo "R5A started $(date -u)"

echo "== R5A-0. wait for tunnel =="
bash experiments/wait_tunnel.sh 18000 || { echo "tunnel never returned"; exit 1; }

echo "== R5A-I. crop-refine two-pass eval (predicted + oracle box) =="
wait_preempt; settle || exit 1
timeout 3000 python experiments/crop_refine_eval.py \
    2>&1 | tee experiments/train_synth/crop_refine_eval_r5.log | tail -12
commit_stage "Crop-refine two-stage keypoints eval: predicted-box + oracle-box ESA rows (r4's unmeasured headline)" \
    "$OUT/crop_refine.json" experiments/train_synth/crop_refine_eval_r5.log \
    experiments/train_synth/exp_keypoints_heatmap_synth/crop_refine.json
touch experiments/r5a_crop_eval.done

echo "== R5A-II. bit-width sweep tail (subset 11..16, early slot) =="
for N in 11 12 13 14 15 16; do
  wait_preempt; settle || exit 1
  timeout 2700 python experiments/bitwidth_sweep.py --subset "$N" \
      2>&1 | tee -a "$SWEEP.log" | grep -E "^\[" || true
  commit_stage "Bit-width sweep: cases through subset=$N" "$SWEEP" "$SWEEP.log"
done
touch experiments/r5a_sweep.done

echo "== R5A-III. crop-refine weight-only ladder row =="
wait_preempt; settle || exit 1
timeout 3000 python experiments/crop_refine_eval.py --weight-only \
    2>&1 | tee experiments/train_synth/crop_refine_w8_r5.log | tail -12
commit_stage "Crop-refine weight-only int8 ladder row (schema-free per-channel weight grids)" \
    "$OUT/crop_refine_w8.json" experiments/train_synth/crop_refine_w8_r5.log

echo "== R5A-IV. crop-refine engine throughput =="
wait_preempt; settle || exit 1
timeout 1800 python benchmarks/bench_crop_refine.py --ransac \
    2>&1 | tee benchmarks/crop_refine_bench.log | tail -4
commit_stage "SPECropRefine throughput row (chained-input harness, batch 256)" \
    benchmarks/crop_refine_bench.json benchmarks/crop_refine_bench.log

echo "== R5A-V. ACCURACY.md refresh =="
timeout 600 python experiments/summarize_accuracy.py "$EXP" "$OUT" || true
commit_stage "ACCURACY.md refresh: crop-refine rows + full sweep table" ACCURACY.md

echo "== R5A-VI. quiet-chip bench validation =="
wait_preempt
sleep 30  # let any stray work drain
settle || exit 1
timeout 1200 python bench.py 2>&1 | tee /tmp/r5a_bench.json | tail -1
cp /tmp/r5a_bench.json experiments/r5a_bench_validation.json || true
commit_stage "Round-5 quiet-chip bench validation (R5A)" experiments/r5a_bench_validation.json

touch experiments/r5a.done
echo "R5A finished $(date -u)"
