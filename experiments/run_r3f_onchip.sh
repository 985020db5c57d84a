#!/bin/bash
# R3F chip queue — resumes the R3E plan after the VM restart killed it,
# with one new stage up front: re-run the keypoints RANSAC-decode A/B
# through the FIXED epnp_ransac (full-set anchor + guarded GN; the pre-fix
# A/B diverged to 1e5 m positions).  Then the judged-value order from R3E:
#   E. fused re-tune (slope timing) + graph arbitration + re-bench
#      (VERDICT #2 done-criterion);
#   F1. bit-width sweep to >=10 cases (VERDICT #3 asks 10-15);
#   I. heatmap-head keypoints training run + eval;
#   F2. sweep tail to 15 cases;
#   G/H. final bench.py validation + real-TPU test lane.
# Each stage commits its artifacts (results survive session death).
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KP=experiments/train_synth/exp_keypoints_synth
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
OUT=experiments/accuracy_suite

settle() {
  sleep 60
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
echo "== D'. RANSAC vs plain EPnP decode A/B (fixed epnp_ransac) =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KP" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints50_eval_ransac.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Keypoints RANSAC A/B rerun through fixed epnp_ransac (full-set anchor)"

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
echo "== F1. bit-width sweep to >=10 cases =="
for n in 7 8 9 10; do
  timeout 2400 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results"
done

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
settle
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Heatmap-head keypoints run: integral soft-argmax head vs FC regressor"

settle
echo "== F2. sweep tail to 15 cases =="
for n in 11 12 13 14 15; do
  timeout 2400 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results"
done

settle
echo "== G. final bench.py validation =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r3f.log | tail -2
commit_stage "Round-3 final bench validation artifact"

settle
echo "== H. real-TPU test lane (post EPnP-RANSAC fix) =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
    2>&1 | tee experiments/tpu_lane_r3f.log | tail -4
commit_stage "Real-TPU test lane artifact (round-3 final)"
echo "R3F queue fully complete"
