#!/bin/bash
# R3G chip queue — resumes R3F after the VM restart wiped /tmp/dspeed_syn.
# The R3F D' stage "ran" against the missing dataset, so the committed
# eval_score_error_ransac.json is still the PRE-fix divergent artifact
# (pos 20,770 m in ACCURACY.md) — redoing it is stage 1 here.
# Order (value-per-minute for a ~1h segment):
#   D'. RANSAC vs plain EPnP decode A/B through the FIXED epnp_ransac
#   G.  bench.py final validation
#   H.  real-TPU test lane
#   F.  bit-width sweep cases 8..15 (each ~15 min, commits per case)
#   E.  fused re-tune (slope timing) + re-bench — last; prior conclusion
#       (hybrid 9.2k vs carry 30k, plan routes most nodes to XLA) stands
#       unless the slope-timed sweep changes it.
# Each stage commits its artifacts so results survive session death.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KP=experiments/train_synth/exp_keypoints_synth
OUT=experiments/accuracy_suite
DATA=/tmp/dspeed_syn

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

# Wait for the still dataset (gen_dataset.sh runs in parallel on CPU).
for i in $(seq 1 90); do
  [ -f "$DATA/still/test/pose.json" ] && break
  sleep 30
done
if [ ! -f "$DATA/still/test/pose.json" ]; then
  echo "still dataset never appeared" >&2; exit 1
fi

settle
echo "== D'. RANSAC vs plain EPnP decode A/B (fixed epnp_ransac) =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KP" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints50_eval_ransac.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Keypoints RANSAC A/B: real rerun through fixed epnp_ransac (R3F ran on missing dataset)"

settle
echo "== G. bench.py final validation =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r3g.log | tail -2
commit_stage "Round-3 bench validation artifact (R3G)"

settle
echo "== H. real-TPU test lane =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
    2>&1 | tee experiments/tpu_lane_r3g.log | tail -4
commit_stage "Real-TPU test lane artifact (R3G)"

echo "== F. bit-width sweep cases 8..15 =="
for n in 8 9 10 11 12 13 14 15; do
  settle
  timeout 2400 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results"
done

settle
echo "== E. fused re-tune (slope timing) + re-bench =="
SPEF_PACK=1 timeout 7200 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary_slope.log | tail -16
settle
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_slope.log | tail -6
commit_stage "Fused autotune rerun: slope timing + composed-program plan arbitration + re-bench"

echo "R3G queue fully complete"
