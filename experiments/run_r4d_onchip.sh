#!/bin/bash
# R4D — supervised tail of the round-4 chip schedule (replaces the killed
# R4C supervisor; the in-flight heatmap training process was left running).
#   I.   wait for the heatmap training process to exit; commit artifacts
#   II.  eval through plain EPnP, then through RANSAC decode; summarize
#   III. quiet-chip bench.py validation                    (VERDICT #2)
# Everything is bounded so the chip is QUIET well before the 04:20 driver
# capture (round-3 postmortem: a builder job on the chip during capture
# cost the round its headline).  The transition probe / fused re-bench are
# NOT chained here — they run manually only if the round visibly continues.
set -uo pipefail
cd /root/repo
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
TRAIN_PID=${1:?usage: run_r4d_onchip.sh <training-pid>}

settle() {
  sleep 10
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 60
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {  # commit_stage <message> <path...>
  local msg="$1"; shift
  git add "$@" || true
  git commit -q -m "$msg" || true
}

echo "R4D started $(date -u); waiting on training pid $TRAIN_PID"
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 20; done
echo "training exited $(date -u)"
sleep 10
commit_stage "Heatmap-head keypoints 50-epoch training artifacts" \
    experiments/train_synth/keypoints_heatmap.log "$KPH"

settle || exit 1
echo "== R4D-II. eval through plain EPnP =="
timeout 1500 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval.log | tail -4
echo "== R4D-IIb. eval through RANSAC decode =="
timeout 1500 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval_ransac.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Heatmap-head keypoints eval: EPnP + RANSAC rows" \
    experiments/train_synth/keypoints_heatmap_eval.log \
    experiments/train_synth/keypoints_heatmap_eval_ransac.log \
    "$KPH" ACCURACY.md "$OUT"

settle || exit 1
echo "== R4D-III. quiet-chip bench.py validation =="
timeout 900 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4d.log | tail -2
commit_stage "Round-4 quiet-chip bench validation artifact" \
    experiments/fused_r3/bench_py_r4d.log

date -u > experiments/r4d.done
echo "R4D complete $(date -u); chip is quiet"
