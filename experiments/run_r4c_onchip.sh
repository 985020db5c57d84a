#!/bin/bash
# R4C chip queue — the round-4 execution session (fresh VM: the R4A/R4B
# queues written last segment never ran because /tmp and all processes
# were recycled).  Single ordered pipeline, value-per-minute:
#   I.   PDF dump (chip, short) -> spawns filter A/B on CPU in parallel
#   II.  heatmap-head keypoints 50-epoch run + EPnP/RANSAC evals  (VERDICT #1)
#   III. fused re-bench under measured transition costs            (VERDICT #3)
#   IV.  bit-width sweep remaining cases until DEADLINE            (VERDICT #4)
#   V.   quiet-chip bench.py validation                            (VERDICT #2)
# A wall-clock deadline guards the round-3 failure mode (builder job on
# the chip when the driver captures BENCH): no new sweep case starts
# after DEADLINE-35min; stage V always runs; after V the chip is quiet.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KP=experiments/train_synth/exp_keypoints_synth
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
OUT=experiments/accuracy_suite
SENTINEL=experiments/r4c.done
DEADLINE=${R4C_DEADLINE:-$(date -d '2026-08-20 04:20' +%s)}

settle() {
  sleep 15
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

commit_stage() {  # commit_stage <message> <path...>
  local msg="$1"; shift
  git add "$@" || true
  git commit -q -m "$msg

No-Verification-Needed: chip-queue artifacts only, no source changes" || true
}

echo "R4C queue started $(date -u), deadline $(date -ud @"$DEADLINE")"

# This queue is launched only after the transition probe has exited (the
# session supervises that directly); wait for the video dataset render.
for i in $(seq 1 60); do
  [ -f /tmp/dspeed_syn/video/Docking/pose.json ] && break
  sleep 60
done
if [ ! -f /tmp/dspeed_syn/video/Docking/pose.json ]; then
  echo "video dataset never appeared; aborting" >&2; exit 1
fi
commit_stage "Fused executor: measured composed-segment transition costs (R4C probe)" \
  experiments/fused_r3/probe_transition.log benchmarks/transition_costs.json \
  benchmarks/fused_tuning.json

settle || exit 1
echo "== R4C-I. per-frame PDF dump (chip) =="
timeout 2700 python experiments/tune_temporal.py --dump \
    --experiment "$EXP" --data /tmp/dspeed_syn/video \
    2>&1 | tee experiments/accuracy_suite/pdf_dump.log | tail -4
# Filter A/B is decode+filter math on the dumps: CPU-only, run in parallel
# with the training stage below.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup timeout 10800 \
    python experiments/filter_ab.py \
    > experiments/accuracy_suite/filter_ab.log 2>&1 &
FILTER_PID=$!

settle || exit 1
echo "== R4C-II. heatmap-head keypoints training run =="
# Keep the dir when checkpoints exist: --checkpoint resumes in place.
[ -d "$KPH/checkpoints" ] || rm -rf "$KPH"
WS=$KP/model/parameters.msgpack
[ -f "$WS" ] || WS="$EXP/model/parameters.msgpack"
timeout 9000 python -m spef_tpu.apps.train \
    --config configs/exp_keypoints_heatmap_synth.yaml \
    --out experiments/train_synth --device-data --device-augment \
    --epochs 50 --checkpoint \
    --warm-start "$WS" \
    2>&1 | tee experiments/train_synth/keypoints_heatmap.log | tail -6
commit_stage "Heatmap-head keypoints 50-epoch training artifacts" \
    experiments/train_synth/keypoints_heatmap.log "$KPH"

settle || exit 1
echo "== R4C-IIb. eval through plain EPnP =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval.log | tail -4
echo "== R4C-IIc. eval through RANSAC decode =="
timeout 2400 python -m spef_tpu.apps.eval \
    --experiment "$KPH" --batch-size 64 --ransac \
    2>&1 | tee experiments/train_synth/keypoints_heatmap_eval_ransac.log | tail -4
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "Heatmap-head keypoints eval: EPnP + RANSAC rows" \
    experiments/train_synth/keypoints_heatmap_eval.log \
    experiments/train_synth/keypoints_heatmap_eval_ransac.log \
    "$KPH" ACCURACY.md "$OUT"

settle || exit 1
echo "== R4C-III. fused re-bench under transition-aware arbitration =="
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_transaware.log | tail -8
commit_stage "Fused executor re-bench under measured transition-aware planning" \
    experiments/fused_r3 benchmarks/fused_tuning.json

echo "== R4C-IV. bit-width sweep: remaining cases =="
for n in 9 10 11 12 13 14 15 16; do
  if [ "$(date +%s)" -gt $((DEADLINE - 2100)) ]; then
    echo "deadline guard: skipping remaining sweep cases from $n"
    break
  fi
  settle || exit 1
  timeout 2700 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/16 results" \
      experiments/bitwidth_sweep experiments/bitwidth_sweep.log ACCURACY.md "$OUT"
done

# Harvest the filter A/B if it finished (it is CPU-only; never blocks the chip).
if ! kill -0 "$FILTER_PID" 2>/dev/null; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Temporal filter A/B: still vs PDF(ref/tuned) vs Kalman/EMA/MA/FIR" \
      experiments/accuracy_suite ACCURACY.md
fi

settle || exit 1
echo "== R4C-V. quiet-chip bench.py validation =="
timeout 1200 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4c.log | tail -2
commit_stage "Round-4 quiet-chip bench validation artifact" \
    experiments/fused_r3/bench_py_r4c.log

date -u > "$SENTINEL"
echo "R4C queue complete $(date -u); chip is quiet"
