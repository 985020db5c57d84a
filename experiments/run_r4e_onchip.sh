#!/bin/bash
# R4E — round-4 main chip schedule (after R4D closed the heatmap evals and
# validated the quiet-chip bench at 30.2k fps).
#   I.    per-frame PDF dump on the chip (resumable; feeds the CPU filter A/B)
#   II.   keypoint regressor-noise vs PnP-sensitivity diagnostic (heatmap head)
#   III.  CPU filter A/B launched in the background (never touches the chip)
#   IV.   bit-width sweep: remaining cases, ONE per invocation, commit each
#   V.    summarize ACCURACY.md once filter A/B lands; commit
#   VI.   quiet-chip bench.py validation; sentinel
#
# Deadline discipline (round-3 postmortem: a builder job on the chip during
# the driver capture cost the round its headline): no sweep case STARTS
# after QUIET_BY - 2100 s, everything is bounded, and the chip is quiet
# after stage VI.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
KPH=experiments/train_synth/exp_keypoints_heatmap_synth
OUT=experiments/accuracy_suite
SWEEP=experiments/bitwidth_sweep
QUIET_BY=$(date -ud '2026-08-20 07:10' +%s)

settle() {
  sleep 5
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

echo "R4E started $(date -u); quiet-by $(date -ud @$QUIET_BY)"

settle || exit 1
echo "== R4E-I. per-frame PDF dump (chip, resumable) =="
timeout 2400 python experiments/tune_temporal.py --dump \
    --experiment "$EXP" --data /tmp/dspeed_syn/video \
    2>&1 | tee -a "$OUT/pdf_dump.log" | grep dumped

settle || exit 1
echo "== R4E-II. keypoint noise diagnostic (heatmap head) =="
timeout 1800 python experiments/keypoint_noise.py \
    --experiment "$KPH" --data /tmp/dspeed_syn/still \
    --out "$OUT/keypoint_noise.json" \
    2>&1 | tee "$OUT/keypoint_noise.log" | tail -6
commit_stage "Keypoint regressor-noise vs PnP-sensitivity measurements (heatmap head)" \
    "$OUT/keypoint_noise.json" "$OUT/keypoint_noise.log"

echo "== R4E-III. CPU filter A/B in background =="
if ls /tmp/video_pdfs/*.npz >/dev/null 2>&1; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup nice -n 19 \
    python experiments/filter_ab.py --experiment "$EXP" --data /tmp/dspeed_syn/video \
    > "$OUT/filter_ab.log" 2>&1 &
  FAB_PID=$!
  echo "filter A/B pid $FAB_PID"
else
  FAB_PID=""
  echo "no PDF dumps present; skipping filter A/B"
fi

echo "== R4E-IV. bit-width sweep tail (deadline-gated, one case per invocation) =="
for N in 9 10 11 12 13 14 15; do
  NOW=$(date +%s)
  if [ "$NOW" -ge $((QUIET_BY - 2100)) ]; then
    echo "deadline guard: $(date -u) — not starting case subset=$N"
    break
  fi
  settle || exit 1
  timeout 2700 python experiments/bitwidth_sweep.py --subset "$N" \
      2>&1 | tee -a "$SWEEP.log" | grep -E "^\[" || true
  commit_stage "Bit-width sweep: cases through subset=$N" \
      "$SWEEP" "$SWEEP.log"
done

echo "== R4E-V. accuracy summary =="
if [ -n "${FAB_PID}" ]; then
  # bounded wait: the A/B is decode math over 16.5k frames on CPU
  for i in $(seq 1 120); do
    kill -0 "$FAB_PID" 2>/dev/null || break
    sleep 30
  done
fi
tail -3 "$OUT/filter_ab.log" || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "ACCURACY.md: noise diagnostic, filter A/B, sweep tail" \
    ACCURACY.md "$OUT/filter_ab.json" "$OUT/filter_ab.log" "$SWEEP"

settle || exit 1
echo "== R4E-VI. quiet-chip bench.py validation =="
timeout 900 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4e.log | tail -2
commit_stage "Round-4 end-of-queue quiet-chip bench validation" \
    experiments/fused_r3/bench_py_r4e.log

date -u > experiments/r4e.done
echo "R4E complete $(date -u); chip is quiet"
