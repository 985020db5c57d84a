#!/bin/bash
# R4F — resume of R4E after the axon tunnel dropped mid-queue (R4E stages
# I-III completed: PDF dump, keypoint-noise diagnostic, CPU filter A/B).
#   0.    wait for the tunnel to come back (bounded)
#   I.    bit-width sweep tail: one case per invocation, deadline-gated,
#         commit each; a PREEMPT_CHIP flag file pauses the loop between
#         cases so an interactive training run can take the chip
#   II.   accuracy summary refresh; commit
#   III.  quiet-chip bench.py validation; sentinel
# Deadline discipline (round-3 postmortem): no sweep case STARTS after
# QUIET_BY - 2100 s and the chip is quiet after stage III.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
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

wait_preempt() {
  while [ -e experiments/PREEMPT_CHIP ]; do
    echo "preempted: experiments/PREEMPT_CHIP present, waiting ($(date -u +%H:%M:%S))"
    sleep 60
  done
}

echo "R4F started $(date -u); quiet-by $(date -ud @$QUIET_BY)"

echo "== R4F-0. wait for tunnel =="
bash experiments/wait_tunnel.sh 5400 || { echo "tunnel never returned"; exit 1; }

echo "== R4F-I. bit-width sweep tail (deadline- and preempt-gated) =="
for N in 9 10 11 12 13 14 15 16; do
  wait_preempt
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

echo "== R4F-II. accuracy summary =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "ACCURACY.md: sweep tail refresh" ACCURACY.md "$SWEEP"

wait_preempt
settle || exit 1
echo "== R4F-III. quiet-chip bench.py validation =="
timeout 900 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4f.log | tail -2
commit_stage "Round-4 end-of-queue quiet-chip bench validation (R4F)" \
    experiments/fused_r3/bench_py_r4f.log

date -u > experiments/r4f.done
echo "R4F complete $(date -u); chip is quiet"
