#!/bin/bash
# R4H — chained after R4F (waits on its sentinel): finish the bit-width
# sweep to the full 16-case set, refresh ACCURACY.md, quiet-chip bench.
# Quiet-by 09:00 UTC (this builder sub-session's horizon); every stage is
# bounded and the chip is quiet at exit, so a driver capture at any later
# point sees an idle chip.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
SWEEP=experiments/bitwidth_sweep
QUIET_BY=$(date -ud '2026-08-20 09:00' +%s)

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

echo "R4H started $(date -u); quiet-by $(date -ud @$QUIET_BY)"

echo "== R4H-0. wait for R4F to finish =="
for i in $(seq 1 240); do
  [ -e experiments/r4f.done ] && break
  if ! kill -0 "$(cat /tmp/r4f.pid 2>/dev/null)" 2>/dev/null; then
    echo "R4F process gone without sentinel; proceeding"; break
  fi
  sleep 30
done

echo "== R4H-I. bit-width sweep to the full 16-case set =="
for N in 11 12 13 14 15 16; do
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

echo "== R4H-II. accuracy summary refresh =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
commit_stage "ACCURACY.md: sweep + crop-refine refresh" ACCURACY.md "$SWEEP"

wait_preempt
settle || exit 1
echo "== R4H-III. quiet-chip bench.py validation =="
timeout 900 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4h.log | tail -2
commit_stage "Round-4 quiet-chip bench validation (R4H)" \
    experiments/fused_r3/bench_py_r4h.log

date -u > experiments/r4h.done
echo "R4H complete $(date -u); chip is quiet"
