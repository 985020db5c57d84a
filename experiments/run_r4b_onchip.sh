#!/bin/bash
# R4B chip queue — chained after R4A (heatmap keypoints run) completes.
# Order (VERDICT r3 priorities, value-per-minute):
#   B1. transition probe (measured composed segments) + fused re-bench
#       -> resolves weak #3 (17.7k criterion: hit it or retire with data)
#   B2. PDF dump + temporal filter A/B table -> closes #5
#   B3. bit-width sweep remaining cases (resumable, commit per case) -> #4
#   B4. quiet-chip bench.py validation -> #2
# A wall-clock deadline guards against the round-3 failure mode (sweep
# still on the chip when the driver captures BENCH): no new sweep case
# starts after DEADLINE; B4 always runs.
set -uo pipefail
cd /root/repo
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
SENTINEL_IN=experiments/r4a.done
SENTINEL=experiments/r4b.done
DEADLINE=${R4B_DEADLINE:-$(date -d '2026-08-20 02:10' +%s)}

settle() {
  sleep 20
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

echo "R4B watcher started $(date -u)"
for i in $(seq 1 480); do
  [ -f "$SENTINEL_IN" ] && break
  sleep 60
done
if [ ! -f "$SENTINEL_IN" ]; then
  echo "R4A sentinel never appeared after 8h; aborting" >&2; exit 1
fi
echo "R4A complete, starting R4B $(date -u)"

settle || exit 1
echo "== B1a. composed-segment transition probe =="
SPEF_PACK=1 timeout 3600 python benchmarks/probe_transition.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/probe_transition.log | tail -8
settle || exit 1
echo "== B1b. fused re-bench under transition-aware arbitration =="
SPEF_PACK=1 timeout 2700 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary_transaware.log | tail -8
commit_stage "Fused executor: measured transition costs + transition-aware re-bench" \
    experiments/fused_r3 benchmarks/fused_tuning.json

settle || exit 1
echo "== B2. PDF dump + temporal filter A/B =="
timeout 3600 python experiments/tune_temporal.py --dump \
    --experiment "$EXP" --data /tmp/dspeed_syn/video \
    2>&1 | tail -12
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 7200 python experiments/filter_ab.py \
    --experiment "$EXP" --data /tmp/dspeed_syn/video \
    2>&1 | tee experiments/accuracy_suite/filter_ab.log | tail -12
commit_stage "Temporal filter A/B: still vs PDF(ref/tuned) vs Kalman/EMA/MA/FIR on 11 scenarios" \
    experiments/accuracy_suite

echo "== B3. bit-width sweep: remaining cases =="
for n in 9 10 11 12 13 14 15; do
  if [ "$(date +%s)" -gt $((DEADLINE - 2100)) ]; then
    echo "deadline guard: skipping remaining sweep cases from $n"
    break
  fi
  settle || exit 1
  timeout 2700 python experiments/bitwidth_sweep.py --subset "$n" \
      2>&1 | tee -a experiments/bitwidth_sweep.log | tail -3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/summarize_accuracy.py "$EXP" "$OUT" 2>&1 | tail -1
  commit_stage "Bit-width sweep: case $n/15 results" \
      experiments/bitwidth_sweep experiments/bitwidth_sweep.log "$OUT"
done

settle || exit 1
echo "== B4. quiet-chip bench.py validation =="
timeout 1800 python bench.py 2>&1 | tee experiments/fused_r3/bench_py_r4.log | tail -2
commit_stage "Round-4 bench validation artifact (quiet chip)" experiments/fused_r3

date > "$SENTINEL"
echo "R4B queue fully complete $(date -u)"
