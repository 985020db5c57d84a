#!/bin/bash
# Round-3 unattended on-chip pipeline: waits for the TPU tunnel to come
# back (it dropped ~18:00 Aug 17), then runs
#   A. real-TPU test lane (artifact: experiments/tpu_lane_r3.log)
#   B. phase-major fused-kernel benchmarks: tune -> bench (both recipes)
#      -> stage probe (VERDICT r2 #2; target fused >= 17.7k fps)
#   C. chip queue 2 (reeval int8 ladders -> keypoints run -> bit-width
#      sweep) via run_r3_queue2.sh.
# One TPU job at a time; tunnel-teardown settle between jobs.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=experiments/accuracy_suite
mkdir -p experiments/fused_r3

settle() {
  sleep 150
  for i in 1 2 3; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" && return 0
    sleep 120
  done
  echo "TPU probe failed" >&2; return 1
}

echo "== waiting for tunnel =="
bash experiments/wait_tunnel.sh "${TUNNEL_DEADLINE:-28800}" || exit 1

echo "== A. real-TPU test lane =="
SPEF_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -v \
    2>&1 | tee experiments/tpu_lane_r3.log | tail -8

settle
echo "== B1. fused autotune (packed, boundary) =="
SPEF_PACK=1 timeout 3600 python benchmarks/tune_fused.py --recipe boundary \
    2>&1 | tee experiments/fused_r3/tune_boundary.log | tail -10
settle
echo "== B2. fused autotune (packed, default) =="
SPEF_PACK=1 timeout 3600 python benchmarks/tune_fused.py --recipe default \
    2>&1 | tee experiments/fused_r3/tune_default.log | tail -10
settle
echo "== B3. bench fused+carry (boundary, parity) =="
SPEF_PACK=1 timeout 3600 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe boundary --parity \
    2>&1 | tee experiments/fused_r3/bench_boundary.log | tail -20
settle
echo "== B4. bench fused+carry (default, parity) =="
SPEF_PACK=1 timeout 3600 python benchmarks/bench_paths.py \
    --paths fused,carry --recipe default --parity \
    2>&1 | tee experiments/fused_r3/bench_default.log | tail -20
settle
echo "== B5. stage probe (packed) =="
SPEF_PACK=1 timeout 3600 python benchmarks/probe_stage.py \
    2>&1 | tee experiments/fused_r3/probe_stage.log | tail -20

settle
echo "== C. chip queue 2 =="
bash experiments/run_r3_queue2.sh

echo "R3 on-chip pipeline complete"
