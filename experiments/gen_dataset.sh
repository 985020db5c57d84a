#!/bin/bash
# Regenerate the synthetic D-SPEED accuracy-protocol dataset at /tmp/dspeed_syn
# (wiped whenever /tmp is recycled between driver segments).
#
#   still/  24k stills (20k train / 2k valid / 2k test), 240x384 wireframe
#           renders, seed 1001 — fully deterministic, reproduces the set the
#           flagship `experiments/train_synth/exp_dspeed_synth` was trained on
#           (verify: apps.eval on the committed checkpoint must print
#           valid esa=0.1293 / test esa=0.1258).
#   video/  the 11 D-SPEED kinematic scenarios (1500 frames @25FPS each),
#           rendered at the same size (reference scenario table
#           `create_dspeed.py:240-468`).
#
# CPU-only (rendering is cv2 on host); ~15-25 min on one core.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/dspeed_syn}

if [ -f "$DATA/still/test/pose.json" ] && [ -f "$DATA/video/Docking/pose.json" ]; then
  echo "dataset already present at $DATA"
  exit 0
fi

echo "== stills (24k @ 240x384) =="
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python - "$DATA" <<'EOF'
import sys
from spef_tpu.data.synthetic import create_synthetic_dataset
root = sys.argv[1]
create_synthetic_dataset(root, n_train=20000, n_valid=2000, n_test=2000,
                         img_size=(240, 384), seed=1001)
print("stills ->", root + "/still")
EOF

echo "== video scenarios (11 x 1500 @ 240x384) =="
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -m spef_tpu.apps.create_dspeed \
    --out "$DATA/video" --skip-still --render \
    --img-height 240 --img-width 384

echo "dataset ready: $DATA"
