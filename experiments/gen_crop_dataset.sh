#!/bin/bash
# Derive the crop-refine training set /tmp/dspeed_syn/crop from the existing
# 24k-still synthetic set (same poses, seed 1001): each frame is the
# ground-truth crop window rendered at 240x384 with train-split jitter
# simulating first-pass detector noise (spef_tpu/data/synthetic.py::
# create_crop_dataset; window floor 0.2 keeps renders at/below sensor
# resolution).  CPU-only; ~15-25 min on one core.
set -euo pipefail
cd "$(dirname "$0")/.."
STILL=${1:-/tmp/dspeed_syn/still}
CROP_DIR=$(dirname "$STILL")/crop

if [ -f "$CROP_DIR/test/pose.json" ] && [ -f "$CROP_DIR/train/pose.json" ]; then
  n=$(python -c "import json,sys; print(len(json.load(open('$CROP_DIR/train/pose.json'))))")
  if [ "$n" = "20000" ]; then echo "crop dataset already present at $CROP_DIR"; exit 0; fi
fi

JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python - "$STILL" <<'EOF'
import sys
from spef_tpu.data.synthetic import create_crop_dataset
out = create_crop_dataset(sys.argv[1], img_size=(240, 384), seed=1001)
print("crop set ->", out)
EOF
echo "crop dataset ready: $CROP_DIR"
