#!/bin/bash
# R5D chip queue — R5C reordered fast-wins-first while the relay wedge eats
# wall clock: the crop-refine throughput row and the weight-only ladder row
# need only the ALREADY-TRAINED e50 fine model (~30 chip-min together), so
# they run before the ~80-min v2 retrain instead of after it.  Throughput
# is architecture-bound, so the bench row holds for whichever fine model
# wins; the w8 row is re-run only if v2 wins the selection.
# All chip stages run under the freeze watchdog (watchdog_run.sh).
set -uo pipefail
cd /root/repo
SWEEP=experiments/bitwidth_sweep
EXP=experiments/train_synth/exp_dspeed_synth
OUT=experiments/accuracy_suite
TS=experiments/train_synth
E50=$TS/exp_keypoints_crop_synth_e50
V2=$TS/exp_keypoints_crop2_synth
WD="bash experiments/watchdog_run.sh"

commit_stage() {
  local msg="$1"; shift
  git add "$@" || true
  git commit -q -m "$msg" || true
}

wait_preempt() {
  while [ -e experiments/PREEMPT_CHIP ]; do
    echo "preempted: waiting ($(date -u +%H:%M:%S))"
    sleep 60
  done
}

echo "R5D started $(date -u)"

if [ ! -f benchmarks/crop_refine_bench.json ]; then
  echo "== R5D-I. crop-refine engine throughput (fine arch == e50 arch == v2 arch) =="
  wait_preempt
  $WD 7200 600 -- python benchmarks/bench_crop_refine.py --ransac --fine "$E50" \
      > benchmarks/crop_refine_bench.log 2>&1
  tail -4 benchmarks/crop_refine_bench.log
  commit_stage "SPECropRefine throughput row (chained-input harness, batch 256)" \
      benchmarks/crop_refine_bench.json benchmarks/crop_refine_bench.log
fi

if [ ! -f "$OUT/crop_refine_w8.json" ]; then
  echo "== R5D-II. crop-refine weight-only ladder row (e50) =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py --weight-only \
      --fine "$E50" \
      > "$TS/crop_refine_w8_r5.log" 2>&1
  tail -16 "$TS/crop_refine_w8_r5.log"
  commit_stage "Crop-refine weight-only int8 ladder row (schema-free per-channel weight grids)" \
      "$OUT/crop_refine_w8.json" "$TS/crop_refine_w8_r5.log"
fi

if [ ! -f "$V2/model/parameters.msgpack" ]; then
  echo "== R5D-III. train v2 crop model (watchdogged, resumes from orbax) =="
  wait_preempt
  $WD 10800 600 -- python -m spef_tpu.apps.train \
      --config configs/exp_keypoints_crop2_synth.yaml --out "$TS" \
      --checkpoint \
      --warm-start "$TS/exp_keypoints_heatmap_synth/model/parameters.msgpack" \
      >> "$TS/keypoints_crop2.log" 2>&1
  if [ ! -f "$V2/model/parameters.msgpack" ] && [ -f "$V2/checkpoints/best_model.msgpack" ]; then
    mkdir -p "$V2/model"
    cp "$V2/checkpoints/best_model.msgpack" "$V2/model/parameters.msgpack"
    echo "R5D-III: extracted best_model.msgpack after truncated train"
  fi
  grep -E "Best" "$TS/keypoints_crop2.log" | tail -2
  commit_stage "v2 crop fine model trained: 2-jitter windows, ESA best-metric, early LR decay" \
      "$V2/config.yaml" "$V2/model" "$V2/score_error.json" "$TS/keypoints_crop2.log"
fi
touch experiments/r5d_train.done

if [ -f "$V2/model/parameters.msgpack" ] && [ ! -f "$OUT/crop_refine_v2.json" ]; then
  echo "== R5D-IV. crop-refine eval: v2 fine model (incl. gated rows) =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py \
      --fine "$V2" --out "$OUT/crop_refine_v2.json" \
      > "$TS/crop_refine_eval_v2_r5.log" 2>&1
  tail -16 "$TS/crop_refine_eval_v2_r5.log"
  commit_stage "Crop-refine eval: v2 fine model (jittered-window retrain) + coarse-consistency gated rows" \
      "$OUT/crop_refine_v2.json" "$TS/crop_refine_eval_v2_r5.log" \
      "$TS/exp_keypoints_heatmap_synth/crop_refine.json"
fi
touch experiments/r5d_crop_v2.done

BEST_FINE=$(python - <<'EOF'
import json
best, arg = 9e9, "experiments/train_synth/exp_keypoints_crop_synth_e50"
for p in ("experiments/accuracy_suite/crop_refine_e50.json",
          "experiments/accuracy_suite/crop_refine_v2.json"):
    try:
        d = json.load(open(p))
        r = d["results"]
        esa = min(r.get("two_pass_gated_ransac", r["two_pass_ransac"])["esa_score"],
                  r["two_pass_ransac"]["esa_score"])
        if esa < best:
            best, arg = esa, d["fine_exp"]
    except Exception:
        pass
print(arg)
EOF
)
echo "best fine model: $BEST_FINE"
python - "$BEST_FINE" <<'EOF'
import json, sys
with open("experiments/train_synth/exp_keypoints_heatmap_synth/crop_refine.json", "w") as f:
    json.dump({"fine_exp": sys.argv[1]}, f)
EOF
git add "$TS/exp_keypoints_heatmap_synth/crop_refine.json"
git commit -q -m "Engine registry: point crop-refine at the winning fine model" || true

if [ "$BEST_FINE" = "$E50" ] && ! grep -q two_pass_gated "$OUT/crop_refine_e50.json"; then
  echo "== R5D-V. e50 eval refresh: gated rows for the winning fine model =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py \
      --fine "$E50" --out "$OUT/crop_refine_e50.json" \
      > "$TS/crop_refine_eval_e50g_r5.log" 2>&1
  tail -16 "$TS/crop_refine_eval_e50g_r5.log"
  commit_stage "Crop-refine e50 eval refresh: gated rows for the winning fine model" \
      "$OUT/crop_refine_e50.json" "$TS/crop_refine_eval_e50g_r5.log"
elif [ "$BEST_FINE" = "$V2" ] && \
     ! grep -q "crop2" "$OUT/crop_refine_w8.json" 2>/dev/null; then
  echo "== R5D-V. w8 ladder re-run with the winning v2 fine model =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py --weight-only \
      --fine "$V2" \
      > "$TS/crop_refine_w8v2_r5.log" 2>&1
  tail -16 "$TS/crop_refine_w8v2_r5.log"
  commit_stage "Crop-refine weight-only ladder re-run: v2 fine model won the selection" \
      "$OUT/crop_refine_w8.json" "$TS/crop_refine_w8v2_r5.log"
fi

echo "== R5D-VI. bit-width sweep tail (watchdogged, resumes by case name) =="
wait_preempt
$WD 10800 600 -- python experiments/bitwidth_sweep.py \
    >> "$SWEEP.log" 2>&1
grep -E "^\[" "$SWEEP.log" | tail -6
commit_stage "Bit-width sweep tail: remaining mild-width cases" "$SWEEP" "$SWEEP.log"
touch experiments/r5d_sweep.done

echo "== R5D-VII. ACCURACY.md refresh =="
timeout 600 python experiments/summarize_accuracy.py "$EXP" "$OUT" || true
commit_stage "ACCURACY.md refresh: crop-refine gated rows + sweep table" ACCURACY.md

echo "== R5D-VIII. quiet-chip bench validation =="
wait_preempt
sleep 30
$WD 3600 600 -- python bench.py > /tmp/r5d_bench.json 2>&1
tail -1 /tmp/r5d_bench.json
cp /tmp/r5d_bench.json experiments/r5d_bench_validation.json || true
commit_stage "Round-5 quiet-chip bench validation (R5D)" experiments/r5d_bench_validation.json

touch experiments/r5d.done
echo "R5D finished $(date -u)"
