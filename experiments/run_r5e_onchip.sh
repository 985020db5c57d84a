#!/bin/bash
# R5E chip queue — v2 retrain rerun after the crop2 corrupt-PNG failure.
# R5D's train stage exited 0 in seconds: a 0-byte PNG (half-written file
# left by the killed duplicate crop2 render) raised UnidentifiedImageError
# inside the loader and apps.train's reference-style per-experiment
# "log error and continue" (train.py:106-131 semantics) swallowed it.
# The frame was re-rendered from its stored pose+window and the whole
# crop2 set PIL-verified (exactly one bad file).  This queue re-runs the
# train with a hard artifact check, then the v2 eval + selection, then the
# remaining sweep cases, ACCURACY refresh and the quiet-chip bench gate.
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

echo "R5E started $(date -u)"

if [ ! -f "$V2/model/parameters.msgpack" ]; then
  echo "== R5E-I. train v2 crop model (rerun on repaired crop2) =="
  wait_preempt
  for try in 1 2; do
    $WD 10800 600 -- python -m spef_tpu.apps.train \
        --config configs/exp_keypoints_crop2_synth.yaml --out "$TS" \
        --checkpoint \
        --warm-start "$TS/exp_keypoints_heatmap_synth/model/parameters.msgpack" \
        >> "$TS/keypoints_crop2.log" 2>&1
    if [ -f "$V2/model/parameters.msgpack" ] || [ -f "$V2/checkpoints/best_model.msgpack" ]; then
      break
    fi
    echo "R5E-I: try $try produced no checkpoint (loader error? see log tail):"
    grep -vE "^INFO:absl|^WARNING" "$TS/keypoints_crop2.log" | tail -3
  done
  if [ ! -f "$V2/model/parameters.msgpack" ] && [ -f "$V2/checkpoints/best_model.msgpack" ]; then
    mkdir -p "$V2/model"
    cp "$V2/checkpoints/best_model.msgpack" "$V2/model/parameters.msgpack"
    echo "R5E-I: extracted best_model.msgpack after truncated train"
  fi
  grep -E "Best" "$TS/keypoints_crop2.log" | tail -2
  commit_stage "v2 crop fine model trained: 2-jitter windows, ESA best-metric, early LR decay (rerun on repaired crop2)" \
      "$V2/config.yaml" "$V2/model" "$V2/score_error.json" "$TS/keypoints_crop2.log"
fi

if [ -f "$V2/model/parameters.msgpack" ] && [ ! -f "$OUT/crop_refine_v2.json" ]; then
  echo "== R5E-II. crop-refine eval: v2 fine model (incl. gated rows) =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py \
      --fine "$V2" --out "$OUT/crop_refine_v2.json" \
      > "$TS/crop_refine_eval_v2_r5.log" 2>&1
  tail -16 "$TS/crop_refine_eval_v2_r5.log"
  commit_stage "Crop-refine eval: v2 fine model (jittered-window retrain) + coarse-consistency gated rows" \
      "$OUT/crop_refine_v2.json" "$TS/crop_refine_eval_v2_r5.log" \
      "$TS/exp_keypoints_heatmap_synth/crop_refine.json"
fi

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

if [ ! -f "$OUT/crop_refine_valid.json" ]; then
  echo "== R5E-IIIa. gate tau tuning on the VALID split (winning fine model) =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py \
      --fine "$BEST_FINE" --split valid \
      --gate 0.02 --gate-sweep "0.015,0.025,0.03,0.04,0.05" \
      --out "$OUT/crop_refine_valid.json" \
      > "$TS/crop_refine_valid_r5.log" 2>&1
  tail -16 "$TS/crop_refine_valid_r5.log"
fi

TAU=$(python - <<'EOF'
import json, re
try:
    d = json.load(open("experiments/accuracy_suite/crop_refine_valid.json"))
except Exception:
    print("0.02"); raise SystemExit
r = d["results"]
cands = {0.02: r["two_pass_gated_ransac"]["esa_score"]}
for k, v in r.items():
    m = re.match(r"two_pass_gated@([0-9.]+)_ransac$", k)
    if m:
        cands[float(m.group(1))] = v["esa_score"]
tau = min(cands, key=cands.get)
# If the ungated two-pass beats every gated variant on valid, keep the
# mildest gate anyway only when it is within noise; else disable (tau=1).
if r["two_pass_ransac"]["esa_score"] < cands[tau] - 1e-4:
    tau = 1.0
print(f"{tau:g}")
EOF
)
echo "valid-tuned gate tau: $TAU"
python - "$BEST_FINE" "$TAU" <<'EOF'
import json, sys
with open("experiments/train_synth/exp_keypoints_heatmap_synth/crop_refine.json", "w") as f:
    json.dump({"fine_exp": sys.argv[1], "gate": float(sys.argv[2])}, f)
EOF
commit_stage "Gate tau tuned on the valid split; registry carries {fine_exp, gate}" \
    "$OUT/crop_refine_valid.json" "$TS/crop_refine_valid_r5.log" \
    "$TS/exp_keypoints_heatmap_synth/crop_refine.json"

if [ "$TAU" != "0.02" ]; then
  echo "== R5E-IIIb. TEST re-eval of the winner at the deployed tau =="
  WINNER_OUT="$OUT/crop_refine_e50.json"
  [ "$BEST_FINE" = "$V2" ] && WINNER_OUT="$OUT/crop_refine_v2.json"
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py \
      --fine "$BEST_FINE" --gate "$TAU" \
      --out "$WINNER_OUT" \
      > "$TS/crop_refine_final_r5.log" 2>&1
  tail -16 "$TS/crop_refine_final_r5.log"
  commit_stage "Crop-refine final test rows at the valid-tuned deployed gate" \
      "$WINNER_OUT" "$TS/crop_refine_final_r5.log" \
      "$TS/exp_keypoints_heatmap_synth/crop_refine.json"
fi

W8_STALE=0
[ "$BEST_FINE" = "$V2" ] && ! grep -q "crop2" "$OUT/crop_refine_w8.json" 2>/dev/null && W8_STALE=1
[ "$TAU" != "0.02" ] && W8_STALE=1
if [ "$W8_STALE" = "1" ]; then
  echo "== R5E-III. w8 ladder re-run (winner + deployed tau) =="
  wait_preempt
  $WD 5400 600 -- python experiments/crop_refine_eval.py --weight-only \
      --fine "$BEST_FINE" --gate "$TAU" \
      > "$TS/crop_refine_w8v2_r5.log" 2>&1
  tail -16 "$TS/crop_refine_w8v2_r5.log"
  commit_stage "Crop-refine weight-only ladder re-run at the deployed configuration" \
      "$OUT/crop_refine_w8.json" "$TS/crop_refine_w8v2_r5.log"
fi

if [ ! -f experiments/r5e_sweep.done ]; then
  echo "== R5E-IV. bit-width sweep tail (watchdogged, resumes by case name) =="
  wait_preempt
  $WD 10800 600 -- python experiments/bitwidth_sweep.py \
      >> "$SWEEP.log" 2>&1
  grep -E "^\[" "$SWEEP.log" | tail -6
  commit_stage "Bit-width sweep tail: remaining mild-width cases" "$SWEEP" "$SWEEP.log"
  touch experiments/r5e_sweep.done
fi

echo "== R5E-V. ACCURACY.md refresh =="
timeout 600 python experiments/summarize_accuracy.py "$EXP" "$OUT" || true
commit_stage "ACCURACY.md refresh: crop-refine gated rows + sweep table" ACCURACY.md

echo "== R5E-VI. quiet-chip bench validation =="
wait_preempt
sleep 30
$WD 3600 600 -- python bench.py > /tmp/r5e_bench.json 2>&1
tail -1 /tmp/r5e_bench.json
cp /tmp/r5e_bench.json experiments/r5e_bench_validation.json || true
commit_stage "Round-5 quiet-chip bench validation (R5E)" experiments/r5e_bench_validation.json

touch experiments/r5e.done
echo "R5E finished $(date -u)"
