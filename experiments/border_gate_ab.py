"""Border-saturation gate A/B for keypoints-mode decode.

The D-SPEED close-range frames put 1-3 of the 11 Tango keypoints outside
the image; labels are raw normalized projections (reference
`keypoints_utils.py:92-110`, values < 0 or > 1), so the sigmoid/soft-argmax
head is trained toward the border and emits border-saturated predictions
for those points — gross PnP outliers that are *identifiable from the
prediction alone*.  This experiment forwards the trained head once
(cacheable), then decodes the same predictions through
{EPnP, RANSAC} x {no gate, border_gate in a margin sweep} and scores each
variant, quantifying the gate's contribution independently of solver
choice.

Usage:
    python experiments/border_gate_ab.py --experiment experiments/train_synth/exp_keypoints_heatmap_synth \
        [--data /tmp/dspeed_syn/still] [--limit 1024] [--out experiments/accuracy_suite/border_gate_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keypoint_noise import load_experiment, measure_regressor_noise  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--data", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--limit", type=int, default=1024)
    ap.add_argument("--margins", type=float, nargs="*",
                    default=[0.005, 0.01, 0.02, 0.03, 0.05])
    ap.add_argument("--cache", default="/tmp/border_gate_preds.npz",
                    help="forward-pass cache (delete to re-forward)")
    ap.add_argument("--out", default="experiments/accuracy_suite/border_gate_ab.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from spef_tpu.pose.score import score_batch

    tag = f"{os.path.basename(args.experiment)}:{args.split}:{args.limit}"
    if os.path.isfile(args.cache):
        blob = np.load(args.cache, allow_pickle=True)
        if str(blob.get("tag")) == tag:
            preds, trues = blob["preds"], blob["trues"]
            oris, poss = blob["oris"], blob["poss"]
            spe_utils, _, _ = load_experiment(args.experiment, args.data)
            print(f"[cache] {args.cache} ({len(preds)} frames)")
        else:
            os.remove(args.cache)
    if not os.path.isfile(args.cache):
        spe_utils, model, data = load_experiment(args.experiment, args.data)
        noise, (preds, trues, oris, poss) = measure_regressor_noise(
            spe_utils, model, data[args.split], args.limit)
        np.savez(args.cache, tag=tag, preds=preds, trues=trues,
                 oris=oris, poss=poss)
        print(f"forwarded {len(preds)} frames; rmse={noise['rmse_px']:.2f}px")

    kp = spe_utils.keypoints
    results = {}
    for ransac in (False, True):
        solver = "ransac" if ransac else "epnp"
        for m in [None] + list(args.margins):
            pose = kp.decode_batch(jnp.asarray(preds), ransac=ransac,
                                   border_gate=m)
            sc = score_batch(jnp.asarray(oris), jnp.asarray(poss),
                             pose["ori"], pose["pos"])
            row = {k: float(v) for k, v in sc.items()}
            if m is not None:
                xy = preds.reshape(len(preds), -1, 2)[:, 1:, :]
                inside = ((xy > m) & (xy < 1 - m)).all(-1)
                n_in = inside.sum(-1)
                row["gated_frame_frac"] = float(np.mean(n_in < xy.shape[1]))
                row["fallback_frame_frac"] = float(np.mean(n_in < 6))
            key = f"{solver}" + ("" if m is None else f"_gate{m:g}")
            results[key] = row
            print(f"{key}: esa={row['esa_score']:.4f} "
                  f"ori={row['ori_error']:.2f}deg pos={row['pos_error']:.3f}m"
                  + (f" gated%={row['gated_frame_frac']:.1%}" if m else ""))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"experiment": args.experiment, "split": args.split,
                   "frames": int(len(preds)), "results": results}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
