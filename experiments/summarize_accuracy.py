"""Collate accuracy-suite outputs into one markdown table (ACCURACY.md).

Reads the float eval (`<exp>/score_error.json`), the build ladders
(`<suite>/ladder_*/**/ladder.json`), and the temporal report scores, and
emits the per-stage ESA table the reference reports via
`build_tvm.py:218-231` (SURVEY.md §2.2).

Usage: python experiments/summarize_accuracy.py \
           experiments/train_synth/exp_dspeed_synth experiments/accuracy_suite
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _fmt(x):
    return f"{x:.4f}" if isinstance(x, (int, float)) else str(x)


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def esa_row(scores, split="valid"):
    """scores: {split: {ori: [..], pos: [..], esa: [..]}} -> (esa, ori, pos)."""
    s = scores.get(split) or next(iter(scores.values()), {})
    get = lambda k: (s.get(k) or [float("nan")])[0]
    return get("esa"), get("ori"), get("pos")


def main(exp_dir, suite_dir, out_path=None):
    lines = [
        "# Accuracy results (synthetic D-SPEED, flagship MobileNetV2 + URSONet)",
        "",
        f"Experiment: `{exp_dir}`  |  suite: `{suite_dir}`",
        "",
        "| Stage | ESA (valid) | ori score | pos score |",
        "|---|---|---|---|",
    ]

    fl = _load(os.path.join(exp_dir, "score_error.json"))
    if fl:
        e, o, p = esa_row(fl["scores"])
        lines.append(f"| float (trained fp32) | {_fmt(e)} | {_fmt(o)} | {_fmt(p)} |")

    for ladder_dir in sorted(glob.glob(os.path.join(suite_dir, "ladder_*"))):
        recipe = os.path.basename(ladder_dir).replace("ladder_", "")
        for lad in glob.glob(os.path.join(ladder_dir, "**", "ladder.json"),
                             recursive=True):
            payload = _load(lad)
            if not payload:
                continue
            for stage, scores in payload.get("scores", {}).items():
                e, o, p = esa_row(scores)
                lines.append(
                    f"| {stage} ({recipe} recipe) | {_fmt(e)} | {_fmt(o)} | {_fmt(p)} |")

    tmp = _load(os.path.join(suite_dir, "temporal", "temporal_metrics.json"))
    if tmp:
        lines += ["", "## Temporal filtering (11 video sequences)", "",
                  "| Sequence | " + " | ".join(
                      k for k in next(iter(tmp.values()))) + " (ESA) |"
                  if tmp else "",
                  "|---|" + "---|" * len(next(iter(tmp.values())))]
        for seq, modes in sorted(tmp.items()):
            cells = " | ".join(_fmt(v.get("esa_score", float("nan")))
                               for v in modes.values())
            lines.append(f"| {seq} | {cells} |")

    text = "\n".join(lines) + "\n"
    out_path = out_path or os.path.join(suite_dir, "ACCURACY.md")
    with open(out_path, "w") as f:
        f.write(text)
    print(text)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["experiments/train_synth/exp_dspeed_synth",
                            "experiments/accuracy_suite"]))
