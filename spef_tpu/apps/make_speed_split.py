"""SPEED train/valid split generator.

The reference bundles fixed split files (10,200 train / 1,800 valid
entries, `src/data/datasets/speed_split/{train_no_valid,valid}.json` —
SURVEY.md §2.1).  Those are dataset-derived artifacts, so instead of
vendoring them this tool derives an equivalent deterministic split from the
dataset's own ``train.json``: seeded shuffle, 15% validation fraction
(1,800 / 12,000) by default, same output schema.

Usage:
    python -m spef_tpu.apps.make_speed_split --dataset /path/to/speed \
        [--valid-fraction 0.15] [--seed 1001]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, help="SPEED root (holds train.json)")
    parser.add_argument("--valid-fraction", type=float, default=0.15)
    parser.add_argument("--seed", type=int, default=1001)
    args = parser.parse_args(argv)

    src = os.path.join(args.dataset, "train.json")
    assert os.path.isfile(src), f"{src} not found"
    with open(src) as f:
        entries = json.load(f)

    order = np.arange(len(entries))
    np.random.RandomState(args.seed).shuffle(order)
    n_valid = int(round(len(entries) * args.valid_fraction))
    valid_idx = set(order[:n_valid].tolist())

    train = [e for i, e in enumerate(entries) if i not in valid_idx]
    valid = [e for i, e in enumerate(entries) if i in valid_idx]

    for name, data in (("train_no_valid.json", train), ("valid.json", valid)):
        with open(os.path.join(args.dataset, name), "w") as f:
            json.dump(data, f)
        print(f"{name}: {len(data)} entries")


if __name__ == "__main__":
    main()
