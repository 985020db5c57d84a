"""SPEED train/valid split materializer.

The reference bundles fixed split files (10,200 train / 1,800 valid
entries, `src/data/datasets/speed_split/{train_no_valid,valid}.json` —
SURVEY.md §2.1).  Those exact lists are vendored as package data
(``spef_tpu/data/speed_split/``) and used automatically by
``load_dataset(".../speed")``; this tool copies them into a dataset
directory (so they can be inspected or edited per-experiment), or — with
``--random`` — derives a fresh deterministic split from the dataset's own
``train.json`` (seeded shuffle, 15% validation fraction by default, same
output schema).

Usage:
    python -m spef_tpu.apps.make_speed_split --dataset /path/to/speed
    python -m spef_tpu.apps.make_speed_split --dataset /path/to/speed \
        --random [--valid-fraction 0.15] [--seed 1001]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

from spef_tpu.data.dataset import SPEED_SPLIT_DIR


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, help="SPEED root (holds train.json)")
    parser.add_argument("--random", action="store_true",
                        help="derive a fresh random split instead of the bundled reference one")
    parser.add_argument("--valid-fraction", type=float, default=0.15)
    parser.add_argument("--seed", type=int, default=1001)
    args = parser.parse_args(argv)

    if not args.random:
        for name in ("train_no_valid.json", "valid.json"):
            src = os.path.join(SPEED_SPLIT_DIR, name)
            dst = os.path.join(args.dataset, name)
            shutil.copyfile(src, dst)
            with open(dst) as f:
                print(f"{name}: {len(json.load(f))} entries (reference split)")
        return

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
