"""Experiment-directory management, seeding, and score persistence.

Counterpart of `/root/reference/src/tools/utils.py:107-241`:
``prepare_directories`` (collision handling), ``set_seed``, and
``save_score_error`` / ``load_score_error``.  Differences:

  * collision handling is non-interactive by default (``on_collision``
    parameter replaces the reference's ``input()`` prompt — SURVEY.md notes
    the reference has no CLI flags, only prompts; we support both).
  * persistence is CSV-per-sheet inside a folder (pandas) plus a JSON
    summary instead of a single xlsx (xlsxwriter-free, diff-friendly);
    an .xlsx is still written when the engine is available.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Dict, Optional

import numpy as np

__all__ = ["prepare_directories", "set_seed", "save_score_error", "load_score_error"]


def prepare_directories(path: str, on_collision: str = "version") -> str:
    """Create an experiment directory.

    on_collision: 'version' -> append _v2, _v3...; 'delete' -> wipe and
    recreate; 'ask' -> interactive prompt (reference behavior,
    `tools/utils.py:107-145`); 'reuse' -> keep as is.
    """
    if os.path.exists(path) and os.listdir(path):
        if on_collision == "ask":
            ans = input(f"{path} exists. Delete (d), version (v), or reuse (r)? ")
            on_collision = {"d": "delete", "v": "version", "r": "reuse"}.get(ans.strip(), "version")
        if on_collision == "delete":
            shutil.rmtree(path)
        elif on_collision == "version":
            base = path.rstrip("/")
            i = 2
            while os.path.exists(f"{base}_v{i}") and os.listdir(f"{base}_v{i}"):
                i += 1
            path = f"{base}_v{i}"
    os.makedirs(path, exist_ok=True)
    return path


def set_seed(seed: int = 1001):
    """Seed python + numpy host RNGs (reference `tools/utils.py:168-189`).

    Device-side randomness in JAX is explicit (PRNG keys), so there is no
    cudnn-determinism switch to flip; jitted programs are deterministic by
    construction for a fixed key.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def save_score_error(folder: str, scores: Dict, errors: Dict, latency: Optional[Dict] = None,
                     name: str = "score_error") -> str:
    """Persist evaluation scores/errors (reference `tools/utils.py:191-241`)."""
    os.makedirs(folder, exist_ok=True)
    payload = {"scores": scores, "errors": errors}
    if latency is not None:
        payload["latency"] = latency
    path = os.path.join(folder, f"{name}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=float)

    # Tabular export: one CSV per sheet (always), plus xlsx when an engine
    # is available (the reference writes multi-sheet xlsx,
    # `tools/utils.py:191-241`; this environment has no xlsx engine).
    try:
        import pandas as pd

        frames = {}
        for sheet, data in payload.items():
            flat = {}
            for split, metrics in data.items():
                if isinstance(metrics, dict):
                    for k, v in metrics.items():
                        flat[f"{split}/{k}"] = v if isinstance(v, list) else [v]
                else:
                    flat[split] = metrics if isinstance(metrics, list) else [metrics]
            if flat:
                maxlen = max(len(v) for v in flat.values())
                flat = {k: v + [None] * (maxlen - len(v)) for k, v in flat.items()}
                frames[sheet] = pd.DataFrame(flat)
        for sheet, df in frames.items():
            df.to_csv(os.path.join(folder, f"{name}_{sheet}.csv"), index=False)
        try:
            with pd.ExcelWriter(os.path.join(folder, f"{name}.xlsx")) as writer:
                for sheet, df in frames.items():
                    df.to_excel(writer, sheet_name=sheet[:31], index=False)
        except Exception:
            pass
    except Exception:
        pass
    return path


def load_score_error(folder: str, name: str = "score_error") -> Dict:
    with open(os.path.join(folder, f"{name}.json")) as f:
        return json.load(f)
