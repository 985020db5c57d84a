"""bit_width.json load/save — reference-schema compatible.

Counterpart of `/root/reference/src/modeling/model.py:16-67`
(``load_bit_width`` / ``save_bit_width``): values are stringified python
literals (tuples; the ``inverted_residual`` key is a list of stringified
per-block lists) parsed with ``ast.literal_eval``, so bit-width files
generated for the reference load unchanged.

Schema (reference `backbone/mobilenet_v2.py:140-168`,
`head/ursonet.py:42-47`):

    {
      "image": 8,
      "first_conv": (w, a),
      "last_conv": (w, a),
      "shared_act": b,
      "inverted_residual": [[(w1, a1), (w2, a2), (w3,)], ...],  # per block
      "fully_connected": (w, b),   # optional, head
      "pooling": b,                # optional, head
    }
"""

from __future__ import annotations

import ast
import json
import os
import warnings
from typing import Optional

__all__ = ["load_bit_width", "save_bit_width", "default_bit_width",
           "experiment_model_names",
           "boundary_bit_width"]


def load_bit_width(path: str) -> Optional[dict]:
    try:
        with open(path) as f:
            content = json.load(f)
    except FileNotFoundError:
        warnings.warn(
            f"Bit width path {path} not found.\n"
            "The default bit_width defined in the code of the model is used"
        )
        return None
    for key, value in content.items():
        if key == "inverted_residual":
            content[key] = [ast.literal_eval(v) for v in value]
        else:
            content[key] = ast.literal_eval(str(value))
    return content


def save_bit_width(save_folder: str, bit_width: dict, name: str = "bit_width.json") -> str:
    assert bit_width is not None
    os.makedirs(save_folder, exist_ok=True)
    str_bw = {
        key: str(value) if key != "inverted_residual" else [str(line) for line in value]
        for key, value in bit_width.items()
    }
    path = os.path.join(save_folder, name)
    with open(path, "w") as f:
        json.dump(str_bw, f, indent=4)
    return path


def default_bit_width(n_blocks: int = 17, w: int = 3, a: int = 3, shared: int = 4) -> dict:
    """The reference's default mixed-precision recipe
    (`backbone/mobilenet_v2.py:140-168`): 8-bit image, (w, a) everywhere,
    first block's expand conv unquantized (None, None)."""
    blocks = [[(w, a), (w, a), (w,)] for _ in range(n_blocks)]
    blocks[0] = [(None, None), (w, a), (w,)]
    return {
        "image": 8,
        "first_conv": (w, a),
        "last_conv": (w, a),
        "shared_act": shared,
        "inverted_residual": blocks,
        "fully_connected": (8, 8),
        "pooling": 8,
    }


def boundary_bit_width(n_blocks: int = 17, w: int = 8, shared: int = 8) -> dict:
    """Boundary-only quantization recipe: int8 activations BETWEEN blocks,
    real-valued (bf16) activations inside them.

    TPU-native deployment design point (no reference counterpart — FINN
    requantizes in fabric for free, `/root/reference/src/finn/
    build_steps.py:124-159`, so the reference always grids every
    activation): on a TPU every inner round/clip is VPU work on a
    6x-expanded hidden tensor, while HBM traffic — the actual roofline —
    only depends on what crosses block boundaries.  This recipe keeps the
    int8 boundary carries (the bandwidth win) and drops the interior grids
    (the VPU cost), so the fused block kernels run matmul-bound.
    Accuracy impact is measured by the build ladder (apps/build_int8.py).
    """
    blocks = [[(w, None), (w, None), (w,)] for _ in range(n_blocks)]
    blocks[0] = [(None, None), (w, None), (w,)]
    return {
        "image": 8,
        "first_conv": (w, 8),
        "last_conv": (w, 8),
        "shared_act": shared,
        "inverted_residual": blocks,
        "fully_connected": (8, 8),
        "pooling": 8,
    }


def experiment_model_names(exp_dir: str, backbone_name: str, head_name: str):
    """Resolve (backbone, head, bit_width) for an experiment checkpoint.

    A ``model/bit_width.json`` marks a QAT checkpoint: the saved parameters
    belong to the quantized module variants, so the configured float names
    map to their ``_q`` forms (the reference keys this off the experiment
    *directory* shape instead, `train.py:32-51`). Ladder configs store the
    float names — same rule as apps.{export,gui,viewer}.
    """
    import os

    bw_path = os.path.join(exp_dir, "model", "bit_width.json")
    if not os.path.isfile(bw_path):
        return backbone_name, head_name, None

    def q_name(name: str) -> str:
        name = name.replace("_pytorch", "").replace("_brevitas", "")
        return name if name.endswith("_q") else name + "_q"

    return q_name(backbone_name), q_name(head_name), load_bit_width(bw_path)
