"""Cross-implementation parity harness: QAT fake-quant vs int8 executor.

Counterpart of the reference's de-facto integration tests:
``SPEFinn.predict_and_compare`` (host Brevitas vs FPGA accelerator,
`/root/reference/src/finn/spe_finn.py:92-151`) and the evaluate-ladders of
`build_tvm.py:218-231` / `build_nvidia.py:332-343`.  Reports tensor MSE,
cosine similarity, elementwise closeness ratio and decoded-pose score
deltas between the float path, the QAT fake-quant path, and the int8
deployment path.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["compare_tensors", "predict_and_compare"]


def compare_tensors(a, b, rtol: float = 1e-4, atol: float = 1e-5) -> Dict[str, float]:
    """Similarity metrics between two activation/logit tensors
    (mirrors the metric set of `spe_finn.py:118-145`)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    mse = float(np.mean((a - b) ** 2))
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    cos = float(np.dot(a, b) / denom) if denom > 0 else 1.0
    close = float(np.mean(np.isclose(a, b, rtol=rtol, atol=atol)))
    zero_match = float(np.mean((a == 0) == (b == 0)))
    return {"mse": mse, "cosine": cos, "close_ratio": close, "zero_pattern": zero_match}


def predict_and_compare(
    qat_forward: Callable,
    int8_forward: Callable,
    images,
    spe_utils=None,
) -> Dict[str, Dict[str, float]]:
    """Run the same batch through both paths and compare raw outputs (and
    decoded poses when ``spe_utils`` is given)."""
    images = jnp.asarray(images)
    if images.dtype == jnp.uint8:
        images_f = images.astype(jnp.float32) / 255.0
    else:
        images_f = images
    qat_out = qat_forward(images_f)
    int8_out = int8_forward(images)

    report = {
        "ori_raw": compare_tensors(qat_out[0], int8_out[0]),
        "pos_raw": compare_tensors(qat_out[1], int8_out[1]),
    }

    if spe_utils is not None:
        def decode(pred):
            ori_key = "ori" if spe_utils.ori_mode == "regression" else "ori_soft"
            pos_key = "pos" if spe_utils.pos_mode == "regression" else "pos_soft"
            pose = spe_utils.last_activ({ori_key: pred[0], pos_key: pred[1]})
            return spe_utils.decode(pose)

        pose_q = decode(qat_out)
        pose_i = decode(int8_out)
        ori_dot = np.abs(np.sum(np.asarray(pose_q["ori"]) * np.asarray(pose_i["ori"]), axis=-1))
        pos_diff = np.linalg.norm(np.asarray(pose_q["pos"]) - np.asarray(pose_i["pos"]), axis=-1)
        report["pose"] = {
            "ori_agreement_deg": float(np.rad2deg(np.mean(2 * np.arccos(np.clip(ori_dot, 0, 1))))),
            "pos_diff_m": float(np.mean(pos_diff)),
        }
    return report
