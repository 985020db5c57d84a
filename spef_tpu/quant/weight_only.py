"""Generic weight-only int8 quantization for ARBITRARY flax models.

The int8 graph pipeline (`quant/convert.py` -> the four executors) is
schema-bound to the MobileNetV2 + URSONet topology (stem / inverted
residual blocks / head conv / pooled FC branches).  Models outside that
schema — the keypoints heads, most importantly the crop-refine two-pass
pipeline's heatmap models (`models/heads.py::KeypointHeatmapHead`) —
still deserve a deployable quantization mode.

This module provides the weight-only half of the story generically:
every conv / dense kernel in the parameter tree is snapped to a
symmetric per-out-channel int8 grid (`quant/fake_quant.quantize_weight`
— the exact grid the schema-bound weight-only executor uses) and the
model runs its normal bf16 forward on the snapped weights.  Weights are
then exactly representable as int8 + per-channel scale (4x smaller
artifacts); compute stays at the bf16 roofline, which on TPU **is** the
production quantized mode (PERFORMANCE.md "Quantized-deployment
conclusion").

Reference role: the weight-only rung of the deploy ladders
(`/root/reference/build_tvm.py:218-231` methodology) extended to model
families the reference only ships in float.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from spef_tpu.quant.fake_quant import quantize_weight

__all__ = ["quantize_model_weights"]

# Parameter leaf names holding matmul/conv kernels in flax linen modules.
_KERNEL_NAMES = ("kernel",)


def _walk(tree: Dict[str, Any], bits: int, per_channel: bool, stats: dict,
          min_size: int):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _walk(v, bits, per_channel, stats, min_size)
        elif k in _KERNEL_NAMES and hasattr(v, "ndim") and v.ndim >= 2 \
                and v.size >= min_size:
            out[k] = quantize_weight(jnp.asarray(v), bits, per_channel)
            stats["n_quantized"] += 1
            stats["params_quantized"] += int(v.size)
        else:
            out[k] = v
            if hasattr(v, "size"):
                stats["params_kept"] += int(v.size)
    return out


def quantize_model_weights(
    variables: Dict[str, Any],
    bits: int = 8,
    per_channel: bool = True,
    min_size: int = 0,
) -> Dict[str, Any]:
    """Snap every conv/dense kernel in ``variables`` to its int grid.

    Returns ``(new_variables, stats)``: a NEW variables dict (params
    replaced, batch_stats etc. untouched) and a dict with the count of
    quantized kernels / parameters.  ``min_size`` skips tiny kernels.
    The returned weights are float arrays whose values lie exactly on
    int{bits} per-channel grids — the same round-trip the QAT fake-quant
    applies, and exactly what the schema-bound
    ``build_weight_only_forward`` executes.
    """
    new = dict(variables)
    stats = {"n_quantized": 0, "params_quantized": 0, "params_kept": 0}
    new["params"] = _walk(dict(variables["params"]), bits, per_channel,
                          stats, min_size)
    return new, stats
