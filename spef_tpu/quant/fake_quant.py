"""Fake-quantization (QAT) primitives — straight-through estimators.

Semantic counterpart of the reference's Brevitas quantizer library
(`/root/reference/src/modeling/common/quantizers.py`):

  * weights: symmetric signed int with **per-output-channel absmax scaling**
    (``IntWeightQuant``: per_channel_scaling=True), narrow range
    [-(2^(b-1)-1), +(2^(b-1)-1)];
  * activations: unsigned (post-ReLU, ``UintActQuant``) or signed
    (``IntActQuant``) per-tensor quantization with a **learned scale stored
    in log2 domain** (``RestrictValueType.LOG_FP``), trained jointly with
    the weights;
  * binary (1-bit) weights: sign(w) with per-channel mean-|w| scale;
    ternary (2-bit): thresholded {-s, 0, +s} — counterparts of Brevitas'
    ``SignedBinary*/SignedTernary*`` quantizers selected automatically by
    bit width (``select_quantizer``, `quantizers.py:79-95`);
  * input image: 8-bit unsigned with fixed scale 1/255 (``InputQuant``).

All fake-quant ops use the STE ``x + stop_grad(q(x) - x)`` so gradients
flow; under ``quantization=False`` every wrapper is the identity (matching
the reference's quantization flag).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ste_round",
    "quantize_weight",
    "FakeQuantAct",
    "quantize_input_image",
]

_EPS = 2e-16  # scaling_min_val of the reference quantizers


def ste_round(x: jax.Array) -> jax.Array:
    """round() with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _per_channel_absmax(w: jax.Array, axis: Tuple[int, ...]) -> jax.Array:
    return jnp.maximum(jnp.max(jnp.abs(w), axis=axis, keepdims=True), _EPS)


def quantize_weight(w: jax.Array, bits: Optional[int], per_channel: bool = True) -> jax.Array:
    """Fake-quantize a conv (HWIO) or dense (IO) weight tensor.

    bits=None -> identity (unquantized layer, e.g. first block expand conv).
    bits=1 -> binary sign(w) * mean|w|; bits=2 -> ternary with 0.5*mean|w|
    threshold; else symmetric narrow-range int with per-out-channel scale.
    """
    if bits is None:
        return w
    reduce_axes = tuple(range(w.ndim - 1)) if per_channel else tuple(range(w.ndim))

    if bits == 1:
        scale = jnp.maximum(jnp.mean(jnp.abs(w), axis=reduce_axes, keepdims=True), _EPS)
        sign = jnp.where(w >= 0, 1.0, -1.0)
        return w + jax.lax.stop_gradient(sign * scale - w)
    if bits == 2:
        scale = jnp.maximum(jnp.mean(jnp.abs(w), axis=reduce_axes, keepdims=True), _EPS)
        thr = 0.5 * scale
        tern = jnp.where(w > thr, scale, jnp.where(w < -thr, -scale, 0.0))
        return w + jax.lax.stop_gradient(tern - w)

    qmax = 2.0 ** (bits - 1) - 1.0
    scale = _per_channel_absmax(w, reduce_axes) / qmax
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax) * scale
    return w + jax.lax.stop_gradient(q - w)


def weight_scale(w: jax.Array, bits: int, per_channel: bool = True) -> jax.Array:
    """The integer-domain scale used by :func:`quantize_weight` (for export)."""
    reduce_axes = tuple(range(w.ndim - 1)) if per_channel else tuple(range(w.ndim))
    if bits <= 2:
        return jnp.maximum(jnp.mean(jnp.abs(w), axis=reduce_axes, keepdims=True), _EPS)
    qmax = 2.0 ** (bits - 1) - 1.0
    return _per_channel_absmax(w, reduce_axes) / qmax


class FakeQuantAct(nn.Module):
    """Learned-scale activation fake-quantizer (per-tensor).

    The scale parameter lives in log2 domain (LOG_FP restriction of the
    reference quantizers); ``signed`` selects the integer range.  1/2-bit
    widths fall back to binary/ternary constants like ``select_quantizer``.
    """

    bits: Optional[int]
    signed: bool = False
    init_scale: float = 6.0  # post-ReLU activations rarely exceed this at init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bits is None:
            return x
        log2_scale = self.param(
            "log2_scale", lambda _: jnp.asarray(jnp.log2(self.init_scale), jnp.float32)
        )
        scale = jnp.exp2(log2_scale)

        if self.bits == 1:
            sign = jnp.where(x >= 0, 1.0, -1.0) * scale
            return x + jax.lax.stop_gradient(sign - x)
        if self.bits == 2:
            thr = 0.5 * scale
            tern = jnp.where(x > thr, scale, jnp.where(x < -thr, -scale, 0.0))
            return x + jax.lax.stop_gradient(tern - x)

        if self.signed:
            qmax = 2.0 ** (self.bits - 1) - 1.0
            qmin = -(2.0 ** (self.bits - 1))
        else:
            qmax = 2.0**self.bits - 1.0
            qmin = 0.0
        step = scale / qmax
        # STE w.r.t. x; the scale learns through the clip boundaries.
        q = jnp.clip(ste_round(x / step), qmin, qmax) * step
        return q

    def scale_value(self, params) -> float:
        return float(2.0 ** params["log2_scale"])


def quantize_input_image(x: jax.Array, bits: int = 8) -> jax.Array:
    """8-bit unsigned image quantization with fixed 1/255 scale
    (``InputQuant``/QuantIdentity on the image, `mobilenet_v2.py:183-184`).
    For float input in [0, 1] this is a straight round to the uint grid."""
    levels = 2.0**bits - 1.0
    return ste_round(jnp.clip(x, 0.0, 1.0) * levels) / levels
