"""Int8-activation-carry executor — conv-form, XLA-fused.

The third execution mode of the converted QAT graph, between
:func:`spef_tpu.quant.int8_model.build_int8_forward` (readable reference
executor, reshaped-2D int dots) and
:func:`spef_tpu.quant.int8_pallas.build_pallas_forward` (hand-written
kernels):

  * every convolution stays in **NHWC conv form**
    (``lax.conv_general_dilated``) — reshape-to-2D matmul variants break
    XLA's layout propagation and run ~5x slower (measured, PERFORMANCE.md);
  * activations travel through HBM as **int8 on their quantization grids**
    — half the bytes of the bf16 float path, which is HBM-roofline-bound;
  * compute is exact integer arithmetic via bf16: int8 activation values
    (|v| <= 255) and integer weights (|w| <= 127) are exactly representable
    in bf16, and the MXU accumulates their exact products in f32, so the
    arithmetic is bit-identical to true integer dots;
  * all requantization epilogues (dequant multiplier, bias, ReLU,
    round/clip to the next grid, residual add, inter-grid ratio requants)
    are elementwise chains XLA fuses into the convolutions.

Grid bookkeeping matches :mod:`spef_tpu.quant.int8_pallas`: each
materialized tensor is int8 on a tracked step, residual sums are emitted
already requantized to the next consumer's grid (exact on integer values:
``round((a * s_n) / s_{n+1}) == round(a * ratio)``).

This is the quantized deployment path that replaces the reference's
FINN/TVM/TensorRT backends (`/root/reference/build_finn.py`,
`build_tvm.py`, `build_nvidia.py` — SURVEY.md §2.2) with a TPU program
whose activation traffic is int8 end-to-end.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_int8_carry_forward"]


def _grid(step: float, qmax: float, signed: bool) -> Dict[str, float]:
    return {"step": step, "qmax": qmax, "qmin": -qmax - 1 if signed else 0.0}


def _zp(qmax: float) -> float:
    """Zero-point of an UNSIGNED activation grid stored in int8.

    An unsigned 8-bit grid (qmax=255, e.g. the w8a8 recipe) does not fit
    int8: the carry stores ``q - 128`` instead (range [-128, 127], exact)
    and consumers fold the constant ``128 * colsum(w)`` back into their
    bias (the standard asymmetric-activation GEMM identity used by int8
    deployment stacks).  Grids with qmax <= 127 carry unshifted.
    """
    return 128.0 if qmax > 127.0 else 0.0


def _zp_bias(entry: Dict[str, Any], in_step: float, in_zp: float) -> jax.Array:
    """Consumer bias with the producer's zero-point correction folded in.

    acc_shifted = conv(x - zp, w) = acc - zp * colsum(w), so the epilogue
    ``acc * (mult * step) + bias`` needs ``bias += zp*step*mult*colsum(w)``.
    Computed in float64 numpy at trace time (static graph constants).
    """
    if in_zp == 0.0:
        return entry["bias"]
    colsum = np.asarray(entry["w_int"], np.float64).sum(axis=(0, 1, 2))
    corr = in_zp * in_step * np.asarray(entry["mult_core"], np.float64) * colsum
    return jnp.asarray(np.asarray(entry["bias"], np.float64) + corr, jnp.float32)


def _conv_acc(x_int: jax.Array, w_int: jax.Array, stride: int, groups: int,
              pad_value: int = 0) -> jax.Array:
    """Exact integer conv via bf16 operands + f32 accumulation (NHWC).

    ``pad_value``: spatial padding constant — a zero-point-shifted input
    must pad with ``-zp`` (the shifted representation of real 0) or the
    border taps break the colsum-folded bias correction.
    """
    w = w_int.astype(jnp.bfloat16)
    k = w.shape[0]
    pad = (k - 1) // 2
    if pad and pad_value:
        x_int = jnp.pad(x_int, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        constant_values=pad_value)
        pad = 0
    dn = jax.lax.conv_dimension_numbers(x_int.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x_int.astype(jnp.bfloat16),
        w,
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def _requant_int8(y: jax.Array, step: float, qmax: float, qmin: float = 0.0,
                  zp: float = 0.0) -> jax.Array:
    """Float -> int8 on the grid (``clip(round(y / step)) - zp``, exact)."""
    return (jnp.clip(jnp.round(y / step), qmin, qmax) - zp).astype(jnp.int8)


def build_int8_carry_forward(graph: Dict[str, Any]):
    """Close over the converted graph -> jittable ``images -> (ori, pos)``."""
    blocks = graph["blocks"]
    n_blocks = len(blocks)

    def consumer_grid(i: int) -> Optional[Dict[str, float]]:
        """Grid block i's output must be emitted on (int8_pallas semantics)."""
        if i + 1 < n_blocks:
            nxt = blocks[i + 1]
            if "shared_step" in nxt and (nxt["input_quant"] or nxt["use_residual"]):
                return _grid(nxt["shared_step"], nxt["shared_qmax"], signed=True)
        else:
            fs = graph["final_shared"]
            return _grid(fs["step"], fs["qmax"], signed=True)
        blk = blocks[i]
        if "shared_step" in blk:
            return _grid(blk["shared_step"], blk["shared_qmax"], signed=True)
        return None

    def forward(images: jax.Array):
        # Integer-valued image into the stem; the normalizer (1/levels) folds
        # into the stem's per-channel multiplier (conv is linear), keeping the
        # accumulation exact on integers.
        if images.dtype == jnp.uint8:
            x = images
            inv_levels = 1.0 / 255.0
        else:
            levels = 2.0 ** graph["image_bits"] - 1.0
            x = jnp.round(jnp.clip(images, 0.0, 1.0) * levels)
            inv_levels = 1.0 / levels

        stem = graph["stem"]
        acc = _conv_acc(x, stem["w_int"], 2, 1)
        yf = jnp.maximum(acc * (stem["mult_core"] * inv_levels) + stem["bias"], 0.0)
        zpc = _zp(stem["act_qmax"])
        y = _requant_int8(yf, stem["act_step"], stem["act_qmax"], zp=zpc)
        step = stem["act_step"]

        for i, blk in enumerate(blocks):
            if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
                tgt = blk["shared_step"]
                qmax = blk["shared_qmax"]
                assert qmax <= 127.0, "shared grids are signed int8"
                if abs(step - tgt) > 1e-12 or zpc:
                    ratio = step / tgt
                    y = jnp.clip(
                        jnp.round((y.astype(jnp.float32) + zpc) * ratio),
                        -qmax - 1, qmax,
                    ).astype(jnp.int8)
                step, zpc = tgt, 0.0

            residual = y
            h, hstep, hzp = y, step, zpc
            float_handoff = False
            if "expand" in blk:
                e = blk["expand"]
                acc = _conv_acc(h, e["w_int"], 1, 1)
                yf = jnp.maximum(
                    acc * (e["mult_core"] * hstep) + _zp_bias(e, hstep, hzp), 0.0)
                if "act_step" in e:
                    hzp = _zp(e["act_qmax"])
                    h = _requant_int8(yf, e["act_step"], e["act_qmax"], zp=hzp)
                    hstep = e["act_step"]
                else:
                    # Unquantized expand (no act grid): bf16 handoff within
                    # the block; the depthwise consumes real values.
                    h = yf.astype(jnp.bfloat16)
                    hstep, hzp = None, 0.0
                    float_handoff = True

            d = blk["depthwise"]
            hc = h.shape[-1]
            acc = _conv_acc(h, d["w_int"], d["stride"], hc, pad_value=int(-hzp))
            mult = d["mult_core"] * (1.0 if float_handoff else hstep)
            yf = jnp.maximum(
                acc * mult + _zp_bias(d, 0.0 if float_handoff else hstep, hzp), 0.0)
            if "act_step" in d:
                hzp = _zp(d["act_qmax"])
                h = _requant_int8(yf, d["act_step"], d["act_qmax"], zp=hzp)
                hstep = d["act_step"]
            else:
                # Boundary-only recipe: the depthwise activation keeps real
                # values inside the block; only the block output requantizes.
                h = yf.astype(jnp.bfloat16)
                hstep, hzp = 1.0, 0.0

            p = blk["project"]
            acc = _conv_acc(h, p["w_int"], 1, 1)
            pf = acc * (p["mult_core"] * hstep) + _zp_bias(p, hstep, hzp)
            out_grid = consumer_grid(i)

            if blk["use_residual"]:
                # project -> shared-grid requant -> integer residual add
                # (int32, no overflow), then ratio-requant the exact integer
                # sum to the consumer grid.
                q = jnp.clip(
                    jnp.round(pf / blk["shared_step"]),
                    -blk["shared_qmax"] - 1,
                    blk["shared_qmax"],
                ).astype(jnp.int32)
                s = q + residual.astype(jnp.int32)
                step = blk["shared_step"]
                if out_grid is not None and abs(step - out_grid["step"]) > 1e-12:
                    ratio = step / out_grid["step"]
                    y = jnp.clip(
                        jnp.round(s.astype(jnp.float32) * ratio),
                        out_grid["qmin"],
                        out_grid["qmax"],
                    ).astype(jnp.int8)
                    step = out_grid["step"]
                else:
                    y = jnp.clip(s, -128, 127).astype(jnp.int8)
            else:
                assert out_grid is not None, "float block handoff not in this family"
                y = _requant_int8(pf, out_grid["step"], out_grid["qmax"], out_grid["qmin"])
                step = out_grid["step"]
            zpc = 0.0  # both emit paths land on SIGNED consumer grids

        fs = graph["final_shared"]
        if abs(step - fs["step"]) > 1e-12 or zpc:
            ratio = step / fs["step"]
            y = jnp.clip(
                jnp.round((y.astype(jnp.float32) + zpc) * ratio),
                -fs["qmax"] - 1, fs["qmax"],
            ).astype(jnp.int8)
            step, zpc = fs["step"], 0.0

        hcnv = graph["head_conv"]
        acc = _conv_acc(y, hcnv["w_int"], 1, 1)
        yf = jnp.maximum(acc * (hcnv["mult_core"] * step) + _zp_bias(hcnv, step, zpc),
                         0.0)
        zpc = _zp(hcnv["act_qmax"])
        y = _requant_int8(yf, hcnv["act_step"], hcnv["act_qmax"], zp=zpc)
        step = hcnv["act_step"]

        # Head: int sum pool -> pool grid -> int8 FC branches (tiny).
        head = graph["head"]
        pooled = (jnp.mean(y.astype(jnp.float32), axis=(1, 2)) + zpc) * step
        p_int = jnp.clip(
            jnp.round(pooled / head["pool_step"]), -head["pool_qmax"] - 1, head["pool_qmax"]
        ).astype(jnp.int8)

        def fc(w_int, scale, bias):
            acc = jax.lax.dot_general(
                p_int, w_int, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * (head["pool_step"] * scale) + bias

        ori = fc(head["ori_w_int"], head["ori_scale"], head["ori_bias"])
        pos = fc(head["pos_w_int"], head["pos_scale"], head["pos_bias"])
        return ori, pos

    return forward
