"""Int8 inference executor — the TPU-native quantized deployment path.

Executes the layer graph produced by :mod:`spef_tpu.quant.convert`:

  * 1x1 convolutions (expansion / projection / head conv — the FLOPs bulk
    of MobileNet-V2) run as **int8 x int8 -> int32 matmuls on the MXU**
    (``dot_general`` with ``preferred_element_type=int32``), with the
    dequant-multiply + bias + ReLU + requantize epilogue fused by XLA;
  * depthwise 3x3 and the stride-2 stem (bandwidth-bound, VPU work) run in
    bfloat16 on the *dequantized integer* weights — numerically identical
    quantization grid, no MXU benefit to chase;
  * activations travel on their quantization grid; each int8 consumer
    re-derives the integer tensor exactly (round(x / step)).

This single path subsumes the reference's three deployment backends
(FINN dataflow FPGA / TVM ARM / TensorRT engines — SURVEY.md §2.2), and
is bit-comparable to the QAT fake-quant network by construction (see
convert.py docstring).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["int8_forward", "build_int8_forward", "build_weight_only_forward"]


def _to_int8(x: jax.Array, step: float) -> jax.Array:
    """Float-on-grid -> int32 (exact for every grid).

    int32, not int8: unsigned 8-bit activation grids (qmax=255, e.g. the
    w8a8 recipe) do not fit int8 — a cast would WRAP 128..255 to negatives
    and silently corrupt the network (found on the w8a8 ladder: int8 ESA
    0.61 vs QAT 0.17).  This executor is the accuracy/parity reference, so
    it takes the exact-integer path; the deployment executors
    (`int8_carry`, pallas/fused) keep int8 carries with a zero-point shift.
    """
    return jnp.round(x / step).astype(jnp.int32)


def _matmul_1x1(x: jax.Array, layer: Dict[str, Any], in_step, relu: bool) -> jax.Array:
    """1x1 conv: (B,H,W,Cin) x (1,1,Cin,Cout) -> float (B,H,W,Cout).

    ``in_step`` is the input quantization grid; when known the matmul runs
    exact integer (int32) accumulation.  ``in_step=None`` (rare: non-grid
    float input) falls back to a bf16 matmul on dequantized weights.
    """
    b, h, w, cin = x.shape
    w_int = layer["w_int"].reshape(layer["w_int"].shape[-2], layer["w_int"].shape[-1])
    if in_step is not None:
        x_int = _to_int8(x, in_step).reshape(-1, cin)
        acc = jax.lax.dot_general(
            x_int, w_int.astype(jnp.int32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (in_step * layer["mult_core"]) + layer["bias"]
    else:
        acc = jax.lax.dot_general(
            x.reshape(-1, cin).astype(jnp.bfloat16), w_int.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y = acc * layer["mult_core"] + layer["bias"]
    y = y.reshape(b, h, w, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _conv_f32(x: jax.Array, layer: Dict[str, Any], relu: bool) -> jax.Array:
    """Depthwise / spatial conv on integer-valued weights (f32 compute).

    Input is real-valued (already on its grid); the per-out-channel
    ``mult_core`` dequantizes the integer weights in the epilogue.
    f32, not bf16: on a fine activation grid (8-bit, qmax=255) bf16's
    8-bit mantissa moves values by 2-3 grid steps, which defeats this
    executor's role as the exact QAT-parity reference.
    """
    w = layer["w_int"].astype(jnp.float32)
    k = w.shape[0]
    pad = (k - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w,
        (layer["stride"], layer["stride"]),
        [(pad, pad), (pad, pad)],
        dimension_numbers=dn,
        feature_group_count=layer["groups"],
        preferred_element_type=jnp.float32,
    )
    y = y * layer["mult_core"] + layer["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _requant(y: jax.Array, step: float, qmax: float, qmin: float = 0.0) -> jax.Array:
    """Snap float activations to a quantization grid (stay in float)."""
    return jnp.clip(jnp.round(y / step), qmin, qmax) * step


def int8_forward(graph: Dict[str, Any], images: jax.Array):
    """Full quantized forward: uint8/float NHWC images -> (ori, pos) logits."""
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
    else:
        levels = 2.0 ** graph["image_bits"] - 1.0
        x = jnp.round(jnp.clip(images, 0.0, 1.0) * levels) / levels

    # Stem 3x3 s2 (spatial conv, bf16 on integer-grid input).
    stem = graph["stem"]
    y = _conv_f32(x, stem, relu=True)
    y = _requant(y, stem["act_step"], stem["act_qmax"])
    step = stem["act_step"]

    for blk in graph["blocks"]:
        if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
            y = _requant(y, blk["shared_step"], blk["shared_qmax"], -blk["shared_qmax"] - 1)
            step = blk["shared_step"]
        residual = y

        h = y
        h_step = step
        if "expand" in blk:
            e = blk["expand"]
            h = _matmul_1x1(h, e, h_step, relu=True)
            if "act_step" in e:
                h = _requant(h, e["act_step"], e["act_qmax"])
                h_step = e["act_step"]
            else:
                # Unquantized expand (bit width (None, None), e.g. block 0 of
                # the default recipe): float output, no activation grid.
                h_step = None
        d = blk["depthwise"]
        h = _conv_f32(h, d, relu=True)  # input already float on its grid
        if "act_step" in d:
            h = _requant(h, d["act_step"], d["act_qmax"])
            h_step = d["act_step"]
        else:
            h_step = None  # boundary-only recipe: float dw output
        p = blk["project"]
        h = _matmul_1x1(h, p, h_step, relu=False)  # linear projection, float out

        if blk["use_residual"]:
            h = _requant(h, blk["shared_step"], blk["shared_qmax"], -blk["shared_qmax"] - 1)
            y = h + residual
            step = blk["shared_step"]
        else:
            y = h
            step = None  # projection output is float (next block requantizes)

    fs = graph["final_shared"]
    y = _requant(y, fs["step"], fs["qmax"], -fs["qmax"] - 1)
    hc = graph["head_conv"]
    y = _matmul_1x1(y, hc, fs["step"], relu=True)
    y = _requant(y, hc["act_step"], hc["act_qmax"])

    # Head: quantized avg pool + int8 FC branches.
    head = graph["head"]
    pooled = jnp.mean(y, axis=(1, 2))
    pooled = _requant(pooled, head["pool_step"], head["pool_qmax"], -head["pool_qmax"] - 1)
    p_int = _to_int8(pooled, head["pool_step"])

    def fc(x_int, w_int, scale, bias):
        acc = jax.lax.dot_general(
            x_int, w_int.astype(jnp.int32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (head["pool_step"] * scale) + bias

    ori = fc(p_int, head["ori_w_int"], head["ori_scale"], head["ori_bias"])
    pos = fc(p_int, head["pos_w_int"], head["pos_scale"], head["pos_bias"])
    return ori, pos


def build_int8_forward(graph: Dict[str, Any]):
    """Close over the graph -> jittable ``images -> (ori, pos)``."""
    return partial(int8_forward, graph)


def build_weight_only_forward(graph: Dict[str, Any]):
    """Weight-only-quantized deployment forward (bf16 activations).

    Runs the converted graph's integer weights (dequantized via their
    per-channel multipliers — exactly the QAT weight grid) with FLOAT
    activations, skipping all activation requantization.

    Rationale (measured, PERFORMANCE.md): on TPU v5e the activation-requant
    arithmetic dominates the int8 executors (~4.2k fps) while the bf16 float
    path is HBM-roofline-bound at ~29k fps. Weight-only quantization keeps
    the accuracy benefit of QAT weight grids at full float-path speed — the
    recommended TPU serving mode; the faithful int8 executors remain for
    bit-parity validation against the QAT network.
    """

    def conv(x, layer, relu):
        # All convolutions (incl. 1x1) go through conv_general_dilated in
        # NHWC: reshape-to-2D variants break XLA's layout propagation and
        # fusion across the chain (measured 5x slower).
        w = layer["w_int"].astype(jnp.bfloat16)
        k = w.shape[0]
        pad = (k - 1) // 2
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (layer["stride"], layer["stride"]),
            [(pad, pad), (pad, pad)], dimension_numbers=dn,
            feature_group_count=layer["groups"], preferred_element_type=jnp.float32,
        )
        y = y * layer["mult_core"] + layer["bias"]
        if relu:
            y = jnp.maximum(y, 0.0)
        if "act_step" in layer:
            # Keep the LEARNED activation RANGE (clip) while dropping the
            # rounding: a QAT network trained on a narrow act grid (e.g.
            # 3-bit, qmax=7) relies on the clamp as part of its function —
            # dropping it blows the activations past every downstream scale
            # (measured r2: ESA 0.40 -> 3.04 on the trained 3-bit flagship).
            # One fused min() per conv is free at the bf16 roofline.
            y = jnp.minimum(y, layer["act_step"] * layer["act_qmax"])
        return y.astype(jnp.bfloat16)

    def _shared_clip(y, blk):
        if "shared_step" in blk:
            lim = blk["shared_step"] * blk["shared_qmax"]
            y = jnp.clip(y, -lim - blk["shared_step"], lim)
        return y

    def forward(images: jax.Array):
        if images.dtype == jnp.uint8:
            x = images.astype(jnp.float32) / 255.0
        else:
            x = images
        y = conv(x, graph["stem"], relu=True)
        for blk in graph["blocks"]:
            if blk["input_quant"] or blk["use_residual"]:
                y = _shared_clip(y, blk)
            residual = y
            h = y
            if "expand" in blk:
                h = conv(h, blk["expand"], relu=True)
            h = conv(h, blk["depthwise"], relu=True)
            h = conv(h, blk["project"], relu=False)
            y = h + residual if blk["use_residual"] else h
            if blk["use_residual"]:
                y = _shared_clip(y, blk)
        y = conv(y, graph["head_conv"], relu=True)

        head = graph["head"]
        pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))

        def fc(w_int, scale, bias):
            acc = pooled @ (w_int.astype(jnp.float32) * scale)
            return acc + bias

        ori = fc(head["ori_w_int"], head["ori_scale"], head["ori_bias"])
        pos = fc(head["pos_w_int"], head["pos_scale"], head["pos_bias"])
        return ori, pos

    return forward
