"""Pallas-fused int8 inference pipeline.

Production int8 executor built on the Pallas kernels
(:mod:`spef_tpu.ops.pallas.int8_ops`): activations travel through HBM as
**int8 on their quantization grids** (metadata-tracked steps), 1x1 convs run
fused int8 MXU matmuls, depthwise convs run fused VPU kernels, and the
inter-block grid changes are folded into kernel epilogues:

  * the projection kernel adds the residual on the current shared grid and
    emits the sum **already requantized to the next consumer's grid** —
    numerically identical to the reference chain
    ``next_shared_quant(proj_requant + residual)`` since
    ``round((a * s_n) / s_{n+1}) == round(a * ratio)`` on integer a;
  * every matmul's input step is folded into its per-channel multiplier.

Semantics match :mod:`spef_tpu.quant.int8_model` (and hence the QAT
fake-quant network) — tested; this module is the fast path, that one the
readable reference executor.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spef_tpu.ops.pallas.int8_ops import (
    int8_depthwise3x3,
    int8_matmul_requant,
    xla_depthwise3x3,
    xla_matmul_requant,
)

__all__ = ["build_pallas_forward"]


def _grid_params(step: float, qmax: float, signed: bool):
    return {"step": step, "qmax": qmax, "qmin": -qmax - 1 if signed else 0.0}


def _emit_unsigned(y: jax.Array, step: float, qmax: float) -> jax.Array:
    """Round/clip to an unsigned grid; int8 when it fits, else int16.

    int16, not a zero-point shift: used at the head_conv emit, whose only
    consumer is the f32 mean-pool (astype is free to fuse), so carrying
    the TRUE q avoids any bias bookkeeping for 2x the bytes of exactly
    one tiny tensor.
    """
    dt = jnp.int8 if qmax <= 127.0 else jnp.int16
    return jnp.clip(jnp.round(y / step), 0, qmax).astype(dt)


def _bits_int8(q: jax.Array) -> jax.Array:
    """Unsigned q in [0, 255] (f32) -> its uint8 BITS in an int8 container.

    The int8 carry convention for unsigned 8-bit edges (boundary-recipe
    stem): consumers decode ``x & 255`` (``in_unsigned`` flag on the carry
    ops / fused kernels).  Zeros stay zeros, so halo columns and spatial
    padding need no special casing — unlike a zero-point shift.
    """
    return jnp.where(q > 127.0, q - 256.0, q).astype(jnp.int8)


def _decode_unsigned_f32(y: jax.Array) -> jax.Array:
    """int8 bits-carry -> true unsigned q as f32 (exact)."""
    yf = y.astype(jnp.float32)
    return yf + 256.0 * (yf < 0)


def build_pallas_forward(
    graph: Dict[str, Any], img_hw: Optional[tuple] = None, backend: str = "pallas"
):
    """Compile-time planner: fold steps/ratios, pick dw channel tiles.

    ``graph`` is the output of :func:`spef_tpu.quant.convert.convert_qat_params`.
    Returns a jittable ``images -> (ori, pos)``.

    ``backend``: 'pallas' uses the fused Pallas kernels; 'xla' runs the SAME
    int8-carry pipeline through XLA integer dots/convs (identical numerics,
    one fused XLA program — much faster to compile, useful where compile
    latency matters and as the A/B baseline for the kernels).

    Unsigned 8-bit activation grids (qmax 255 — the w8a8 recipe family, and
    the boundary recipe's stem/head edges) travel as **uint8 bits in int8
    containers** (``_bits_int8``): producers emit bits (``out_bits``) and
    consumers decode in-kernel (``in_unsigned``).  Bits-carry zeros are
    real zeros, so depthwise halo padding needs no zero-point bookkeeping
    — unlike int8_carry's zp-shift formulation of the same identity.
    """
    assert backend in ("pallas", "xla")
    mm = int8_matmul_requant if backend == "pallas" else xla_matmul_requant
    dw = int8_depthwise3x3 if backend == "pallas" else xla_depthwise3x3
    blocks = graph["blocks"]
    n_blocks = len(blocks)

    # The grid each block's OUTPUT must be emitted on = the next consumer's
    # shared grid when it has one, else the block's own shared grid (sum
    # stays on it) or None (float handoff - not used by this family).
    def consumer_grid(i: int):
        if i + 1 < n_blocks:
            nxt = blocks[i + 1]
            if "shared_step" in nxt and (nxt["input_quant"] or nxt["use_residual"]):
                return _grid_params(nxt["shared_step"], nxt["shared_qmax"], signed=True)
        else:
            fs = graph["final_shared"]
            return _grid_params(fs["step"], fs["qmax"], signed=True)
        # Next block consumes raw values; keep the block's own shared grid.
        blk = blocks[i]
        if "shared_step" in blk:
            return _grid_params(blk["shared_step"], blk["shared_qmax"], signed=True)
        return None

    def forward(images: jax.Array):
        if images.dtype == jnp.uint8:
            x = images.astype(jnp.float32) / 255.0
        else:
            levels = 2.0 ** graph["image_bits"] - 1.0
            x = jnp.round(jnp.clip(images, 0.0, 1.0) * levels) / levels

        # Stem: spatial bf16 conv (XLA) -> int8 on the stem act grid.
        stem = graph["stem"]
        wk = stem["w_int"].astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), wk, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y * stem["mult_core"] + stem["bias"], 0.0)
        step = stem["act_step"]
        q = jnp.clip(jnp.round(y / step), 0, stem["act_qmax"])
        wide = stem["act_qmax"] > 127.0  # unsigned 8-bit edge: bits carry
        y = _bits_int8(q) if wide else q.astype(jnp.int8)
        # y: int8 on `step` grid, NHWC (uint8 bits when `wide`).

        for i, blk in enumerate(blocks):
            b, h, w, c = y.shape
            # Input requant to the block's shared grid (when this block has
            # one and the producer didn't already emit on it).
            if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
                tgt = blk["shared_step"]
                if abs(step - tgt) > 1e-12 or wide:
                    ratio = step / tgt
                    qmax = blk["shared_qmax"]
                    yf = _decode_unsigned_f32(y) if wide else y.astype(jnp.float32)
                    y = jnp.clip(jnp.round(yf * ratio),
                                 -qmax - 1, qmax).astype(jnp.int8)
                step, wide = tgt, False

            residual = y
            res_step = step
            hcur = y
            hstep = step
            # `hwide` tracks whether the CURRENT hidden tensor is a uint8
            # bits-carry (unsigned 8-bit grid): the block input inherits the
            # stem edge's wideness, and each interior producer with a wide
            # act grid (w8a8 family) re-sets it for its consumer.
            hwide = wide

            float_handoff = False
            if "expand" in blk:
                e = blk["expand"]
                m = b * h * w
                has_grid = "act_step" in e
                e_wide = has_grid and e["act_qmax"] > 127.0
                out = mm(
                    hcur.reshape(m, c),
                    e["w_int"].reshape(e["w_int"].shape[-2], e["w_int"].shape[-1]),
                    e["mult_core"] * hstep, e["bias"],
                    relu=True,
                    out_inv_step=float(1.0 / e["act_step"]) if has_grid else None,
                    out_qmax=float(e["act_qmax"]) if has_grid else 127.0,
                    out_qmin=0.0,
                    in_unsigned=hwide, out_bits=e_wide,
                )
                wide = False  # the stem-edge carry was consumed here
                hwide = e_wide
                hidden = e["w_int"].shape[-1]
                hcur = out.reshape(b, h, w, hidden)
                if has_grid:
                    hstep = e["act_step"]
                else:
                    # Unquantized expand (block 0 default recipe): float
                    # handoff -> the depthwise takes the XLA float path.
                    hstep = 1.0
                    float_handoff = True

            d = blk["depthwise"]
            hc = hcur.shape[-1]
            # Mosaic cannot lower strided vector slices -> stride-2 layers
            # (4 of 17) take the XLA depthwise path even on backend='pallas';
            # float-input depthwise likewise.
            dw_grid = "act_step" in d
            d_wide = dw_grid and d["act_qmax"] > 127.0
            dw_inv = float(1.0 / d["act_step"]) if dw_grid else None
            dw_qmax = float(d["act_qmax"]) if dw_grid else 127.0
            dw_fn = dw if (d["stride"] == 1 and not float_handoff and dw_grid
                           ) else xla_depthwise3x3
            if float_handoff:
                # xla_depthwise3x3 accepts float input transparently.
                hcur = xla_depthwise3x3(
                    hcur, d["w_int"].reshape(3, 3, hc), d["mult_core"], d["bias"],
                    stride=d["stride"], in_step=1.0,
                    out_inv_step=dw_inv, out_qmax=dw_qmax, out_bits=d_wide,
                )
            else:
                hcur = dw_fn(
                    hcur, d["w_int"].reshape(3, 3, hc), d["mult_core"], d["bias"],
                    stride=d["stride"], in_step=float(hstep),
                    out_inv_step=dw_inv, out_qmax=dw_qmax,
                    in_unsigned=hwide, out_bits=d_wide,
                )
                wide = False
            hwide = d_wide
            # Boundary-only recipe (no dw act grid): real values flow into
            # the projection, whose multiplier is then unscaled.
            hstep = d["act_step"] if dw_grid else 1.0
            hb, hh, hw, _ = hcur.shape

            p = blk["project"]
            cout = p["w_int"].shape[-1]
            m2 = hb * hh * hw
            out_grid = consumer_grid(i)

            if blk["use_residual"]:
                # project -> requant to shared grid -> +residual -> requant
                # the EXACT sum to the consumer grid, all fused in-kernel.
                # The sum spans up to twice the shared grid (±255 at shared
                # width 8), so it must never be clamped to int8 on the
                # shared grid first (ADVICE r2) — the kernel keeps it wide
                # and emits consumer-grid int8 directly, matching
                # int8_carry/int8_fused numerics.
                assert out_grid is not None  # residual blocks always have a shared grid
                ratio = blk["shared_step"] / out_grid["step"]
                rq, rqmin, rqmax = (out_grid["step"], out_grid["qmin"],
                                    out_grid["qmax"])
                ssum = mm(
                    hcur.reshape(m2, hcur.shape[-1]),
                    p["w_int"].reshape(p["w_int"].shape[-2], p["w_int"].shape[-1]),
                    p["mult_core"] * hstep, p["bias"],
                    residual=residual.reshape(m2, cout),
                    relu=False, out_inv_step=float(1.0 / blk["shared_step"]),
                    out_qmax=float(blk["shared_qmax"]),
                    out_qmin=float(-blk["shared_qmax"] - 1),
                    res_ratio=float(ratio), res_qmax=float(rqmax),
                    res_qmin=float(rqmin), in_unsigned=hwide,
                )
                y = ssum.reshape(hb, hh, hw, cout)
                step = rq
            else:
                assert out_grid is not None, "float handoff not supported in pallas path"
                out = mm(
                    hcur.reshape(m2, hcur.shape[-1]),
                    p["w_int"].reshape(p["w_int"].shape[-2], p["w_int"].shape[-1]),
                    p["mult_core"] * hstep, p["bias"],
                    relu=False, out_inv_step=float(1.0 / out_grid["step"]),
                    out_qmax=float(out_grid["qmax"]), out_qmin=float(out_grid["qmin"]),
                    in_unsigned=hwide,
                )
                y = out.reshape(hb, hh, hw, cout)
                step = out_grid["step"]

        # Final shared grid is already the carry grid by construction.
        fs = graph["final_shared"]
        if abs(step - fs["step"]) > 1e-12:
            ratio = step / fs["step"]
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * ratio),
                         -fs["qmax"] - 1, fs["qmax"]).astype(jnp.int8)
            step = fs["step"]

        hcnv = graph["head_conv"]
        b2, h2, w2, c2 = y.shape
        head_wide = hcnv["act_qmax"] > 127.0
        out = mm(
            y.reshape(b2 * h2 * w2, c2),
            hcnv["w_int"].reshape(hcnv["w_int"].shape[-2], hcnv["w_int"].shape[-1]),
            hcnv["mult_core"] * step, hcnv["bias"],
            relu=True,
            # Unsigned 8-bit head grid (boundary recipe) does not fit the
            # kernel's int8 emit: take f32 out and snap to the grid as int16
            # in XLA — the only consumer is the f32 mean-pool below.
            out_inv_step=None if head_wide else float(1.0 / hcnv["act_step"]),
            out_qmax=float(hcnv["act_qmax"]), out_qmin=0.0,
        )
        cout = hcnv["w_int"].shape[-1]
        y = out.reshape(b2, h2, w2, cout)
        if head_wide:
            y = _emit_unsigned(y, hcnv["act_step"], hcnv["act_qmax"])
        step = hcnv["act_step"]

        # Head: pool (int sum -> float mean) + pool quant + int8 FC branches.
        head = graph["head"]
        pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2)) * step
        p_int = jnp.clip(jnp.round(pooled / head["pool_step"]),
                         -head["pool_qmax"] - 1, head["pool_qmax"]).astype(jnp.int8)

        def fc(w_int, scale, bias):
            acc = jax.lax.dot_general(
                p_int, w_int, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * (head["pool_step"] * scale) + bias

        ori = fc(head["ori_w_int"], head["ori_scale"], head["ori_bias"])
        pos = fc(head["pos_w_int"], head["pos_scale"], head["pos_bias"])
        return ori, pos

    return forward
