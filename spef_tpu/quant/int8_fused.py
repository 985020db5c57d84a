"""Fused-Pallas int8 pipeline — the deployment executor.

Assembles the converted QAT graph (:mod:`spef_tpu.quant.convert`) into a
chain of fused block kernels (:mod:`spef_tpu.ops.pallas.fused_block`):
stem and every inverted-residual block run as ONE Pallas program each, so
activations cross HBM exactly once per block as int8 — the property XLA
cannot deliver for this graph (it keeps requant chains as standalone
fusions; profiled in PERFORMANCE.md r2).

Grid bookkeeping is identical to :mod:`spef_tpu.quant.int8_carry` (tensors
always emitted on the next consumer's grid; integer residual sums
ratio-requantized exactly), so outputs are bit-comparable with
``build_int8_forward`` / the QAT fake-quant network — parity-tested.

Blocks whose spatial shape the kernels cannot tile (width not a multiple
of 8, odd stride-2 dims) fall back to the conv-form XLA carry ops for that
block only; the default 256x256 deployment shape runs fully fused.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from spef_tpu.ops.pallas.fused_block import (
    PACK_MAX_C as _PACK_MAX_C,
    fused_mbconv,
    fused_stem,
    pad_act,
    pad_act_packed,
    unpad_act,
    unpad_act_packed,
)

__all__ = ["build_fused_forward", "plan_backends", "node_signatures", "plan_key"]


def node_signatures(graph: Dict[str, Any], img_hw) -> list:
    """Autotuner signature of every node (stem first), in execution order."""
    from spef_tpu.quant.autotune import block_signature

    h, w = img_hw
    stem_cout = int(graph["stem"]["w_int"].shape[-1])
    sigs = [block_signature("stem", h, w, 3, 12, stem_cout, 2)]
    cur_h, cur_w = h // 2, w // 2
    for blk in graph["blocks"]:
        d = blk["depthwise"]
        stride = d["stride"]
        cin = int(blk["expand"]["w_int"].shape[-2] if "expand" in blk
                  else d["w_int"].shape[-1])
        ch = int(d["w_int"].shape[-1])
        co = int(blk["project"]["w_int"].shape[-1])
        sigs.append(block_signature("mbconv", cur_h, cur_w, cin, ch, co, stride))
        cur_h, cur_w = cur_h // stride, cur_w // stride
    return sigs


def plan_key(graph: Dict[str, Any], img_hw) -> str:
    """Tuning-table key for a persisted GRAPH-LEVEL plan (see tune_fused)."""
    import hashlib

    sigs = node_signatures(graph, img_hw)
    return "plan:" + hashlib.md5("|".join(sigs).encode()).hexdigest()[:12]


def plan_backends(graph: Dict[str, Any], img_hw,
                  transition_ms: float = 0.15) -> Dict[str, Any]:
    """Per-node engine choice from the autotuner's measurements.

    Resolution order:
      1. ``SPEF_ALL_FUSED=1`` forces the all-Pallas pipeline (probe mode).
      2. A persisted GRAPH-LEVEL plan (``plan:<hash>`` in the tuning table,
         written by benchmarks/tune_fused.py's arbitration stage, which
         times the composed candidate programs end-to-end) wins outright:
         isolated per-node times cannot see cross-node XLA fusion, so the
         composed measurement is the final arbiter.
      3. Otherwise a 2-state DP over the node chain minimizes
         ``sum(node_time[backend]) + sum(switch_cost(boundary))``: switching
         engines at a block boundary costs one pad/unpad (and, packed, one
         relayout) HBM pass that per-node timing cannot see — round-3
         measured an interleaved 7-fused/10-xla plan running 3x slower than
         either pure path, so minority-backend nodes must EARN their
         boundary crossings.  Per-boundary costs come from composed
         two-block measurements when present (``trans:<sig>-><sig>`` tuning
         entries written by benchmarks/probe_transition.py — the VERDICT r3
         "measured composed segments" requirement); ``transition_ms`` is the
         fallback for unmeasured boundaries.  Nodes with only one measured
         time (or none) are pinned to the fused kernel as before.
    """
    blocks = graph["blocks"]
    if os.environ.get("SPEF_ALL_FUSED"):
        return {"stem": "fused", "blocks": ["fused"] * len(blocks)}
    from spef_tpu.quant.autotune import load_tuning

    table = load_tuning()
    stored = table.get(plan_key(graph, img_hw))
    if stored and "blocks" in stored and len(stored["blocks"]) == len(blocks):
        return {"stem": stored["stem"], "blocks": list(stored["blocks"])}
    big = 1e9

    def times(sig: str):
        """(fused_ms, xla_ms) with `big` pinning unmeasured engines."""
        e = table.get(sig)
        if not e or e.get("ms") is None:
            return 0.0, big  # never measured: pin fused at equal-cost
        if e.get("xla_ms") is None:
            return float(e["ms"]), big
        return float(e["ms"]), float(e["xla_ms"])

    sigs = node_signatures(graph, img_hw)
    node_t = [times(s) for s in sigs]  # [(fused, xla)] per node

    def boundary_cost(k: int) -> float:
        """Switch penalty entering node k (measured if probed, else scalar)."""
        e = table.get(f"trans:{sigs[k - 1]}->{sigs[k]}")
        if e and e.get("transition_ms") is not None:
            return max(0.0, float(e["transition_ms"]))
        return transition_ms

    # DP: cost[k][b] = best cost of nodes 0..k ending in backend b.
    cost = list(node_t[0])
    back: list = [[None, None]]
    for k, (f_ms, x_ms) in enumerate(node_t[1:], start=1):
        pen = boundary_cost(k)
        new = [0.0, 0.0]
        ptr = [0, 0]
        for b, t in ((0, f_ms), (1, x_ms)):
            stay = cost[b]
            switch = cost[1 - b] + pen
            ptr[b] = b if stay <= switch else 1 - b
            new[b] = min(stay, switch) + t
        cost = new
        back.append(ptr)
    b = 0 if cost[0] <= cost[1] else 1
    choice = [b]
    for ptr in reversed(back[1:]):
        b = ptr[b]
        choice.append(b)
    choice.reverse()
    names = ["fused", "xla"]
    return {"stem": names[choice[0]],
            "blocks": [names[c] for c in choice[1:]]}


def _grid(step: float, qmax: float) -> Dict[str, float]:
    return {"step": step, "qmax": qmax, "qmin": -qmax - 1}


def _consumer_grid(graph, i: int) -> Optional[Dict[str, float]]:
    blocks = graph["blocks"]
    if i + 1 < len(blocks):
        nxt = blocks[i + 1]
        if "shared_step" in nxt and (nxt["input_quant"] or nxt["use_residual"]):
            return _grid(nxt["shared_step"], nxt["shared_qmax"])
    else:
        fs = graph["final_shared"]
        return _grid(fs["step"], fs["qmax"])
    blk = blocks[i]
    if "shared_step" in blk:
        return _grid(blk["shared_step"], blk["shared_qmax"])
    return None


def _xla_block(y, blk, step, out_grid, in_unsigned=False):
    """Conv-form XLA fallback for one block (int8 in/out, carry semantics)."""
    from spef_tpu.quant.int8_carry import _conv_acc, _requant_int8

    if in_unsigned:
        # uint8 bits-carry input (unsigned 8-bit stem edge): decode to the
        # true q; int16 keeps the conv padding a real zero.
        assert not blk["use_residual"]
        y = y.astype(jnp.int16) & 255
    residual = y
    h, hstep = y, step
    float_handoff = False
    def _grid_snap(yf, step, qmax):
        # Snap to the act grid; a wide unsigned grid (qmax 255, w8a8
        # family) does not fit int8 — carry int16 (this fallback stays
        # inside one fused XLA program, so the wider dtype costs nothing
        # materialized; the q values 0..255 are exact in the bf16 conv
        # operand downstream).
        q = jnp.clip(jnp.round(yf / step), 0, qmax)
        return q.astype(jnp.int16 if qmax > 127.0 else jnp.int8)

    if "expand" in blk:
        e = blk["expand"]
        acc = _conv_acc(h, e["w_int"], 1, 1)
        yf = jnp.maximum(acc * (e["mult_core"] * hstep) + e["bias"], 0.0)
        if "act_step" in e:
            h = _grid_snap(yf, e["act_step"], e["act_qmax"])
            hstep = e["act_step"]
        else:
            h, hstep, float_handoff = yf.astype(jnp.bfloat16), None, True
    d = blk["depthwise"]
    acc = _conv_acc(h, d["w_int"], d["stride"], h.shape[-1])
    mult = d["mult_core"] * (1.0 if float_handoff else hstep)
    yf = jnp.maximum(acc * mult + d["bias"], 0.0)
    if "act_step" in d:
        h, dstep = _grid_snap(yf, d["act_step"], d["act_qmax"]), d["act_step"]
    else:  # boundary-only recipe: real values into the projection
        h, dstep = yf.astype(jnp.bfloat16), 1.0
    p = blk["project"]
    acc = _conv_acc(h, p["w_int"], 1, 1)
    pf = acc * (p["mult_core"] * dstep) + p["bias"]
    if blk["use_residual"]:
        q = jnp.clip(jnp.round(pf / blk["shared_step"]),
                     -blk["shared_qmax"] - 1, blk["shared_qmax"]).astype(jnp.int32)
        s = q + residual.astype(jnp.int32)
        step = blk["shared_step"]
        if out_grid is not None and abs(step - out_grid["step"]) > 1e-12:
            ratio = step / out_grid["step"]
            y = jnp.clip(jnp.round(s.astype(jnp.float32) * ratio),
                         out_grid["qmin"], out_grid["qmax"]).astype(jnp.int8)
            step = out_grid["step"]
        else:
            y = jnp.clip(s, -128, 127).astype(jnp.int8)
    else:
        y = _requant_int8(pf, out_grid["step"], out_grid["qmax"], out_grid["qmin"])
        step = out_grid["step"]
    return y, step


def _xla_stem(stem: Dict[str, Any], images: jax.Array) -> jax.Array:
    """Conv-form XLA stem (uint8 frames -> int8/bits-carry stem output)."""
    from spef_tpu.quant.int8_carry import _conv_acc
    from spef_tpu.quant.int8_pallas import _bits_int8

    acc = _conv_acc(images, stem["w_int"], 2, 1)
    yf = jnp.maximum(acc * (stem["mult_core"] / 255.0) + stem["bias"], 0.0)
    q = jnp.clip(jnp.round(yf / stem["act_step"]), 0, stem["act_qmax"])
    return _bits_int8(q) if stem["act_qmax"] > 127.0 else q.astype(jnp.int8)


def _block_fusable(blk, h: int, w: int) -> bool:
    stride = blk["depthwise"]["stride"]
    if w % 8:
        return False
    if stride == 2 and (h % 2 or w % 2 or (w // 2) % 8):
        return False
    return True


def build_fused_forward(graph: Dict[str, Any], interpret: bool = False,
                        plan: Optional[Dict[str, Any]] = None):
    """Close over the graph -> jittable ``images -> (ori, pos)``.

    ``plan`` forces an explicit per-node backend plan (used by
    benchmarks/tune_fused.py's graph-level arbitration); default is
    :func:`plan_backends` at trace time.
    """
    blocks = graph["blocks"]
    forced_plan = plan

    def forward(images: jax.Array):
        assert images.dtype == jnp.uint8, "fused pipeline takes uint8 frames"
        b, hh, ww, _ = images.shape
        fusable_stem = hh % 2 == 0 and ww % 2 == 0 and (ww // 2) % 8 == 0

        # (h, w, c) = logical dims; `layout` tracks whether y is the padded
        # inter-kernel layout tensor or a plain NHWC int8 tensor.  Narrow
        # boundary tensors (c <= 32) travel width-PACKED — 4 pixels per
        # 128-lane group — cutting their HBM bytes 4x (see fused_block.py);
        # the invariant is `packed == (layout and c <= PACK_MAX_C)`.
        # OPT-IN (SPEF_PACK=1): the in-kernel unpack needs a lane->sublane
        # SPLIT reshape that the current Mosaic cannot lower (the merge
        # direction lowers; verified on-chip r2).  The packed path is
        # interpret-tested and kept for the phase-major kernel rework that
        # will avoid the relayout; production defaults to plain layouts.
        PACK_MAX_C = _PACK_MAX_C if os.environ.get("SPEF_PACK") else 0
        # Per-node backend plan: the autotuner times every node in BOTH the
        # fused-Pallas and the conv-form XLA formulation (quant/autotune.py);
        # the executor runs whichever measured faster.  Bit-exact either way
        # (parity-tested), so this is pure schedule selection — the
        # FINN-folding / Ansor analogue extended to engine choice.
        plan = forced_plan if forced_plan is not None else plan_backends(graph, (hh, ww))

        if fusable_stem and plan["stem"] == "fused":
            stem_packed = int(graph["stem"]["w_int"].shape[-1]) <= PACK_MAX_C
            y = fused_stem(images, graph["stem"], interpret=interpret,
                           out_packed=stem_packed)
            layout = True
        else:
            y = _xla_stem(graph["stem"], images)
            layout = False
        h, w = hh // 2, ww // 2
        c = int(graph["stem"]["w_int"].shape[-1])
        step = graph["stem"]["act_step"]
        # Unsigned 8-bit stem grid (boundary recipe): y carries uint8 BITS
        # (fused_stem emits them; _bits_int8 above matches) — consumers
        # decode via in_unsigned until the first requant/block clears it.
        unsigned = float(graph["stem"]["act_qmax"]) > 127.0

        for i, blk in enumerate(blocks):
            # Producers emit on the consumer grid, so this requant only fires
            # for a first block with input_quant (not in the default family).
            # Elementwise on the layout tensor is fine: zeros stay zeros.
            if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
                tgt = blk["shared_step"]
                if abs(step - tgt) > 1e-12 or unsigned:
                    from spef_tpu.quant.int8_pallas import _decode_unsigned_f32

                    ratio = step / tgt
                    qmax = blk["shared_qmax"]
                    yf = (_decode_unsigned_f32(y) if unsigned
                          else y.astype(jnp.float32))
                    y = jnp.clip(jnp.round(yf * ratio),
                                 -qmax - 1, qmax).astype(jnp.int8)
                step, unsigned = tgt, False

            out_grid = _consumer_grid(graph, i)
            shared = (_grid(blk["shared_step"], blk["shared_qmax"])
                      if "shared_step" in blk else None)
            stride = blk["depthwise"]["stride"]
            cout = int(blk["project"]["w_int"].shape[-1])
            if _block_fusable(blk, h, w) and plan["blocks"][i] == "fused":
                in_packed = c <= PACK_MAX_C
                out_packed = cout <= PACK_MAX_C
                if in_packed and not out_packed:
                    # The phase-major kernel emits the packed layout only;
                    # at the packed chain's end (c<=32 -> cout>32, e.g.
                    # MobileNetV2 block 7) relayout once via XLA — a cheap
                    # HBM pass at the low-resolution transition point.
                    if layout:
                        y = pad_act(unpad_act_packed(y, w, c))
                    in_packed = False
                repack_out = out_packed and not in_packed
                if repack_out:
                    # Wide->narrow (c>32 -> cout<=32, absent from
                    # MobileNetV2 but reachable for custom nets): the
                    # plain-input kernel's packed store needs a lane-merge
                    # reshape Mosaic cannot lower on-chip (probed r3) —
                    # emit plain, then repack XLA-side to keep the
                    # `packed == (layout and c <= PACK_MAX_C)` invariant.
                    out_packed = False
                if not layout:
                    y = pad_act_packed(y) if in_packed else pad_act(y)
                    layout = True
                y = fused_mbconv(y, blk, in_step=step, out_grid=out_grid,
                                 shared_grid=shared, logical_hw=(h, w),
                                 interpret=interpret, in_unsigned=unsigned,
                                 in_packed=in_packed, out_packed=out_packed)
                if repack_out:
                    y = pad_act_packed(
                        unpad_act(y, w // stride, cout))
                if blk["use_residual"]:
                    if out_grid is not None and abs(
                            blk["shared_step"] - out_grid["step"]) > 1e-12:
                        step = out_grid["step"]
                    else:
                        step = blk["shared_step"]
                else:
                    step = out_grid["step"]
            else:
                if layout:
                    y = (unpad_act_packed(y, w, c) if c <= PACK_MAX_C
                         else unpad_act(y, w, c))
                    layout = False
                y, step = _xla_block(y, blk, step, out_grid,
                                     in_unsigned=unsigned)
            unsigned = False  # blocks emit on signed consumer grids
            h, w = h // stride, w // stride
            c = cout

        if layout:
            y = unpad_act_packed(y, w, c) if c <= PACK_MAX_C else unpad_act(y, w, c)

        fs = graph["final_shared"]
        if abs(step - fs["step"]) > 1e-12:
            ratio = step / fs["step"]
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * ratio),
                         -fs["qmax"] - 1, fs["qmax"]).astype(jnp.int8)
            step = fs["step"]

        # Head conv (1x1 at the final 1/32 resolution) + pooled int8 FCs —
        # tiny tensors; the conv-form XLA ops suffice here.
        hcnv = graph["head_conv"]
        from spef_tpu.quant.int8_carry import _conv_acc
        from spef_tpu.quant.int8_pallas import _emit_unsigned

        acc = _conv_acc(y, hcnv["w_int"], 1, 1)
        yf = jnp.maximum(acc * (hcnv["mult_core"] * step) + hcnv["bias"], 0.0)
        # int16 when the grid is unsigned 8-bit (boundary recipe) — the only
        # consumer is the f32 mean-pool below.
        y = _emit_unsigned(yf, hcnv["act_step"], hcnv["act_qmax"])
        step = hcnv["act_step"]

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
