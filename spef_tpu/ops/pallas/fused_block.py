"""Fused inverted-residual block kernels — the int8 pipeline's hot path.

One Pallas program per MobileNetV2 block executes
``expand (1x1) -> depthwise 3x3 -> project (1x1) -> residual -> requant``
with every intermediate VMEM-resident: activations cross HBM exactly once
per block as int8.  This is what XLA cannot do for the int8-carry graph —
it refuses to fuse requantization chains into convolutions, so every grid
change costs a full HBM pass (profiled: ~half the step time,
PERFORMANCE.md r2) — and it is the TPU-native counterpart of FINN's folded
single-bitstream dataflow pipeline (`/root/reference/src/finn/
build_steps.py:124-159`), where the whole network streams through the
fabric without touching DRAM.

Inter-kernel activation layout (Mosaic constraints probed on-chip,
benchmarks/probe_mosaic.py; rank-4 int8 HBM arrays are physically padded
to (8, 128) tiles on the two minor dims and DMA slices must be
tile-aligned there):

    (B, H, W2, C128)  int8,  W2 = round_up(W + 2, 8),  C128 = ceil128(C)

  * data lives at cols [1, W+1); col 0 / col W+1 are the depthwise SAME
    halo, written as REAL zeros by the producer; cols beyond and channels
    >= C are zero;
  * consumers DMA row slabs only — rows are the untiled dim, so arbitrary
    offsets/sizes lower; no per-kernel jnp.pad repacks anywhere;
  * channel padding makes every matmul K a multiple of 128 (full-width MXU
    passes instead of K=16..96 partial ones);
  * row halo is NOT materialized: boundary programs mask invalid slab rows
    branchlessly (garbage * 0) in the hidden tensor.

Other probed rules baked in: integer arithmetic is exact on the MXU via
bf16 operands + f32 accumulation; strided vector slices don't lower —
stride-2 depthwise uses reshape-split + take on rows (untiled) and width
(sublane); uint8 loads cast through int32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mbconv", "fused_stem", "pad_act", "unpad_act", "act_layout",
           "mbconv_vmem_bytes", "PACK_MAX_C", "packed_width",
           "act_layout_packed", "pad_act_packed", "unpad_act_packed"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Mosaic's default scoped-VMEM carve-out is 16 MB; v5e has 128 MiB physical
# VMEM, so large fused tiles legitimately raise the limit (standard practice
# for flash-attention-class kernels).  Budget tiles to _VMEM_BUDGET and pass
# a limit with headroom for Mosaic's own temporaries + out-tile buffering.
_VMEM_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def mbconv_vmem_bytes(tile_oh: int, stride: int, W2: int, Wo: int, Wo2: int,
                      Cp: int, Chp: int, Cop: int, has_expand: bool) -> int:
    """Estimate of one program's scoped-VMEM footprint (bytes).

    Mirrors the live intermediates of ``_mbconv_kernel``: the int8 input
    slab, the f32 hidden tensor + its bf16 matmul copy, the depthwise
    taps/accumulator, the projection activations, weights, and the out
    tile.  Deliberately ~30% conservative — Mosaic keeps extra copies."""
    SR = tile_oh + 2 if stride == 1 else 2 * tile_oh + 2
    slab = 2 * SR * W2 * Cp  # double-buffered input pipeline
    hidden = SR * W2 * Chp * (4 + 2)  # f32 + bf16 matmul operand
    dw = (3 if stride == 1 else 6) * tile_oh * W2 * Chp * 4
    proj = tile_oh * Wo * (Chp * 2 + Cop * 4 * 2)
    out = 2 * tile_oh * Wo2 * Cop  # int8, double-buffered
    weights = 4 * (Cp * Chp * has_expand + 9 * Chp + Chp * Cop)
    return slab + hidden + dw + proj + out + weights


def _fit_tile_oh(ho: int, cap: int, vmem_of) -> int:
    """Largest power-of-two-ish tile (divisor of ho, <= cap) whose estimated
    footprint fits the budget; falls back to the smallest divisor."""
    cands = sorted({t for t in (4, 8, 16, 32, 64) if t <= min(ho, cap)
                    and ho % t == 0} | ({ho} if ho <= cap else set()),
                   reverse=True)
    for t in cands:
        if vmem_of(t) <= _VMEM_BUDGET:
            return t
    return cands[-1] if cands else ho


def act_layout(h: int, w: int, c: int):
    """(W2, C128) physical dims of the inter-kernel activation layout."""
    return _round_up(w + 2, 8), _round_up(c, 128)


def stem_vmem_bytes(t: int, Ws: int, Ws2: int, Cop: int) -> int:
    """Mirror of ``fused_stem``'s in-kernel VMEM estimator (keep in sync)."""
    slab = 2 * (t + 1) * Ws2 * 128
    taps = 3 * t * Ws2 * 128 * 4 + t * Ws * 128 * 2
    acc = t * Ws * Cop * 4 * 2
    return slab + taps + acc + 4 * 128 * Cop * 4 + 2 * t * Ws2 * Cop


def stem_default_tile(Hs: int, Ws: int, Ws2: int, Cop: int) -> int:
    """The untuned tile ``fused_stem`` picks when no tuning entry exists."""
    return _fit_tile_oh(Hs, 32, lambda t: stem_vmem_bytes(t, Ws, Ws2, Cop))


def mbconv_default_tiles(B: int, Ho: int, stride: int, W2: int, Wo: int, Wo2: int,
                         Cp: int, Chp: int, Cop: int, has_expand: bool):
    """The untuned (tile_oh, tile_b) ``fused_mbconv`` picks when no tuning
    entry exists — `_fit_tile_oh` + the auto batch-tiling doubler below.
    Used by quant/autotune so the reported speedup baseline is the
    configuration the executor actually runs (ADVICE r2)."""
    vmem_of = lambda t, nb=1: nb * mbconv_vmem_bytes(
        t, stride, W2, Wo, Wo2, Cp, Chp, Cop, has_expand)
    t = _fit_tile_oh(Ho, 32, vmem_of)
    sr = t + 2 if stride == 1 else 2 * t + 2
    nb = 1
    while (B % (nb * 2) == 0 and nb * sr * W2 < 4096
           and vmem_of(t, nb * 2) <= _VMEM_BUDGET):
        nb *= 2
    return t, nb


def pad_act(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> layout tensor (XLA-side; used at pipeline boundaries)."""
    b, h, w, c = x.shape
    w2, c128 = act_layout(h, w, c)
    return jnp.pad(x, ((0, 0), (0, 0), (1, w2 - w - 1), (0, c128 - c)))


def unpad_act(x: jax.Array, w: int, c: int) -> jax.Array:
    return x[:, :, 1 : w + 1, :c]


# --- width-packed layout for narrow boundary tensors (C <= 32) ------------
#
# The plain layout lane-pads C to 128, so a 16-32-channel early-block tensor
# carries 4-8x its real bytes across HBM — and those blocks dominate the
# pipeline's traffic (PERFORMANCE.md stage table).  The packed layout folds
# 4 consecutive pixels into the 128-lane tile instead:
#
#     (B, H, W4, 128) int8,  W4 = round_up(W + 2, 32) // 4,
#     lane = 32 * p + ch  for logical col 4*w4 + p  (col 0 = halo, zeros)
#
# Kernels unpack with ONE minor-dims reshape (W4, 128) -> (4*W4, 32) after
# the slab DMA and repack outputs the same way, so only the copies change.

PACK_MAX_C = 32


def packed_width(w: int) -> int:
    """W4 for logical width ``w`` (pixels per 128-lane group = 4)."""
    return _round_up(w + 2, 32) // 4


def act_layout_packed(h: int, w: int, c: int):
    assert c <= PACK_MAX_C
    return packed_width(w), 128


def pad_act_packed(x: jax.Array) -> jax.Array:
    """(B, H, W, C<=32) -> packed layout tensor (XLA-side)."""
    b, h, w, c = x.shape
    w4 = packed_width(w)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 4 * w4 - w - 1), (0, 32 - c)))
    return x.reshape(b, h, w4, 128)


def unpad_act_packed(x: jax.Array, w: int, c: int) -> jax.Array:
    b, h, w4, _ = x.shape
    return x.reshape(b, h, 4 * w4, 32)[:, :, 1 : w + 1, :c]


def _pad2(a, rows: int, cols: int) -> jnp.ndarray:
    a = np.asarray(a)
    return jnp.asarray(np.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1]))))


def _pad1(a, n: int, fill: float = 0.0) -> jnp.ndarray:
    a = np.asarray(a, np.float32).reshape(-1)
    out = np.full(n, fill, np.float32)
    out[: a.shape[0]] = a
    return jnp.asarray(out.reshape(1, n))


def _row_dma_cases(x_hbm, slab, sem, b, t, start, NR, H, n_tiles, top_halo=True,
                   bottom_halo=True, nb=0, action="both", tile_rows=0):
    """DMA the row slab [start, start+NR) of image b (or of the ``nb``-image
    chunk starting at ``b*nb``), clamped to [0, H); slab row r then holds
    input row (start + r) where valid.  Full-width, full-channel copies only
    (rows and batch are untiled dims).

    ``action``: 'both' issues start+wait inline (serialized — probe shows
    this costs 8-15 ms/block of pure stall); 'start'/'wait' split the copy
    so callers can double-buffer it across grid steps (``slab``/``sem``
    must then be the per-slot refs).  ``start`` may be a traced scalar; with
    ``tile_rows`` set it is recomputed from ``t`` so a prefetching program
    can describe ANOTHER tile's copy (wait must rebuild the same descriptor).
    """
    if tile_rows:
        start = t * tile_rows - 1

    def copy(src_row0, n_rows, dst_row0):
        if nb:
            src = x_hbm.at[pl.ds(b * nb, nb), pl.ds(src_row0, n_rows)]
            dst = slab.at[:, pl.ds(dst_row0, n_rows)]
        else:
            src = x_hbm.at[b, pl.ds(src_row0, n_rows)]
            dst = slab.at[pl.ds(dst_row0, n_rows)]
        dma = pltpu.make_async_copy(src, dst, sem)
        if action in ("both", "start"):
            dma.start()
        if action in ("both", "wait"):
            dma.wait()

    lead = 1 if top_halo else 0
    tail = 1 if bottom_halo else 0
    if n_tiles == 1:
        copy(0, NR - lead - tail, lead)
    elif not bottom_halo:
        @pl.when(t == 0)
        def _first():
            copy(0, NR - lead, lead)

        @pl.when(t > 0)
        def _rest():
            copy(start, NR, 0)
    else:
        @pl.when(t == 0)
        def _first():
            copy(0, NR - 1, 1)

        @pl.when(t == n_tiles - 1)
        def _last():
            copy(start, NR - 1, 0)

        @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
        def _middle():
            copy(start, NR, 0)


def _store_with_halo(out_ref, data, nb, th, Wo, Wo2, C):
    """Write (nb, th, Wo, C) into the layout tile (nb, th, Wo2, C): data at
    cols [1, Wo+1), zero halo/padding columns."""
    out_ref[:, :, pl.ds(1, Wo), :] = data
    out_ref[:, :, pl.ds(0, 1), :] = jnp.zeros((nb, th, 1, C), data.dtype)
    if Wo2 > Wo + 1:
        out_ref[:, :, pl.ds(Wo + 1, Wo2 - Wo - 1), :] = jnp.zeros(
            (nb, th, Wo2 - Wo - 1, C), data.dtype)


# ---------------------------------------------------------------------------
# Phase-major packed formulation (in_packed path)
# ---------------------------------------------------------------------------
#
# Mosaic cannot lower the lane->sublane SPLIT reshape the original packed
# path needed to unfold 4 pixels/lane-group after the slab DMA (the merge
# direction lowers; probed on-chip r2).  The phase-major formulation never
# relayouts: the packed slab (G, 128) is consumed directly with lanes read
# as 4 column-phases x 32 channels,
#
#   * expand: ONE block-diagonal matmul (128, 4*Chp) — phase p's channel
#     slice maps to hidden lane block p.  Same MXU work as the unpacked
#     K=128-padded matmul (identical M*K*N), 4x fewer rows.
#   * hidden tensor stays phase-major: lane = p*Chp + c, column = 4g + p.
#   * depthwise column taps: +/-1 column shifts are 128-aligned LANE
#     slices + concat, with the group-boundary phase fixed up from the
#     sublane(G)-shifted tensor; stride 2 first merges group pairs
#     (sublane->lane, the direction that lowers) into 8 phases and selects
#     even/odd phase blocks per tap.
#   * project: block-diagonal matmul (4*Chp, 128) emits the packed OUTPUT
#     layout natively — there is no repack anywhere.
#
# This is the FINN-folding analogue for narrow tensors: layout follows the
# dataflow, so <=32-channel block edges carry 1/4 of the lane-padded bytes
# across HBM (`/root/reference/src/finn/folding.py:312-442` plays this
# role in fabric).


def _pm_block_diag(w: np.ndarray, row_sub: int, col_sub: int) -> np.ndarray:
    """(4*row_sub, 4*col_sub) f32 with w at [p*row_sub.., p*col_sub..]."""
    out = np.zeros((4 * row_sub, 4 * col_sub), np.float32)
    r, c = np.asarray(w, np.float32).shape
    for p in range(4):
        out[p * row_sub: p * row_sub + r, p * col_sub: p * col_sub + c] = w
    return out


def _pm_gshift(a, d, NB, SR, G, L):
    """Shift along the group (second-minor) axis: result[g] = a[g+d]
    (zeros shifted in at the edge); d in {+1, -1}."""
    z = jnp.zeros((NB, SR, 1, L), a.dtype)
    if d == 1:
        return jnp.concatenate(
            [jax.lax.slice(a, (0, 0, 1, 0), (NB, SR, G, L)), z], axis=2)
    return jnp.concatenate(
        [z, jax.lax.slice(a, (0, 0, 0, 0), (NB, SR, G - 1, L))], axis=2)


def _pm_col_shift(h, s, NB, SR, G, Chp):
    """Column shift by s in {-1, 0, +1} of a phase-major tensor: lane-slice
    + concat, group boundary from the G-shifted strip."""
    L4 = 4 * Chp
    if s == 0:
        return h
    if s == 1:
        lo = jax.lax.slice(h, (0, 0, 0, 0), (NB, SR, G, Chp))  # phase 0
        return jnp.concatenate(
            [jax.lax.slice(h, (0, 0, 0, Chp), (NB, SR, G, L4)),
             _pm_gshift(lo, 1, NB, SR, G, Chp)], axis=3)
    hi = jax.lax.slice(h, (0, 0, 0, 3 * Chp), (NB, SR, G, L4))  # phase 3
    return jnp.concatenate(
        [_pm_gshift(hi, -1, NB, SR, G, Chp),
         jax.lax.slice(h, (0, 0, 0, 0), (NB, SR, G, 3 * Chp))], axis=3)


def _mbconv_pm_body(
    sl, w1, m1, b1, w2, m2, b2, w3, m3, b3, out_ref, probe_store, *,
    NB, H, W, Wo, G, Chp, SR, stride, th, start, has_expand, hidden_grid,
    use_residual, inv_h, qmax_h, inv_d, qmax_d, dw_grid,
    inv_sh, qmax_sh, ratio_out, qmin_o, qmax_o, G_out, stage,
    in_unsigned=False,
):
    """Phase-major compute on a packed slab (NB, SR, G, 128).

    All per-channel operands (m*, b*, w2) arrive phase-tiled (length
    4*Chp / 128); w1/w3 arrive block-diagonal (see _pm_block_diag).
    """
    L4 = 4 * Chp

    # Valid-position mask in phase-major coordinates: column = 4g + p.
    rows = jax.lax.broadcasted_iota(jnp.int32, (SR, G, L4), 0) + start
    col = (4 * jax.lax.broadcasted_iota(jnp.int32, (SR, G, L4), 1)
           + jax.lax.broadcasted_iota(jnp.int32, (SR, G, L4), 2) // Chp)
    valid = ((rows >= 0) & (rows < H) & (col >= 1) & (col <= W))
    mask = valid.astype(jnp.float32)[None]

    # Expand: one block-diagonal matmul; the identity case (no-expand
    # blocks) must NOT apply relu/bias — the input is signed.
    xf = sl.reshape(NB * SR * G, 128).astype(jnp.float32)
    if in_unsigned:
        # uint8 bits carry (unsigned 8-bit producer grid, e.g. the boundary
        # stem): recover the true q; 0..255 stays exact through bf16.
        xf = xf + 256.0 * (xf < 0.0)
    xs = xf.astype(jnp.bfloat16)
    acc1 = jnp.dot(xs, w1[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).reshape(NB, SR, G, L4)
    if has_expand:
        h = jnp.maximum(acc1 * m1[:] + b1[:], 0.0)
        if hidden_grid:
            h = jnp.clip(jnp.round(h * inv_h), 0.0, qmax_h)
        h = h * mask
    else:
        h = acc1 * mask
    if stage == "expand":
        probe_store(h)
        return

    w2f = w2[:].astype(jnp.float32)  # (9, L4) phase-tiled
    if stride == 1:
        taps = {s: _pm_col_shift(h, s, NB, SR, G, Chp) for s in (-1, 0, 1)}
        if stage == "dwsel":
            # Attribution probe: cost of BUILDING the column-shifted tap
            # tensors (lane slices + concats) separate from the 9-tap fma
            # accumulation (= dw - dwsel).  Pays one extra full-tensor add.
            probe_store(taps[-1] + taps[1])
            return
        acc = jnp.zeros((NB, th, G, L4), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(taps[dx - 1], (0, dy, 0, 0),
                                    (NB, dy + th, G, L4))
                acc = acc + tap * w2f[3 * dy + dx]
        Gc = G
    else:
        # Merge group pairs (sublane->lane, the direction Mosaic lowers):
        # 8 input phases per super-group; output phase p_o tap dx reads
        # input phase q = 2*p_o + dx - 2 (q<0 from the previous group).
        G2 = G // 2
        hh = h.reshape(NB, SR, G2, 2 * L4)

        def sel(q):
            if q < 0:
                strip = jax.lax.slice(hh, (0, 0, 0, (q + 8) * Chp),
                                      (NB, SR, G2, (q + 9) * Chp))
                return _pm_gshift(strip, -1, NB, SR, G2, Chp)
            return jax.lax.slice(hh, (0, 0, 0, q * Chp),
                                 (NB, SR, G2, (q + 1) * Chp))

        if stage == "dwsel":
            # Attribution probe: cost of the phase-select concats alone
            # (the production loop below builds the same three tensors one
            # at a time); pays two extra full-tensor adds.
            s_list = [jnp.concatenate([sel(2 * p + dx - 2) for p in range(4)],
                                      axis=3) for dx in range(3)]
            probe_store(s_list[0] + s_list[1] + s_list[2])
            return
        acc = jnp.zeros((NB, th, G2, L4), jnp.float32)
        for dx in range(3):
            s_dx = jnp.concatenate([sel(2 * p + dx - 2) for p in range(4)],
                                   axis=3)
            for dy in range(3):
                rsel = jax.lax.slice(s_dx, (0, dy, 0, 0),
                                     (NB, dy + 2 * th, G2, L4))
                rsel = rsel.reshape(NB, th, 2, G2, L4)[:, :, 0]  # rows 2r+dy
                acc = acc + rsel * w2f[3 * dy + dx]
        Gc = G2
    y = jnp.maximum(acc * m2[:] + b2[:], 0.0)
    if dw_grid:
        y = jnp.clip(jnp.round(y * inv_d), 0.0, qmax_d)
    if stage == "dw":
        probe_store(y)
        return

    # Project: block-diagonal matmul emits the packed output layout.
    yb = y.reshape(NB * th * Gc, L4).astype(jnp.bfloat16)
    pf = (jnp.dot(yb, w3[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * m3[:] + b3[:]
          ).reshape(NB, th, Gc, 128)
    if use_residual:
        q = jnp.clip(jnp.round(pf * inv_sh), -qmax_sh - 1.0, qmax_sh)
        res = jax.lax.slice(sl, (0, 1, 0, 0), (NB, 1 + th, G, 128))
        s = q + res.astype(jnp.float32)
        if ratio_out is not None:
            out = jnp.clip(jnp.round(s * ratio_out), qmin_o, qmax_o)
        else:
            out = jnp.clip(s, -128.0, 127.0)
    else:
        out = jnp.clip(jnp.round(pf * ratio_out), qmin_o, qmax_o)

    # Output column mask (halo col 0 + cols > Wo are stored as real zeros;
    # lanes beyond Cout are zero already: block-diag w3/bias are padded).
    ocol = (4 * jax.lax.broadcasted_iota(jnp.int32, (th, Gc, 128), 1)
            + jax.lax.broadcasted_iota(jnp.int32, (th, Gc, 128), 2) // 32)
    omask = ((ocol >= 1) & (ocol <= Wo)).astype(jnp.float32)[None]
    out_ref[:, :, pl.ds(0, Gc), :] = (out * omask).astype(jnp.int8)
    if G_out > Gc:
        out_ref[:, :, pl.ds(Gc, G_out - Gc), :] = jnp.zeros(
            (NB, th, G_out - Gc, 128), jnp.int8)


# ---------------------------------------------------------------------------
# Fused inverted-residual block
# ---------------------------------------------------------------------------


def _mbconv_kernel(
    x_hbm, *refs,
    NB, H, W, Wo, W2, Wo2, Cp, Chp, Cop, SR, stride, tile_oh,
    has_expand, hidden_grid, use_residual,
    inv_h, qmax_h, inv_d, qmax_d, dw_grid, in_packed, out_packed,
    inv_sh, qmax_sh, ratio_out, qmin_o, qmax_o, n_tiles,
    stage="full", in_unsigned=False,
):
    """One (batch-chunk, row-tile) program over NB images.  refs:
    [w1, m1, b1]?, w2, m2, b2, w3, m3, b3, out, slab, sem.

    ``stage`` truncates the kernel for on-chip cost attribution
    (benchmarks/probe_stage.py): 'dma' stops after the slab copy,
    'expand' after the hidden tensor, 'dw' after the depthwise stage;
    truncated variants store a reduction of the live tensor so Mosaic
    cannot dead-code the measured work."""
    if has_expand or in_packed:
        # The phase-major path always carries an expand operand (identity
        # block-diagonal for no-expand blocks).
        w1, m1, b1, w2, m2, b2, w3, m3, b3, out_ref, slab, sem = refs
    else:
        w2, m2, b2, w3, m3, b3, out_ref, slab, sem = refs

    b = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_oh
    start = stride * t * th - 1
    NR = SR if stride == 1 else SR - 1  # valid-row span [start, start+NR)
    tile_rows = stride * th  # rows consumed per tile; start = t*tile_rows - 1

    # Double-buffered slab pipeline: program L computes from slot L%2 while
    # slot (L+1)%2 receives the NEXT program's slab (incl. across the batch-
    # chunk edge).  The serialized start+wait this replaces stalled 8-15 ms
    # per block (benchmarks/probe_stage.py) — pure DMA wait under compute-
    # free truncation, i.e. nothing was ever in flight during compute.
    L = b * n_tiles + t
    slot = jax.lax.rem(L, 2)
    nxt = jax.lax.rem(L + 1, 2)

    def issue(bb, tt, sl, action):
        _row_dma_cases(x_hbm, slab.at[sl], sem.at[sl], bb, tt, None, NR, H,
                       n_tiles, bottom_halo=(stride == 1), nb=NB,
                       action=action, tile_rows=tile_rows)

    @pl.when(L == 0)
    def _prime():
        issue(b, t, slot, "start")

    @pl.when(t + 1 < n_tiles)
    def _prefetch_tile():
        issue(b, t + 1, nxt, "start")

    @pl.when(jnp.logical_and(t + 1 == n_tiles, b + 1 < pl.num_programs(0)))
    def _prefetch_chunk():
        issue(b + 1, jnp.int32(0), nxt, "start")

    issue(b, t, slot, "wait")
    sl = slab.at[slot][:]

    ow, oc = (Wo2 // 4, 128) if out_packed else (Wo2, Cop)

    def _probe_store(live):  # anti-DCE: fold the live tensor into the output
        v = jnp.max(live.astype(jnp.float32)).astype(jnp.int8)
        out_ref[:] = jnp.full((NB, tile_oh, ow, oc), v, jnp.int8)

    if stage == "dma":
        _probe_store(sl)
        return

    if in_packed:
        # Phase-major path: consume the packed slab directly (no relayout).
        _mbconv_pm_body(
            sl, w1, m1, b1, w2, m2, b2, w3, m3, b3, out_ref, _probe_store,
            NB=NB, H=H, W=W, Wo=Wo, G=W2 // 4, Chp=Chp, SR=SR, stride=stride,
            th=th, start=start, has_expand=has_expand, hidden_grid=hidden_grid,
            use_residual=use_residual, inv_h=inv_h, qmax_h=qmax_h,
            inv_d=inv_d, qmax_d=qmax_d, dw_grid=dw_grid,
            inv_sh=inv_sh, qmax_sh=qmax_sh, ratio_out=ratio_out,
            qmin_o=qmin_o, qmax_o=qmax_o, G_out=Wo2 // 4, stage=stage,
            in_unsigned=in_unsigned,
        )
        return

    def expand_fn(xi, n_cols, mask):
        """int8 tile -> hidden tile: exact integer matmul via bf16 + requant.
        mask zeroes halo columns / out-of-image rows (bias makes them
        nonzero otherwise)."""
        xf = xi.astype(jnp.float32)
        if in_unsigned:  # uint8 bits carry -> true q (see _mbconv_pm_body)
            xf = xf + 256.0 * (xf < 0.0)
        if has_expand:
            xs = xf.reshape(NB * SR * n_cols, Cp).astype(jnp.bfloat16)
            acc = jnp.dot(xs, w1[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            hh = jnp.maximum(acc * m1[:] + b1[:], 0.0)
            if hidden_grid:
                hh = jnp.clip(jnp.round(hh * inv_h), 0.0, qmax_h)
            return hh.reshape(NB, SR, n_cols, Chp) * mask
        return xf * mask

    rows = jax.lax.broadcasted_iota(jnp.int32, (SR, W2), 0) + start
    cols = jax.lax.broadcasted_iota(jnp.int32, (SR, W2), 1)
    rows_ok = (rows >= 0) & (rows < H)

    w2f = w2[:].astype(jnp.float32)  # (9, Chp)
    acc = jnp.zeros((NB, th, Wo, Chp), jnp.float32)
    if stride == 1:
        valid = rows_ok & (cols >= 1) & (cols <= W)
        h = expand_fn(sl, W2, valid.astype(jnp.float32)[None, :, :, None])
        if stage == "expand":
            _probe_store(h)
            return
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(h, (0, dy, dx, 0), (NB, dy + th, dx + W, Chp))
                acc = acc + tap * w2f[3 * dy + dx]
    else:
        # Column phases split on the INT8 slab (6x cheaper than gathering
        # the expanded hidden tensor): even cols 2k, odd cols 2k+1.  Output
        # col c reads input cols 2c+dx -> dx=0: even[c], dx=1: odd[c],
        # dx=2: even[c+1].
        W2h = W2 // 2
        # Column-pair reshape onto the lane axis: (W2, Cp) -> (W2h, 2*Cp),
        # then 128-aligned lane slices pick the even/odd phases.  Mosaic
        # supports neither stride-2 slices nor the gather that integer
        # indexing on a phase axis would produce.
        xp = sl.reshape(NB, SR, W2h, 2 * Cp)
        xe = jax.lax.slice(xp, (0, 0, 0, 0), (NB, SR, W2h, Cp))
        xo = jax.lax.slice(xp, (0, 0, 0, Cp), (NB, SR, W2h, 2 * Cp))
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (SR, W2h), 0) + start
        ce = 2 * jax.lax.broadcasted_iota(jnp.int32, (SR, W2h), 1)  # even col ids
        rows_ok_h = (rows_h >= 0) & (rows_h < H)
        ve = rows_ok_h & (ce >= 1) & (ce <= W)
        vo = rows_ok_h & (ce + 1 >= 1) & (ce + 1 <= W)
        he = expand_fn(xe, W2h, ve.astype(jnp.float32)[None, :, :, None])
        ho = expand_fn(xo, W2h, vo.astype(jnp.float32)[None, :, :, None])
        if stage == "expand":
            _probe_store(he + ho)
            return
        for dy in range(3):
            re = jax.lax.slice(he, (0, dy, 0, 0), (NB, dy + 2 * th, W2h, Chp))
            re = re.reshape(NB, th, 2, W2h, Chp)[:, :, 0]  # input rows 2r+dy
            ro = jax.lax.slice(ho, (0, dy, 0, 0), (NB, dy + 2 * th, W2h, Chp))
            ro = ro.reshape(NB, th, 2, W2h, Chp)[:, :, 0]
            acc = acc + jax.lax.slice(re, (0, 0, 0, 0), (NB, th, Wo, Chp)) * w2f[3 * dy]
            acc = acc + jax.lax.slice(ro, (0, 0, 0, 0), (NB, th, Wo, Chp)) * w2f[3 * dy + 1]
            acc = acc + jax.lax.slice(re, (0, 0, 1, 0), (NB, th, 1 + Wo, Chp)) * w2f[3 * dy + 2]
    y = jnp.maximum(acc * m2[:] + b2[:], 0.0)
    if dw_grid:
        y = jnp.clip(jnp.round(y * inv_d), 0.0, qmax_d)

    if stage == "dw":
        _probe_store(y)
        return

    # ---- project 1x1 + residual + output requant ----
    yb = y.reshape(NB * th * Wo, Chp).astype(jnp.bfloat16)
    p = jnp.dot(yb, w3[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    pf = p * m3[:] + b3[:]
    if use_residual:
        q = jnp.clip(jnp.round(pf * inv_sh), -qmax_sh - 1.0, qmax_sh)
        res = jax.lax.slice(sl, (0, 1, 1, 0), (NB, 1 + th, 1 + W, Cp))
        s = q.reshape(NB, th, Wo, Cop) + res.astype(jnp.float32)
        if ratio_out is not None:
            out = jnp.clip(jnp.round(s * ratio_out), qmin_o, qmax_o)
        else:
            out = jnp.clip(s, -128.0, 127.0)
    else:
        out = jnp.clip(jnp.round(pf * ratio_out), qmin_o,
                       qmax_o).reshape(NB, th, Wo, Cop)
    if out_packed:
        # Repack 4 pixels/lane-group: halo col 0 + trailing cols/channels as
        # real zeros, then the inverse minor-dims reshape.
        full = jnp.pad(out.astype(jnp.int8),
                       ((0, 0), (0, 0), (1, Wo2 - Wo - 1), (0, 32 - Cop)))
        out_ref[:] = full.reshape(NB, th, Wo2 // 4, 128)
    else:
        _store_with_halo(out_ref, out.astype(jnp.int8), NB, th, Wo, Wo2, Cop)


def fused_mbconv(
    x: jax.Array,  # layout tensor (B, H, W2, Cp) int8 on `in_step` grid
    params: Dict[str, Any],  # block entry of the converted graph
    in_step: float,
    out_grid: Optional[Dict[str, float]],  # consumer grid {step,qmax,qmin}
    shared_grid: Optional[Dict[str, float]] = None,  # block's own shared grid
    logical_hw: Optional[tuple] = None,  # (H, W); W defaults from W2
    tile_oh: int = 0,
    tile_b: int = 0,  # images per program (0 = auto: fill the MXU M dim)
    interpret: bool = False,
    stage: str = "full",  # probe truncation, see _mbconv_kernel
    in_packed: bool = False,
    out_packed: bool = False,
    in_unsigned: bool = False,  # input is a uint8 bits-carry (stem edge)
) -> jax.Array:
    """Run one fused inverted-residual block; returns the layout tensor
    (B, Ho, Wo2, Cout128) int8 — or the width-packed (B, Ho, Wo4, 128)
    form when ``out_packed`` (Cout <= 32) — on the output grid.

    Grid folding mirrors quant/int8_carry.py exactly: residual blocks emit
    ``requant_to_shared(project) + residual`` and ratio-requant the exact
    integer sum to ``out_grid``; non-residual blocks requantize ``project``
    straight to ``out_grid``.
    """
    d = params["depthwise"]
    stride = d["stride"]
    if logical_hw is None:
        raise ValueError("logical_hw=(H, W) required (layout width is padded)")
    _, W = logical_hw
    if in_packed:
        B, H, W4, _l = x.shape
        assert _l == 128 and W4 == packed_width(W)
        W2, Cp = 4 * W4, 32
    else:
        B, H, W2, Cp = x.shape
        assert W2 == _round_up(W + 2, 8) and Cp % 128 == 0
    has_expand = "expand" in params
    use_residual = params["use_residual"]
    # The residual is re-read from the input slab as signed int8; a
    # bits-carry residual would need a decode there too — never arises
    # (residual blocks requantize their input onto a signed shared grid).
    assert not (in_unsigned and use_residual)
    e = params.get("expand")
    p = params["project"]
    Cin = (e["w_int"].shape[-2] if has_expand else d["w_int"].shape[-1])
    Ch = d["w_int"].shape[-1]
    Cout = p["w_int"].shape[-1]
    if in_packed:
        # Phase-major path: per-phase lane blocks must be 128-aligned.
        assert out_packed, "phase-major blocks emit the packed layout only"
        Chp = _round_up(Ch, 128)
    else:
        Chp = Cp if not has_expand else _round_up(Ch, 128)
    if out_packed:
        assert Cout <= PACK_MAX_C
        Cop = 32
    else:
        Cop = _round_up(Cout, 128)
    Ho, Wo = H // stride, W // stride
    Wo2 = 4 * packed_width(Wo) if out_packed else _round_up(Wo + 2, 8)
    if stride == 2:
        assert H % 2 == 0 and W % 2 == 0

    hidden_grid = bool(e is not None and "act_step" in e)
    args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]

    def vin(a):
        a = jnp.asarray(a)
        in_specs.append(
            pl.BlockSpec(a.shape, lambda b, t, _n=a.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM)
        )
        args.append(a)

    dw_grid = "act_step" in d
    if in_packed:
        # Phase-major operands: block-diagonal expand/project, phase-tiled
        # per-channel vectors (length 4*Chp / 128).
        def _tile4(a, sub):
            v = np.zeros(sub, np.float32)
            a = np.asarray(a, np.float32).reshape(-1)
            v[: a.shape[0]] = a
            return jnp.asarray(np.tile(v, 4).reshape(1, 4 * sub))

        if has_expand:
            h_step = e["act_step"] if hidden_grid else 1.0
            vin(_pm_block_diag(np.asarray(e["w_int"]).reshape(Cin, Ch),
                               32, Chp))
            vin(_tile4(np.asarray(e["mult_core"]) * in_step, Chp))
            vin(_tile4(e["bias"], Chp))
            m2 = _tile4(np.asarray(d["mult_core"]) * h_step, Chp)
        else:
            vin(_pm_block_diag(np.eye(Cin, dtype=np.float32), 32, Chp))
            vin(_tile4(np.ones(Chp), Chp))   # unused (identity path)
            vin(_tile4(np.zeros(Chp), Chp))  # unused
            m2 = _tile4(np.asarray(d["mult_core"]) * in_step, Chp)
        w2pm = np.zeros((9, 4 * Chp), np.float32)
        for ph in range(4):
            w2pm[:, ph * Chp: ph * Chp + Ch] = np.asarray(
                d["w_int"], np.float32).reshape(9, Ch)
        vin(jnp.asarray(w2pm))
        vin(m2)
        vin(_tile4(d["bias"], Chp))
        vin(_pm_block_diag(np.asarray(p["w_int"]).reshape(Ch, Cout),
                           Chp, 32))
        vin(_tile4(np.asarray(p["mult_core"])
                   * (d["act_step"] if dw_grid else 1.0), 32))
        vin(_tile4(p["bias"], 32))
    else:
        if has_expand:
            h_step = e["act_step"] if hidden_grid else 1.0
            vin(_pad2(np.asarray(e["w_int"]).reshape(Cin, Ch), Cp, Chp))
            vin(_pad1(np.asarray(e["mult_core"]) * in_step, Chp))
            vin(_pad1(e["bias"], Chp))
            m2 = _pad1(np.asarray(d["mult_core"]) * h_step, Chp)
        else:
            m2 = _pad1(np.asarray(d["mult_core"]) * in_step, Chp)
        vin(_pad2(np.asarray(d["w_int"]).reshape(9, Ch), 9, Chp))
        vin(m2)
        vin(_pad1(d["bias"], Chp))
        vin(_pad2(np.asarray(p["w_int"]).reshape(Ch, Cout), Chp, Cop))
        # Boundary-only recipe: no depthwise act grid -> the projection
        # consumes real values, so its multiplier is unscaled.
        vin(_pad1(np.asarray(p["mult_core"]) * (d["act_step"] if dw_grid else 1.0), Cop))
        vin(_pad1(p["bias"], Cop))

    if use_residual:
        assert shared_grid is not None and Cp == Cop
        inv_sh = 1.0 / shared_grid["step"]
        qmax_sh = shared_grid["qmax"]
        if out_grid is not None and abs(shared_grid["step"] - out_grid["step"]) > 1e-12:
            ratio_out = shared_grid["step"] / out_grid["step"]
            qmin_o, qmax_o = out_grid["qmin"], out_grid["qmax"]
        else:
            ratio_out, qmin_o, qmax_o = None, -128.0, 127.0
    else:
        assert out_grid is not None
        inv_sh, qmax_sh = 1.0, 127.0
        ratio_out = 1.0 / out_grid["step"]
        qmin_o, qmax_o = out_grid["qmin"], out_grid["qmax"]

    vmem_of = lambda t, nb=1: nb * mbconv_vmem_bytes(
        t, stride, W2, Wo, Wo2, Cp, Chp, Cop, has_expand)
    tuned_b = 0
    if tile_oh <= 0:
        # Autotuned winner for this shape, when one was measured on-chip
        # (quant/autotune.py — the FINN-folding/Ansor analogue).
        from spef_tpu.quant.autotune import block_signature, lookup_tile

        tuned, tuned_b = lookup_tile(block_signature("mbconv", H, W, Cin, Ch,
                                                     Cout, stride))
        tile_oh = tuned if tuned else _fit_tile_oh(Ho, 32, vmem_of)
        tile_b = tile_b or tuned_b
    while Ho % tile_oh:
        tile_oh //= 2
    n_tiles = Ho // tile_oh
    SR = tile_oh + 2 if stride == 1 else 2 * tile_oh + 2

    if tile_b <= 0:
        # Fill the matmul M dimension (target ~4k rows) within VMEM budget.
        tile_b = 1
        while (B % (tile_b * 2) == 0 and tile_b * SR * W2 < 4096
               and vmem_of(tile_oh, tile_b * 2) <= _VMEM_BUDGET):
            tile_b *= 2
    while B % tile_b:
        tile_b //= 2
    tile_b = max(tile_b, 1)

    kernel = functools.partial(
        _mbconv_kernel,
        NB=tile_b, H=H, W=W, Wo=Wo, W2=W2, Wo2=Wo2, Cp=Cp, Chp=Chp, Cop=Cop,
        SR=SR, stride=stride, tile_oh=tile_oh,
        has_expand=has_expand, hidden_grid=hidden_grid, use_residual=use_residual,
        inv_h=float(1.0 / e["act_step"]) if hidden_grid else 1.0,
        qmax_h=float(e["act_qmax"]) if hidden_grid else 127.0,
        inv_d=float(1.0 / d["act_step"]) if dw_grid else 1.0,
        qmax_d=float(d["act_qmax"]) if dw_grid else 0.0, dw_grid=dw_grid,
        inv_sh=float(inv_sh), qmax_sh=float(qmax_sh),
        ratio_out=None if ratio_out is None else float(ratio_out),
        qmin_o=float(qmin_o), qmax_o=float(qmax_o), n_tiles=n_tiles,
        stage=stage, in_packed=in_packed, out_packed=out_packed,
        in_unsigned=in_unsigned,
    )

    # Physical (HBM/slab) dims; packed forms fold 4 pixels into the lanes.
    in_slab = (2, tile_b, SR, W2 // 4, 128) if in_packed \
        else (2, tile_b, SR, W2, Cp)
    out_phys = (Ho, Wo2 // 4, 128) if out_packed else (Ho, Wo2, Cop)
    out_blk = (tile_b, tile_oh) + out_phys[1:]

    flops = 2 * B * Ho * Wo * Chp * ((Cp if has_expand else 0) + 9 + Cop)
    return pl.pallas_call(
        kernel,
        grid=(B // tile_b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_blk, lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B,) + out_phys, jnp.int8),
        scratch_shapes=[pltpu.VMEM(in_slab, jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size + B * Ho * Wo2 * Cop, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, *args)


# ---------------------------------------------------------------------------
# Stem: fused preprocess + 3x3 stride-2 conv + requant on the uint8 image.
# ---------------------------------------------------------------------------


def _stem_kernel(xs_hbm, w_ref, m_ref, b_ref, out_ref, slab, sem, *,
                 Hs, Ws, Ws2, Wso2, Cout, Cop, tile_oh, inv_a, qmax_a, n_tiles):
    """Space-to-depth makes the 3x3/s2 conv a 2x2/s1 conv over 12 channels
    (zero-padded to 128 lanes; some taps structurally zero): 4 shifted K=128
    matmuls.  Halo is top/left one pixel; col halo is materialized zeros in
    the input layout, row halo handled by the mask."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_oh
    start = t * th - 1

    # Same double-buffered slab pipeline as _mbconv_kernel.
    L = b * n_tiles + t
    slot = jax.lax.rem(L, 2)
    nxt = jax.lax.rem(L + 1, 2)

    def issue(bb, tt, sl, action):
        _row_dma_cases(xs_hbm, slab.at[sl], sem.at[sl], bb, tt, None, th + 1,
                       Hs, n_tiles, bottom_halo=False, action=action,
                       tile_rows=th)

    @pl.when(L == 0)
    def _prime():
        issue(b, t, slot, "start")

    @pl.when(t + 1 < n_tiles)
    def _prefetch_tile():
        issue(b, t + 1, nxt, "start")

    @pl.when(jnp.logical_and(t + 1 == n_tiles, b + 1 < pl.num_programs(0)))
    def _prefetch_img():
        issue(b + 1, jnp.int32(0), nxt, "start")

    issue(b, t, slot, "wait")
    sl = slab.at[slot][:]

    r_ids = jax.lax.broadcasted_iota(jnp.int32, (th, Ws), 0)
    acc = jnp.zeros((th * Ws, Cop), jnp.float32)
    for dy in range(2):
        for dx in range(2):
            tap = jax.lax.slice(sl, (dy, dx, 0), (dy + th, dx + Ws, 128))
            valid = ((r_ids + start + dy >= 0) & (r_ids + start + dy < Hs))
            # The image travels as int8 BITS (uint8 DMAs mis-lower for some
            # row counts: Mosaic widens the HBM side to i16); recover the
            # uint8 value exactly via widen + mask.
            tf = ((tap.astype(jnp.int32) & 255).astype(jnp.float32)
                  * valid.astype(jnp.float32)[:, :, None])
            a = tf.reshape(th * Ws, 128).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                a, w_ref[pl.ds((2 * dy + dx) * 128, 128), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    y = jnp.maximum(acc * m_ref[:] + b_ref[:], 0.0)
    q = jnp.clip(jnp.round(y * inv_a), 0.0, qmax_a)
    if qmax_a > 127.0:
        # Unsigned 8-bit stem grid (boundary recipe): emit uint8 BITS in
        # the int8 layout (q-256 for q>127 is exactly the two's-complement
        # bit pattern); consumers decode via in_unsigned.  Zeros (halo)
        # stay zeros, so the layout invariants are untouched.
        q = jnp.where(q > 127.0, q - 256.0, q)
    _store_with_halo(out_ref, q.reshape(1, th, Ws, Cop).astype(jnp.int8),
                     1, th, Ws, Wso2, Cop)


def _stem_pm_kernel(xs_hbm, w_ref, m_ref, b_ref, out_ref, slab, sem, *,
                    Hs, Ws, G, tile_oh, inv_a, qmax_a, n_tiles):
    """Phase-major packed stem: the s2d image arrives phase-packed with the
    left-neighbor column's channels alongside (column 4g+p at lanes
    [32p, 32p+32): chans 0-11 = that column, 12-23 = column 4g+p-1), so the
    2x2/s1 conv needs NO in-kernel column shift — both dx taps are rows of
    ONE block-diagonal matmul over the two dy row-slices, and the store
    emits the packed activation layout directly.  No lane<->sublane reshape
    and no sub-128-lane concat anywhere: the pad+merge formulation hit
    Mosaic's `unsupported shape cast`, and a _pm_col_shift on 32-lane phase
    slices hit an unlowerable tpu.concatenate (both probed on-chip r3);
    Mosaic only lowers lane slices/concats at 128-lane granularity."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_oh
    start = t * th - 1
    SR = th + 1

    # Same double-buffered slab pipeline as _mbconv_kernel / _stem_kernel.
    L = b * n_tiles + t
    slot = jax.lax.rem(L, 2)
    nxt = jax.lax.rem(L + 1, 2)

    def issue(bb, tt, sl, action):
        _row_dma_cases(xs_hbm, slab.at[sl], sem.at[sl], bb, tt, None, SR,
                       Hs, n_tiles, bottom_halo=False, action=action,
                       tile_rows=th)

    @pl.when(L == 0)
    def _prime():
        issue(b, t, slot, "start")

    @pl.when(t + 1 < n_tiles)
    def _prefetch_tile():
        issue(b, t + 1, nxt, "start")

    @pl.when(jnp.logical_and(t + 1 == n_tiles, b + 1 < pl.num_programs(0)))
    def _prefetch_img():
        issue(b + 1, jnp.int32(0), nxt, "start")

    issue(b, t, slot, "wait")
    sl = slab.at[slot][:]  # (SR, G, 128) uint8 bits as int8

    # uint8 bits -> value (see the bits-carry note in _stem_kernel), then
    # zero rows outside the image (DMA clamps; halo rows hold stale data).
    xf = sl.astype(jnp.float32)
    xf = xf + 256.0 * (xf < 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (SR, G, 128), 0) + start
    h = (xf * ((rows >= 0) & (rows < Hs)).astype(jnp.float32))[None]

    # Row taps dy in {0,1}; the dx taps live in the lane dimension already
    # (neighbor channels packed by the XLA prep, zeros at the halo).
    cat = jnp.concatenate(
        [jax.lax.slice(h, (0, dy, 0, 0), (1, dy + th, G, 128))
         for dy in range(2)], axis=3)  # (1, th, G, 256)
    acc = jnp.dot(cat.reshape(th * G, 256).astype(jnp.bfloat16),
                  w_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)  # exact: ints < 2^8
    y = jnp.maximum(acc * m_ref[:] + b_ref[:], 0.0)
    q = jnp.clip(jnp.round(y * inv_a), 0.0, qmax_a)
    if qmax_a > 127.0:
        # Unsigned 8-bit stem grid: emit uint8 BITS (see _stem_kernel).
        q = jnp.where(q > 127.0, q - 256.0, q)
    col = (4 * jax.lax.broadcasted_iota(jnp.int32, (th, G, 128), 1)
           + jax.lax.broadcasted_iota(jnp.int32, (th, G, 128), 2) // 32)
    omask = ((col >= 1) & (col <= Ws)).astype(jnp.float32)
    out_ref[:] = (q.reshape(th, G, 128) * omask).astype(jnp.int8)[None]


def fused_stem(
    images: jax.Array,  # (B, H, W, 3) uint8
    stem: Dict[str, Any],
    tile_oh: int = 0,
    interpret: bool = False,
    out_packed: bool = False,
) -> jax.Array:
    """Fused preprocess + 3x3/s2 stem conv + requant -> layout int8
    (B, H/2, Ws2, C128).

    The uint8 image is space-to-depth'd by 2 and repacked into the
    inter-kernel layout by ONE XLA pad (the only XLA repack in the
    pipeline); 1/255 normalization folds into the per-channel multiplier
    (the conv is linear and integer accumulation is exact), reproducing
    ``relu(conv(img/255) * mult + bias)`` on the stem activation grid."""
    B, H, W, _ = images.shape
    assert H % 2 == 0 and W % 2 == 0
    Hs, Ws = H // 2, W // 2
    Ws2 = _round_up(Ws + 2, 8)

    # 3x3 kernel -> 4 taps of the 2x2 s2d conv; see the tap derivation in
    # the r2 design notes: s2d tap (dy, dx, sy, sx) maps to original offset
    # (2dy+sy-1, 2dx+sx-1).
    w = np.asarray(stem["w_int"], np.float32)  # (3, 3, 3, Cout)
    Cout = w.shape[-1]
    Cop = 32 if out_packed else _round_up(Cout, 128)
    w4 = np.zeros((4, 128, Cop), np.float32)
    for dy in range(2):
        for dx in range(2):
            for sy in range(2):
                for sx in range(2):
                    oy = 2 * (dy - 1) + sy + 1  # in [-1, 2]
                    ox = 2 * (dx - 1) + sx + 1
                    if 0 <= oy < 3 and 0 <= ox < 3:
                        w4[2 * dy + dx, sy * 6 + sx * 3: sy * 6 + sx * 3 + 3, :Cout] = \
                            w[oy, ox, :, :]

    inv_a = float(1.0 / stem["act_step"])
    qmax_a = float(stem["act_qmax"])
    vspec = lambda a: pl.BlockSpec(a.shape, lambda b, t, _n=a.ndim: (0,) * _n,
                                   memory_space=pltpu.VMEM)
    if tile_oh <= 0:
        from spef_tpu.quant.autotune import block_signature, lookup_tile

        tuned, _ = lookup_tile(block_signature("stem", H, W, 3, 12, Cout, 2))
        tile_oh = tuned if tuned else stem_default_tile(Hs, Ws, Ws2, Cop)
    while Hs % tile_oh:
        tile_oh //= 2
    n_tiles = Hs // tile_oh

    if out_packed:
        # Phase-major path (_stem_pm_kernel): phase-packed s2d input
        # (12->32 lanes/phase, 3.6x less stem DMA than the 12->128
        # lane-padded plain layout), block-diagonal tap weights.
        assert Cout <= PACK_MAX_C
        G = packed_width(Ws)
        xs12 = images.reshape(B, Hs, 2, Ws, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, Hs, Ws, 12)
        # Pixel j's phase slot also carries pixel j-1's channels (lanes
        # 12-23) so the dx=0 tap needs no in-kernel column shift.
        left = jnp.pad(xs12, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :Ws, :]
        xs = jnp.concatenate([xs12, left], axis=-1)  # (B, Hs, Ws, 24)
        xs = jnp.pad(xs, ((0, 0), (0, 0), (1, 4 * G - Ws - 1), (0, 8)))
        xs = jax.lax.bitcast_convert_type(xs, jnp.int8)  # uint8 bits
        xs = xs.reshape(B, Hs, G, 128)

        # Per-dy phase block (32in, 32out): rows 0-11 = dx=1 tap (own
        # column, w4 tap 2dy+1), rows 12-23 = dx=0 tap (left neighbor,
        # w4 tap 2dy).
        def _dy_block(dy):
            blk = np.zeros((32, 32), np.float32)
            blk[:12, :Cout] = w4[2 * dy + 1, :12, :Cout]
            blk[12:24, :Cout] = w4[2 * dy, :12, :Cout]
            return blk

        w_pm = jnp.asarray(np.concatenate(
            [_pm_block_diag(_dy_block(dy), 32, 32) for dy in range(2)],
            axis=0))  # (256, 128)
        m32 = np.zeros(32, np.float32)
        m32[:Cout] = np.asarray(stem["mult_core"], np.float32) / 255.0
        b32 = np.zeros(32, np.float32)
        b32[:Cout] = np.asarray(stem["bias"], np.float32)
        m_pm = jnp.asarray(np.tile(m32, 4).reshape(1, 128))
        b_pm = jnp.asarray(np.tile(b32, 4).reshape(1, 128))

        kernel = functools.partial(
            _stem_pm_kernel, Hs=Hs, Ws=Ws, G=G, tile_oh=tile_oh,
            inv_a=inv_a, qmax_a=qmax_a, n_tiles=n_tiles,
        )
        return pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      vspec(w_pm), vspec(m_pm), vspec(b_pm)],
            out_specs=pl.BlockSpec((1, tile_oh, G, 128),
                                   lambda b, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Hs, G, 128), jnp.int8),
            scratch_shapes=[pltpu.VMEM((2, tile_oh + 1, G, 128), jnp.int8),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(xs, w_pm, m_pm, b_pm)

    Wso2 = Ws2
    xs = images.reshape(B, Hs, 2, Ws, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, Hs, Ws, 12
    )
    xs = jnp.pad(xs, ((0, 0), (0, 0), (1, Ws2 - Ws - 1), (0, 116)))
    xs = jax.lax.bitcast_convert_type(xs, jnp.int8)  # uint8 bits, DMA-safe
    w4 = jnp.asarray(w4.reshape(4 * 128, Cop))

    m = _pad1(np.asarray(stem["mult_core"]) / 255.0, Cop)
    bias = _pad1(stem["bias"], Cop)

    kernel = functools.partial(
        _stem_kernel, Hs=Hs, Ws=Ws, Ws2=Ws2, Wso2=Wso2, Cout=Cout, Cop=Cop,
        tile_oh=tile_oh, inv_a=inv_a, qmax_a=qmax_a, n_tiles=n_tiles,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), vspec(w4), vspec(m), vspec(bias)],
        out_specs=pl.BlockSpec((1, tile_oh, Wso2, Cop), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hs, Wso2, Cop), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, tile_oh + 1, Ws2, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xs, w4, m, bias)
