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

Mosaic lowering constraints (probed on-chip, benchmarks/probe_mosaic.py):

  * integer arithmetic runs exactly on the MXU via bf16 operands + f32
    accumulation (int8 values and their products are f32-exact);
  * strided vector slices DO NOT lower; stride-2 depthwise uses
    reshape-split + take (``t.reshape(.., n, 2, ..)[.., 0]``) on both the
    row (untiled) and width (sublane) axes instead;
  * input slabs are DMA'd per (batch, row-tile) program with a 1-px halo;
    SAME padding is realized by a branchless validity MASK on the hidden
    tensor (halo/garbage rows and columns multiply to zero) — HBM tensors
    stay unpadded and no VMEM memsets are needed;
  * slab width is padded to a multiple of 8 so (rows, W, C) -> (rows*W, C)
    sublane merges before the matmuls lower.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mbconv", "fused_stem"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mbconv_kernel(
    x_hbm, *refs,
    H, W, Cin, Ch, Cout, stride, tile_oh, W2, SR,
    has_expand, hidden_grid, use_residual,
    inv_h, qmax_h, inv_d, qmax_d,
    inv_sh, qmax_sh, ratio_out, qmin_o, qmax_o, n_tiles,
):
    """One (batch, row-tile) program of a fused inverted-residual block.

    Slab row r holds input row (start + r) where start = stride*t*tile_oh-1;
    rows outside [0, H) are garbage and masked to zero in the hidden tensor
    (SAME padding).  refs: [w1, m1, b1]?, w2, m2, b2, w3, m3, b3, out, slab,
    sem ([w1,m1,b1] iff has_expand).
    """
    if has_expand:
        w1, m1, b1, w2, m2, b2, w3, m3, b3, out_ref, slab, sem = refs
    else:
        w2, m2, b2, w3, m3, b3, out_ref, slab, sem = refs

    b = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_oh
    start = stride * t * th - 1  # input row held by slab row 0

    # ---- input slab DMA (static-shape cases; no zeroing — mask handles) ----
    def copy(src_row0, n_rows, dst_row0):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_row0, n_rows), pl.ds(0, W), :],
            slab.at[pl.ds(dst_row0, n_rows), pl.ds(1, W), :],
            sem,
        )
        dma.start()
        dma.wait()

    if stride == 1:
        NR = th + 2  # rows [start, start+NR)
        if n_tiles == 1:
            copy(0, H, 1)
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
    elif n_tiles == 1:
        copy(0, 2 * th, 1)
    else:
        # stride 2, even H: only a TOP halo row exists (rows -1..2*th-1+2).
        @pl.when(t == 0)
        def _first():
            copy(0, 2 * th, 1)

        @pl.when(t > 0)
        def _rest():
            copy(start, 2 * th + 1, 0)

    # ---- validity mask: input row (start+r) in [0, H), col in [1, W] ----
    rows = jax.lax.broadcasted_iota(jnp.int32, (SR, W2), 0) + start
    cols = jax.lax.broadcasted_iota(jnp.int32, (SR, W2), 1)
    valid = (rows >= 0) & (rows < H) & (cols >= 1) & (cols <= W)
    mask = valid.astype(jnp.float32)[:, :, None]

    # ---- expand 1x1 (exact integer matmul via bf16) ----
    if has_expand:
        xs = slab[:].reshape(SR * W2, Cin).astype(jnp.bfloat16)
        acc = jnp.dot(xs, w1[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = jnp.maximum(acc * m1[:] + b1[:], 0.0)
        if hidden_grid:
            h = jnp.clip(jnp.round(h * inv_h), 0.0, qmax_h)
        h = h.reshape(SR, W2, Ch) * mask
    else:
        h = slab[:].astype(jnp.float32) * mask

    # ---- depthwise 3x3 (+ stride) ----
    Wo = W // stride
    w2f = w2[:].astype(jnp.float32)  # (9, Ch)
    acc = jnp.zeros((th, Wo, Ch), jnp.float32)
    if stride == 1:
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(h, (dy, dx, 0), (dy + th, dx + W, Ch))
                acc = acc + tap * w2f[3 * dy + dx]
    else:
        for dy in range(3):
            rows3 = jax.lax.slice(h, (dy, 0, 0), (dy + 2 * th, W2, Ch))
            rows3 = rows3.reshape(th, 2, W2, Ch)[:, 0]  # input rows 2r+dy-1+...
            for dx in range(3):
                seg = jax.lax.slice(rows3, (0, dx, 0), (th, dx + 2 * Wo, Ch))
                tap = seg.reshape(th, Wo, 2, Ch)[:, :, 0]  # cols 2c+dx
                acc = acc + tap * w2f[3 * dy + dx]
    y = jnp.maximum(acc * m2[:] + b2[:], 0.0)
    y = jnp.clip(jnp.round(y * inv_d), 0.0, qmax_d)

    # ---- project 1x1 + residual + output requant ----
    yb = y.reshape(th * Wo, Ch).astype(jnp.bfloat16)
    p = jnp.dot(yb, w3[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    pf = p * m3[:] + b3[:]
    if use_residual:
        q = jnp.clip(jnp.round(pf * inv_sh), -qmax_sh - 1.0, qmax_sh)
        res = jax.lax.slice(slab[:], (1, 1, 0), (1 + th, 1 + W, Cin))
        s = q.reshape(th, Wo, Cout) + res.astype(jnp.float32)
        if ratio_out is not None:
            out = jnp.clip(jnp.round(s * ratio_out), qmin_o, qmax_o)
        else:
            out = jnp.clip(s, -128.0, 127.0)
        out_ref[0] = out.astype(jnp.int8)
    else:
        out = jnp.clip(jnp.round(pf * ratio_out), qmin_o, qmax_o)
        out_ref[0] = out.reshape(th, Wo, Cout).astype(jnp.int8)


def fused_mbconv(
    x: jax.Array,  # (B, H, W, Cin) int8 on `in_step` grid
    params: Dict[str, Any],  # block entry of the converted graph
    in_step: float,
    out_grid: Optional[Dict[str, float]],  # consumer grid {step,qmax,qmin}
    shared_grid: Optional[Dict[str, float]] = None,  # block's own shared grid
    tile_oh: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Run one fused inverted-residual block; returns int8 on the output grid.

    Grid folding mirrors quant/int8_carry.py exactly:
      * residual blocks emit ``requant_to_shared(project) + residual`` and
        ratio-requant the exact integer sum to ``out_grid``;
      * non-residual blocks requantize ``project`` straight to ``out_grid``.
    """
    B, H, W, Cin = x.shape
    stride = params["depthwise"]["stride"]
    assert W % 8 == 0, f"width {W} must be a multiple of 8 (lane merge)"
    if stride == 2:
        assert H % 2 == 0 and W % 2 == 0
    has_expand = "expand" in params
    use_residual = params["use_residual"]
    e = params.get("expand")
    d = params["depthwise"]
    p = params["project"]
    Ch = d["w_int"].shape[-1]
    Cout = p["w_int"].shape[-1]
    Ho, Wo = H // stride, W // stride
    W2 = _round_up(W + 2, 8)

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

    if has_expand:
        h_step = e["act_step"] if hidden_grid else 1.0
        vin(e["w_int"].reshape(-1, Ch))
        vin((e["mult_core"] * in_step).reshape(1, Ch).astype(jnp.float32))
        vin(e["bias"].reshape(1, Ch).astype(jnp.float32))
        m2 = (d["mult_core"] * h_step).reshape(1, Ch)
    else:
        m2 = (d["mult_core"] * in_step).reshape(1, Ch)
    vin(d["w_int"].reshape(9, Ch))
    vin(m2.astype(jnp.float32))
    vin(d["bias"].reshape(1, Ch).astype(jnp.float32))
    vin(p["w_int"].reshape(-1, Cout))
    vin((p["mult_core"] * d["act_step"]).reshape(1, Cout).astype(jnp.float32))
    vin(p["bias"].reshape(1, Cout).astype(jnp.float32))

    if use_residual:
        assert shared_grid is not None
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

    if tile_oh <= 0:
        tile_oh = Ho if Ho <= 32 else 32
    while Ho % tile_oh:
        tile_oh //= 2
    n_tiles = Ho // tile_oh
    SR = tile_oh + 2 if stride == 1 else 2 * tile_oh + 2

    kernel = functools.partial(
        _mbconv_kernel,
        H=H, W=W, Cin=Cin, Ch=Ch, Cout=Cout, stride=stride, tile_oh=tile_oh,
        W2=W2, SR=SR,
        has_expand=has_expand, hidden_grid=hidden_grid, use_residual=use_residual,
        inv_h=float(1.0 / e["act_step"]) if hidden_grid else 1.0,
        qmax_h=float(e["act_qmax"]) if hidden_grid else 127.0,
        inv_d=float(1.0 / d["act_step"]), qmax_d=float(d["act_qmax"]),
        inv_sh=float(inv_sh), qmax_sh=float(qmax_sh),
        ratio_out=None if ratio_out is None else float(ratio_out),
        qmin_o=float(qmin_o), qmax_o=float(qmax_o), n_tiles=n_tiles,
    )

    flops = 2 * B * Ho * Wo * Ch * ((Cin if has_expand else 0) + 9 + Cout)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_oh, Wo, Cout), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((SR, W2, Cin), jnp.int8), pltpu.SemaphoreType.DMA],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size + B * Ho * Wo * Cout, transcendentals=0
        ),
        interpret=interpret,
    )(x, *args)


# ---------------------------------------------------------------------------
# Stem: fused preprocess + 3x3 stride-2 conv + requant on the uint8 image.
# ---------------------------------------------------------------------------


def _stem_kernel(xs_hbm, w_ref, m_ref, b_ref, out_ref, slab, sem, *,
                 Hs, Ws, Cout, tile_oh, Ws2, inv_a, qmax_a, n_tiles):
    """Space-to-depth makes the 3x3/s2 conv a 2x2/s1 conv over 12 channels
    (some taps structurally zero): 4 shifted K=12 matmuls, no strided access.
    Halo is top/left one pixel; invalid taps are masked to zero pre-dot."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_oh
    start = t * th - 1

    def copy(src_row0, n_rows, dst_row0):
        dma = pltpu.make_async_copy(
            xs_hbm.at[b, pl.ds(src_row0, n_rows), pl.ds(0, Ws), :],
            slab.at[pl.ds(dst_row0, n_rows), pl.ds(1, Ws), :],
            sem,
        )
        dma.start()
        dma.wait()

    if n_tiles == 1:
        copy(0, th, 1)
    else:
        @pl.when(t == 0)
        def _first():
            copy(0, th, 1)

        @pl.when(t > 0)
        def _rest():
            copy(start, th + 1, 0)

    acc = jnp.zeros((th * Ws, Cout), jnp.float32)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (th, Ws), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (th, Ws), 1)
    for dy in range(2):
        for dx in range(2):
            tap = jax.lax.slice(slab[:], (dy, dx, 0), (dy + th, dx + Ws, 12))
            # tap (r, j) = s2d(start + r + dy, j + dx - 1); zero outside image
            valid = ((r_ids + start + dy >= 0) & (r_ids + start + dy < Hs)
                     & (c_ids + dx - 1 >= 0) & (c_ids + dx - 1 < Ws))
            # Mosaic has no uint8->float cast; hop through int32 (exact).
            tf = (tap.astype(jnp.int32).astype(jnp.float32)
                  * valid.astype(jnp.float32)[:, :, None])
            a = tf.reshape(th * Ws, 12).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                a, w_ref[pl.ds((2 * dy + dx) * 12, 12), :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    y = jnp.maximum(acc * m_ref[:] + b_ref[:], 0.0)
    q = jnp.clip(jnp.round(y * inv_a), 0.0, qmax_a)
    out_ref[0] = q.reshape(th, Ws, Cout).astype(jnp.int8)


def fused_stem(
    images: jax.Array,  # (B, H, W, 3) uint8
    stem: Dict[str, Any],
    tile_oh: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused preprocess + 3x3/s2 stem conv + requant -> int8 (B, H/2, W/2, C).

    The uint8 image is space-to-depth'd by 2 (one cheap XLA uint8 reshuffle);
    1/255 normalization folds into the per-channel multiplier (the conv is
    linear and integer accumulation is exact), reproducing
    ``relu(conv(img/255) * mult + bias)`` on the stem activation grid."""
    B, H, W, _ = images.shape
    assert H % 2 == 0 and W % 2 == 0 and (W // 2) % 8 == 0
    Hs, Ws = H // 2, W // 2
    xs = images.reshape(B, Hs, 2, Ws, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, Hs, Ws, 12
    )

    # 3x3 kernel -> 4 taps of the 2x2 s2d conv.  Output pixel (R, C) maps to
    # original center (2R, 2C) (pad=1, stride=2: rows 2R-1..2R+1); s2d tap
    # (dy, dx) at s2d pixel (R-1+dy, C-1+dx) holds original rows/cols
    # (2(R-1+dy)+sy, 2(C-1+dx)+sx), so original offset oy = 2dy+sy-3+1.
    w = np.asarray(stem["w_int"], np.float32)  # (3, 3, 3, Cout)
    Cout = w.shape[-1]
    w4 = np.zeros((4, 12, Cout), np.float32)
    for dy in range(2):
        for dx in range(2):
            for sy in range(2):
                for sx in range(2):
                    oy = 2 * (dy - 1) + sy + 1  # in [-1, 2]
                    ox = 2 * (dx - 1) + sx + 1
                    if 0 <= oy < 3 and 0 <= ox < 3:
                        w4[2 * dy + dx, sy * 6 + sx * 3: sy * 6 + sx * 3 + 3, :] = \
                            w[oy, ox, :, :]
    w4 = jnp.asarray(w4.reshape(4 * 12, Cout))

    m = (stem["mult_core"] / 255.0).reshape(1, Cout).astype(jnp.float32)
    bias = stem["bias"].reshape(1, Cout).astype(jnp.float32)

    if tile_oh <= 0:
        tile_oh = Hs if Hs <= 32 else 32
    while Hs % tile_oh:
        tile_oh //= 2
    n_tiles = Hs // tile_oh
    Ws2 = _round_up(Ws + 2, 8)

    kernel = functools.partial(
        _stem_kernel, Hs=Hs, Ws=Ws, Cout=Cout, tile_oh=tile_oh, Ws2=Ws2,
        inv_a=float(1.0 / stem["act_step"]), qmax_a=float(stem["act_qmax"]),
        n_tiles=n_tiles,
    )
    vspec = lambda a: pl.BlockSpec(a.shape, lambda b, t, _n=a.ndim: (0,) * _n,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), vspec(w4), vspec(m), vspec(bias)],
        out_specs=pl.BlockSpec((1, tile_oh, Ws, Cout), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hs, Ws, Cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((tile_oh + 1, Ws2, 12), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xs, w4, m, bias)
