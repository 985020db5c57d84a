"""Pallas TPU kernels for the int8 inference path.

The hot ops of the quantized MobileNet pipeline, fused so activations live
in HBM as int8 (half the bf16 traffic):

  * :func:`int8_matmul_requant` — integer matmul on the MXU (int8 values
    computed exactly via bf16 — see ``_dot_exact``) with the whole epilogue
    fused in-kernel: per-channel dequant multiplier, bias, optional ReLU,
    requantization to the output grid, optional residual add on a shared
    grid; int8 out.  Covers every 1x1 convolution (expansion / projection /
    head conv) and the FC head.
  * :func:`int8_depthwise3x3` — 3x3 depthwise conv on int8 activations:
    overlapping halo row-slabs DMA'd from HBM per (batch, row-tile,
    channel-tile) program, shifted multiply-accumulate on the VPU, fused
    requant epilogue, int8 out.
  * ``xla_*`` fallbacks with identical signatures (single fused XLA
    program; fast to compile, used for stride-2 depthwise and A/B baselines).

These are the TPU-native counterparts of FINN's folded HLS dataflow kernels
(`/root/reference/src/finn/folding.py`) / TVM's Ansor-tuned ARM kernels —
the "native backend" of this framework (SURVEY.md §2.2).  Measured context
in PERFORMANCE.md: the bit-exact executors are activation-requant-bound;
the production serving path is weight-only quantization at the bf16
roofline.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul_requant", "int8_depthwise3x3", "xla_matmul_requant", "xla_depthwise3x3"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Fused int8 matmul + requant (1x1 convs, FC)
# ---------------------------------------------------------------------------


def _dot_exact(x_ref, w_ref, in_unsigned=False):
    """Integer matmul on the MXU via bf16: int8 values (|v| <= 255) are
    exactly representable in bf16 and products accumulate in f32, so this is
    bit-exact integer arithmetic — and ~2x faster than Mosaic's int8 dot
    lowering on v5e (measured).

    ``in_unsigned``: x carries uint8 BITS in int8 lanes (unsigned grid with
    qmax 255 — the bits-carry convention, see int8_pallas._bits_int8);
    decode to the true q on the VPU before the dot (0..255 exact in bf16).
    """
    x = x_ref[:].astype(jnp.float32)
    if in_unsigned:
        x = x + 256.0 * (x < 0)
    return jnp.dot(x.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _encode_bits(q):
    """Unsigned q in [0, 255] (f32) -> uint8 bits in an int8 container
    (in-kernel counterpart of int8_pallas._bits_int8; exact)."""
    return (q - 256.0 * (q > 127.0)).astype(jnp.int8)


def _mm_kernel(x_ref, w_ref, mult_ref, bias_ref, out_ref, *, relu, out_inv_step,
               out_qmax, out_qmin, in_unsigned, out_bits):
    acc = _dot_exact(x_ref, w_ref, in_unsigned)
    y = acc * mult_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y * out_inv_step), out_qmin, out_qmax)
    out_ref[:] = _encode_bits(q) if out_bits else q.astype(jnp.int8)


def _mm_res_kernel(x_ref, w_ref, mult_ref, bias_ref, res_ref, out_ref, *, out_inv_step,
                   out_qmax, out_qmin, res_ratio, res_qmax, res_qmin, in_unsigned):
    """Projection + shared-grid requant + residual add + consumer requant.

    Both the projection requant and the residual are int8 on the SHARED
    grid, so their sum spans up to twice the grid (±255 for shared width
    8) — the sum is kept exact in f32 and requantized straight to the
    consumer grid (``res_ratio = shared_step / consumer_step``), matching
    the int8_carry/int8_fused executors.  Never clamp the sum to int8:
    that saturates for shared widths > 6 (ADVICE r2).

    The hidden input may be a bits-carry (``in_unsigned``: wide dw act
    grid, w8a8 family); the RESIDUAL is always signed int8 (shared grids
    are signed by construction) and the emit grid is a signed consumer
    grid, so neither needs bits handling."""
    acc = _dot_exact(x_ref, w_ref, in_unsigned)
    y = acc * mult_ref[:] + bias_ref[:]
    q = jnp.clip(jnp.round(y * out_inv_step), out_qmin, out_qmax)
    s = q + res_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.clip(jnp.round(s * res_ratio), res_qmin, res_qmax).astype(jnp.int8)


def _mm_f32out_kernel(x_ref, w_ref, mult_ref, bias_ref, out_ref, *, relu, in_unsigned):
    acc = _dot_exact(x_ref, w_ref, in_unsigned)
    y = acc * mult_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_inv_step", "out_qmax", "out_qmin", "block_m", "block_n",
                     "res_ratio", "res_qmax", "res_qmin", "in_unsigned", "out_bits"),
)
def int8_matmul_requant(
    x: jax.Array,  # (M, K) int8
    w: jax.Array,  # (K, N) int8
    mult: jax.Array,  # (N,) f32  = s_in * s_w * |g|
    bias: jax.Array,  # (N,) f32
    residual: Optional[jax.Array] = None,  # (M, N) int8 on the output grid
    relu: bool = True,
    out_inv_step: Optional[float] = None,  # None -> f32 output (no requant)
    out_qmax: float = 127.0,
    out_qmin: float = 0.0,
    block_m: int = 2048,
    block_n: int = 256,  # tiling sweep: see benchmarks/mm_tuning.json
    res_ratio: float = 1.0,   # shared_step / consumer_step for the residual sum
    res_qmax: float = 127.0,  # consumer grid bounds for the requantized sum
    res_qmin: float = -128.0,
    in_unsigned: bool = False,  # x is a uint8 bits-carry (unsigned 8-bit grid)
    out_bits: bool = False,     # emit uint8 bits (unsigned 8-bit out grid)
):
    m, k = x.shape
    _, n = w.shape
    bm = min(block_m, _round_up(m, 32))
    bn = min(block_n, _round_up(n, 128))
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))

    mult2 = mult.reshape(1, n).astype(jnp.float32)
    bias2 = bias.reshape(1, n).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * m * n * k, bytes_accessed=m * k + k * n + m * n, transcendentals=0
    )

    if out_inv_step is None:
        kernel = functools.partial(_mm_f32out_kernel, relu=relu, in_unsigned=in_unsigned)
        out_dtype = jnp.float32
    elif residual is not None:
        kernel = functools.partial(
            _mm_res_kernel, out_inv_step=out_inv_step, out_qmax=out_qmax, out_qmin=out_qmin,
            res_ratio=res_ratio, res_qmax=res_qmax, res_qmin=res_qmin,
            in_unsigned=in_unsigned,
        )
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM))
        out_dtype = jnp.int8
    else:
        kernel = functools.partial(
            _mm_kernel, relu=relu, out_inv_step=out_inv_step,
            out_qmax=out_qmax, out_qmin=out_qmin, in_unsigned=in_unsigned,
            out_bits=out_bits,
        )
        out_dtype = jnp.int8

    args = [x, w, mult2, bias2]
    if residual is not None and out_inv_step is not None:
        args.append(residual)

    extra = {}
    try:  # both grid axes are embarrassingly parallel — tell Mosaic.
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        )
    except TypeError:
        pass

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=cost,
        **extra,
    )(*args)


# ---------------------------------------------------------------------------
# Fused int8 depthwise 3x3 + requant
# ---------------------------------------------------------------------------


def _dw_kernel(x_hbm, w_ref, mult_ref, bias_ref, out_ref, scratch, sem, *, stride,
               in_step, out_inv_step, out_qmax, tile_oh, wd_pad, bc,
               in_unsigned, out_bits):
    """One (batch, out-row-tile, channel-tile) program.

    The input lives in HBM (already spatially padded); the overlapping
    (halo) row slab this tile needs is DMA'd into VMEM scratch manually —
    BlockSpecs cannot express overlapping windows.  Compute is tap-wise
    shift-MAC on the VPU in f32 with a fused requant epilogue.
    """
    bi = pl.program_id(0)
    oh = pl.program_id(1)
    ci = pl.program_id(2)

    in_rows = stride * (tile_oh - 1) + 3
    row0 = oh * tile_oh * stride
    # Slice spans the FULL (8-aligned) padded width: Mosaic requires slice
    # extents on the sublane dim to be tile-aligned.
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(row0, in_rows), :, pl.ds(ci * bc, bc)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    wo = (wd_pad - 2 - 1) // stride + 1
    acc = jnp.zeros((tile_oh, wo, bc), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                scratch[:],
                (dy, dx, 0),
                (dy + (tile_oh - 1) * stride + 1, dx + (wo - 1) * stride + 1, bc),
                (stride, stride, 1),
            ).astype(jnp.float32)
            if in_unsigned:
                # uint8 bits carry (wide expand act grid, w8a8 family):
                # decode to the true q — halo/padding zeros decode to 0.
                tap = tap + 256.0 * (tap < 0)
            acc = acc + tap * w_ref[dy, dx].astype(jnp.float32)
    y = acc * (in_step * mult_ref[0]) + bias_ref[0]
    y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y * out_inv_step), 0.0, out_qmax)
    out_ref[0] = _encode_bits(q) if out_bits else q.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("stride", "in_step", "out_inv_step", "out_qmax", "block_c",
                              "in_unsigned", "out_bits")
)
def int8_depthwise3x3(
    x: jax.Array,  # (B, H, W, C) int8
    w: jax.Array,  # (3, 3, C) int8 (integer values)
    mult: jax.Array,  # (C,) f32 = s_w * |g|  (input step passed separately)
    bias: jax.Array,  # (C,) f32
    stride: int = 1,
    in_step: float = 1.0,
    out_inv_step: float = 1.0,
    out_qmax: float = 127.0,
    block_c: int = 0,  # 0 -> auto (<=128, padded)
    in_unsigned: bool = False,  # x is a uint8 bits-carry (unsigned 8-bit grid)
    out_bits: bool = False,     # emit uint8 bits (unsigned 8-bit out grid)
):
    b, h, wd, c = x.shape
    ho = (h - 1) // stride + 1
    wo = (wd - 1) // stride + 1

    # Mosaic tiling: the channel (lane) tile must be a multiple of 128 (or
    # the full dimension) -> pad channels up to a 128 multiple.
    c_pad = _round_up(c, 128)
    bc = block_c or 128
    assert c_pad % bc == 0

    # Row tiling keeps the VMEM slab bounded at high resolution.
    tile_oh = ho
    while stride * (tile_oh - 1) + 3 > 0 and (
        (stride * (tile_oh - 1) + 3) * (wd + 2) * bc * 5 + tile_oh * wo * bc * 4
    ) > 6 * 2**20:
        assert tile_oh % 2 == 0, (h, tile_oh)
        tile_oh //= 2
    n_oh = ho // tile_oh

    # SAME padding for 3x3 (one halo pixel each side) + channel padding.
    # The padded width is rounded up to the 8-sublane tile so the in-kernel
    # DMA slice is tile-aligned (Mosaic constraint).
    w2 = _round_up(wd + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w2 - wd - 1), (0, c_pad - c)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c)))
    multp = jnp.pad(mult, (0, c_pad - c)).reshape(1, c_pad)
    biasp = jnp.pad(bias, (0, c_pad - c)).reshape(1, c_pad)

    in_rows = stride * (tile_oh - 1) + 3
    grid = (b, n_oh, c_pad // bc)
    kernel = functools.partial(
        _dw_kernel, stride=stride, in_step=in_step, out_inv_step=out_inv_step,
        out_qmax=out_qmax, tile_oh=tile_oh, wd_pad=wd + 2, bc=bc,
        in_unsigned=in_unsigned, out_bits=out_bits,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full padded input, HBM
            pl.BlockSpec((3, 3, bc), lambda i, j, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_oh, wo, bc), lambda i, j, k: (i, j, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c_pad), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((in_rows, w2, bc), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wp, multp, biasp)
    return out[..., :c]


# ---------------------------------------------------------------------------
# XLA fallbacks with identical signatures — one fused XLA program instead of
# per-layer Pallas kernels.  Used where compile latency matters (the remote-
# compile environment) or for A/B benchmarking; XLA fuses the epilogues into
# the integer dot/conv.
# ---------------------------------------------------------------------------


def xla_matmul_requant(
    x: jax.Array,
    w: jax.Array,
    mult: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    relu: bool = True,
    out_inv_step: Optional[float] = None,
    out_qmax: float = 127.0,
    out_qmin: float = 0.0,
    res_ratio: float = 1.0,
    res_qmax: float = 127.0,
    res_qmin: float = -128.0,
    in_unsigned: bool = False,
    out_bits: bool = False,
    **_: object,
):
    if in_unsigned:
        # x carries uint8 BITS in int8 lanes (unsigned grid, qmax 255 —
        # boundary-recipe stem edge): recover the true q exactly.  Zeros
        # (halo / padding) decode to real 0, so no bias bookkeeping.
        x = x.astype(jnp.int32) & 255
        w = w.astype(jnp.int32)
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * mult + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_inv_step is None:
        return y
    q = jnp.clip(jnp.round(y * out_inv_step), out_qmin, out_qmax)
    if residual is not None:
        # Exact shared-grid sum, requantized straight to the consumer grid
        # (never clamp to int8: saturates for shared widths > 6).
        s = q + residual.astype(jnp.float32)
        q = jnp.clip(jnp.round(s * res_ratio), res_qmin, res_qmax)
    if out_bits:  # unsigned 8-bit out grid -> uint8 bits carry
        q = q - 256.0 * (q > 127.0)
    return q.astype(jnp.int8)


def xla_depthwise3x3(
    x: jax.Array,
    w: jax.Array,
    mult: jax.Array,
    bias: jax.Array,
    stride: int = 1,
    in_step: float = 1.0,
    out_inv_step: float = 1.0,
    out_qmax: float = 127.0,
    in_unsigned: bool = False,
    out_bits: bool = False,
    **_: object,
):
    c = x.shape[-1]
    if in_unsigned:
        # uint8 bits in int8 lanes (see xla_matmul_requant); decode to int16
        # BEFORE the conv so the spatial zero-padding stays real 0.  Values
        # 0..255 are exact in the bf16 operand cast below.
        x = x.astype(jnp.int16) & 255
    wf = w.reshape(3, 3, 1, c).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wf, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=dn, feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y * (mult * in_step) + bias, 0.0)
    if out_inv_step is None:  # boundary-only recipe: no dw act grid
        return y.astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(y * out_inv_step), 0.0, out_qmax)
    if out_bits:  # unsigned 8-bit out grid -> uint8 bits carry
        q = q - 256.0 * (q > 127.0)
    return q.astype(jnp.int8)
