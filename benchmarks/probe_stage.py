"""Per-stage cost attribution for the fused mbconv kernels, on-chip.

Times stage-truncated variants ('dma' -> 'expand' -> 'dw' -> 'full') of the
network's hottest block shapes (trace-identified: stem + the four
high-resolution blocks carry 43 of 56 device-ms).  Differences between
consecutive stages attribute the cost:  expand-dma = matmul + hidden
elementwise;  dw-expand = depthwise taps (+ stride-2 gathers);
full-dw = project matmul + requant + store.

Each truncated variant pays one extra full-tensor reduction (anti-DCE),
so absolute stage costs are ~one VPU pass pessimistic.

Usage: python benchmarks/probe_stage.py [--batch 256] [--iters 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

import jax.numpy as jnp


def make_block(rng, cin, ch, cout, stride, residual=False, expand=True):
    def conv(shape):
        return {
            "w_int": jnp.asarray(rng.randint(-8, 8, shape, np.int8)),
            "mult_core": jnp.asarray(rng.rand(shape[-1]).astype(np.float32) * 1e-2),
            "bias": jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 1e-2),
            "stride": 1,
            "groups": 1,
        }

    blk = {
        "use_residual": residual,
        "input_quant": True,
        "expand_ratio": ch // cin,
        "shared_step": 0.07,
        "shared_qmax": 127.0,
        "depthwise": {**conv((3, 3, 1, ch)), "stride": stride, "groups": ch,
                      "act_step": 0.03, "act_qmax": 255.0},
        "project": conv((1, 1, ch, cout)),
    }
    if expand:
        blk["expand"] = {**conv((1, 1, cin, ch)), "act_step": 0.045,
                         "act_qmax": 255.0}
    return blk


# The hot shapes from the 256x256 MobileNetV2 trace (h, w, cin, ch, cout,
# stride, expand) — b1 (no expand), b2, b3, b4.
SHAPES = [
    ("b1_128s1", 128, 128, 32, 32, 16, 1, False),
    ("b2_128s2", 128, 128, 16, 96, 24, 2, True),
    ("b3_64s1", 64, 64, 24, 144, 24, 1, True),
    ("b4_64s2", 64, 64, 24, 144, 32, 2, True),
]


def main():
    from spef_tpu.ops.pallas.fused_block import (
        PACK_MAX_C, fused_mbconv, pad_act, pad_act_packed)
    from spef_tpu.quant.autotune import _time_fn

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile-oh", type=int, default=0)
    ap.add_argument("--no-pack", action="store_true",
                    help="force the plain 128-lane layout (pre-packing A/B)")
    ap.add_argument("--boundary", action="store_true",
                    help="drop inner act grids (boundary-only recipe)")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    out = {}
    for name, h, w, cin, ch, cout, stride, expand in SHAPES:
        blk = make_block(rng, cin, ch, cout, stride, expand=expand)
        if args.boundary:
            for part in ("expand", "depthwise"):
                if part in blk:
                    blk[part].pop("act_step", None)
                    blk[part].pop("act_qmax", None)
        in_packed = (not args.no_pack) and cin <= PACK_MAX_C
        out_packed = (not args.no_pack) and cout <= PACK_MAX_C
        pad = pad_act_packed if in_packed else pad_act
        x = pad(jnp.asarray(
            rng.randint(-8, 8, (args.batch, h, w, cin)).astype(np.int8)))
        grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
        # Roofline floor: logical in+out bytes at the measured ~810 GB/s HBM
        # stream (hidden tensors stay in VMEM; weights are negligible).  The
        # done-criterion for the packed kernels is dma <= ~2x floor_ms.
        logical_bytes = args.batch * (h * w * cin + (h // stride) * (w // stride) * cout)
        row = {"floor_ms": round(logical_bytes / 810e9 * 1e3, 3),
               "layout_in_mb": round(x.nbytes / 1e6, 1)}
        # "dwsel" (phase-major only) splits the depthwise stage: tap-tensor
        # construction (lane-slice/concat shifts) vs the 9-tap accumulation
        # (= dw - dwsel).
        stages = (("dma", "expand", "dwsel", "dw", "full") if in_packed
                  else ("dma", "expand", "dw", "full"))
        for stage in stages:
            try:
                ms = _time_fn(
                    lambda xx, s=stage: fused_mbconv(
                        xx, blk, in_step=0.05, out_grid=grid,
                        logical_hw=(h, w), tile_oh=args.tile_oh, stage=s,
                        in_packed=in_packed, out_packed=out_packed),
                    x, iters=args.iters) * 1e3
                row[stage] = round(ms, 3)
            except Exception as exc:
                row[stage] = f"failed:{type(exc).__name__}"
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
