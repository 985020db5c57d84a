"""Per-block kernel autotuner — the FINN-folding / Ansor analogue.

The reference's FPGA build searches SIMD/PE unroll factors per network node
to hit a cycles/frame target (`/root/reference/src/finn/folding.py:39-442`)
and its ARM build runs Ansor schedule search (`src/tvm/tvm_compiler.py:
33-74`).  The TPU counterpart: for every fused-block kernel shape of the
real network, sweep the row-tile height (``tile_oh`` — the knob that sets
VMEM slab size, grid parallelism, and DMA granularity), measure on-chip,
and persist the winners to ``benchmarks/fused_tuning.json``.
``fused_mbconv``/``fused_stem`` auto-apply persisted winners at build time
when no explicit tile is given.

Usage (on a real chip):
    python -m spef_tpu.apps.build_int8 --config ... --autotune
or programmatically ``tune_graph(graph, (H, W), batch)``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["block_signature", "load_tuning", "save_tuning", "tune_graph",
           "lookup_tile"]

_TUNING_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks", "fused_tuning.json",
)
_cache: Optional[Dict[str, Any]] = None


def block_signature(kind: str, h: int, w: int, cin: int, ch: int, cout: int,
                    stride: int) -> str:
    return f"{kind}:h{h}w{w}ci{cin}ch{ch}co{cout}s{stride}"


def load_tuning(path: Optional[str] = None) -> Dict[str, Any]:
    global _cache
    if _cache is None:
        try:
            with open(path or _TUNING_PATH) as f:
                _cache = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            _cache = {}
    return _cache


def save_tuning(table: Dict[str, Any], path: Optional[str] = None) -> None:
    global _cache
    path = path or _TUNING_PATH
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=2, sort_keys=True)
    _cache = table


def lookup_tile(sig: str) -> Optional[int]:
    entry = load_tuning().get(sig)
    return int(entry["tile_oh"]) if entry else None


def _time_fn(fn, x, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds/call with chained inputs (the remote-relay coalescing
    gotcha: identical repeated calls misreport — PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp

    def step(x):
        y = fn(x)
        # data-dependent bit flip chains iterations without changing stats
        return jnp.bitwise_xor(x, (y.reshape(-1)[0] & 1)), y

    step = jax.jit(step)
    for _ in range(warmup):
        x, y = step(x)
    jax.block_until_ready(y)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        xi = x
        for _ in range(iters):
            xi, y = step(xi)
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def _candidates(ho: int) -> List[int]:
    cands = [t for t in (8, 16, 32, 64) if t <= ho and ho % t == 0]
    if ho <= 64 and ho not in cands:
        cands.append(ho)
    return cands or [ho]


def tune_graph(
    graph: Dict[str, Any],
    img_hw: Tuple[int, int],
    batch: int = 256,
    iters: int = 10,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Sweep tile_oh for every fused kernel of the network; persist winners.

    Returns the tuning table: sig -> {tile_oh, ms, candidates: {tile: ms},
    default_ms, speedup}.
    """
    import jax.numpy as jnp

    from spef_tpu.ops.pallas.fused_block import fused_mbconv, fused_stem, pad_act
    from spef_tpu.quant.int8_fused import _block_fusable, _consumer_grid, _grid

    rng = np.random.RandomState(0)
    table = dict(load_tuning())
    h, w = img_hw

    # --- stem ---
    hs, ws = h // 2, w // 2
    cout = int(graph["stem"]["w_int"].shape[-1])
    sig = block_signature("stem", h, w, 3, 12, cout, 2)
    images = jnp.asarray(rng.randint(0, 256, (batch, h, w, 3), np.uint8))
    sweep = {}
    for tile in _candidates(hs):
        ms = _time_fn(lambda x, t=tile: fused_stem(x, graph["stem"], tile_oh=t),
                      images, iters) * 1e3
        sweep[str(tile)] = round(ms, 4)
        if verbose:
            print(f"{sig} tile_oh={tile}: {ms:.3f} ms")
    best = min(sweep, key=sweep.get)
    default = sweep.get(str(hs if hs <= 32 else 32), sweep[best])
    table[sig] = {"tile_oh": int(best), "ms": sweep[best], "candidates": sweep,
                  "default_ms": default,
                  "speedup": round(default / sweep[best], 3)}

    # --- blocks ---
    cur_h, cur_w = hs, ws
    step = graph["stem"]["act_step"]
    for i, blk in enumerate(graph["blocks"]):
        d = blk["depthwise"]
        stride = d["stride"]
        cin = int((blk["expand"]["w_int"].shape[-2]) if "expand" in blk
                  else d["w_int"].shape[-1])
        ch = int(d["w_int"].shape[-1])
        cout = int(blk["project"]["w_int"].shape[-1])
        ho = cur_h // stride
        if _block_fusable(blk, cur_h, cur_w):
            sig = block_signature("mbconv", cur_h, cur_w, cin, ch, cout, stride)
            if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
                step = blk["shared_step"]
            out_grid = _consumer_grid(graph, i)
            shared = (_grid(blk["shared_step"], blk["shared_qmax"])
                      if "shared_step" in blk else None)
            x = pad_act(jnp.asarray(
                rng.randint(-8, 8, (batch, cur_h, cur_w, cin)).astype(np.int8)))
            sweep = {}
            for tile in _candidates(ho):
                ms = _time_fn(
                    lambda xx, t=tile: fused_mbconv(
                        xx, blk, in_step=step, out_grid=out_grid,
                        shared_grid=shared, logical_hw=(cur_h, cur_w), tile_oh=t),
                    x, iters) * 1e3
                sweep[str(tile)] = round(ms, 4)
                if verbose:
                    print(f"{sig} tile_oh={tile}: {ms:.3f} ms")
            best = min(sweep, key=sweep.get)
            default = sweep.get(str(ho if ho <= 32 else 32), sweep[best])
            table[sig] = {"tile_oh": int(best), "ms": sweep[best],
                          "candidates": sweep, "default_ms": default,
                          "speedup": round(default / sweep[best], 3)}
        # track grid + shape evolution like the executor does
        if blk["use_residual"]:
            og = _consumer_grid(graph, i)
            step = og["step"] if (og is not None and abs(
                blk["shared_step"] - og["step"]) > 1e-12) else blk["shared_step"]
        else:
            step = _consumer_grid(graph, i)["step"]
        cur_h, cur_w = ho, cur_w // stride

    save_tuning(table)
    if verbose:
        wins = [v["speedup"] for v in table.values() if v.get("speedup")]
        print(f"tuned {len(table)} shapes; median speedup vs default "
              f"{np.median(wins):.3f}x -> {_TUNING_PATH}")
    return table
