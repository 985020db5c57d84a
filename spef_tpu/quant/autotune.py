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


def lookup_tile(sig: str) -> Tuple[int, int]:
    """(tile_oh, tile_b) for a tuned shape; (0, 0) when never measured."""
    entry = load_tuning().get(sig)
    if not entry:
        return 0, 0
    return int(entry["tile_oh"]), int(entry.get("tile_b", 0))


def _time_fn(fn, x, iters: int = 10, warmup: int = 2) -> float:
    """Seconds/kernel-run by SLOPE: time a short and a long lax.scan chain
    and divide the difference by the iteration delta.

    Why not total/iters: every blocking call through the axon tunnel pays a
    ~30-45 ms relay round trip, so total/iters carries a ~3 ms/iter constant
    floor at iters=10 — it flattened every sub-3ms kernel to the same number
    and made per-node backend choices (fused vs XLA) essentially random
    (round-3 postmortem: 12-signature table summed to 36 ms of "xla_ms"
    against an 8.5 ms composed program).  The two-point slope cancels every
    per-call constant (RTT, dispatch, arg transfer) exactly.

    Each iteration's input is xor-perturbed (data dependence on the loop
    counter) so neither XLA nor the relay can hoist or coalesce the kernel;
    the xor's cost is shape-constant across candidates, so rankings are
    unaffected."""
    import jax
    import jax.numpy as jnp

    lo, hi = max(2, iters // 4), iters * 2

    def make(n):
        def run(x0):
            def body(carry, i):
                xi = jnp.bitwise_xor(carry, (i & 1).astype(carry.dtype))
                y = fn(xi)
                return carry, y.reshape(-1)[0]
            _, ys = jax.lax.scan(body, x0, jnp.arange(n, dtype=jnp.int32))
            return ys
        return jax.jit(run)

    run_lo, run_hi = make(lo), make(hi)

    def med(run):
        for _ in range(max(warmup, 1)):
            ys = run(x)
        jax.block_until_ready(ys)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ys = run(x)
            jax.block_until_ready(ys)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = med(run_lo), med(run_hi)
    per_iter = (t_hi - t_lo) / (hi - lo)
    # Noise guard: a non-positive slope means the kernel is far below the
    # timer's resolution for this chain length — report the (tiny) bound
    # rather than a negative/zero time.
    return max(per_iter, 1e-7)


def _candidates(ho: int) -> List[int]:
    cands = [t for t in (8, 16, 32, 64, 128) if t <= ho and ho % t == 0]
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
    from spef_tpu.quant.int8_fused import (
        _block_fusable, _consumer_grid, _grid, _xla_block, _xla_stem)

    rng = np.random.RandomState(0)
    table = dict(load_tuning())
    h, w = img_hw

    # --- stem ---
    from spef_tpu.ops.pallas.fused_block import (
        PACK_MAX_C, _round_up, packed_width, stem_default_tile,
    )
    import os as _os

    _pmax = PACK_MAX_C if _os.environ.get("SPEF_PACK") else 0
    hs, ws = h // 2, w // 2
    cout = int(graph["stem"]["w_int"].shape[-1])
    # Mirror the executor's packed-layout policy (int8_fused.py) so tuned
    # tiles are measured on the output layout production runs use.
    stem_packed = cout <= _pmax
    sig = block_signature("stem", h, w, 3, 12, cout, 2)
    images = jnp.asarray(rng.randint(0, 256, (batch, h, w, 3), np.uint8))
    stem_cop = 32 if stem_packed else _round_up(cout, 128)
    default_tile = stem_default_tile(hs, ws, _round_up(ws + 2, 8), stem_cop)
    sweep = {}
    for tile in sorted(set(_candidates(hs)) | {default_tile}):
        try:
            ms = _time_fn(lambda x, t=tile: fused_stem(
                x, graph["stem"], tile_oh=t, out_packed=stem_packed),
                          images, iters) * 1e3
        except Exception as exc:
            if verbose:
                print(f"{sig} tile_oh={tile}: failed ({type(exc).__name__})")
            continue
        sweep[str(tile)] = round(ms, 4)
        if verbose:
            print(f"{sig} tile_oh={tile}: {ms:.3f} ms")
    if sweep:
        best = min(sweep, key=sweep.get)
        default = sweep.get(str(default_tile))
        table[sig] = {"tile_oh": int(best), "ms": sweep[best], "candidates": sweep,
                      "default_ms": default,
                      "speedup": round(default / sweep[best], 3) if default else None,
                      "default_skipped": default is None}
        # Time the XLA (conv-form carry) formulation of the same stem with
        # the same harness: the executor picks the faster backend per node
        # (int8_fused.plan_backends) — the FINN-folding / Ansor analogue
        # extended from "which tile" to "which engine".
        try:
            xla_ms = _time_fn(lambda x: _xla_stem(graph["stem"], x),
                              images, iters) * 1e3
            table[sig]["xla_ms"] = round(xla_ms, 4)
            table[sig]["backend"] = ("xla" if xla_ms < table[sig]["ms"]
                                     else "fused")
            if verbose:
                print(f"{sig} xla: {xla_ms:.3f} ms -> backend="
                      f"{table[sig]['backend']}")
        except Exception as exc:
            if verbose:
                print(f"{sig} xla: failed ({type(exc).__name__})")

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
            from spef_tpu.ops.pallas.fused_block import (
                _VMEM_LIMIT, PACK_MAX_C, act_layout, mbconv_vmem_bytes,
                packed_width, pad_act_packed,
            )

            # Mirror the executor's layout policy so tuned tiles match what
            # build_fused_forward will actually run (packing is opt-in, see
            # int8_fused.py).
            import os as _os
            _pmax = PACK_MAX_C if _os.environ.get("SPEF_PACK") else 0
            in_packed = cin <= _pmax
            out_packed = cout <= _pmax
            pad = pad_act_packed if in_packed else pad_act
            x = pad(jnp.asarray(
                rng.randint(-8, 8, (batch, cur_h, cur_w, cin)).astype(np.int8)))
            if in_packed:
                w2, cp = 4 * packed_width(cur_w), 32
            else:
                w2, cp = act_layout(cur_h, cur_w, cin)
            chp = cp if "expand" not in blk else -(-ch // 128) * 128
            wo = cur_w // stride
            if out_packed:
                wo2, cop = 4 * packed_width(wo), 32
            else:
                wo2, cop = act_layout(ho, wo, cout)
            from spef_tpu.ops.pallas.fused_block import mbconv_default_tiles

            # The executor's untuned configuration (_fit_tile_oh + auto
            # batch-tiling) — timed explicitly so the reported speedup
            # compares against what actually runs without tuning.
            dt, db = mbconv_default_tiles(batch, ho, stride, w2, wo, wo2,
                                          cp, chp, cop, "expand" in blk)
            sweep = {}
            cand_pairs = {(tile, nb) for tile in _candidates(ho)
                          for nb in (1, 4, 16, 64)}
            cand_pairs.add((dt, db))
            for tile, nb in sorted(cand_pairs):
                sr = tile + 2 if stride == 1 else 2 * tile + 2
                is_default = (tile, nb) == (dt, db)
                if batch % nb or (not is_default and nb * sr * w2 > 32768):
                    continue
                est = nb * mbconv_vmem_bytes(tile, stride, w2, wo, wo2, cp,
                                             chp, cop, "expand" in blk)
                # The executor runs the default regardless of the sweep's
                # safety margin — never filter it out of the baseline.
                if not is_default and est > int(_VMEM_LIMIT * 0.9):
                    continue
                key = f"t{tile}b{nb}"
                try:
                    ms = _time_fn(
                        lambda xx, t=tile, n=nb: fused_mbconv(
                            xx, blk, in_step=step, out_grid=out_grid,
                            shared_grid=shared, logical_hw=(cur_h, cur_w),
                            tile_oh=t, tile_b=n,
                            in_packed=in_packed, out_packed=out_packed),
                        x, iters) * 1e3
                except Exception as exc:  # compile-side OOM etc.: skip
                    if verbose:
                        print(f"{sig} {key}: failed ({type(exc).__name__})")
                    continue
                sweep[key] = round(ms, 4)
                if verbose:
                    print(f"{sig} {key}: {ms:.3f} ms")
            if sweep:
                best = min(sweep, key=sweep.get)
                bt, bb = best[1:].split("b")
                default = sweep.get(f"t{dt}b{db}")
                table[sig] = {"tile_oh": int(bt), "tile_b": int(bb),
                              "ms": sweep[best], "candidates": sweep,
                              "default_ms": default,
                              "speedup": (round(default / sweep[best], 3)
                                          if default else None),
                              "default_skipped": default is None}
                # XLA (conv-form carry) formulation of the same block, same
                # harness — the executor picks the faster engine per node
                # (int8_fused.plan_backends).
                x_plain = jnp.asarray(
                    rng.randint(-8, 8, (batch, cur_h, cur_w, cin)).astype(np.int8))
                try:
                    xla_ms = _time_fn(
                        lambda xx, b=blk, s=step, og=out_grid:
                            _xla_block(xx, b, s, og)[0],
                        x_plain, iters) * 1e3
                    table[sig]["xla_ms"] = round(xla_ms, 4)
                    table[sig]["backend"] = ("xla" if xla_ms < table[sig]["ms"]
                                             else "fused")
                    if verbose:
                        print(f"{sig} xla: {xla_ms:.3f} ms -> backend="
                              f"{table[sig]['backend']}")
                except Exception as exc:
                    if verbose:
                        print(f"{sig} xla: failed ({type(exc).__name__})")
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
