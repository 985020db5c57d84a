"""Run the fused-kernel autotuner on-chip and persist the winners.

Builds the same demo QAT graph as bench_paths.py (untrained weights — tile
timing does not depend on weight values), runs `quant.autotune.tune_graph`
(the FINN-automatic-folding analogue, `src/finn/folding.py:312-442`), and
persists winners to benchmarks/mm_tuning.json, which the fused executor
auto-applies.

Usage:  [SPEF_PACK=1] python benchmarks/tune_fused.py [--img 256] [--batch 256]
        [--recipe default|boundary]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--recipe", default="default", choices=["default", "boundary"])
    args = ap.parse_args()

    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.autotune import tune_graph
    from spef_tpu.quant.convert import convert_qat_params

    bw = None
    if args.recipe == "boundary":
        from spef_tpu.quant.bitwidth import boundary_bit_width

        bw = boundary_bit_width()
    model = import_model(
        backbone_name="mobilenet_v2_q", head_name="ursonet_q",
        img_size=(args.img, args.img), bit_width=bw, quantization=True,
        ori_mode="classification", n_ori_bins=1232,
        pos_mode="classification", n_pos_bins=1000, seed=0,
    )
    graph = convert_qat_params(model, bw)
    table = tune_graph(graph, (args.img, args.img), batch=args.batch,
                       iters=args.iters)
    print(json.dumps({k: {kk: v[kk] for kk in
                          ("tile_oh", "ms", "speedup", "xla_ms", "backend")
                          if kk in v}
                      for k, v in table.items()}, indent=1, sort_keys=True))

    # --- Graph-level plan arbitration -----------------------------------
    # Isolated per-node times cannot see cross-node XLA fusion (round-3
    # postmortem: 12 isolated-node xla_ms summed to 36 ms against an 8.5 ms
    # composed carry program), so the composed program is the final
    # arbiter: time the DP-hybrid, all-XLA, and all-fused plans end-to-end
    # and persist the winner under plan_key(); plan_backends() honors it.
    import time

    import jax.numpy as jnp
    import numpy as np

    from spef_tpu.quant.autotune import load_tuning, save_tuning
    from spef_tpu.quant.int8_fused import (
        build_fused_forward, plan_backends, plan_key)

    hw = (args.img, args.img)
    n = len(graph["blocks"])
    key = plan_key(graph, hw)
    tbl = dict(load_tuning())
    tbl.pop(key, None)  # arbitration must not read a stale winner
    save_tuning(tbl)
    candidates = {
        "all_xla": {"stem": "xla", "blocks": ["xla"] * n},
        "all_fused": {"stem": "fused", "blocks": ["fused"] * n},
    }
    # DP plans across a transition-penalty sweep: a higher penalty trades
    # minority-backend per-node wins for contiguity (fewer packed<->dense
    # relayout crossings), degenerating to a pure plan at the extreme — the
    # cheap way to enumerate "contiguous fused runs" without timing every
    # crossover point.  Identical plans dedupe before the (compile + e2e
    # timing) cost of a candidate is paid.
    seen = {(p["stem"], tuple(p["blocks"])) for p in candidates.values()}
    for name, pen in (("hybrid", 0.15), ("hybrid_p05", 0.05),
                      ("hybrid_p40", 0.4), ("hybrid_p100", 1.0)):
        p = plan_backends(graph, hw, transition_ms=pen)
        sig = (p["stem"], tuple(p["blocks"]))
        if sig not in seen:
            seen.add(sig)
            candidates[name] = p

    def bench_plan(plan):
        fwd = build_fused_forward(graph, plan=plan)

        def step(frames):
            o, p = fwd(frames)
            dep = (o.reshape(-1)[0] != jnp.float32(3e38)).astype(jnp.uint8)
            return frames + dep, (o, p)

        step = jax.jit(step)
        frames = jnp.asarray(np.random.RandomState(7).randint(
            0, 256, (args.batch, args.img, args.img, 3), dtype=np.uint8))
        out = None
        for _ in range(3):
            frames, out = step(frames)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            frames, out = step(frames)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    timings = {}
    for name, plan in candidates.items():
        try:
            timings[name] = round(bench_plan(plan), 3)
            print(json.dumps({"plan_candidate": name, "ms": timings[name]}))
        except Exception as exc:
            print(json.dumps({"plan_candidate": name,
                              "failed": type(exc).__name__}))
    if timings:
        winner = min(timings, key=timings.get)
        tbl = dict(load_tuning())
        tbl[key] = {**candidates[winner], "source": "graph-arb",
                    "winner": winner, "timings_ms": timings,
                    "batch": args.batch}
        save_tuning(tbl)
        print(json.dumps({"graph_plan": winner, "key": key,
                          "timings_ms": timings}))


if __name__ == "__main__":
    main()
