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


if __name__ == "__main__":
    main()
