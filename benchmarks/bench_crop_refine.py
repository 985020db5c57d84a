"""Throughput benchmark for the two-pass crop-refine keypoints engine.

The SPECropRefine deployment mode (coarse full-frame keypoints -> robust
box -> on-device matmul-form crop+resize -> fine pass -> back-mapping ->
EPnP decode, all ONE jitted XLA program) has a perf row of its own in
PERFORMANCE.md: it runs TWO backbone passes plus the crop resample, so
the expected cost is ~2x the single-pass keypoints engine.  Reference
role: the per-engine latency reporting of `spe_torch.py:57-61`.

Methodology = bench.py: chained iterations (frame i+1 depends on output
i) so the remote-execution relay cannot coalesce repeated calls; batch
256; dispatch all iterations, block once.

Usage:
    python benchmarks/bench_crop_refine.py \
        [--coarse experiments/train_synth/exp_keypoints_heatmap_synth] \
        [--fine   experiments/train_synth/exp_keypoints_crop_synth] \
        [--batch 256] [--iters 20] [--ransac] \
        [--out benchmarks/crop_refine_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.engine import SPECropRefine, SPEJax

    from experiments.crop_refine_eval import load_experiment

    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse",
                    default="experiments/train_synth/exp_keypoints_heatmap_synth")
    ap.add_argument("--fine",
                    default="experiments/train_synth/exp_keypoints_crop_synth")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--ransac", action="store_true")
    ap.add_argument("--out", default="benchmarks/crop_refine_bench.json")
    args = ap.parse_args(argv)

    cfg_c, model_c = load_experiment(args.coarse)
    cfg_f, model_f = load_experiment(args.fine)
    img_size = tuple(cfg_c.DATA.IMG_SIZE)
    spe = SPEUtils.create(SPEED_CAMERA, ori_mode="keypoints",
                          pos_mode="keypoints", keypoints_ransac=args.ransac)

    rng = np.random.RandomState(1001)
    frames = jnp.asarray(
        rng.randint(0, 256, (args.batch,) + img_size + (3,), dtype=np.uint8))

    results = {}
    for name, engine in (
        ("single_pass", SPEJax(model_c, spe)),
        ("crop_refine", SPECropRefine(model_c, model_f, spe,
                                      crop_hw=tuple(cfg_f.DATA.IMG_SIZE))),
    ):
        base = engine._predict

        @jax.jit
        def chained(fr, _p=base):
            pose = _p(fr)
            # A decoded unit-quaternion component is never 2.0 -> dep == 1
            # always, but the compiler cannot know that (bench.py trick).
            dep = (pose["ori"][0, 0] != 2.0).astype(jnp.uint8)
            return fr + dep, pose

        f, out = frames, None
        for _ in range(args.warmup):
            f, out = chained(f)
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(args.iters):
            f, out = chained(f)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - start
        fps = args.batch * args.iters / elapsed
        results[name] = {"fps": round(fps, 1),
                         "ms_per_batch": round(1e3 * elapsed / args.iters, 3)}
        print(json.dumps({"engine": name, **results[name]}), flush=True)

    results["ratio"] = round(results["single_pass"]["fps"]
                             / results["crop_refine"]["fps"], 3)
    out_doc = {"batch": args.batch, "iters": args.iters,
               "img_size": list(img_size), "ransac": bool(args.ransac),
               "coarse": args.coarse, "fine": args.fine, "results": results}
    with open(args.out, "w") as fh:
        json.dump(out_doc, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
