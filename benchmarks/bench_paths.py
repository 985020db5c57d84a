"""On-chip throughput comparison of the quantized execution paths.

Measures end-to-end (uint8 frames -> decoded pose) frames/s/chip for:

  * ``weight_only`` — QAT integer weights, bf16 activations (round-1 headline)
  * ``carry``       — int8 activation carries, conv-form, XLA-fused
                      (:mod:`spef_tpu.quant.int8_carry`)
  * ``int8_xla``    — readable bit-exact executor, reshaped-2D int dots
  * ``float``       — unquantized bf16 (roofline reference)

Inputs are CHAINED (frame i+1 depends on output i): repeated async calls on
identical inputs get coalesced by this environment's remote-execution relay
(PERFORMANCE.md "measurement gotcha"), so unchained loops overreport.

Usage:  python benchmarks/bench_paths.py [--paths carry,weight_only] [--batch 256]
        [--iters 20] [--trace /tmp/trace_carry:carry]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass


def build_paths(img, wanted, recipe="default"):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.convert import convert_qat_params
    from spef_tpu.quant.int8_carry import build_int8_carry_forward
    from spef_tpu.quant.int8_model import build_int8_forward, build_weight_only_forward

    spe_utils = SPEUtils.create(
        SPEED_CAMERA, ori_mode="classification", pos_mode="classification",
        use_keypoints=False,
    )
    kw = dict(
        img_size=(img, img),
        ori_mode="classification", n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode="classification", n_pos_bins=spe_utils.position.n_bins,
    )
    paths = {}
    if {"weight_only", "carry", "int8_xla", "fused"} & wanted:
        bw = None
        if recipe == "boundary":
            from spef_tpu.quant.bitwidth import boundary_bit_width

            bw = boundary_bit_width()
        qmodel = import_model(backbone_name="mobilenet_v2_q", head_name="ursonet_q",
                              bit_width=bw, **kw)
        graph = convert_qat_params(qmodel)
        if "weight_only" in wanted:
            paths["weight_only"] = build_weight_only_forward(graph)
        if "carry" in wanted:
            paths["carry"] = build_int8_carry_forward(graph)
        if "int8_xla" in wanted:
            paths["int8_xla"] = build_int8_forward(graph)
        if "fused" in wanted:
            from spef_tpu.quant.int8_fused import build_fused_forward, plan_backends

            plan = plan_backends(graph, (img, img))
            n_xla = (plan["stem"] == "xla") + sum(
                b == "xla" for b in plan["blocks"])
            print(json.dumps({"fused_plan": plan,
                              "nodes_routed_xla": int(n_xla)}))
            paths["fused"] = build_fused_forward(graph)
    if "float" in wanted:
        fmodel = import_model(backbone_name="mobilenet_v2", head_name="ursonet", **kw)
        variables = fmodel.variables

        def float_forward(images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            return fmodel.module.apply(variables, images, False)

        paths["float"] = float_forward
    return spe_utils, paths


def make_step(forward, spe_utils):
    def step(frames):
        pred = forward(frames)
        if isinstance(pred, dict):
            pose = spe_utils.last_activ(pred)
        else:
            pose = spe_utils.last_activ({"ori_soft": pred[0], "pos_soft": pred[1]})
        out = spe_utils.decode(pose)
        # Data-dependent perturbation chains iterations (unit quaternion
        # component is never 2.0 -> dep == 1 always, but the compiler cannot
        # know that).
        dep = (out["ori"][0, 0] != 2.0).astype(jnp.uint8)
        return frames + dep, out

    return jax.jit(step)


def bench(step, frames, warmup, iters):
    for _ in range(warmup):
        frames, out = step(frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        frames, out = step(frames)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="weight_only,carry,int8_xla")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trace", default=None, help="dir:path_name to jax.profiler-trace one path")
    ap.add_argument("--parity", action="store_true",
                    help="compare decoded outputs of all selected paths on one batch")
    ap.add_argument("--recipe", default="default", choices=("default", "boundary"),
                    help="quantization recipe for the QAT graph (boundary = "
                         "int8 block edges, real-valued interiors)")
    args = ap.parse_args()

    wanted = set(args.paths.split(","))
    spe_utils, paths = build_paths(args.img, wanted, recipe=args.recipe)
    rng = np.random.RandomState(1001)
    frames0 = jnp.asarray(
        rng.randint(0, 256, (args.batch, args.img, args.img, 3), dtype=np.uint8)
    )

    trace_dir, trace_path = (args.trace.split(":") + [None])[:2] if args.trace else (None, None)

    if args.parity:
        outs = {}
        for name, fwd in paths.items():
            pred = jax.jit(fwd)(frames0)
            outs[name] = tuple(np.asarray(t) for t in (pred if isinstance(pred, tuple) else (pred,)))
        names = list(outs)
        ref = outs[names[0]]
        for name in names[1:]:
            diffs = [float(np.abs(a - b).max()) for a, b in zip(ref, outs[name])]
            print(json.dumps({"parity": f"{names[0]} vs {name}", "max_abs_diff": diffs}),
                  flush=True)

    results = {}
    for name in args.paths.split(","):
        if name not in paths:
            continue
        step = make_step(paths[name], spe_utils)
        t_compile0 = time.perf_counter()
        f, out = step(frames0)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_compile0
        elapsed = bench(step, frames0, args.warmup, args.iters)
        fps = args.batch * args.iters / elapsed
        results[name] = {"fps": round(fps, 1), "ms_per_batch": round(1e3 * elapsed / args.iters, 3),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({"path": name, **results[name]}), flush=True)
        if trace_dir and name == trace_path:
            with jax.profiler.trace(trace_dir):
                f, out = step(frames0)
                jax.block_until_ready(out)
            print(f"trace written to {trace_dir}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
