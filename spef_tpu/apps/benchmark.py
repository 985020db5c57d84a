"""Benchmark CLI: throughput / latency across engines and stages.

The per-target measurement harness of the reference (SPETorch latency,
TVM time_evaluator, FINN throughput_test, Jetson averaged predict — SURVEY
§5) collapses into one CLI sweeping this framework's execution paths:

  * ``float``  — bf16 flax model, fused preprocess->decode (the bench.py path)
  * ``int8_xla`` / ``int8_pallas`` — quantized executors
  * ``forward`` — backbone+head only (no decode), for stage attribution
  * ``train``  — full training-step throughput

Reports pipelined device throughput (dispatch-ahead, block-late) and
per-call latency stats.

Usage:
    python -m spef_tpu.apps.benchmark [--paths float forward] [--batch 512]
        [--img 256 256] [--iters 20] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _throughput(fn, args, iters, items):
    """Pipelined throughput with data-dependent chaining: each iteration's
    input depends on the previous output, so the remote execution relay
    cannot coalesce repeated identical calls (unchained loops overreport —
    PERFORMANCE.md 'Measurement gotcha'; same scheme as bench.py).  The
    chain op is one elementwise add over the input (~1% of a batch step)."""
    import jax
    import jax.numpy as jnp

    x, rest = args[0], args[1:]

    def chain(x, out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        # A finite activation is never exactly 2^31-1 after this cast, but
        # the compiler cannot prove dep's value, so the data edge is real.
        dep = (leaf.reshape(-1)[0].astype(jnp.float32) != 3.0e38).astype(x.dtype)
        return x + dep

    out = None
    for _ in range(3):
        out = fn(x, *rest)
        x = chain(x, out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, *rest)
        x = chain(x, out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"items_per_sec": items / dt, "ms_per_batch": dt * 1e3}


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--paths", nargs="*", default=["float", "forward"],
                        choices=["float", "forward", "int8_xla", "int8_pallas",
                                 "weight_only", "train"])
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--img", type=int, nargs=2, default=(256, 256))
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    h, w = args.img
    spe = SPEUtils.create(SPEED_CAMERA, ori_mode="classification",
                          pos_mode="classification", use_keypoints=False)
    imgs = jnp.asarray(
        np.random.RandomState(1001).randint(0, 256, (args.batch, h, w, 3), dtype=np.uint8)
    )

    results = {}

    if {"float", "forward", "train"} & set(args.paths):
        model = import_model(
            backbone_name="mobilenet_v2", head_name="ursonet", img_size=(h, w),
            ori_mode="classification", n_ori_bins=spe.orientation.n_bins,
            pos_mode="classification", n_pos_bins=spe.position.n_bins,
        )

    if "float" in args.paths:
        fn = jax.jit(build_predict_fn(model, spe))
        results["float"] = _throughput(fn, (imgs,), args.iters, args.batch)

    if "forward" in args.paths:
        fwd = jax.jit(lambda im: model.apply(im.astype(jnp.float32) / 255.0, False))
        results["forward"] = _throughput(fwd, (imgs,), args.iters, args.batch)

    if "train" in args.paths:
        from spef_tpu.train.loss import SPELoss
        from spef_tpu.train.optimizer import import_optimizer
        from spef_tpu.train.step import create_train_state
        from spef_tpu.train.trainer import Trainer

        tx, _ = import_optimizer(learning_rate=0.01)
        state = create_train_state(model, tx)
        trainer = Trainer(spe, SPELoss("classification", "classification"))
        q = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (args.batch, 1))
        pos = jnp.tile(jnp.asarray([[0.0, 0, 10.0]]), (args.batch, 1))
        mask = jnp.ones((args.batch,))
        rng = jax.random.PRNGKey(0)

        def step(s):
            s2, m = trainer._train_step(s, imgs, q, pos, mask, rng)
            return s2

        out = None
        s = state
        for _ in range(2):
            s = step(s)
        jax.block_until_ready(s.params)
        t0 = time.perf_counter()
        for _ in range(max(args.iters // 2, 5)):
            s = step(s)
        jax.block_until_ready(s.params)
        dt = (time.perf_counter() - t0) / max(args.iters // 2, 5)
        results["train"] = {"items_per_sec": args.batch / dt, "ms_per_batch": dt * 1e3}

    if {"int8_xla", "int8_pallas", "weight_only"} & set(args.paths):
        from spef_tpu.quant.convert import convert_qat_params
        from spef_tpu.quant.int8_model import build_weight_only_forward
        from spef_tpu.quant.int8_pallas import build_pallas_forward

        qmodel = import_model(
            backbone_name="mobilenet_v2_q", head_name="ursonet_q", img_size=(h, w),
            ori_mode="classification", n_ori_bins=spe.orientation.n_bins,
            pos_mode="classification", n_pos_bins=spe.position.n_bins,
        )
        graph = convert_qat_params(qmodel)
        builders = {
            "int8_xla": lambda: build_pallas_forward(graph, backend="xla"),
            "int8_pallas": lambda: build_pallas_forward(graph, backend="pallas"),
            "weight_only": lambda: build_weight_only_forward(graph),
        }
        for name, builder in builders.items():
            if name not in args.paths:
                continue
            fwd = builder()

            def predict(im, fwd=fwd):
                pred = fwd(im)
                pose = spe.last_activ({"ori_soft": pred[0], "pos_soft": pred[1]})
                return spe.decode(pose)

            fn = jax.jit(predict)
            results[name] = _throughput(fn, (imgs,), args.iters, args.batch)

    for name, r in results.items():
        print(f"{name:12s}: {r['items_per_sec']:10.1f} frames/s  ({r['ms_per_batch']:.2f} ms/batch)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
