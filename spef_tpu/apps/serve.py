"""Deployment CLI — load an experiment and serve pose inference.

Counterpart of the reference's ``deploy_finn.py`` / ``deploy_tvm.py`` /
``deploy_nvidia.py`` (SSH/RPC/TCP deployment to boards): on TPU the
deployment target is the local slice, so this CLI loads a trained
experiment (float checkpoint or built int8 graph), compiles the serving
program over the device mesh, and either runs a throughput/latency
self-test or serves frames from a directory.

Usage:
    python -m spef_tpu.apps.serve --experiment experiments/train/exp_x \
        [--int8-graph experiments/build/exp_x/int8_graph.pkl] \
        [--batch 256] [--selftest-frames 2048] [--frames-dir path/]
    python -m spef_tpu.apps.serve --artifact model.spef \
        [--selftest-frames 2048] [--frames-dir path/]

An ``--artifact`` (.spef from apps/export.py) serves the AOT-compiled
program directly — no experiment dir, model code, or weight files needed.
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import time

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.serving import PoseServer

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", default=None)
    parser.add_argument("--artifact", default=None,
                        help=".spef deploy artifact (apps/export.py); replaces --experiment")
    parser.add_argument("--int8-graph", default=None, help="int8_graph.pkl from build_int8")
    parser.add_argument("--int8-backend", default="xla", choices=["xla", "pallas"])
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--selftest-frames", type=int, default=2048)
    parser.add_argument("--frames-dir", default=None, help="serve real frames from here")
    parser.add_argument("--ransac", action="store_true",
                        help="keypoints mode: RANSAC PnP decode (robust to "
                             "gross keypoint outliers) instead of plain EPnP")
    parser.add_argument("--crop-refine", default=None, metavar="FINE_EXP",
                        help="keypoints mode: serve the fused two-pass "
                             "crop-refine program (codec/crop.py) — the "
                             "--experiment model is the coarse pass, "
                             "FINE_EXP the crop-trained fine pass")
    parser.add_argument("--border-gate", type=float, default=None,
                        help="keypoints mode: zero-weight border-saturated "
                             "predictions in the PnP decode (off-frame gate)")
    args = parser.parse_args(argv)
    if bool(args.experiment) == bool(args.artifact):
        parser.error("exactly one of --experiment / --artifact is required")

    if args.artifact:
        from spef_tpu.deploy import load_exported

        engine = load_exported(args.artifact)
        img_size = tuple(engine.meta["img_size"])
        args.batch = engine.batch
        server = engine  # ExportedEngine duck-types PoseServer.predict
        print(f"Serving AOT artifact {args.artifact} "
              f"(variant={engine.meta.get('variant')}, window={engine.batch}x{img_size})")
        _run_requests(args, server, img_size)
        return

    cfg = load_config(os.path.join(args.experiment, "config.yaml"))
    camera = load_camera(cfg.DATA.PATH) if os.path.exists(cfg.DATA.PATH) else None
    if camera is None:
        from spef_tpu.data.camera import SPEED_CAMERA as camera  # noqa: N813

    spe_utils = SPEUtils.create(
        camera,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
        # keypoints-mode experiments decode through EPnP inside the served
        # program; other modes skip building the KeyPoints helper.
        use_keypoints="keypoints" in (cfg.MODEL.HEAD.ORI, cfg.MODEL.HEAD.POS),
        keypoints_ransac=args.ransac,
        keypoints_border_gate=args.border_gate,
    )
    img_size = tuple(cfg.DATA.IMG_SIZE)

    # QAT checkpoints (bit_width.json alongside the weights) belong to the
    # quantized module variants — map names to their `_q` forms, same rule
    # as apps/export.py.
    bw_path = os.path.join(args.experiment, "model", "bit_width.json")
    bit_width = None
    backbone_name, head_name = cfg.MODEL.BACKBONE.NAME, cfg.MODEL.HEAD.NAME
    if os.path.isfile(bw_path):
        from spef_tpu.quant.bitwidth import load_bit_width

        bit_width = load_bit_width(bw_path)

        def q_name(name):
            name = name.replace("_pytorch", "").replace("_brevitas", "")
            return name if name.endswith("_q") else name + "_q"

        backbone_name, head_name = q_name(backbone_name), q_name(head_name)

    model = import_model(
        backbone_name=backbone_name,
        head_name=head_name,
        img_size=img_size,
        params_path=os.path.join(args.experiment, "model", "parameters.msgpack"),
        bit_width=bit_width,
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION or bit_width is not None,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
    )

    forward_fn = None
    if args.int8_graph:
        from spef_tpu.quant.int8_pallas import build_pallas_forward

        with open(args.int8_graph, "rb") as f:
            graph = pickle.load(f)
        graph = {k: v for k, v in graph.items()}
        forward_fn = build_pallas_forward(
            {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v) for k, v in graph.items()},
            backend=args.int8_backend,
        )
        print(f"Serving int8 graph ({args.int8_backend} backend)")

    if args.crop_refine:
        from spef_tpu.codec.crop import CropRefinePipeline

        fine_cfg = load_config(os.path.join(args.crop_refine, "config.yaml"))
        fine_model = import_model(
            backbone_name=fine_cfg.MODEL.BACKBONE.NAME,
            head_name=fine_cfg.MODEL.HEAD.NAME,
            img_size=tuple(fine_cfg.DATA.IMG_SIZE),
            params_path=os.path.join(args.crop_refine, "model", "parameters.msgpack"),
            residual=fine_cfg.MODEL.BACKBONE.RESIDUAL,
            quantization=fine_cfg.MODEL.QUANTIZATION,
            ori_mode=fine_cfg.MODEL.HEAD.ORI,
            pos_mode=fine_cfg.MODEL.HEAD.POS,
        )

        def _kp_fwd(m):
            def fwd(images):
                out = m.apply(images, False)
                return out[0] if isinstance(out, tuple) else out
            return fwd

        # The int8 graph built for --int8-backend serves the COARSE pass
        # (it was converted from the coarse experiment's weights); the fine
        # crop model stays float.  Crops are produced at the fine model's
        # trained resolution (ADVICE r4).
        if forward_fn is not None:
            _int8_fwd = forward_fn

            def _coarse_fwd(images):
                out = _int8_fwd(images)
                return out[0] if isinstance(out, tuple) else out
        else:
            _coarse_fwd = _kp_fwd(model)
        pipe = CropRefinePipeline(_coarse_fwd, _kp_fwd(fine_model),
                                  crop_hw=tuple(fine_cfg.DATA.IMG_SIZE))

        def predict(images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            pose = pipe(images)
            pose.update(spe_utils.keypoints.decode_batch(
                pose["keypoints"], ransac=args.ransac,
                border_gate=args.border_gate))
            return pose

        print(f"Serving two-pass crop-refine pipeline (fine: {args.crop_refine})")
    else:
        predict = build_predict_fn(model, spe_utils, forward_fn=forward_fn)
    server = PoseServer(predict, img_shape=(*img_size, 3), max_batch=args.batch)
    print(f"Compiling serving program (batch window {args.batch})...")
    compile_s = server.warmup()
    print(f"Ready in {compile_s:.1f}s on {server.stats()['devices']} device(s)")

    _run_requests(args, server, img_size)


def _run_requests(args, server, img_size):
    import time

    import numpy as np

    if args.frames_dir:
        paths = sorted(
            glob.glob(os.path.join(args.frames_dir, "*.png"))
            + glob.glob(os.path.join(args.frames_dir, "*.jpg"))
        )
        from spef_tpu.native import available, load_batch

        for start in range(0, len(paths), args.batch):
            chunk = paths[start : start + args.batch]
            if available():
                frames = load_batch(chunk, img_size[0], img_size[1])
            else:
                from spef_tpu.data.dataset import _load_image

                frames = np.stack([_load_image(p, img_size) for p in chunk])
            pose, lat = server.predict(frames)
            for p, q, t in zip(chunk, pose["ori"], pose["pos"]):
                print(f"{os.path.basename(p)}: q={np.round(q, 4).tolist()} "
                      f"t={np.round(t, 3).tolist()}")
        if hasattr(server, "stats"):
            print(f"latency stats: {server.stats()}")
        return

    # Self-test: synthetic frames, sustained throughput.
    rng = np.random.RandomState(0)
    n_batches = max(args.selftest_frames // args.batch, 1)
    frames = rng.randint(0, 256, (args.batch, *img_size, 3), np.uint8)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        server.predict(frames)
    dt = time.perf_counter() - t0
    p50 = (f", request latency {server.stats()['p50_ms']:.1f} ms p50"
           if hasattr(server, "stats") else "")
    print(f"selftest: {n_batches * args.batch / dt:.1f} frames/s sustained{p50}")


if __name__ == "__main__":
    main()
