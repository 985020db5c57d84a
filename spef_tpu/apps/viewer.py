"""Pose viewer — annotated-frame browser (headless GUI counterpart).

Counterpart of `/root/reference/gui.py` (Kivy app with dataset/model
spinners, prev/next/run, visualization checkboxes, metrics table).  This
environment is headless, so the same functionality is exposed as a CLI
that renders annotated frames (true / predicted / temporal overlays:
axis arrows, wireframe keypoints, bboxes) plus an ``index.html`` gallery
with per-frame metrics — navigable in any browser.

Usage:
    python -m spef_tpu.apps.viewer --experiment experiments/train/exp_x \
        --data /path/to/dataset [--split valid] [--n 16] [--video]
"""

from __future__ import annotations

import argparse
import html
import os

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.pose.score import score_batch
    from spef_tpu.temporal.inference import Inference
    from spef_tpu.utils.visualize import VisualizePose

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True)
    parser.add_argument("--data", default=None)
    parser.add_argument("--split", default=None, help="split/sequence name")
    parser.add_argument("--n", type=int, default=16, help="number of frames")
    parser.add_argument("--video", action="store_true", help="temporal filtering")
    parser.add_argument("--out", default=None)
    parser.add_argument("--engine", default="float",
                        choices=["float", "weight-only", "int8-carry", "exported"],
                        help="inference target: float model, int8 executors "
                             "from the experiment's int8_graph.pkl, or its "
                             "compiled model.spef export (reference "
                             "gui.py:470-474 engine hot-switch)")
    args = parser.parse_args(argv)

    import cv2

    cfg = load_config(os.path.join(args.experiment, "config.yaml"))
    data_path = args.data or cfg.DATA.PATH
    camera = load_camera(data_path)
    spe_utils = SPEUtils.create(
        camera,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
        use_keypoints=True,
    )
    data, split = load_dataset(data_path, batch_size=1, img_size=tuple(cfg.DATA.IMG_SIZE))
    phase = args.split or split["eval"][0]

    from spef_tpu.quant.bitwidth import experiment_model_names

    backbone_name, head_name, bit_width = experiment_model_names(
        args.experiment, cfg.MODEL.BACKBONE.NAME, cfg.MODEL.HEAD.NAME)
    model = import_model(
        backbone_name=backbone_name,
        head_name=head_name,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(args.experiment, "model", "parameters.msgpack"),
        bit_width=bit_width,
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION or bit_width is not None,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
    )
    from spef_tpu.engine import build_engine_variant, discover_engine_variants

    available = discover_engine_variants(args.experiment)
    if args.engine not in available:
        parser.error(f"--engine {args.engine}: experiment only has {available}")
    engine = build_engine_variant(args.experiment, model, spe_utils, args.engine)
    from spef_tpu.data.dataset import detect_dataset

    try:
        dataset_kind = detect_dataset(data_path)
    except Exception:
        dataset_kind = None
    inference = Inference(engine, spe_utils, dataset=dataset_kind)
    viz = VisualizePose(spe_utils)

    out_dir = args.out or os.path.join(args.experiment, "viewer", phase)
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    count = 0
    for batch in data[phase]:
        if count >= args.n:
            break
        n_valid = int(batch["mask"].sum())
        for i in range(n_valid):
            if count >= args.n:
                break
            image = batch["images"][i]  # resized uint8 HWC
            true_pose = {"ori": batch["ori"][i], "pos": batch["pos"][i]}
            if spe_utils.keypoints is not None:
                kp = spe_utils.keypoints.create_keypoints2d(
                    jnp.asarray(true_pose["ori"]), jnp.asarray(true_pose["pos"])
                )
                true_pose["keypoints"] = np.asarray(kp)
                true_pose["bbox"] = np.asarray(
                    spe_utils.keypoints.create_bbox_from_keypoints(kp)
                )

            pose_still, latency_ms, pose_video = inference.predict(
                image[None], "Adaptative" if args.video else None
            )
            frame = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
            frame = viz.add_visualization(
                frame, true_pose=true_pose, pred_pose=pose_still, temp_pose=pose_video,
                show_true_pose=True, show_pred_pose=True, show_temp_pose=pose_video is not None,
                show_true_keypoints=True, show_pred_keypoints=True,
                show_true_bbox=True, show_pred_bbox=True,
            )
            fname = f"frame_{count:05d}.png"
            cv2.imwrite(os.path.join(out_dir, fname), frame)

            m = score_batch(
                jnp.asarray(true_pose["ori"])[None], jnp.asarray(true_pose["pos"])[None],
                jnp.asarray(pose_still["ori"])[None], jnp.asarray(pose_still["pos"])[None],
            )
            rows.append(
                (fname, float(m["esa_score"]), float(m["ori_error"]),
                 float(m["pos_error"]), latency_ms)
            )
            count += 1

    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write("<html><body><h2>spef_tpu pose viewer — %s</h2>\n" % html.escape(phase))
        f.write("<p>red/RGB = truth, green/MYC = prediction, blue/RCA = temporal</p>\n")
        for fname, esa, ori_e, pos_e, lat in rows:
            f.write(
                f'<div style="display:inline-block;margin:4px;text-align:center">'
                f'<img src="{fname}" width="360"><br>'
                f"esa={esa:.3f} ori={ori_e:.1f}deg pos={pos_e:.2f}m lat={lat:.1f}ms</div>\n"
            )
        f.write("</body></html>\n")
    print(f"Wrote {count} annotated frames + index.html to {out_dir}")


if __name__ == "__main__":
    main()
