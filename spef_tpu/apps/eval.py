"""Evaluation CLI — single-model evaluation on a dataset's eval splits.

Counterpart of `/root/reference/eval.py:13-59`; CLI flags replace the
interactive ``input()`` prompt.

Usage:
    python -m spef_tpu.apps.eval --experiment experiments/train/exp_foo \
        [--data /path/to/dataset] [--batch-size 32]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.engine import SPEJax
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.train.trainer import evaluation
    from spef_tpu.utils.experiment import save_score_error, set_seed

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True, help="trained experiment dir")
    parser.add_argument("--data", default=None, help="dataset path override")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=1001)
    parser.add_argument("--cache-dataset", action="store_true",
                        help="serve from the decoded-split disk cache "
                             "(written by train --cache-dataset)")
    parser.add_argument("--ransac", action="store_true",
                        help="keypoints mode: decode through the batched "
                             "RANSAC PnP solver (robust to gross keypoint "
                             "outliers) instead of plain EPnP")
    parser.add_argument("--border-gate", type=float, default=None,
                        help="keypoints mode: zero-weight predictions within "
                             "this normalized margin of the frame border "
                             "(border-saturated = off-frame keypoint) in the "
                             "PnP solve; composes with --ransac")
    parser.add_argument("--crop-refine", default=None, metavar="FINE_EXP",
                        help="keypoints mode: evaluate the two-pass crop-"
                             "refine engine — this experiment is the coarse "
                             "full-frame pass, FINE_EXP the crop-trained "
                             "fine pass (codec/crop.py); composes with "
                             "--ransac")
    args = parser.parse_args(argv)

    set_seed(args.seed)
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
        keypoints_ransac=args.ransac,
        keypoints_border_gate=args.border_gate,
    )
    data, split = load_dataset(data_path, args.batch_size, tuple(cfg.DATA.IMG_SIZE),
                               cache=args.cache_dataset)

    bw_path = os.path.join(args.experiment, "model", "bit_width.json")
    bit_width = None
    if os.path.isfile(bw_path):
        from spef_tpu.quant.bitwidth import load_bit_width

        bit_width = load_bit_width(bw_path)

    model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(args.experiment, "model", "parameters.msgpack"),
        bit_width=bit_width,
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
    )

    if args.crop_refine:
        from spef_tpu.engine import SPECropRefine

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
        # Crops must be produced at the fine model's trained resolution,
        # not the coarse input size (ADVICE r4).
        engine = SPECropRefine(model, fine_model, spe_utils,
                               crop_hw=tuple(fine_cfg.DATA.IMG_SIZE))
    else:
        engine = SPEJax(model, spe_utils)
    rec_score, rec_error = evaluation(engine, data, spe_utils, split["eval"])

    for phase in split["eval"]:
        print(
            f"[{phase}] esa={rec_score[phase]['esa'][0]:.4f} "
            f"ori_err={rec_error[phase]['ori'][0]:.2f}deg (+/-{rec_error[phase]['ori_std'][0]:.2f}) "
            f"pos_err={rec_error[phase]['pos'][0]:.3f}m (+/-{rec_error[phase]['pos_std'][0]:.3f})"
        )
    # RANSAC-/gate-decode results get their own sidecar so A/B runs don't
    # overwrite the plain-EPnP evaluation.
    name = "eval_score_error_ransac" if args.ransac else "eval_score_error"
    if args.border_gate is not None:
        name += "_gated"
    if args.crop_refine:
        name += "_croprefine"
    save_score_error(args.experiment, rec_score, rec_error, name=name)


if __name__ == "__main__":
    main()
