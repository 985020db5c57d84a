"""NN statistics CLI — per-layer params/MACs for a model configuration.

Counterpart of `/root/reference/nn_stats.py`.

Usage:
    python -m spef_tpu.apps.nn_stats [--backbone mobilenet_v2] [--head ursonet]
        [--img-size 240 384] [--ori classification] [--pos regression]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.utils.stats import print_model_summary

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backbone", default="mobilenet_v2")
    parser.add_argument("--head", default="ursonet")
    parser.add_argument("--img-size", type=int, nargs=2, default=(240, 384))
    parser.add_argument("--ori", default="classification")
    parser.add_argument("--pos", default="regression")
    parser.add_argument("--ori-bins-per-dim", type=int, default=12)
    parser.add_argument("--pos-bins-per-dim", type=int, default=10)
    args = parser.parse_args(argv)

    spe_utils = SPEUtils.create(
        SPEED_CAMERA, ori_mode=args.ori, n_ori_bins_per_dim=args.ori_bins_per_dim,
        ori_delete_unused_bins=True, pos_mode=args.pos,
        n_pos_bins_per_dim=args.pos_bins_per_dim, use_keypoints=False,
    )
    model = import_model(
        backbone_name=args.backbone, head_name=args.head, img_size=tuple(args.img_size),
        ori_mode=args.ori, n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=args.pos, n_pos_bins=spe_utils.position.n_bins,
    )
    print_model_summary(model, tuple(args.img_size))


if __name__ == "__main__":
    main()
