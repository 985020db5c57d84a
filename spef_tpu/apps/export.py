"""Export CLI — package a trained experiment as an AOT deployment artifact.

Counterpart of the reference's deploy-package builders: the FINN deploy
dir (`/root/reference/build_finn.py:185-213`), TVM's ``lib.tar``
(`build_tvm.py:211`) and the TorchScript/TensorRT export
(`build_nvidia.py:296-325`).  Serializes the full predict pipeline
(preprocess -> network -> activation -> decode) as StableHLO via
``jax.export`` — see :mod:`spef_tpu.deploy`.

Usage:
    # float experiment -> tpu+cpu artifact
    python -m spef_tpu.apps.export --experiment experiments/train/exp_foo \
        --out exp_foo.spef [--batch 64] [--platforms tpu,cpu]

    # int8 build (a build_int8 output dir with int8_graph.pkl): add --int8
    python -m spef_tpu.apps.export --experiment <ladder>/config --int8 \
        --out exp_int8.spef [--weight-only]
"""

from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    import jax

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.deploy import export_predict
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True, help="trained experiment dir")
    parser.add_argument("--out", default=None, help="output .spef path "
                        "(default: <experiment>/model.spef)")
    parser.add_argument("--batch", type=int, default=64,
                        help="static serving window (requests are padded)")
    parser.add_argument("--platforms", default="tpu,cpu",
                        help="comma-separated jax.export platforms")
    parser.add_argument("--int8", action="store_true",
                        help="export the converted int8 executor from the "
                             "experiment's int8_graph.pkl instead of the float model")
    parser.add_argument("--weight-only", action="store_true",
                        help="with --int8: export the weight-only (bf16 exec, "
                             "int weight grids) forward — the deployment headline")
    args = parser.parse_args(argv)

    cfg = load_config(os.path.join(args.experiment, "config.yaml"))
    camera = load_camera(cfg.DATA.PATH)
    spe_utils = SPEUtils.create(
        camera,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
    )

    forward_fn = None
    variant = "float"
    if args.int8:
        graph_path = os.path.join(args.experiment, "int8_graph.pkl")
        with open(graph_path, "rb") as f:
            graph = pickle.load(f)
        graph = jax.tree_util.tree_map(
            lambda v: v.item() if getattr(v, "ndim", 1) == 0 else v, graph)
        if args.weight_only:
            from spef_tpu.quant.int8_model import build_weight_only_forward

            forward_fn, variant = build_weight_only_forward(graph), "weight_only"
        else:
            from spef_tpu.quant.int8_model import build_int8_forward

            forward_fn, variant = build_int8_forward(graph), "int8"

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
        quantization=True,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
    )
    if not args.int8 and bit_width is not None:
        variant = "qat"  # fake-quant network (QAT checkpoint, no conversion)
    predict = build_predict_fn(model, spe_utils, forward_fn=forward_fn)

    out = args.out or os.path.join(args.experiment, "model.spef")
    meta = export_predict(
        predict, args.batch, tuple(cfg.DATA.IMG_SIZE), out,
        platforms=[p.strip() for p in args.platforms.split(",") if p.strip()],
        extra_meta={"experiment": os.path.abspath(args.experiment),
                    "variant": variant},
    )
    size_mb = os.path.getsize(out) / 1e6
    print(f"Exported {variant} predict pipeline -> {out} "
          f"({size_mb:.1f} MB, platforms={meta['platforms']}, "
          f"window={meta['batch']}x{meta['img_size']})")


if __name__ == "__main__":
    main()
