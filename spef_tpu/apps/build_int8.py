"""Int8 deployment build CLI — QAT train -> convert -> evaluate ladder.

The TPU-native replacement for ALL THREE reference build pipelines:
``build_finn.py`` (Brevitas->ONNX->FINN FPGA bitfile), ``build_tvm.py``
(FX-QAT->TorchScript->TVM ARM) and ``build_nvidia.py``
(pytorch-quantization->Torch-TensorRT) — see SURVEY.md §2.2.  One flow:

  1. load (or warm-start from an FP32 checkpoint) a QAT model;
  2. optional QAT fine-tuning epochs;
  3. convert to the int8 inference graph (BN fold + integer weights +
     requant scales);
  4. evaluate the ladder float / qat-fake-quant / int8 on the eval splits
     (the reference's 4-5 model evaluation ladder methodology);
  5. run the bit-comparison parity harness and save the int8 graph.

Usage:
    python -m spef_tpu.apps.build_int8 --config exp.yaml --out experiments/build \
        [--fp32-checkpoint path/parameters.msgpack] [--qat-epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config, save_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.engine import SPEJax, build_predict_fn
    from spef_tpu.models.wrapper import import_model, save_model
    from spef_tpu.quant.bitwidth import default_bit_width, load_bit_width
    from spef_tpu.quant.convert import convert_qat_params
    from spef_tpu.quant.int8_model import build_int8_forward
    from spef_tpu.quant.parity import predict_and_compare
    from spef_tpu.quant.warmstart import copy_params
    from spef_tpu.train.loss import SPELoss
    from spef_tpu.train.optimizer import import_optimizer
    from spef_tpu.train.step import create_train_state
    from spef_tpu.train.trainer import Trainer, evaluation
    from spef_tpu.utils.experiment import prepare_directories, save_score_error, set_seed

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", default="experiments/build")
    parser.add_argument("--bit-width", default=None, help="bit_width.json path")
    parser.add_argument("--fp32-checkpoint", default=None)
    parser.add_argument("--qat-checkpoint", default=None)
    parser.add_argument("--qat-epochs", type=int, default=0)
    parser.add_argument("--recipe", default="default",
                        choices=("default", "boundary", "w8a8"),
                        help="bit-width family when no --bit-width file is "
                             "given: 'boundary' = int8 block boundaries with "
                             "real-valued interiors (TPU-speed recipe); "
                             "'w8a8' = uniform 8-bit weights+activations "
                             "(the TVM/TensorRT-class deployment recipe, "
                             "reference README.md:143-144)")
    parser.add_argument("--qat-lr", type=float, default=None,
                        help="learning rate for the QAT fine-tune epochs "
                             "(default: cfg.TRAIN.LR / 10 — warm-started "
                             "fine-tuning at the full training LR walks away "
                             "from the float optimum, measured r2)")
    parser.add_argument("--cache-dataset", action="store_true",
                        help="serve QAT epochs from the decoded-split disk cache")
    parser.add_argument("--device-data", action="store_true",
                        help="park decoded splits in device HBM (see apps/train.py)")
    parser.add_argument("--calibrate", default=None,
                        choices=("absmax", "percentile", "mse", "entropy"),
                        help="PTQ activation calibration from data (no QAT needed) — "
                             "the reference's build_nvidia.py:30-127 calibration modes")
    parser.add_argument("--calibration-batches", type=int, default=256)
    parser.add_argument("--autotune", action="store_true",
                        help="sweep fused-kernel row tiles per block shape on-chip and "
                             "persist winners (FINN folding / Ansor analogue)")
    parser.add_argument("--percentile", type=float, default=99.99)
    parser.add_argument("--seed", type=int, default=1001)
    args = parser.parse_args(argv)

    set_seed(args.seed)
    cfg = load_config(args.config)
    name = os.path.splitext(os.path.basename(args.config))[0]
    save_folder = prepare_directories(os.path.join(args.out, name))
    print(f"Build output: {save_folder}")

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
    data, split = load_dataset(cfg.DATA.PATH, cfg.DATA.BATCH_SIZE, tuple(cfg.DATA.IMG_SIZE),
                               shuffle=cfg.DATA.SHUFFLE, seed=args.seed,
                               cache="device" if args.device_data
                               else args.cache_dataset)

    bit_width = load_bit_width(args.bit_width) if args.bit_width else None
    if bit_width is None and args.recipe == "boundary":
        from spef_tpu.quant.bitwidth import boundary_bit_width

        # int8 between blocks, real-valued interiors: the TPU-speed recipe
        # (the fused kernels then skip every inner requant; see
        # quant/bitwidth.boundary_bit_width).
        bit_width = boundary_bit_width()
    elif bit_width is None and args.recipe == "w8a8":
        # Uniform int8: every weight and activation on an 8-bit grid — the
        # recipe the reference ships to TVM/TensorRT (ESA 0.2088-0.2208 at
        # int8, `/root/reference/README.md:143-144`).
        bit_width = default_bit_width(w=8, a=8, shared=8)

    # Quantized model: map any float model name to its _q counterpart
    # (*_pytorch/*_brevitas aliases and plain names like "mobilenet_v2").
    def _q_name(name):
        name = name.replace("_pytorch", "").replace("_brevitas", "")
        return name if name.endswith("_q") else name + "_q"

    qat_model = import_model(
        backbone_name=_q_name(cfg.MODEL.BACKBONE.NAME),
        head_name=_q_name(cfg.MODEL.HEAD.NAME),
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=args.qat_checkpoint,
        bit_width=bit_width,
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=True,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
        seed=args.seed,
    )

    if args.fp32_checkpoint and not args.qat_checkpoint:
        # Warm-start QAT from a float checkpoint (`build_tvm.py:159-162`
        # reuses train(); warm start via manual copy `model.py:92-119`).
        float_model = import_model(
            backbone_name=cfg.MODEL.BACKBONE.NAME.replace("_brevitas", "").replace("_q", ""),
            head_name=cfg.MODEL.HEAD.NAME.replace("_brevitas", "").replace("_q", ""),
            img_size=tuple(cfg.DATA.IMG_SIZE),
            params_path=args.fp32_checkpoint,
            ori_mode=cfg.MODEL.HEAD.ORI,
            n_ori_bins=spe_utils.orientation.n_bins,
            pos_mode=cfg.MODEL.HEAD.POS,
            n_pos_bins=spe_utils.position.n_bins,
        )
        qat_model.variables = copy_params(float_model.variables, qat_model.variables)
        print("Warm-started QAT model from FP32 checkpoint")

    if args.calibrate:
        # PTQ: observe float activations over calibration batches, choose
        # every grid by the selected criterion, and write the scales back
        # onto the QAT params so any subsequent QAT fine-tune (and the
        # conversion below) starts from the calibrated grids — the
        # calibrate-then-QAT recipe of `build_nvidia.py:209-276`.
        from spef_tpu.quant.calibrate import calibrate_graph, write_scales_to_params

        graph0 = convert_qat_params(qat_model, bit_width)
        batches = (b["images"] for b in data["train"])
        _, amaxes = calibrate_graph(
            graph0, batches, method=args.calibrate, percentile=args.percentile,
            max_batches=args.calibration_batches,
        )
        qat_model.variables = write_scales_to_params(qat_model.variables, amaxes)
        print(f"Calibrated {len(amaxes)} activation grids ({args.calibrate})")

    spe_loss = SPELoss(cfg.MODEL.HEAD.ORI, cfg.MODEL.HEAD.POS, beta=1, norm_distance=True)

    ladder = {}
    if args.qat_epochs > 0:
        # Fine-tune LR recipe: a warm-started QAT model sits next to the
        # float optimum; the r2 ladders ran at the full training LR and the
        # best epoch was always the first (the fine-tune walked AWAY).
        # Default to LR/10 with decay milestones at 60%/85% of the epochs.
        qat_lr = args.qat_lr if args.qat_lr is not None else cfg.TRAIN.LR / 10.0
        milestones = (max(1, int(args.qat_epochs * 0.6)),
                      max(2, int(args.qat_epochs * 0.85)))
        tx, scheduler = import_optimizer(qat_lr, cfg.TRAIN.OPTIM, cfg.TRAIN.MOMENTUM,
                                         cfg.TRAIN.DECAY, "MultiStepLR",
                                         milestones, cfg.TRAIN.GAMMA)
        state = create_train_state(qat_model, tx)
        trainer = Trainer(spe_utils, spe_loss, camera,
                          rot_augment=cfg.DATA.ROT_AUGMENT,
                          other_augment=cfg.DATA.OTHER_AUGMENT,
                          clip_batchnorm=cfg.TRAIN.CLIP_BATCHNORM, seed=args.seed)
        state, *_ = trainer.fit(state, data, args.qat_epochs, scheduler, split["train"])
        qat_model.variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.autotune:
        from spef_tpu.quant.autotune import tune_graph

        graph0 = convert_qat_params(qat_model, bit_width)
        table = tune_graph(graph0, tuple(cfg.DATA.IMG_SIZE), batch=cfg.DATA.BATCH_SIZE)
        with open(os.path.join(save_folder, "autotune_report.json"), "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"Autotune winners persisted ({len(table)} shapes)")

    # Ladder: QAT fake-quant evaluation.
    engine_qat = SPEJax(qat_model, spe_utils)
    score_qat, err_qat = evaluation(engine_qat, data, spe_utils, split["eval"])
    ladder["qat"] = score_qat

    # Convert + int8 evaluation.
    graph = convert_qat_params(qat_model, bit_width)
    int8_fwd = build_int8_forward(graph)
    engine_int8 = SPEJax(qat_model, spe_utils, forward_fn=int8_fwd)
    score_int8, err_int8 = evaluation(engine_int8, data, spe_utils, split["eval"])
    ladder["int8"] = score_int8

    # Weight-only deployment mode (the production TPU serving path).
    from spef_tpu.quant.int8_model import build_weight_only_forward

    wo_fwd = build_weight_only_forward(graph)
    engine_wo = SPEJax(qat_model, spe_utils, forward_fn=wo_fwd)
    score_wo, err_wo = evaluation(engine_wo, data, spe_utils, split["eval"])
    ladder["weight_only"] = score_wo

    # Parity harness on one batch.
    batch = next(iter(data[split["eval"][0]]))
    report = predict_and_compare(
        lambda imgs: qat_model.apply(imgs, False), int8_fwd,
        jnp.asarray(batch["images"]), spe_utils,
    )
    print("parity:", json.dumps(report, indent=2))

    for stage, score in ladder.items():
        for phase in split["eval"]:
            print(f"[{stage}/{phase}] esa={score[phase]['esa'][0]:.4f}")

    # Persist everything.
    save_config(cfg, os.path.join(save_folder, "config.yaml"))
    save_model(os.path.join(save_folder, "model"), qat_model,
               bit_width or qat_model.bit_width or default_bit_width(
                   sum(n for _, _, n, _ in qat_model.module.backbone.settings)))
    with open(os.path.join(save_folder, "int8_graph.pkl"), "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, graph), f)
    with open(os.path.join(save_folder, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    save_score_error(save_folder, {k: v for k, v in ladder.items()},
                     {"qat": err_qat, "int8": err_int8, "weight_only": err_wo},
                     name="ladder")
    print(f"Saved int8 graph + parity report to {save_folder}")


if __name__ == "__main__":
    main()
