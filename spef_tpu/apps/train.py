"""Training CLI — multi-experiment driver.

Counterpart of `/root/reference/train.py:18-135`: discovers ``exp_*``
configs in a folder (plain YAML = float model; directory with YAML +
``bit_width.json`` = quantized model), trains each, evaluates, and persists
config + scores + checkpoint per experiment.  CLI flags replace the
reference's interactive prompts.

Usage:
    python -m spef_tpu.apps.train --config path/to/exp.yaml --out experiments/train
    python -m spef_tpu.apps.train --experiments path/to/folder --out experiments/train
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import traceback

import jax


def run_experiment(name: str, cfg, bit_width_path, out_root: str, seed: int = 1001,
                   data_parallel: bool = False, cache_dataset: bool = False,
                   checkpoint: bool = False, epochs: int = 0,
                   device_augment: bool = False, warm_start: str = "") -> dict:
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import save_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.engine import SPEJax
    from spef_tpu.models.wrapper import import_model, save_model
    from spef_tpu.train.loss import SPELoss
    from spef_tpu.train.optimizer import import_optimizer
    from spef_tpu.train.step import create_train_state
    from spef_tpu.train.trainer import Trainer, evaluation
    from spef_tpu.utils.experiment import prepare_directories, save_score_error, set_seed

    set_seed(seed)
    # With checkpointing, an existing directory is resumed in place — a
    # versioned copy would orphan the checkpoints it is meant to restore.
    save_folder = prepare_directories(
        os.path.join(out_root, name),
        on_collision="reuse" if checkpoint else "version")
    print(f"\nResults will be saved to {save_folder}\n")

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

    rot_augment = None
    if cfg.DATA.ROT_AUGMENT and not device_augment:
        # Host-side yaw warp (cv2) in the loader — the TPU executes
        # fine-grained warp gathers poorly (see data/augment_host.py).
        # On single-core hosts pass --device-augment instead: one core
        # cannot hide ~640 ms of cv2 warps per 64-image batch behind the
        # device step, while the device-side warp costs ~213 ms/batch and
        # leaves the host free to feed batches.
        from spef_tpu.data.augment_host import HostRotationAugment

        rot_augment = HostRotationAugment(camera, seed=seed)

    data, split = load_dataset(
        cfg.DATA.PATH, cfg.DATA.BATCH_SIZE, tuple(cfg.DATA.IMG_SIZE),
        shuffle=cfg.DATA.SHUFFLE, seed=seed, rot_augment=rot_augment,
        cache=cache_dataset,
    )
    if cache_dataset == "device" and rot_augment is not None:
        raise SystemExit("--device-data requires --device-augment "
                         "(host warp cannot touch device-resident images)")

    bit_width = None
    if bit_width_path:
        from spef_tpu.quant.bitwidth import load_bit_width

        bit_width = load_bit_width(bit_width_path)

    model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=cfg.MODEL.PRETRAINED_PATH or None,
        pretrained_path=cfg.MODEL.PRETRAINED_BACKBONE or None,
        bit_width=bit_width,
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
        seed=seed,
    )

    if warm_start:
        # Category-ordered copy from ANY trained checkpoint of the same
        # backbone; leaves whose shapes differ (e.g. a different head) keep
        # their fresh init.  This is the supported equivalent of the
        # reference's ImageNet warm start (`src/modeling/model.py:268-277`)
        # — e.g. seed a keypoints-head run from the trained soft-class
        # flagship's backbone.
        from flax import serialization

        from spef_tpu.quant.warmstart import copy_params

        with open(warm_start, "rb") as f:
            src_vars = serialization.msgpack_restore(f.read())
        model.variables = copy_params(src_vars, model.variables,
                                      strict_shapes=False)
        print(f"Warm-started matching parameters from {warm_start}")

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(model.params))
    print(f"Number of trainable parameters in the model: {n_params:,}\n")

    spe_loss = SPELoss(cfg.MODEL.HEAD.ORI, cfg.MODEL.HEAD.POS, beta=1, norm_distance=True)
    tx, scheduler = import_optimizer(
        cfg.TRAIN.LR, cfg.TRAIN.OPTIM, cfg.TRAIN.MOMENTUM, cfg.TRAIN.DECAY,
        cfg.TRAIN.SCHEDULER, tuple(cfg.TRAIN.MILESTONES), cfg.TRAIN.GAMMA,
    )
    state = create_train_state(model, tx)

    save_config(cfg, os.path.join(save_folder, "config.yaml"))

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(save_folder, "tensorboard"))
    except ImportError:
        pass

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        from spef_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"Data-parallel training over {mesh.devices.size} devices\n")

    trainer = Trainer(
        spe_utils, spe_loss, camera,
        rot_augment=bool(cfg.DATA.ROT_AUGMENT and device_augment),
        other_augment=cfg.DATA.OTHER_AUGMENT,
        clip_batchnorm=cfg.TRAIN.CLIP_BATCHNORM, seed=seed, mesh=mesh,
    )
    ckpt_mngr = None
    if checkpoint:
        from spef_tpu.train.checkpoint import CheckpointManager

        ckpt_mngr = CheckpointManager(os.path.join(save_folder, "checkpoints"))
    state, rec_loss, rec_score, rec_error = trainer.fit(
        state, data, epochs or cfg.TRAIN.N_EPOCH, scheduler, split["train"],
        writer=writer, checkpoint_manager=ckpt_mngr, resume=checkpoint,
        best_metric=cfg.TRAIN.BEST_METRIC,
    )
    if writer is not None:
        writer.close()

    # Final evaluation through the engine + persistence.
    model.variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = SPEJax(model, spe_utils, mesh=mesh)
    eval_score, eval_error = evaluation(engine, data, spe_utils, split["eval"])
    save_score_error(save_folder, eval_score, eval_error)
    save_model(os.path.join(save_folder, "model"), model, bit_width)
    return {"loss": rec_loss, "score": eval_score, "error": eval_error}


def main(argv=None):
    from spef_tpu.config.train_config import discover_experiments, load_config

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", help="single experiment YAML")
    parser.add_argument("--experiments", help="folder of exp_* configs")
    parser.add_argument("--out", default="experiments/train", help="output root")
    parser.add_argument("--seed", type=int, default=1001)
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all visible devices (DP over the mesh)")
    parser.add_argument("--cache-dataset", action="store_true",
                        help="decode each split once, serve epochs from RAM "
                             "(device-bound training on few-core hosts)")
    parser.add_argument("--device-data", action="store_true",
                        help="additionally park the decoded splits in device "
                             "HBM and serve epochs as on-device gathers — no "
                             "image bytes cross host<->device after upload "
                             "(implies --cache-dataset; needs --device-augment "
                             "if ROT_AUGMENT is on)")
    parser.add_argument("--checkpoint", action="store_true",
                        help="orbax-checkpoint every epoch into "
                             "<out>/<exp>/checkpoints and auto-resume from the "
                             "latest one; the best-on-valid model is persisted "
                             "at every improvement")
    parser.add_argument("--epochs", type=int, default=0,
                        help="override TRAIN.N_EPOCH (0 = use config)")
    parser.add_argument("--device-augment", action="store_true",
                        help="run the yaw-warp augmentation on-device instead "
                             "of host-side cv2 (faster on single-core hosts)")
    parser.add_argument("--warm-start", default="",
                        help="msgpack checkpoint to seed matching parameters "
                             "from (shape-mismatched leaves, e.g. a different "
                             "head, keep their fresh init) — the in-env "
                             "equivalent of the reference's ImageNet warm "
                             "start")
    parser.add_argument("--pretrained-backbone", default="",
                        help="torchvision-format MobileNetV2 ImageNet "
                             "checkpoint (.npz or torch state_dict) ingested "
                             "into the backbone before training (reference "
                             "`model.py:268-277`)")
    args = parser.parse_args(argv)

    if args.config:
        exps = {os.path.splitext(os.path.basename(args.config))[0]: {
            "config": args.config, "bit_width": None}}
    elif args.experiments:
        exps = discover_experiments(args.experiments)
    else:
        parser.error("one of --config / --experiments is required")

    logging.basicConfig(level=logging.INFO)
    for name, paths in exps.items():
        out_dir = os.path.join(args.out, name)
        if os.path.isdir(out_dir) and os.listdir(out_dir) and not args.checkpoint:
            # With --checkpoint an existing directory means "resume", not "skip".
            print(f"Skip {name}: {out_dir} already exists")
            continue
        try:
            cfg = load_config(paths["config"])
            if args.pretrained_backbone:
                cfg.MODEL.PRETRAINED_BACKBONE = args.pretrained_backbone
            run_experiment(name, cfg, paths["bit_width"], args.out, args.seed,
                           data_parallel=args.data_parallel,
                           cache_dataset="device" if args.device_data
                           else args.cache_dataset,
                           checkpoint=args.checkpoint, epochs=args.epochs,
                           device_augment=args.device_augment,
                           warm_start=args.warm_start)
        except Exception:
            # Per-experiment error isolation (reference `train.py:106-131`).
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "error.log"), "a") as f:
                traceback.print_exc(file=f)
            traceback.print_exc()
            print(f"Experiment {name} failed; continuing", file=sys.stderr)


if __name__ == "__main__":
    main()
