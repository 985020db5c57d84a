"""Mixed-precision bit-width sensitivity study — executed subset.

The reference's core scientific artifact is a ~150-experiment sweep of
per-layer weight/activation bit widths, each trained with QAT and compared
on ESA score (`/root/reference/src/config/train/bit_width_experiment/
generate_experiment.py:5-117,655-705`).  This driver runs a curated subset
of the same families (uniform per-component sweeps + one-block-at-a-time
ablations, mirroring apps/generate_bitwidth_experiments.py) with the
r3 recipe: warm-start every experiment from the trained flagship FP32
checkpoint and fine-tune a few QAT epochs at LR/10 (the build_tvm.py
warm-started-QAT methodology, `build_tvm.py:159-162`), then evaluate the
fake-quant network AND the converted int8 graph on the test split.

One process, one TPU client: the dataset is loaded device-resident once
and every experiment reuses it, so there is no tunnel teardown between
experiments (jax.clear_caches() bounds compile-cache growth).

Usage:
    python experiments/bitwidth_sweep.py \
        [--experiment experiments/train_synth/exp_dspeed_synth] \
        [--qat-epochs 3] [--out experiments/bitwidth_sweep] [--subset N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cases(n_blocks=17):
    """Curated subset: (name, bit_width dict)."""
    from spef_tpu.apps.generate_bitwidth_experiments import _base

    def uniform(component, w):
        bw = _base(n_blocks)
        if component == "dw_w":
            bw["inverted_residual"] = [[(8, 8), (w, 8), (8,)] for _ in range(n_blocks)]
        elif component == "expand_a":
            bw["inverted_residual"] = [[(8, w), (8, 8), (8,)] for _ in range(n_blocks)]
        elif component == "proj_w":
            bw["inverted_residual"] = [[(8, 8), (8, 8), (w,)] for _ in range(n_blocks)]
        elif component == "shared":
            bw["shared_act"] = w
        return bw

    def one_block(idx, triple):
        bw = _base(n_blocks)
        bw["inverted_residual"] = [
            triple if y == idx else [(8, 8), (8, 8), (8,)] for y in range(n_blocks)
        ]
        return bw

    # Breadth-first: the int8 baseline, then ONE case per family at its
    # most aggressive width, then the depth ablations, then the milder
    # widths — so a time-capped partial sweep still covers every family
    # of the reference study (results.json is name-keyed and resumable,
    # so order changes never invalidate finished cases).
    cases = [("uniform_w8a8", _base(n_blocks))]  # the int8 baseline
    # One case per family at its most aggressive width first...
    cases.append(("dw_w2", uniform("dw_w", 2)))
    cases.append(("expand_a2", uniform("expand_a", 2)))
    cases.append(("proj_w2", uniform("proj_w", 2)))
    cases.append(("shared_a3", uniform("shared", 3)))
    # ...then positional sensitivity: 1-bit depthwise weights / 3-bit
    # activations in ONE block, early vs deep (the reference study's
    # one-layer-at-a-time tail section)...
    cases.append(("block1_dw_w1", one_block(1, [(8, 8), (1, 8), (8,)])))
    cases.append(("block15_dw_w1", one_block(15, [(8, 8), (1, 8), (8,)])))
    cases.append(("block1_expand_a3", one_block(1, [(8, 3), (8, 8), (8,)])))
    cases.append(("block15_expand_a3", one_block(15, [(8, 3), (8, 8), (8,)])))
    # ...then the milder widths filling each family's curve.
    for w in (4, 3):
        cases.append((f"dw_w{w}", uniform("dw_w", w)))
    for w in (4, 3):
        cases.append((f"expand_a{w}", uniform("expand_a", w)))
    cases.append(("proj_w4", uniform("proj_w", 4)))
    cases.append(("shared_a4", uniform("shared", 4)))
    return cases


def main(argv=None):
    import jax
    import numpy as np

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.engine import SPEJax
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import save_bit_width
    from spef_tpu.quant.calibrate import calibrate_graph, write_scales_to_params
    from spef_tpu.quant.convert import convert_qat_params
    from spef_tpu.quant.int8_model import build_int8_forward
    from spef_tpu.quant.warmstart import copy_params
    from spef_tpu.train.loss import SPELoss
    from spef_tpu.train.optimizer import import_optimizer
    from spef_tpu.train.step import create_train_state
    from spef_tpu.train.trainer import Trainer, evaluation
    from spef_tpu.utils.experiment import set_seed

    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="experiments/train_synth/exp_dspeed_synth")
    ap.add_argument("--qat-epochs", type=int, default=3)
    ap.add_argument("--out", default="experiments/bitwidth_sweep")
    ap.add_argument("--subset", type=int, default=0, help="run only the first N cases")
    ap.add_argument("--seed", type=int, default=1001)
    args = ap.parse_args(argv)

    set_seed(args.seed)
    cfg = load_config(os.path.join(args.experiment, "config.yaml"))
    camera = load_camera(cfg.DATA.PATH)
    spe_utils = SPEUtils.create(
        camera, ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
    )
    data, split = load_dataset(cfg.DATA.PATH, cfg.DATA.BATCH_SIZE,
                               tuple(cfg.DATA.IMG_SIZE), shuffle=cfg.DATA.SHUFFLE,
                               seed=args.seed, cache="device")
    float_params_path = os.path.join(args.experiment, "model", "parameters.msgpack")
    float_model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=float_params_path,
        ori_mode=cfg.MODEL.HEAD.ORI, n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS, n_pos_bins=spe_utils.position.n_bins,
    )
    float_vars = float_model.variables
    spe_loss = SPELoss(cfg.MODEL.HEAD.ORI, cfg.MODEL.HEAD.POS, beta=1,
                       norm_distance=True)

    cases = build_cases()
    if args.subset:
        cases = cases[: args.subset]
    os.makedirs(args.out, exist_ok=True)
    results_path = os.path.join(args.out, "results.json")
    results = {}
    if os.path.isfile(results_path):  # resume a partial sweep
        with open(results_path) as f:
            results = json.load(f)

    for name, bw in cases:
        if name in results:
            print(f"[{name}] already done, skipping")
            continue
        t0 = time.time()
        qat_model = import_model(
            backbone_name="mobilenet_v2_q", head_name="ursonet_q",
            img_size=tuple(cfg.DATA.IMG_SIZE), bit_width=bw, quantization=True,
            ori_mode=cfg.MODEL.HEAD.ORI, n_ori_bins=spe_utils.orientation.n_bins,
            pos_mode=cfg.MODEL.HEAD.POS, n_pos_bins=spe_utils.position.n_bins,
            seed=args.seed,
        )
        qat_model.variables = copy_params(float_vars, qat_model.variables)
        # Calibrate-then-QAT (the reference's build_nvidia.py:209-276
        # methodology, quant/calibrate.py): initialize every learned
        # activation grid from float-activation percentiles so a short
        # fine-tune starts near its converged quality.  Measured without
        # this, 3 raw QAT epochs leave even uniform w8a8 at ~4x its
        # converged ESA (ladder_w8a8.log epochs 1-3: 1.00 -> 0.64 -> 0.28
        # valid vs 0.18 converged) — the sweep would rank warm-up noise,
        # not bit-width sensitivity.
        graph0 = convert_qat_params(qat_model, bw)
        cal_batches = (b["images"] for b in data["train"])
        _, amaxes = calibrate_graph(graph0, cal_batches, method="percentile",
                                    max_batches=64)
        qat_model.variables = write_scales_to_params(qat_model.variables, amaxes)
        del graph0
        if args.qat_epochs > 0:
            lr = cfg.TRAIN.LR / 10.0
            tx, sched = import_optimizer(
                lr, cfg.TRAIN.OPTIM, cfg.TRAIN.MOMENTUM, cfg.TRAIN.DECAY,
                "MultiStepLR", (max(1, int(args.qat_epochs * 0.6)),
                                max(2, int(args.qat_epochs * 0.85))),
                cfg.TRAIN.GAMMA)
            state = create_train_state(qat_model, tx)
            trainer = Trainer(spe_utils, spe_loss, camera,
                              rot_augment=cfg.DATA.ROT_AUGMENT,
                              other_augment=cfg.DATA.OTHER_AUGMENT,
                              clip_batchnorm=cfg.TRAIN.CLIP_BATCHNORM,
                              seed=args.seed)
            state, *_ = trainer.fit(state, data, args.qat_epochs, sched,
                                    ("train", "valid"), verbose=False)
            qat_model.variables = {"params": state.params,
                                   "batch_stats": state.batch_stats}

        score_qat, _ = evaluation(SPEJax(qat_model, spe_utils), data, spe_utils,
                                  ("test",))
        graph = convert_qat_params(qat_model, bw)
        score_int8, _ = evaluation(
            SPEJax(qat_model, spe_utils, forward_fn=build_int8_forward(graph)),
            data, spe_utils, ("test",))
        entry = {
            "qat_test_esa": float(score_qat["test"]["esa"][0]),
            "qat_test_ori": float(score_qat["test"]["ori"][0]),
            "qat_test_pos": float(score_qat["test"]["pos"][0]),
            "int8_test_esa": float(score_int8["test"]["esa"][0]),
            "minutes": round((time.time() - t0) / 60.0, 1),
        }
        results[name] = entry
        exp_dir = os.path.join(args.out, name)
        os.makedirs(exp_dir, exist_ok=True)
        save_bit_width(exp_dir, bw)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[{name}] qat_esa={entry['qat_test_esa']:.4f} "
              f"int8_esa={entry['int8_test_esa']:.4f} ({entry['minutes']} min)")
        del qat_model, graph
        jax.clear_caches()

    # Reference-style comparison table.
    lines = ["# Bit-width sensitivity sweep (warm-started QAT, "
             f"{args.qat_epochs} epochs, test split)", "",
             "| experiment | QAT ESA | int8 ESA | ori | pos (norm) |",
             "|---|---|---|---|---|"]
    for name, r in results.items():
        lines.append(f"| {name} | {r['qat_test_esa']:.4f} | "
                     f"{r['int8_test_esa']:.4f} | {r['qat_test_ori']:.4f} | "
                     f"{r['qat_test_pos']:.4f} |")
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"Sweep complete: {len(results)} experiments -> {args.out}")


if __name__ == "__main__":
    main()
