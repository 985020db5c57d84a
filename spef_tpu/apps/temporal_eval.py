"""Temporal (video) evaluation CLI.

Counterpart of `/root/reference/temporal.py:51-546`: per-sequence streaming
inference with adaptive PDF filtering, still-vs-video metrics, per-axis
Euler error traces, report figures and score persistence.

TPU-native difference: each sequence runs through the fused
``sequence_inference`` path (batched forward + lax.scan filter) instead of
a frame-at-a-time host loop.

Usage:
    python -m spef_tpu.apps.temporal_eval --experiment experiments/train/exp_x \
        --data /path/to/dspeed/video [--plots]
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np


def evaluate_sequence(spe_utils, forward_fn, loader, filter_video=True,
                      **filter_kwargs):
    """Run one sequence; returns (results dict, truth dict, metrics dict)."""
    from spef_tpu.pose.rotations import quat2euler
    from spef_tpu.pose.score import score_batch
    from spef_tpu.temporal.inference import sequence_inference

    frames = []
    oris = []
    poss = []
    for batch in loader:
        n_valid = int(batch["mask"].sum())
        frames.append(batch["images"][:n_valid])
        oris.append(batch["ori"][:n_valid])
        poss.append(batch["pos"][:n_valid])
    frames = np.concatenate(frames)
    truth = {"ori": np.concatenate(oris), "pos": np.concatenate(poss)}

    res = sequence_inference(spe_utils, forward_fn, jnp.asarray(frames),
                             filter_video=filter_video, **filter_kwargs)

    metrics = {}
    still = score_batch(jnp.asarray(truth["ori"]), jnp.asarray(truth["pos"]),
                        res["ori_still"], res["pos_still"])
    metrics["still"] = {k: float(v) for k, v in still.items()}
    if filter_video:
        video = score_batch(jnp.asarray(truth["ori"]), jnp.asarray(truth["pos"]),
                            res["ori_video"], res["pos_video"])
        metrics["video"] = {k: float(v) for k, v in video.items()}

    # Per-axis Euler traces (reference plots yaw/pitch/roll errors).
    metrics["euler_true"] = np.asarray(quat2euler(jnp.asarray(truth["ori"]))).tolist()
    metrics["euler_still"] = np.asarray(quat2euler(res["ori_still"])).tolist()
    if filter_video:
        metrics["euler_video"] = np.asarray(quat2euler(res["ori_video"])).tolist()
        metrics["ori_distance"] = np.asarray(res["ori_distance"]).tolist()
        metrics["pos_distance"] = np.asarray(res["pos_distance"]).tolist()
    return res, truth, metrics


def run_batched_sequences(spe_utils, forward_fn, data, seq_names, out_dir,
                          filter_video=True, plots=False, **filter_kwargs):
    """All equal-length sequences through one vmapped program."""
    import json as _json

    import jax.numpy as jnp

    from spef_tpu.pose.score import score_batch
    from spef_tpu.temporal.inference import multi_sequence_inference

    frames_all, ori_all, pos_all = [], [], []
    for seq in seq_names:
        frames, oris, poss = [], [], []
        for batch in data[seq]:
            n_valid = int(batch["mask"].sum())
            frames.append(batch["images"][:n_valid])
            oris.append(batch["ori"][:n_valid])
            poss.append(batch["pos"][:n_valid])
        frames_all.append(np.concatenate(frames))
        ori_all.append(np.concatenate(oris))
        pos_all.append(np.concatenate(poss))
    t_min = min(f.shape[0] for f in frames_all)
    seqs = np.stack([f[:t_min] for f in frames_all])

    res = multi_sequence_inference(spe_utils, forward_fn, jnp.asarray(seqs),
                                   filter_video=filter_video, **filter_kwargs)
    from spef_tpu.temporal.report import (
        sequence_figures,
        sequence_metrics,
        write_workbooks,
    )

    summary = {}
    books = {"still": {}, "video": {}, "dist": {}}
    for i, seq in enumerate(seq_names):
        truth_o = jnp.asarray(ori_all[i][:t_min])
        truth_p = jnp.asarray(pos_all[i][:t_min])
        still = score_batch(truth_o, truth_p, res["ori_still"][i], res["pos_still"][i])
        entry = {"still": {k: float(v) for k, v in still.items()}}
        line = f"[{seq}] still esa={entry['still']['esa_score']:.4f}"
        rkwargs = {}
        if filter_video:
            video = score_batch(truth_o, truth_p, res["ori_video"][i], res["pos_video"][i])
            entry["video"] = {k: float(v) for k, v in video.items()}
            line += f"  video esa={entry['video']['esa_score']:.4f}"
            rkwargs = {
                "video_ori": np.asarray(res["ori_video"][i]),
                "video_pos": np.asarray(res["pos_video"][i]),
                "ori_distance": np.asarray(res["ori_distance"][i]),
                "pos_distance": np.asarray(res["pos_distance"][i]),
            }
        summary[seq] = entry
        print(line)
        rargs = (np.asarray(truth_o), np.asarray(truth_p),
                 np.asarray(res["ori_still"][i]), np.asarray(res["pos_still"][i]))
        sm, vm, dm = sequence_metrics(*rargs, **rkwargs)
        books["still"][seq], books["video"][seq], books["dist"][seq] = sm, vm, dm
        if plots:
            sequence_figures(out_dir, seq, *rargs, **rkwargs)
    write_workbooks(out_dir, books["still"], books["video"], books["dist"])
    with open(os.path.join(out_dir, "temporal_metrics.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    print(f"Saved metrics to {out_dir}/temporal_metrics.json")


def _report_args(res, truth):
    """(args, kwargs) for the report-suite functions from one sequence run."""
    kwargs = {}
    if "ori_video" in res:
        kwargs = {
            "video_ori": np.asarray(res["ori_video"]),
            "video_pos": np.asarray(res["pos_video"]),
            "ori_distance": np.asarray(res["ori_distance"]),
            "pos_distance": np.asarray(res["pos_distance"]),
        }
    return (truth["ori"], truth["pos"],
            np.asarray(res["ori_still"]), np.asarray(res["pos_still"])), kwargs


def main(argv=None):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.utils.experiment import set_seed

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True)
    parser.add_argument("--data", required=True, help="video dataset root")
    parser.add_argument("--no-filter", action="store_true")
    parser.add_argument("--plots", action="store_true")
    parser.add_argument("--batch-sequences", action="store_true",
                        help="fuse equal-length sequences into one vmapped program")
    parser.add_argument("--out", default=None)
    parser.add_argument("--filter-constants", default=None,
                        help="JSON with domain-tuned filter constants (the "
                             "output of experiments/tune_temporal.py); "
                             "overrides the built-in reference constants")
    args = parser.parse_args(argv)

    filter_overrides = {}
    if args.filter_constants:
        with open(args.filter_constants) as f:
            tuned = json.load(f)
        for kind in ("ori", "pos"):
            best = tuned[kind]["best"]
            filter_overrides[f"{kind}_filter"] = {
                "n": best["n"], "alpha": best["alpha"],
                "distance_metric": tuned[kind]["best_metric"],
            }
        print(f"filter constants from {args.filter_constants}: "
              + ", ".join(f"{k}={v}" for k, v in filter_overrides.items()))

    set_seed(1001)
    cfg = load_config(os.path.join(args.experiment, "config.yaml"))
    assert cfg.MODEL.HEAD.ORI == "classification" and cfg.MODEL.HEAD.POS == "classification", (
        "Adaptative temporal filtering requires classification/classification"
    )

    camera = load_camera(args.data)
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
    data, split = load_dataset(args.data, batch_size=32, img_size=tuple(cfg.DATA.IMG_SIZE))
    from spef_tpu.data.dataset import detect_dataset

    # Domain-tuned filter constants are keyed by dataset family; explicit
    # --filter-constants overrides still win (merged after the defaults).
    dataset_kind = detect_dataset(args.data)

    model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(args.experiment, "model", "parameters.msgpack"),
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION,
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins=spe_utils.position.n_bins,
    )

    def forward_fn(images):
        return model.apply(images, False)

    out_dir = args.out or os.path.join(args.experiment, "temporal")
    os.makedirs(out_dir, exist_ok=True)
    summary = {}

    if args.batch_sequences:
        # Equal-length sequences (the 11x1500 D-SPEED set): one fused
        # multi-sequence program (vmapped scan) instead of a serial loop.
        run_batched_sequences(spe_utils, forward_fn, data, split["eval"], out_dir,
                              filter_video=not args.no_filter, plots=args.plots,
                              dataset=dataset_kind, **filter_overrides)
        return

    from spef_tpu.temporal.report import (
        sequence_figures,
        sequence_metrics,
        write_workbooks,
    )

    books = {"still": {}, "video": {}, "dist": {}}
    for seq in split["eval"]:
        res, truth, metrics = evaluate_sequence(
            spe_utils, forward_fn, data[seq], filter_video=not args.no_filter,
            dataset=dataset_kind, **filter_overrides
        )
        summary[seq] = {k: metrics[k] for k in ("still", "video") if k in metrics}
        still = metrics["still"]["esa_score"]
        line = f"[{seq}] still esa={still:.4f}"
        if "video" in metrics:
            line += f"  video esa={metrics['video']['esa_score']:.4f}"
        print(line)
        rargs, rkwargs = _report_args(res, truth)
        sm, vm, dm = sequence_metrics(*rargs, **rkwargs)
        books["still"][seq], books["video"][seq], books["dist"][seq] = sm, vm, dm
        if args.plots:
            # Full reference figure set (9 figures/sequence,
            # `temporal.py:297-517`) into out_dir/<seq>/.
            sequence_figures(out_dir, seq, *rargs, **rkwargs)

    # The reference's three aggregate workbooks (`temporal.py:519-532`).
    write_workbooks(out_dir, books["still"], books["video"], books["dist"])

    with open(os.path.join(out_dir, "temporal_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    # Tabular export (reference writes still/video/distances xlsx,
    # `temporal.py:519-532`).
    from spef_tpu.utils.experiment import save_score_error

    scores = {seq: {k: [v["esa_score"]] for k, v in m.items()} for seq, m in summary.items()}
    errors = {
        seq: {f"{k}_{axis}": [v[f"{axis}_error"]] for k, v in m.items() for axis in ("ori", "pos")}
        for seq, m in summary.items()
    }
    save_score_error(out_dir, scores, errors, name="temporal_tables")
    print(f"Saved metrics to {out_dir}/temporal_metrics.json")


if __name__ == "__main__":
    main()
