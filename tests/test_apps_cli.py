"""Smoke tests for the CLI apps (argv-level contracts), on the CPU mesh."""

import json
import os

import numpy as np
import pytest


def test_nn_stats_cli(capsys):
    from spef_tpu.apps.nn_stats import main

    main(["--backbone", "small", "--img-size", "48", "64", "--ori", "regression",
          "--pos", "regression"])
    out = capsys.readouterr().out
    assert "TOTAL" in out and "Conv2D" in out


def test_soft_class_study_cli(tmp_path, capsys):
    from spef_tpu.apps.soft_class_study import main

    main(["--out", str(tmp_path), "--n-poses", "32",
          "--ori-bins", "6", "--ori-smooth", "3",
          "--pos-bins", "8", "--pos-smooth", "100"])
    assert (tmp_path / "soft_class_results.json").exists()
    assert (tmp_path / "ori_roundtrip_heatmap.png").exists()
    results = json.load(open(tmp_path / "soft_class_results.json"))
    assert "pdf_distance" in results


def test_soft_class_grid_study_cli(tmp_path):
    """Full reference-style grid study (`soft_class_plot.py` main): stats
    heatmaps + smooth-line plots + pose-space heatmap + 3D scatter."""
    from spef_tpu.apps.soft_class_study import main

    main(["--out", str(tmp_path), "--grid",
          "--ori-bins", "6", "8", "--ori-smooth", "2", "3",
          "--pos-bins", "6", "8", "--pos-smooth", "100", "150",
          "--grid-step-deg", "60", "--grid-step-m", "6"])
    for tag in ("ori", "pos"):
        for fig in ("grid_mean_heatmap", "grid_median_heatmap", "smooth_lines",
                    "pose_heatmap", "3d_scatter"):
            assert (tmp_path / f"{tag}_{fig}.png").exists(), f"{tag}_{fig}"
        assert (tmp_path / f"{tag}_grid_errors.npy").exists()
    stats = json.load(open(tmp_path / "grid_study.json"))
    assert set(stats) == {"orientation", "position"}
    assert all(v > 0 for v in stats["orientation"]["mean"].values())


def test_create_dspeed_cli(tmp_path):
    from spef_tpu.apps.create_dspeed import main

    main(["--out", str(tmp_path), "--n-still", "4", "--n-frames", "10",
          "--scenarios", "S", "Docking", "--figures"])
    assert (tmp_path / "still" / "pose.json").exists()
    labels = json.load(open(tmp_path / "Docking" / "pose.json"))
    assert len(labels) == 11
    assert set(labels[0]) == {"filename", "q", "t"}
    # Figure suite: distribution histograms (still) + trajectory (video).
    assert (tmp_path / "still" / "distributions.png").exists()
    assert (tmp_path / "Docking" / "trajectory.png").exists()


def test_make_speed_split_cli(tmp_path):
    from spef_tpu.apps.make_speed_split import main

    entries = [{"filename": f"img{i}.jpg", "q_vbs2tango": [1, 0, 0, 0],
                "r_Vo2To_vbs_true": [0, 0, 10]} for i in range(20)]
    with open(tmp_path / "train.json", "w") as f:
        json.dump(entries, f)
    main(["--dataset", str(tmp_path), "--random", "--valid-fraction", "0.25"])
    train = json.load(open(tmp_path / "train_no_valid.json"))
    valid = json.load(open(tmp_path / "valid.json"))
    assert len(train) == 15 and len(valid) == 5
    names = {e["filename"] for e in train} | {e["filename"] for e in valid}
    assert len(names) == 20  # disjoint cover

    # Default (no --random) materializes the vendored reference split.
    main(["--dataset", str(tmp_path)])
    assert len(json.load(open(tmp_path / "train_no_valid.json"))) == 10200
    assert len(json.load(open(tmp_path / "valid.json"))) == 1800


def test_generate_bitwidth_experiments_cli(tmp_path):
    from spef_tpu.apps.generate_bitwidth_experiments import main
    from spef_tpu.config.train_config import discover_experiments
    from spef_tpu.quant.bitwidth import load_bit_width

    main(["--out", str(tmp_path), "--n-blocks", "2"])
    exps = discover_experiments(str(tmp_path))
    assert len(exps) > 30
    first = sorted(exps.values(), key=lambda e: e["config"])[0]
    bw = load_bit_width(first["bit_width"])
    assert len(bw["inverted_residual"]) == 2


def test_benchmark_cli(tmp_path):
    """Throughput harness smoke: float + forward paths, JSON output
    (the reference's per-target latency harnesses, SURVEY §5)."""
    from spef_tpu.apps.benchmark import main

    out = tmp_path / "bench.json"
    main(["--paths", "float", "forward", "--batch", "8", "--img", "64", "96",
          "--iters", "2", "--json", str(out)])
    payload = json.load(open(out))
    assert payload["float"]["items_per_sec"] > 0
    assert payload["forward"]["items_per_sec"] > 0


def test_train_eval_heatmap_cli_roundtrip(tmp_path):
    """The exact chip-queue pipeline for the heatmap-head keypoints model at
    toy scale: apps.train on a heatmap config -> apps.eval (plain EPnP)
    -> apps.eval --ransac (sidecar artifact). Guards the R4A stages
    against CLI/config regressions before hours of chip training."""
    import json

    import numpy as np

    from spef_tpu.apps import eval as eval_app
    from spef_tpu.apps import train as train_app
    from spef_tpu.data.synthetic import create_synthetic_dataset

    data = create_synthetic_dataset(str(tmp_path / "dspeed"), n_train=10,
                                    n_valid=5, n_test=5, img_size=(48, 64))
    cfg = f"""
MODEL:
  BACKBONE: {{NAME: small, RESIDUAL: true}}
  HEAD:
    NAME: keypoints_heatmap
    ORI: keypoints
    POS: keypoints
DATA:
  BATCH_SIZE: 5
  PATH: {data}
  IMG_SIZE: [48, 64]
  ROT_AUGMENT: false
  OTHER_AUGMENT: false
TRAIN:
  N_EPOCH: 1
  LR: 0.001
  OPTIM: Adam
"""
    cfg_path = tmp_path / "exp_hm_toy.yaml"
    cfg_path.write_text(cfg)
    out = tmp_path / "out"
    train_app.main(["--config", str(cfg_path), "--out", str(out)])
    exp = out / "exp_hm_toy"
    assert (exp / "model" / "parameters.msgpack").is_file()

    eval_app.main(["--experiment", str(exp), "--batch-size", "5"])
    eval_app.main(["--experiment", str(exp), "--batch-size", "5", "--ransac"])
    eval_app.main(["--experiment", str(exp), "--batch-size", "5", "--ransac",
                   "--border-gate", "0.02"])
    for name in ("eval_score_error", "eval_score_error_ransac",
                 "eval_score_error_ransac_gated"):
        with open(exp / f"{name}.json") as f:
            rec = json.load(f)
        assert np.isfinite(rec["scores"]["valid"]["esa"][0])
