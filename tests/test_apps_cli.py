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


def test_create_dspeed_cli(tmp_path):
    from spef_tpu.apps.create_dspeed import main

    main(["--out", str(tmp_path), "--n-still", "4", "--n-frames", "10",
          "--scenarios", "S", "Docking"])
    assert (tmp_path / "still" / "pose.json").exists()
    labels = json.load(open(tmp_path / "Docking" / "pose.json"))
    assert len(labels) == 11
    assert set(labels[0]) == {"filename", "q", "t"}


def test_make_speed_split_cli(tmp_path):
    from spef_tpu.apps.make_speed_split import main

    entries = [{"filename": f"img{i}.jpg", "q_vbs2tango": [1, 0, 0, 0],
                "r_Vo2To_vbs_true": [0, 0, 10]} for i in range(20)]
    with open(tmp_path / "train.json", "w") as f:
        json.dump(entries, f)
    main(["--dataset", str(tmp_path), "--valid-fraction", "0.25"])
    train = json.load(open(tmp_path / "train_no_valid.json"))
    valid = json.load(open(tmp_path / "valid.json"))
    assert len(train) == 15 and len(valid) == 5
    names = {e["filename"] for e in train} | {e["filename"] for e in valid}
    assert len(names) == 20  # disjoint cover


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
