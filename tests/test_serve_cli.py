"""serve CLI end-to-end: live-experiment mode and --artifact (.spef) mode
(reference counterpart: the deploy_*.py board-serving scripts)."""

import os
import pickle

import numpy as np
import pytest

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.data.camera import DSPEED_CAMERA
from spef_tpu.models.wrapper import import_model, save_model


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    """Hand-assembled experiment dir (no training), build_int8 layout."""
    from spef_tpu.config.train_config import default_config, save_config
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    exp = tmp_path_factory.mktemp("serve_exp") / "exp_serve"
    (exp / "model").mkdir(parents=True)
    cfg = default_config()
    cfg.MODEL.BACKBONE.NAME = "small_mobile"
    cfg.MODEL.HEAD.NAME = "ursonet"
    cfg.MODEL.HEAD.ORI = "classification"
    cfg.MODEL.HEAD.POS = "regression"
    cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM = 4
    cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS = True
    cfg.MODEL.QUANTIZATION = True
    cfg.DATA.PATH = "/nonexistent"
    cfg.DATA.IMG_SIZE = [32, 48]
    save_config(cfg, str(exp / "config.yaml"))

    bw = default_bit_width(n_blocks=2, w=4, a=4, shared=4)
    spe_utils = SPEUtils.create(
        DSPEED_CAMERA, ori_mode="classification", n_ori_bins_per_dim=4,
        pos_mode="regression",
    )
    qat = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
        bit_width=bw, quantization=True, ori_mode="classification",
        n_ori_bins=spe_utils.orientation.n_bins, pos_mode="regression", seed=7,
    )
    save_model(str(exp / "model"), qat, bw)
    with open(exp / "int8_graph.pkl", "wb") as f:
        pickle.dump(convert_qat_params(qat), f)
    return str(exp)


def test_serve_experiment_selftest(exp_dir, capsys):
    from spef_tpu.apps.serve import main as serve_main

    # Batch must divide over the conftest's 8-device CPU mesh.
    serve_main(["--experiment", exp_dir, "--batch", "8", "--selftest-frames", "8"])
    out = capsys.readouterr().out
    assert "selftest:" in out and "frames/s" in out


def test_serve_artifact_selftest(exp_dir, tmp_path, capsys):
    from spef_tpu.apps.export import main as export_main
    from spef_tpu.apps.serve import main as serve_main

    artifact = str(tmp_path / "model.spef")
    export_main(["--experiment", exp_dir, "--out", artifact, "--batch", "2",
                 "--platforms", "cpu"])
    capsys.readouterr()

    serve_main(["--artifact", artifact, "--selftest-frames", "4"])
    out = capsys.readouterr().out
    assert "Serving AOT artifact" in out
    assert "selftest:" in out


def test_serve_artifact_frames_dir(exp_dir, tmp_path, capsys):
    """--frames-dir on an artifact engine: decode PNGs, print per-frame poses."""
    import cv2

    from spef_tpu.apps.export import main as export_main
    from spef_tpu.apps.serve import main as serve_main

    artifact = str(tmp_path / "model.spef")
    export_main(["--experiment", exp_dir, "--out", artifact, "--batch", "2",
                 "--platforms", "cpu"])

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(3)
    for i in range(3):
        cv2.imwrite(str(frames / f"f{i}.png"),
                    rng.randint(0, 256, (32, 48, 3), dtype=np.uint8))
    capsys.readouterr()

    serve_main(["--artifact", artifact, "--frames-dir", str(frames)])
    out = capsys.readouterr().out
    for i in range(3):
        assert f"f{i}.png: q=" in out


def test_serve_keypoints_experiment(tmp_path, capsys):
    """Serving a keypoints-mode experiment builds the KeyPoints helper and
    decodes through EPnP inside the served program (regression: serve
    hardcoded use_keypoints=False and asserted out on keypoints configs)."""
    from spef_tpu.apps.serve import main as serve_main
    from spef_tpu.config.train_config import default_config, save_config

    exp = tmp_path / "exp_kp"
    (exp / "model").mkdir(parents=True)
    cfg = default_config()
    cfg.MODEL.BACKBONE.NAME = "small"
    cfg.MODEL.HEAD.NAME = "keypoints_regression"
    cfg.MODEL.HEAD.ORI = "keypoints"
    cfg.MODEL.HEAD.POS = "keypoints"
    cfg.MODEL.QUANTIZATION = False
    cfg.DATA.PATH = "/nonexistent"
    cfg.DATA.IMG_SIZE = [32, 48]
    save_config(cfg, str(exp / "config.yaml"))

    from spef_tpu.models.wrapper import save_model as _save
    model = import_model(
        backbone_name="small", head_name="keypoints_regression", img_size=(32, 48),
        ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24, seed=5,
    )
    _save(str(exp / "model"), model)

    serve_main(["--experiment", str(exp), "--batch", "8", "--selftest-frames", "8"])
    out = capsys.readouterr().out
    assert "selftest:" in out and "frames/s" in out


def test_serve_crop_refine_two_pass(tmp_path, capsys):
    """--crop-refine serves the fused two-pass program; crops are produced
    at the FINE model's trained resolution (fine_cfg.DATA.IMG_SIZE — the
    ADVICE r4 crop_hw fix), exercised here with a fine model trained at a
    different input size than the coarse pass."""
    from spef_tpu.apps.serve import main as serve_main
    from spef_tpu.config.train_config import default_config, save_config
    from spef_tpu.models.wrapper import save_model as _save

    def make_exp(name, img_size):
        exp = tmp_path / name
        (exp / "model").mkdir(parents=True)
        cfg = default_config()
        cfg.MODEL.BACKBONE.NAME = "small"
        cfg.MODEL.HEAD.NAME = "keypoints_regression"
        cfg.MODEL.HEAD.ORI = "keypoints"
        cfg.MODEL.HEAD.POS = "keypoints"
        cfg.MODEL.QUANTIZATION = False
        cfg.DATA.PATH = "/nonexistent"
        cfg.DATA.IMG_SIZE = list(img_size)
        save_config(cfg, str(exp / "config.yaml"))
        model = import_model(
            backbone_name="small", head_name="keypoints_regression",
            img_size=img_size, ori_mode="keypoints", pos_mode="keypoints",
            n_keypoint_outputs=24, seed=11,
        )
        _save(str(exp / "model"), model)
        return str(exp)

    coarse = make_exp("exp_coarse", (32, 48))
    fine = make_exp("exp_fine", (16, 24))  # different trained resolution

    serve_main(["--experiment", coarse, "--crop-refine", fine,
                "--batch", "8", "--selftest-frames", "8"])
    out = capsys.readouterr().out
    assert "Serving two-pass crop-refine pipeline" in out
    assert "selftest:" in out and "frames/s" in out
