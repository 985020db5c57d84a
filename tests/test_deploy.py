"""AOT deployment artifact tests: jax.export round-trip of the predict
pipeline (the reference's deploy-package parity — FINN deploy dir / TVM
lib.tar / TensorRT engine, see spef_tpu/deploy.py)."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.data.camera import DSPEED_CAMERA
from spef_tpu.deploy import export_predict, load_exported
from spef_tpu.engine import SPEJax, build_predict_fn
from spef_tpu.models.wrapper import import_model


@pytest.fixture(scope="module")
def float_setup():
    spe_utils = SPEUtils.create(
        DSPEED_CAMERA, ori_mode="classification", n_ori_bins_per_dim=4,
        pos_mode="classification", n_pos_bins_per_dim=4,
    )
    model = import_model(
        backbone_name="small_mobile", head_name="ursonet", img_size=(32, 48),
        ori_mode="classification", n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode="classification", n_pos_bins=spe_utils.position.n_bins, seed=3,
    )
    return model, spe_utils


def test_export_roundtrip_matches_live_engine(float_setup, tmp_path):
    model, spe_utils = float_setup
    path = str(tmp_path / "model.spef")
    predict = build_predict_fn(model, spe_utils)
    meta = export_predict(predict, batch=4, img_size=(32, 48), out_path=path,
                          platforms=("cpu",))
    assert meta["outputs"]["ori"] == [4, 4]

    engine = load_exported(path)
    images = np.random.RandomState(0).randint(0, 256, (4, 32, 48, 3), dtype=np.uint8)
    pose, ms = engine.predict(images)
    live, _ = SPEJax(model, spe_utils).predict(images)
    assert ms > 0
    for k in live:
        np.testing.assert_allclose(np.asarray(pose[k]), np.asarray(live[k]),
                                    rtol=1e-5, atol=1e-5, err_msg=k)


def test_exported_engine_pads_and_trims_requests(float_setup, tmp_path):
    model, spe_utils = float_setup
    path = str(tmp_path / "model.spef")
    export_predict(build_predict_fn(model, spe_utils), batch=4, img_size=(32, 48),
                   out_path=path, platforms=("cpu",))
    engine = load_exported(path)
    images = np.random.RandomState(1).randint(0, 256, (4, 32, 48, 3), dtype=np.uint8)
    full, _ = engine.predict(images)
    part, _ = engine.predict(images[:2])
    for k in full:
        assert part[k].shape[0] == 2
        np.testing.assert_allclose(np.asarray(part[k]), np.asarray(full[k][:2]),
                                    rtol=1e-5, atol=1e-5, err_msg=k)
    with pytest.raises(ValueError):
        engine.predict(np.zeros((5, 32, 48, 3), np.uint8))


def test_export_multi_platform_includes_tpu(float_setup, tmp_path):
    """The deployable artifact targets tpu+cpu: TPU lowering must succeed
    without a chip attached and the artifact must still run on CPU."""
    model, spe_utils = float_setup
    path = str(tmp_path / "model_tpu.spef")
    meta = export_predict(build_predict_fn(model, spe_utils), batch=2,
                          img_size=(32, 48), out_path=path,
                          platforms=("tpu", "cpu"))
    assert meta["platforms"] == ["tpu", "cpu"]
    pose, _ = load_exported(path).predict(
        np.zeros((2, 32, 48, 3), np.uint8))
    assert np.isfinite(np.asarray(pose["ori"])).all()


def test_export_cli_float_and_int8(tmp_path):
    """CLI round-trip on a hand-assembled experiment dir (no training):
    config.yaml + parameters.msgpack (+ bit_width.json + int8_graph.pkl
    for the --int8 variant, the build_int8 output layout)."""
    from spef_tpu.apps.export import main as export_main
    from spef_tpu.config.train_config import default_config, save_config
    from spef_tpu.models.wrapper import save_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    exp = tmp_path / "exp_export"
    (exp / "model").mkdir(parents=True)
    cfg = default_config()
    cfg.MODEL.BACKBONE.NAME = "small_mobile"
    cfg.MODEL.HEAD.NAME = "ursonet"
    cfg.MODEL.HEAD.ORI = "classification"
    cfg.MODEL.HEAD.POS = "regression"
    cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM = 4
    cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS = True
    cfg.MODEL.QUANTIZATION = True
    cfg.DATA.PATH = "/nonexistent"  # camera falls back to SPEED intrinsics
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
    graph = convert_qat_params(qat)
    with open(exp / "int8_graph.pkl", "wb") as f:
        pickle.dump(graph, f)

    out_f = str(tmp_path / "float.spef")
    export_main(["--experiment", str(exp), "--out", out_f, "--batch", "2",
                 "--platforms", "cpu"])
    assert os.path.getsize(out_f) > 0
    images = np.random.RandomState(2).randint(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    pose_f, _ = load_exported(out_f).predict(images)

    out_q = str(tmp_path / "int8.spef")
    export_main(["--experiment", str(exp), "--out", out_q, "--batch", "2",
                 "--platforms", "cpu", "--int8"])
    engine_q = load_exported(out_q)
    assert engine_q.meta["variant"] == "int8"
    pose_q, _ = engine_q.predict(images)

    # The exported int8 artifact must reproduce the live int8 executor.
    from spef_tpu.quant.int8_model import build_int8_forward

    live = build_predict_fn(qat, spe_utils, forward_fn=build_int8_forward(graph))
    live_pose = live(jnp.asarray(images))
    for k in pose_q:
        np.testing.assert_allclose(np.asarray(pose_q[k]), np.asarray(live_pose[k]),
                                    rtol=1e-5, atol=1e-5, err_msg=k)
    # The QAT (fake-quant) export and the int8 export are two executors of
    # the same quantized network — they must agree to parity tolerance.
    np.testing.assert_allclose(np.asarray(pose_q["ori"]), np.asarray(pose_f["ori"]),
                               rtol=1e-2, atol=1e-2)


def test_exported_artifact_loads_in_fresh_process(float_setup, tmp_path):
    """Regression: executing a deserialized program with the eigh decode
    crashed (segfault) in any process that had not itself traced a linalg
    op — load_exported must force the lazy LAPACK FFI registration.  Must
    run in a SUBPROCESS: in-process loads mask the bug."""
    import subprocess
    import sys as _sys

    model, spe_utils = float_setup
    path = str(tmp_path / "model.spef")
    export_predict(build_predict_fn(model, spe_utils), batch=2, img_size=(32, 48),
                   out_path=path, platforms=("cpu",))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "from spef_tpu.deploy import load_exported\n"
        f"pose, ms = load_exported({path!r}).predict(np.zeros((2,32,48,3), np.uint8))\n"
        "assert np.isfinite(np.asarray(pose['ori'])).all()\n"
        "print('FRESH_OK')\n"
    )
    res = subprocess.run([_sys.executable, "-c", code], env=env, cwd="/root/repo",
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "FRESH_OK" in res.stdout


def test_serve_cli_artifact_selftest(float_setup, tmp_path, capsys):
    """The serve CLI's --artifact mode runs requests straight off a .spef
    deploy artifact (no experiment dir / model code)."""
    from spef_tpu.apps.serve import main as serve_main

    model, spe_utils = float_setup
    path = str(tmp_path / "model.spef")
    export_predict(build_predict_fn(model, spe_utils), batch=4, img_size=(32, 48),
                   out_path=path, platforms=("cpu",))
    serve_main(["--artifact", path, "--selftest-frames", "8"])
    out = capsys.readouterr().out
    assert "Serving AOT artifact" in out and "frames/s sustained" in out


def test_export_keypoints_mode_roundtrip(tmp_path):
    """Keypoints-mode export: the EPnP decode (eigh/svd/LU custom calls)
    serializes into the .spef artifact — single- and multi-platform — and
    the reloaded engine decodes finite poses."""
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import DSPEED_CAMERA
    from spef_tpu.deploy import export_predict, load_exported
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model

    spe = SPEUtils.create(DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints")
    model = import_model(
        backbone_name="small", head_name="keypoints_regression", img_size=(32, 48),
        ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24, seed=5,
    )
    fn = build_predict_fn(model, spe)

    path = str(tmp_path / "kp.spef")
    export_predict(fn, 4, (32, 48), path, platforms=["cpu"])
    eng = load_exported(path)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 32, 48, 3), np.uint8)
    out, _ = eng.predict(imgs)
    assert out["ori"].shape == (4, 4) and out["pos"].shape == (4, 3)
    assert np.isfinite(out["pos"]).all()
    np.testing.assert_allclose(np.linalg.norm(out["ori"], axis=-1), 1.0, atol=1e-4)

    # Multi-platform: the linalg custom calls must serialize for tpu too.
    export_predict(fn, 4, (32, 48), str(tmp_path / "kp2.spef"),
                   platforms=["tpu", "cpu"])
