"""Interactive GUI server tests: endpoint contracts over a live HTTP loop.

Covers the reference GUI's interaction surface (`gui.py:93-610`) as mapped
to the browser app: state listing (spinners), frame inference + overlays
(checkboxes), model/split switching, temporal filtering + reset.
"""

import base64
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from spef_tpu.data.synthetic import create_synthetic_dataset


@pytest.fixture(scope="module")
def gui_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("gui")
    data = create_synthetic_dataset(str(root / "data"), n_train=4, n_valid=3,
                                    n_test=3, img_size=(120, 192))

    from spef_tpu.config.train_config import default_config, save_config

    exps = root / "experiments"
    for name in ("exp_a", "exp_b"):
        cfg = default_config()
        cfg.MODEL.BACKBONE.NAME = "small"
        cfg.MODEL.HEAD.ORI = "classification"
        cfg.MODEL.HEAD.POS = "classification"
        cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM = 4
        cfg.MODEL.HEAD.N_POS_BINS_PER_DIM = 4
        cfg.DATA.PATH = data
        cfg.DATA.IMG_SIZE = (48, 64)
        os.makedirs(exps / name)
        save_config(cfg, str(exps / name / "config.yaml"))

    from spef_tpu.apps.gui import GuiBackend, make_server

    backend = GuiBackend(str(exps), data)
    server = make_server(backend, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield backend, f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        body = r.read()
    return r.status, body


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_index_and_state(gui_env):
    _, base = gui_env
    status, page = _get(base + "/")
    assert status == 200 and b"spef_tpu pose viewer" in page

    status, body = _get(base + "/api/state")
    state = json.loads(body)
    assert status == 200
    assert state["experiments"] == ["exp_a", "exp_b"]
    assert set(state["splits"]) == {"train", "valid", "test"}
    assert state["split"] == "test"  # first split alphabetically
    assert state["n_frames"] == 3


def test_frame_inference_and_metrics(gui_env):
    _, base = gui_env
    status, body = _get(base + "/api/frame?idx=1&video=0&overlays=true_pose,pred_pose,"
                               "true_kp,pred_bbox")
    d = json.loads(body)
    assert status == 200
    assert d["idx"] == 1 and d["n_frames"] == 3
    assert {"esa_score", "ori_error", "pos_error"} <= set(d["still"])
    assert d["latency_ms"] > 0
    assert "video" not in d  # still mode
    jpeg = base64.b64decode(d["jpeg_b64"])
    assert jpeg[:2] == b"\xff\xd8"  # JPEG magic

    # idx clamped to the valid range
    _, body = _get(base + "/api/frame?idx=999&video=0&overlays=")
    assert json.loads(body)["idx"] == 2


def test_temporal_mode_and_reset(gui_env):
    backend, base = gui_env
    _, d = _post(base + "/api/reset", {})
    assert d["ok"]
    for i in range(2):
        _, body = _get(base + f"/api/frame?idx={i}&video=1&overlays=temp_pose")
        d = json.loads(body)
        assert {"esa_score", "ori_error", "pos_error"} <= set(d["video"])
    assert backend.inference.pdf_adapt_ori.previous_pdf is not None  # state advanced
    _, d = _post(base + "/api/reset", {})
    assert backend.inference.pdf_adapt_ori.previous_pdf is None


def test_switch_experiment_and_split(gui_env):
    backend, base = gui_env
    _, state = _post(base + "/api/select", {"experiment": "exp_b", "split": "valid"})
    assert state["experiment"] == "exp_b" and state["split"] == "valid"
    assert state["n_frames"] == 3
    _, body = _get(base + "/api/frame?idx=0&video=0&overlays=pred_pose")
    assert json.loads(body)["n_frames"] == 3

    # unknown selection -> 500 with error payload, state unchanged
    req = urllib.request.Request(base + "/api/select",
                                 data=json.dumps({"experiment": "nope"}).encode(),
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 500 and "error" in json.loads(e.read())
    assert raised
    assert backend.exp_name == "exp_b"


def test_discover_splits_layouts(tmp_path):
    """Split discovery covers D-SPEED still/video and SPEED-style layouts."""
    from spef_tpu.apps.gui import discover_splits

    # D-SPEED video-ish: <root>/<seq>/{images,pose.json}
    for seq in ("Docking", "S"):
        os.makedirs(tmp_path / seq / "images")
        with open(tmp_path / seq / "pose.json", "w") as f:
            json.dump([], f)
    # SPEED-style: <root>/images/train + train.json
    os.makedirs(tmp_path / "images" / "train")
    with open(tmp_path / "train.json", "w") as f:
        json.dump([], f)

    splits = discover_splits(str(tmp_path))
    assert set(splits) == {"Docking", "S", "train"}
    assert splits["train"][0].endswith(os.path.join("images", "train"))


def test_engine_variants(tmp_path):
    """Engine dropdown: float / weight-only / int8-carry / exported .spef.

    Mirrors the reference GUI's runtime engine hot-switching
    (`/root/reference/gui.py:470-474`): a QAT experiment carrying an
    ``int8_graph.pkl`` (apps.build_int8 artifact) and a ``model.spef``
    (apps.export artifact) exposes all four variants, and every variant
    serves frames through the same /api/frame pipeline.
    """
    import pickle

    from spef_tpu.apps.gui import GuiBackend
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import default_config, save_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.deploy import export_predict
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model, save_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    data = create_synthetic_dataset(str(tmp_path / "data"), n_train=3, n_valid=2,
                                    n_test=2, img_size=(48, 64))

    cfg = default_config()
    cfg.MODEL.BACKBONE.NAME = "small_mobile"
    cfg.MODEL.QUANTIZATION = True
    cfg.MODEL.HEAD.NAME = "ursonet"
    cfg.MODEL.HEAD.ORI = "classification"
    cfg.MODEL.HEAD.POS = "regression"
    cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM = 4
    cfg.DATA.PATH = data
    cfg.DATA.IMG_SIZE = (48, 64)

    exp = tmp_path / "experiments" / "exp_q"
    os.makedirs(exp)
    save_config(cfg, str(exp / "config.yaml"))

    bw = default_bit_width(n_blocks=2, w=8, a=8, shared=8)
    camera = load_camera(data)
    spe_utils = SPEUtils.create(
        camera, ori_mode="classification", n_ori_bins_per_dim=4,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode="regression")
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification",
        n_ori_bins=spe_utils.orientation.n_bins, pos_mode="regression", seed=5)
    save_model(str(exp / "model"), model, bit_width=bw)

    graph = convert_qat_params(model)
    with open(exp / "int8_graph.pkl", "wb") as f:
        pickle.dump(graph, f)
    export_predict(build_predict_fn(model, spe_utils), batch=2,
                   img_size=(48, 64), out_path=str(exp / "model.spef"),
                   platforms=("cpu",))

    backend = GuiBackend(str(tmp_path / "experiments"), data)
    assert backend.engines == ["float", "weight-only", "int8-carry", "exported"]

    poses = {}
    for eng in backend.engines:
        backend.select(engine=eng)
        assert backend.engine_name == eng
        d = backend.frame(0, video=False,
                          overlays={"pred_pose": True, "true_pose": True})
        assert d["latency_ms"] > 0 and "esa_score" in d["still"]
        poses[eng] = np.asarray(d["pred"]["ori"])

    # weight-only and int8-carry run the SAME int weight grids as the QAT
    # network -> identical decoded orientation up to executor rounding.
    np.testing.assert_allclose(poses["weight-only"], poses["int8-carry"],
                               atol=0.05)

    # unknown engine without an experiment switch is a hard error
    with pytest.raises(KeyError, match="not available"):
        backend.select(engine="nope-not-real")
    assert backend.engine_name in backend.engines
