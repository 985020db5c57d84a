"""Two-stage crop-refine pipeline tests (codec/crop.py).

Covers the box math, the matmul-form bilinear crop+resize against a PIL
reference, label mapping consistency with the window renderer, the trainer's
crop-mode plumbing on a rendered crop dataset, and the fused two-pass
CropRefinePipeline contract.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.codec.crop import (
    CropRefinePipeline,
    clamp_box,
    crop_box_from_keypoints,
    crop_resize,
    jitter_box,
    map_keypoints_from_crop,
    map_keypoints_to_crop,
)
from spef_tpu.codec.facade import SPEUtils
from spef_tpu.codec.keypoints import KeyPoints
from spef_tpu.data.camera import DSPEED_CAMERA
from spef_tpu.data.dataset import load_dataset
from spef_tpu.data.synthetic import create_crop_dataset, create_synthetic_dataset


class TestBoxMath:
    def test_clamp_respects_frame_and_min_size(self):
        box = jnp.asarray([[0.05, 0.97, 0.5], [0.5, 0.5, 0.01], [0.5, 0.5, 2.0]])
        out = np.asarray(clamp_box(box, min_size=0.2))
        # Fully inside the unit frame.
        assert (out[:, 0] - out[:, 2] / 2 >= -1e-6).all()
        assert (out[:, 0] + out[:, 2] / 2 <= 1 + 1e-6).all()
        assert (out[:, 1] - out[:, 2] / 2 >= -1e-6).all()
        assert (out[:, 1] + out[:, 2] / 2 <= 1 + 1e-6).all()
        assert (out[:, 2] >= 0.2 - 1e-6).all() and (out[:, 2] <= 1 + 1e-6).all()

    def test_map_roundtrip(self):
        key = jax.random.PRNGKey(0)
        kp = jax.random.uniform(key, (6, 24))
        box = clamp_box(jax.random.uniform(key, (6, 3)) * 0.5 + 0.25)
        back = map_keypoints_from_crop(map_keypoints_to_crop(kp, box), box)
        np.testing.assert_allclose(np.asarray(back), np.asarray(kp), atol=1e-6)

    def test_box_covers_keypoints_with_margin(self):
        key = jax.random.PRNGKey(1)
        kp = jax.random.uniform(key, (8, 24)) * 0.3 + 0.35
        box = crop_box_from_keypoints(kp, margin=1.25, outlier_k=None)
        local = np.asarray(map_keypoints_to_crop(kp, box)).reshape(8, -1, 2)
        assert (local > 0).all() and (local < 1).all()

    def test_outlier_rejection_shrinks_box(self):
        key = jax.random.PRNGKey(2)
        kp = np.array(jax.random.uniform(key, (4, 24)) * 0.2 + 0.4)
        kp[:, 0], kp[:, 1] = 0.999, 0.999  # one gross border-saturated point
        robust = np.asarray(crop_box_from_keypoints(jnp.asarray(kp))[:, 2])
        naive = np.asarray(crop_box_from_keypoints(jnp.asarray(kp), outlier_k=None)[:, 2])
        assert (robust < naive - 0.1).all()

    def test_jitter_stays_valid(self):
        box = jnp.broadcast_to(jnp.asarray([0.3, 0.7, 0.3]), (32, 3))
        out = np.asarray(jitter_box(jax.random.PRNGKey(3), box))
        assert (out[:, 2] >= 0.2 - 1e-6).all()
        assert (out[:, 0] - out[:, 2] / 2 >= -1e-6).all()
        assert (out[:, 1] + out[:, 2] / 2 <= 1 + 1e-6).all()


class TestCropResize:
    def test_matches_pil_bilinear(self):
        from PIL import Image

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (1, 100, 160, 3), np.uint8)
        box = jnp.asarray([[0.5, 0.5, 0.4]])
        out = np.asarray(crop_resize(jnp.asarray(img, jnp.float32) / 255.0, box, (50, 80)))
        pil = Image.fromarray(img[0]).resize((80, 50), Image.BILINEAR, box=(48, 30, 112, 70))
        ref = np.asarray(pil, np.float32) / 255.0
        assert np.abs(out[0] - ref).max() < 0.02

    def test_matches_two_tap_reference_on_downscale(self):
        # PIL antialiases on downscale; the operator is pure 2-tap bilinear
        # (cv2 INTER_LINEAR-style sampling), so compare against a direct
        # numpy 2-tap evaluation.
        rng = np.random.RandomState(1)
        img = rng.rand(2, 60, 96, 3).astype(np.float32)
        box = np.broadcast_to(np.asarray([0.4, 0.6, 0.7], np.float32), (2, 3))
        h_out, w_out = 30, 48
        out = np.asarray(crop_resize(jnp.asarray(img), jnp.asarray(box), (h_out, w_out)))

        def sample(im, y, x):
            h, w = im.shape[:2]
            y, x = np.clip(y, 0, h - 1.0), np.clip(x, 0, w - 1.0)
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            dy, dx = y - y0, x - x0
            return ((1 - dy) * (1 - dx) * im[y0, x0] + (1 - dy) * dx * im[y0, x1]
                    + dy * (1 - dx) * im[y1, x0] + dy * dx * im[y1, x1])

        for b in range(2):
            cx, cy, s = box[b]
            for i in (0, 7, 29):
                for j in (0, 11, 47):
                    yf = (cy - s / 2 + (i + 0.5) / h_out * s) * 60 - 0.5
                    xf = (cx - s / 2 + (j + 0.5) / w_out * s) * 96 - 0.5
                    ref = sample(img[b], yf, xf)
                    np.testing.assert_allclose(out[b, i, j], ref, atol=1e-5)

    def test_jit_and_grad_safe(self):
        f = jax.jit(lambda im, b: crop_resize(im, b, (16, 24)).sum())
        im = jnp.ones((2, 32, 48, 3))
        b = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), (2, 3))
        assert np.isfinite(float(f(im, b)))
        g = jax.grad(lambda bb: f(im, bb))(b)
        assert np.isfinite(np.asarray(g)).all()


@pytest.fixture(scope="module")
def still_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("crop_dspeed")
    return create_synthetic_dataset(str(root), n_train=10, n_valid=6, n_test=6,
                                    img_size=(120, 192))


@pytest.fixture(scope="module")
def crop_dataset(still_dataset):
    return create_crop_dataset(still_dataset, img_size=(96, 128))


class TestCropDataset:
    def test_layout_and_labels(self, crop_dataset):
        with open(os.path.join(crop_dataset, "train", "pose.json")) as f:
            labels = json.load(f)
        assert len(labels) == 10
        for t in labels:
            assert len(t["crop"]) == 3
            cx, cy, s = t["crop"]
            assert 0.2 - 1e-6 <= s <= 1.0 and s / 2 - 1e-6 <= cx <= 1 - s / 2 + 1e-6

    def test_loader_passes_crop_through(self, crop_dataset):
        data, _ = load_dataset(crop_dataset, batch_size=4, img_size=(48, 64))
        b = next(iter(data["train"]))
        assert b["crop"].shape == (4, 3)
        assert b["images"].shape == (4, 48, 64, 3)

    def test_rendered_geometry_matches_mapped_labels(self, crop_dataset):
        """The bright wireframe pixels of a rendered crop must lie where the
        crop-mapped keypoint labels say the target is."""
        from PIL import Image

        with open(os.path.join(crop_dataset, "test", "pose.json")) as f:
            t = json.load(f)[0]
        img = np.asarray(Image.open(
            os.path.join(crop_dataset, "test", "images", t["filename"])))
        kp_util = KeyPoints.create(DSPEED_CAMERA)
        kp_full = kp_util.create_keypoints2d(
            jnp.asarray(t["q"], jnp.float32), jnp.asarray(t["t"], jnp.float32))
        local = np.asarray(map_keypoints_to_crop(
            kp_full, jnp.asarray(t["crop"], jnp.float32))).reshape(-1, 2)
        h, w = img.shape[:2]
        bright = img.max(-1) > 100
        ys, xs = np.nonzero(bright)
        assert len(xs) > 20  # target visible in the crop
        # Each in-frame keypoint is within a few pixels of a bright pixel.
        for x, y in local:
            if 0.02 < x < 0.98 and 0.02 < y < 0.98:
                d = np.sqrt((xs - x * w) ** 2 + (ys - y * h) ** 2).min()
                assert d < 6.0

    def test_trainer_crop_mode_runs_and_learns(self, crop_dataset):
        from spef_tpu.models.wrapper import import_model
        from spef_tpu.train.loss import SPELoss
        from spef_tpu.train.optimizer import import_optimizer
        from spef_tpu.train.step import create_train_state
        from spef_tpu.train.trainer import Trainer

        spe_utils = SPEUtils.create(
            DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints")
        model = import_model(
            backbone_name="small", head_name="keypoints_regression",
            img_size=(48, 64), ori_mode="keypoints", pos_mode="keypoints",
            n_keypoint_outputs=24)
        data, _ = load_dataset(crop_dataset, batch_size=4, img_size=(48, 64))
        tx, sched = import_optimizer(learning_rate=0.01)
        state = create_train_state(model, tx)
        trainer = Trainer(spe_utils, SPELoss("keypoints", "keypoints"))
        state, rec_loss, _, _ = trainer.fit(
            state, data, n_epochs=2, scheduler=sched,
            split=("train", "valid"), verbose=False)
        assert np.isfinite(rec_loss["train"]).all()
        assert rec_loss["train"][-1] <= rec_loss["train"][0]

    def test_trainer_rejects_crop_with_rot_augment(self, crop_dataset):
        from spef_tpu.models.wrapper import import_model
        from spef_tpu.train.loss import SPELoss
        from spef_tpu.train.optimizer import import_optimizer
        from spef_tpu.train.step import create_train_state
        from spef_tpu.train.trainer import Trainer

        spe_utils = SPEUtils.create(
            DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints")
        model = import_model(
            backbone_name="small", head_name="keypoints_regression",
            img_size=(48, 64), ori_mode="keypoints", pos_mode="keypoints",
            n_keypoint_outputs=24)
        data, _ = load_dataset(crop_dataset, batch_size=4, img_size=(48, 64))
        tx, sched = import_optimizer(learning_rate=0.01)
        state = create_train_state(model, tx)
        trainer = Trainer(spe_utils, SPELoss("keypoints", "keypoints"),
                          camera=DSPEED_CAMERA, rot_augment=True)
        with pytest.raises(ValueError, match="crop-refine"):
            trainer.fit(state, data, n_epochs=1, scheduler=sched,
                        split=("train", "valid"), verbose=False)


class TestEncodeTargetsCrop:
    def test_facade_and_trainer_agree(self):
        spe_utils = SPEUtils.create(
            DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints")
        key = jax.random.PRNGKey(4)
        ori = jax.random.normal(key, (3, 4))
        ori = ori / jnp.linalg.norm(ori, axis=-1, keepdims=True)
        pos = jnp.asarray([[0.5, -0.3, 12.0], [0.0, 0.2, 20.0], [1.0, 1.0, 30.0]])
        crop = jnp.asarray([[0.5, 0.5, 0.4]] * 3)
        t = spe_utils.encode_targets(ori, pos, crop=crop)
        full = spe_utils.keypoints.create_keypoints2d(ori, pos)
        np.testing.assert_allclose(
            np.asarray(t["keypoints"]),
            np.asarray(map_keypoints_to_crop(full, crop)), atol=1e-6)


def test_crop_refine_engine_contract(still_dataset):
    """SPECropRefine duck-types the standard engine contract: one jitted
    two-pass program, pose dict with unit quaternions + finite positions."""
    from spef_tpu.engine import SPECropRefine
    from spef_tpu.models.wrapper import import_model

    spe_utils = SPEUtils.create(
        DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints",
        keypoints_ransac=True)
    kw = dict(backbone_name="small", head_name="keypoints_regression",
              img_size=(48, 64), ori_mode="keypoints", pos_mode="keypoints",
              n_keypoint_outputs=24)
    coarse = import_model(seed=0, **kw)
    fine = import_model(seed=1, **kw)
    engine = SPECropRefine(coarse, fine, spe_utils)
    data, _ = load_dataset(still_dataset, batch_size=4, img_size=(48, 64))
    batch = next(iter(data["valid"]))
    pose, latency_ms = engine.predict(batch["images"])
    assert pose["ori"].shape == (4, 4) and pose["pos"].shape == (4, 3)
    assert pose["crop_box"].shape == (4, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pose["ori"]), axis=-1), 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(pose["pos"])).all()
    assert latency_ms > 0


def test_crop_cli_roundtrip(tmp_path):
    """The exact chip-queue pipeline for the crop-refine stage-2 model at toy
    scale: create_crop_dataset -> apps.train on a crop config ->
    experiments/crop_refine_eval.py two-pass eval.  Guards the R4G chip
    stages against CLI/config regressions before hours of chip training."""
    import importlib.util
    import json as _json

    from spef_tpu.apps import train as train_app

    still = create_synthetic_dataset(str(tmp_path / "dspeed"), n_train=10,
                                     n_valid=5, n_test=5, img_size=(48, 64))
    crop = create_crop_dataset(still, img_size=(48, 64))
    out = tmp_path / "out"
    for name, data in (("exp_coarse_toy", still), ("exp_fine_toy", crop)):
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
        cfg_path = tmp_path / f"{name}.yaml"
        cfg_path.write_text(cfg)
        train_app.main(["--config", str(cfg_path), "--out", str(out)])
        assert (out / name / "model" / "parameters.msgpack").is_file()

    spec = importlib.util.spec_from_file_location(
        "crop_refine_eval",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "experiments", "crop_refine_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_json = tmp_path / "crop_refine.json"
    mod.main(["--coarse", str(out / "exp_coarse_toy"),
              "--fine", str(out / "exp_fine_toy"),
              "--data", still, "--split", "test", "--limit", "5",
              "--batch", "5", "--out", str(out_json)])
    rec = _json.load(open(out_json))
    for tag in ("coarse_ransac", "two_pass_ransac", "oracle_ransac"):
        assert np.isfinite(rec["results"][tag]["esa_score"])
    assert rec["frames"] == 5

    # The eval drops a pointer file that registers the two-pass variant in
    # the engine registry (GUI dropdown parity, reference gui.py:470-474).
    from spef_tpu.config.train_config import load_config
    from spef_tpu.engine import build_engine_variant, discover_engine_variants
    from spef_tpu.models.wrapper import import_model

    coarse_dir = str(out / "exp_coarse_toy")
    assert "crop-refine" in discover_engine_variants(coarse_dir)
    cfg = load_config(os.path.join(coarse_dir, "config.yaml"))
    spe_utils = SPEUtils.create(DSPEED_CAMERA, ori_mode="keypoints",
                                pos_mode="keypoints")
    model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME, head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(coarse_dir, "model", "parameters.msgpack"),
        residual=cfg.MODEL.BACKBONE.RESIDUAL, quantization=cfg.MODEL.QUANTIZATION,
        ori_mode="keypoints", pos_mode="keypoints")
    engine = build_engine_variant(coarse_dir, model, spe_utils, "crop-refine")
    pose, _ = engine.predict(np.zeros((2, 48, 64, 3), np.uint8))
    assert pose["ori"].shape == (2, 4) and pose["pos"].shape == (2, 3)

    # Weight-only two-pass variant (both pass models' kernels on int8
    # grids, quant/weight_only.py) — registered alongside and buildable
    # without mutating the caller's float model.
    assert "crop-refine-w8" in discover_engine_variants(coarse_dir)
    float_params_before = jax.tree_util.tree_leaves(model.variables["params"])[0]
    engine_w8 = build_engine_variant(coarse_dir, model, spe_utils, "crop-refine-w8")
    pose_w8, _ = engine_w8.predict(np.zeros((2, 48, 64, 3), np.uint8))
    assert pose_w8["ori"].shape == (2, 4)
    np.testing.assert_array_equal(
        np.asarray(float_params_before),
        np.asarray(jax.tree_util.tree_leaves(model.variables["params"])[0]))


class TestCropRefinePipeline:
    def test_two_pass_contract(self):
        # Synthetic "models": coarse returns fixed logits; fine echoes a
        # constant pattern.  Verifies shapes, box validity, back-mapping.
        k = 12

        def coarse_fn(images):
            b = images.shape[0]
            return jnp.zeros((b, 2 * k)) + jax.scipy.special.logit(0.45)

        def fine_fn(images):
            b = images.shape[0]
            return jnp.zeros((b, 2 * k)) + jax.scipy.special.logit(0.5)

        pipe = CropRefinePipeline(coarse_fn, fine_fn, crop_hw=(24, 32))
        out = jax.jit(lambda im: pipe(im))(jnp.ones((2, 48, 64, 3)))
        assert out["keypoints"].shape == (2, 2 * k)
        box = np.asarray(out["crop_box"])
        assert (box[:, 2] >= 0.2 - 1e-6).all()
        # fine prediction 0.5 in crop coords == the crop center in full frame
        kp = np.asarray(out["keypoints"]).reshape(2, k, 2)
        np.testing.assert_allclose(kp[:, :, 0], np.broadcast_to(box[:, :1], (2, k)), atol=1e-5)
        np.testing.assert_allclose(kp[:, :, 1], np.broadcast_to(box[:, 1:2], (2, k)), atol=1e-5)


class TestGateKeypoints:
    def test_gate_selects_per_keypoint(self):
        from spef_tpu.codec.crop import gate_keypoints

        k = 4
        coarse = jnp.full((2, 2 * k), 0.5)
        fine = coarse.at[:, :2].add(0.1)     # keypoint 0 disagrees by 0.1
        fine = fine.at[:, 2:4].add(0.005)    # keypoint 1 agrees within tau
        gated, keep = jax.jit(lambda f, c: gate_keypoints(f, c, 0.02))(fine, coarse)
        keep = np.asarray(keep)
        assert keep.shape == (2, k)
        assert not keep[:, 0].any() and keep[:, 1:].all()
        g = np.asarray(gated).reshape(2, k, 2)
        np.testing.assert_allclose(g[:, 0], 0.5, atol=1e-6)        # fell back
        np.testing.assert_allclose(g[:, 1], 0.505, atol=1e-6)      # kept fine

    def test_pipeline_gate_falls_back_on_wild_fine(self):
        # A fine model that predicts garbage everywhere must be fully
        # overridden by the gate: pipeline output == coarse keypoints.
        from spef_tpu.codec.crop import CropRefinePipeline

        k = 12

        def coarse_fn(images):
            b = images.shape[0]
            return jnp.zeros((b, 2 * k)) + jax.scipy.special.logit(0.45)

        def fine_fn(images):
            b = images.shape[0]
            return jnp.zeros((b, 2 * k)) + jax.scipy.special.logit(0.95)

        pipe = CropRefinePipeline(coarse_fn, fine_fn, crop_hw=(24, 32), gate=0.02)
        out = jax.jit(lambda im: pipe(im))(jnp.ones((2, 48, 64, 3)))
        assert not np.asarray(out["gate_keep"]).any()
        np.testing.assert_allclose(np.asarray(out["keypoints"]),
                                   np.asarray(out["keypoints_coarse"]), atol=1e-6)
        # ungated fine prediction still exposed for diagnostics
        assert float(jnp.abs(out["keypoints_fine"] - out["keypoints"]).max()) > 0.01
