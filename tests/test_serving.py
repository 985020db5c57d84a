"""Tests for the serving runtime on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.data.camera import SPEED_CAMERA
from spef_tpu.engine import build_predict_fn
from spef_tpu.models.wrapper import import_model
from spef_tpu.serving import PoseServer, serve_stream


@pytest.fixture(scope="module")
def predict_fn():
    spe = SPEUtils.create(SPEED_CAMERA, ori_mode="classification", n_ori_bins_per_dim=4,
                          pos_mode="regression", use_keypoints=False)
    model = import_model(
        backbone_name="small", head_name="ursonet", img_size=(32, 32),
        ori_mode="classification", n_ori_bins=spe.orientation.n_bins, pos_mode="regression",
    )
    return build_predict_fn(model, spe)


def test_server_sharded_over_mesh(predict_fn):
    assert len(jax.devices()) == 8  # conftest mesh
    server = PoseServer(predict_fn, img_shape=(32, 32, 3), max_batch=16)
    compile_s = server.warmup()
    assert compile_s > 0

    images = np.random.RandomState(0).randint(0, 256, (10, 32, 32, 3), np.uint8)
    out, latency = server.predict(images)
    assert out["ori"].shape == (10, 4)
    assert out["pos"].shape == (10, 3)
    assert latency > 0
    stats = server.stats()
    assert stats["devices"] == 8
    assert stats["requests"] == 1

    # Mesh-sharded predictions must equal the unsharded program's
    # (VERDICT r2 #8): padding to max_batch + batch-sharding over 8
    # devices is physical layout only.
    direct = jax.jit(predict_fn)(jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(out["ori"]),
                               np.asarray(direct["ori"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pos"]),
                               np.asarray(direct["pos"]), rtol=1e-4, atol=1e-4)


def test_server_rejects_oversize(predict_fn):
    server = PoseServer(predict_fn, img_shape=(32, 32, 3), max_batch=8)
    with pytest.raises(AssertionError):
        server.predict(np.zeros((9, 32, 32, 3), np.uint8))


def test_serve_stream_order_and_count(predict_fn):
    batches = [
        np.random.RandomState(i).randint(0, 256, (8, 32, 32, 3), np.uint8) for i in range(5)
    ]
    outs = list(serve_stream(predict_fn, batches, depth=2))
    assert len(outs) == 5
    # Results must correspond to inputs in order.
    direct = jax.jit(predict_fn)(jnp.asarray(batches[3]))
    np.testing.assert_allclose(
        np.asarray(outs[3]["ori"]), np.asarray(direct["ori"]), rtol=1e-5, atol=1e-5
    )


def test_server_keypoints_mode():
    """PoseServer serves a keypoints-mode model: the EPnP decode (batched,
    f32-precision matmuls) runs inside the served program and yields unit
    quaternions + finite positions for padded partial batches."""
    from spef_tpu.data.camera import DSPEED_CAMERA

    spe = SPEUtils.create(DSPEED_CAMERA, ori_mode="keypoints",
                          pos_mode="keypoints", use_keypoints=True)
    model = import_model(
        backbone_name="small", head_name="keypoints_regression", img_size=(32, 32),
        ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24,
    )
    fn = build_predict_fn(model, spe)
    server = PoseServer(fn, img_shape=(32, 32, 3), max_batch=16)
    images = np.random.RandomState(3).randint(0, 256, (5, 32, 32, 3), np.uint8)
    out, _ = server.predict(images)
    assert out["ori"].shape == (5, 4)
    assert out["pos"].shape == (5, 3)
    np.testing.assert_allclose(np.linalg.norm(out["ori"], axis=-1), 1.0, atol=1e-4)
    assert np.isfinite(out["pos"]).all()
