"""End-to-end keypoints-mode pipeline test: train a keypoint regressor on
synthetic data and decode poses through the batched EPnP path (the
reference's BASELINE config 1: backbone -> keypoints -> EPnP pose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.data.camera import DSPEED_CAMERA
from spef_tpu.data.dataset import load_dataset
from spef_tpu.data.synthetic import create_synthetic_dataset
from spef_tpu.engine import SPEJax
from spef_tpu.models.wrapper import import_model
from spef_tpu.train.loss import SPELoss
from spef_tpu.train.optimizer import import_optimizer
from spef_tpu.train.step import create_train_state
from spef_tpu.train.trainer import Trainer, evaluation


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kp_dspeed")
    return create_synthetic_dataset(str(root), n_train=16, n_valid=8, n_test=8,
                                    img_size=(120, 192))


def test_keypoints_train_and_epnp_eval(dataset):
    spe_utils = SPEUtils.create(
        DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints", use_keypoints=True,
    )
    model = import_model(
        backbone_name="small", head_name="keypoints_regression", img_size=(48, 64),
        ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24,
    )
    data, split = load_dataset(dataset, batch_size=8, img_size=(48, 64))

    tx, sched = import_optimizer(learning_rate=0.01)
    state = create_train_state(model, tx)
    loss = SPELoss("keypoints", "keypoints")
    trainer = Trainer(spe_utils, loss)
    state, rec_loss, _, _ = trainer.fit(
        state, data, n_epochs=2, scheduler=sched, split=("train", "valid"), verbose=False
    )
    assert rec_loss["train"][-1] <= rec_loss["train"][0]

    # Engine path: sigmoid -> normalized keypoints -> batched EPnP -> pose.
    model.variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = SPEJax(model, spe_utils)
    batch = next(iter(data["valid"]))
    pose, latency = engine.predict(batch["images"])
    assert pose["ori"].shape == (8, 4)
    assert pose["pos"].shape == (8, 3)
    # Quaternions unit, positions finite (untrained net: accuracy not asserted).
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pose["ori"]), axis=-1), 1.0, atol=1e-4
    )
    assert np.isfinite(np.asarray(pose["pos"])).all()

    # Full evaluation loop works in keypoints mode (scores computed from the
    # EPnP-decoded poses).
    rec_score, rec_error = evaluation(engine, data, spe_utils, split=("valid",))
    assert np.isfinite(rec_score["valid"]["esa"][0])


class TestHeatmapHead:
    def test_heatmap_head_contract(self):
        """Integral head emits logit-coordinates: the pipeline's standard
        sigmoid reconstructs normalized coords in (0, 1), shaped like the
        regression head's output."""
        import jax.numpy as jnp
        from spef_tpu.models.wrapper import import_model

        model = import_model(
            backbone_name="small", head_name="keypoints_heatmap", img_size=(48, 64),
            ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24, seed=3,
        )
        imgs = jnp.zeros((2, 48, 64, 3), jnp.float32)
        out = model.module.apply(model.variables, imgs, False)
        assert out.shape == (2, 24)
        coords = np.asarray(jax.nn.sigmoid(out))
        assert ((coords > 0.0) & (coords < 1.0)).all()
        assert np.isfinite(np.asarray(out)).all()

    def test_heatmap_head_trains_and_localizes(self, dataset):
        """Few-step training on the synthetic set reduces the keypoint loss
        and the full EPnP decode path stays finite (same e2e contract as
        the regression head)."""
        spe_utils = SPEUtils.create(
            DSPEED_CAMERA, ori_mode="keypoints", pos_mode="keypoints",
            use_keypoints=True,
        )
        model = import_model(
            backbone_name="small", head_name="keypoints_heatmap", img_size=(48, 64),
            ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24,
        )
        data, split = load_dataset(dataset, batch_size=8, img_size=(48, 64))
        tx, sched = import_optimizer(learning_rate=0.01)
        state = create_train_state(model, tx)
        loss = SPELoss("keypoints", "keypoints")
        trainer = Trainer(spe_utils, loss)
        state, rec_loss, _, _ = trainer.fit(
            state, data, n_epochs=2, scheduler=sched,
            split=("train", "valid"), verbose=False,
        )
        assert rec_loss["train"][-1] <= rec_loss["train"][0]

        model.variables = {"params": state.params, "batch_stats": state.batch_stats}
        engine = SPEJax(model, spe_utils)
        batch = next(iter(data["valid"]))
        pose, _ = engine.predict(batch["images"])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pose["ori"]), axis=-1), 1.0, atol=1e-4)
        assert np.isfinite(np.asarray(pose["pos"])).all()
