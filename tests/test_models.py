"""Model construction / forward-shape tests (flax MobileNetV2 + heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.models.wrapper import import_model, load_model_params, save_model


def n_params(variables):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))


class TestSmallModels:
    def test_small_backbone_forward(self):
        model = import_model(
            backbone_name="small", head_name="ursonet", img_size=(64, 64),
            ori_mode="regression", pos_mode="regression",
        )
        out = model.apply(jnp.zeros((2, 64, 64, 3)))
        assert out[0].shape == (2, 4) and out[1].shape == (2, 3)

    def test_small_mobile_classification_head(self):
        model = import_model(
            backbone_name="small_mobile", head_name="ursonet", img_size=(64, 96),
            ori_mode="classification", n_ori_bins=1356,
            pos_mode="classification", n_pos_bins=1000,
        )
        out = model.apply(jnp.zeros((2, 64, 96, 3)))
        assert out[0].shape == (2, 1356) and out[1].shape == (2, 1000)

    def test_keypoints_head(self):
        model = import_model(
            backbone_name="small", head_name="keypoints_regression", img_size=(64, 64),
            ori_mode="keypoints", pos_mode="keypoints", n_keypoint_outputs=24,
        )
        out = model.apply(jnp.zeros((2, 64, 64, 3)))
        assert out.shape == (2, 24)


class TestMobileNetV2:
    def test_backbone_param_count_matches_reference_arch(self):
        """MobileNetV2 @1280 with the reference (t,c,n,s) table ~= 2.22M params
        (torchvision mobilenet_v2 features), plus the URSONet head."""
        model = import_model(
            backbone_name="mobilenet_v2", head_name="ursonet", img_size=(96, 96),
            ori_mode="regression", pos_mode="regression",
        )
        total = n_params(model.variables)
        head = 1281 * 4 + 1281 * 3  # two dense branches incl. bias
        backbone = total - head
        assert 2.15e6 < backbone < 2.30e6, f"backbone params {backbone}"

    def test_forward_shapes_240x384(self):
        model = import_model(
            backbone_name="mobilenet_v2", head_name="ursonet", img_size=(240, 384),
            ori_mode="classification", n_ori_bins=1356, pos_mode="regression",
        )
        out = model.apply(jnp.zeros((1, 240, 384, 3)))
        assert out[0].shape == (1, 1356) and out[1].shape == (1, 3)

    def test_train_mode_updates_batch_stats(self):
        model = import_model(
            backbone_name="small", head_name="ursonet", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression",
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        (out, new_state) = model.module.apply(
            model.variables, x, True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        old = jax.tree_util.tree_leaves(model.variables["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        model = import_model(
            backbone_name="small", head_name="ursonet", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression",
        )
        save_model(str(tmp_path), model)
        model2 = import_model(
            backbone_name="small", head_name="ursonet", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression", seed=7,
        )
        loaded = load_model_params(str(tmp_path / "parameters.msgpack"), model2.variables)
        for a, b in zip(
            jax.tree_util.tree_leaves(model.variables), jax.tree_util.tree_leaves(loaded)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_reference_name_aliases(self):
        model = import_model(
            backbone_name="mobilenet_v2_pytorch", head_name="ursonet_pytorch",
            img_size=(32, 32), ori_mode="regression", pos_mode="regression",
        )
        assert model.backbone_name == "mobilenet_v2"
        assert model.head_name == "ursonet"
