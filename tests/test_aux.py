"""Tests for auxiliary subsystems: checkpoint/resume, stats, visualization,
bit-width sweep generator, D-SPEED scenario kinematics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.models.wrapper import import_model
from spef_tpu.train.optimizer import import_optimizer
from spef_tpu.train.step import create_train_state


class TestCheckpointResume:
    def test_save_restore_roundtrip(self, tmp_path):
        from spef_tpu.train.checkpoint import CheckpointManager

        model = import_model(backbone_name="small", head_name="ursonet", img_size=(24, 24),
                             ori_mode="regression", pos_mode="regression")
        tx, _ = import_optimizer(learning_rate=0.01)
        state = create_train_state(model, tx)

        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(3, state, meta={"epoch": 3, "best_loss": 0.5})
        assert mngr.latest_epoch() == 3

        model2 = import_model(backbone_name="small", head_name="ursonet", img_size=(24, 24),
                              ori_mode="regression", pos_mode="regression", seed=99)
        state2 = create_train_state(model2, tx)
        restored, meta = mngr.restore(state2)
        assert meta["best_loss"] == 0.5
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestStats:
    def test_summary_macs_match_manual(self):
        from spef_tpu.utils.stats import detailed_model_summary

        model = import_model(backbone_name="small", head_name="ursonet", img_size=(32, 32),
                             ori_mode="regression", pos_mode="regression")
        rows = detailed_model_summary(model, (32, 32))
        conv_rows = [r for r in rows if r["type"] == "Conv2D"]
        assert all(r["macs"] > 0 for r in conv_rows), conv_rows
        # conv0: 3x3x3x16 kernel, 16x16 output -> 3*3*3*16*16*16 MACs
        stem = next(r for r in conv_rows if "conv0" in r["name"])
        assert stem["macs"] == 3 * 3 * 3 * 16 * 16 * 16


class TestVisualize:
    def test_overlays_draw(self):
        from spef_tpu.codec.facade import SPEUtils
        from spef_tpu.data.camera import DSPEED_CAMERA
        from spef_tpu.utils.visualize import VisualizePose

        spe = SPEUtils.create(DSPEED_CAMERA, use_keypoints=True)
        viz = VisualizePose(spe)
        img = np.zeros((120, 192, 3), np.uint8)
        pose = {"ori": np.array([1.0, 0, 0, 0]), "pos": np.array([0.0, 0.0, 10.0])}
        kp = spe.keypoints.create_keypoints2d(jnp.asarray(pose["ori"]), jnp.asarray(pose["pos"]))
        pose["keypoints"] = np.asarray(kp)
        pose["bbox"] = np.asarray(spe.keypoints.create_bbox_from_keypoints(kp))
        out = viz.add_visualization(
            image=img, true_pose=pose, show_true_pose=True,
            show_true_keypoints=True, show_true_bbox=True,
        )
        assert out.sum() > 0  # something was drawn
        assert img.sum() == 0  # input not mutated


class TestBitWidthSweep:
    def test_sweep_shapes(self):
        from spef_tpu.apps.generate_bitwidth_experiments import build_sweep

        sweeps = build_sweep(17)
        assert len(sweeps) > 100
        for bw in sweeps:
            assert len(bw["inverted_residual"]) == 17
            assert set(bw) >= {"image", "first_conv", "last_conv", "shared_act"}


class TestDspeedScenarios:
    def test_sequence_camera_movement_consistency(self):
        """Camera-moves kinematics: a pure camera yaw keeps the target's
        distance constant while relative position rotates."""
        from spef_tpu.apps.create_dspeed import generate_sequence
        from spef_tpu.data.camera import DSPEED_CAMERA

        init = {"ori": np.array([0.0, -0.7071, 0.7071, 0.0]), "pos": np.array([0.0, 0.0, 15.0])}
        evo = {"ori": np.array([0.24, 0.0, 0.0]), "pos": np.zeros(3)}
        oris, poss = generate_sequence(100, init, evo, DSPEED_CAMERA, camera_movement=True)
        dist = np.linalg.norm(poss, axis=-1)
        np.testing.assert_allclose(dist, dist[0], rtol=1e-6)
        # Orientation actually changes.
        assert abs(np.dot(oris[0], oris[-1])) < 0.999

    def test_target_translation(self):
        from spef_tpu.apps.create_dspeed import generate_sequence
        from spef_tpu.data.camera import DSPEED_CAMERA

        init = {"ori": np.array([0.0, -0.7071, 0.7071, 0.0]), "pos": np.array([-7.0, -4.5, 30.0])}
        evo = {"ori": np.zeros(3), "pos": np.array([3 * 0.0016, 2 * 0.0016, -4 * 0.004])}
        oris, poss = generate_sequence(50, init, evo, DSPEED_CAMERA)
        np.testing.assert_allclose(poss[-1] - poss[0], np.asarray(evo["pos"]) * 50, atol=1e-9)
        # The truncated initial quaternion [0,-0.7071,0.7071,0] is renormalized
        # on the first multiply (as in the reference) -> ~7e-6 shift.
        np.testing.assert_allclose(oris[0], oris[-1], atol=1e-5)

    def test_acceleration_phases(self):
        from spef_tpu.apps.create_dspeed import generate_sequence
        from spef_tpu.data.camera import DSPEED_CAMERA

        init = {"ori": np.array([0.0, -0.7071, 0.7071, 0.0]), "pos": np.array([0.0, 0.0, 15.0])}
        evo = {"ori": np.zeros(3), "pos": np.zeros(3),
               "ori_acceleration": [(0, 10, 20, 0.01), (0, 30, 50, -0.005)]}
        oris, poss = generate_sequence(60, init, evo, DSPEED_CAMERA)
        # Velocity returns to zero after the symmetric decel phase: the
        # orientation stops changing at the end.
        d_end = abs(np.dot(oris[-1], oris[-2]))
        assert d_end > 1 - 1e-9
