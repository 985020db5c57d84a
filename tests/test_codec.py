"""Tests for the soft-classification codecs and scoring facade.

Includes golden-parity checks against a local numpy re-derivation of the
reference math (`/root/reference/src/spe/classification_utils.py`) and
encode->decode round-trip accuracy characterization (the reference validates
this codec through `soft_class_plot.py` sweeps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.codec import OrientationSoftClassification, PositionSoftClassification, SPEUtils
from spef_tpu.data import SPEED_CAMERA
from spef_tpu.pose import rotations as rot


class TestOrientationCodec:
    def setup_method(self):
        self.codec = OrientationSoftClassification.create(12, 3, delete_unused_bins=True)

    def test_bin_count_after_deletion(self):
        # 12^3 = 1728 raw bins minus redundant boundary/gimbal duplicates.
        raw = 12**3
        removed = int(np.sum(np.asarray(self.codec.redundant_flags)))
        assert self.codec.n_bins == raw - removed
        assert 0 < removed < raw

    def test_histogram_quats_unit(self):
        h = np.asarray(self.codec.histogram)
        np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)

    def test_encode_is_normalized_pdf(self):
        q = rot.generate_orientation(jax.random.PRNGKey(0), 16)
        enc = np.asarray(self.codec.encode(q))
        assert enc.shape == (16, self.codec.n_bins)
        np.testing.assert_allclose(enc.sum(-1), 1.0, atol=1e-5)
        assert (enc >= 0).all()

    def test_encode_decode_roundtrip(self):
        q = rot.generate_orientation(jax.random.PRNGKey(1), 64)
        enc = self.codec.encode(q)
        dec, h_inv = self.codec.decode(enc)
        err = np.rad2deg(np.asarray(rot.quat_angle(q, dec)))
        # 12 bins/dim, smooth 3: the reference reports a few degrees of codec
        # quantization error; decode must stay well within one bin (30 deg).
        assert np.mean(err) < 10.0
        assert h_inv.shape == (64, 4, 4)

    def test_decode_matches_reference_eig_formulation(self):
        """Batched eigh decode == per-sample numpy eig decode (reference)."""
        q = rot.generate_orientation(jax.random.PRNGKey(2), 8)
        probs = np.asarray(self.codec.encode(q))
        hist = np.asarray(self.codec.histogram, dtype=np.float64)
        b = hist.reshape(-1, 4, 1) * hist.reshape(-1, 1, 4)
        ours, _ = self.codec.decode(jnp.asarray(probs))
        ours = np.asarray(ours)
        for i in range(probs.shape[0]):
            a = np.sum(b * probs[i].reshape(-1, 1, 1), axis=0)
            s, v = np.linalg.eig(a)
            q_ref = v[:, np.argsort(s)[-1]].real
            q_ref = q_ref / np.linalg.norm(q_ref)
            assert abs(float(np.dot(q_ref, ours[i]))) == pytest.approx(1.0, abs=1e-4)

    def test_single_sample_decode(self):
        q = rot.generate_orientation(jax.random.PRNGKey(3), 1)[0]
        enc = self.codec.encode(q)
        dec, h_inv = self.codec.decode(enc)
        assert dec.shape == (4,)
        assert h_inv.shape == (4, 4)

    def test_masking_mode_matches_deletion_mode(self):
        """Masked (keep-all-bins) and deleted modes decode to the same pose."""
        masked = OrientationSoftClassification.create(8, 3, delete_unused_bins=False)
        deleted = OrientationSoftClassification.create(8, 3, delete_unused_bins=True)
        q = rot.generate_orientation(jax.random.PRNGKey(4), 4)
        dec_m, _ = masked.decode(masked.encode(q))
        dec_d, _ = deleted.decode(deleted.encode(q))
        dots = np.abs(np.sum(np.asarray(dec_m) * np.asarray(dec_d), axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)


class TestPositionCodec:
    def setup_method(self):
        self.codec = PositionSoftClassification.create(10, 100)

    def test_bins(self):
        assert self.codec.n_bins == 1000
        h = np.asarray(self.codec.histogram)
        np.testing.assert_allclose(h.min(0), [-16, -12, -2])
        np.testing.assert_allclose(h.max(0), [16, 12, 40])

    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(0)
        pos = np.stack(
            [rng.uniform(-8, 8, 64), rng.uniform(-6, 6, 64), rng.uniform(3, 30, 64)], axis=-1
        ).astype(np.float32)
        enc = self.codec.encode(jnp.asarray(pos))
        dec = np.asarray(self.codec.decode(enc))
        # smooth=100 over 10 bins is a broad kernel: decode pulls toward the
        # grid center. A finer grid with ~1-bin kernel width round-trips well.
        tight = PositionSoftClassification.create(16, 110)
        enc_t = tight.encode(jnp.asarray(pos))
        dec_t = np.asarray(tight.decode(enc_t))
        assert np.mean(np.linalg.norm(dec_t - pos, axis=-1)) < 1.5
        assert enc.shape == (64, 1000) and dec.shape == (64, 3)

    def test_encode_matches_reference_numpy(self):
        """Golden parity vs the reference's numpy kernel formula."""
        pos = np.array([1.0, -2.0, 20.0], np.float32)
        hist = np.asarray(self.codec.histogram, np.float64)
        variance = (100 / 10) ** 2 / 12
        kernel = np.exp(-np.sum((pos - hist) ** 2, axis=1) / (2 * variance))
        expected = kernel / kernel.sum()
        got = np.asarray(self.codec.encode(jnp.asarray(pos)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestScore:
    def test_perfect_prediction_scores_zero(self):
        q = np.asarray(rot.generate_orientation(jax.random.PRNGKey(5), 4))
        pos = np.random.RandomState(1).uniform(1, 10, (4, 3))
        m = SPEUtils.get_score({"ori": q, "pos": pos}, {"ori": q, "pos": pos})
        assert m["esa_score"] == pytest.approx(0.0, abs=1e-3)

    def test_sign_flip_is_same_rotation(self):
        q = np.asarray(rot.generate_orientation(jax.random.PRNGKey(6), 4))
        pos = np.ones((4, 3))
        m = SPEUtils.get_score({"ori": q, "pos": pos}, {"ori": -q, "pos": pos})
        assert m["esa_score"] == pytest.approx(0.0, abs=1e-3)

    def test_known_errors(self):
        # 90 deg yaw error, 1 m position error at range sqrt(3).
        q_true = np.array([[1.0, 0, 0, 0]])
        q_pred = np.asarray(rot.euler2quat(jnp.asarray([[90.0, 0.0, 0.0]])))
        pos_true = np.array([[1.0, 1.0, 1.0]])
        pos_pred = np.array([[1.0, 1.0, 2.0]])
        m = SPEUtils.get_score({"ori": q_true, "pos": pos_true}, {"ori": q_pred, "pos": pos_pred})
        assert m["ori_error"] == pytest.approx(90.0, abs=1e-3)
        assert m["pos_error"] == pytest.approx(1.0, abs=1e-5)
        assert m["pos_score"] == pytest.approx(1 / np.sqrt(3), abs=1e-5)
        assert m["esa_score"] == pytest.approx(np.pi / 2 + 1 / np.sqrt(3), abs=1e-4)

    def test_invalid_prediction_raises(self):
        q_true = np.array([[2.0, 0, 0, 0]])  # deliberately non-unit
        q_pred = np.array([[2.0, 0, 0, 0]])
        pos = np.ones((1, 3))
        with pytest.raises(ValueError):
            SPEUtils.get_score({"ori": q_true, "pos": pos}, {"ori": q_pred, "pos": pos})


class TestFacade:
    def test_classification_pipeline(self):
        spe = SPEUtils.create(
            SPEED_CAMERA, ori_mode="classification", pos_mode="classification", use_keypoints=False
        )
        b = 4
        raw = {
            "ori_soft": jnp.asarray(np.random.RandomState(0).randn(b, spe.orientation.n_bins)),
            "pos_soft": jnp.asarray(np.random.RandomState(1).randn(b, spe.position.n_bins)),
        }
        pose = spe.last_activ(raw)
        np.testing.assert_allclose(np.asarray(pose["ori_soft"]).sum(-1), 1.0, atol=1e-5)
        pose = spe.decode(pose)
        assert pose["ori"].shape == (b, 4)
        assert pose["pos"].shape == (b, 3)

    def test_regression_last_activ(self):
        spe = SPEUtils.create(SPEED_CAMERA, use_keypoints=False)
        pose = spe.last_activ({"ori": jnp.ones((2, 4)), "pos": jnp.ones((2, 3))})
        np.testing.assert_allclose(np.linalg.norm(np.asarray(pose["ori"]), axis=-1), 1.0, atol=1e-6)

    def test_encode_targets_classification(self):
        spe = SPEUtils.create(
            SPEED_CAMERA, ori_mode="classification", pos_mode="classification", use_keypoints=True
        )
        q = rot.generate_orientation(jax.random.PRNGKey(7), 3)
        pos = jnp.asarray([[0.0, 0.0, 10.0]] * 3)
        t = spe.encode_targets(q, pos)
        assert t["ori_soft"].shape == (3, spe.orientation.n_bins)
        assert t["pos_soft"].shape == (3, spe.position.n_bins)
        assert t["keypoints"].shape == (3, 24)
        assert t["bbox"].shape == (3, 4)
