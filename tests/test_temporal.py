"""Tests for temporal filtering: PDF filter golden behavior, scan-vs-streaming
equivalence, quaternion continuity, alternative filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.temporal import filters
from spef_tpu.temporal.inference import quaternion_continuity_scan
from spef_tpu.temporal.pdf_filter import TemporalPDF, compute_distance, scan_filter


def random_pdfs(t=20, n=50, seed=0):
    rng = np.random.RandomState(seed)
    p = rng.rand(t, n).astype(np.float32) + 0.01
    return p / p.sum(-1, keepdims=True)


class TestTemporalPDF:
    def test_first_frame_passthrough(self):
        f = TemporalPDF(n=0.8, alpha=16.49)
        pdf = random_pdfs(1)[0]
        out, dist = f.update_pdf(pdf)
        np.testing.assert_allclose(np.asarray(out), pdf, atol=1e-6)
        assert dist == 0.0

    def test_reference_update_formula(self):
        """Golden parity with the reference numpy formula (`pdf_compare.py:94-133`)."""
        f = TemporalPDF(n=0.8, alpha=16.49, distance_metric="l2")
        pdfs = random_pdfs(3, seed=1)
        f.update_pdf(pdfs[0])
        out, dist = f.update_pdf(pdfs[1])

        prev = pdfs[0]
        cur = pdfs[1]
        d_ref = np.linalg.norm(cur - prev)
        w = np.clip(np.exp(-16.49 * d_ref), 0, 1)
        expected = w * 0.8 * cur + (1 - w) * prev
        expected = expected / expected.sum()
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
        assert dist == pytest.approx(d_ref, abs=1e-5)

    @pytest.mark.parametrize("metric", ["l2", "kl", "js", "hellinger", "tv", "wasserstein"])
    def test_all_distance_metrics(self, metric):
        p = random_pdfs(2, seed=2)
        d = float(compute_distance(jnp.asarray(p[0]), jnp.asarray(p[1]), metric))
        assert d > 0
        d_self = float(compute_distance(jnp.asarray(p[0]), jnp.asarray(p[0]), metric))
        assert d_self == pytest.approx(0.0, abs=1e-5)

    def test_scan_matches_streaming(self):
        """lax.scan whole-sequence filter == frame-at-a-time streaming filter."""
        pdfs = random_pdfs(30, seed=3)
        filt_scan, dist_scan = scan_filter(jnp.asarray(pdfs), 0.8, 16.49, "l2")

        f = TemporalPDF(n=0.8, alpha=16.49, distance_metric="l2")
        stream_out = []
        stream_dist = []
        for t in range(pdfs.shape[0]):
            out, d = f.update_pdf(pdfs[t])
            stream_out.append(np.asarray(out))
            stream_dist.append(d)

        np.testing.assert_allclose(np.asarray(filt_scan), np.stack(stream_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dist_scan), np.asarray(stream_dist), atol=1e-5)

    def test_filter_reduces_jitter(self):
        """Filtered trajectory varies less frame-to-frame than the input."""
        base = random_pdfs(1, 50, seed=4)[0]
        rng = np.random.RandomState(5)
        seq = np.stack([base + rng.rand(50) * 0.01 for _ in range(40)])
        seq = (seq / seq.sum(-1, keepdims=True)).astype(np.float32)
        filt, _ = scan_filter(jnp.asarray(seq), 0.5, 48.64, "l2")
        tv_in = np.abs(np.diff(seq, axis=0)).sum()
        tv_out = np.abs(np.diff(np.asarray(filt), axis=0)).sum()
        assert tv_out < tv_in


class TestQuaternionContinuity:
    def test_sign_flips_fixed(self):
        q = np.array([[1, 0, 0, 0], [-0.99, -0.1, 0, 0], [0.98, 0.15, 0, 0]], np.float32)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        fixed = np.asarray(quaternion_continuity_scan(jnp.asarray(q)))
        # Consecutive dots must all be positive after fixing.
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots > 0).all()

    def test_outlier_gate_keeps_pole(self):
        """An orthogonal outlier (|dot|<0.5) must not flip the pole for
        subsequent frames (reference `inference.py:140-142`)."""
        q_a = np.array([1, 0, 0, 0], np.float32)
        outlier = np.array([0, 1, 0, 0], np.float32)  # 180 deg away, dot=0
        q_c = np.array([-0.99, 0.1, 0, 0], np.float32)
        q_c /= np.linalg.norm(q_c)
        seq = jnp.asarray(np.stack([q_a, outlier, q_c]))
        fixed = np.asarray(quaternion_continuity_scan(seq))
        # Third frame is compared against q_a (outlier did not update the
        # pole), so dot(q_a, q_c) < 0 -> flipped to +w hemisphere.
        assert fixed[2][0] > 0


class TestAlternativeFilters:
    def test_fir_converges_to_constant(self):
        f = filters.FIRFilter(numtaps=9, cutoff=0.2, dim=3)
        x = np.array([1.0, 2.0, 3.0])
        out = x
        for _ in range(30):
            out = f.update(x)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_rc_filter_smooths(self):
        f = filters.RCFilter(alpha=0.5)
        f.update(np.zeros(3))
        out = f.update(np.ones(3))
        np.testing.assert_allclose(out, 0.5 * np.ones(3))

    def test_quaternion_kalman_handles_sign_flip(self):
        f = filters.QuaternionKalmanFilter()
        q = np.array([1.0, 0, 0, 0])
        f.update(q)
        out = f.update(-q)  # same rotation, flipped sign
        assert out[0] > 0.9  # stays in the original hemisphere

    def test_position_kalman_tracks_constant_velocity(self):
        f = filters.KalmanFilterPosSimple(dt=1.0)
        est = None
        for t in range(50):
            est = f.update(np.array([0.0, 0.0, 10.0 + 0.1 * t]))
        assert abs(est[2] - (10.0 + 0.1 * 49)) < 0.2

    def test_moving_averages(self):
        ma = filters.MovingAverage(window=2)
        ma.update(np.zeros(2))
        np.testing.assert_allclose(ma.update(np.ones(2)), [0.5, 0.5])
        ema = filters.ExponentialMovingAverage(alpha=0.25)
        ema.update(np.zeros(2))
        np.testing.assert_allclose(ema.update(np.ones(2)), [0.25, 0.25])


class TestMultiSequence:
    def test_matches_per_sequence(self):
        """vmapped multi-sequence inference == per-sequence sequence_inference."""
        import jax

        from spef_tpu.codec.facade import SPEUtils
        from spef_tpu.data.camera import SPEED_CAMERA
        from spef_tpu.models.wrapper import import_model
        from spef_tpu.temporal.inference import multi_sequence_inference, sequence_inference

        spe = SPEUtils.create(SPEED_CAMERA, ori_mode="classification", n_ori_bins_per_dim=4,
                              pos_mode="classification", n_pos_bins_per_dim=4,
                              use_keypoints=False)
        model = import_model(
            backbone_name="small", head_name="ursonet", img_size=(32, 32),
            ori_mode="classification", n_ori_bins=spe.orientation.n_bins,
            pos_mode="classification", n_pos_bins=spe.position.n_bins,
        )

        def forward_fn(images):
            return model.apply(images, False)

        rng = np.random.RandomState(0)
        seqs = rng.randint(0, 256, (3, 12, 32, 32, 3), np.uint8)
        multi = multi_sequence_inference(spe, forward_fn, jnp.asarray(seqs), frame_batch=8)
        for i in range(3):
            single = sequence_inference(spe, forward_fn, jnp.asarray(seqs[i]), frame_batch=8)
            # bf16 forward accumulates in different chunk groupings between
            # the two paths -> ~1e-4 level differences are expected.
            np.testing.assert_allclose(np.asarray(multi["ori_video"][i]),
                                       np.asarray(single["ori_video"]), atol=2e-3)
            np.testing.assert_allclose(np.asarray(multi["pos_still"][i]),
                                       np.asarray(single["pos_still"]), atol=2e-3)
            np.testing.assert_allclose(np.asarray(multi["ori_distance"][i]),
                                       np.asarray(single["ori_distance"]), atol=1e-4)


class TestTuneTemporalHarness:
    """The tuning harness (experiments/tune_temporal.py) must apply exactly
    the production filter: traced-(n, alpha) emit == scan_filter @ proj."""

    def test_filter_emit_matches_scan_filter(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "tune_temporal",
            os.path.join(os.path.dirname(__file__), "..", "experiments", "tune_temporal.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        pdfs = jnp.asarray(random_pdfs(t=30, n=40, seed=3))
        proj = jnp.asarray(np.random.RandomState(4).randn(40, 5).astype(np.float32))
        for metric in ("l2", "js", "hellinger", "tv"):
            want, _ = scan_filter(pdfs, 0.7, 23.0, metric)
            got = mod._filter_emit(pdfs, jnp.float32(0.7), jnp.float32(23.0), metric, proj)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want @ proj),
                                       rtol=1e-5, atol=1e-6)

    def test_identity_config_is_unfiltered(self):
        """alpha=0, n=1 must reproduce the per-frame (still) trajectory."""
        pdfs = jnp.asarray(random_pdfs(t=15, n=24, seed=5))
        filt, _ = scan_filter(pdfs, 1.0, 0.0, "l2")
        np.testing.assert_allclose(np.asarray(filt), np.asarray(pdfs), rtol=1e-5, atol=1e-6)


def test_domain_keyed_filter_defaults():
    """Dataset-keyed tuned constants (VERDICT r3 #5): D-SPEED uses the
    sweep-tuned (js, n, alpha) from experiments/tune_temporal.py, SPEED
    keeps the reference constants (`src/temporal/inference.py:38-39`),
    unknown domains fall back to the reference set, and explicit overrides
    still win in sequence_inference's merge."""
    from spef_tpu.temporal.pdf_filter import (
        ORI_FILTER_DEFAULTS, POS_FILTER_DEFAULTS, filter_defaults)

    ori, pos = filter_defaults("speed")
    assert ori == ORI_FILTER_DEFAULTS and pos == POS_FILTER_DEFAULTS

    ori, pos = filter_defaults("dspeed")
    assert ori["distance_metric"] == "js" and pos["distance_metric"] == "js"
    assert ori != ORI_FILTER_DEFAULTS
    ori_v, pos_v = filter_defaults("dspeed_video")
    assert (ori_v, pos_v) == (ori, pos)

    ori, pos = filter_defaults(None)
    assert ori == ORI_FILTER_DEFAULTS and pos == POS_FILTER_DEFAULTS
    ori, pos = filter_defaults("never-heard-of-it")
    assert ori == ORI_FILTER_DEFAULTS

    # Mutating the returned dicts must not corrupt the registry.
    ori["alpha"] = 0.0
    assert filter_defaults("never-heard-of-it")[0]["alpha"] != 0.0


def test_detect_dataset_families(tmp_path):
    import json as _json
    import os as _os

    from spef_tpu.data.dataset import detect_dataset

    root = tmp_path / "dspeed" / "still"
    _os.makedirs(root / "train")
    with open(root / "train" / "pose.json", "w") as f:
        _json.dump([], f)
    assert detect_dataset(str(root)) == "dspeed"

    vid = tmp_path / "dspeed" / "video"
    _os.makedirs(vid / "S")
    with open(vid / "S" / "pose.json", "w") as f:
        _json.dump([], f)
    assert detect_dataset(str(vid)) == "dspeed_video"

    _os.makedirs(tmp_path / "speed")
    assert detect_dataset(str(tmp_path / "speed")) == "speed"
    _os.makedirs(tmp_path / "speed_plus")
    assert detect_dataset(str(tmp_path / "speed_plus")) == "speed_plus"
