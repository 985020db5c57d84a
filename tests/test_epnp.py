"""Tests for the batched JAX EPnP solver, incl. parity against cv2.solvePnP.

The reference decodes keypoints with ``cv2.solvePnP(EPNP)`` per-sample
(`/root/reference/src/spe/keypoints_utils.py:112-174`); cv2 here serves as
the ground-truth oracle for our batched solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.codec import KeyPoints, TANGO_3D_KEYPOINTS, epnp_solve_batch
from spef_tpu.data import SPEED_CAMERA, SPEED_PLUS_CAMERA
from spef_tpu.pose import rotations as rot

cv2 = pytest.importorskip("cv2")


def make_poses(n, seed=0, z_range=(5, 30)):
    rng = np.random.RandomState(seed)
    q = np.asarray(rot.generate_orientation(jax.random.PRNGKey(seed), n))
    z = rng.uniform(*z_range, n)
    x = rng.uniform(-0.2, 0.2, n) * z
    y = rng.uniform(-0.2, 0.2, n) * z
    pos = np.stack([x, y, z], axis=-1).astype(np.float32)
    return q.astype(np.float32), pos


def project_cv2(q, pos, camera):
    r = np.asarray(rot.quat2dcm(jnp.asarray(q)))
    rvec, _ = cv2.Rodrigues(r)
    dist = camera.distCoeffs if camera.dist_coeffs else np.zeros(5)
    uv, _ = cv2.projectPoints(
        TANGO_3D_KEYPOINTS.astype(np.float64), rvec, pos.astype(np.float64), camera.K, dist
    )
    return uv.reshape(-1, 2)


class TestProjection:
    @pytest.mark.parametrize("camera", [SPEED_CAMERA, SPEED_PLUS_CAMERA])
    def test_project_matches_cv2(self, camera):
        q, pos = make_poses(4, seed=1)
        kp = KeyPoints.create(camera)
        ours = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]  # drop origin
        for i in range(4):
            ref = project_cv2(q[i], pos[i], camera)
            # float32 on-device vs cv2 float64: sub-pixel agreement suffices.
            np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=0.5)


class TestEPnP:
    @pytest.mark.parametrize("camera", [SPEED_CAMERA, SPEED_PLUS_CAMERA])
    def test_exact_keypoints_recover_pose(self, camera):
        q, pos = make_poses(8, seed=2)
        kp = KeyPoints.create(camera)
        uv = kp.project(jnp.asarray(q), jnp.asarray(pos))[:, 1:, :]  # pixels, no origin
        K = jnp.asarray(camera.K, jnp.float32)
        dist = None if camera.dist_coeffs is None else jnp.asarray(camera.dist_coeffs, jnp.float32)
        r, t = epnp_solve_batch(jnp.asarray(TANGO_3D_KEYPOINTS), uv, K, dist)
        q_est = np.asarray(rot.dcm2quat(r))
        ang = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), jnp.asarray(q_est))))
        pos_err = np.linalg.norm(np.asarray(t) - pos, axis=-1)
        assert ang.max() < 0.5, f"orientation error {ang}"
        assert pos_err.max() < 0.05, f"position error {pos_err}"

    def _cv2_solve(self, camera, uv_px):
        ok, rvec, tvec = cv2.solvePnP(
            TANGO_3D_KEYPOINTS.reshape(-1, 1, 3).astype(np.float64),
            uv_px.reshape(-1, 1, 2).astype(np.float64),
            camera.K,
            np.zeros(5),
            flags=cv2.SOLVEPNP_EPNP,
        )
        assert ok
        r_cv, _ = cv2.Rodrigues(rvec)
        return np.asarray(rot.dcm2quat(jnp.asarray(r_cv))), tvec.ravel()

    def test_parity_with_cv2_on_noisy_keypoints(self):
        """With noisy 2D points at moderate range, our solution must stay
        close to cv2's EPNP (strong perspective -> unambiguous pose)."""
        camera = SPEED_CAMERA
        q, pos = make_poses(6, seed=3, z_range=(5, 15))
        kp = KeyPoints.create(camera)
        uv = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]
        uv_noisy = uv + np.random.RandomState(4).randn(*uv.shape) * 2.0  # 2 px noise

        K = jnp.asarray(camera.K, jnp.float32)
        r_ours, t_ours = epnp_solve_batch(jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_noisy), K)
        q_ours = np.asarray(rot.dcm2quat(r_ours))

        for i in range(6):
            q_cv, t_cv = self._cv2_solve(camera, uv_noisy[i])
            ang = np.rad2deg(float(rot.quat_angle(jnp.asarray(q_cv), jnp.asarray(q_ours[i]))))
            t_diff = np.linalg.norm(np.asarray(t_ours[i]) - t_cv)
            assert ang < 2.0, f"sample {i}: ours vs cv2 angle {ang} deg"
            assert t_diff < 0.3, f"sample {i}: ours vs cv2 pos diff {t_diff} m"

    def test_far_range_accuracy_not_worse_than_cv2(self):
        """At long range the perspective flip ambiguity makes strict pairwise
        parity ill-posed (both candidate poses reproject within the noise
        floor).  Requirement instead: aggregate accuracy vs ground truth is
        at least as good as cv2's EPNP."""
        camera = SPEED_CAMERA
        q, pos = make_poses(12, seed=3, z_range=(20, 32))
        kp = KeyPoints.create(camera)
        uv = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]
        uv_noisy = uv + np.random.RandomState(4).randn(*uv.shape) * 2.0

        K = jnp.asarray(camera.K, jnp.float32)
        r_ours, t_ours = epnp_solve_batch(jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_noisy), K)
        q_ours = np.asarray(rot.dcm2quat(r_ours))

        ours_err, cv_err = [], []
        for i in range(q.shape[0]):
            q_cv, t_cv = self._cv2_solve(camera, uv_noisy[i])
            ours_err.append(float(rot.quat_angle(jnp.asarray(q[i]), jnp.asarray(q_ours[i]))))
            cv_err.append(float(rot.quat_angle(jnp.asarray(q[i]), jnp.asarray(q_cv))))
        # Medians are robust to the occasional ambiguous flip on either side.
        assert np.median(ours_err) <= np.median(cv_err) * 1.5 + np.deg2rad(0.5)

    def test_decode_batch_roundtrip(self):
        """Full normalized-label roundtrip through KeyPoints.decode_batch."""
        camera = SPEED_CAMERA
        q, pos = make_poses(5, seed=5)
        kp = KeyPoints.create(camera)
        labels = kp.create_keypoints2d(jnp.asarray(q), jnp.asarray(pos))  # (B, 24)
        pose = kp.decode_batch(labels)
        ang = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), pose["ori"])))
        pos_err = np.linalg.norm(np.asarray(pose["pos"]) - pos, axis=-1)
        assert ang.max() < 0.5
        assert pos_err.max() < 0.05

    def test_bbox_from_keypoints(self):
        camera = SPEED_CAMERA
        q, pos = make_poses(3, seed=6)
        kp = KeyPoints.create(camera)
        labels = kp.create_keypoints2d(jnp.asarray(q), jnp.asarray(pos))
        bbox = np.asarray(kp.create_bbox_from_keypoints(labels))
        assert bbox.shape == (3, 4)
        assert (bbox[:, 2] >= bbox[:, 0]).all() and (bbox[:, 3] >= bbox[:, 1]).all()


class TestRANSAC:
    def test_recovers_pose_with_outliers(self):
        """With 3 of 11 keypoints grossly wrong, plain EPnP breaks but
        RANSAC recovers the pose."""
        from spef_tpu.codec.epnp import epnp_ransac

        camera = SPEED_CAMERA
        q, pos = make_poses(4, seed=7, z_range=(6, 12))
        kp = KeyPoints.create(camera)
        uv = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]
        uv_bad = uv.copy()
        rng = np.random.RandomState(8)
        uv_bad += rng.randn(*uv.shape) * 1.0  # 1px noise everywhere
        for b in range(uv.shape[0]):
            idx = rng.choice(uv.shape[1], 3, replace=False)
            uv_bad[b, idx] += rng.randn(3, 2) * 300.0  # gross outliers

        K = jnp.asarray(camera.K, jnp.float32)
        r, t, inliers = epnp_ransac(
            jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_bad), K,
            key=jax.random.PRNGKey(3), n_hypotheses=96,
        )
        q_est = np.asarray(rot.dcm2quat(r))
        ang = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), jnp.asarray(q_est))))
        pos_err = np.linalg.norm(np.asarray(t) - pos, axis=-1)
        assert np.median(ang) < 3.0, ang
        assert np.median(pos_err) < 0.3, pos_err
        # Inlier masks should exclude most planted outliers (median: an
        # individual sample can still draw unlucky subsets).
        assert np.median(np.asarray(inliers).sum(axis=-1)) >= 6

    def test_no_consensus_falls_back_to_full_set(self):
        """Heavy noise on EVERY keypoint (a weak regressor, not sparse
        outliers): no minimal subset reaches a real consensus, and pre-fix
        the argmax hypothesis' inlier-masked GN refinement could diverge to
        ~1e5 m positions (observed on the trained-keypoints RANSAC A/B).
        With the full-set anchor, RANSAC must never be materially worse
        than the plain all-point solve."""
        from spef_tpu.codec.epnp import epnp_ransac

        camera = SPEED_CAMERA
        q, pos = make_poses(32, seed=13, z_range=(6, 30))
        kp = KeyPoints.create(camera)
        uv = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]
        rng = np.random.RandomState(14)
        uv_noisy = uv + rng.randn(*uv.shape) * 40.0

        K = jnp.asarray(camera.K, jnp.float32)
        r_r, t_r, _ = epnp_ransac(
            jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_noisy), K,
            key=jax.random.PRNGKey(5),
        )
        r_p, t_p = epnp_solve_batch(
            jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_noisy), K)
        err_r = np.linalg.norm(np.asarray(t_r) - pos, axis=-1)
        err_p = np.linalg.norm(np.asarray(t_p) - pos, axis=-1)
        assert np.isfinite(err_r).all()
        assert err_r.max() < 1e3, err_r
        assert np.median(err_r) <= np.median(err_p) * 1.5 + 0.5


class TestTPUNumerics:
    def test_solver_forces_f32_matmul_precision(self):
        """Regression for the TPU bf16-matmul failure: the 12x12 M^T M
        null-space system at far range (1 m target, ~25 m depth) has
        condition ~1e8; default TPU matmul precision (bf16 passes) produced
        ~40 deg median orientation error on ground-truth keypoints.  The
        solver must trace its dots with HIGHEST precision so the fix can't
        silently regress (CPU tests can't observe the bf16 failure mode)."""
        from spef_tpu.codec.epnp import _epnp_normalized

        uv = jnp.zeros((11, 2), jnp.float32)
        jaxpr = jax.make_jaxpr(lambda p, u: _epnp_normalized(p, u))(
            jnp.asarray(TANGO_3D_KEYPOINTS), uv
        )

        def collect_dots(jxp):
            for e in jxp.eqns:
                if e.primitive.name == "dot_general":
                    yield e
                for v in e.params.values():
                    inner = getattr(v, "jaxpr", None)
                    if inner is not None:
                        yield from collect_dots(inner)

        dots = list(collect_dots(jaxpr.jaxpr))
        assert dots, "expected dot_general ops in the EPnP jaxpr"
        for e in dots:
            prec = e.params.get("precision")
            assert prec is not None and "HIGHEST" in str(prec), (
                f"EPnP dot_general traced without HIGHEST precision: {prec}"
            )

    def test_gn_divergence_bounded_on_garbage_keypoints(self):
        """Gauss-Newton refinement on nonsense keypoint predictions must not
        blow up: the solver keeps the closed-form EPnP pose when refinement
        increases reprojection error, and never returns non-finite or
        astronomically scaled poses (the pre-fix keypoints run reported
        position errors of 1e12 m)."""
        rng = np.random.RandomState(0)
        uv_garbage = jnp.asarray(rng.uniform(-2000, 4000, (8, 11, 2)).astype(np.float32))
        K = jnp.asarray(SPEED_CAMERA.K, jnp.float32)
        r, t = epnp_solve_batch(jnp.asarray(TANGO_3D_KEYPOINTS), uv_garbage, K)
        assert np.isfinite(np.asarray(r)).all()
        assert np.isfinite(np.asarray(t)).all()
        assert np.linalg.norm(np.asarray(t), axis=-1).max() < 1e5


class TestRansacDecodeOption:
    def test_decode_batch_ransac_recovers_with_outliers(self):
        """KeyPoints.decode_batch(ransac=True) survives gross per-point
        outliers that break plain EPnP — the robust decode path exposed to
        keypoints-mode evaluation (`apps/eval.py --ransac`)."""
        camera = SPEED_CAMERA
        q, pos = make_poses(6, seed=11, z_range=(8, 15))
        kp = KeyPoints.create(camera)
        labels = np.asarray(kp.create_keypoints2d(jnp.asarray(q), jnp.asarray(pos)))
        # Corrupt two keypoints per sample (indices 3, 7 of the 11; origin
        # point 0 is dropped by the decoder).
        bad = labels.copy()
        bad[:, 2 * 4:2 * 4 + 2] += 0.4
        bad[:, 2 * 8:2 * 8 + 2] -= 0.35

        plain = kp.decode_batch(jnp.asarray(bad))
        robust = kp.decode_batch(jnp.asarray(bad), ransac=True)
        ang_plain = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), plain["ori"])))
        ang_rob = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), robust["ori"])))
        assert np.median(ang_rob) < np.median(ang_plain)
        assert np.median(ang_rob) < 5.0
        assert np.isfinite(np.asarray(robust["pos"])).all()


class TestWeightedEPnP:
    """Weighted solves: per-point validity gates thread through every
    least-squares stage (control points, null space, Horn, GN refinement).
    Motivated by border-saturated heatmap predictions: off-frame keypoints
    saturate at the sigmoid border (labels are unclipped raw projections,
    `keypoints_utils.py:92-110`) and become gross-but-identifiable outliers."""

    def _exact(self, n=6, seed=21, z_range=(6, 14)):
        camera = SPEED_CAMERA
        q, pos = make_poses(n, seed=seed, z_range=z_range)
        kp = KeyPoints.create(camera)
        uv = np.asarray(kp.project(jnp.asarray(q), jnp.asarray(pos)))[:, 1:, :]
        return camera, q, pos, uv

    def test_zero_weight_points_are_excluded(self):
        """Gross corruption on zero-weight points must not perturb the solve:
        the weighted result on corrupted data == near-exact recovery."""
        camera, q, pos, uv = self._exact()
        rng = np.random.RandomState(22)
        uv_bad = uv.copy()
        w = np.ones(uv.shape[:2], np.float32)
        for b in range(uv.shape[0]):
            idx = rng.choice(uv.shape[1], 3, replace=False)
            uv_bad[b, idx] += rng.randn(3, 2) * 500.0
            w[b, idx] = 0.0

        K = jnp.asarray(camera.K, jnp.float32)
        pts3d = jnp.asarray(TANGO_3D_KEYPOINTS)
        r_w, t_w = epnp_solve_batch(pts3d, jnp.asarray(uv_bad), K,
                                    weights=jnp.asarray(w))
        r_u, t_u = epnp_solve_batch(pts3d, jnp.asarray(uv_bad), K)
        ang_w = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), rot.dcm2quat(r_w))))
        ang_u = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), rot.dcm2quat(r_u))))
        pos_w = np.linalg.norm(np.asarray(t_w) - pos, axis=-1)
        assert ang_w.max() < 1.0, ang_w  # corrupted points fully excluded
        assert pos_w.max() < 0.1, pos_w
        assert ang_w.max() < np.median(ang_u)  # unweighted is poisoned

    def test_all_ones_weights_match_unweighted(self):
        camera, q, pos, uv = self._exact(seed=23)
        rng = np.random.RandomState(24)
        uv_n = uv + rng.randn(*uv.shape).astype(np.float32) * 2.0
        K = jnp.asarray(camera.K, jnp.float32)
        pts3d = jnp.asarray(TANGO_3D_KEYPOINTS)
        r_w, t_w = epnp_solve_batch(pts3d, jnp.asarray(uv_n), K,
                                    weights=jnp.ones(uv.shape[:2], jnp.float32))
        r_u, t_u = epnp_solve_batch(pts3d, jnp.asarray(uv_n), K)
        np.testing.assert_allclose(np.asarray(t_w), np.asarray(t_u), rtol=1e-3, atol=1e-3)
        ang = np.rad2deg(np.asarray(rot.quat_angle(rot.dcm2quat(r_w), rot.dcm2quat(r_u))))
        assert ang.max() < 0.1, ang

    def test_ransac_with_validity_gate(self):
        """Weights compose with RANSAC: gated points cannot vote as inliers
        and are excluded from the anchor + refinement solves."""
        from spef_tpu.codec.epnp import epnp_ransac

        camera, q, pos, uv = self._exact(n=4, seed=25)
        rng = np.random.RandomState(26)
        uv_bad = uv + rng.randn(*uv.shape).astype(np.float32) * 1.5
        w = np.ones(uv.shape[:2], np.float32)
        for b in range(uv.shape[0]):
            idx = rng.choice(uv.shape[1], 3, replace=False)
            uv_bad[b, idx] += 400.0
            w[b, idx] = 0.0

        K = jnp.asarray(camera.K, jnp.float32)
        r, t, inliers = epnp_ransac(
            jnp.asarray(TANGO_3D_KEYPOINTS), jnp.asarray(uv_bad), K,
            key=jax.random.PRNGKey(9), weights=jnp.asarray(w))
        ang = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), rot.dcm2quat(r))))
        pos_err = np.linalg.norm(np.asarray(t) - pos, axis=-1)
        assert ang.max() < 3.0, ang
        assert pos_err.max() < 0.3, pos_err
        # Gated points must never appear as inliers.
        assert not np.any(np.asarray(inliers) & (w == 0.0))


class TestBorderGateDecode:
    def _border_saturated_labels(self, n=8, seed=31):
        """Poses close enough that 1-3 keypoints project off-frame, with the
        predictions border-saturated the way a sigmoid/soft-argmax head
        emits them (truth outside [0,1] -> prediction pinned near the edge)."""
        camera = SPEED_CAMERA
        rng = np.random.RandomState(seed)
        q = np.asarray(rot.generate_orientation(jax.random.PRNGKey(seed), n)).astype(np.float32)
        z = rng.uniform(3.2, 4.5, n)
        x = rng.uniform(0.05, 0.18, n) * z * rng.choice([-1, 1], n)
        y = rng.uniform(0.05, 0.18, n) * z * rng.choice([-1, 1], n)
        pos = np.stack([x, y, z], axis=-1).astype(np.float32)
        kp = KeyPoints.create(camera)
        labels = np.asarray(kp.create_keypoints2d(jnp.asarray(q), jnp.asarray(pos)))
        off = ((labels < 0) | (labels > 1)).reshape(n, -1, 2).any(-1)
        sat = np.clip(labels, 5e-3, 1 - 5e-3)  # border saturation
        return kp, q, pos, sat, off

    def test_border_gate_beats_ungated_on_saturated_frames(self):
        kp, q, pos, sat, off = self._border_saturated_labels()
        assert off[:, 1:].any(), "fixture must have off-frame keypoints"
        plain = kp.decode_batch(jnp.asarray(sat))
        gated = kp.decode_batch(jnp.asarray(sat), border_gate=0.02)
        ang_p = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), plain["ori"])))
        ang_g = np.rad2deg(np.asarray(rot.quat_angle(jnp.asarray(q), gated["ori"])))
        pos_g = np.linalg.norm(np.asarray(gated["pos"]) - pos, axis=-1)
        # Frames with >= 6 surviving points get the gated solve -> the
        # saturated outliers drop out and recovery is near-exact.  Frames
        # below the floor branchlessly keep the ungated all-point solve.
        xy = sat.reshape(sat.shape[0], -1, 2)[:, 1:, :]
        inside = ((xy > 0.02) & (xy < 0.98)).all(-1)  # decode's own gate rule
        applies = inside.sum(-1) >= 6
        assert applies.any(), "fixture must have gate-eligible frames"
        assert ang_g[applies].max() < 1.0, (ang_g, ang_p)
        assert pos_g[applies].max() < 0.1
        assert ang_g.mean() < ang_p.mean()
        np.testing.assert_allclose(ang_g[~applies], ang_p[~applies], atol=1e-3)

    def test_border_gate_falls_back_when_too_few_points(self):
        """A frame with (nearly) all points at the border keeps the ungated
        all-point solve instead of solving a degenerate gated system."""
        kp, q, pos, sat, _ = self._border_saturated_labels(seed=32)
        all_border = np.full_like(sat[:1], 0.001)
        labels = np.concatenate([sat, all_border])
        gated = kp.decode_batch(jnp.asarray(labels), border_gate=0.02)
        assert np.isfinite(np.asarray(gated["ori"])).all()
        assert np.isfinite(np.asarray(gated["pos"])).all()

    def test_border_gate_noop_on_clean_frames(self):
        """Frames with every keypoint well inside the image are unaffected."""
        camera = SPEED_CAMERA
        q, pos = make_poses(5, seed=33, z_range=(12, 25))
        kp = KeyPoints.create(camera)
        labels = kp.create_keypoints2d(jnp.asarray(q), jnp.asarray(pos))
        plain = kp.decode_batch(labels)
        gated = kp.decode_batch(labels, border_gate=0.02)
        np.testing.assert_allclose(np.asarray(gated["pos"]), np.asarray(plain["pos"]),
                                   rtol=1e-4, atol=1e-4)
