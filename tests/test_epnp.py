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
