"""Keypoint projection / PnP decoding utilities — batched, pure JAX.

Counterpart of the reference ``KeyPoints`` class
(`/root/reference/src/spe/keypoints_utils.py:13-198`), with the per-sample
``cv2.solvePnP`` loop replaced by the batched JAX EPnP solver
(:mod:`spef_tpu.codec.epnp`).

The 11 Tango satellite 3D keypoints ship as constants below (dataset values
originating from the SPNv2 project, loaded by the reference from
``models/3d_models/tangoPoints.mat``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spef_tpu.codec.epnp import epnp_solve_batch
from spef_tpu.data.camera import Camera
from spef_tpu.pose.rotations import dcm2quat, quat2dcm

__all__ = ["TANGO_3D_KEYPOINTS", "KeyPoints"]

# 11 Tango keypoints [m], rows = points, cols = (x, y, z).  Data values from
# the SPNv2 tangoPoints.mat asset used by the reference (keypoints_utils.py:32-45).
TANGO_3D_KEYPOINTS = np.array(
    [
        [-0.3700, -0.3850, 0.3215],
        [-0.3700, 0.3850, 0.3215],
        [0.3700, 0.3850, 0.3215],
        [0.3700, -0.3850, 0.3215],
        [-0.3700, -0.2640, 0.0000],
        [-0.3700, 0.3040, 0.0000],
        [0.3700, 0.3040, 0.0000],
        [0.3700, -0.2640, 0.0000],
        [-0.5427, 0.4877, 0.2535],
        [0.5427, 0.4877, 0.2591],
        [0.3050, -0.5790, 0.2515],
    ],
    dtype=np.float32,
)


@dataclasses.dataclass(frozen=True)
class KeyPoints:
    """Keypoint utilities bound to a camera.

    The label layout matches the reference: the projected-2D label vector is
    ``[x0, y0, x1, y1, ...]`` normalized by image size, where point 0 is the
    *origin* of the spacecraft frame prepended before the 11 keypoints
    (`keypoints_utils.py:62-63`), i.e. 12 points / 24 values total.
    """

    camera: Camera
    keypoints3d: jax.Array  # (N, 3) - the 11 Tango points (no origin)

    @classmethod
    def create(cls, camera: Camera, keypoints3d: Optional[np.ndarray] = None) -> "KeyPoints":
        pts = TANGO_3D_KEYPOINTS if keypoints3d is None else np.asarray(keypoints3d, np.float32)
        return cls(camera=camera, keypoints3d=jnp.asarray(pts))

    @property
    def _points_with_origin(self) -> jax.Array:
        """(N+1, 3): spacecraft-frame origin prepended (reference behavior)."""
        return jnp.concatenate([jnp.zeros((1, 3), self.keypoints3d.dtype), self.keypoints3d])

    def project(self, ori: jax.Array, pos: jax.Array) -> jax.Array:
        """Project 3D keypoints (+origin) to pixel coordinates.

        ``ori``: (..., 4) quaternion, ``pos``: (..., 3) -> (..., N+1, 2) pixels.
        Applies Brown distortion if the camera has coefficients
        (`keypoints_utils.py:47-90`).
        """
        pts = self._points_with_origin  # (M, 3)
        r = quat2dcm(ori)  # (..., 3, 3)
        xyz = jnp.einsum("...ij,mj->...mi", r, pts) + pos[..., None, :]
        x0 = xyz[..., 0] / xyz[..., 2]
        y0 = xyz[..., 1] / xyz[..., 2]

        dist = self.camera.dist_coeffs
        if dist is not None:
            k1, k2, p1, p2, k3 = dist
            r2 = x0 * x0 + y0 * y0
            cdist = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            x = x0 * cdist + p1 * 2 * x0 * y0 + p2 * (r2 + 2 * x0 * x0)
            y = y0 * cdist + p1 * (r2 + 2 * y0 * y0) + p2 * 2 * x0 * y0
        else:
            x, y = x0, y0

        K = self.camera.K
        u = K[0, 0] * x + K[0, 2]
        v = K[1, 1] * y + K[1, 2]
        return jnp.stack([u, v], axis=-1)

    def create_keypoints2d(self, ori: jax.Array, pos: jax.Array) -> jax.Array:
        """Normalized (0-1) flattened keypoint label vector.

        ``(..., 4), (..., 3) -> (..., 2*(N+1))`` as ``[x0, y0, x1, y1, ...]``
        (`keypoints_utils.py:92-110`).
        """
        uv = self.project(ori, pos)  # (..., M, 2)
        norm = jnp.asarray([self.camera.nu, self.camera.nv], uv.dtype)
        uv = uv / norm
        return uv.reshape(*uv.shape[:-2], -1).astype(jnp.float32)

    def decode_batch(
        self,
        keypoints2d: jax.Array,
        ransac: bool = False,
        border_gate: Optional[float] = None,
        min_gated_points: int = 6,
    ) -> dict:
        """Batched PnP decode of normalized keypoint predictions -> pose dict.

        ``keypoints2d``: (B, 2*(N+1)) normalized, origin first (which is
        dropped exactly like the reference drops it, `keypoints_utils.py:131`).
        Returns ``{'ori': (B,4), 'pos': (B,3)}``.

        ``ransac=True`` decodes through the batched RANSAC solver
        (:func:`spef_tpu.codec.epnp.epnp_ransac`) instead of plain EPnP —
        robust to a minority of grossly-wrong keypoints from a trained
        regressor, at ~16x the solve cost (still microseconds/frame).

        ``border_gate``: optional margin (normalized units).  Keypoints that
        project outside the frame saturate at the sigmoid border during
        training (the labels are NOT clipped — `keypoints_utils.py:92-110`
        normalizes raw projections — so off-frame truth pulls predictions to
        the border); such predictions are gross outliers to PnP.  With a
        gate, predictions within ``border_gate`` of 0/1 in either coordinate
        get weight 0 in the solve (:mod:`spef_tpu.codec.epnp` weighted
        path).  Frames with fewer than ``min_gated_points`` surviving points
        branchlessly fall back to the ungated all-point solve.
        """
        kp = jnp.atleast_2d(keypoints2d)
        b = kp.shape[0]
        uv = kp.reshape(b, -1, 2)
        scale = jnp.asarray([self.camera.nu, self.camera.nv], uv.dtype)
        uv_px = uv * scale
        uv_px = uv_px[:, 1:, :]  # drop the origin point

        weights = None
        if border_gate is not None:
            m = float(border_gate)
            xy = uv[:, 1:, :]  # normalized coords sans origin
            inside = jnp.all((xy > m) & (xy < 1.0 - m), axis=-1)  # (B, N)
            w = inside.astype(jnp.float32)
            enough = jnp.sum(w, axis=-1, keepdims=True) >= min_gated_points
            weights = jnp.where(enough, w, jnp.ones_like(w))

        K = jnp.asarray(self.camera.K, jnp.float32)
        dist = None if self.camera.dist_coeffs is None else jnp.asarray(self.camera.dist_coeffs, jnp.float32)
        if ransac:
            from spef_tpu.codec.epnp import epnp_ransac

            r, t, _ = epnp_ransac(self.keypoints3d, uv_px, K, dist, weights=weights)
        else:
            r, t = epnp_solve_batch(self.keypoints3d, uv_px, K, dist, weights=weights)
        ori = dcm2quat(r).astype(jnp.float32)
        return {"ori": ori, "pos": t.astype(jnp.float32)}

    def create_bbox_from_keypoints(self, keypoints2d: jax.Array) -> jax.Array:
        """Normalized bbox [x_min, y_min, x_max, y_max] from the label vector
        (`keypoints_utils.py:176-198`).  Batched over leading dims."""
        kp = keypoints2d.reshape(*keypoints2d.shape[:-1], -1, 2)
        x = kp[..., 0]
        y = kp[..., 1]
        return jnp.stack(
            [x.min(axis=-1), y.min(axis=-1), x.max(axis=-1), y.max(axis=-1)], axis=-1
        )
