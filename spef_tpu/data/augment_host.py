"""Host-side yaw-rotation augmentation (cv2 warp in the data loader).

Counterpart of the reference's ``CustomRotation``
(`/root/reference/src/data/utils.py:84-146`), applied to the resized image
with the correspondingly-scaled camera matrix.

Why host-side: TPUs execute fine-grained gathers (bilinear warps) ~1000x
slower than their arithmetic peak — the device-side warp costs ~213 ms per
64-image batch at 240x384 (measured; see PERFORMANCE.md), while cv2's
native warp costs ~10 ms on one host core and overlaps with device compute
in the loader. The device-side implementation
(:func:`spef_tpu.data.augment.yaw_rotation_augment`) remains available and
tested; blur/colour-jitter stay device-side (they are bandwidth-cheap).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from spef_tpu.data.camera import Camera

__all__ = ["host_yaw_rotation", "HostRotationAugment"]


def _euler2dcm_yaw(deg: float) -> np.ndarray:
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _dcm2quat(m: np.ndarray) -> np.ndarray:
    tr = np.trace(m)
    q = np.array([
        np.sqrt(max(1 + tr, 0)) / 2,
        (m[2, 1] - m[1, 2]),
        (m[0, 2] - m[2, 0]),
        (m[1, 0] - m[0, 1]),
    ])
    q[1:] /= 4 * max(q[0], 1e-12)
    return q / np.linalg.norm(q)


def _quat_mul(qa, qb):
    q0, q1, q2, q3 = qa
    p0, p1, p2, p3 = qb
    q = np.array([
        q0 * p0 - q1 * p1 - q2 * p2 - q3 * p3,
        q0 * p1 + q1 * p0 + q2 * p3 - q3 * p2,
        q0 * p2 + q2 * p0 - q1 * p3 + q3 * p1,
        q0 * p3 + q3 * p0 + q1 * p2 - q2 * p1,
    ])
    return q / np.linalg.norm(q)


def host_yaw_rotation(
    image: np.ndarray,  # (H, W, 3) uint8, already resized
    ori: np.ndarray,
    pos: np.ndarray,
    camera: Camera,
    rotation_deg: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Warp one frame by a yaw rotation and update its pose accordingly."""
    import cv2

    h, w = image.shape[:2]
    r_change = _euler2dcm_yaw(rotation_deg)
    k = camera.K.copy()
    k[0] *= w / camera.nu
    k[1] *= h / camera.nv
    transform = k @ r_change @ np.linalg.inv(k)
    warped = cv2.warpPerspective(image, transform, (w, h))

    pos_new = (r_change @ np.asarray(pos, np.float64)).astype(np.float32)
    ori_new = _quat_mul(_dcm2quat(r_change), np.asarray(ori, np.float64)).astype(np.float32)
    return warped, ori_new, pos_new


class HostRotationAugment:
    """Per-sample random yaw rotation for the BatchLoader."""

    def __init__(self, camera: Camera, rot_probability: float = 0.5,
                 rot_max_magnitude: float = 50.0, seed: int = 1001):
        self.camera = camera
        self.rot_probability = rot_probability
        self.rot_max_magnitude = rot_max_magnitude
        self.rng = np.random.RandomState(seed)

    def __call__(self, image, ori, pos):
        if self.rng.rand() >= self.rot_probability:
            return image, ori, pos
        deg = (self.rng.rand() - 0.5) * 2 * self.rot_max_magnitude
        return host_yaw_rotation(image, ori, pos, self.camera, deg)
