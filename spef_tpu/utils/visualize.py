"""Pose visualization overlays: axis arrows, wireframe, keypoints, bboxes.

Counterpart of `/root/reference/src/spe/visualize.py:14-276` (``VisualizePose``):
RGB / MYC / RCA axis-arrow triads for true / predicted / temporal poses,
the Tango wireframe (incl. antenna lines) from the keypoint label vector,
and normalized-bbox rectangles.  Host-side cv2 drawing (visualization is
not a device workload).
"""

from __future__ import annotations

import copy
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["VisualizePose"]

_ARROW_COLORS = {
    # BGR triads for the three axis arrows (x, y, z).
    "RGB": [(0, 0, 255), (0, 255, 0), (255, 0, 0)],
    "MYC": [(255, 0, 255), (0, 255, 255), (255, 255, 0)],
    "RCA": [(0, 0, 180), (200, 200, 0), (180, 120, 0)],
}
_POINT_COLORS = {
    "red": (0, 0, 255),
    "green": (0, 255, 0),
    "blue": (255, 0, 0),
}
# Wireframe edges over [origin + 11 keypoints] label layout.
_WIRE_EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 1),  # top plate
    (5, 6), (6, 7), (7, 8), (8, 5),  # bottom plate
    (1, 5), (2, 6), (3, 7), (4, 8),  # pillars
    (2, 9), (3, 10), (4, 11),  # antennas
]


class VisualizePose:
    def __init__(self, spe_utils, resolution: Optional[Tuple[int, int]] = None):
        self.spe_utils = spe_utils
        self.resolution = resolution

    def set_spe_utils(self, spe_utils):
        self.spe_utils = spe_utils

    # ------------------------------------------------------------------
    def _project_axes(self, q: np.ndarray, r: np.ndarray, scale: float = 1.0) -> np.ndarray:
        """Project origin + unit axis heads to pixels -> (4, 2)."""
        import jax.numpy as jnp

        from spef_tpu.pose.rotations import quat2dcm

        pts = np.array([[0, 0, 0], [scale, 0, 0], [0, scale, 0], [0, 0, scale]], np.float64)
        dcm = np.asarray(quat2dcm(jnp.asarray(np.asarray(q, np.float64))))
        xyz = pts @ dcm.T + np.asarray(r, np.float64)
        k = self.spe_utils.camera.K
        u = k[0, 0] * xyz[:, 0] / xyz[:, 2] + k[0, 2]
        v = k[1, 1] * xyz[:, 1] / xyz[:, 2] + k[1, 2]
        return np.stack([u, v], axis=-1)

    def _scale_to_image(self, image: np.ndarray) -> Tuple[float, float]:
        h, w = image.shape[:2]
        return w / self.spe_utils.camera.nu, h / self.spe_utils.camera.nv

    def draw_arrow(self, image: np.ndarray, pose: Dict, color: str = "RGB") -> np.ndarray:
        import cv2

        sx, sy = self._scale_to_image(image)
        uv = self._project_axes(pose["ori"], pose["pos"])
        uv = uv * [sx, sy]
        # A garbage prediction (e.g. an untrained model with z ~ 0) projects
        # to NaN/inf; skip the overlay instead of crashing the viewer.
        if not np.isfinite(uv).all():
            return image
        uv = np.round(np.clip(uv, -1e6, 1e6)).astype(int)
        origin = tuple(uv[0])
        for i, c in enumerate(_ARROW_COLORS[color]):
            cv2.arrowedLine(image, origin, tuple(uv[i + 1]), c, 2, tipLength=0.1)
        return image

    def draw_keypoints(self, image: np.ndarray, keypoints: np.ndarray,
                       color: str = "red", wireframe: bool = True) -> np.ndarray:
        """Draw the normalized keypoint label vector (+ Tango wireframe)."""
        import cv2

        h, w = image.shape[:2]
        kp = np.asarray(keypoints).reshape(-1, 2) * [w, h]
        if not np.isfinite(kp).all():
            return image
        kp_int = np.round(np.clip(kp, -1e6, 1e6)).astype(int)
        c = _POINT_COLORS[color]
        if wireframe and kp_int.shape[0] >= 12:
            for a, b in _WIRE_EDGES:
                cv2.line(image, tuple(kp_int[a]), tuple(kp_int[b]), c, 1, cv2.LINE_AA)
        for p in kp_int:
            cv2.circle(image, tuple(p), 3, c, -1, cv2.LINE_AA)
        return image

    def draw_bbox(self, image: np.ndarray, bbox: np.ndarray, color: str = "red") -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        box = np.asarray(bbox, np.float64) * [w, h, w, h]
        if not np.isfinite(box).all():
            return image
        x0, y0, x1, y1 = np.clip(box, -1e6, 1e6)
        cv2.rectangle(image, (int(x0), int(y0)), (int(x1), int(y1)), _POINT_COLORS[color], 2)
        return image

    # ------------------------------------------------------------------
    def add_visualization(
        self,
        image: Optional[np.ndarray] = None,
        true_pose: Optional[dict] = None,
        pred_pose: Optional[dict] = None,
        temp_pose: Optional[dict] = None,
        show_true_pose: bool = False,
        show_pred_pose: bool = False,
        show_temp_pose: bool = False,
        show_true_bbox: bool = False,
        show_pred_bbox: bool = False,
        show_temp_bbox: bool = False,
        show_true_keypoints: bool = False,
        show_pred_keypoints: bool = False,
        show_temp_keypoints: bool = False,
    ) -> np.ndarray:
        """Compose overlays (same flag surface as `visualize.py:35-104`)."""
        import cv2

        assert image is not None, "Image must be provided."
        image = copy.deepcopy(np.asarray(image))

        for pose, show_p, show_k, show_b, arrow, col in (
            (true_pose, show_true_pose, show_true_keypoints, show_true_bbox, "RGB", "red"),
            (pred_pose, show_pred_pose, show_pred_keypoints, show_pred_bbox, "MYC", "green"),
            (temp_pose, show_temp_pose, show_temp_keypoints, show_temp_bbox, "RCA", "blue"),
        ):
            if pose is None:
                continue
            if show_p and "ori" in pose and "pos" in pose:
                image = self.draw_arrow(image, pose, color=arrow)
            if show_k and "keypoints" in pose:
                image = self.draw_keypoints(image, pose["keypoints"], color=col)
            if show_b and "bbox" in pose:
                image = self.draw_bbox(image, pose["bbox"], color=col)

        if self.resolution is not None:
            image = cv2.resize(image, self.resolution)
        return image
