"""SPEUtils facade: final activations + decoding + scoring.

TPU-native counterpart of `/root/reference/src/spe/spe_utils.py:10-159`.
Holds the camera and the ori/pos modes (``regression`` / ``classification``
/ ``keypoints``), applies the final activation, dispatches decoding, and
computes the ESA score.  All operations are batched jnp ops that can live
inside a jitted program (the reference does this per batch in numpy on the
host).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from spef_tpu.codec.keypoints import KeyPoints
from spef_tpu.codec.softclass import OrientationSoftClassification, PositionSoftClassification
from spef_tpu.data.camera import Camera
from spef_tpu.pose import score as score_lib

MODES = ("regression", "classification", "keypoints")

__all__ = ["SPEUtils", "MODES"]


@dataclasses.dataclass(frozen=True)
class SPEUtils:
    """Spacecraft Pose Estimation utils facade."""

    camera: Camera
    ori_mode: str
    pos_mode: str
    orientation: OrientationSoftClassification
    position: PositionSoftClassification
    keypoints: Optional[KeyPoints]
    # RANSAC PnP for keypoints-mode decode (robust to gross regressor
    # outliers; ~16x solve cost — still negligible next to the backbone).
    keypoints_ransac: bool = False
    # Border-saturation validity gate (normalized margin) for keypoints-mode
    # decode: off-frame keypoints saturate at the sigmoid border and poison
    # PnP; the gate zero-weights them (see KeyPoints.decode_batch).
    keypoints_border_gate: Optional[float] = None

    @classmethod
    def create(
        cls,
        camera: Camera,
        ori_mode: str = "regression",
        n_ori_bins_per_dim: int = 12,
        ori_smooth_factor: float = 3,
        ori_delete_unused_bins: bool = True,
        pos_mode: str = "regression",
        n_pos_bins_per_dim: int = 10,
        pos_smooth_factor: float = 100,
        use_keypoints: bool = True,
        keypoints_ransac: bool = False,
        keypoints_border_gate: Optional[float] = None,
    ) -> "SPEUtils":
        assert ori_mode in MODES and pos_mode in MODES
        orientation = OrientationSoftClassification.create(
            n_ori_bins_per_dim, ori_smooth_factor, ori_delete_unused_bins
        )
        # Position limits carry a 5 m margin (reference `spe_utils.py:49-53`).
        position = PositionSoftClassification.create(n_pos_bins_per_dim, pos_smooth_factor)
        kp = KeyPoints.create(camera) if use_keypoints else None
        if "keypoints" in (ori_mode, pos_mode):
            assert kp is not None, "keypoints mode requires keypoint support"
        return cls(
            camera=camera,
            ori_mode=ori_mode,
            pos_mode=pos_mode,
            orientation=orientation,
            position=position,
            keypoints=kp,
            keypoints_ransac=keypoints_ransac,
            keypoints_border_gate=keypoints_border_gate,
        )

    # ------------------------------------------------------------------
    # Final activation (reference `spe_utils.py:56-81`) — jit-friendly.
    # ------------------------------------------------------------------
    def last_activ(self, pose: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        pose = dict(pose)
        if self.ori_mode == "keypoints" and self.pos_mode == "keypoints":
            pose["keypoints"] = jax.nn.sigmoid(pose["keypoints"])
            return pose
        if self.ori_mode == "regression":
            n = jnp.linalg.norm(pose["ori"], axis=-1, keepdims=True)
            pose["ori"] = pose["ori"] / n
        else:
            pose["ori_soft"] = jax.nn.softmax(pose["ori_soft"], axis=-1)
        if self.pos_mode == "classification":
            pose["pos_soft"] = jax.nn.softmax(pose["pos_soft"], axis=-1)
        return pose

    # ------------------------------------------------------------------
    # Decoding (reference `spe_utils.py:83-101`).
    # ------------------------------------------------------------------
    def decode(self, pose: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        pose = dict(pose)
        if self.ori_mode == "keypoints" and self.pos_mode == "keypoints":
            assert self.keypoints is not None
            pose.update(self.keypoints.decode_batch(
                pose["keypoints"], ransac=self.keypoints_ransac,
                border_gate=self.keypoints_border_gate))
            return pose
        if self.ori_mode == "classification":
            pose["ori"], _ = self.orientation.decode_batch(pose["ori_soft"])
        if self.pos_mode == "classification":
            pose["pos"] = self.position.decode_batch(pose["pos_soft"])
        return pose

    # ------------------------------------------------------------------
    # Target encoding (done in the reference's dataset __getitem__,
    # `src/data/utils.py:232-249`) — here batched and device-side.
    # ------------------------------------------------------------------
    def encode_targets(self, ori: jax.Array, pos: jax.Array,
                       crop: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """``crop``: optional per-sample ``[cx, cy, s]`` windows — keypoint
        (and bbox) targets are mapped into crop-local coordinates for the
        two-stage crop-refine pipeline (codec/crop.py)."""
        target: Dict[str, jax.Array] = {"ori": ori, "pos": pos}
        if self.keypoints is not None:
            kp2d = self.keypoints.create_keypoints2d(ori, pos)
            if crop is not None:
                from spef_tpu.codec.crop import map_keypoints_to_crop

                kp2d = map_keypoints_to_crop(kp2d, crop)
            target["keypoints"] = kp2d
            target["bbox"] = self.keypoints.create_bbox_from_keypoints(kp2d)
        if self.ori_mode == "classification":
            target["ori_soft"] = self.orientation.encode(ori)
        if self.pos_mode == "classification":
            target["pos_soft"] = self.position.encode(pos)
        return target

    # ------------------------------------------------------------------
    # Scoring (reference `spe_utils.py:103-159`).
    # ------------------------------------------------------------------
    @staticmethod
    def get_score(true_pose: dict, pred_pose: dict) -> Dict[str, float]:
        return score_lib.get_score(true_pose, pred_pose)

    @staticmethod
    def score_batch(true_pose: dict, pred_pose: dict) -> Dict[str, jax.Array]:
        """jit-friendly scoring (no host sync, no raise)."""
        return score_lib.score_batch(
            true_pose["ori"], true_pose["pos"], pred_pose["ori"], pred_pose["pos"]
        )
