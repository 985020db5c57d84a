"""Temporal inference: streaming engine + fused whole-sequence scan path.

Counterpart of `/root/reference/src/temporal/inference.py:20-195`
(``Inference``): per-frame still pose, quaternion sign-continuity with the
|dot| > 0.5 outlier gate, optional 'Adaptative' PDF filtering of the
ori/pos soft outputs and re-decode, keypoints/bbox for visualization.

TPU-native addition: :func:`sequence_inference` runs a WHOLE sequence as
one program — batched CNN forward over all frames (MXU-efficient), then a
``lax.scan`` over the frame axis carrying (prev_pdf_ori, prev_pdf_pos,
prev_quat) with the continuity/outlier logic expressed branchlessly, then
batched decode.  This replaces the reference's strictly sequential
frame-at-a-time host loop (`temporal.py:164`) while producing the same
filter trajectory (scan vs streaming equivalence is tested).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.temporal.pdf_filter import (
    TemporalPDF,
    compute_distance,
    filter_defaults,
)

__all__ = ["Inference", "sequence_inference", "quaternion_continuity_scan"]


def _continuity_step(prev_q, initialized, q):
    """Branchless quaternion sign-continuity update
    (reference `inference.py:136-144`).

    flip q if dot(prev, q) < 0; update prev only when |dot| > 0.5
    (outlier gate) or on the first frame.
    """
    dot = jnp.sum(prev_q * q, axis=-1, keepdims=True)
    q_fixed = jnp.where(dot < 0, -q, q)
    q_fixed = jnp.where(initialized, q_fixed, q)
    take_new = (jnp.abs(dot) > 0.5) | ~initialized
    new_prev = jnp.where(take_new, q_fixed, prev_q)
    return new_prev, jnp.ones_like(initialized), q_fixed


def quaternion_continuity_scan(quats: jax.Array) -> jax.Array:
    """Apply sign-continuity over a (T, 4) quaternion sequence."""

    def body(carry, q):
        prev_q, init = carry
        new_prev, new_init, q_fixed = _continuity_step(prev_q, init, q)
        return (new_prev, new_init), q_fixed

    init = (quats[0], jnp.zeros((1,), bool))
    _, fixed = jax.lax.scan(body, init, quats)
    return fixed


def sequence_inference(
    spe_utils: SPEUtils,
    forward_fn,
    frames: jax.Array,
    filter_video: bool = True,
    ori_filter: Optional[dict] = None,
    pos_filter: Optional[dict] = None,
    frame_batch: int = 32,
    dataset: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Full-sequence inference with temporal filtering, fused.

    Args:
        forward_fn: jittable ``images -> (ori_logits, pos_logits)``.
        frames: (T, H, W, C) uint8 or float sequence.
        frame_batch: chunk size for the batched forward (keeps peak memory
            bounded for 1500-frame sequences).

    Returns dict with still and (optionally) video pose trajectories:
    ``ori_still, pos_still, ori_video, pos_video, ori_distance, pos_distance``.
    Requires classification/classification modes for filtering (like the
    reference's 'Adaptative' path, `inference.py:158-168`).
    ``dataset`` selects domain-tuned filter constants (pdf_filter.
    DOMAIN_FILTER_DEFAULTS); explicit ``ori_filter``/``pos_filter`` entries
    override them.
    """
    ori_def, pos_def = filter_defaults(dataset)
    ori_cfg = {**ori_def, **(ori_filter or {})}
    pos_cfg = {**pos_def, **(pos_filter or {})}
    t = frames.shape[0]

    # 1) Batched CNN forward over the sequence, chunked.
    ori_soft_chunks = []
    pos_soft_chunks = []

    @jax.jit
    def fwd(chunk):
        if chunk.dtype == jnp.uint8:
            chunk = chunk.astype(jnp.float32) / 255.0
        pred = forward_fn(chunk)
        pose = {"ori_soft": pred[0], "pos_soft": pred[1]}
        pose = spe_utils.last_activ(pose)
        return pose["ori_soft"], pose["pos_soft"]

    for start in range(0, t, frame_batch):
        chunk = frames[start : start + frame_batch]
        o, p = fwd(chunk)
        ori_soft_chunks.append(o)
        pos_soft_chunks.append(p)

    # 2+3) Everything after the CNN — concat, still decode, continuity,
    # scan filtering, re-decode — is ONE jitted program (per-op dispatch
    # here would be host-round-trip-bound on a tunneled device).
    @jax.jit
    def postprocess(ori_chunks, pos_chunks):
        ori_soft = jnp.concatenate(ori_chunks)
        pos_soft = jnp.concatenate(pos_chunks)
        ori_still, _ = spe_utils.orientation.decode_batch(ori_soft)
        pos_still = spe_utils.position.decode_batch(pos_soft)
        ori_still = quaternion_continuity_scan(ori_still)
        out = {
            "ori_still": ori_still,
            "pos_still": pos_still,
            "ori_soft": ori_soft,
            "pos_soft": pos_soft,
        }
        if filter_video:
            from spef_tpu.temporal.pdf_filter import scan_filter

            ori_filt, ori_dist = scan_filter(ori_soft, ori_cfg["n"], ori_cfg["alpha"],
                                             ori_cfg["distance_metric"])
            pos_filt, pos_dist = scan_filter(pos_soft, pos_cfg["n"], pos_cfg["alpha"],
                                             pos_cfg["distance_metric"])
            ori_video, _ = spe_utils.orientation.decode_batch(ori_filt)
            pos_video = spe_utils.position.decode_batch(pos_filt)
            out.update(
                ori_video=quaternion_continuity_scan(ori_video),
                pos_video=pos_video,
                ori_distance=ori_dist,
                pos_distance=pos_dist,
            )
        return out

    return postprocess(ori_soft_chunks, pos_soft_chunks)


class Inference:
    """Streaming (frame-at-a-time) inference multiplexer.

    Reference-compatible behavior (`inference.py:20-195`) minus the board
    plumbing: the single TPU engine replaces the gpu_host / cpu_host /
    gpu_jetson / cpu_ultra96 dispatch (deployment targets collapse to one).
    """

    def __init__(self, engine, spe_utils: SPEUtils, dataset: Optional[str] = None):
        self.engine = engine
        self.spe_utils = spe_utils
        self.prev_still_ori: Optional[np.ndarray] = None
        self.prev_video_ori: Optional[np.ndarray] = None
        ori_cfg, pos_cfg = filter_defaults(dataset)
        self.pdf_adapt_ori = TemporalPDF(**ori_cfg)
        self.pdf_adapt_pos = TemporalPDF(**pos_cfg)

    def reset(self) -> None:
        self.prev_still_ori = None
        self.prev_video_ori = None
        self.pdf_adapt_ori.reset()
        self.pdf_adapt_pos.reset()

    def _continuity(self, prev: Optional[np.ndarray], ori: np.ndarray):
        if prev is None:
            return ori, ori
        dot = float(np.dot(prev, ori))
        if dot < 0:
            ori = -ori
        new_prev = ori if abs(dot) > 0.5 else prev
        return ori, new_prev

    def _add_viz(self, pose: dict) -> dict:
        kp = self.spe_utils.keypoints
        if kp is None:
            return pose
        if self.spe_utils.ori_mode == "keypoints" and self.spe_utils.pos_mode == "keypoints":
            pose["bbox"] = np.asarray(kp.create_bbox_from_keypoints(jnp.asarray(pose["keypoints"])))
        else:
            k2d = np.asarray(kp.create_keypoints2d(jnp.asarray(pose["ori"]), jnp.asarray(pose["pos"])))
            pose["keypoints"] = k2d
            pose["bbox"] = np.asarray(kp.create_bbox_from_keypoints(jnp.asarray(k2d)))
        return pose

    def predict(self, image, video_type: Optional[str] = None):
        """Single-frame prediction; returns (pose_still, latency_ms, pose_video)."""
        pose_still, latency_ms = self.engine.predict(image)
        pose_still = {k: np.asarray(v)[0] for k, v in pose_still.items()}

        pose_still["ori"], self.prev_still_ori = self._continuity(
            self.prev_still_ori, pose_still["ori"]
        )
        pose_still = self._add_viz(pose_still)

        if video_type is None:
            return pose_still, latency_ms, None
        if video_type != "Adaptative":
            raise ValueError(f"type of video filtering not implemented: {video_type}")
        assert self.spe_utils.ori_mode == "classification"
        assert self.spe_utils.pos_mode == "classification"

        pose_video: Dict[str, np.ndarray] = {}
        ori_soft, ori_dist = self.pdf_adapt_ori.update_pdf(pose_still["ori_soft"])
        pos_soft, pos_dist = self.pdf_adapt_pos.update_pdf(pose_still["pos_soft"])
        pose_video["ori_soft"] = np.asarray(ori_soft)
        pose_video["pos_soft"] = np.asarray(pos_soft)
        pose_video["ori_distance"] = ori_dist
        pose_video["pos_distance"] = pos_dist
        ori, _ = self.spe_utils.orientation.decode(jnp.asarray(ori_soft))
        pose_video["ori"] = np.asarray(ori)
        pose_video["pos"] = np.asarray(self.spe_utils.position.decode(jnp.asarray(pos_soft)))

        pose_video["ori"], self.prev_video_ori = self._continuity(
            self.prev_video_ori, pose_video["ori"]
        )
        pose_video = self._add_viz(pose_video)
        return pose_still, latency_ms, pose_video


def multi_sequence_inference(
    spe_utils: SPEUtils,
    forward_fn,
    sequences: jax.Array,
    filter_video: bool = True,
    ori_filter: Optional[dict] = None,
    pos_filter: Optional[dict] = None,
    frame_batch: int = 64,
    dataset: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Batched temporal inference over MULTIPLE equal-length sequences.

    ``sequences``: (S, T, H, W, C).  The CNN forward flattens all frames of
    all sequences into large device batches (MXU-efficient), and the
    temporal stage vmaps the scan filter + continuity across the sequence
    axis — the SURVEY §7 design ("lax.scan over frames, vmapped across
    sequences") for the 11-sequence D-SPEED video benchmark.  Output arrays
    carry a leading (S, T, ...) shape.
    """
    ori_def, pos_def = filter_defaults(dataset)
    ori_cfg = {**ori_def, **(ori_filter or {})}
    pos_cfg = {**pos_def, **(pos_filter or {})}
    s, t = sequences.shape[0], sequences.shape[1]
    flat = sequences.reshape(s * t, *sequences.shape[2:])

    @jax.jit
    def fwd(chunk):
        if chunk.dtype == jnp.uint8:
            chunk = chunk.astype(jnp.float32) / 255.0
        pred = forward_fn(chunk)
        pose = {"ori_soft": pred[0], "pos_soft": pred[1]}
        pose = spe_utils.last_activ(pose)
        return pose["ori_soft"], pose["pos_soft"]

    ori_chunks, pos_chunks = [], []
    for start in range(0, s * t, frame_batch):
        o, p = fwd(flat[start : start + frame_batch])
        ori_chunks.append(o)
        pos_chunks.append(p)

    @jax.jit
    def postprocess(ori_chunks, pos_chunks):
        ori_soft = jnp.concatenate(ori_chunks).reshape(s, t, -1)
        pos_soft = jnp.concatenate(pos_chunks).reshape(s, t, -1)

        def per_seq(o_soft, p_soft):
            ori_still, _ = spe_utils.orientation.decode_batch(o_soft)
            pos_still = spe_utils.position.decode_batch(p_soft)
            ori_still = quaternion_continuity_scan(ori_still)
            out = {"ori_still": ori_still, "pos_still": pos_still}
            if filter_video:
                from spef_tpu.temporal.pdf_filter import scan_filter

                o_f, o_d = scan_filter(o_soft, ori_cfg["n"], ori_cfg["alpha"],
                                       ori_cfg["distance_metric"])
                p_f, p_d = scan_filter(p_soft, pos_cfg["n"], pos_cfg["alpha"],
                                       pos_cfg["distance_metric"])
                ov, _ = spe_utils.orientation.decode_batch(o_f)
                out.update(
                    ori_video=quaternion_continuity_scan(ov),
                    pos_video=spe_utils.position.decode_batch(p_f),
                    ori_distance=o_d,
                    pos_distance=p_d,
                )
            return out

        return jax.vmap(per_seq)(ori_soft, pos_soft)

    return postprocess(ori_chunks, pos_chunks)
