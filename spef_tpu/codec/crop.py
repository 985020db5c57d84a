"""Two-stage crop-refine keypoint localization — batched, pure JAX.

The reference's keypoints deployment path regresses all keypoints from the
full camera frame (`/root/reference/src/spe/keypoints_utils.py:92-174`,
head `src/modeling/head/keypoints.py`).  At SPEED geometry the target
subtends a small fraction of the 1920x1200 frame at far range, so the
regressor's pixel noise — not the PnP solver — dominates the pose error
(measured: ACCURACY.md "Regressor noise vs PnP sensitivity").  The standard
remedy, used by the SPEED-competition leaders the reference benchmarks
against, is a two-stage pipeline: detect a bounding box, then regress
keypoints on a zoomed crop, multiplying effective resolution by the crop
factor.

This module supplies the TPU-native pieces:

  * normalized square crop-box construction from (possibly noisy) keypoint
    predictions, with outlier rejection, margin, min-size and frame
    clamping — all branch-free jnp, jit/vmap-safe, static shapes;
  * keypoint coordinate mapping into / out of a crop;
  * a batched bilinear crop+resize expressed as TWO MATMULS per image axis
    (per-sample interpolation operators contracted on the MXU) instead of a
    gather — `jax.image.resize`-style gathers lower ~1000x below peak on
    TPU (measured; PERFORMANCE.md "device-side yaw warp"), while this form
    is a pair of einsums XLA tiles natively;
  * ``CropRefinePipeline`` — the fused two-pass predict (full-frame model
    -> box -> on-device crop -> crop model -> back-mapped keypoints) used
    by the engine/serving path.

Boxes are normalized ``[cx, cy, s]``: center and side in full-frame
normalized units.  A square in normalized units maps to the sensor's
aspect ratio in pixels (1920/1200 = 8:5), which matches the model input
aspect (384/240), so crops resample isotropically.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "crop_box_from_keypoints",
    "clamp_box",
    "jitter_box",
    "map_keypoints_to_crop",
    "map_keypoints_from_crop",
    "gate_keypoints",
    "crop_resize",
    "CropRefinePipeline",
]

# Below this normalized side, a 384-wide crop would sample FINER than the
# 1920-px sensor (0.2 * 1920 = 384): rendered/synthetic crops would invent
# information a real sensor does not have.  Default floor for all builders.
MIN_BOX_SIZE = 0.2


def clamp_box(box: jax.Array, min_size: float = MIN_BOX_SIZE) -> jax.Array:
    """Clamp ``[..., (cx, cy, s)]`` to lie fully inside the unit frame."""
    s = jnp.clip(box[..., 2], min_size, 1.0)
    cx = jnp.clip(box[..., 0], s / 2, 1.0 - s / 2)
    cy = jnp.clip(box[..., 1], s / 2, 1.0 - s / 2)
    return jnp.stack([cx, cy, s], axis=-1)


def crop_box_from_keypoints(
    keypoints2d: jax.Array,
    margin: float = 1.25,
    min_size: float = MIN_BOX_SIZE,
    outlier_k: Optional[float] = 3.0,
) -> jax.Array:
    """Square crop box around predicted keypoints, robust to gross outliers.

    ``keypoints2d``: ``(..., 2K)`` flattened normalized ``[x0,y0,x1,y1,..]``
    (the standard label layout, origin included).  Returns ``(..., 3)``
    ``[cx, cy, s]``.

    A first-pass regressor occasionally places a minority of points
    arbitrarily (border saturation, occlusion): a plain min/max box then
    covers the whole frame and the zoom gain is lost.  With ``outlier_k``,
    points farther than ``k * median-absolute-deviation`` from the median
    center (per axis, isotropic radius) are excluded from the extent —
    branch-free masking, no data-dependent shapes.
    """
    kp = keypoints2d.reshape(*keypoints2d.shape[:-1], -1, 2)
    x, y = kp[..., 0], kp[..., 1]
    if outlier_k is not None:
        mx = jnp.median(x, axis=-1, keepdims=True)
        my = jnp.median(y, axis=-1, keepdims=True)
        r = jnp.sqrt((x - mx) ** 2 + (y - my) ** 2)
        madr = jnp.median(r, axis=-1, keepdims=True)
        keep = r <= outlier_k * jnp.maximum(madr, 1e-3)
        # Degenerate guard: if fewer than 4 survivors, keep everything.
        enough = jnp.sum(keep, axis=-1, keepdims=True) >= 4
        keep = keep | ~enough
        big = 10.0
        x_min = jnp.min(jnp.where(keep, x, big), axis=-1)
        x_max = jnp.max(jnp.where(keep, x, -big), axis=-1)
        y_min = jnp.min(jnp.where(keep, y, big), axis=-1)
        y_max = jnp.max(jnp.where(keep, y, -big), axis=-1)
    else:
        x_min, x_max = jnp.min(x, axis=-1), jnp.max(x, axis=-1)
        y_min, y_max = jnp.min(y, axis=-1), jnp.max(y, axis=-1)
    cx = (x_min + x_max) / 2
    cy = (y_min + y_max) / 2
    s = jnp.maximum(x_max - x_min, y_max - y_min) * margin
    return clamp_box(jnp.stack([cx, cy, s], axis=-1), min_size)


def jitter_box(key: jax.Array, box: jax.Array,
               scale_range: Tuple[float, float] = (1.05, 1.5),
               center_frac: float = 0.08,
               min_size: float = MIN_BOX_SIZE) -> jax.Array:
    """Randomly scale/shift boxes (training-time detector-noise simulation)."""
    ks, kc = jax.random.split(key)
    b = box.shape[:-1]
    f = jax.random.uniform(ks, b, minval=scale_range[0], maxval=scale_range[1])
    d = jax.random.uniform(kc, b + (2,), minval=-center_frac, maxval=center_frac)
    s = box[..., 2] * f
    c = box[..., :2] + d * s[..., None]
    return clamp_box(jnp.concatenate([c, s[..., None]], axis=-1), min_size)


def map_keypoints_to_crop(keypoints2d: jax.Array, box: jax.Array) -> jax.Array:
    """Full-frame normalized keypoints ``(..., 2K)`` -> crop-local (0-1 in
    the crop window).  ``box``: ``(..., 3)`` broadcastable over the batch."""
    kp = keypoints2d.reshape(*keypoints2d.shape[:-1], -1, 2)
    origin = box[..., None, :2] - box[..., None, 2:3] / 2
    out = (kp - origin) / box[..., None, 2:3]
    return out.reshape(keypoints2d.shape)


def map_keypoints_from_crop(keypoints2d: jax.Array, box: jax.Array) -> jax.Array:
    """Inverse of :func:`map_keypoints_to_crop`."""
    kp = keypoints2d.reshape(*keypoints2d.shape[:-1], -1, 2)
    origin = box[..., None, :2] - box[..., None, 2:3] / 2
    out = kp * box[..., None, 2:3] + origin
    return out.reshape(keypoints2d.shape)


def gate_keypoints(
    fine: jax.Array, coarse: jax.Array, tau: float
) -> Tuple[jax.Array, jax.Array]:
    """Per-keypoint coarse-consistency gate for the two-pass pipeline.

    Keeps each fine-pass keypoint only while it lies within ``tau``
    (normalized units) of the coarse prediction, else falls back to the
    coarse one.  Rationale (measured, r5 e50 eval): the fine regressor
    HALVES the median error (7.4px vs 13.3px coarse at 1920-px scale) but
    fails globally on a minority of frames (two-pass p90 57px vs coarse
    33px) — and on exactly those frames the coarse prediction is fine, so
    the fine-vs-coarse disagreement separates the two regimes cleanly
    (good-fine disagreement ~= coarse error <= ~33px; failed-fine
    disagreement >= ~50px; ``tau`` 0.02 ~= 38px sits between).  Branch-free
    ``where``; shapes static; `(..., 2K)` layout as everywhere else.

    Returns ``(gated_keypoints, keep_mask (..., K))``.
    """
    f = fine.reshape(*fine.shape[:-1], -1, 2)
    c = coarse.reshape(*coarse.shape[:-1], -1, 2)
    d = jnp.linalg.norm(f - c, axis=-1, keepdims=True)
    keep = d <= tau
    out = jnp.where(keep, f, c)
    return out.reshape(fine.shape), keep[..., 0]


def _axis_operator(center: jax.Array, side: jax.Array, n_in: int, n_out: int) -> jax.Array:
    """Per-sample 1-D bilinear resampling operator ``(B, n_out, n_in)``.

    Row ``i`` holds the two bilinear taps that evaluate the crop window
    ``[center - side/2, center + side/2]`` (normalized) at output pixel
    center ``(i + 0.5) / n_out``.  Built from one-hot matmuls, so the whole
    crop+resize contracts on the MXU with no gathers.
    """
    i = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) / n_out  # (n_out,)
    # Source coordinate in input pixels (pixel-center convention).
    src = (center[:, None] - side[:, None] / 2 + i[None, :] * side[:, None]) * n_in - 0.5
    src = jnp.clip(src, 0.0, n_in - 1.0)
    lo = jnp.floor(src)
    w_hi = src - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, n_in - 1)
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return (eye[lo_i] * (1.0 - w_hi)[..., None] + eye[hi_i] * w_hi[..., None])


def crop_resize(images: jax.Array, box: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Batched bilinear crop+resize: ``(B, H, W, C), (B, 3) -> (B, h, w, C)``.

    Two einsum contractions (rows then columns) with per-sample bilinear
    operators; float32 accumulation.  ``box`` is ``[cx, cy, s]`` normalized.
    """
    b, h_in, w_in, _ = images.shape
    h_out, w_out = out_hw
    ry = _axis_operator(box[:, 1], box[:, 2], h_in, h_out)  # (B, h_out, H)
    rx = _axis_operator(box[:, 0], box[:, 2], w_in, w_out)  # (B, w_out, W)
    img = images.astype(jnp.float32)
    rows = jnp.einsum("boh,bhwc->bowc", ry, img)
    return jnp.einsum("bpw,bowc->bopc", rx, rows)


@dataclasses.dataclass
class CropRefinePipeline:
    """Fused two-pass keypoint predictor.

    ``coarse_fn`` / ``fine_fn``: ``images (B,H,W,C) float [0,1] -> (B, 2K)``
    keypoint logits (the standard head contract; sigmoid applied here).
    The full pipeline is one jittable program: coarse pass, robust box,
    on-device crop+resize, fine pass, back-mapping.  Decoding (PnP) stays
    with the caller's :class:`~spef_tpu.codec.facade.SPEUtils`.
    """

    coarse_fn: Callable[[jax.Array], jax.Array]
    fine_fn: Callable[[jax.Array], jax.Array]
    crop_hw: Tuple[int, int] = (240, 384)
    # Box = predicted keypoint extent * margin.  1.5 sits mid-distribution
    # of the crop-recipe fine model's TRAINING windows (extent*[1.31, 1.88],
    # create_crop_dataset) and equals its valid-split window scale; margins
    # below ~1.3 put keypoints at the crop borders, outside the training
    # distribution (measured r5: margin 1.25 -> two-pass kp RMSE 68px with
    # median 11.5px — a pure outlier tail).
    margin: float = 1.5
    min_size: float = MIN_BOX_SIZE
    # Coarse-consistency gate (see gate_keypoints): None disables.  0.02
    # normalized (~38px at SPEED sensor scale) separates the fine model's
    # global-failure tail from its (dominant) fine-is-better regime.
    gate: Optional[float] = 0.02

    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        coarse = jax.nn.sigmoid(self.coarse_fn(images))
        box = crop_box_from_keypoints(coarse, self.margin, self.min_size)
        crops = crop_resize(images, box, self.crop_hw)
        fine_local = jax.nn.sigmoid(self.fine_fn(crops))
        fine = map_keypoints_from_crop(fine_local, box)
        out = {"keypoints": fine, "keypoints_coarse": coarse, "crop_box": box}
        if self.gate is not None:
            gated, keep = gate_keypoints(fine, coarse, self.gate)
            out["keypoints"] = gated
            out["keypoints_fine"] = fine
            out["gate_keep"] = keep
        return out
