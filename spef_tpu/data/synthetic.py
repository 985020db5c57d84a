"""Synthetic dataset rendering — wireframe Tango frames with exact poses.

The reference's D-SPEED generator (`/root/reference/create_dspeed.py`)
produces pose labels; images come from an external renderer.  For
self-contained end-to-end runs (tests, benchmarks, CI) this module renders
simple wireframe frames with cv2 so the full train/eval/temporal pipeline
can execute with real pose<->image correspondence.

The pose sampling mirrors `create_dspeed.py:56-96`: uniform random
orientations, positions with z in [3, 35], x/y within +/-0.3 z, and a
keypoint-visibility constraint (>= 8 of 11 keypoints inside the frame).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from spef_tpu.codec.keypoints import TANGO_3D_KEYPOINTS
from spef_tpu.data.camera import Camera, DSPEED_CAMERA

__all__ = ["generate_positions", "render_frame", "create_synthetic_dataset"]

# Wireframe edges over the 11 Tango keypoints (top face, bottom face, pillars,
# antenna tips to nearest top corners).
_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # top plate
    (4, 5), (5, 6), (6, 7), (7, 4),  # bottom plate
    (0, 4), (1, 5), (2, 6), (3, 7),  # pillars
    (1, 8), (2, 9), (3, 10),  # antennas
]


def _project_np(q: np.ndarray, pos: np.ndarray, camera: Camera) -> np.ndarray:
    """Host-side numpy projection of the 11 keypoints -> (11, 2) pixels."""
    q0, q1, q2, q3 = q
    r = np.array(
        [
            [2 * q0**2 - 1 + 2 * q1**2, 2 * q1 * q2 - 2 * q0 * q3, 2 * q1 * q3 + 2 * q0 * q2],
            [2 * q1 * q2 + 2 * q0 * q3, 2 * q0**2 - 1 + 2 * q2**2, 2 * q2 * q3 - 2 * q0 * q1],
            [2 * q1 * q3 - 2 * q0 * q2, 2 * q2 * q3 + 2 * q0 * q1, 2 * q0**2 - 1 + 2 * q3**2],
        ]
    )
    xyz = TANGO_3D_KEYPOINTS @ r.T + pos
    k = camera.K
    u = k[0, 0] * xyz[:, 0] / xyz[:, 2] + k[0, 2]
    v = k[1, 1] * xyz[:, 1] / xyz[:, 2] + k[1, 2]
    return np.stack([u, v], axis=-1)


def _random_quats(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Shoemake uniform quaternions (host RNG)."""
    x0, x1, x2 = rng.rand(n), rng.rand(n), rng.rand(n)
    t1, t2 = 2 * np.pi * x1, 2 * np.pi * x2
    r1, r2 = np.sqrt(1 - x0), np.sqrt(x0)
    return np.stack([np.sin(t1) * r1, np.cos(t1) * r1, np.sin(t2) * r2, np.cos(t2) * r2], -1)


def generate_positions(
    rng: np.random.RandomState,
    n: int,
    camera: Camera = DSPEED_CAMERA,
    z_range: Tuple[float, float] = (3.0, 35.0),
    min_visible: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (ori, pos) pairs with the visibility constraint of
    `create_dspeed.py:56-96` via rejection sampling."""
    oris, poss = [], []
    while len(oris) < n:
        q = _random_quats(rng, 1)[0]
        z = rng.uniform(*z_range)
        x = rng.uniform(-0.3, 0.3) * z
        y = rng.uniform(-0.3, 0.3) * z
        pos = np.array([x, y, z], np.float32)
        uv = _project_np(q, pos, camera)
        visible = np.sum(
            (uv[:, 0] >= 0) & (uv[:, 0] < camera.nu) & (uv[:, 1] >= 0) & (uv[:, 1] < camera.nv)
        )
        if visible >= min_visible:
            oris.append(q.astype(np.float32))
            poss.append(pos)
    return np.stack(oris), np.stack(poss)


def render_frame(
    q: np.ndarray,
    pos: np.ndarray,
    camera: Camera = DSPEED_CAMERA,
    img_size: Tuple[int, int] = (1200, 1920),
    noise_std: float = 6.0,
    rng: Optional[np.random.RandomState] = None,
    window: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Render one wireframe frame (H, W, 3) uint8 at camera resolution scaled
    to ``img_size`` (H, W).

    ``window``: optional normalized crop window ``[cx, cy, s]`` (square in
    normalized units — the sensor's pixel aspect) rendered to ``img_size``
    instead of the full frame, i.e. an ideal sensor crop for the two-stage
    crop-refine pipeline (codec/crop.py).  Callers should keep
    ``s >= codec.crop.MIN_BOX_SIZE`` so the render never samples finer than
    the 1920-px sensor.
    """
    import cv2

    h, w = img_size
    uv = _project_np(q, pos, camera)
    if window is not None:
        cx, cy, s = float(window[0]), float(window[1]), float(window[2])
        un = uv[:, 0] / camera.nu
        vn = uv[:, 1] / camera.nv
        uv = np.stack([(un - (cx - s / 2)) / s * w, (vn - (cy - s / 2)) / s * h], -1)
        sx, sy = w / (camera.nu * s), h / (camera.nv * s)
    else:
        sx, sy = w / camera.nu, h / camera.nv
        uv = np.stack([uv[:, 0] * sx, uv[:, 1] * sy], -1)

    img = np.zeros((h, w, 3), np.uint8)
    depth = float(pos[2])
    thickness = max(1, int(round(60.0 / depth * min(sx, sy) * 3)))
    # Distinct per-edge colors: a plain gray wireframe is nearly symmetric
    # under 180-degree flips, which makes orientation unlearnable from the
    # renders; color-coding the edges restores the asymmetry a textured
    # spacecraft has.
    edge_rng = np.random.RandomState(42)
    edge_colors = edge_rng.randint(80, 256, (len(_EDGES), 3)).tolist()
    for (a, b), color in zip(_EDGES, edge_colors):
        pa = tuple(np.round(uv[a]).astype(int))
        pb = tuple(np.round(uv[b]).astype(int))
        cv2.line(img, pa, pb, tuple(int(c) for c in color), thickness, lineType=cv2.LINE_AA)
    point_colors = edge_rng.randint(100, 256, (uv.shape[0], 3)).tolist()
    for i in range(uv.shape[0]):
        p = tuple(np.round(uv[i]).astype(int))
        cv2.circle(img, p, thickness + 1, tuple(int(c) for c in point_colors[i]), -1,
                   lineType=cv2.LINE_AA)
    if noise_std > 0:
        rng = rng or np.random.RandomState(0)
        noise = rng.randn(h, w, 1) * noise_std
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    return img


def create_synthetic_dataset(
    root: str,
    n_train: int = 64,
    n_valid: int = 16,
    n_test: int = 16,
    img_size: Tuple[int, int] = (1200, 1920),
    seed: int = 1001,
    camera: Camera = DSPEED_CAMERA,
) -> str:
    """Write a D-SPEED-still-layout dataset: {split}/images/*.png + pose.json."""
    import cv2

    rng = np.random.RandomState(seed)
    still = os.path.join(root, "still")
    for split, n in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        img_dir = os.path.join(still, split, "images")
        os.makedirs(img_dir, exist_ok=True)
        oris, poss = generate_positions(rng, n, camera)
        labels = []
        for i in range(n):
            fname = f"img{i:06d}.png"
            frame = render_frame(oris[i], poss[i], camera, img_size, rng=rng)
            cv2.imwrite(os.path.join(img_dir, fname), frame)
            labels.append(
                {"filename": fname, "q": oris[i].tolist(), "t": poss[i].tolist()}
            )
        with open(os.path.join(still, split, "pose.json"), "w") as f:
            json.dump(labels, f)
    return still


def create_crop_dataset(
    still_root: str,
    out_root: Optional[str] = None,
    img_size: Tuple[int, int] = (240, 384),
    margin: float = 1.25,
    jitter_scale: Tuple[float, float] = (1.05, 1.5),
    jitter_center: float = 0.08,
    min_size: float = 0.2,
    seed: int = 1001,
    camera: Camera = DSPEED_CAMERA,
    splits: Tuple[str, ...] = ("train", "valid", "test"),
    n_jitter: int = 1,
) -> str:
    """Derive a crop-refine training set from an existing still dataset.

    Reads each split's ``pose.json`` under ``still_root`` (same poses, so
    full-frame vs crop comparisons are apples-to-apples) and renders the
    ground-truth-box crop window of every frame at ``img_size``, jittered on
    the train split to simulate first-pass detector noise.  Labels carry the
    window as ``crop: [cx, cy, s]`` (read by ``Manifest`` / mapped by the
    trainer through ``codec.crop``).  ``min_size`` floors the window so
    renders never sample finer than the physical sensor.
    """
    import cv2

    rng = np.random.RandomState(seed)
    out_root = out_root or os.path.join(os.path.dirname(still_root.rstrip("/")), "crop")
    for split in splits:
        labels_path = os.path.join(still_root, split, "pose.json")
        if not os.path.isfile(labels_path):
            continue
        with open(labels_path) as f:
            labels = json.load(f)
        img_dir = os.path.join(out_root, split, "images")
        os.makedirs(img_dir, exist_ok=True)
        out_labels = []
        for t in labels:
            q = np.asarray(t["q"], np.float64)
            pos = np.asarray(t["t"], np.float64)
            uv = _project_np(q, pos, camera)
            # Origin point included, matching the label layout (keypoints.py):
            # the spacecraft-frame origin sits at `pos` in camera frame.
            k = camera.K
            u0 = k[0, 0] * pos[0] / pos[2] + k[0, 2]
            v0 = k[1, 1] * pos[1] / pos[2] + k[1, 2]
            un = np.concatenate([[u0], uv[:, 0]]) / camera.nu
            vn = np.concatenate([[v0], uv[:, 1]]) / camera.nv
            cx0 = (un.min() + un.max()) / 2
            cy0 = (vn.min() + vn.max()) / 2
            s0 = max(un.max() - un.min(), vn.max() - vn.min()) * margin
            # n_jitter > 1 renders several independently-jittered windows per
            # TRAIN frame (variant prefix on the filename): the fixed-window
            # set lets the fine model overfit each frame's single crop (r4
            # run saturated by epoch 14); multiple draws restore window
            # diversity at n_jitter x the epoch cost.
            variants = n_jitter if split == "train" else 1
            for v in range(variants):
                cx, cy, s = cx0, cy0, s0
                if split == "train":
                    s *= rng.uniform(*jitter_scale)
                    cx += rng.uniform(-jitter_center, jitter_center) * s
                    cy += rng.uniform(-jitter_center, jitter_center) * s
                else:
                    s *= 1.2  # deterministic eval-style margin
                s = float(np.clip(s, min_size, 1.0))
                cx = float(np.clip(cx, s / 2, 1 - s / 2))
                cy = float(np.clip(cy, s / 2, 1 - s / 2))
                window = np.array([cx, cy, s], np.float32)
                frame = render_frame(q, pos, camera, img_size, rng=rng, window=window)
                fname = t["filename"] if variants == 1 else f"j{v}_{t['filename']}"
                cv2.imwrite(os.path.join(img_dir, fname), frame)
                out_labels.append({"filename": fname, "q": t["q"], "t": t["t"],
                                   "crop": window.tolist()})
        with open(os.path.join(out_root, split, "pose.json"), "w") as f:
            json.dump(out_labels, f)
    return out_root


def create_synthetic_video(
    root: str,
    n_frames: int = 50,
    img_size: Tuple[int, int] = (1200, 1920),
    seed: int = 7,
    camera: Camera = DSPEED_CAMERA,
    omega_deg: float = 2.0,
    seq_name: str = "seq_000",
) -> str:
    """Write one constant-rate tumble sequence in D-SPEED video layout."""
    import cv2

    from spef_tpu.pose.rotations import euler2quat, multiply_quaternions
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    video = os.path.join(root, "video")
    seq_dir = os.path.join(video, seq_name, "images")
    os.makedirs(seq_dir, exist_ok=True)

    q, pos = generate_positions(rng, 1, camera)
    q, pos = q[0], pos[0]
    dq = np.asarray(euler2quat(jnp.asarray([omega_deg, 0.0, 0.0])))
    labels = []
    for i in range(n_frames):
        fname = f"img{i:06d}.png"
        frame = render_frame(q, pos, camera, img_size, rng=rng)
        cv2.imwrite(os.path.join(seq_dir, fname), frame)
        labels.append({"filename": fname, "q": q.tolist(), "t": pos.tolist()})
        q = np.asarray(multiply_quaternions(jnp.asarray(dq), jnp.asarray(q)))
    with open(os.path.join(video, seq_name, "pose.json"), "w") as f:
        json.dump(labels, f)
    return video
