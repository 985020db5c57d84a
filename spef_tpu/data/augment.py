"""Device-side data augmentation — batched, PRNG-keyed, fused into the step.

Counterparts of the reference's host-side transforms:
  * ``CustomRotation`` — yaw-axis homography warp that updates BOTH image
    and pose (`/root/reference/src/data/utils.py:84-146`).  The reference
    warps the full-resolution image with ``cv2.warpPerspective`` before
    resize; here the homography is applied to the resized image with the
    correspondingly-scaled camera matrix (the same mapping up to resampling
    order), bilinearly, batched, on device.
  * ``BrightnessContrast``/``GaussianNoise`` (`data/utils.py:20-62`) and the
    torchvision GaussianBlur + ColorJitter train transforms
    (`datasets/speed.py:74-80`).

All functions take float images in [0, 1], NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from spef_tpu.data.camera import Camera
from spef_tpu.pose.rotations import dcm2quat, euler2dcm, multiply_quaternions

__all__ = [
    "yaw_rotation_augment",
    "brightness_contrast",
    "gaussian_noise",
    "gaussian_blur",
    "color_jitter",
    "train_augment",
]


def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample (H, W, C) image at float coords; zeros outside.

    Uses a flattened single-axis ``jnp.take`` gather: 2D advanced indexing
    lowers to pathologically slow fusions inside large TPU programs
    (~60 ms/tap at 64x240x384 — profiled), while the row-gather form runs in
    microseconds.
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[-1]
    flat = img.reshape(h * w, c)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - dx[..., None]) + v01 * dx[..., None]
    bot = v10 * (1 - dx[..., None]) + v11 * dx[..., None]
    return top * (1 - dy[..., None]) + bot * dy[..., None]


def yaw_rotation_augment(
    key: jax.Array,
    images: jax.Array,
    ori: jax.Array,
    pos: jax.Array,
    camera: Camera,
    rot_probability: float = 0.5,
    rot_max_magnitude: float = 50.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched yaw-axis rotation of images with consistent pose update.

    Returns (images', ori', pos').  Per sample, with probability
    ``rot_probability``, rotates by a uniform angle in
    [-rot_max_magnitude, +rot_max_magnitude] degrees; the homography is
    K_s R K_s^{-1} with K scaled to the current image size, and the pose is
    updated as ori' = q(R) * ori, pos' = R @ pos (`data/utils.py:120-141`).
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_apply, k_mag = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (b,)) < rot_probability
    deg = (jax.random.uniform(k_mag, (b,)) - 0.5) * 2.0 * rot_max_magnitude
    deg = jnp.where(apply, deg, 0.0)

    euler = jnp.stack([deg, jnp.zeros_like(deg), jnp.zeros_like(deg)], axis=-1)
    r_change = euler2dcm(euler)  # (B, 3, 3)

    # Camera matrix scaled to the resized image.
    k_full = jnp.asarray(camera.K, jnp.float32)
    scale = jnp.asarray([[w / camera.nu, 0, 0], [0, h / camera.nv, 0], [0, 0, 1]], jnp.float32)
    k_s = scale @ k_full
    k_s_inv = jnp.linalg.inv(k_s)
    # cv2.warpPerspective gathers src pixels at H^{-1} @ dst; H = K R K^{-1}
    # so H^{-1} = K R^T K^{-1} (R orthonormal).
    h_inv = k_s @ jnp.swapaxes(r_change, -1, -2) @ k_s_inv  # (B, 3, 3)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3)

    def warp_one(img, hi, do):
        src = jnp.einsum("ij,hwj->hwi", hi, grid)
        sx = src[..., 0] / src[..., 2]
        sy = src[..., 1] / src[..., 2]
        warped = _bilinear_sample(img, sx, sy)
        return jnp.where(do, warped, img)

    images_out = jax.vmap(warp_one)(images, h_inv, apply)

    q_change = dcm2quat(r_change)  # (B, 4)
    ori_new = multiply_quaternions(q_change, ori)
    pos_new = jnp.einsum("bij,bj->bi", r_change, pos)
    ori_out = jnp.where(apply[:, None], ori_new, ori)
    pos_out = jnp.where(apply[:, None], pos_new, pos)
    return images_out, ori_out, pos_out


def brightness_contrast(key: jax.Array, images: jax.Array,
                        alpha=(0.5, 2.0), beta=(-25.0, 25.0)) -> jax.Array:
    """new = clip(a * img + b/255), a log-uniform (`data/utils.py:20-44`)."""
    b = images.shape[0]
    ka, kb = jax.random.split(key)
    loga = jax.random.uniform(ka, (b, 1, 1, 1),
                              minval=jnp.log(alpha[0]), maxval=jnp.log(alpha[1]))
    bb = jax.random.uniform(kb, (b, 1, 1, 1), minval=beta[0] / 255, maxval=beta[1] / 255)
    return jnp.clip(jnp.exp(loga) * images + bb, 0.0, 1.0)


def gaussian_noise(key: jax.Array, images: jax.Array, std: float = 25.0 / 255) -> jax.Array:
    noise = jax.random.normal(key, images.shape) * std
    return jnp.clip(images + noise, 0.0, 1.0)


def gaussian_blur(key: jax.Array, images: jax.Array, kernel_size: int = 5,
                  sigma_range=(0.1, 2.0)) -> jax.Array:
    """Separable Gaussian blur with per-batch random sigma
    (torchvision GaussianBlur equivalent, `datasets/speed.py:77`)."""
    sigma = jax.random.uniform(key, (), minval=sigma_range[0], maxval=sigma_range[1])
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(xs**2) / (2 * sigma**2))
    k1 = k1 / jnp.sum(k1)
    c = images.shape[-1]
    # Depthwise separable conv: horizontal then vertical.
    kh = jnp.tile(k1.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    kv = jnp.tile(k1.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(images.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(images, kh, (1, 1), [(0, 0), (half, half)],
                                       dimension_numbers=dn, feature_group_count=c)
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), [(half, half), (0, 0)],
                                       dimension_numbers=dn, feature_group_count=c)
    return out


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    hr = jnp.mod((g - b) / safe, 6.0)
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key: jax.Array, images: jax.Array, brightness=0.2, contrast=0.2,
                 saturation=0.2, hue=0.2) -> jax.Array:
    """torchvision-style ColorJitter (`datasets/speed.py:78`), batched."""
    b = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    bf = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    cf = jax.random.uniform(kc, (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    sf = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    hf = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)

    img = jnp.clip(images * bf, 0.0, 1.0)
    mean = jnp.mean(img, axis=(1, 2, 3), keepdims=True)
    img = jnp.clip((img - mean) * cf + mean, 0.0, 1.0)
    hsv = _rgb_to_hsv(img)
    h = jnp.mod(hsv[..., 0] + hf, 1.0)
    s = jnp.clip(hsv[..., 1] * sf[..., 0], 0.0, 1.0)
    img = _hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    return jnp.clip(img, 0.0, 1.0)


def train_augment(
    key: jax.Array,
    images: jax.Array,
    ori: jax.Array,
    pos: jax.Array,
    camera: Camera,
    rot_augment: bool = True,
    other_augment: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The reference train-transform stack, fused: yaw rotation (+pose
    update), Gaussian blur, color jitter (`datasets/speed.py:66-84`)."""
    k_rot, k_blur, k_jit = jax.random.split(key, 3)
    if rot_augment:
        images, ori, pos = yaw_rotation_augment(k_rot, images, ori, pos, camera)
    if other_augment:
        images = gaussian_blur(k_blur, images)
        images = color_jitter(k_jit, images)
    return images, ori, pos
