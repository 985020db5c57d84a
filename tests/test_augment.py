"""Tests for device-side augmentations, incl. pose-consistency of the yaw warp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.data import augment
from spef_tpu.data.camera import DSPEED_CAMERA
from spef_tpu.data.synthetic import generate_positions, render_frame
from spef_tpu.pose import rotations as rot


def test_brightness_contrast_range():
    key = jax.random.PRNGKey(0)
    img = jnp.full((2, 16, 16, 3), 0.5)
    out = augment.brightness_contrast(key, img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_gaussian_noise_clips():
    out = augment.gaussian_noise(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    assert float(out.min()) >= 0.0


def test_gaussian_blur_preserves_mean():
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (1, 32, 32, 3))
    out = augment.gaussian_blur(jax.random.PRNGKey(3), img)
    # Blur is an averaging: interior mean approximately preserved.
    assert abs(float(img[:, 8:-8, 8:-8].mean()) - float(out[:, 8:-8, 8:-8].mean())) < 0.05


def test_color_jitter_valid_range():
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3))
    out = augment.color_jitter(jax.random.PRNGKey(5), img)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_hsv_roundtrip():
    img = jax.random.uniform(jax.random.PRNGKey(6), (4, 4, 3))
    back = augment._hsv_to_rgb(augment._rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_yaw_rotation_pose_consistency():
    """After the warp, re-rendering at the *updated* pose must match the
    warped image far better than the original pose does."""
    camera = DSPEED_CAMERA
    rng = np.random.RandomState(3)
    q, pos = generate_positions(rng, 1, camera, z_range=(8.0, 15.0))
    h, w = 120, 192
    frame = render_frame(q[0], pos[0], camera, (h, w), noise_std=0).astype(np.float32) / 255.0

    images = jnp.asarray(frame)[None]
    key = jax.random.PRNGKey(11)
    out_img, out_ori, out_pos = augment.yaw_rotation_augment(
        key, images, jnp.asarray(q), jnp.asarray(pos), camera,
        rot_probability=1.0, rot_max_magnitude=40.0,
    )
    # Rotation must have been applied.
    assert not np.allclose(np.asarray(out_ori), q, atol=1e-4)

    rerendered = render_frame(
        np.asarray(out_ori[0]), np.asarray(out_pos[0]), camera, (h, w), noise_std=0
    ).astype(np.float32) / 255.0
    warped = np.asarray(out_img[0])
    err_updated = np.mean(np.abs(warped - rerendered))
    err_original = np.mean(np.abs(warped - frame))
    assert err_updated < err_original * 0.65, (err_updated, err_original)


def test_yaw_rotation_prob_zero_is_identity():
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, 16, 24, 3))
    q = jnp.asarray(rot.generate_orientation(jax.random.PRNGKey(8), 2))
    pos = jnp.asarray([[0.0, 0.0, 10.0]] * 2)
    out_img, out_ori, out_pos = augment.yaw_rotation_augment(
        jax.random.PRNGKey(9), img, q, pos, DSPEED_CAMERA, rot_probability=0.0
    )
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_ori), np.asarray(q), atol=1e-6)


def test_host_rotation_pose_consistency():
    """Host-side cv2 warp: re-render at the updated pose must match the
    warped image far better than the original pose (same criterion as the
    device-side warp test)."""
    from spef_tpu.data.augment_host import host_yaw_rotation

    camera = DSPEED_CAMERA
    rng = np.random.RandomState(4)
    q, pos = generate_positions(rng, 1, camera, z_range=(8.0, 15.0))
    h, w = 120, 192
    frame = render_frame(q[0], pos[0], camera, (h, w), noise_std=0)

    warped, ori_new, pos_new = host_yaw_rotation(frame, q[0], pos[0], camera, 30.0)
    rerendered = render_frame(ori_new, pos_new, camera, (h, w), noise_std=0)
    wf = warped.astype(np.float32) / 255
    err_updated = np.mean(np.abs(wf - rerendered.astype(np.float32) / 255))
    err_original = np.mean(np.abs(wf - frame.astype(np.float32) / 255))
    assert err_updated < err_original * 0.65, (err_updated, err_original)


def test_host_and_device_rotation_agree():
    """Host cv2 warp and device JAX warp produce matching poses and similar
    images for the same rotation angle."""
    from spef_tpu.data.augment_host import host_yaw_rotation

    camera = DSPEED_CAMERA
    rng = np.random.RandomState(5)
    q, pos = generate_positions(rng, 1, camera, z_range=(8.0, 15.0))
    h, w = 120, 192
    frame = render_frame(q[0], pos[0], camera, (h, w), noise_std=0)
    deg = 25.0

    warped_h, ori_h, pos_h = host_yaw_rotation(frame, q[0], pos[0], camera, deg)

    # Device path with a forced angle: call the internals directly.
    images = jnp.asarray(frame.astype(np.float32) / 255)[None]
    euler = jnp.asarray([[deg, 0.0, 0.0]])
    r_change = rot.euler2dcm(euler)
    k_full = jnp.asarray(camera.K, jnp.float32)
    scale = jnp.asarray([[w / camera.nu, 0, 0], [0, h / camera.nv, 0], [0, 0, 1]], jnp.float32)
    k_s = scale @ k_full
    h_inv = k_s @ jnp.swapaxes(r_change, -1, -2) @ jnp.linalg.inv(k_s)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    src = jnp.einsum("ij,hwj->hwi", h_inv[0], grid)
    warped_d = augment._bilinear_sample(images[0], src[..., 0] / src[..., 2], src[..., 1] / src[..., 2])

    ori_d = rot.multiply_quaternions(rot.dcm2quat(r_change[0]), jnp.asarray(q[0]))
    dot = abs(float(jnp.sum(ori_d * jnp.asarray(ori_h))))
    assert dot > 1 - 1e-5, (ori_h, np.asarray(ori_d))
    diff = np.mean(np.abs(np.asarray(warped_d) - warped_h.astype(np.float32) / 255))
    assert diff < 0.02, diff
