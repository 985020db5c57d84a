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
