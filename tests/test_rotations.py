"""Property tests for the rotation math core (spef_tpu.pose.rotations).

Round-trips and cross-convention checks mirroring the invariants asserted
inline by the reference (`/root/reference/src/spe/utils.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.pose import rotations as rot

KEY = jax.random.PRNGKey(1001)


def random_quats(n=64):
    return np.asarray(rot.generate_orientation(KEY, n))


def test_generate_orientation_unit_norm():
    q = random_quats(256)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_quat2dcm_is_rotation_matrix():
    q = random_quats()
    dcm = np.asarray(rot.quat2dcm(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", dcm, dcm)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(dcm), 1.0, atol=1e-5)


def test_quat_dcm_roundtrip():
    q = random_quats()
    dcm = rot.quat2dcm(jnp.asarray(q))
    q2 = np.asarray(rot.dcm2quat(dcm))
    # Quaternion double cover: q and -q are the same rotation.
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_euler_quat_roundtrip():
    q = rot.enforce_north(jnp.asarray(random_quats()))
    e = rot.quat2euler(q)
    q2 = rot.euler2quat(e, north=True)
    dots = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_euler_dcm_roundtrip():
    e = np.stack(
        [
            np.random.RandomState(0).uniform(-179, 179, 64),
            np.random.RandomState(1).uniform(-89, 89, 64),
            np.random.RandomState(2).uniform(-179, 179, 64),
        ],
        axis=-1,
    )
    dcm = rot.euler2dcm(jnp.asarray(e))
    e2 = np.asarray(rot.dcm2euler(dcm))
    np.testing.assert_allclose(e, e2, atol=1e-3)


def test_euler2dcm_equals_quat_path():
    """euler2dcm must agree with euler2quat -> quat2dcm."""
    e = jnp.asarray([[30.0, -40.0, 100.0], [-170.0, 85.0, 5.0]])
    d1 = np.asarray(rot.euler2dcm(e))
    d2 = np.asarray(rot.quat2dcm(rot.euler2quat(e)))
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_multiply_quaternions_matches_dcm_composition():
    qa = jnp.asarray(random_quats(8))
    qb = jnp.asarray(random_quats(8)[::-1].copy())
    q_prod = rot.multiply_quaternions(qa, qb)
    d_prod = np.asarray(rot.quat2dcm(q_prod))
    d_comp = np.einsum("bij,bjk->bik", np.asarray(rot.quat2dcm(qa)), np.asarray(rot.quat2dcm(qb)))
    np.testing.assert_allclose(d_prod, d_comp, atol=1e-5)


def test_conjugate_inverts_rotation():
    q = jnp.asarray(random_quats(8))
    qc = rot.conjugate_quaternion(q)
    ident = rot.multiply_quaternions(q, qc)
    np.testing.assert_allclose(np.abs(np.asarray(ident[:, 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[:, 1:]), 0.0, atol=1e-5)


def test_euler_angle_difference_wraps():
    assert float(rot.euler_angle_difference(jnp.asarray(170.0), jnp.asarray(-170.0))) == pytest.approx(20.0)
    assert float(rot.euler_angle_difference(jnp.asarray(-170.0), jnp.asarray(170.0))) == pytest.approx(-20.0)
    assert float(rot.euler_angle_difference(jnp.asarray(10.0), jnp.asarray(30.0))) == pytest.approx(20.0)


def test_rotate_vector_matches_dcm():
    q = jnp.asarray(random_quats(8))
    v = jnp.asarray(np.random.RandomState(3).randn(8, 3))
    r1 = np.asarray(rot.rotate_vector(q, v))
    r2 = np.einsum("bij,bj->bi", np.asarray(rot.quat2dcm(q)), np.asarray(v))
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_dcm2quat_gimbal_and_trace_branches():
    """Exercise all four Spurrier selection branches."""
    # Rotations by ~180 deg around each axis force the non-trace branches.
    eulers = jnp.asarray(
        [
            [0.0, 0.0, 0.0],  # trace branch
            [179.0, 0.0, 0.0],  # m33 branch
            [0.0, 0.0, 179.0],  # m11 branch
            [179.0, 0.0, 179.0],  # m22 branch
        ]
    )
    q = rot.euler2quat(eulers)
    dcm = rot.quat2dcm(q)
    q2 = rot.dcm2quat(dcm)
    dots = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_quat2euler_matches_reference_convention():
    """Golden values computed with the reference formulas (NASA ZYX)."""
    q = rot.euler2quat(jnp.asarray([45.0, 30.0, -60.0]))
    e = np.asarray(rot.quat2euler(q))
    np.testing.assert_allclose(e, [45.0, 30.0, -60.0], atol=1e-4)
