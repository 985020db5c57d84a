"""Quaternion / DCM / Euler rotation math — batched-first, pure JAX.

TPU-native counterpart of the reference numpy pose-math core
(`/root/reference/src/spe/utils.py:10-447`). Same conventions:

  * Right-handed coordinate system.
  * Hamilton quaternion multiplication.
  * Scalar-first quaternions ``[w, x, y, z]``.
  * Active rotations.
  * Euler sequence 3-2-1 (Z yaw, then Y pitch, then X roll), degrees.

Design differences from the reference (deliberate, TPU-first):
  * Every function accepts arbitrary leading batch dimensions and is fully
    traceable under ``jit`` / ``vmap`` / ``grad`` — no per-sample Python
    loops, no data-dependent asserts or warnings.  Validation helpers are
    provided separately for host-side use.
  * Branchy selections (e.g. Spurrier's 4-case dcm2quat) are expressed as
    ``jnp.where`` masks so the compiled program is branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat2dcm",
    "dcm2quat",
    "quat2euler",
    "euler2quat",
    "euler2dcm",
    "dcm2euler",
    "multiply_quaternions",
    "conjugate_quaternion",
    "rotate_vector",
    "euler_angle_difference",
    "generate_orientation",
    "normalize_quaternion",
    "enforce_north",
    "quat_angle",
]


def normalize_quaternion(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def enforce_north(q: jax.Array) -> jax.Array:
    """Flip quaternions so the scalar part is non-negative (north pole)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat2dcm(q: jax.Array) -> jax.Array:
    """Scalar-first unit quaternion -> 3x3 Direction Cosine Matrix.

    Matches the element layout of the reference implementation
    (`src/spe/utils.py:10-53`).  Batched: ``(..., 4) -> (..., 3, 3)``.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 2 * q0**2 - 1 + 2 * q1**2
    r11 = 2 * q0**2 - 1 + 2 * q2**2
    r22 = 2 * q0**2 - 1 + 2 * q3**2
    r01 = 2 * q1 * q2 - 2 * q0 * q3
    r02 = 2 * q1 * q3 + 2 * q0 * q2
    r10 = 2 * q1 * q2 + 2 * q0 * q3
    r12 = 2 * q2 * q3 - 2 * q0 * q1
    r20 = 2 * q1 * q3 - 2 * q0 * q2
    r21 = 2 * q2 * q3 + 2 * q0 * q1
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def dcm2quat(dcm: jax.Array, north: bool = False) -> jax.Array:
    """3x3 DCM -> scalar-first unit quaternion (Spurrier's method).

    Branch-free version of the reference's 4-way selection
    (`src/spe/utils.py:56-118`): all four candidate quaternions are computed
    and the numerically-safe one (largest of trace/m11/m22/m33) is selected
    with masks.  Batched: ``(..., 3, 3) -> (..., 4)``.
    """
    m = dcm
    m11, m12, m13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m21, m22, m23 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m31, m32, m33 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m11 + m22 + m33

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-20))

    # Case 0: trace largest
    q0_a = safe_sqrt(1 + trace) / 2
    d0 = 4 * q0_a
    cand0 = jnp.stack([q0_a, (m32 - m23) / d0, (m13 - m31) / d0, (m21 - m12) / d0], axis=-1)
    # Case 1: m11 largest
    q1_b = safe_sqrt(m11 / 2 + (1 - trace) / 4)
    d1 = 4 * q1_b
    cand1 = jnp.stack([(m32 - m23) / d1, q1_b, (m21 + m12) / d1, (m31 + m13) / d1], axis=-1)
    # Case 2: m22 largest
    q2_c = safe_sqrt(m22 / 2 + (1 - trace) / 4)
    d2 = 4 * q2_c
    cand2 = jnp.stack([(m13 - m31) / d2, (m12 + m21) / d2, q2_c, (m32 + m23) / d2], axis=-1)
    # Case 3: m33 largest
    q3_d = safe_sqrt(m33 / 2 + (1 - trace) / 4)
    d3 = 4 * q3_d
    cand3 = jnp.stack([(m21 - m12) / d3, (m13 + m31) / d3, (m23 + m32) / d3, q3_d], axis=-1)

    # Reference selection order: trace > max(m11,m22,m33) -> case0,
    # elif m11 > max(trace,m22,m33) -> case1, elif m22 > ... -> case2 else case3.
    use0 = trace > jnp.maximum(m11, jnp.maximum(m22, m33))
    use1 = m11 > jnp.maximum(trace, jnp.maximum(m22, m33))
    use2 = m22 > jnp.maximum(trace, jnp.maximum(m11, m33))
    q = jnp.where(
        use0[..., None], cand0,
        jnp.where(use1[..., None], cand1, jnp.where(use2[..., None], cand2, cand3)),
    )
    if north:
        q = enforce_north(q)
    return normalize_quaternion(q)


def quat2euler(q: jax.Array, degrees: bool = True) -> jax.Array:
    """Scalar-first unit quaternion -> Euler (yaw, pitch, roll).

    Mirrors `src/spe/utils.py:121-164` including the clipping of the pitch
    argument for numerical robustness.  Returns a stacked ``(..., 3)`` array
    ``[yaw, pitch, roll]`` (the reference returns a tuple).
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    yaw = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 2 * (q0**2 + q1**2) - 1)
    clip_arg = jnp.clip(1 - (2 * (q1 * q3 - q0 * q2)) ** 2, 0.0, 1.0)
    pitch = jnp.arctan2(-2 * (q1 * q3 - q0 * q2), jnp.sqrt(clip_arg))
    roll = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 2 * (q0**2 + q3**2) - 1)
    e = jnp.stack([yaw, pitch, roll], axis=-1)
    return jnp.rad2deg(e) if degrees else e


def euler2quat(euler: jax.Array, north: bool = False, degrees: bool = True) -> jax.Array:
    """Euler (yaw, pitch, roll) -> scalar-first unit quaternion.

    Mirrors `src/spe/utils.py:167-232`.  ``euler`` is ``(..., 3)`` as
    ``[yaw, pitch, roll]`` in degrees (default).
    """
    e = jnp.deg2rad(euler) if degrees else euler
    half = e / 2
    cy, cp, cr = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sy, sp, sr = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    q = jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )
    if north:
        q = enforce_north(q)
    return normalize_quaternion(q)


def euler2dcm(euler: jax.Array, degrees: bool = True) -> jax.Array:
    """Euler (yaw, pitch, roll) -> 3x3 DCM.  Mirrors `src/spe/utils.py:235-290`."""
    e = jnp.deg2rad(euler) if degrees else euler
    cy, cp, cr = jnp.cos(e[..., 0]), jnp.cos(e[..., 1]), jnp.cos(e[..., 2])
    sy, sp, sr = jnp.sin(e[..., 0]), jnp.sin(e[..., 1]), jnp.sin(e[..., 2])
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def dcm2euler(dcm: jax.Array, degrees: bool = True) -> jax.Array:
    """3x3 DCM -> Euler (yaw, pitch, roll).  Mirrors `src/spe/utils.py:293-328`."""
    m11, m21, m31 = dcm[..., 0, 0], dcm[..., 1, 0], dcm[..., 2, 0]
    m32, m33 = dcm[..., 2, 1], dcm[..., 2, 2]
    yaw = jnp.arctan2(m21, m11)
    pitch = jnp.arctan2(-m31, jnp.sqrt(jnp.clip(1 - m31**2, 0.0, 1.0)))
    roll = jnp.arctan2(m32, m33)
    e = jnp.stack([yaw, pitch, roll], axis=-1)
    return jnp.rad2deg(e) if degrees else e


def multiply_quaternions(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Hamilton product of scalar-first quaternions (normalized like the
    reference, `src/spe/utils.py:331-363`).  Broadcasts over batch dims."""
    q0, q1, q2, q3 = qa[..., 0], qa[..., 1], qa[..., 2], qa[..., 3]
    p0, p1, p2, p3 = qb[..., 0], qb[..., 1], qb[..., 2], qb[..., 3]
    w = q0 * p0 - q1 * p1 - q2 * p2 - q3 * p3
    x = q0 * p1 + q1 * p0 + q2 * p3 - q3 * p2
    y = q0 * p2 + q2 * p0 - q1 * p3 + q3 * p1
    z = q0 * p3 + q3 * p0 + q1 * p2 - q2 * p1
    return normalize_quaternion(jnp.stack([w, x, y, z], axis=-1))


def conjugate_quaternion(q: jax.Array) -> jax.Array:
    """[w, x, y, z] -> [w, -x, -y, -z].  Mirrors `src/spe/utils.py:366-385`."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate_vector(q: jax.Array, v: jax.Array) -> jax.Array:
    """Actively rotate 3-vectors ``v`` by quaternions ``q``: R(q) @ v."""
    return jnp.einsum("...ij,...j->...i", quat2dcm(q), v)


def euler_angle_difference(angle1: jax.Array, angle2: jax.Array) -> jax.Array:
    """Circular angle difference wrapped to [-180, 180] degrees.

    Branch-free version of `src/spe/utils.py:388-412`.
    """
    diff = angle2 - angle1
    return jnp.mod(diff + 180.0, 360.0) - 180.0


def quat_angle(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Geodesic angle (radians) between two unit quaternions (sign-invariant)."""
    dot = jnp.clip(jnp.abs(jnp.sum(qa * qb, axis=-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(dot)


def generate_orientation(key: jax.Array, n_samples: int) -> jax.Array:
    """Uniform random unit quaternions, Shoemake's subgroup algorithm.

    JAX-PRNG port of `src/spe/utils.py:415-447` (same construction; the
    reference draws from ``np.random``).
    """
    x = jax.random.uniform(key, (3, n_samples))
    x0, x1, x2 = x[0], x[1], x[2]
    theta1 = 2 * jnp.pi * x1
    theta2 = 2 * jnp.pi * x2
    r1 = jnp.sqrt(1 - x0)
    r2 = jnp.sqrt(x0)
    return jnp.stack(
        [jnp.sin(theta1) * r1, jnp.cos(theta1) * r1, jnp.sin(theta2) * r2, jnp.cos(theta2) * r2],
        axis=-1,
    )
