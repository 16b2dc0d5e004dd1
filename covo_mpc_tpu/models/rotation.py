"""Batch-first quaternion / SO(3) algebra.

All functions broadcast over arbitrary leading batch dimensions: a solver
rolling out N samples calls these on ``(N, 4)`` quaternion arrays directly
rather than vmapping scalar kernels — on TPU that turns every op into a
single wide VPU instruction stream instead of N tiny programs.

Quaternion convention is (x, y, z, w), matching the reference
(reference: quadjax/dynamics/geom.py:5-120). Functional parity with the
reference ops is pinned by tests/test_rotation.py against closed-form
identities and the reference implementation itself.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (reference: geom.py:5-7)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (x, y, z, w) quaternions (reference: geom.py:18-25).

    Broadcasts over leading dims: (N, 4) x (4,) -> (N, 4).
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - (x1 * x2 + y1 * y2 + z1 * z2)
    x = w1 * x2 + w2 * x1 + (y1 * z2 - z1 * y2)
    y = w1 * y2 + w2 * y1 + (z1 * x2 - x1 * z2)
    z = w1 * z2 + w2 * z1 + (x1 * y2 - y1 * x2)
    return jnp.stack([x, y, z, w], axis=-1)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit quaternion."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """One Euler step of quaternion kinematics, renormalized
    (reference: geom.py:10-15): q <- normalize(q + dt * 0.5 * q x (omega, 0)).
    """
    omega_quat = jnp.concatenate(
        [omega, jnp.zeros(omega.shape[:-1] + (1,), dtype=omega.dtype)], axis=-1
    )
    q_dot = 0.5 * quat_mul(q, omega_quat)
    return quat_normalize(q + dt * q_dot)


def rotate_vec(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: q x (v, 0) x q*
    (reference: geom.py:28-32)."""
    vq = jnp.concatenate(
        [v, jnp.zeros(v.shape[:-1] + (1,), dtype=v.dtype)], axis=-1
    )
    return quat_mul(quat_mul(q, vq), quat_conj(q))[..., :3]


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> rotation matrix, homogeneous form (reference: geom.py:69-77).

    Uses the homogeneous expansion (diagonal terms w^2 + x^2 - y^2 - z^2 etc.)
    which scales by ||q||^2 for non-unit input — exactly the behavior of the
    reference's H^T T L(q) T L(q) H composition, which downstream code relies
    on when fed un-normalized noisy quaternions (reference: pid.py:43).
    Returns shape (..., 3, 3).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz, ww = x * x, y * y, z * z, w * w
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = ww + xx - yy - zz
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = ww - xx + yy - zz
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = ww - xx - yy + zz
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def body_z_world(q: jnp.ndarray) -> jnp.ndarray:
    """Third column of R(q): where the body z-axis (thrust axis) points.

    Cheap path for the dynamics hot loop — R @ [0, 0, 1] without forming R.
    Homogeneous (scales by ||q||^2) like :func:`quat_to_rotmat`.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            2.0 * (x * z + w * y),
            2.0 * (y * z - w * x),
            w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w) (reference: geom.py:80-87).

    Uses the w-branch formula only (valid for w bounded away from 0), matching
    the reference's single-branch implementation.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    w = 0.5 * jnp.sqrt(1.0 + tr)
    scale = 0.5 / jnp.sqrt(1.0 + tr)
    x = scale * (R[..., 2, 1] - R[..., 1, 2])
    y = scale * (R[..., 0, 2] - R[..., 2, 0])
    z = scale * (R[..., 1, 0] - R[..., 0, 1])
    return jnp.stack([x, y, z, w], axis=-1)


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw) Euler angles (reference: geom.py:97-104)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(2.0 * (w * y - z * x))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rp_to_quat(rp: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues parameters -> unit quaternion (x, y, z, w)
    (reference: geom.py:90-91): q = [rp, 1] / sqrt(1 + |rp|^2).
    Broadcasts over leading dims."""
    ones = jnp.ones(rp.shape[:-1] + (1,), dtype=rp.dtype)
    n = jnp.sqrt(1.0 + jnp.sum(rp * rp, axis=-1, keepdims=True))
    return jnp.concatenate([rp, ones], axis=-1) / n


def quat_to_rp(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) -> Rodrigues parameters
    (reference: geom.py:94-95): rp = q_xyz / q_w. Broadcasts over leading
    dims; singular at q_w = 0 (180-degree rotations), like the reference."""
    return q[..., 0:3] / q[..., 3:4]


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw only — the piece the tracking reward needs
    (reference: utils.py:290)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of v (reference: geom.py:36-39)."""
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    row0 = jnp.stack([zeros, -vz, vy], axis=-1)
    row1 = jnp.stack([vz, zeros, -vx], axis=-1)
    row2 = jnp.stack([-vy, vx, zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def vee(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: skew matrix -> vector (reference: geom.py:114-120)."""
    return jnp.stack([R[..., 2, 1], R[..., 0, 2], R[..., 1, 0]], axis=-1)


def axis_angle_to_rotmat(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Rodrigues' formula (reference: geom.py:106-112). Normalizes axis."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    K = hat(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    ang = jnp.asarray(angle)[..., None, None]
    return eye + jnp.sin(ang) * K + (1.0 - jnp.cos(ang)) * (K @ K)
