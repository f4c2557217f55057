"""SO(3) utilities: quaternions, rotation matrices, Euler angles, skew maps.

TPU-native rotation library replacing the reference's use of ROS ``tf.transformations``
(reference: g1_mujoco_sim/src/ros_run_simulation.py:366,431 and wbid.py:248).

Conventions
-----------
* Quaternions are **scalar-first** ``(w, x, y, z)`` (MuJoCo convention). Helpers are
  provided for the scalar-last ``(x, y, z, w)`` (Pinocchio/xbot) layout because the
  reference permutes between the two (ros_run_simulation.py:220-228); keeping both
  explicit avoids the classic convention bug called out in SURVEY.md §2.5.
* Euler angles are intrinsic roll-pitch-yaw ``(r, p, y)`` with
  ``R = Rz(y) @ Ry(p) @ Rx(r)`` — identical to ``tf.transformations.euler_matrix``'s
  default 'sxyz' convention used by the reference (wbid.py:248).

All functions are pure jnp, shape-polymorphic over leading batch dims, and safe
under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix S(v) with S(v) @ u = v x u. Batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z) quaternion -> 3x3 rotation matrix. Batched."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> (w,x,y,z) quaternion. Batched, branch-free.

    Uses the numerically-stable 4-candidate construction: computes all four
    |q_i|^2 candidates and selects the largest via where-masking (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Dominance scores (the 4*q_i^2 values).
    s = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(s, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (w,x,y,z). Batched."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (world = R(q) @ v). Batched."""
    # v' = v + 2*w*(u x v) + 2*(u x (u x v)) with u = q.xyz
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle -> (w,x,y,z)."""
    half = angle / 2.0
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def rpy_to_matrix(rpy: jnp.ndarray) -> jnp.ndarray:
    """Roll-pitch-yaw -> rotation matrix, R = Rz(y) Ry(p) Rx(r).

    Matches ``tf.transformations.euler_matrix(r, p, y)`` ('sxyz'), the convention
    the reference feeds the WBID base-orientation task (wbid.py:247-248).
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> roll-pitch-yaw (inverse of rpy_to_matrix).

    Matches ``tf.transformations.euler_from_matrix`` used when packing the SRBD
    state (ros_run_simulation.py:431). Gimbal-safe via clipped asin.
    """
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    p = jnp.arcsin(sp)
    r = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([r, p, y], axis=-1)


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rpy(quat_to_matrix(q))


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_quat(rpy_to_matrix(rpy))


def yaw_matrix(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rz(yaw) — the SRBD linearization rotates body rates by yaw only (SURVEY §2.3)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def wxyz_from_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """Pinocchio/xbot (x,y,z,w) -> internal (w,x,y,z) (ros_run_simulation.py:220-228)."""
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def xyzw_from_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    """Internal (w,x,y,z) -> Pinocchio/xbot (x,y,z,w)."""
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation quaternion with world-frame angular velocity over dt."""
    angle = jnp.linalg.norm(omega_world, axis=-1)
    # Safe normalize: fall back to x-axis for ~zero rotation (sin(0)=0 kills it anyway).
    safe = jnp.where(angle[..., None] > 1e-12, omega_world, jnp.ones_like(omega_world))
    axis = safe / jnp.linalg.norm(safe, axis=-1, keepdims=True)
    dq = quat_from_axis_angle(axis, angle * dt)
    return quat_normalize(quat_mul(dq, q))
