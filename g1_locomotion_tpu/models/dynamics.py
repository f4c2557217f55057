"""Batched whole-body dynamics: RNEA, CRBA, bias forces (pure JAX).

TPU-native replacement for the C++ Pinocchio calls the reference makes through
xbot2_interface: ``computeInverseDynamics`` (RNEA, wbid.py:320) and the mass
matrix / dynamic-feasibility machinery inside OpenSoT's ``DynamicFeasibility``
constraint (wbid.py:184-190). Single-sample functions over the static tree;
``vmap`` batches them over scenarios. Loops are unrolled over the static body
count (24 for G1-23DoF) so XLA sees a flat, fusable graph.

Layouts follow :mod:`g1_locomotion_tpu.models.robot`: motion vectors are
linear-first, base twist in base-local frame (Pinocchio convention).
"""

from __future__ import annotations

import jax.numpy as jnp

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.core.spatial import (
    SpatialInertia,
    Transform,
    force_transform,
    inertia_add,
    inertia_transform,
    motion_cross,
    motion_cross_force,
    motion_transform_inv,
    spatial_inertia_from_params,
)
from g1_locomotion_tpu.models.robot import RobotModel, _axis_angle_matrix

GRAVITY = 9.80665  # m/s^2 — the value the reference publishes (ros_run_simulation.py:58)


def _joint_transforms(model: RobotModel, q: jnp.ndarray) -> Transform:
    """Placement of each body in its parent (X_up). Body 0 = base in world."""
    base_R = rot.quat_to_matrix(q[3:7])
    Rs = [base_R]
    ps = [q[0:3]]
    qj = q[7:]
    for b in range(1, model.nb):
        Rj = _axis_angle_matrix(model.joint_axis[b], qj[b - 1])
        Rs.append(model.joint_origin_R[b] @ Rj)
        ps.append(model.joint_origin_p[b])
    return Transform(R=jnp.stack(Rs), p=jnp.stack(ps))


def _body_inertias(model: RobotModel) -> SpatialInertia:
    return spatial_inertia_from_params(model.mass, model.com, model.inertia)


def _S(model: RobotModel, b: int, dtype) -> jnp.ndarray:
    """Motion subspace of joint b (revolute): [0(3), axis(3)]."""
    return jnp.concatenate([jnp.zeros(3, dtype=dtype), model.joint_axis[b]])


def rnea(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    a: jnp.ndarray,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Inverse dynamics: tau(nv) with tau[0:6] = base wrench (linear-first,
    base frame) and tau[6:] = joint torques.

    Mirrors ModelInterface2.computeInverseDynamics (reference wbid.py:320):
    the caller subtracts Jcᵀ f per contact to get actuated torques.
    """
    X = _joint_transforms(model, q)
    I = _body_inertias(model)

    # Gravity trick: root "parent" accelerates upward at g (world frame).
    a_grav_world = jnp.array([0.0, 0.0, gravity, 0.0, 0.0, 0.0], dtype=q.dtype)

    X0 = Transform(R=X.R[0], p=X.p[0])
    v_b = [v[0:6]]
    a_b = [motion_transform_inv(X0, a_grav_world) + a[0:6]]
    f_b = []

    for b in range(1, model.nb):
        Xb = Transform(R=X.R[b], p=X.p[b])
        S = _S(model, b, q.dtype)
        vj = S * v[6 + b - 1]
        pa = model.parent[b]
        vb = motion_transform_inv(Xb, v_b[pa]) + vj
        ab = (
            motion_transform_inv(Xb, a_b[pa])
            + S * a[6 + b - 1]
            + motion_cross(vb, vj)
        )
        v_b.append(vb)
        a_b.append(ab)

    for b in range(model.nb):
        Ib = SpatialInertia(m=I.m[b], h=I.h[b], I=I.I[b])
        f_b.append(Ib.apply(a_b[b]) + motion_cross_force(v_b[b], Ib.apply(v_b[b])))

    tau_j = [None] * model.nj
    for b in range(model.nb - 1, 0, -1):
        S = _S(model, b, q.dtype)
        tau_j[b - 1] = jnp.dot(S, f_b[b])
        Xb = Transform(R=X.R[b], p=X.p[b])
        f_b[model.parent[b]] = f_b[model.parent[b]] + force_transform(Xb, f_b[b])

    return jnp.concatenate([f_b[0], jnp.stack(tau_j)])


def bias_force(
    model: RobotModel, q: jnp.ndarray, v: jnp.ndarray, gravity: float = GRAVITY
) -> jnp.ndarray:
    """h(q, v) = C(q,v)v + g(q) — the nonlinear-effects vector."""
    return rnea(model, q, v, jnp.zeros(model.nv, dtype=q.dtype), gravity)


def gravity_force(model: RobotModel, q: jnp.ndarray, gravity: float = GRAVITY) -> jnp.ndarray:
    z = jnp.zeros(model.nv, dtype=q.dtype)
    return rnea(model, q, z, z, gravity)


def crba(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space mass matrix M (nv, nv) via Composite Rigid Body Algorithm.

    Block layout: [[M_base(6x6), M_bj(6xnj)], [M_bjᵀ, M_jj]] with the base block
    expressed in the base frame, linear-first — consistent with :func:`rnea` so
    that rnea(q, 0, a) == M @ a + g(q).
    """
    X = _joint_transforms(model, q)
    I = _body_inertias(model)
    Ic = [SpatialInertia(m=I.m[b], h=I.h[b], I=I.I[b]) for b in range(model.nb)]

    for b in range(model.nb - 1, 0, -1):
        Xb = Transform(R=X.R[b], p=X.p[b])
        pa = model.parent[b]
        Ic[pa] = inertia_add(Ic[pa], inertia_transform(Xb, Ic[b]))

    nv = model.nv
    M = jnp.zeros((nv, nv), dtype=q.dtype)
    M = M.at[0:6, 0:6].set(Ic[0].to_matrix())

    for b in range(1, model.nb):
        S = _S(model, b, q.dtype)
        F = Ic[b].apply(S)  # force vector in body b frame
        M = M.at[6 + b - 1, 6 + b - 1].set(jnp.dot(S, F))
        k = b
        while model.parent[k] > 0:
            Xk = Transform(R=X.R[k], p=X.p[k])
            F = force_transform(Xk, F)
            k = model.parent[k]
            Sk = _S(model, k, q.dtype)
            val = jnp.dot(Sk, F)
            M = M.at[6 + b - 1, 6 + k - 1].set(val)
            M = M.at[6 + k - 1, 6 + b - 1].set(val)
        # Propagate into the base frame for the floating-base coupling block.
        Xk = Transform(R=X.R[k], p=X.p[k])
        F = force_transform(Xk, F)
        M = M.at[0:6, 6 + b - 1].set(F)
        M = M.at[6 + b - 1, 0:6].set(F)

    return M


def forward_dynamics(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    tau: jnp.ndarray,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """a = M⁻¹ (tau - h). Dense solve; fine at nv=29, batched by vmap."""
    M = crba(model, q)
    h = bias_force(model, q, v, gravity)
    return jnp.linalg.solve(M, tau - h)
