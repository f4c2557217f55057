"""Batched whole-body dynamics: RNEA, CRBA, bias forces (pure JAX).

TPU-native replacement for the C++ Pinocchio calls the reference makes through
xbot2_interface: ``computeInverseDynamics`` (RNEA, wbid.py:320) and the mass
matrix / dynamic-feasibility machinery inside OpenSoT's ``DynamicFeasibility``
constraint (wbid.py:184-190). Single-sample functions over the static tree;
``vmap`` batches them over scenarios.

Formulation (round 3): **world-frame masked spatial algebra** instead of the
classic sequential parent→child propagation. Every joint's unit twist is
expressed in world Plücker coordinates (moment about the world origin,
linear-first); body twists/accelerations are then ANCESTOR-MASK matmuls over
the joint twists, composite inertias are mask matmuls over per-body world
spatial inertias, and torques are the transposed mask matmul of the body
forces — O(1) trace depth and a handful of dense einsums instead of ~nb
sequential small-op blocks (and CRBA's O(nb·depth) inner propagation). This
is what makes the fused engine's compile time CI-viable and keeps the hot
path on fused batched matmuls on the MXU.

The round-1/2 sequential implementations are kept as ``_rnea_unrolled`` /
``_crba_unrolled`` — they are the independently-derived oracle the
equivalence test (tests/test_dynamics.py) checks the masked forms against.

Layouts follow :mod:`g1_locomotion_tpu.models.robot`: motion vectors are
linear-first, base twist in base-local frame (Pinocchio convention).
"""

from __future__ import annotations

import numpy as np

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
from g1_locomotion_tpu.models.robot import (
    RobotModel,
    _axis_angle_matrix,
    _joint_world_geometry,
    fk,
)

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


# ---------------------------------------------------------------------------
# World-frame masked formulation (the production path)
# ---------------------------------------------------------------------------


def _base_plucker(body_X: Transform) -> jnp.ndarray:
    """(6,6) motion transform taking base-LOCAL twists [v, w] to world
    Plücker coordinates (moment about the world origin):
    v_O = R0 v + p0 x (R0 w), w_w = R0 w."""
    R0, p0 = body_X.R[0], body_X.p[0]
    Z = jnp.zeros_like(R0)
    top = jnp.concatenate([R0, rot.skew(p0) @ R0], axis=1)
    bot = jnp.concatenate([Z, R0], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_plucker(model: RobotModel, body_X: Transform) -> jnp.ndarray:
    """(nj, 6) unit twist of every joint in world Plücker coordinates:
    S_j = [o_j x a_j, a_j] (axis a through point o)."""
    axis_w, origin_w = _joint_world_geometry(model, body_X)
    return jnp.concatenate([jnp.cross(origin_w, axis_w), axis_w], axis=-1)


def _world_inertias(model: RobotModel, body_X: Transform) -> SpatialInertia:
    """Per-body spatial inertia about the WORLD ORIGIN, world axes (stacked
    (nb,...) SpatialInertia)."""
    com_w = (
        jnp.einsum("bij,bj->bi", body_X.R, model.com) + body_X.p
    )  # (nb, 3) world com positions
    I_com_w = jnp.einsum(
        "bij,bjk,blk->bil", body_X.R, model.inertia, body_X.R
    )  # R I R^T
    return spatial_inertia_from_params(model.mass, com_w, I_com_w)


def _ancestor_mask(model: RobotModel, dtype) -> jnp.ndarray:
    """(nb, nj) constant: mask[b, j] = 1 iff joint j (moving body j+1) is on
    the base→body-b path, self included."""
    return jnp.asarray(np.array(model.ancestor_mask), dtype)


def rnea(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    a: jnp.ndarray,
    gravity: float = GRAVITY,
    body_X: Transform | None = None,
) -> jnp.ndarray:
    """Inverse dynamics: tau(nv) with tau[0:6] = base wrench (linear-first,
    base frame) and tau[6:] = joint torques.

    Mirrors ModelInterface2.computeInverseDynamics (reference wbid.py:320):
    the caller subtracts Jcᵀ f per contact to get actuated torques.

    World-Plücker masked form: body twists are ``B v_base + mask @ (S qd)``,
    spatial accelerations unroll the Featherstone recursion the same way
    (the Ṡ term uses the CHILD body twist — exact, since (S qd) ×ₘ S = 0),
    and generalized forces are the transposed-mask contraction of the
    per-body net spatial forces. Pass ``body_X`` (robot.fk output) to reuse
    an FK already computed this tick.
    """
    if body_X is None:
        body_X = fk(model, q)
    B = _base_plucker(body_X)
    S = _joint_plucker(model, body_X)  # (nj, 6)
    AM = _ancestor_mask(model, q.dtype)  # (nb, nj)

    qd, qdd = v[6:], a[6:]
    Sqd = S * qd[:, None]  # (nj, 6)
    tw = (B @ v[0:6])[None, :] + AM @ Sqd  # (nb, 6) world body twists

    # Gravity trick: the root accelerates upward at g (uniform translation —
    # moment-free, identical at every point).
    a_grav = jnp.zeros(6, q.dtype).at[2].set(jnp.asarray(gravity, q.dtype))
    Sdot_qd = motion_cross(tw[1:], Sqd)  # (nj, 6): v_child ×m S qd
    A = (
        (a_grav + B @ a[0:6])[None, :]
        + AM @ (S * qdd[:, None] + Sdot_qd)
    )  # (nb, 6) world spatial accelerations (incl. gravity offset)

    Iw = _world_inertias(model, body_X)
    F = Iw.apply(A) + motion_cross_force(tw, Iw.apply(tw))  # (nb, 6)

    tau_j = jnp.einsum("bj,bk,jk->j", AM, F, S)  # subtree force ⋅ joint twist
    tau_base = B.T @ jnp.sum(F, axis=0)  # total wrench, base-local coords
    return jnp.concatenate([tau_base, tau_j])


def bias_force(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    gravity: float = GRAVITY,
    body_X: Transform | None = None,
) -> jnp.ndarray:
    """h(q, v) = C(q,v)v + g(q) — the nonlinear-effects vector."""
    return rnea(
        model, q, v, jnp.zeros(model.nv, dtype=q.dtype), gravity, body_X
    )


def gravity_force(
    model: RobotModel,
    q: jnp.ndarray,
    gravity: float = GRAVITY,
    body_X: Transform | None = None,
) -> jnp.ndarray:
    z = jnp.zeros(model.nv, dtype=q.dtype)
    return rnea(model, q, z, z, gravity, body_X)


def crba(
    model: RobotModel,
    q: jnp.ndarray,
    body_X: Transform | None = None,
) -> jnp.ndarray:
    """Joint-space mass matrix M (nv, nv) via Composite Rigid Body Algorithm.

    Block layout: [[M_base(6x6), M_bj(6xnj)], [M_bjᵀ, M_jj]] with the base block
    expressed in the base frame, linear-first — consistent with :func:`rnea` so
    that rnea(q, 0, a) == M @ a + g(q).

    World-Plücker masked form: the composite (subtree) inertia of every joint
    is one mask matmul over the per-body world spatial inertias; M[i,j] =
    S_i ⋅ (Ic_j S_j) for i ancestor-or-self of j is then a single (nj, nj)
    gram matrix masked by the joint-joint ancestry relation.
    """
    if body_X is None:
        body_X = fk(model, q)
    B = _base_plucker(body_X)
    S = _joint_plucker(model, body_X)  # (nj, 6)
    AM = _ancestor_mask(model, q.dtype)  # (nb, nj)

    I6 = _world_inertias(model, body_X).to_matrix()  # (nb, 6, 6)
    Ic = jnp.einsum("bj,bkl->jkl", AM, I6)  # (nj,6,6) subtree inertias
    Fc = jnp.einsum("jkl,jl->jk", Ic, S)  # (nj, 6)

    G = S @ Fc.T  # G[i, j] = S_i ⋅ Ic_j S_j
    JJ = AM[1:, :]  # (nj, nj): JJ[j, i] = 1 iff joint i anc-or-self of joint j
    Mjj_u = G * JJ.T  # keep entries where i is ancestor-or-self of j
    Mjj = Mjj_u + Mjj_u.T - jnp.diag(jnp.diag(Mjj_u))

    Mbj = B.T @ Fc.T  # (6, nj) base coupling
    M00 = B.T @ jnp.sum(I6, axis=0) @ B  # whole-robot inertia, base coords

    top = jnp.concatenate([M00, Mbj], axis=1)
    bot = jnp.concatenate([Mbj.T, Mjj], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def forward_dynamics(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    tau: jnp.ndarray,
    gravity: float = GRAVITY,
    body_X: Transform | None = None,
) -> jnp.ndarray:
    """a = M⁻¹ (tau - h). Dense solve; fine at nv=29, batched by vmap."""
    if body_X is None:
        body_X = fk(model, q)
    M = crba(model, q, body_X)
    h = bias_force(model, q, v, gravity, body_X)
    return jnp.linalg.solve(M, tau - h)


# ---------------------------------------------------------------------------
# Sequential reference implementations (round-1/2 production path; now the
# independently-derived oracle for the masked forms — test-only)
# ---------------------------------------------------------------------------


def _rnea_unrolled(
    model: RobotModel,
    q: jnp.ndarray,
    v: jnp.ndarray,
    a: jnp.ndarray,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Classic two-pass RNEA in body-local coordinates, Python-unrolled."""
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


def _crba_unrolled(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """Classic CRBA with sequential subtree propagation, Python-unrolled."""
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
