"""JAX robot model: static kinematic tree + batched forward kinematics/Jacobians.

TPU-native replacement for xbot2_interface ``ModelInterface2`` (Pinocchio, C++) —
the reference calls it for FK (``getPose``), CoM (+velocity/Jacobian), frame
Jacobians, joint limits and inverse dynamics (reference wbid.py:20-27,316-324,
ros_run_simulation.py:347-352,431-438). Here the kinematic tree is baked into
static arrays at model-load time; all per-tick math is pure jnp, unrolled over
the (small, static) body count, and designed to be ``vmap``-ed over thousands of
scenarios (SURVEY.md §2.7).

Conventions (Pinocchio-compatible, SURVEY.md §2.5):
* ``q = [base_pos(3), base_quat wxyz(4), qj(nj)]`` — note the reference stores
  xyzw; use :func:`g1_locomotion_tpu.core.rotations.wxyz_from_xyzw` to adapt.
* ``v = [v_base_local(3), w_base_local(3), dqj(nj)]`` — base twist in base frame.
* Generalized acceleration follows the same tangent layout.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.core.spatial import Transform
from g1_locomotion_tpu.models.urdf import RobotSpec, parse_urdf, spec_from_dict

_ASSET_DIR = Path(__file__).parent / "assets"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Static robot description as device arrays + static tree metadata.

    Body 0 is the floating base; bodies 1..nb-1 each correspond to one actuated
    joint (all revolute for the G1 family). ``parent``, names and the ancestor
    mask are static Python data so the tree structure is compile-time constant.
    """

    # --- data (pytree leaves) ---
    joint_origin_p: jnp.ndarray  # (nb, 3)   joint placement in parent body frame
    joint_origin_R: jnp.ndarray  # (nb, 3, 3)
    joint_axis: jnp.ndarray      # (nb, 3)   local joint axis
    mass: jnp.ndarray            # (nb,)
    com: jnp.ndarray             # (nb, 3)   body-frame CoM offset
    inertia: jnp.ndarray         # (nb, 3, 3) about CoM, body frame
    q_lower: jnp.ndarray         # (nj,)
    q_upper: jnp.ndarray         # (nj,)
    dq_max: jnp.ndarray          # (nj,)
    tau_max: jnp.ndarray         # (nj,)
    frame_p: jnp.ndarray         # (nf, 3)   frame offset in owning body frame
    frame_R: jnp.ndarray         # (nf, 3, 3)

    # --- static metadata ---
    parent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    body_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    joint_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    frame_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    frame_body: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    # ancestor_mask[b, j] = 1 if joint j (body j+1's joint) is on the path from
    # the base to body b. Static numpy, folded into Jacobian einsums.
    ancestor_mask: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def nj(self) -> int:
        return self.nb - 1

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def nq(self) -> int:
        return 7 + self.nj

    @property
    def total_mass(self) -> jnp.ndarray:
        return jnp.sum(self.mass)

    def frame_index(self, name: str) -> int:
        return self.frame_names.index(name)

    def joint_index(self, name: str) -> int:
        return self.joint_names.index(name)


def model_from_spec(spec: RobotSpec, dtype=jnp.float32) -> RobotModel:
    nb = len(spec.bodies)
    parent = tuple(b.parent for b in spec.bodies)

    joint_origin_p = np.zeros((nb, 3))
    joint_origin_R = np.tile(np.eye(3), (nb, 1, 1))
    joint_axis = np.zeros((nb, 3))
    mass = np.zeros(nb)
    com = np.zeros((nb, 3))
    inertia = np.zeros((nb, 3, 3))
    q_lower, q_upper, dq_max, tau_max = [], [], [], []
    joint_names = []
    for i, b in enumerate(spec.bodies):
        mass[i] = b.mass
        com[i] = b.com
        inertia[i] = b.inertia
        if b.joint is not None:
            joint_origin_p[i] = b.joint.origin_xyz
            joint_origin_R[i] = b.joint.origin_rot
            joint_axis[i] = b.joint.axis
            q_lower.append(b.joint.limit_lower)
            q_upper.append(b.joint.limit_upper)
            dq_max.append(b.joint.velocity)
            tau_max.append(b.joint.effort)
            joint_names.append(b.joint.name)
            if b.joint.jtype not in ("revolute", "continuous"):
                raise NotImplementedError(
                    f"joint {b.joint.name}: only revolute joints supported"
                )

    ancestor = np.zeros((nb, nb - 1), dtype=np.int64)
    for b in range(1, nb):
        k = b
        while k > 0:
            ancestor[b, k - 1] = 1
            k = parent[k]

    return RobotModel(
        joint_origin_p=jnp.asarray(joint_origin_p, dtype),
        joint_origin_R=jnp.asarray(joint_origin_R, dtype),
        joint_axis=jnp.asarray(joint_axis, dtype),
        mass=jnp.asarray(mass, dtype),
        com=jnp.asarray(com, dtype),
        inertia=jnp.asarray(inertia, dtype),
        q_lower=jnp.asarray(np.array(q_lower), dtype),
        q_upper=jnp.asarray(np.array(q_upper), dtype),
        dq_max=jnp.asarray(np.array(dq_max), dtype),
        tau_max=jnp.asarray(np.array(tau_max), dtype),
        frame_p=jnp.asarray(np.stack([f.xyz for f in spec.frames]), dtype),
        frame_R=jnp.asarray(np.stack([f.rot for f in spec.frames]), dtype),
        parent=parent,
        body_names=tuple(b.name for b in spec.bodies),
        joint_names=tuple(joint_names),
        frame_names=tuple(f.name for f in spec.frames),
        frame_body=tuple(f.body for f in spec.frames),
        ancestor_mask=tuple(tuple(int(x) for x in row) for row in ancestor),
    )


def load_robot(variant: str = "g1_23dof", dtype=jnp.float32) -> RobotModel:
    """Load a robot variant from the bundled JSON assets (g1_23dof, g1_29dof,
    g1_29dof_with_hand, g1_dual_arm).

    Variants whose description lacks the locomotion contact frames (the stock
    Unitree ``g1_29dof_with_hand``) get them synthesized at the documented
    offsets from the ankle-roll links (g1_23dof.urdf:283-301: heel x=-0.05,
    toe x=+0.12, center x=0, all z=-0.03)."""
    d = json.loads((_ASSET_DIR / f"{variant}.json").read_text())
    spec = spec_from_dict(d)
    _ensure_foot_contact_frames(spec)
    _ensure_hand_contact_frames(spec)
    return model_from_spec(spec, dtype=dtype)


def _ensure_foot_contact_frames(spec) -> None:
    from g1_locomotion_tpu.models.urdf import FrameSpec
    import numpy as _np

    names = {f.name for f in spec.frames}
    offsets = {
        "line_contact_lower": [-0.05, 0.0, -0.03],
        "line_contact_upper": [0.12, 0.0, -0.03],
        "point_contact": [0.0, 0.0, -0.03],
    }
    for side in ("left", "right"):
        ankle = f"{side}_ankle_roll_link"
        body = next(
            (i for i, b in enumerate(spec.bodies) if b.name == ankle), None
        )
        if body is None:
            continue
        for suffix, xyz in offsets.items():
            name = f"{side}_foot_{suffix}"
            if name not in names:
                spec.frames.append(
                    FrameSpec(name, body, _np.array(xyz), _np.eye(3))
                )


def _ensure_hand_contact_frames(spec) -> None:
    """Synthesize ``{side}_hand_point_contact`` frames for variants whose
    description lacks them (the reference defines them for the rubber-hand
    arms, g1_23dof.urdf:855-859: +0.17 m along the rubber-hand x axis; the
    dexterous-hand variant has none, so its contact point is synthesized at
    the palm frame). These are the attachment points for the optional WBID
    hand-contact task (wbid/stack.py)."""
    from g1_locomotion_tpu.models.urdf import FrameSpec
    import numpy as _np

    frames = {f.name: f for f in spec.frames}
    for side in ("left", "right"):
        name = f"{side}_hand_point_contact"
        if name in frames:
            continue
        base = None
        off = _np.zeros(3)
        if f"{side}_rubber_hand" in frames:
            base = frames[f"{side}_rubber_hand"]
            off = _np.array([0.17, 0.0, 0.0])
        elif f"{side}_hand_palm_link" in frames:
            base = frames[f"{side}_hand_palm_link"]
        if base is None:
            continue
        spec.frames.append(
            FrameSpec(name, base.body, base.xyz + base.rot @ off,
                      base.rot.copy())
        )


def load_robot_from_urdf(urdf_string: str, dtype=jnp.float32) -> RobotModel:
    return model_from_spec(parse_urdf(urdf_string), dtype=dtype)


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------


def fk(model: RobotModel, q: jnp.ndarray) -> Transform:
    """World placement of every body: returns Transform with stacked leading body
    axis (R: (nb,3,3), p: (nb,3)). Single-sample; vmap for batches.

    All joint-local rotations are built in ONE vectorized Rodrigues pass;
    only the parent-chain composition (2 small matmuls per body) remains
    sequential — it is an ordered product along each kinematic chain, which
    no masked contraction can express."""
    base_R = rot.quat_to_matrix(q[3:7])
    base_p = q[0:3]
    Rs = [base_R]
    ps = [base_p]
    R_pb_all = model.joint_origin_R[1:] @ _axis_angle_matrix(
        model.joint_axis[1:], q[7:, None, None]
    )  # (nj, 3, 3) joint placements in parent, one fused pass
    for b in range(1, model.nb):
        pa = model.parent[b]
        R_w = Rs[pa] @ R_pb_all[b - 1]
        p_w = Rs[pa] @ model.joint_origin_p[b] + ps[pa]
        Rs.append(R_w)
        ps.append(p_w)
    return Transform(R=jnp.stack(Rs), p=jnp.stack(ps))


def _axis_angle_matrix(axis: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a (unit, static) axis."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    K = rot.skew(axis)
    return jnp.eye(3, dtype=axis.dtype) + s * K + (1.0 - c) * (K @ K)


def frame_pose(model: RobotModel, body_X: Transform, frame_idx: int) -> Transform:
    """World placement of a named frame (static index; use model.frame_index)."""
    b = model.frame_body[frame_idx]
    return Transform(R=body_X.R[b], p=body_X.p[b]).compose(
        Transform(R=model.frame_R[frame_idx], p=model.frame_p[frame_idx])
    )


def com_position(model: RobotModel, body_X: Transform) -> jnp.ndarray:
    """Whole-body CoM in world frame (replaces ModelInterface2.getCOM,
    ros_run_simulation.py:433)."""
    com_w = jnp.einsum("bij,bj->bi", body_X.R, model.com) + body_X.p
    return jnp.sum(model.mass[:, None] * com_w, axis=0) / model.total_mass


def _joint_world_geometry(model: RobotModel, body_X: Transform):
    """World axis and origin of each actuated joint (bodies 1..nb-1)."""
    # Joint frame rotation = parent_R @ origin_R; axis in world = that @ axis.
    parents = np.array(model.parent[1:])
    Rp = body_X.R[parents]  # (nj, 3, 3)
    pp = body_X.p[parents]
    axis_w = jnp.einsum(
        "jik,jkl,jl->ji", Rp, model.joint_origin_R[1:], model.joint_axis[1:]
    )
    origin_w = jnp.einsum("jik,jk->ji", Rp, model.joint_origin_p[1:]) + pp
    return axis_w, origin_w


def point_jacobian(
    model: RobotModel, q: jnp.ndarray, body_X: Transform, frame_idx: int
) -> jnp.ndarray:
    """World-frame linear velocity Jacobian (3, nv) of a named frame's origin.

    v_point_world = J @ v with v in the model's generalized-velocity layout
    (base twist local). Replaces ModelInterface2.getJacobian()[0:3] used in the
    torque extraction Jᵀf term (reference wbid.py:322-323).
    """
    J6 = frame_jacobian(model, q, body_X, frame_idx)
    return J6[:3]


def frame_jacobian(
    model: RobotModel, q: jnp.ndarray, body_X: Transform, frame_idx: int
) -> jnp.ndarray:
    """World-frame 6D Jacobian (6, nv): rows = [linear(3), angular(3)].

    Matches the "local world aligned" frame convention used by the OpenSoT
    Cartesian tasks w.r.t. "world" (reference wbid.py:67-115).
    """
    b = model.frame_body[frame_idx]
    base_R = body_X.R[0]
    X = frame_pose(model, body_X, frame_idx)
    p = X.p

    axis_w, origin_w = _joint_world_geometry(model, body_X)
    mask = jnp.asarray(
        np.array(model.ancestor_mask)[b], dtype=q.dtype
    )  # (nj,) static row

    # Joint columns.
    lin_cols = mask[:, None] * jnp.cross(axis_w, p[None, :] - origin_w)  # (nj, 3)
    ang_cols = mask[:, None] * axis_w

    # Base columns: v_p = R_b v_loc + (R_b w_loc) x (p - p_base).
    lin_base = jnp.concatenate(
        [base_R, -rot.skew(p - body_X.p[0]) @ base_R], axis=1
    )  # (3, 6)
    ang_base = jnp.concatenate([jnp.zeros_like(base_R), base_R], axis=1)

    J_lin = jnp.concatenate([lin_base, lin_cols.T], axis=1)
    J_ang = jnp.concatenate([ang_base, ang_cols.T], axis=1)
    return jnp.concatenate([J_lin, J_ang], axis=0)


def frame_jacobians(
    model: RobotModel,
    q: jnp.ndarray,
    body_X: Transform,
    frame_idxs,
) -> jnp.ndarray:
    """World-frame 6D Jacobians (K, 6, nv) for K static frames in ONE pass.

    Identical math to :func:`frame_jacobian` per frame, but the joint world
    geometry, frame poses, and mask products are batched over frames — a
    handful of ops for all K frames instead of ~8 ops each. This is the
    serving-latency path (WBIDConfig.fast_stack): at B=1 the task-stack
    assembly is op-LAUNCH-bound (round-5 decomposition: build_qp = 1.38 ms
    of the 1.59 ms tick), so op count, not FLOPs, is the budget.
    """
    K = len(frame_idxs)
    fi = np.asarray(frame_idxs)
    bodies = np.asarray(model.frame_body)[fi]  # (K,) static
    base_R = body_X.R[0]
    dtype = q.dtype

    # Frame poses, batched (frame_pose compose, vectorized over K).
    Rb = body_X.R[bodies]  # (K, 3, 3)
    pb = body_X.p[bodies]  # (K, 3)
    frame_p = jnp.asarray(np.array(model.frame_p))[fi]
    p = jnp.einsum("kij,kj->ki", Rb, frame_p) + pb  # (K, 3) world origins

    axis_w, origin_w = _joint_world_geometry(model, body_X)  # (nj, 3) each
    mask = jnp.asarray(
        np.array(model.ancestor_mask)[bodies], dtype=dtype
    )  # (K, nj) static rows

    # Joint columns, all frames at once.
    diff = p[:, None, :] - origin_w[None, :, :]  # (K, nj, 3)
    lin_cols = mask[:, :, None] * jnp.cross(
        jnp.broadcast_to(axis_w[None], diff.shape), diff
    )  # (K, nj, 3)
    ang_cols = mask[:, :, None] * axis_w[None]  # (K, nj, 3)

    # Base columns: v_p = R_b v_loc + (R_b w_loc) x (p - p_base).
    d = p - body_X.p[0][None, :]  # (K, 3)
    skew_d = rot.skew(d)  # (K, 3, 3) (skew is batched over leading dims)
    lin_base = jnp.concatenate(
        [jnp.broadcast_to(base_R[None], (K, 3, 3)),
         -jnp.einsum("kij,jl->kil", skew_d, base_R)],
        axis=2,
    )  # (K, 3, 6)
    ang_base = jnp.concatenate(
        [jnp.zeros((K, 3, 3), dtype),
         jnp.broadcast_to(base_R[None], (K, 3, 3))],
        axis=2,
    )

    J_lin = jnp.concatenate([lin_base, jnp.swapaxes(lin_cols, 1, 2)], axis=2)
    J_ang = jnp.concatenate([ang_base, jnp.swapaxes(ang_cols, 1, 2)], axis=2)
    return jnp.concatenate([J_lin, J_ang], axis=1)  # (K, 6, nv)


def com_jacobian(model: RobotModel, q: jnp.ndarray, body_X: Transform) -> jnp.ndarray:
    """World-frame CoM linear Jacobian (3, nv) (replaces getCOMJacobian,
    reference run_simulation.py:71)."""
    base_R = body_X.R[0]
    com_b_w = jnp.einsum("bij,bj->bi", body_X.R, model.com) + body_X.p  # (nb,3)
    total_com = jnp.sum(model.mass[:, None] * com_b_w, axis=0) / model.total_mass

    axis_w, origin_w = _joint_world_geometry(model, body_X)
    mask = jnp.asarray(np.array(model.ancestor_mask), dtype=q.dtype)  # (nb, nj)

    # Column j = sum_b m_b/M * mask[b,j] * a_j x (com_b - o_j)
    diff = com_b_w[:, None, :] - origin_w[None, :, :]  # (nb, nj, 3)
    contrib = jnp.cross(jnp.broadcast_to(axis_w[None], diff.shape), diff)
    w = (model.mass[:, None] * mask) / model.total_mass  # (nb, nj)
    Jj = jnp.einsum("bj,bjk->kj", w, contrib)  # (3, nj)

    lin_base = jnp.concatenate(
        [base_R, -rot.skew(total_com - body_X.p[0]) @ base_R], axis=1
    )
    return jnp.concatenate([lin_base, Jj], axis=1)


def com_velocity(
    model: RobotModel, q: jnp.ndarray, v: jnp.ndarray, body_X: Transform
) -> jnp.ndarray:
    """World-frame CoM linear velocity (replaces getCOMVelocity,
    ros_run_simulation.py:438)."""
    return com_jacobian(model, q, body_X) @ v


def integrate_q(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate configuration with tangent v (base twist local): Lie-group step
    on the free-flyer, Euler on joints."""
    base_R = rot.quat_to_matrix(q[3:7])
    dp_world = base_R @ v[0:3] * dt
    w_world = base_R @ v[3:6]
    new_quat = rot.quat_integrate(q[3:7], w_world, dt)
    return jnp.concatenate([q[0:3] + dp_world, new_quat, q[7:] + v[6:] * dt])
