"""WBID stack compiler: tasks/constraints -> dense QP blocks (pure JAX).

Replaces OpenSoT's C++ ``AutoStack`` + ``iHQP`` machinery (reference
wbid.py:29-224). Each task contributes a weighted least-squares block
``(A_i, b_i, w_i)``; each constraint contributes rows ``(C_j, l_j, u_j)``. The
assembled QP

    min_x  sum_i w_i ||A_i x - b_i||^2     s.t.  l <= C x <= u
    x = [qddot (nv), f (4 contacts x 3)]

is solved by the shared batched ADMM (:mod:`g1_locomotion_tpu.ops.qp`).

Task switching (stance<->swing) is expressed by *masking weights and bounds*
(weights -> 0, wrench boxes -> [0,0]) with static shapes — the jit-compatible
equivalent of the reference's imperative ``setActive``/``setWrenchLimits``
(ros_run_simulation.py:230-244).

Drift terms (Jdot*v) are obtained by forward-mode autodiff of frame/CoM
velocities along the current motion — no hand-derived Hessians.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.core.rotations import skew
from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.wbid.tasks import WBIDGains, WBIDReferences

# Contact frames, same order as the reference (wbid.py:39-44).
CONTACT_FRAMES = (
    "left_foot_line_contact_lower",
    "left_foot_line_contact_upper",
    "right_foot_line_contact_lower",
    "right_foot_line_contact_upper",
)
FOOT_FRAMES = ("left_foot_point_contact", "right_foot_point_contact")
NF = 4  # contact force variables
NX_F = 3 * NF


HAND_FRAMES = ("left_hand_point_contact", "right_hand_point_contact")


class StackIndices(NamedTuple):
    """Static frame indices resolved once per model."""

    contacts: Tuple[int, ...]
    feet: Tuple[int, ...]
    pelvis: int
    hands: Tuple[int, ...] = ()  # hand point contacts (empty if the
                                 # variant has no arms/hands)
    torso: int = -1              # torso_link (-1 if the variant has none)

    @staticmethod
    def from_model(model: RobotModel) -> "StackIndices":
        return StackIndices(
            contacts=tuple(model.frame_index(f) for f in CONTACT_FRAMES),
            feet=tuple(model.frame_index(f) for f in FOOT_FRAMES),
            pelvis=model.frame_index("pelvis"),
            hands=tuple(
                model.frame_index(f) for f in HAND_FRAMES
                if f in model.frame_names
            ),
            torso=(
                model.frame_index("torso_link")
                if "torso_link" in model.frame_names else -1
            ),
        )


def _frame_vel(model, q, v, fidx):
    X = rb.fk(model, q)
    return rb.frame_jacobian(model, q, X, fidx) @ v


def _frame_drift(model, q, v, fidx):
    """Jdot(q) v of a frame's 6D world velocity (q''=0 classical acceleration)."""
    f = lambda t: _frame_vel(model, rb.integrate_q(model, q, v, t), v, fidx)
    return jax.jvp(f, (0.0,), (1.0,))[1]


def _frames_drift(model, q, v, fidxs, rows=slice(None)):
    """Jdot v for several frames in ONE jvp pass (shared FK) — compile-time
    and FLOP saver over per-frame jvp."""

    def f(t):
        q_t = rb.integrate_q(model, q, v, t)
        X_t = rb.fk(model, q_t)
        return jnp.concatenate(
            [(rb.frame_jacobian(model, q_t, X_t, fi) @ v)[rows] for fi in fidxs]
        )

    return jax.jvp(f, (0.0,), (1.0,))[1]


def _all_task_drifts(model, q, v, idx):
    """One jvp pass computing every WBID task drift:
    returns (com(3), base6(6), foot0(6), foot1(6), L_dot_drift(3))."""

    def f(t):
        q_t = rb.integrate_q(model, q, v, t)
        X_t = rb.fk(model, q_t)
        com_v = rb.com_jacobian(model, q_t, X_t) @ v
        base6 = rb.frame_jacobian(model, q_t, X_t, idx.pelvis) @ v
        f0 = rb.frame_jacobian(model, q_t, X_t, idx.feet[0]) @ v
        f1 = rb.frame_jacobian(model, q_t, X_t, idx.feet[1]) @ v
        L = angular_momentum(model, q_t, v, X_t)
        return jnp.concatenate([com_v, base6, f0, f1, L])

    d = jax.jvp(f, (0.0,), (1.0,))[1]
    return d[0:3], d[3:9], d[9:15], d[15:21], d[21:24]


def _all_task_drifts_fast(model, q, v, idx):
    """Op-count-lean twin of :func:`_all_task_drifts` (same mathematical
    values): frame velocities via the BATCHED multi-frame Jacobian and the
    momentum via A_G(q) v (the closed-form centroidal matrix) instead of the
    per-body sequential loop — the jvp then differentiates a handful of
    einsums rather than ~nb small-op blocks. Serving-latency path
    (WBIDConfig.fast_stack)."""

    def f(t):
        q_t = rb.integrate_q(model, q, v, t)
        X_t = rb.fk(model, q_t)
        com_v = rb.com_jacobian(model, q_t, X_t) @ v
        Js = rb.frame_jacobians(
            model, q_t, X_t, (idx.pelvis,) + tuple(idx.feet)
        )  # (3, 6, nv)
        vels = jnp.einsum("kin,n->ki", Js, v).reshape(-1)  # (18,)
        L = centroidal_momentum_matrix(model, q_t, X_t) @ v
        return jnp.concatenate([com_v, vels, L])

    d = jax.jvp(f, (0.0,), (1.0,))[1]
    return d[0:3], d[3:9], d[9:15], d[15:21], d[21:24]


def angular_momentum(model: RobotModel, q, v, body_X) -> jnp.ndarray:
    """Centroidal angular momentum L about the whole-body CoM."""
    com = rb.com_position(model, body_X)
    return _angular_momentum_impl(model, q, v, body_X, com)


def centroidal_momentum_matrix(model: RobotModel, q, body_X) -> jnp.ndarray:
    """Angular part of the centroidal momentum matrix A_G (3, nv): L = A_G v.

    Closed-form assembly (no autodiff): each body contributes
    I_b^w J_b^ang + m_b S(c_b - c) J_b^lin(com_b), built from the shared joint
    world geometry with the static ancestor mask — one einsum sweep instead of
    a 29-tangent jacfwd (which dominated compile time).
    """
    dtype = q.dtype
    nb, nj, nv = model.nb, model.nj, model.nv
    import numpy as _np

    com_b = jnp.einsum("bij,bj->bi", body_X.R, model.com) + body_X.p  # (nb,3)
    com = jnp.sum(model.mass[:, None] * com_b, axis=0) / model.total_mass
    I_w = jnp.einsum("bij,bjk,blk->bil", body_X.R, model.inertia, body_X.R)

    axis_w, origin_w = rb._joint_world_geometry(model, body_X)  # (nj,3) each
    mask = jnp.asarray(_np.array(model.ancestor_mask), dtype)   # (nb, nj)

    # Joint columns.
    # omega_b contribution: mask[b,j] * axis_j
    # v_com_b contribution: mask[b,j] * axis_j x (com_b - origin_j)
    d = com_b[:, None, :] - origin_w[None, :, :]                # (nb,nj,3)
    lin = jnp.cross(jnp.broadcast_to(axis_w[None], d.shape), d)  # (nb,nj,3)
    r = com_b - com[None, :]                                     # (nb,3)
    # I_w[b] @ axis_j for each (b, j): (nb, nj, 3)
    Iw_axis = jnp.einsum("bil,jl->bji", I_w, axis_w)
    col_ang = jnp.einsum("bj,bji->ij", mask, Iw_axis)            # (3, nj) summed over b
    cross_r_lin = jnp.cross(jnp.broadcast_to(r[:, None, :], lin.shape), lin)
    col_lin = jnp.einsum("b,bj,bji->ij", model.mass, mask, cross_r_lin)
    A_joints = col_ang + col_lin                                 # (3, nj)

    # Base columns: omega_b = R0 w_loc for all bodies; v_com_b = R0 v_loc +
    # (R0 w_loc) x (com_b - p0).
    R0 = body_X.R[0]
    I_tot = jnp.sum(I_w, axis=0)                                 # sum I_b^w
    A_w = I_tot @ R0
    d0 = com_b - body_X.p[0][None, :]
    # m_b r_b x (w x d0_b) = -m_b S(r_b) S(d0_b) w, summed over bodies.
    Sr = skew(r)
    Sd0 = skew(d0)
    A_w = A_w - jnp.einsum("b,bij,bjk->ik", model.mass, Sr, Sd0) @ R0
    # v_loc part: m_b r_b x (R0 v) = (sum m_b S(r_b)) R0 = 0 since sum m r = 0.
    A_v = jnp.zeros((3, 3), dtype)

    return jnp.concatenate([A_v, A_w, A_joints], axis=1)


def _angular_momentum_impl(model, q, v, body_X, com):
    # Propagate body twists down the tree in world coordinates.
    base_R = body_X.R[0]
    v_lin = [base_R @ v[0:3]]
    v_ang = [base_R @ v[3:6]]
    for b in range(1, model.nb):
        pa = model.parent[b]
        # World geometry of joint b.
        Rj = body_X.R[pa] @ model.joint_origin_R[b]
        axis_w = Rj @ model.joint_axis[b]
        origin_w = body_X.R[pa] @ model.joint_origin_p[b] + body_X.p[pa]
        dq = v[6 + b - 1]
        w_par = v_ang[pa]
        v_par = v_lin[pa] + jnp.cross(w_par, origin_w - body_X.p[pa])
        v_ang.append(w_par + axis_w * dq)
        v_lin.append(v_par)  # velocity of the joint origin == body origin
    L = jnp.zeros(3, q.dtype)
    for b in range(model.nb):
        Rb = body_X.R[b]
        com_b = Rb @ model.com[b] + body_X.p[b]
        I_w = Rb @ model.inertia[b] @ Rb.T
        v_com_b = v_lin[b] + jnp.cross(v_ang[b], com_b - body_X.p[b])
        L = L + I_w @ v_ang[b] + model.mass[b] * jnp.cross(com_b - com, v_com_b)
    return L


def _rotation_error(R_des: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """so(3) orientation error e such that rotating by e aligns R to R_des
    (vee of the skew part of R_des R^T)."""
    E = R_des @ R.T
    return 0.5 * jnp.stack(
        [E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]]
    )


def build_qp(
    model: RobotModel,
    idx: StackIndices,
    gains: WBIDGains,
    q: jnp.ndarray,
    v: jnp.ndarray,
    refs: WBIDReferences,
    dt: float,
    body_X=None,
    with_blocks: bool = False,
    fast: bool = False,
):
    """Assemble (H, g, C, l, u) for the WBID QP, plus cached dynamics terms.

    body_X: optionally pass precomputed FK for q (the engine tick computes it
    anyway — avoids re-deriving the full tree).

    with_blocks=True additionally returns the raw task blocks
    ``(A_all, b_all, w_all, levels)`` for the strict-hierarchy iHQP solver
    (wbid/ihqp.py) — ``levels`` is a static per-row priority tag
    (0 = feet/contacts, 1 = CoM/base/momentum/wrench, 2 = posture/
    regularization), the OpenSoT ``/`` convention."""
    dtype = q.dtype
    nv = model.nv
    nx = nv + NX_F

    if body_X is None:
        body_X = rb.fk(model, q)
    M = dyn.crba(model, q, body_X)
    h = dyn.bias_force(model, q, v, body_X=body_X)

    if fast:
        # Serving-latency path (WBIDConfig.fast_stack): every frame Jacobian
        # from ONE batched pass — at B=1 the assembly is op-launch-bound
        # (round-5 decomposition: build_qp 1.38 ms of the 1.59 ms tick).
        _all_frames = tuple(idx.contacts) + (idx.pelvis,) + tuple(idx.feet)
        J_all = rb.frame_jacobians(model, q, body_X, _all_frames)
        Jc = [J_all[i, :3] for i in range(NF)]
        _J_pelvis = J_all[NF]
        _J_feet = (J_all[NF + 1], J_all[NF + 2])
        com_drift, base_drift6, foot_drift0, foot_drift1, L_drift = (
            _all_task_drifts_fast(model, q, v, idx)
        )
    else:
        # Contact point jacobians (world linear, 3 x nv each).
        Jc = [rb.frame_jacobian(model, q, body_X, f)[:3] for f in idx.contacts]
        _J_pelvis = None
        _J_feet = (None, None)
        # All task drifts in one forward pass.
        com_drift, base_drift6, foot_drift0, foot_drift1, L_drift = (
            _all_task_drifts(model, q, v, idx)
        )
    foot_drifts = (foot_drift0, foot_drift1)

    A_blocks = []
    b_blocks = []
    w_blocks = []
    lvl_blocks = []

    def add(A, b, w, level=1):
        A_blocks.append(A)
        b_blocks.append(b)
        w_blocks.append(jnp.broadcast_to(w, (A.shape[0],)).astype(dtype))
        lvl_blocks.append([level] * A.shape[0])

    zeros_f = jnp.zeros((3, NX_F), dtype)

    # --- CoM task (wbid.py:53-60,167) ---
    J_com = rb.com_jacobian(model, q, body_X)
    com = rb.com_position(model, body_X)
    com_vel = J_com @ v
    a_des = (
        refs.com_acc
        + gains.com_kp * (refs.com_pos - com)
        + gains.com_kd * (refs.com_vel - com_vel)
    )
    add(jnp.concatenate([J_com, zeros_f], axis=1), a_des - com_drift, gains.w_com)

    # --- Base orientation task rows 3:6 (wbid.py:67-75,172) ---
    J_base = _J_pelvis if fast else rb.frame_jacobian(
        model, q, body_X, idx.pelvis
    )
    base_R = body_X.R[0]
    base_w = J_base[3:6] @ v
    base_drift = base_drift6[3:6]
    e_ang = _rotation_error(refs.base_R, base_R)
    a_des = (
        refs.base_angacc
        + gains.base_kp_ang * e_ang
        + gains.base_kd_ang * (refs.base_angvel - base_w)
    )
    add(
        jnp.concatenate([J_base[3:6], zeros_f], axis=1),
        a_des - base_drift,
        gains.w_base,
    )

    # --- Optional torso-orientation task (Cartesian rows 3:6 on torso_link,
    # the same capability as the pelvis task above pointed at a different
    # link — OpenSoT Cartesian targets any link). On waist-roll/pitch
    # variants the upper body is otherwise held only by the postural task;
    # tracking the PLAN's base orientation keeps the SRBD single-rigid-body
    # assumption honest above the waist. Statically compiled out unless the
    # caller supplies refs.torso_R (EngineConfig.torso_task). ---
    if refs.torso_R is not None and idx.torso >= 0:
        J_torso = rb.frame_jacobian(model, q, body_X, idx.torso)
        torso_R = rb.frame_pose(model, body_X, idx.torso).R
        torso_w = J_torso[3:6] @ v
        torso_drift = _frames_drift(model, q, v, (idx.torso,), rows=slice(3, 6))
        a_des_t = (
            gains.torso_kp_ang * _rotation_error(refs.torso_R, torso_R)
            + gains.torso_kd_ang * (refs.base_angvel - torso_w)
        )
        add(
            jnp.concatenate([J_torso[3:6], zeros_f], axis=1),
            a_des_t - torso_drift,
            gains.w_torso,
        )

    # --- Optional hand Cartesian tasks (hand point contacts; frames from
    # g1_23dof.urdf:855-859 / synthesized at load). OpenSoT's Cartesian task
    # targets any link — this is the same capability for the arm endpoints
    # (reach/brace references). Statically compiled out unless the caller
    # supplies refs.hand_pos (the walking hot path never pays for it). ---
    if refs.hand_pos is not None and idx.hands:
        for s, fh in enumerate(idx.hands):
            Xh = rb.frame_pose(model, body_X, fh)
            Jh = rb.frame_jacobian(model, q, body_X, fh)[:3]
            drift_h = _frames_drift(model, q, v, (fh,), rows=slice(0, 3))
            a_des_h = (
                gains.hand_kp * (refs.hand_pos[s] - Xh.p)
                - gains.hand_kd * (Jh @ v)
            )
            add(
                jnp.concatenate([Jh, zeros_f], axis=1),
                a_des_h - drift_h,
                gains.w_hand,
            )

    # --- Postural task on non-leg joints (wbid.py:128-134,167: stack rows
    # 18..28 select waist+arms; generalized to any variant by deriving the
    # non-leg joints from the model's joint names, so e.g. g1_dual_arm —
    # which has no legs — postures every joint) ---
    post_idx = tuple(
        j
        for j, name in enumerate(model.joint_names)
        if not any(k in name for k in ("hip", "knee", "ankle"))
    )
    qj = q[7:]
    dqj = v[6:]
    if post_idx:
        import numpy as _np

        n_post = len(post_idx)
        sel_np = _np.zeros((n_post, nv))
        sel_np[_np.arange(n_post), 6 + _np.asarray(post_idx)] = 1.0
        sel = jnp.asarray(sel_np, dtype)
        a_des_post = (
            gains.posture_kp * (refs.posture_q - qj) - gains.posture_kd * dqj
        )
        add(
            jnp.concatenate([sel, jnp.zeros((n_post, NX_F), dtype)], axis=1),
            a_des_post[jnp.asarray(post_idx)],
            gains.w_posture,
            level=2,
        )

    # --- Optional LEG postural task (WBIDGains.w_posture_legs): the settle
    # knee guard. Statically compiled out unless the caller supplies
    # refs.posture_legs_scale (EngineConfig.settle_knee_guard). Same PD as
    # the arm/waist postural task, selector on the complementary (leg)
    # joints, weight faded in by the runtime scale — escapes the
    # straight-knee singularity lock at walk-to-stand (round-5 diagnosis,
    # tools/diag_settle.py). ---
    if refs.posture_legs_scale is not None:
        import numpy as _np

        leg_idx = tuple(
            j
            for j, name in enumerate(model.joint_names)
            if any(k in name for k in ("hip", "knee", "ankle"))
        )
        if leg_idx:
            n_leg = len(leg_idx)
            sel_np = _np.zeros((n_leg, nv))
            sel_np[_np.arange(n_leg), 6 + _np.asarray(leg_idx)] = 1.0
            a_des_leg = (
                gains.posture_kp * (refs.posture_q - q[7:])
                - gains.posture_kd * v[6:]
            )
            add(
                jnp.concatenate(
                    [jnp.asarray(sel_np, dtype),
                     jnp.zeros((n_leg, NX_F), dtype)], axis=1
                ),
                a_des_leg[jnp.asarray(leg_idx)],
                gains.w_posture_legs * refs.posture_legs_scale,
                level=2,
            )

    # --- qddot regularization (wbid.py:152,167) ---
    add(
        jnp.concatenate([jnp.eye(nv, dtype=dtype), jnp.zeros((nv, NX_F), dtype)], axis=1),
        jnp.zeros(nv, dtype),
        gains.w_qddot_reg,
        level=2,
    )

    # --- Angular momentum task (wbid.py:136-142,168) ---
    A_G = centroidal_momentum_matrix(model, q, body_X)
    # L = A_G v by definition of the centroidal momentum matrix; the fast
    # path reuses A_G (one matvec) instead of the per-body sequential loop
    # (same value — tests/test_dynamics.py checks the two agree).
    L = A_G @ v if fast else _angular_momentum_impl(model, q, v, body_X, com)
    # Ldot_des = Ldot_ref + K (L_ref - L). With L_ref = Ldot_ref = 0 this is
    # the reference's pure damping (drive momentum to zero; OpenSoT
    # setMomentumGain) — but a walking MPC plan *rolls* the body (the lateral
    # GRF demands torso roll), so the engine feeds the plan's own momentum
    # (I_srbd w_plan) here; damping all momentum to zero fights the planned
    # roll and was measured (round 2) to cost ~20% of the planned lateral
    # force delivery.
    add(
        jnp.concatenate([A_G, zeros_f], axis=1),
        refs.angmom_Ldot + gains.angmom_k * (refs.angmom_L - L) - L_drift,
        gains.w_angmom,
    )

    # --- Torque minimization (wbid.py:149,170): tau = (M qdd + h - Jc^T f)[6:] ---
    Jc_T = jnp.concatenate([Jc[i].T for i in range(NF)], axis=1)  # (nv, 12)
    A_tau = jnp.concatenate([M[6:], -Jc_T[6:]], axis=1)
    add(A_tau, -h[6:], gains.w_tau_reg, level=2)

    # --- Contact (stance) + swing tasks per foot (wbid.py:78-115,174-176) ---
    for s in range(2):
        f = idx.feet[s]
        Jf = _J_feet[s] if fast else rb.frame_jacobian(model, q, body_X, f)
        Xf = rb.frame_pose(model, body_X, f)
        vel = Jf @ v
        drift = foot_drifts[s]
        active = refs.contact_active[s]

        # Stance: hold the reset pose (position + orientation), zero velocity.
        e_pos = refs.contact_pos[s] - Xf.p
        e_ang = _rotation_error(refs.contact_R[s], Xf.R)
        a_des6 = gains.contact_kp * jnp.concatenate([e_pos, e_ang]) - (
            gains.contact_kd * vel
        )
        add(
            jnp.concatenate([Jf, jnp.zeros((6, NX_F), dtype)], axis=1),
            a_des6 - drift,
            gains.w_contact * active,
            level=0,
        )

        # Swing: track the swing trajectory (full 6D gains; xy vel ff zeroed by
        # the engine to mirror ros_run_simulation.py:256-257).
        e_pos_sw = refs.swing_pos[s] - Xf.p
        e_ang_sw = _rotation_error(refs.swing_R[s], Xf.R)
        vel_ref6 = jnp.concatenate([refs.swing_vel[s], jnp.zeros(3, dtype)])
        acc_ref6 = jnp.concatenate([refs.swing_acc[s], jnp.zeros(3, dtype)])
        a_des6_sw = (
            acc_ref6
            + gains.swing_kp * jnp.concatenate([e_pos_sw, e_ang_sw])
            + gains.swing_kd * (vel_ref6 - vel)
        )
        add(
            jnp.concatenate([Jf, jnp.zeros((6, NX_F), dtype)], axis=1),
            a_des6_sw - drift,
            gains.w_swing * (1.0 - active),
            level=0,
        )

    # --- Wrench tracking to MPC forces (wbid.py:179-182,296-297) ---
    if fast:
        # One 12-row block from a STATIC selector (trace-time numpy
        # constant) — same rows/weights as the per-contact loop below.
        import numpy as _np

        sel_f = _np.zeros((NX_F, nx))
        sel_f[:, nv:] = _np.eye(NX_F)
        add(jnp.asarray(sel_f, dtype), refs.f_des.reshape(-1), gains.w_wrench)
    else:
        for i in range(NF):
            Af = jnp.zeros((3, nx), dtype).at[
                :, nv + 3 * i : nv + 3 * i + 3
            ].set(jnp.eye(3, dtype=dtype))
            add(Af, refs.f_des[i], gains.w_wrench)

    # --- TOTAL-force tracking (sum over contacts) ---
    # Pins the NET contact force — i.e. the realized CoM dynamics, by Newton —
    # to the MPC's plan, while leaving the per-contact DISTRIBUTION free for
    # the moment balance and the cones. Round-2 diagnosis: with only the
    # per-contact task (w=0.05, in N^2 units) the force DOFs are a tug-of-war
    # between it and the base-orientation task, whose reference Kd=250
    # (wbid.py:75) converts ~0.1 rad/s of roll-rate error into ~80 N of
    # lateral force redirection — the realized lateral force swung by
    # +-50-100 N around the plan and the walking gait diverged at step 3-4,
    # while the same MPC plan applied exactly (mpc/srbd_loop.py) walks
    # arbitrarily far. Weighted in N^2: at the default 25, a 5 N net
    # deviation costs 625 — above anything the attitude tasks can trade.
    #
    # PER-AXIS weight, default (25, 25, 0): the xy channels carry the LIPM
    # instability and must follow the plan open-loop within the MPC period;
    # the z channel is self-stable and NEEDS the CoM height PD's feedback —
    # a force pin in N^2 units costs w*(m*da)^2 = 1156*w*da^2 against the
    # CoM task's 3*da^2, so even w_z = 0.1 silences the height servo and the
    # unmodeled swing-leg force error (~1 m/s^2) integrates freely: measured
    # round 2, the CoM height wandered 0.56-0.68 m over 8 steps and the
    # settle fell at leg overextension.
    Af_tot = jnp.concatenate(
        [jnp.zeros((3, nv), dtype)]
        + [jnp.eye(3, dtype=dtype) for _ in range(NF)],
        axis=1,
    )
    add(Af_tot, jnp.sum(refs.f_des, axis=0), gains.w_wrench_total)

    # Assemble H, g.
    A_all = jnp.concatenate(A_blocks, axis=0)
    b_all = jnp.concatenate(b_blocks)
    w_all = jnp.concatenate(w_blocks)
    AW = A_all * w_all[:, None]
    H = AW.T @ A_all
    H = H + 1e-8 * jnp.eye(nx, dtype=dtype)
    g = -(AW.T @ b_all)

    # ----- Constraints -----
    C_rows = []
    l_rows = []
    u_rows = []

    def addc(C, l, u):
        C_rows.append(C)
        l_rows.append(jnp.atleast_1d(l))
        u_rows.append(jnp.atleast_1d(u))

    # Dynamic feasibility: underactuated base rows (wbid.py:184-190):
    # M[0:6] qdd - (Jc^T f)[0:6] = -h[0:6]
    C_dyn = jnp.concatenate([M[0:6], -Jc_T[0:6]], axis=1)
    addc(C_dyn, -h[0:6], -h[0:6])

    # Joint limits at acceleration level (wbid.py:196-202): double-integrator
    # viability bound over a lookahead T_lim (not the raw 1 ms tick — that
    # produces +-2e6-scale bounds that flip inconsistent near the limits and
    # make the QP infeasible mid-swing). Feasibility is enforced by
    # construction: if the window collapses, both bounds meet at the midpoint.
    # The window length is a gain (see WBIDGains.qlim_lookahead: long windows
    # brake joints far from their limits and choke CoM force tracking).
    T_lim = gains.qlim_lookahead
    qj_min = model.q_lower
    qj_max = model.q_upper
    # Knee-extension floor (settle knee guard, round-5): raise the knees'
    # effective lower limit toward gains.knee_floor as the guard fades in,
    # so the settle can never park at the FULLY-STRAIGHT singular
    # configuration where the CoM-height Jacobian through the knee
    # vanishes and the height servo locks (tools/diag_settle.py). Same
    # static gate as the leg postural task — validated walking bundles
    # compile without these ops.
    if refs.posture_legs_scale is not None:
        import numpy as _np

        knee_mask = jnp.asarray(
            _np.array([
                1.0 if "knee" in name else 0.0
                for name in model.joint_names
            ]),
            dtype,
        )
        floor = (
            refs.posture_legs_scale * gains.knee_floor
            + (1.0 - refs.posture_legs_scale) * qj_min
        )
        qj_min = jnp.where(
            knee_mask > 0.5, jnp.maximum(qj_min, floor), qj_min
        )
    sel_j = jnp.concatenate(
        [jnp.zeros((model.nj, 6), dtype), jnp.eye(model.nj, dtype=dtype),
         jnp.zeros((model.nj, NX_F), dtype)],
        axis=1,
    )
    inv_T2 = 2.0 / (T_lim * T_lim)
    l_q = (qj_min - qj - T_lim * dqj) * inv_T2
    u_q = (qj_max - qj - T_lim * dqj) * inv_T2

    # Velocity limits (wbid.py:203-204) over the same lookahead, with the
    # reference's 10x headroom (wbid.py:201).
    l_v = (-10.0 * model.dq_max - dqj) / T_lim
    u_v = (10.0 * model.dq_max - dqj) / T_lim

    lo = jnp.maximum(l_q, l_v)
    hi = jnp.minimum(u_q, u_v)
    mid = 0.5 * (lo + hi)
    bad = lo > hi
    lo = jnp.where(bad, mid, lo)
    hi = jnp.where(bad, mid, hi)
    addc(sel_j, lo, hi)

    # Torque limits (wbid.py:206-211): |(M qdd + h - Jc^T f)[6:]| <= tau_max.
    addc(A_tau, -model.tau_max - h[6:], model.tau_max - h[6:])

    # Friction cones + wrench limits per contact (wbid.py:213-220,117-126).
    mu = gains.mu
    if fast:
        # Template assembly: the cone/box rows are STATIC up to the traced
        # scalars (mu, fz/fxy bounds, per-foot activity) — build the whole
        # (NF, 7, nx) block from trace-time numpy constants with ~6 ops
        # instead of ~10 .at[].set per contact. Row ORDER matches the loop
        # path exactly (cone 5 rows then xy box 2 rows, per contact).
        import numpy as _np

        T0 = _np.zeros((NF, 5, nx))   # cone rows, mu-independent part
        Tmu = _np.zeros((NF, 5, nx))  # cone rows, coefficient of -mu
        Teq = _np.zeros((NF, 5, nx))  # swing rewrite: f = 0 equalities
        Txy = _np.zeros((NF, 2, nx))  # tangential box rows
        for i in range(NF):
            c = nv + 3 * i
            T0[i, 0, c] = 1.0
            T0[i, 1, c] = -1.0
            T0[i, 2, c + 1] = 1.0
            T0[i, 3, c + 1] = -1.0
            T0[i, 4, c + 2] = 1.0
            Tmu[i, 0:4, c + 2] = 1.0
            Teq[i, 0, c] = 1.0
            Teq[i, 1, c + 1] = 1.0
            Teq[i, 2, c + 2] = 1.0
            Txy[i, 0, c] = 1.0
            Txy[i, 1, c + 1] = 1.0
        act = refs.contact_active[jnp.asarray([0, 0, 1, 1])]  # (NF,)
        on = act > 0.5
        Cc_all = jnp.asarray(T0, dtype) - mu * jnp.asarray(Tmu, dtype)
        C_cone = jnp.where(on[:, None, None], Cc_all, jnp.asarray(Teq, dtype))
        neg = jnp.asarray(-1e20, dtype)
        l_cone = jnp.where(
            on[:, None],
            jnp.concatenate(
                [jnp.full((NF, 4), neg, dtype),
                 (gains.fz_min * act)[:, None]], axis=1
            ),
            jnp.zeros((NF, 5), dtype),
        )
        u_cone = jnp.where(
            on[:, None],
            jnp.concatenate(
                [jnp.zeros((NF, 4), dtype),
                 (gains.fz_max * act)[:, None]], axis=1
            ),
            jnp.zeros((NF, 5), dtype),
        )
        bxy = (gains.fxy_max * act)[:, None] * jnp.ones((NF, 2), dtype)
        # Interleave per contact: [cone5, xy2] x NF — identical row order to
        # the loop path.
        C_blk = jnp.concatenate(
            [C_cone, jnp.asarray(Txy, dtype)], axis=1
        ).reshape(NF * 7, nx)
        l_blk = jnp.concatenate([l_cone, -bxy], axis=1).reshape(NF * 7)
        u_blk = jnp.concatenate([u_cone, bxy], axis=1).reshape(NF * 7)
        addc(C_blk, l_blk, u_blk)
    else:
        for i in range(NF):
            foot_active = refs.contact_active[i // 2]
            base_col = nv + 3 * i
            Cc = jnp.zeros((5, nx), dtype)
            Cc = Cc.at[0, base_col + 0].set(1.0)
            Cc = Cc.at[0, base_col + 2].add(-mu)
            Cc = Cc.at[1, base_col + 0].set(-1.0)
            Cc = Cc.at[1, base_col + 2].add(-mu)
            Cc = Cc.at[2, base_col + 1].set(1.0)
            Cc = Cc.at[2, base_col + 2].add(-mu)
            Cc = Cc.at[3, base_col + 1].set(-1.0)
            Cc = Cc.at[3, base_col + 2].add(-mu)
            Cc = Cc.at[4, base_col + 2].set(1.0)
            neg = jnp.asarray(-1e20, dtype)
            l_c = jnp.stack([neg, neg, neg, neg, gains.fz_min * foot_active])
            u_c = jnp.stack(
                [0.0 * foot_active, 0.0 * foot_active, 0.0 * foot_active,
                 0.0 * foot_active, gains.fz_max * foot_active]
            )
            # Swing feet: force box collapses to exactly zero (switch_procedure,
            # ros_run_simulation.py:243) — rewrite rows into f = 0 equalities to
            # avoid a degenerate pyramid (same trick as the MPC, mpc/solver.py).
            Ci = jnp.zeros((5, nx), dtype)
            Ci = Ci.at[0, base_col + 0].set(1.0)
            Ci = Ci.at[1, base_col + 1].set(1.0)
            Ci = Ci.at[2, base_col + 2].set(1.0)
            on = foot_active > 0.5
            addc(
                jnp.where(on, Cc, Ci),
                jnp.where(on, l_c, jnp.zeros(5, dtype)),
                jnp.where(on, u_c, jnp.zeros(5, dtype)),
            )
            # Tangential wrench box |fx|,|fy| <= fxy_max (the reference's
            # WrenchLimits x/y rows, wbid.py:123-124). In stance these are far
            # outside the friction pyramid at normal loads, but they bound the
            # QP whenever fz saturates; for swing feet they collapse to f = 0
            # consistently with the equality rewrite above.
            Cxy = jnp.zeros((2, nx), dtype)
            Cxy = Cxy.at[0, base_col + 0].set(1.0)
            Cxy = Cxy.at[1, base_col + 1].set(1.0)
            addc(
                Cxy,
                -gains.fxy_max * foot_active * jnp.ones(2, dtype),
                gains.fxy_max * foot_active * jnp.ones(2, dtype),
            )

    C = jnp.concatenate(C_rows, axis=0)
    l = jnp.concatenate(l_rows)
    u = jnp.concatenate(u_rows)

    if with_blocks:
        import numpy as _np

        levels = _np.asarray(sum(lvl_blocks, []), dtype=_np.int32)
        return H, g, C, l, u, (M, h, Jc_T), (A_all, b_all, w_all, levels)
    return H, g, C, l, u, (M, h, Jc_T)
