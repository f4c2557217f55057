"""Single-Rigid-Body-Dynamics (SRBD) model: linearization, discretization,
horizon condensation — all matmul-formulated for the MXU.

Implements the convex-MPC model reconstructed in SURVEY.md §2.3 (Di Carlo-style,
from the reference's srbd_mpc submodule contract at run_simulation.py:73-106 and
callback unpacking ros_run_simulation.py:198-211):

State (13): ``x = [theta(3) rpy, p(3) CoM, omega(3) world ang vel,
v(3) CoM vel, g]`` with gravity appended to keep dynamics linear.

Continuous dynamics, linearized about reference yaw psi:
    theta_dot = Rz(psi)^T omega
    p_dot     = v
    omega_dot = I_w^{-1} sum_i (r_i x f_i),  r_i = c_i - p,  I_w = Rz I_b Rz^T
    v_dot     = sum_i f_i / m + e_z * g      (x[12] = -9.80665)

The default inertia is the *whole-body composite* about the CoM
(``G1_COMPOSITE_INERTIA``) — a deliberate improvement over the reference's
torso-only value (wbid.py:262-266), which over-predicts rotation ~30x and
destabilizes lateral walking. ``TORSO_INERTIA`` / ``reference_parity_params()``
reproduce the reference's exact parameterization for parity runs.

A_c is nilpotent (A_c^3 = 0), so the ZOH discretization
``A_d = exp(A_c dt) = I + A_c dt + A_c^2 dt^2/2`` is exact; B_d uses the
matching series through third order.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from g1_locomotion_tpu.core.rotations import skew, yaw_matrix

NX = 13  # state dim
NU = 12  # 4 contacts x 3 forces
NC = 4   # contact points: L-heel, L-toe, R-heel, R-toe (ros_run_simulation.py:65)

# Torso-only inertia the *reference* MPC uses (wbid.py:262-266). Kept for
# parity experiments; NOT the default. With this value the SRBD over-predicts
# body rotation from lateral forces ~30x (the whole body rotates, not just the
# torso), which makes the MPC refuse lateral braking forces and walk
# laterally unstable.
TORSO_INERTIA = jnp.array(
    [[8.20564e-2, 0.0, 0.0], [0.0, 8.05015e-2, 0.0], [0.0, 0.0, 0.32353e-2]]
)
# Whole-body composite inertia about the CoM at the standing configuration
# (computed from the URDF inertias via models/robot.py; see
# tests/test_srbd_mpc.py::test_composite_inertia_value).
G1_COMPOSITE_INERTIA = jnp.array(
    [
        [3.2056, 0.0, 0.4255],
        [0.0, 3.0501, -0.0007],
        [0.4255, -0.0007, 0.5523],
    ]
)
G1_MASS = 34.13290  # sum of URDF link masses (g1_23dof.urdf)
GRAVITY = -9.80665  # state element 12 (ros_run_simulation.py:58)


class SRBDParams(NamedTuple):
    mass: jnp.ndarray  # scalar
    inertia: jnp.ndarray  # (3,3) body-frame rotational inertia
    # Effective swing-limb point mass [kg] for the angular-momentum preview
    # (0 = compensation off). The SRBD's linear (CoM) channel is EXACT for
    # any internal motion; its angular channel approximates the centroidal
    # momentum as I*omega, dropping the swing leg's relative term
    # h_sw ~ m_eff (r_foot x v_foot). With m_swing > 0 the MPC previews
    # hdot_sw = m_eff (r x a_swing) from the planned swing profile as a
    # known disturbance (planner supplies the geometric r x a horizon).
    m_swing: jnp.ndarray = 0.0


def default_params(dtype=jnp.float32) -> SRBDParams:
    return SRBDParams(
        mass=jnp.asarray(G1_MASS, dtype),
        inertia=G1_COMPOSITE_INERTIA.astype(dtype),
        m_swing=jnp.asarray(0.0, dtype),
    )


def reference_parity_params(dtype=jnp.float32) -> SRBDParams:
    """The reference's exact SRBD parameterization (torso inertia)."""
    return SRBDParams(
        mass=jnp.asarray(G1_MASS, dtype), inertia=TORSO_INERTIA.astype(dtype)
    )


def params_from_model(model, q) -> SRBDParams:
    """SRBD parameters derived from a whole-body model at configuration q:
    total mass + composite inertia about the whole-body CoM. This is how
    ``G1_COMPOSITE_INERTIA`` was obtained for g1_23dof; other variants
    (29-DoF: +1 kg, different mass distribution) must derive their own —
    the hardcoded 23-DoF constants destabilize their walking gaits."""
    from g1_locomotion_tpu.models import robot as rb

    X = rb.fk(model, q)
    com_b = jnp.einsum("bij,bj->bi", X.R, model.com) + X.p
    com = jnp.sum(model.mass[:, None] * com_b, axis=0) / model.total_mass
    I_w = jnp.einsum("bij,bjk,blk->bil", X.R, model.inertia, X.R)
    d = com_b - com[None, :]
    d2 = jnp.sum(d * d, axis=1)
    eye = jnp.eye(3, dtype=q.dtype)
    shift = model.mass[:, None, None] * (
        d2[:, None, None] * eye[None] - d[:, :, None] * d[:, None, :]
    )
    inertia = jnp.sum(I_w + shift, axis=0)
    return SRBDParams(mass=model.total_mass.astype(q.dtype),
                      inertia=inertia.astype(q.dtype))


def continuous_matrices(
    params: SRBDParams,
    yaw: jnp.ndarray,
    r: jnp.ndarray,  # (NC, 3) contact positions relative to CoM (world frame)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(A_c, B_c) of the yaw-linearized SRBD dynamics."""
    dtype = r.dtype
    Rz = yaw_matrix(yaw).astype(dtype)
    I_w = Rz @ params.inertia.astype(dtype) @ Rz.T
    I_w_inv = jnp.linalg.inv(I_w)

    A = jnp.zeros((NX, NX), dtype)
    A = A.at[0:3, 6:9].set(Rz.T)
    A = A.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    A = A.at[11, 12].set(1.0)

    B = jnp.zeros((NX, NU), dtype)
    inv_m = 1.0 / params.mass
    for i in range(NC):
        B = B.at[6:9, 3 * i : 3 * i + 3].set(I_w_inv @ skew(r[i]))
        B = B.at[9:12, 3 * i : 3 * i + 3].set(jnp.eye(3, dtype=dtype) * inv_m)
    return A, B


def landing_sensitivity(
    params: SRBDParams,
    yaw: jnp.ndarray,
    f_nom_sum: jnp.ndarray,  # (3,) summed nominal force on the landing contacts
) -> jnp.ndarray:
    """Continuous-dynamics columns E (NX, 2) for a shared landing-position
    offset d = [dx, dy] applied to the post-touchdown contact points.

    The torque of a contact at c+d is (c+d-p) x f; the extra term d x f is
    bilinear in (d, f) — linearizing about the nominal forces f̄ gives
    ``omega_dot += I_w^{-1} (d x f̄_sum)``, linear in d:

        d x f̄ = [dy f̄z, -dx f̄z, dx f̄y - dy f̄x]  =  M(f̄) @ [dx, dy]

    E rides the same nilpotent ZOH series as B (pass it to
    :func:`discretize` as extra columns). This is the footstep-integrated
    MPC coupling: GRFs and the landing point optimized jointly in one QP.
    """
    dtype = f_nom_sum.dtype
    Rz = yaw_matrix(yaw).astype(dtype)
    I_w = Rz @ params.inertia.astype(dtype) @ Rz.T
    I_w_inv = jnp.linalg.inv(I_w)
    fx, fy, fz = f_nom_sum[0], f_nom_sum[1], f_nom_sum[2]
    zero = jnp.zeros_like(fz)
    M = jnp.stack(
        [jnp.stack([zero, fz]), jnp.stack([-fz, zero]), jnp.stack([fy, -fx])]
    )  # (3, 2)
    E = jnp.zeros((NX, 2), dtype)
    return E.at[6:9].set(I_w_inv @ M)


def discretize(
    A: jnp.ndarray, B: jnp.ndarray, dt: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ZOH for the nilpotent SRBD A (A^3 = 0)."""
    eye = jnp.eye(NX, dtype=A.dtype)
    A2 = A @ A
    Ad = eye + A * dt + A2 * (dt * dt / 2.0)
    Bd = (eye * dt + A * (dt * dt / 2.0) + A2 * (dt**3 / 6.0)) @ B
    return Ad, Bd


def swing_disturbance(
    params: SRBDParams,
    yaw: jnp.ndarray,
    hdot_geom: jnp.ndarray,  # (3,) geometric r_sw x a_sw of the swing foot
) -> jnp.ndarray:
    """Continuous affine disturbance (NX,) for the swing-limb momentum
    preview: the exact centroidal angular dynamics are
    ``d/dt(I w + h_sw) = sum_i r_i x f_i``, so the SRBD omega rows pick up
    ``omega_dot -= I_w^{-1} hdot_sw`` with
    ``hdot_sw ~ m_swing * (r_foot x a_foot)`` (point-mass swing-limb model;
    see SRBDParams.m_swing). ZOH-discretize with :func:`discretize_affine`
    and lift with :func:`lift_affine`."""
    dtype = hdot_geom.dtype
    Rz = yaw_matrix(yaw).astype(dtype)
    I_w = Rz @ params.inertia.astype(dtype) @ Rz.T
    w = jnp.zeros((NX,), dtype)
    return w.at[6:9].set(
        -jnp.linalg.solve(I_w, params.m_swing * hdot_geom)
    )


def discretize_affine(A: jnp.ndarray, w: jnp.ndarray, dt: float) -> jnp.ndarray:
    """ZOH of a constant affine term over one step (same nilpotent series
    as the B columns of :func:`discretize`)."""
    eye = jnp.eye(NX, dtype=A.dtype)
    A2 = A @ A
    return (eye * dt + A * (dt * dt / 2.0) + A2 * (dt**3 / 6.0)) @ w


def lift_affine(Ad: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
    """Accumulate per-step discrete affine terms into the condensed horizon:
    ``X = A_qp x0 + B_qp U + W`` with ``W[k] = sum_{j<=k} Phi_{j+1..k} w_j``.
    Returns W stacked (N*NX,)."""
    N = Ad.shape[0]
    rows = []
    acc = wd[0]
    rows.append(acc)
    for k in range(1, N):
        acc = Ad[k] @ acc + wd[k]
        rows.append(acc)
    return jnp.concatenate(rows)


def condense(
    Ad: jnp.ndarray,  # (N, NX, NX) per-step discrete A
    Bd: jnp.ndarray,  # (N, NX, NU) per-step discrete B
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift the horizon into ``X = A_qp x0 + B_qp U`` (SURVEY.md §2.3).

    X stacks x_1..x_N (N*NX); U stacks u_0..u_{N-1} (N*NU).
    A_qp[k] = prod_{j<=k} A_j ;  B_qp[k, j] = (prod_{j<i<=k} A_i) B_j.

    Built with an O(N^2) static loop of (13,13)x(13,12) matmuls — N is small
    (10-20) and everything fuses; the result feeds the big MXU matmuls
    H = B_qpᵀ Q̄ B_qp.
    """
    N = Ad.shape[0]
    dtype = Ad.dtype

    # Phi[k] = A_{k} ... A_0  (state transition from 0 to k+1)
    Phi = [Ad[0]]
    for k in range(1, N):
        Phi.append(Ad[k] @ Phi[-1])
    A_qp = jnp.concatenate(Phi, axis=0)  # (N*NX, NX)

    # Row recurrence: row_k = A_k @ row_{k-1} + e_k ⊗ B_k  — O(N^2) small matmuls.
    rows = []
    row = jnp.zeros((NX, N * NU), dtype)
    for k in range(N):
        row = Ad[k] @ row if k > 0 else row
        row = row.at[:, k * NU : (k + 1) * NU].set(Bd[k])
        rows.append(row)
    B_qp = jnp.concatenate(rows, axis=0)  # (N*NX, N*NU)
    return A_qp, B_qp


def rollout(
    Ad: jnp.ndarray, Bd: jnp.ndarray, x0: jnp.ndarray, U: jnp.ndarray,
    Ed: jnp.ndarray = None, d: jnp.ndarray = None, wd: jnp.ndarray = None,
) -> jnp.ndarray:
    """Simulate x_{k+1} = A_k x_k + B_k u_k (+ E_k d + w_k); returns (N+1, NX)."""
    N = Ad.shape[0]
    xs = [x0]
    for k in range(N):
        x = Ad[k] @ xs[-1] + Bd[k] @ U[k]
        if Ed is not None:
            x = x + Ed[k] @ d
        if wd is not None:
            x = x + wd[k]
        xs.append(x)
    return jnp.stack(xs)
