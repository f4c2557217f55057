"""NumPy oracle of the reference SRBD MPC formulation (SURVEY.md §2.3).

Implements the exact observable contract of the reference's ``srbd_mpc``
submodule reconstructed from its call sites (run_simulation.py:73-106,
ros_run_simulation.py:198-218) with *independent* numerics — plain NumPy,
``scipy.linalg.expm`` discretization (vs the framework's closed-form nilpotent
series), and a ``scipy.optimize`` QP solve (vs the batched ADMM) — so that
agreement with :mod:`g1_locomotion_tpu.mpc.solver` is meaningful evidence of
formulation parity, not shared code agreeing with itself.

Reference formulation details encoded here:
* 13-state ``[theta rpy, p com, omega world, v com, g]`` layout
  (run_simulation.py:73-77).
* Torso-only inertia diag(8.20564e-2, 8.05015e-2, 0.32353e-2)
  (wbid.py:262-266: "Since i use in MPC the torso inertia").
* Linearization about the *current* yaw x0[2] for every horizon step
  (the Di Carlo convex-MPC scheme; SURVEY.md §2.3 "linearized about current
  yaw").
* ZOH discretization; condensed lifting X = A_qp x0 + B_qp U;
  H = B'QB + R, g = B'Q(A_qp x0 - X_ref).
* Friction pyramid |fx|<=mu fz, |fy|<=mu fz, fz in [fz_min, fz_max] per
  active contact; f = 0 for inactive contacts.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm
from scipy.optimize import LinearConstraint, minimize

NX, NU, NC = 13, 12, 4

TORSO_INERTIA = np.diag([8.20564e-2, 8.05015e-2, 0.32353e-2])
G1_MASS = 34.13290
GRAVITY = -9.80665


def _skew(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def continuous_matrices(yaw, r, mass=G1_MASS, inertia=TORSO_INERTIA):
    """(A_c, B_c) of the yaw-linearized SRBD dynamics (SURVEY.md §2.3)."""
    c, s = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    I_w = Rz @ inertia @ Rz.T
    I_w_inv = np.linalg.inv(I_w)

    A = np.zeros((NX, NX))
    A[0:3, 6:9] = Rz.T
    A[3:6, 9:12] = np.eye(3)
    A[11, 12] = 1.0

    B = np.zeros((NX, NU))
    for i in range(NC):
        B[6:9, 3 * i : 3 * i + 3] = I_w_inv @ _skew(r[i])
        B[9:12, 3 * i : 3 * i + 3] = np.eye(3) / mass
    return A, B


def discretize_expm(A, B, dt):
    """ZOH via the augmented matrix exponential (independent of the
    framework's closed-form nilpotent series)."""
    M = np.zeros((NX + NU, NX + NU))
    M[:NX, :NX] = A
    M[:NX, NX:] = B
    E = expm(M * dt)
    return E[:NX, :NX], E[:NX, NX:]


def mpc_update(
    x0,                # (13,)
    x_ref,             # (N, 13)
    contact_horizon,   # (N, 4) 0/1
    c_horizon,         # (N, 4, 3) world contact positions
    p_com_horizon,     # (N, 3) CoM positions for lever arms
    Q,                 # (13,) diagonal state weights
    R,                 # (12,) diagonal force weights
    dt=0.04,
    mu=0.8,
    fz_min=10.0,
    fz_max=1000.0,
    mass=G1_MASS,
    inertia=TORSO_INERTIA,
    qp_backend="native",
):
    """The reference's ``MPC.update`` (run_simulation.py:106): returns
    (u_opt0 (12,), x_horizon (N+1, 13), U (N, 12)).

    qp_backend: "native" (default) solves the condensed QP with the C++
    Mehrotra IPM (native/qp_solver.cpp) — the qpOASES-role backend in its
    serving seat; it is itself oracle-tested against scipy
    (tests/test_native_qp.py), so the parity evidence chain stays
    independent of the batched TPU ADMM under test. "scipy" keeps the
    original trust-constr path (slower; used as the IPM's own oracle)."""
    N = x_ref.shape[0]
    yaw = x0[2]  # current-yaw linearization for the whole horizon

    Ads, Bds = [], []
    for k in range(N):
        r = c_horizon[k] - p_com_horizon[k][None, :]
        A_c, B_c = continuous_matrices(yaw, r, mass, inertia)
        Ad, Bd = discretize_expm(A_c, B_c, dt)
        Ads.append(Ad)
        Bds.append(Bd)

    # Condensed lifting.
    A_qp = np.zeros((N * NX, NX))
    B_qp = np.zeros((N * NX, N * NU))
    Phi = np.eye(NX)
    for k in range(N):
        Phi = Ads[k] @ Phi
        A_qp[k * NX : (k + 1) * NX] = Phi
        for j in range(k + 1):
            blk = Bds[j]
            for i in range(j + 1, k + 1):
                blk = Ads[i] @ blk
            B_qp[k * NX : (k + 1) * NX, j * NU : (j + 1) * NU] = blk

    Qbar = np.tile(Q, N)
    Rbar = np.tile(R, N)
    H = B_qp.T @ (Qbar[:, None] * B_qp) + np.diag(Rbar)
    resid = A_qp @ x0 - x_ref.reshape(N * NX)
    g = B_qp.T @ (Qbar * resid)

    # Friction pyramid / force-zero constraints.
    rows, lo, hi = [], [], []
    for k in range(N):
        for i in range(NC):
            col = k * NU + 3 * i
            sel = lambda d: np.eye(N * NU)[col + d]
            if contact_horizon[k, i] > 0.5:
                for sx, d in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
                    row = sx * sel(d) - mu * sel(2)
                    rows.append(row)
                    lo.append(-np.inf)
                    hi.append(0.0)
                rows.append(sel(2))
                lo.append(fz_min)
                hi.append(fz_max)
            else:
                for d in range(3):
                    rows.append(sel(d))
                    lo.append(0.0)
                    hi.append(0.0)
    A_con = np.stack(rows)
    lo = np.asarray(lo)
    hi = np.asarray(hi)

    # Feasible start: weight spread over active contacts.
    U0 = np.zeros((N, NU))
    W = -mass * GRAVITY
    for k in range(N):
        n_act = max(contact_horizon[k].sum(), 1.0)
        for i in range(NC):
            if contact_horizon[k, i] > 0.5:
                U0[k, 3 * i + 2] = min(max(W / n_act, fz_min), fz_max)

    if qp_backend == "native":
        from g1_locomotion_tpu.ops import native_qp

        res = native_qp.solve(H, g, A_con, lo, hi, max_iter=100, tol=1e-11)
        assert res.status == 0, f"native IPM failed: status={res.status}"
        U = res.x.reshape(N, NU)
    else:
        res = minimize(
            lambda U: 0.5 * U @ H @ U + g @ U,
            U0.reshape(-1),
            jac=lambda U: H @ U + g,
            hess=lambda U: H,
            method="trust-constr",
            constraints=[LinearConstraint(A_con, lo, hi)],
            options={"maxiter": 400, "gtol": 1e-10, "xtol": 1e-12},
        )
        U = res.x.reshape(N, NU)

    # Rollout.
    xs = [x0]
    for k in range(N):
        xs.append(Ads[k] @ xs[-1] + Bds[k] @ U[k])
    x_horizon = np.stack(xs)
    return U[0], x_horizon, U
