"""SRBD MPC: condensed dense QP over contact forces, solved by the batched ADMM.

TPU-native reimplementation of the reference's C++ ``mpc_to_wbid_node`` /
``srbd_mpc`` submodule (contract in SURVEY.md §2.3): condensed A_qp/B_qp
lifting, ``H = B_qpᵀ Q̄ B_qp + R̄``, friction-pyramid stacking, and the QP solve
that the reference does per tick on CPU with qpOASES/OSQP. Everything here is a
pure function of ``(params, state, references)`` — jit once, ``vmap`` over
thousands of scenarios.

Contact masking is static-shape: inactive contacts keep their QP columns but
are boxed to f = 0 (fz bounds collapse to [0,0]; the pyramid rows then force
fx = fy = 0) — the TPU-friendly equivalent of the reference's row removal.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.models.srbd import NC, NU, NX
from g1_locomotion_tpu.ops import qp as qplib


class MPCConfig(NamedTuple):
    """Static MPC configuration (shapes depend on horizon)."""

    horizon: int = 10          # N (BASELINE.json: N~10)
    dt: float = 0.04           # MPC discretization (run_simulation.py:169)
    move_block: int = 1        # force-knot blocking: u constant over blocks of
                               # this many steps (1 = per-step, the reference
                               # formulation). Halving the decision count cuts
                               # every KKT matrix op ~8x; contact flags should
                               # be block-constant or the conservative
                               # any-inactive-in-block -> knot inactive rule
                               # zeroes boundary knots.
    mu: float = 0.8            # friction coefficient (wbid.py:17)
    fz_min: float = 10.0       # min normal force in stance [N] (wbid.py:123)
    fz_max: float = 1000.0     # max normal force [N] (wbid.py:124)
    qp: qplib.QPConfig = qplib.QPConfig(iters=60, scaling_iters=0, rho=1.0,
                                        rho_segments=2, polish_rounds=1)


class MPCWeights(NamedTuple):
    """Diagonal cost weights (pytree — sweepable via vmap)."""

    Q: jnp.ndarray  # (NX,) state weights
    R: jnp.ndarray  # (NU,) force regularization


def default_weights(dtype=jnp.float32) -> MPCWeights:
    # Di Carlo-style weighting: roll/pitch weights deliberately small — with
    # the torso-only inertia the angular rows are extremely sensitive, and
    # heavy orientation tracking makes the QP sacrifice CoM recentering to
    # preserve moment neutrality (the robot then drifts sideways in single
    # support). Position (especially height) dominates; yaw moderate.
    Q = jnp.array(
        [5.0, 5.0, 50.0,        # theta rpy
         200.0, 200.0, 500.0,   # p com
         0.1, 0.1, 0.5,         # omega
         10.0, 10.0, 10.0,      # v com
         0.0],                  # g (uncontrollable)
        dtype,
    )
    R = jnp.full((NU,), 1e-5, dtype)
    return MPCWeights(Q=Q, R=R)


class MPCSolution(NamedTuple):
    u0: jnp.ndarray        # (NU,) first-step GRFs — the reference's u_opt0
    U: jnp.ndarray         # (N, NU) full force plan (warm-start state)
    x_horizon: jnp.ndarray # (N+1, NX) predicted states, row 0 = x0 (x_opt)
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray


def _constraint_blocks(cfg: MPCConfig, dtype):
    """Per-contact constraint rows (5 rows per contact per step).

    Active contact — friction pyramid + normal-force bounds:
        -inf <=  fx - mu*fz <= 0
        -inf <= -fx - mu*fz <= 0
        -inf <=  fy - mu*fz <= 0
        -inf <= -fy - mu*fz <= 0
        fz_min <= fz <= fz_max

    Inactive contact — the same 5 rows are *rewritten* (same shapes, different
    values) into clean equalities f = 0:
         fx = 0 ; fy = 0 ; fz = 0 ; two trivial 0<=0<=0 rows.
    This avoids the degenerate pyramid at fz=0 (linearly dependent rows that
    stall ADMM and break the polish KKT solve) — the TPU-static equivalent of
    the reference removing inactive-contact variables.
    """
    mu = cfg.mu
    C_active = jnp.array(
        [
            [1.0, 0.0, -mu],
            [-1.0, 0.0, -mu],
            [0.0, 1.0, -mu],
            [0.0, -1.0, -mu],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    C_inactive = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
        dtype,
    )
    return C_active, C_inactive  # each (5, 3)


def build_qp(
    cfg: MPCConfig,
    weights: MPCWeights,
    params: srbd.SRBDParams,
    x0: jnp.ndarray,            # (NX,)
    x_ref: jnp.ndarray,         # (N, NX) references for x_1..x_N
    contact_horizon: jnp.ndarray,  # (N, NC) 0/1 flags
    c_horizon: jnp.ndarray,     # (N, NC, 3) world contact positions
    p_com_horizon: jnp.ndarray, # (N, 3) CoM positions for lever arms
):
    """Assemble the condensed QP (H, g, A, l, u) + lifting matrices."""
    N = cfg.horizon
    dtype = x0.dtype

    # Per-step linearization: yaw from the reference trajectory (the reference
    # linearizes about current yaw; using the ref-yaw per step generalizes it).
    yaw_hor = x_ref[:, 2]
    r_hor = c_horizon - p_com_horizon[:, None, :]  # (N, NC, 3)

    def step_mats(yaw, r):
        A_c, B_c = srbd.continuous_matrices(params, yaw, r)
        return srbd.discretize(A_c, B_c, cfg.dt)

    Ad, Bd = jax.vmap(step_mats)(yaw_hor, r_hor)  # (N,NX,NX), (N,NX,NU)

    A_qp, B_qp = srbd.condense(Ad, Bd)  # (N*NX, NX), (N*NX, N*NU)

    Qbar = jnp.tile(weights.Q, N)  # (N*NX,)

    # Move blocking: fold per-step forces into per-knot forces via the
    # selector S (N*NU, K*NU); the QP solves for K knots, costs/constraints
    # stay expressed per step.
    mb = max(1, cfg.move_block)
    K_knots = (N + mb - 1) // mb
    if mb > 1:
        step_to_knot = jnp.asarray(
            [min(k // mb, K_knots - 1) for k in range(N)]
        )
        S_sel = (
            (step_to_knot[:, None] == jnp.arange(K_knots)[None, :])
            .astype(dtype)
        )  # (N, K)
        S = jnp.kron(S_sel, jnp.eye(NU, dtype=dtype))  # (N*NU, K*NU)
        B_qp = B_qp @ S
        Rbar = jnp.tile(weights.R, K_knots) * mb
        # Conservative contact flags per knot: inactive if ANY step in the
        # block is inactive for that contact.
        pad = jnp.ones((K_knots * mb - N, NC), dtype)
        ch = jnp.concatenate([contact_horizon, pad], axis=0)
        contact_knots = jnp.min(ch.reshape(K_knots, mb, NC), axis=1)
    else:
        Rbar = jnp.tile(weights.R, N)
        contact_knots = contact_horizon
        K_knots = N

    # H = B'QB + R ; g = B'Q (A x0 - X_ref)   (B_qp possibly knot-folded)
    BtQ = B_qp.T * Qbar[None, :]
    H = BtQ @ B_qp + jnp.diag(Rbar)
    resid = A_qp @ x0 - x_ref.reshape(N * NX)
    g = BtQ @ resid

    # Friction cones, blockdiag over (K_knots, NC): per-contact 5x3 block
    # chosen by the contact flag (active -> pyramid, inactive -> f=0).
    C_act, C_inact = _constraint_blocks(cfg, dtype)
    act = contact_knots.reshape(K_knots * NC)  # (NK,)
    blocks = jnp.where(act[:, None, None] > 0.5, C_act[None], C_inact[None])
    # Scatter blocks onto the block diagonal: (NK*5, NK*3).
    NK = K_knots * NC
    eye = jnp.eye(NK, dtype=dtype)
    A_con = (eye[:, None, :, None] * blocks[:, :, None, :]).reshape(NK * 5, NK * 3)

    neg_inf = jnp.asarray(-1e20, dtype)
    zeros = jnp.zeros_like(act)
    l_act = jnp.stack([neg_inf + zeros] * 4 + [cfg.fz_min + zeros], axis=1)
    u_act = jnp.stack([zeros] * 4 + [cfg.fz_max + zeros], axis=1)
    l_in = jnp.zeros((NK, 5), dtype)
    u_in = jnp.zeros((NK, 5), dtype)
    mask = act[:, None] > 0.5
    l = jnp.where(mask, l_act, l_in).reshape(-1)
    u = jnp.where(mask, u_act, u_in).reshape(-1)

    return H, g, A_con, l, u, A_qp, B_qp, Ad, Bd


def solve(
    cfg: MPCConfig,
    weights: MPCWeights,
    params: srbd.SRBDParams,
    x0: jnp.ndarray,
    x_ref: jnp.ndarray,
    contact_horizon: jnp.ndarray,
    c_horizon: jnp.ndarray,
    p_com_horizon: jnp.ndarray,
    U_warm: Optional[jnp.ndarray] = None,
) -> MPCSolution:
    """One MPC solve — the reference's ``MPC.update(...)`` (run_simulation.py:106).

    Returns first-step forces u0 (the reference's u_opt0) and the predicted
    state horizon (x_opt; row 1 is the WBID reference, ros_run_simulation.py:409).
    """
    N = cfg.horizon
    mb = max(1, cfg.move_block)
    K_knots = (N + mb - 1) // mb
    H, g, A_con, l, u, A_qp, B_qp, Ad, Bd = build_qp(
        cfg, weights, params, x0, x_ref, contact_horizon, c_horizon, p_com_horizon
    )
    if U_warm is None:
        x0_warm = None
    else:
        idxs = jnp.clip(jnp.arange(K_knots) * mb, 0, N - 1)
        x0_warm = U_warm[idxs].reshape(K_knots * NU)
    sol = qplib.solve_qp(H, g, A_con, l, u, cfg=cfg.qp, x0=x0_warm)
    U = jnp.repeat(sol.x.reshape(K_knots, NU), mb, axis=0)[:N]
    x_hor = srbd.rollout(Ad, Bd, x0, U)
    return MPCSolution(
        u0=U[0], U=U, x_horizon=x_hor, pri_res=sol.pri_res, dua_res=sol.dua_res
    )
