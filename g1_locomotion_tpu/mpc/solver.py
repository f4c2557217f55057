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
    footstep_opt: bool = False  # footstep-integrated MPC: the upcoming
                               # landing's xy offset d becomes a QP decision
                               # variable (GRFs + stepping optimized jointly;
                               # the d x f torque bilinearity is linearized
                               # about the warm-start forces,
                               # srbd.landing_sensitivity)
    roll_moment_max: float = 0.0  # if > 0: cap |sum_i (r_i x f_i)_x| per
                               # knot [N.m] — the HARD version of the
                               # roll-honest Q weights. Soft weights only
                               # PRICE roll-channel lateral force, and when
                               # the lateral velocity error grows the MPC
                               # pays the price exactly when line-contact
                               # feet cannot deliver the moment (measured
                               # round 2 in MuJoCo: torso roll ratchets
                               # +0.26 rad/step until capsize). Pitch stays
                               # unbounded: the heel-toe lever is real.
    w_d: float = 300.0         # quadratic penalty on the landing offset
    d_scale: float = 1e-3      # QP works in d_hat = d/d_scale (millimeters):
                               # raw meter units give the d block an H-diagonal
                               # ~7 orders above the force block (cond(H)~4e8)
                               # and ADMM+Ruiz stall; in mm the blocks match
                               # (round-2 measurement: 4e3 vs 2e-5..0.1)
    d_box: float = 0.05        # reach box |dx|,|dy| <= d_box [m]. Kept small:
                               # the linearized d x f torque coupling is a
                               # *refinement* on top of the DCM placement law —
                               # its first-order model prefers instantaneous
                               # pitch torque over capture, so large |d| is
                               # anti-capture (round-2 diagnosis)
    # Default QP settings: robust for closed-loop control at any horizon.
    # "high"-precision ADMM iterations + 2 polish rounds (exact masked-KKT
    # solves at highest precision) are both faster and more accurate than the
    # round-1 60-iter/1-polish/highest default (tools/exp_qp_precision.py).
    # The iteration count must stay at 60: 20 iterations suffice at N=10
    # (bench.py passes that explicitly) but destabilize N=20 closed loops —
    # the round-2 push-recovery regression (tools/exp_push.py bisect: 20
    # iters fall, 60 recover, independent of precision). Closed-loop walking
    # pins its own config (engine.walking_config).
    qp: qplib.QPConfig = qplib.QPConfig(iters=60, scaling_iters=0, rho=1.0,
                                        rho_segments=2, polish_rounds=2,
                                        iter_precision="high")


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


def walking_weights(dtype=jnp.float32) -> MPCWeights:
    """Weights for dynamic walking: planar velocity weighted 10x height rate,
    and the roll channel priced honestly.

    Velocity rows: with the receding (CoM-anchored) sagittal reference the
    position rows carry no absolute error, so commanded-velocity tracking
    rides on the velocity rows — at the default 10 the gait settles into a
    slow limit cycle at ~0.3x the commanded speed (round-2 SRBD-loop sweep).

    Roll rows (theta_x 5 -> 30, omega_x 0.1 -> 3): with the default near-zero
    roll weights the MPC "generates" lateral force through the angular
    channel — when the lateral state diverges it plans 50-degree torso-roll
    trajectories (omega_x up to 4.5 rad/s measured in round 2) that no
    controller should execute; honest roll pricing keeps planned lateral
    forces inside the support polygon's ZMP authority, and foot placement
    (which the MPC co-optimizes) carries the correction instead.

    Kept separate from :func:`default_weights`: heavy velocity weighting
    trades normal force against velocity error in off-nominal single support
    (fz up to 35% above mg with the CoM 12 cm off the foot), which corrupts
    the reference-parity standing behaviors the defaults pin."""
    w = default_weights(dtype)
    return w._replace(
        Q=w.Q.at[9].set(100.0).at[10].set(100.0).at[0].set(30.0).at[6].set(3.0)
    )


class MPCSolution(NamedTuple):
    u0: jnp.ndarray        # (NU,) first-step GRFs — the reference's u_opt0
    U: jnp.ndarray         # (N, NU) full force plan (warm-start state)
    x_horizon: jnp.ndarray # (N+1, NX) predicted states, row 0 = x0 (x_opt)
    d: jnp.ndarray         # (2,) optimized landing xy offset (0 unless
                           # footstep_opt)
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
    landing_mask: Optional[jnp.ndarray] = None,  # (N, NC) 1 where the contact
                                # sits at the upcoming landing point (enables
                                # the footstep decision columns)
    f_nom: Optional[jnp.ndarray] = None,  # (N, NC, 3) nominal forces for the
                                # d x f linearization (warm start)
    hdot_sw: Optional[jnp.ndarray] = None,  # (N, 3) geometric swing-limb
                                # r x a horizon (planner.hdot_geom); scaled
                                # by params.m_swing into a previewed
                                # angular-momentum-rate disturbance
):
    """Assemble the condensed QP (H, g, A, l, u) + lifting matrices."""
    N = cfg.horizon
    dtype = x0.dtype

    # Per-step linearization: yaw from the reference trajectory (the reference
    # linearizes about current yaw; using the ref-yaw per step generalizes it).
    yaw_hor = x_ref[:, 2]
    r_hor = c_horizon - p_com_horizon[:, None, :]  # (N, NC, 3)

    if hdot_sw is None:
        def step_mats(yaw, r):
            A_c, B_c = srbd.continuous_matrices(params, yaw, r)
            return srbd.discretize(A_c, B_c, cfg.dt)

        Ad, Bd = jax.vmap(step_mats)(yaw_hor, r_hor)
        Wd = None
        W_lift = jnp.zeros((N * NX,), dtype)
    else:
        def step_mats_w(yaw, r, hd):
            A_c, B_c = srbd.continuous_matrices(params, yaw, r)
            Ad_k, Bd_k = srbd.discretize(A_c, B_c, cfg.dt)
            w_c = srbd.swing_disturbance(params, yaw, hd)
            return Ad_k, Bd_k, srbd.discretize_affine(A_c, w_c, cfg.dt)

        Ad, Bd, Wd = jax.vmap(step_mats_w)(yaw_hor, r_hor, hdot_sw)
        W_lift = srbd.lift_affine(Ad, Wd)

    A_qp, B_qp = srbd.condense(Ad, Bd)  # (N*NX, NX), (N*NX, N*NU)

    Ed = None
    E_qp = None
    if cfg.footstep_opt:
        if landing_mask is None:
            landing_mask = jnp.zeros((N, NC), dtype)
        if f_nom is None:
            f_nom = jnp.zeros((N, NC, 3), dtype)
        f_sum = jnp.einsum("nc,ncd->nd", landing_mask, f_nom)  # (N, 3)

        def step_E(yaw, fs, r):
            E_c = srbd.landing_sensitivity(params, yaw, fs)
            A_c, _ = srbd.continuous_matrices(params, yaw, r)
            _, E_d = srbd.discretize(A_c, E_c, cfg.dt)
            return E_d

        Ed = jax.vmap(step_E)(yaw_hor, f_sum, r_hor)  # (N, NX, 2)
        # Condense the shared d columns: row_k = A_k row_{k-1} + E_k.
        rows = []
        row = jnp.zeros((srbd.NX, 2), dtype)
        for k in range(N):
            row = (Ad[k] @ row if k > 0 else row) + Ed[k]
            rows.append(row)
        # The QP variable is d_hat = d / d_scale (see MPCConfig.d_scale).
        E_qp = jnp.concatenate(rows, axis=0) * cfg.d_scale  # (N*NX, 2)

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

    # Footstep decision columns: append the condensed d columns to the
    # (possibly knot-folded) B_qp and penalize d in Rbar.
    if E_qp is not None:
        B_qp = jnp.concatenate([B_qp, E_qp], axis=1)
        Rbar = jnp.concatenate(
            [Rbar, jnp.full((2,), cfg.w_d * cfg.d_scale**2, dtype)]
        )

    # H = B'QB + R ; g = B'Q (A x0 + W - X_ref)  (B_qp possibly knot-folded;
    # W is the lifted swing-momentum preview, zero without hdot_sw)
    BtQ = B_qp.T * Qbar[None, :]
    H = BtQ @ B_qp + jnp.diag(Rbar)
    resid = A_qp @ x0 + W_lift - x_ref.reshape(N * NX)
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

    if E_qp is not None:
        # Two zero columns for d in the cone rows + the reach box rows
        # |dx|, |dy| <= d_box.
        A_con = jnp.concatenate(
            [A_con, jnp.zeros((A_con.shape[0], 2), dtype)], axis=1
        )
        box = jnp.zeros((2, A_con.shape[1]), dtype)
        box = box.at[0, -2].set(1.0).at[1, -1].set(1.0)
        A_con = jnp.concatenate([A_con, box], axis=0)
        l = jnp.concatenate([l, jnp.full((2,), -cfg.d_box / cfg.d_scale, dtype)])
        u = jnp.concatenate([u, jnp.full((2,), cfg.d_box / cfg.d_scale, dtype)])

    if cfg.roll_moment_max > 0.0:
        # Roll-moment cap: |sum_i (r_ik x f_ik)_x| <= roll_moment_max per
        # knot. (r x f)_x = r_y f_z - r_z f_y, so the row touches knot k's
        # force vars with coefficients (0, -r_z, r_y) per contact; r from
        # the first step of each knot (exact at move_block = 1).
        step_of_knot = [min(k * mb, N - 1) for k in range(K_knots)]
        r_knot = r_hor[jnp.asarray(step_of_knot)]  # (K, NC, 3)
        m_rows = []
        for k in range(K_knots):
            row = jnp.zeros((K_knots, NC, 3), dtype)
            row = row.at[k, :, 1].set(-r_knot[k, :, 2])
            row = row.at[k, :, 2].set(r_knot[k, :, 1])
            m_rows.append(row.reshape(-1))
        M_rows = jnp.stack(m_rows)  # (K, K*NU)
        if E_qp is not None:
            # d_y shifts the landing contacts' lever: d(M_x)/d(d_y) =
            # sum(landing fz) linearized at the warm-start forces (d_z = 0;
            # scaled like the d columns).
            fz_land = jnp.einsum("nc,nc->n", landing_mask, f_nom[..., 2])
            dcol = jnp.zeros((K_knots, 2), dtype)
            dcol = dcol.at[:, 1].set(
                fz_land[jnp.asarray(step_of_knot)] * cfg.d_scale
            )
            M_rows = jnp.concatenate([M_rows, dcol], axis=1)
        A_con = jnp.concatenate([A_con, M_rows], axis=0)
        cap = jnp.full((K_knots,), cfg.roll_moment_max, dtype)
        l = jnp.concatenate([l, -cap])
        u = jnp.concatenate([u, cap])

    return H, g, A_con, l, u, A_qp, B_qp, Ad, Bd, Ed, Wd


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
    landing_mask: Optional[jnp.ndarray] = None,
    f_nom: Optional[jnp.ndarray] = None,
    hdot_sw: Optional[jnp.ndarray] = None,
) -> MPCSolution:
    """One MPC solve — the reference's ``MPC.update(...)`` (run_simulation.py:106).

    Returns first-step forces u0 (the reference's u_opt0) and the predicted
    state horizon (x_opt; row 1 is the WBID reference, ros_run_simulation.py:409).
    With cfg.footstep_opt, also the jointly-optimized landing offset d.
    """
    N = cfg.horizon
    dtype = x0.dtype
    mb = max(1, cfg.move_block)
    K_knots = (N + mb - 1) // mb
    if cfg.footstep_opt and f_nom is None and U_warm is not None:
        f_nom = U_warm.reshape(N, NC, 3)
    H, g, A_con, l, u, A_qp, B_qp, Ad, Bd, Ed, Wd = build_qp(
        cfg, weights, params, x0, x_ref, contact_horizon, c_horizon,
        p_com_horizon, landing_mask=landing_mask, f_nom=f_nom,
        hdot_sw=hdot_sw,
    )
    if U_warm is None:
        x0_warm = None
    else:
        idxs = jnp.clip(jnp.arange(K_knots) * mb, 0, N - 1)
        x0_warm = U_warm[idxs].reshape(K_knots * NU)
        if cfg.footstep_opt:
            x0_warm = jnp.concatenate([x0_warm, jnp.zeros(2, dtype)])
    sol = qplib.solve_qp(H, g, A_con, l, u, cfg=cfg.qp, x0=x0_warm)
    if cfg.footstep_opt:
        xU, d = sol.x[:-2], sol.x[-2:] * cfg.d_scale
    else:
        xU, d = sol.x, jnp.zeros(2, dtype)
    U = jnp.repeat(xU.reshape(K_knots, NU), mb, axis=0)[:N]
    # Hard-zero swing-contact forces: the QP constrains them to [0, 0], so
    # any residual is pure ADMM slack (~1e-2 N in f32) — masking makes the
    # physical invariant exact for downstream consumers (WBID f_des).
    U = U * jnp.repeat(contact_horizon, 3, axis=1)
    x_hor = srbd.rollout(Ad, Bd, x0, U, Ed=Ed, d=d, wd=Wd)
    return MPCSolution(
        u0=U[0], U=U, x_horizon=x_hor, d=d,
        pri_res=sol.pri_res, dua_res=sol.dua_res,
    )
