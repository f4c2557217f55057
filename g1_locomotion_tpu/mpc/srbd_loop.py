"""SRBD-level closed-loop simulation: the MPC in the loop with its own model.

The reference validates its MPC by running it against MuJoCo through the full
WBID cascade (ros_run_simulation.py) — every gait-logic iteration costs a
whole-body rollout. This module closes the loop one level down: the planner
(gait/planner.py) and the SRBD MPC (mpc/solver.py) drive the *single rigid
body dynamics themselves* (ZOH-discretized, the same model family the MPC
predicts with), with footholds teleporting to the planned landing at
touchdown — a perfect-tracking abstraction of the WBID+plant layers.

What it is for:
* Gait/placement logic iteration at ~100x the speed of the full engine
  (200 MPC periods in seconds on CPU, vmappable over parameter batches).
* Separating failure modes: a gait that falls here has a *planning/MPC*
  bug; one that walks here but falls in the engine has a *tracking* bug.
* Robustness studies: optional per-period velocity kicks and model mismatch
  (sim mass/inertia != MPC params) probe the stepping controller's capture
  behavior without whole-body cost.

The integration model is intentionally the MPC's own ZOH discretization at
the MPC rate: with subdivide=1 and no mismatch, deviations from the plan
isolate the receding-horizon/reference logic (the plan is re-solved every
period; only logic inconsistencies produce drift).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.gait import planner
from g1_locomotion_tpu.gait import schedule as gs
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc


class SRBDLoopState(NamedTuple):
    x: jnp.ndarray          # (13,) SRBD state
    feet: jnp.ndarray       # (2, 3) foot centers (L, R)
    U_warm: jnp.ndarray     # (N, 12)
    gait_clock: jnp.ndarray
    prev_stance: jnp.ndarray  # (2,) contact flags of the previous period
    landing: jnp.ndarray    # (3,) latest planned touchdown point


class SRBDLoopLog(NamedTuple):
    x: jnp.ndarray          # (13,) realized state at period end
    plan_x1: jnp.ndarray    # (13,) MPC's one-period prediction
    u0: jnp.ndarray         # (12,)
    landing: jnp.ndarray    # (3,)
    feet: jnp.ndarray       # (2, 3)
    contact: jnp.ndarray    # (2,) per-foot flags
    d: jnp.ndarray          # (2,) footstep-QP offset
    pri_res: jnp.ndarray


def init_loop_state(
    cfg: mpc.MPCConfig,
    com_height: float,
    dtype=jnp.float64,
    stance_width: float = 0.1185,
    foot_x: float = 0.0557,
) -> SRBDLoopState:
    """Standing start matching the whole-body engine's initial geometry
    (engine/state.q_init_standing FK: feet at x=0.0557, y=+-0.1185)."""
    x = jnp.zeros(13, dtype).at[5].set(com_height).at[12].set(srbd.GRAVITY)
    x = x.at[3].set(foot_x)
    feet = jnp.asarray(
        [[foot_x, stance_width, 0.0], [foot_x, -stance_width, 0.0]], dtype
    )
    return SRBDLoopState(
        x=x,
        feet=feet,
        U_warm=jnp.zeros((cfg.horizon, 12), dtype),
        gait_clock=jnp.asarray(0.0, dtype),
        prev_stance=jnp.ones(2, dtype),
        landing=feet[0],
    )


def contacts_from_feet(feet: jnp.ndarray) -> jnp.ndarray:
    """(2,3) foot centers -> (4,3) heel/toe contact points."""
    ht = jnp.asarray(planner.HEEL_TOE_XY, feet.dtype)
    return jnp.concatenate([feet[0][None] + ht, feet[1][None] + ht], axis=0)


def make_srbd_loop(
    cfg: mpc.MPCConfig,
    com_height: float = 0.598,
    subdivide: int = 1,
    sim_params: Optional[srbd.SRBDParams] = None,
):
    """Build the jittable closed-loop step/rollout.

    sim_params: the *simulated* rigid body (defaults to the MPC's own params;
    pass different mass/inertia for model-mismatch robustness studies).
    """

    def period(state: SRBDLoopState, inputs):
        params, kick = inputs  # params: engine.ScenarioParams-compatible
        dtype = state.x.dtype
        sp = sim_params if sim_params is not None else params.srbd

        cpos = contacts_from_feet(state.feet)
        plan = planner.plan_horizon(
            params.gait, params.steps, params.v_cmd, state.x, cpos,
            state.gait_clock, cfg.horizon, cfg.dt, com_height,
        )
        sol = mpc.solve(
            cfg, params.mpc_weights, params.srbd, state.x,
            plan.x_ref, plan.contact_hor, plan.c_hor, plan.p_ref,
            U_warm=state.U_warm, landing_mask=plan.landing_mask,
            hdot_sw=plan.hdot_geom,
        )
        landing = plan.landing
        if cfg.footstep_opt:
            landing = planner.apply_landing_offset(plan, sol.d)

        # Integrate the simulated SRBD under the first-step forces (ZOH).
        f = sol.u0
        contact0 = plan.contact_hor[0]
        yaw = state.x[2]
        r = cpos - state.x[3:6][None, :]
        A_c, B_c = srbd.continuous_matrices(sp, yaw, r)
        # Inactive contacts carry (QP-enforced) zero force; mask anyway so
        # model mismatch cannot leak force through them.
        f = f * jnp.repeat(jnp.repeat(
            jnp.stack([plan.contact_hor[0, 0], plan.contact_hor[0, 2]]), 2
        ), 3)
        h = cfg.dt / subdivide
        Ad, Bd = srbd.discretize(A_c, B_c, h)
        x = state.x
        for _ in range(subdivide):
            x = Ad @ x + Bd @ f
        x = x.at[9:12].add(kick)  # disturbance (velocity impulse)

        # Touchdown FSM: when a foot returns to stance, teleport it to the
        # planned landing (perfect swing tracking).
        clock_new = state.gait_clock + cfg.dt
        flags = gs.contact_flags(params.gait, clock_new)
        stance = jnp.stack([flags[0], flags[2]])
        touchdown = (stance > 0.5) & (state.prev_stance < 0.5)
        landing_xy = jnp.broadcast_to(landing, (2, 3)).at[:, 2].set(
            state.feet[:, 2]
        )
        feet = jnp.where(touchdown[:, None], landing_xy, state.feet)

        log = SRBDLoopLog(
            x=x, plan_x1=sol.x_horizon[1], u0=sol.u0, landing=landing,
            feet=feet, contact=stance, d=sol.d, pri_res=sol.pri_res,
        )
        return SRBDLoopState(
            x=x, feet=feet, U_warm=sol.U, gait_clock=clock_new,
            prev_stance=stance, landing=landing,
        ), log

    def rollout(state: SRBDLoopState, params, n_periods: int,
                kicks: Optional[jnp.ndarray] = None):
        dtype = state.x.dtype
        if kicks is None:
            kicks = jnp.zeros((n_periods, 3), dtype)

        def body(s, kick):
            return period(s, (params, kick))

        return jax.lax.scan(body, state, kicks)

    return rollout
