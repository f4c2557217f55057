"""Horizon planner: gait state + SRBD measurement -> MPC problem inputs.

This is the planning half of the reference's ``mpc_to_wbid_node`` (SURVEY.md
§2.3): footstep placement, horizon contact schedule/positions, and the CoM
reference trajectory. It is deliberately robot-independent — it consumes only
the 13-dim SRBD state and the 4 contact-point positions — so the same logic
drives both the full whole-body engine (engine/tick.py) and the fast
SRBD-level closed-loop simulator (mpc/srbd_loop.py) used for gait iteration
and MPC-level validation.

Design (round 2): both axes use nominal geometry on the commanded ramp plus
DCM feedback relative to the periodic LIPM orbit (gait/schedule.py):

* Lateral: nominal width beside the centerline; the measured DCM is
  propagated to touchdown through the step's nominal ZMP profile and the
  foot steps ``dcm_scale x (predicted - nominal)`` further out. On the orbit
  the correction vanishes; off it, stepping absorbs the error — the
  mechanism a fixed plan lacks and the naive capture-point law (which
  ignores double support and collapses stance width) gets wrong.
* Sagittal: the shift-periodic orbit's nominal touchdown offset
  (c0 = v T/2 ahead of the ramp) plus the same DCM feedback.
* CoM reference: feet-relative (receding) anchoring — see the comment block
  in :func:`plan_horizon`. Outside the gait the anchor degenerates to the
  (static) support centroid, reproducing the reference's fixed absolute
  standing target (run_simulation.py:80-82).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import jax

from g1_locomotion_tpu.gait import footsteps as fs
from g1_locomotion_tpu.gait import schedule as gs
from g1_locomotion_tpu.gait import swing as sw
from g1_locomotion_tpu.models import srbd

# Heel/toe frame offsets from the foot center (g1_23dof.urdf:288,293).
HEEL_TOE_XY = ((-0.05, 0.0, 0.0), (0.12, 0.0, 0.0))
# The heel/toe pair is asymmetric about the ankle: their mean sits 3.5 cm
# ahead of the foot-frame center. Sagittal anchors must subtract this —
# anchoring on the raw contact mean parks the reference 3.5 cm ahead of the
# ankle, 3.8 cm ahead of the natural standing CoM, and the resulting
# permanent "DCM error" walks the robot backward (round-2 SRBD-loop
# diagnosis: vx bias ~ -0.03 m/s even stepping in place).
_HT_X_OFF = sum(p[0] for p in HEEL_TOE_XY) / len(HEEL_TOE_XY)


class MPCPlan(NamedTuple):
    """Everything the MPC solve needs, plus bookkeeping for the engine."""

    x_ref: jnp.ndarray        # (N, 13) state reference horizon
    contact_hor: jnp.ndarray  # (N, 4) 0/1 contact schedule
    c_hor: jnp.ndarray        # (N, 4, 3) horizon contact positions
    p_ref: jnp.ndarray        # (N, 3) CoM position reference
    landing: jnp.ndarray      # (3,) planned touchdown point (foot center)
    landing_mask: jnp.ndarray # (N, 4) 1 where a contact sits at the landing
    stance_y: jnp.ndarray     # scalar: stance-foot y (for separation clips)
    swing_is_left: jnp.ndarray
    hdot_geom: jnp.ndarray    # (N, 3) swing-limb geometric r x a preview
                              # (zero outside the current swing window) —
                              # feeds mpc.solve(hdot_sw=...) where it is
                              # scaled by SRBDParams.m_swing


def clip_landing_y(y_land, stance_y, swing_is_left):
    """Foot-separation clip: keep the landing >= 8 cm and <= 45 cm from the
    stance foot, on the swing side."""
    return jnp.where(
        swing_is_left,
        jnp.clip(y_land, stance_y + 0.08, stance_y + 0.45),
        jnp.clip(y_land, stance_y - 0.45, stance_y - 0.08),
    )


def plan_horizon(
    gait: gs.GaitConfig,
    steps: fs.FootstepConfig,
    v_cmd: jnp.ndarray,       # (2,) commanded planar velocity
    x0: jnp.ndarray,          # (13,) measured SRBD state
    cpos: jnp.ndarray,        # (4, 3) contact positions (LH, LT, RH, RT)
    gait_clock: jnp.ndarray,  # scalar gated gait time
    N: int,
    dt_mpc: float,
    com_height: float,
    hold: jnp.ndarray | float = 0.0,  # 1 while the weight-transfer gate
                              # pauses the clock: switches the sagittal
                              # anchor from receding to absolute (see below)
    prev_landing: jnp.ndarray | None = None,  # (3,) the landing committed at
                              # the previous replan — used with lock_flag
    lock_flag: jnp.ndarray | float = 0.0,  # 1 past the landing-lock swing
                              # phase (gait.landing_lock): keep prev_landing
                              # so the whole plan (landing, c_hor rows,
                              # landing_mask geometry) stays consistent with
                              # the foothold the swing foot is converging to
    swing_start: jnp.ndarray | None = None,  # (2, 3) per-foot lift-off
                              # positions (engine/tick.py latches them); the
                              # swing-momentum preview evaluates the nominal
                              # profile from here. None: approximate with
                              # the swing side's current contact mean
    z_apex: float = 0.05,     # swing apex height for the momentum preview
    plan_extras: bool = False,  # STATIC gate for the round-5 experimental
                              # mechanisms (dcm_err_gain schedule, stop_ramp,
                              # pre_stop). False (default) compiles the
                              # EXACT round-4 program: even value-neutral
                              # extra ops change XLA's codegen draw, and the
                              # validated walking bundles are chaotic at the
                              # ulp level (measured round 5: the stale-
                              # cadence walk flipped from the added where()
                              # ops alone while the golden stayed bitwise
                              # identical). EngineConfig.plan_extras wires
                              # it; the diag/ensemble/sweep tools enable it.
) -> MPCPlan:
    dtype = x0.dtype
    hold = jnp.asarray(hold, dtype)

    contact_hor = gs.contact_horizon(gait, gait_clock, N, dt_mpc)
    step_idx, _, swing_is_left, _ = gs.phase_info(gait, gait_clock)

    if plan_extras:
        # Pre-stop deceleration (gait.pre_stop_s > 0): the commanded
        # velocity — as seen by EVERY consumer below (ramp, orbits, DCM
        # nominals, footstep placement) — ramps linearly to zero over the
        # last pre_stop_s of the gait, so the final footholds become
        # capture steps for the slowing gait (see GaitConfig.pre_stop_s).
        # Evaluated at the CURRENT clock (the horizon sees a constant; the
        # MPC replans every period).
        _t_end_ps = gait.start_time + gait.n_steps * (
            gait.swing_duration + gait.double_support_duration
        )
        _ps_factor = jnp.where(
            gait.pre_stop_s > 0,
            jnp.clip(
                (_t_end_ps - gait_clock)
                / jnp.maximum(gait.pre_stop_s, 1e-6),
                0.0,
                1.0,
            ),
            1.0,
        )
        v_cmd = v_cmd * _ps_factor

    stance_mask = jnp.where(
        swing_is_left,
        jnp.array([0.0, 0.0, 1.0, 1.0], dtype),
        jnp.array([1.0, 1.0, 0.0, 0.0], dtype),
    )
    p_sy = jnp.sum(stance_mask * cpos[:, 1]) / jnp.sum(stance_mask)
    # Stance ANKLE x (contact mean minus the heel/toe asymmetry offset).
    p_sx = jnp.sum(stance_mask * cpos[:, 0]) / jnp.sum(stance_mask) - _HT_X_OFF
    half = gait.swing_duration + gait.double_support_duration
    omega0 = jnp.sqrt(jnp.asarray(-srbd.GRAVITY, dtype) / com_height)
    W = steps.step_width
    T_gait = gait.n_steps * half
    t_in_step = jnp.clip(
        gait_clock - gait.start_time - step_idx * half, 0.0, None
    )
    in_step = (step_idx >= 0) & (step_idx < gait.n_steps)

    # ---- Feet-relative (receding) anchoring -------------------------------
    # All CoM references and DCM measurements are anchored to the *realized
    # stance foot*, never to an absolute world line. An absolute anchor makes
    # the MPC fight the DCM-corrected footholds (the reference ramp marches
    # on while the feet capture a disturbance — position error accumulates
    # as lateral/sagittal force until the gait diverges; round-2 SRBD-loop
    # diagnosis). With relative anchoring, position error cannot accumulate:
    # foot placement is the lateral stabilizer, GRFs only track the orbit
    # shape within a step — the standard DCM-gait division of labor.
    #
    # Lateral: the walking centerline implied by the stance foot.
    line_y_gait = p_sy + jnp.where(swing_is_left, W, -W)
    # Sagittal: the stance foot of step j touched down at the start of this
    # step, c0 = vT/2 ahead of the commanded ramp — so the ramp "now" sits at
    # stance_x - c0 + v * t_in_step, and the next nominal landing advances
    # exactly one step length: stance_x + v*T.
    c0 = 0.5 * v_cmd[0] * half
    ramp_x_gait = p_sx - c0 + v_cmd[0] * t_in_step
    # Outside the gait (pre-start, post-walk, n_steps = 0): hold the support
    # centroid laterally; sagittally the anchor depends on the scenario:
    #
    # * PURE STANDING (n_steps = 0): the RAW contact centroid — the midpoint
    #   of the CoP range, NOT the ankle (centroid - _HT_X_OFF). The G1 foot
    #   is heavily asymmetric (heel -5 cm, toe +12 cm of the foot frame), so
    #   an ankle-centered stand leaves only ~3 cm of backward CoP margin —
    #   the re-centering maneuver toward it builds ~0.1 m/s that the heel
    #   edge can only marginally brake, and under real unilateral contacts
    #   (MuJoCo) the robot toppled backward at ~1.2 s, every round-1/2 gain
    #   variant alike. The centroid target has symmetric +-8.5 cm margins.
    # * WALK scenarios (pre-gait stand and post-walk settle): the ankle mean
    #   (centroid - _HT_X_OFF), CONTINUOUS with the in-gait ramp anchor p_sx.
    #   Switching the settle to the centroid as a step input at gait end
    #   toppled the internal 8-step walk forward (round 2) — but PARKING at
    #   the ankle mean leaves only ~3 cm of backward CoP margin on the
    #   heel-short G1 foot, and the MuJoCo 8-step settle toppled BACKWARD
    #   over the heels at ~0.8 s after the last touchdown (round-2b trace:
    #   pitch -1.3 rad, CoM x receding 17 cm). Resolution: BLEND the settle
    #   anchor from the ankle mean to the centroid over 1 s starting 0.5 s
    #   after the last touchdown — gait-continuous at exit, full symmetric
    #   CoP margin once the walking momentum has been absorbed.
    centroid = jnp.mean(cpos, axis=0)
    tau_now = gait_clock - gait.start_time
    s_blend = jnp.clip(
        (tau_now - T_gait - 0.5)
        / jnp.maximum(gait.settle_blend_s, 1e-3),
        0.0,
        1.0,
    )
    stand_x = jnp.where(
        gait.n_steps < 0.5,
        centroid[0],
        centroid[0] - _HT_X_OFF + s_blend * _HT_X_OFF,
    )
    line_y = jnp.where(in_step, line_y_gait, centroid[1])
    ramp_x = jnp.where(in_step, ramp_x_gait, stand_x)

    # Lateral placement: DCM feedback vs the mirror-periodic orbit.
    xi_rel = (x0[4] + (x0[10] - v_cmd[1]) / omega0) - line_y
    xi_pred = gs.predict_touchdown_dcm(
        gait, omega0, W, xi_rel, t_in_step, swing_is_left
    )
    xi_nom = gs.touchdown_dcm_nominal(gait, omega0, W, swing_is_left)
    # Terminal stance widening (steps.final_widen > 0): the last two
    # landings go final_widen further outboard, so the walk tail and the
    # settle inherit a wide support base while the gait keeps its nominal
    # geometry. The in-step centerline stays at nominal W — after a widened
    # step n-2 landing that rides the CoM reference closer to the stance
    # foot, which is the intent for a terminal capture.
    w_land = W + steps.final_widen * jnp.clip(
        step_idx - (gait.n_steps - 2.0) + 1.0, 0.0, 1.0
    )
    # State-scheduled lateral DCM gain (steps.dcm_err_gain > 0): slope
    # dcm_scale on the orbit, proportionally harder stepping off it.
    # Measured round 5 (tools/sweep_margins.py 3): does NOT widen the
    # dcm_scale knife edge — kept as an experiment behind plan_extras.
    e_xi = xi_pred - xi_nom
    if plan_extras:
        eff_scale = steps.dcm_scale + steps.dcm_err_gain * jnp.abs(e_xi)
        corr_y = jnp.clip(
            eff_scale * e_xi, -steps.dcm_corr_max, steps.dcm_corr_max
        )
    else:
        corr_y = steps.dcm_scale * e_xi
    y_land = (
        line_y
        + jnp.where(swing_is_left, w_land, -w_land)
        + corr_y
    )
    y_land = clip_landing_y(y_land, p_sy, swing_is_left)

    # Sagittal placement: one nominal step length ahead of the stance foot
    # plus the same DCM feedback.
    xi_rel_x = (x0[3] + (x0[9] - v_cmd[0]) / omega0) - ramp_x
    xi_pred_x = gs.predict_touchdown_dcm_x(
        gait, omega0, v_cmd[0], xi_rel_x, t_in_step
    )
    xi_nom_x = gs.touchdown_dcm_nominal_x(gait, omega0, v_cmd[0])
    x_land = (
        ramp_x + v_cmd[0] * (half - t_in_step) + c0
        + fs.dcm_scale_sagittal(steps) * (xi_pred_x - xi_nom_x)
    )
    landing = jnp.stack([x_land, y_land, jnp.zeros_like(x_land)])
    if prev_landing is not None:
        lock = jnp.asarray(lock_flag, dtype)
        landing = jnp.where(lock > 0.5, prev_landing, landing)

    # Horizon contact positions: stance contacts hold their measured
    # position; swing-side contacts switch to the planned landing point for
    # horizon steps after touchdown (the reference's MPC node plans with
    # landing_position the same way, SURVEY.md §2.3).
    heel_toe_xy = jnp.asarray(HEEL_TOE_XY, dtype)
    contact_z = jnp.mean(cpos[:, 2])
    landing_pts = landing[None, :] + heel_toe_xy
    landing_pts = landing_pts.at[:, 2].set(contact_z)

    swing_end = (
        gait.start_time
        + step_idx * half
        + gait.double_support_duration
        + gait.swing_duration
    )
    ts = gait_clock + dt_mpc * jnp.arange(N, dtype=dtype)
    after_touchdown = ts >= swing_end  # (N,)
    in_step = (step_idx >= 0) & (step_idx < gait.n_steps)

    swing_side = jnp.where(swing_is_left, 0, 1)  # 0 = left
    use_landing = after_touchdown & in_step  # (N,)
    mask_L = use_landing & (swing_side == 0)
    mask_R = use_landing & (swing_side == 1)
    c_hor = jnp.tile(cpos[None], (N, 1, 1))
    for i in range(2):  # heel/toe of the swinging side
        col_left = i          # L-heel / L-toe
        col_right = 2 + i     # R-heel / R-toe
        new_left = jnp.where(
            mask_L[:, None], landing_pts[i][None, :], c_hor[:, col_left]
        )
        new_right = jnp.where(
            mask_R[:, None], landing_pts[i][None, :], c_hor[:, col_right]
        )
        c_hor = c_hor.at[:, col_left].set(new_left).at[:, col_right].set(new_right)
    landing_mask = jnp.stack([mask_L, mask_L, mask_R, mask_R], axis=1).astype(dtype)

    # Reference horizon: feet-anchored ramp + periodic-orbit oscillation.
    # The ramp advances only while the gait runs (frozen before start and
    # after the last touchdown — the orbit terms blend out there too).
    ks = jnp.arange(1, N + 1, dtype=dtype)
    ts_ref = gait_clock + dt_mpc * ks
    y_orb, vy_orb = gs.lateral_orbit_reference(gait, ts_ref, omega0, W)
    ts_all = jnp.concatenate([gait_clock[None], ts_ref])
    x_orb_all, vx_orb_all = gs.sagittal_orbit_reference(
        gait, ts_all, omega0, v_cmd[0]
    )
    x_orb_now, x_orb = x_orb_all[0], x_orb_all[1:]
    vx_orb = vx_orb_all[1:]
    t_end = gait.start_time + T_gait
    adv = jnp.clip(
        jnp.minimum(ts_ref, t_end) - jnp.maximum(gait_clock, gait.start_time),
        0.0, None,
    )  # in-gait time advanced from "now" to each horizon knot
    # Sagittal stop ramp (gait.stop_ramp_s > 0): the commanded velocity
    # decays linearly over the ramp after the last touchdown and the ramp
    # position advances by its integral R*(s - s^2/2) — the legacy stop
    # (R = 0) freezes the reference instantly, which over-brakes the walk
    # tail on the heel-short foot (see GaitConfig.stop_ramp_s).
    if plan_extras:
        in_walk = gait.n_steps > 0.5
        R_stop = jnp.maximum(gait.stop_ramp_s, 1e-6)
        s_stop_k = jnp.clip((ts_ref - t_end) / R_stop, 0.0, 1.0)  # (N,)
        s_stop_now = jnp.clip(
            (jnp.maximum(gait_clock, gait.start_time) - t_end) / R_stop,
            0.0, 1.0,
        )
        decel_pos = lambda s: gait.stop_ramp_s * (s - 0.5 * s * s)
        adv = adv + jnp.where(
            in_walk, decel_pos(s_stop_k) - decel_pos(s_stop_now), 0.0
        )
        vx_tail = jnp.where(
            in_walk & (ts_ref >= t_end),
            v_cmd[0] * (1.0 - s_stop_k) * jnp.sign(gait.stop_ramp_s),
            0.0,
        )
    gait_elapsed = jnp.clip(ts_ref - gait.start_time, 0.0, T_gait)
    in_gait_k = (gait_elapsed > 0.0) & (gait_elapsed < T_gait)
    # Sagittal position reference: RECEDING from the measured CoM during the
    # gait (velocity shaping only — anchoring it on the feet couples a
    # positive feedback: a capture step lands ahead, the anchor jumps ahead,
    # the reference drags the CoM faster, the next step lands further ahead;
    # observed as a velocity runaway in the SRBD loop even at v_cmd = 0).
    # Foot placement stays foot-relative and is the sagittal stabilizer.
    # Outside the gait the anchor is the (static) stance ankle mean — an
    # absolute standing/settle hold. During a weight-transfer HOLD the anchor
    # must also be absolute: stepping (the receding design's stabilizer) is
    # exactly what the hold withholds, and a receding reference then corrects
    # no position drift at all — the robot creeps forward off the frozen
    # support polygon and tips (round-2 experiment: forward fall with the
    # clock paused).
    recede = in_step & (hold < 0.5)
    x_anchor = jnp.where(recede, x0[3] - x_orb_now, ramp_x)
    x_ref_line = x_anchor + v_cmd[0] * adv + x_orb
    if plan_extras:
        vx_ref = jnp.where(in_gait_k, v_cmd[0], 0.0) + vx_tail + vx_orb
    else:
        vx_ref = jnp.where(in_gait_k, v_cmd[0], 0.0) + vx_orb
    # Lateral: during a weight-transfer HOLD the reference is the transfer
    # TARGET — the swing-onset DCM as a *position* (y_orb + vy_orb/omega0),
    # with zero velocity reference. A station-keeping MPC regulates y -> ref
    # with vy -> 0, so xi converges to exactly the gate's release criterion
    # (engine/tick.py xi_target); holding the plain orbit *position* instead
    # leaves xi short by sway*vy_orb/omega0 (~4 cm at the nominal gait) and
    # the gate deadlocks at DS start (round-2 experiment). On release the
    # stable-mode mismatch (y past the orbit point, vy ~ 0) decays at
    # e^{-omega0 t}; the DCM — the swing's fate — starts right.
    y_ref = line_y + v_cmd[1] * adv + gait.sway_gain * (
        y_orb + hold * vy_orb / omega0
    )
    p_ref = jnp.stack(
        [x_ref_line, y_ref, jnp.full((N,), com_height, dtype)], axis=1
    )

    # ---- Swing-limb momentum preview --------------------------------------
    # Geometric r x a of the swing foot over the current step's swing window,
    # from the nominal closed-form profile (gait/swing.py). The MPC scales it
    # by SRBDParams.m_swing into the previewed angular disturbance
    # (srbd.swing_disturbance) — the SRBD's angular channel otherwise
    # attributes the swinging leg's momentum to torso rotation, and the WBID
    # realizes GRFs that fight it exactly when line-contact feet are weakest
    # (TODO.md 4a/4e: the MuJoCo lateral under-delivery).
    sw_sel = jnp.where(
        swing_is_left,
        jnp.array([1.0, 1.0, 0.0, 0.0], dtype),
        jnp.array([0.0, 0.0, 1.0, 1.0], dtype),
    )
    p_sw_now = jnp.sum(sw_sel[:, None] * cpos, axis=0) / 2.0
    if swing_start is None:
        p_start_sw = p_sw_now
    else:
        p_start_sw = jnp.where(swing_is_left, swing_start[0], swing_start[1])
    swing_begin = (
        gait.start_time + step_idx * half + gait.double_support_duration
    )
    ts_now = gait_clock + dt_mpc * jnp.arange(N, dtype=dtype)
    in_swing_k = (ts_now >= swing_begin) & (ts_now < swing_end) & in_step
    prog_k = jnp.clip((ts_now - swing_begin) / gait.swing_duration, 0.0, 1.0)
    sp = sw.SwingParams(
        p_start=p_start_sw, p_end=landing,
        z_apex=jnp.asarray(z_apex, dtype),
    )
    pos_k, _, acc_k = jax.vmap(
        lambda s: sw.evaluate(sp, s, gait.swing_duration)
    )(prog_k)
    hdot_geom = (
        jnp.cross(pos_k - p_ref, acc_k) * in_swing_k[:, None].astype(dtype)
    )
    if plan_extras:
        vy_tail = jnp.where(
            in_walk & (ts_ref >= t_end),
            v_cmd[1] * (1.0 - s_stop_k) * jnp.sign(gait.stop_ramp_s),
            0.0,
        )
        vy_in = jnp.where(in_gait_k, v_cmd[1], 0.0) + vy_tail
    else:
        vy_in = jnp.where(in_gait_k, v_cmd[1], 0.0)
    v_ref_xy = jnp.stack(
        [vx_ref,
         (vy_in + gait.sway_gain * vy_orb)
         * (1.0 - hold)],
        axis=1,
    )
    x_ref = jnp.zeros((N, 13), dtype)
    x_ref = x_ref.at[:, 3:6].set(p_ref)
    x_ref = x_ref.at[:, 9:11].set(v_ref_xy)
    x_ref = x_ref.at[:, 12].set(jnp.asarray(srbd.GRAVITY, dtype))
    # Stance-side torso lean reference (gait.lean_gain; see
    # gs.GaitConfig.lean_gain): roll toward the stance foot in phase with
    # the lateral orbit. y_orb > 0 means the CoM rides left (left stance);
    # positive theta_x tips the body toward -y (right side down), so the
    # left lean is NEGATIVE roll.
    x_ref = x_ref.at[:, 0].set(
        -gait.lean_gain * y_orb / jnp.maximum(W, 1e-3)
    )

    return MPCPlan(
        x_ref=x_ref,
        contact_hor=contact_hor,
        c_hor=c_hor,
        p_ref=p_ref,
        landing=landing,
        landing_mask=landing_mask,
        stance_y=p_sy,
        swing_is_left=swing_is_left,
        hdot_geom=hdot_geom,
    )


def apply_landing_offset(plan: MPCPlan, d: jnp.ndarray) -> jnp.ndarray:
    """Fold the MPC's jointly-optimized landing offset d into the planned
    landing point (re-clipped for foot separation)."""
    landing = plan.landing.at[0].add(d[0])
    y_adj = clip_landing_y(
        plan.landing[1] + d[1], plan.stance_y, plan.swing_is_left
    )
    return landing.at[1].set(y_adj)
