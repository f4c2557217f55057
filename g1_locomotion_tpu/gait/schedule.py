"""Phase-based gait schedule: contact flags over the MPC horizon.

TPU-native replacement for the gait scheduler inside the reference's C++
``mpc_to_wbid_node`` (SURVEY.md §2.3: the node advances a walking schedule and
publishes per-contact ``active`` flags that the sim consumes as the
contact-switching signal, ros_run_simulation.py:214-216). Here the schedule is
a pure function of time — vmappable over scenarios with different timings.

Cycle structure (walking): a period T with two single-support swings and two
double-support intervals:

    [DS][left-swing][DS][right-swing]   (fractions configurable)

Contact order matches the reference: [L-heel, L-toe, R-heel, R-toe]
(ros_run_simulation.py:65).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class GaitConfig(NamedTuple):
    """Gait timing + weight-transfer parameters (a pytree of scalars —
    randomizable per scenario)."""

    swing_duration: jnp.ndarray  # s (reference: 0.25, ros_run_simulation.py:148)
    double_support_duration: jnp.ndarray  # s between swings
    start_time: jnp.ndarray  # gait starts after an initial stand phase
    n_steps: jnp.ndarray  # total number of steps before standing again
    sway_gain: jnp.ndarray  # scale on the periodic lateral orbit amplitude in
                            # the CoM reference (1.0 = dynamically consistent)
    gate_window: jnp.ndarray  # last fraction of DS where the weight-transfer
                              # gate applies (0 = disabled); the gate pauses
                              # the gait clock until the CoM is over (and
                              # settling above) the upcoming stance foot —
                              # state-gated step timing
    gate_xi_tol: jnp.ndarray   # gate: |xi_y - xi_target| tolerance [m] on the
                               # lateral DCM. One number, not separate pos/vel
                               # tolerances: the DCM is the only quantity a
                               # station-keeping MPC can regulate during a
                               # clock hold (position converges to the frozen
                               # reference with vy -> 0, so any independent
                               # velocity criterion with a nonzero target
                               # deadlocks the gate — round-2 experiment), and
                               # the LIPM's unstable mode depends on xi alone.
    # Vertical crouch guard (always on, unlike the lateral gate): in the DS
    # tail, refuse to start the swing while the CoM is sagging — a swing
    # begun from a deep crouch collapses the stance knee (round-2 failure
    # mode after the lateral fix: z sag -> step anyway -> knee saturation).
    gate_z_tol: jnp.ndarray    # allow swing only if com_z > target - tol [m]
    gate_vz_tol: jnp.ndarray   # ... and vz > -tol [m/s]
    swing_xy_rate_max: jnp.ndarray  # [m/s] cap on the receding swing-foot
                                    # xy reference speed (realizable-foothold
                                    # guard, engine/tick.py)
    # Step-TIMING adaptation (Khadiv et al.-style "step earlier"): during the
    # swing, once the lateral DCM predicted at the nominal touchdown deviates
    # from the periodic orbit by more than timing_tol, the engine runs the
    # gait clock FASTER (engine/tick.py) — touchdown happens early, capping
    # the LIPM's e^{omega0 t} error growth before it exceeds what foot
    # placement (clip_landing_y-bounded) can absorb. Placement and timing are
    # the two complementary capturability levers; the reference has neither
    # (fixed schedule), so this is additive capability, default OFF.
    timing_gain: jnp.ndarray      # extra clock rate per m of excess DCM error
                                  # (0 = disabled)
    timing_tol: jnp.ndarray       # [m] touchdown-DCM error deadband
    timing_rate_max: jnp.ndarray  # cap on the sped-up clock rate (>= 1)
    # Double-support SLOW-DOWN (the DS-side half of step-timing adaptation):
    # when the DCM propagated to swing onset (predict_ds_end_dcm) lags the
    # orbit's swing-onset target by more than gate_xi_tol, run the gait
    # clock SLOWER during the gate_window tail of double support — a longer
    # (never frozen) weight transfer. Unlike the round-2/3 clock-freeze
    # gate (a measured dead end: a frozen clock + station-keeping hold
    # demands lateral force line feet cannot deliver and the robot rolls
    # over during the hold), a slowed clock keeps every reference evolving
    # and cannot deadlock. 0 = disabled.
    ds_slow_gain: jnp.ndarray     # clock-rate reduction per m of predicted
                                  # swing-onset DCM shortfall
    ds_rate_min: jnp.ndarray      # floor on the slowed clock rate (> 0)
    # Landing LOCK: swing-phase fraction after which the landing target is
    # FROZEN for the current swing (1.0 = never lock, the round-2 behavior).
    # Late capture-point updates chase a target the rate-limited swing foot
    # cannot reach (measured round 3: 2-8 cm touchdown xy error per step in
    # MuJoCo) — locking converts the tail of the swing into a converging
    # servo so the planner's assumed foothold is the realized one.
    landing_lock: jnp.ndarray
    # Stance-side torso LEAN in the plan reference [rad at full orbit
    # amplitude]: theta_x_ref = lean_gain * y_orb / W — lean toward the
    # stance foot in phase with the lateral orbit (the human strategy).
    # Rationale (round-4 MuJoCo diagnosis): line-contact feet have no roll
    # authority, so lateral force beyond the gravity-lever bound
    # fz*(y_com-y_foot)/z rolls the torso; a zero-roll reference makes the
    # WBID fight exactly that roll and under-deliver fy ~40-60% in single
    # support. A leaned reference PLANS the roll the physics produces
    # anyway, shifting the CoM toward the stance foot and cutting the
    # required lateral force. 0 = disabled (flagship default).
    lean_gain: jnp.ndarray
    # Settle-anchor blend duration [s]: after the walk, the sagittal stand
    # anchor blends from the gait-continuous ankle mean to the full-margin
    # support centroid (gait/planner.py). 1.0 s is the 23-DoF value;
    # heavier-armed variants need a slower recentering maneuver — round-4:
    # g1_29dof_with_hand completes all 8 steps and then topples FORWARD
    # during this blend window (upright at t_end+0.3 s, pitch -0.87 by
    # t_end+1.1 s).
    settle_blend_s: jnp.ndarray
    # Exit-blend stretch for the lateral orbit after the last touchdown
    # [multiples of the DS window; 1 = the round-2 behavior]. The
    # walk-to-stand transfer is the last weight transfer of the gait; at
    # nominal stance width real feet need more than one DS window of time
    # to bring the swaying CoM back to the centerline (see
    # lateral_orbit_reference).
    exit_blend_scale: jnp.ndarray = 1.0
    # Sagittal STOP RAMP [s]: after the last touchdown the commanded-
    # velocity reference decays linearly over this window (and the position
    # ramp advances by its integral) instead of freezing instantly.
    # Round-5 settle diagnosis (tools/diag_settle.py): the instant
    # v_ref 0.1 -> 0 step at t_end makes the cascade over-brake on the
    # heel-short G1 foot — the walk tail ends with the torso pitched ~1.2
    # rad backward, and the recovery overshoots the CoM up into the
    # straight-knee singularity. 0 = disabled (bit-neutral legacy stop).
    stop_ramp_s: jnp.ndarray = 0.0
    # PRE-stop deceleration window [s]: the commanded velocity ramps
    # linearly to ZERO over the last pre_stop_s of the gait, so the final
    # touchdown happens at ~zero commanded speed and the sagittal DCM
    # feedback places the last footholds as capture steps for the slowing
    # gait — momentum is shed WHILE steps remain (stepping absorbs DCM
    # error; stance braking cannot — TODO.md round-3 gate finding). The
    # round-5 settle diagnosis motivates it: stopping from 0.1 m/s in
    # stance over-brakes the heel-short foot (walk tail ends crouched
    # z 0.48 → violent stand-up → straight-knee lock → forward topple).
    # 0 = disabled (bit-neutral).
    pre_stop_s: jnp.ndarray = 0.0


def default_gait(dtype=jnp.float32) -> GaitConfig:
    return GaitConfig(
        swing_duration=jnp.asarray(0.25, dtype),
        double_support_duration=jnp.asarray(0.25, dtype),
        start_time=jnp.asarray(0.5, dtype),
        n_steps=jnp.asarray(8, dtype),
        sway_gain=jnp.asarray(1.0, dtype),
        gate_window=jnp.asarray(0.0, dtype),
        gate_xi_tol=jnp.asarray(0.03, dtype),
        gate_z_tol=jnp.asarray(0.06, dtype),
        gate_vz_tol=jnp.asarray(0.40, dtype),
        swing_xy_rate_max=jnp.asarray(1.8, dtype),
        timing_gain=jnp.asarray(0.0, dtype),
        timing_tol=jnp.asarray(0.05, dtype),
        timing_rate_max=jnp.asarray(2.0, dtype),
        ds_slow_gain=jnp.asarray(0.0, dtype),
        ds_rate_min=jnp.asarray(0.4, dtype),
        landing_lock=jnp.asarray(1.0, dtype),
        lean_gain=jnp.asarray(0.0, dtype),
        settle_blend_s=jnp.asarray(1.0, dtype),
        exit_blend_scale=jnp.asarray(1.0, dtype),
        stop_ramp_s=jnp.asarray(0.0, dtype),
        pre_stop_s=jnp.asarray(0.0, dtype),
    )


def cycle_period(cfg: GaitConfig) -> jnp.ndarray:
    return 2.0 * (cfg.swing_duration + cfg.double_support_duration)


def phase_info(cfg: GaitConfig, t: jnp.ndarray):
    """Decompose time into (step_index, in_swing, swing_is_left, swing_progress).

    Steps alternate: even step index -> left foot swings (right stance) — the
    walking-demo convention. Before start_time and after n_steps, both feet
    stand (double support).
    """
    half = cfg.swing_duration + cfg.double_support_duration  # one step
    tau = t - cfg.start_time
    step_idx = jnp.floor(tau / half)
    in_gait = (tau >= 0.0) & (step_idx < cfg.n_steps)
    t_in_step = tau - step_idx * half
    # Each step: [DS (ds_dur)][swing (swing_dur)]
    in_swing = in_gait & (t_in_step >= cfg.double_support_duration)
    progress = jnp.clip(
        (t_in_step - cfg.double_support_duration) / cfg.swing_duration, 0.0, 1.0
    )
    swing_is_left = jnp.mod(step_idx, 2.0) < 0.5
    return step_idx, in_swing, swing_is_left, progress


def contact_flags(cfg: GaitConfig, t: jnp.ndarray) -> jnp.ndarray:
    """(4,) flags [L-heel, L-toe, R-heel, R-toe] at time t."""
    _, in_swing, swing_is_left, _ = phase_info(cfg, t)
    left_up = in_swing & swing_is_left
    right_up = in_swing & ~swing_is_left
    left = jnp.where(left_up, 0.0, 1.0)
    right = jnp.where(right_up, 0.0, 1.0)
    return jnp.stack([left, left, right, right]).astype(jnp.result_type(t, jnp.float32))


def _lipm_map(omega0, T, p0, pdot):
    """Affine map (F, g) of the lateral LIPM state X = [y, vy] over duration
    T while the ZMP ramps linearly from p0 with slope pdot:

        X(T) = F X(0) + g,   with  ÿ = ω₀²(y − p(t)),  p(t) = p0 + ṗ t.

    Closed form: the particular solution of a linearly-ramping ZMP is
    y_p(t) = p(t), so the homogeneous cosh/sinh modes carry the rest.
    """
    c = jnp.cosh(omega0 * T)
    s = jnp.sinh(omega0 * T)
    F = jnp.stack(
        [jnp.stack([c, s / omega0]), jnp.stack([omega0 * s, c])]
    )
    p1 = p0 + pdot * T
    g = jnp.stack(
        [p1 - c * p0 - (s / omega0) * pdot,
         pdot - omega0 * s * p0 - c * pdot]
    )
    return F, g


def lateral_orbit_state(cfg: GaitConfig, omega0, W):
    """Initial state X0 = [y, vy] (at DS start of an even/right-stance step)
    of the *periodic* lateral LIPM orbit for this gait timing.

    The ZMP profile per step is [DS: ramp previous-stance → stance][SS: hold
    at stance foot ±W]; mirror symmetry over one step (X_end = −X0) pins the
    periodic orbit: X0 = −(I + F)⁻¹ g with (F, g) the step's affine map.
    This is the lateral trajectory walking *physically* follows — e.g. at
    the reference timing (0.25/0.25 s, W = 0.12) the CoM sways only ±4 cm
    and crosses the midline during single support; commanding a full shift
    over the stance foot (a naive weight-transfer reference) fights the
    dynamics and destabilizes the gait.
    """
    ds = cfg.double_support_duration
    ss = cfg.swing_duration
    F1, g1 = _lipm_map(omega0, ds, W, -2.0 * W / jnp.maximum(ds, 1e-6))
    F2, g2 = _lipm_map(omega0, ss, -W, jnp.zeros_like(W))
    F = F2 @ F1
    g = F2 @ g1 + g2
    X0 = -jnp.linalg.solve(jnp.eye(2, dtype=g.dtype) + F, g)
    return X0


def _orbit_eval(cfg: GaitConfig, omega0, W, X0, t_in):
    """Evaluate the even-step orbit at phase time t_in ∈ [0, ds+ss)."""
    ds = cfg.double_support_duration
    t1 = jnp.clip(t_in, 0.0, ds)
    F1, g1 = _lipm_map(omega0, t1, W, -2.0 * W / jnp.maximum(ds, 1e-6))
    X_ds = F1 @ X0 + g1
    t2 = jnp.clip(t_in - ds, 0.0, None)
    Fds, gds = _lipm_map(omega0, ds, W, -2.0 * W / jnp.maximum(ds, 1e-6))
    F2, g2 = _lipm_map(omega0, t2, -W, jnp.zeros_like(W))
    X_ss = F2 @ (Fds @ X0 + gds) + g2
    return jnp.where(t_in < ds, X_ds, X_ss)


def lateral_orbit_reference(
    cfg: GaitConfig,
    t: jnp.ndarray,   # absolute gait times (any shape, vmapped over)
    omega0,
    W,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(y, vy) of the periodic lateral orbit at times t, centerline-relative.

    Odd steps mirror the even-step orbit. The first DS blends in from
    standing (0, 0) and the gait end blends back out over one DS window, so
    the reference is continuous through gait start/stop; n_steps = 0 holds
    the centerline.
    """
    import jax

    half = cfg.swing_duration + cfg.double_support_duration
    ds = cfg.double_support_duration
    X0 = lateral_orbit_state(cfg, omega0, W)

    def one(tk):
        tau = tk - cfg.start_time
        j = jnp.floor(tau / half)
        t_in = tau - j * half
        X = _orbit_eval(cfg, omega0, W, X0, t_in)
        even = jnp.mod(jnp.clip(j, 0.0, None), 2.0) < 0.5
        X = jnp.where(even, X, -X)
        # Entry blend over the first DS.
        s_in = jnp.clip(tau / jnp.maximum(ds, 1e-6), 0.0, 1.0)
        beta = 0.5 * (1.0 - jnp.cos(jnp.pi * s_in))
        X = X * beta
        # Exit blend after the last touchdown: the walk-to-stand weight
        # transfer (last stance side -> centerline). One DS window by
        # default; exit_blend_scale stretches it — the settle analogue of
        # the DS slow-down (round-4 MuJoCo nominal-geometry diagnosis: the
        # unperturbed draw walks all 8 steps and capsizes laterally 0.5 s
        # into the settle — the 0.25 s return-to-center demands lateral
        # force line-contact feet cannot deliver, with no next step left
        # to absorb the shortfall).
        t_end = cfg.n_steps * half
        s_out = jnp.clip(
            (tau - t_end)
            / jnp.maximum(ds * cfg.exit_blend_scale, 1e-6),
            0.0, 1.0,
        )
        X_end_hold = _orbit_eval(cfg, omega0, W, X0, jnp.zeros_like(t_in))
        last_even = jnp.mod(jnp.maximum(cfg.n_steps, 0.0), 2.0) < 0.5
        # State at gait end = DS-start state of the (virtual) next step.
        X_end_hold = jnp.where(last_even, X_end_hold, -X_end_hold)
        X_out = X_end_hold * (1.0 - 0.5 * (1.0 - jnp.cos(jnp.pi * s_out)))
        X = jnp.where(tau >= t_end, X_out, X)
        X = jnp.where((tau < 0.0) | (cfg.n_steps < 0.5), jnp.zeros_like(X), X)
        return X[0], X[1]

    return jax.vmap(one)(jnp.atleast_1d(t))


def touchdown_dcm_nominal(cfg: GaitConfig, omega0, W, swing_is_left):
    """Nominal centerline-relative DCM ξ = y + vy/ω₀ at touchdown of the
    current step (left landing → even-step orbit end = −X0 by mirror)."""
    X0 = lateral_orbit_state(cfg, omega0, W)
    xi0 = X0[0] + X0[1] / omega0
    return jnp.where(swing_is_left, -xi0, xi0)


def swing_onset_dcm_nominal(cfg: GaitConfig, omega0, W, swing_is_left):
    """Nominal centerline-relative DCM at SWING ONSET (end of this step's
    double support) on the periodic orbit — the weight-transfer gate's
    target (engine/tick.py)."""
    X0 = lateral_orbit_state(cfg, omega0, W)
    X = _orbit_eval(cfg, omega0, W, X0, cfg.double_support_duration)
    xi = X[0] + X[1] / omega0
    return jnp.where(swing_is_left, xi, -xi)


def predict_ds_end_dcm(
    cfg: GaitConfig,
    omega0,
    W,
    xi,          # measured centerline-relative DCM y + vy/omega0
    t_in,        # time into the current step (must be within double support)
    swing_is_left,
):
    """Propagate the measured DCM through the REMAINDER of this step's
    double-support ZMP ramp to swing onset (same affine DCM map as
    :func:`predict_touchdown_dcm`, stopped at the DS end).

    The weight-transfer gate compares this against
    :func:`swing_onset_dcm_nominal`: a transfer that is merely *in
    progress* predicts on-target and is never held — gating on the
    instantaneous DCM instead brakes the orbit's natural crossing mid
    double support (measured round 3: the MPC fights the LIPM momentum,
    demands lateral force real feet cannot deliver, and the robot rolls
    over during the hold)."""
    ds = cfg.double_support_duration
    xi_e = jnp.where(swing_is_left, xi, -xi)
    t_rem = jnp.clip(ds - t_in, 0.0, None)
    pdot = -2.0 * W / jnp.maximum(ds, 1e-6)
    p_now = W + pdot * jnp.clip(t_in, 0.0, ds)
    off = pdot / omega0
    p1 = -W
    xi_e = (p1 + off) + (xi_e - p_now - off) * jnp.exp(omega0 * t_rem)
    return jnp.where(swing_is_left, xi_e, -xi_e)


def predict_touchdown_dcm(
    cfg: GaitConfig,
    omega0,
    W,
    xi,          # measured centerline-relative DCM y + vy/ω₀
    t_in,        # time into the current step
    swing_is_left,
):
    """Propagate the measured DCM to the upcoming touchdown through the
    step's nominal ZMP profile (remaining DS ramp, then SS hold).

    The DCM obeys ξ' = ω₀(ξ − p) independently of the CoM, so each phase is
    a scalar affine map: constant p over T gives ξ → p + (ξ−p)e^{ω₀T}; a
    ramp adds the ṗ/ω₀ particular offset.
    """
    ds = cfg.double_support_duration
    ss = cfg.swing_duration
    # Mirror to the even-step frame (stance = right foot at −W).
    xi_e = jnp.where(swing_is_left, xi, -xi)
    t_ds_rem = jnp.clip(ds - t_in, 0.0, None)
    pdot = -2.0 * W / jnp.maximum(ds, 1e-6)
    p_now = W + pdot * jnp.clip(t_in, 0.0, ds)
    # DS remainder (ramp): xi → (p1 + pdot/ω) + (xi − p_now − pdot/ω) e^{ωT}.
    off = pdot / omega0
    p1 = -W
    xi_e = jnp.where(
        t_in < ds,
        (p1 + off) + (xi_e - p_now - off) * jnp.exp(omega0 * t_ds_rem),
        xi_e,
    )
    # SS remainder (hold at −W).
    t_ss_rem = jnp.where(t_in < ds, ss, jnp.clip(ds + ss - t_in, 0.0, None))
    xi_e = -W + (xi_e + W) * jnp.exp(omega0 * t_ss_rem)
    return jnp.where(swing_is_left, xi_e, -xi_e)


def _sagittal_zmp(omega0, v, T, c0, ds):
    """Per-phase (p0, pdot) of the *ramp-relative* sagittal ZMP profile.

    In coordinates relative to the commanded ramp x_line(t) = v t, every step
    is identical (shift-periodicity is exact): the stance foot lands ahead of
    the ramp by c0 and drifts back at -v during its stance; double support
    ramps the ZMP from the old foot (now at c0 - vT) to the new one.
    """
    p0_ds = c0 - v * T
    pdot_ds = -v + v * T / jnp.maximum(ds, 1e-6)
    p0_ss = c0 - v * ds
    pdot_ss = -v + 0.0 * c0
    return (p0_ds, pdot_ds), (p0_ss, pdot_ss)


def sagittal_orbit_state(cfg: GaitConfig, omega0, v):
    """Initial ramp-relative state X0 = [x_rel, vx_rel] (at DS start) of the
    shift-periodic sagittal LIPM orbit for forward speed v.

    The stance foot lands c0 = vT/2 ahead of the ramp (symmetric stance:
    the foot's relative offset runs from +vT/2 to -vT/2 over its step).
    Periodicity in relative coordinates is plain: X0 = (I - F)^{-1} g.
    """
    ds = cfg.double_support_duration
    ss = cfg.swing_duration
    T = ds + ss
    c0 = 0.5 * v * T
    (p0_ds, pdot_ds), (p0_ss, pdot_ss) = _sagittal_zmp(omega0, v, T, c0, ds)
    F1, g1 = _lipm_map(omega0, ds, p0_ds, pdot_ds)
    F2, g2 = _lipm_map(omega0, ss, p0_ss, pdot_ss)
    F = F2 @ F1
    g = F2 @ g1 + g2
    X0 = jnp.linalg.solve(jnp.eye(2, dtype=g.dtype) - F, g)
    return X0


def _sagittal_orbit_eval(cfg: GaitConfig, omega0, v, X0, t_in):
    """Evaluate the sagittal orbit at phase time t_in in [0, ds+ss)."""
    ds = cfg.double_support_duration
    ss = cfg.swing_duration
    T = ds + ss
    c0 = 0.5 * v * T
    (p0_ds, pdot_ds), (p0_ss, pdot_ss) = _sagittal_zmp(omega0, v, T, c0, ds)
    t1 = jnp.clip(t_in, 0.0, ds)
    F1, g1 = _lipm_map(omega0, t1, p0_ds, pdot_ds)
    X_ds = F1 @ X0 + g1
    Fds, gds = _lipm_map(omega0, ds, p0_ds, pdot_ds)
    t2 = jnp.clip(t_in - ds, 0.0, None)
    F2, g2 = _lipm_map(omega0, t2, p0_ss, pdot_ss)
    X_ss = F2 @ (Fds @ X0 + gds) + g2
    return jnp.where(t_in < ds, X_ds, X_ss)


def sagittal_orbit_reference(
    cfg: GaitConfig,
    t: jnp.ndarray,  # absolute gait times (any shape, vmapped over)
    omega0,
    v,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x_rel, vx_rel) of the shift-periodic sagittal orbit at times t,
    relative to the commanded ramp. Every step is identical (no mirroring);
    entry/exit blend over one DS window like the lateral reference."""
    import jax

    half = cfg.swing_duration + cfg.double_support_duration
    ds = cfg.double_support_duration
    X0 = sagittal_orbit_state(cfg, omega0, v)

    def one(tk):
        tau = tk - cfg.start_time
        j = jnp.floor(tau / half)
        t_in = tau - j * half
        X = _sagittal_orbit_eval(cfg, omega0, v, X0, t_in)
        # Entry blend over the first DS (from standing at the ramp origin).
        s_in = jnp.clip(tau / jnp.maximum(ds, 1e-6), 0.0, 1.0)
        beta = 0.5 * (1.0 - jnp.cos(jnp.pi * s_in))
        X = X * beta
        # Exit blend back to the (frozen) ramp after the last touchdown.
        t_end = cfg.n_steps * half
        s_out = jnp.clip((tau - t_end) / jnp.maximum(ds, 1e-6), 0.0, 1.0)
        X_out = X0 * (1.0 - 0.5 * (1.0 - jnp.cos(jnp.pi * s_out)))
        X = jnp.where(tau >= t_end, X_out, X)
        X = jnp.where((tau < 0.0) | (cfg.n_steps < 0.5), jnp.zeros_like(X), X)
        return X[0], X[1]

    return jax.vmap(one)(jnp.atleast_1d(t))


def touchdown_dcm_nominal_x(cfg: GaitConfig, omega0, v):
    """Nominal ramp-relative sagittal DCM xi = x_rel + vx_rel/omega0 at
    touchdown (= DS start of the next step, periodic: equals X0's DCM)."""
    X0 = sagittal_orbit_state(cfg, omega0, v)
    return X0[0] + X0[1] / omega0


def predict_touchdown_dcm_x(
    cfg: GaitConfig,
    omega0,
    v,
    xi,     # measured ramp-relative sagittal DCM
    t_in,   # time into the current step
):
    """Propagate the measured sagittal DCM to the upcoming touchdown through
    the step's nominal ramp-relative ZMP profile (same scalar affine maps as
    the lateral :func:`predict_touchdown_dcm`, different profile)."""
    ds = cfg.double_support_duration
    ss = cfg.swing_duration
    T = ds + ss
    c0 = 0.5 * v * T
    (p0_ds, pdot_ds), (p0_ss, pdot_ss) = _sagittal_zmp(omega0, v, T, c0, ds)
    t_ds_rem = jnp.clip(ds - t_in, 0.0, None)
    p_now = p0_ds + pdot_ds * jnp.clip(t_in, 0.0, ds)
    off = pdot_ds / omega0
    p1 = p0_ds + pdot_ds * ds
    xi = jnp.where(
        t_in < ds,
        (p1 + off) + (xi - p_now - off) * jnp.exp(omega0 * t_ds_rem),
        xi,
    )
    # SS remainder (ramp at slope -v from p0_ss).
    t_ss_rem = jnp.where(t_in < ds, ss, jnp.clip(ds + ss - t_in, 0.0, None))
    p_now_ss = p0_ss + pdot_ss * jnp.clip(jnp.maximum(t_in, ds) - ds, 0.0, ss)
    off_ss = pdot_ss / omega0
    p1_ss = p0_ss + pdot_ss * ss
    xi = (p1_ss + off_ss) + (xi - p_now_ss - off_ss) * jnp.exp(omega0 * t_ss_rem)
    return xi


def timing_clock_rate(
    cfg: GaitConfig,
    omega0,
    W,
    xi_rel,        # measured centerline-relative lateral DCM
    t_in_step,     # time into the current step
    swing_is_left,
):
    """Step-TIMING adaptation: gait-clock rate multiplier during the swing.

    Khadiv et al.-style "step earlier": propagate the measured DCM to the
    nominal touchdown; once its deviation from the periodic orbit exceeds
    ``timing_tol``, speed the clock up proportionally (capped at
    ``timing_rate_max``). Early touchdown caps the LIPM's e^{omega0 t} error
    growth before it exceeds what foot placement (clip_landing_y-bounded)
    can absorb — placement and timing are the two complementary
    capturability levers. ``timing_gain = 0`` disables (rate 1)."""
    xi_pred = predict_touchdown_dcm(cfg, omega0, W, xi_rel, t_in_step, swing_is_left)
    xi_nom = touchdown_dcm_nominal(cfg, omega0, W, swing_is_left)
    err = jnp.abs(xi_pred - xi_nom)
    return jnp.clip(
        1.0 + cfg.timing_gain * jnp.maximum(err - cfg.timing_tol, 0.0),
        1.0,
        jnp.maximum(cfg.timing_rate_max, 1.0),
    )


def contact_horizon(
    cfg: GaitConfig, t: jnp.ndarray, horizon: int, dt_mpc: float
) -> jnp.ndarray:
    """(N, 4) contact flags over the MPC horizon starting at t."""
    ts = t + dt_mpc * jnp.arange(horizon, dtype=jnp.result_type(t, jnp.float32))
    import jax

    return jax.vmap(lambda tk: contact_flags(cfg, tk))(ts)
