import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.gait import footsteps, schedule, swing


def test_swing_z_boundary_conditions():
    p = swing.SwingParams(
        p_start=jnp.array([0.0, 0.1, 0.01]),
        p_end=jnp.array([0.2, 0.1, 0.0]),
        z_apex=jnp.asarray(0.05),
    )
    T = 0.25
    pos0, vel0, acc0 = swing.evaluate(p, jnp.asarray(0.0), T)
    pos1, vel1, acc1 = swing.evaluate(p, jnp.asarray(1.0), T)
    posm, _, _ = swing.evaluate(p, jnp.asarray(0.5), T)
    np.testing.assert_allclose(np.asarray(pos0), [0.0, 0.1, 0.01], atol=1e-12)
    np.testing.assert_allclose(np.asarray(pos1), [0.2, 0.1, 0.0], atol=1e-12)
    np.testing.assert_allclose(float(posm[2]), 0.05, atol=1e-12)  # apex
    np.testing.assert_allclose(float(vel0[2]), 0.0, atol=1e-12)
    # Terminal z-velocity: -0.02 m/s per unit cycle, scaled by duration
    # (swing_trajectory.py:50).
    np.testing.assert_allclose(float(vel1[2]), -0.02 / T, atol=1e-9)
    np.testing.assert_allclose(float(acc0[2]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(acc1[2]), 0.0, atol=1e-9)


def test_swing_xy_phase_80_20():
    """80% of xy distance covered at half cycle (swing_trajectory.py:58)."""
    p = swing.SwingParams(
        p_start=jnp.array([0.0, 0.0, 0.0]),
        p_end=jnp.array([1.0, 0.0, 0.0]),
        z_apex=jnp.asarray(0.05),
    )
    pos, _, _ = swing.evaluate(p, jnp.asarray(0.5), 0.25)
    np.testing.assert_allclose(float(pos[0]), 0.8, atol=1e-12)
    # Linear in second half.
    pos75, _, _ = swing.evaluate(p, jnp.asarray(0.75), 0.25)
    np.testing.assert_allclose(float(pos75[0]), 0.9, atol=1e-12)


def test_swing_matches_reference_formula():
    """Cross-check z(t) against the reference's explicit 7x7 solve."""
    z0, zm, z1 = 0.013, 0.05, 0.002
    A = np.array(
        [
            [1, 0, 0, 0, 0, 0, 0],
            [0, 1, 0, 0, 0, 0, 0],
            [0, 0, 2, 0, 0, 0, 0],
            [1, 0.5, 0.5**2, 0.5**3, 0.5**4, 0.5**5, 0.5**6],
            [1, 1, 1, 1, 1, 1, 1],
            [0, 1, 2, 3, 4, 5, 6],
            [0, 0, 2, 6, 12, 20, 30],
        ]
    )
    b = np.array([z0, 0.0, 0.0, zm, z1, -0.02, 0.0])
    coeff_ref = np.linalg.solve(A, b)
    p = swing.SwingParams(
        p_start=jnp.array([0.0, 0.0, z0]),
        p_end=jnp.array([0.1, 0.0, z1]),
        z_apex=jnp.asarray(zm),
    )
    for t in [0.0, 0.2, 0.37, 0.5, 0.81, 1.0]:
        pos, _, _ = swing.evaluate(p, jnp.asarray(t), 0.25)
        z_ref = np.polyval(coeff_ref[::-1], t)
        np.testing.assert_allclose(float(pos[2]), z_ref, atol=1e-12)


def test_schedule_alternates_and_stands():
    cfg = schedule.default_gait(jnp.float64)
    # Before gait start: double support.
    np.testing.assert_allclose(
        np.asarray(schedule.contact_flags(cfg, jnp.asarray(0.1))), [1, 1, 1, 1]
    )
    # First step (after start + DS): left swings.
    t_swing0 = 0.5 + 0.25 + 0.1
    np.testing.assert_allclose(
        np.asarray(schedule.contact_flags(cfg, jnp.asarray(t_swing0))), [0, 0, 1, 1]
    )
    # Second step: right swings.
    t_swing1 = t_swing0 + 0.5
    np.testing.assert_allclose(
        np.asarray(schedule.contact_flags(cfg, jnp.asarray(t_swing1))), [1, 1, 0, 0]
    )
    # After n_steps: stand.
    t_end = 0.5 + 8 * 0.5 + 0.1
    np.testing.assert_allclose(
        np.asarray(schedule.contact_flags(cfg, jnp.asarray(t_end))), [1, 1, 1, 1]
    )


def test_contact_horizon_shape_and_consistency():
    cfg = schedule.default_gait(jnp.float64)
    hor = schedule.contact_horizon(cfg, jnp.asarray(0.8), 10, 0.04)
    assert hor.shape == (10, 4)
    for k in range(10):
        np.testing.assert_allclose(
            np.asarray(hor[k]),
            np.asarray(schedule.contact_flags(cfg, jnp.asarray(0.8 + 0.04 * k))),
        )


def test_fixed_plan_leapfrog():
    cfg = footsteps.default_footsteps(jnp.float64)
    x0 = jnp.array([0.0, 0.12])
    # Step 0: left swings to 1*step_length; step 1: right to 1*; step 2: left to 2*.
    p0 = footsteps.fixed_plan(cfg, jnp.asarray(0.0), jnp.asarray(True), x0)
    p1 = footsteps.fixed_plan(cfg, jnp.asarray(1.0), jnp.asarray(False), x0)
    p2 = footsteps.fixed_plan(cfg, jnp.asarray(2.0), jnp.asarray(True), x0)
    np.testing.assert_allclose(np.asarray(p0), [0.10, 0.12, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), [0.10, -0.12, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2), [0.20, 0.12, 0.0], atol=1e-12)


def test_raibert_tracks_velocity():
    cfg = footsteps.default_footsteps(jnp.float64)
    com = jnp.array([0.0, 0.0, 0.6])
    vel = jnp.array([0.5, 0.0, 0.0])
    p = footsteps.raibert(
        cfg, com, vel, jnp.array([0.5, 0.0]), jnp.asarray(True), jnp.asarray(0.5)
    )
    # At commanded velocity: p = com + v*T/2 (+ lateral width).
    np.testing.assert_allclose(np.asarray(p), [0.125, 0.12, 0.0], atol=1e-12)


def test_gait_vmap_over_timings():
    """Gait timing is a pytree — sweepable via vmap (scenario randomization)."""
    B = 16
    base = schedule.default_gait()
    cfgs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,)), base
    )._replace(swing_duration=jnp.linspace(0.2, 0.35, B))
    flags = jax.vmap(lambda c: schedule.contact_flags(c, jnp.asarray(1.0)))(cfgs)
    assert flags.shape == (B, 4)


def test_lateral_orbit_periodicity():
    """The periodic orbit satisfies the mirror condition X(step) = -X(0) and
    the closed-form phase maps agree with numerical integration."""
    cfg = schedule.default_gait(jnp.float64)
    w0 = np.sqrt(9.80665 / 0.598)
    W = 0.12
    X0 = np.asarray(schedule.lateral_orbit_state(cfg, w0, jnp.asarray(W)))
    # integrate y'' = w0^2 (y - p(t)) over one step with the nominal ZMP
    ds = float(cfg.double_support_duration)
    ss = float(cfg.swing_duration)
    dt = 1e-5
    y, vy = X0
    t = 0.0
    while t < ds + ss - dt / 2:
        p = W - 2 * W * min(t, ds) / ds if t < ds else -W
        a = w0**2 * (y - p)
        vy += a * dt
        y += vy * dt
        t += dt
    np.testing.assert_allclose([y, vy], -X0, atol=1e-3)


def test_lateral_orbit_reference_continuity():
    """The horizon reference is continuous through entry, steps, and exit."""
    cfg = schedule.default_gait(jnp.float64)._replace(
        n_steps=jnp.asarray(4.0, jnp.float64)
    )
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    t = jnp.asarray(np.arange(0.0, 4.5, 0.002), jnp.float64)
    y, vy = schedule.lateral_orbit_reference(cfg, t, w0, jnp.asarray(0.12))
    y = np.asarray(y)
    # max jump between samples bounded by |vy|_max * dt plus slack
    assert np.abs(np.diff(y)).max() < 0.3 * 0.002 + 1e-4, np.abs(np.diff(y)).max()
    # symmetric around the centerline, small amplitude (the physical orbit)
    assert np.abs(y).max() < 0.06
    # standing before/after
    np.testing.assert_allclose(y[:200], 0.0, atol=1e-12)


def test_predict_touchdown_dcm_on_orbit():
    """Propagating the orbit's DS-start DCM through the step reproduces the
    nominal touchdown DCM (the placement correction vanishes on the orbit)."""
    cfg = schedule.default_gait(jnp.float64)
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    W = jnp.asarray(0.12, jnp.float64)
    X0 = schedule.lateral_orbit_state(cfg, w0, W)
    xi0 = X0[0] + X0[1] / w0
    for swing_left in (True, False):
        sl = jnp.asarray(swing_left)
        xi_meas = jnp.where(sl, xi0, -xi0)  # orbit state, mirrored per parity
        pred = schedule.predict_touchdown_dcm(
            cfg, w0, W, xi_meas, jnp.asarray(0.0, jnp.float64), sl
        )
        nom = schedule.touchdown_dcm_nominal(cfg, w0, W, sl)
        np.testing.assert_allclose(float(pred), float(nom), atol=1e-10)


def test_sagittal_orbit_periodicity():
    """The shift-periodic sagittal orbit satisfies X(step) = X(0) in
    ramp-relative coordinates (verified against numerical integration)."""
    cfg = schedule.default_gait(jnp.float64)
    w0 = np.sqrt(9.80665 / 0.598)
    v = 0.1
    X0 = np.asarray(schedule.sagittal_orbit_state(cfg, w0, jnp.asarray(v)))
    ds = float(cfg.double_support_duration)
    ss = float(cfg.swing_duration)
    T = ds + ss
    c0 = 0.5 * v * T
    dt = 1e-5
    x, vx = X0
    t = 0.0
    while t < T - dt / 2:
        if t < ds:
            p = (c0 - v * T) + (-v + v * T / ds) * t
        else:
            p = (c0 - v * ds) - v * (t - ds)
        a = w0**2 * (x - p)
        vx += a * dt
        x += vx * dt
        t += dt
    np.testing.assert_allclose([x, vx], X0, atol=1e-3)


def test_predict_touchdown_dcm_x_on_orbit():
    """On the sagittal orbit the placement correction vanishes — from any
    phase within the step, the predicted touchdown DCM equals the nominal."""
    cfg = schedule.default_gait(jnp.float64)
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    v = jnp.asarray(0.1, jnp.float64)
    X0 = schedule.sagittal_orbit_state(cfg, w0, v)
    nom = schedule.touchdown_dcm_nominal_x(cfg, w0, v)
    for t_in in (0.0, 0.15, 0.3, 0.45):
        Xm = schedule._sagittal_orbit_eval(
            cfg, w0, v, X0, jnp.asarray(t_in, jnp.float64)
        )
        xim = Xm[0] + Xm[1] / w0
        pred = schedule.predict_touchdown_dcm_x(
            cfg, w0, v, xim, jnp.asarray(t_in, jnp.float64)
        )
        np.testing.assert_allclose(float(pred), float(nom), atol=1e-8)


def test_sagittal_orbit_reference_continuity():
    """The sagittal horizon reference is continuous through entry/exit and
    degenerates to zero at v = 0 (stepping in place)."""
    cfg = schedule.default_gait(jnp.float64)._replace(
        n_steps=jnp.asarray(4.0, jnp.float64)
    )
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    t = jnp.asarray(np.arange(0.0, 4.5, 0.002), jnp.float64)
    xo, vxo = schedule.sagittal_orbit_reference(cfg, t, w0, jnp.asarray(0.1))
    xo = np.asarray(xo)
    assert np.abs(np.diff(xo)).max() < 0.5 * 0.002 + 2e-4
    np.testing.assert_allclose(xo[:200], 0.0, atol=1e-12)  # standing before
    xo0, _ = schedule.sagittal_orbit_reference(cfg, t, w0, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(xo0), 0.0, atol=1e-12)


def test_timing_clock_rate_on_orbit_is_unity():
    """On the periodic orbit (or with timing_gain = 0) the step-timing
    adaptation leaves the clock untouched."""
    cfg = schedule.default_gait(jnp.float64)._replace(
        timing_gain=jnp.asarray(8.0, jnp.float64),
        timing_tol=jnp.asarray(0.04, jnp.float64),
    )
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    W = jnp.asarray(0.12, jnp.float64)
    for swing_left in (True, False):
        sl = jnp.asarray(swing_left)
        for t_in in (0.26, 0.35, 0.45):
            # A DCM exactly on the orbit predicts the nominal touchdown DCM.
            X0 = schedule.lateral_orbit_state(cfg, w0, W)
            # Evaluate the orbit's own DCM at t_in (even-step frame).
            X = schedule._orbit_eval(cfg, w0, W, X0, jnp.asarray(t_in))
            xi = X[0] + X[1] / w0
            # The even-step orbit IS the left-swing step (phase_info: even
            # step -> left foot swings); mirror for the right-swing step.
            xi = jnp.where(sl, xi, -xi)
            rate = schedule.timing_clock_rate(
                cfg, w0, W, xi, jnp.asarray(t_in, jnp.float64), sl
            )
            np.testing.assert_allclose(float(rate), 1.0, atol=1e-6)


def test_timing_clock_rate_speeds_up_and_caps():
    """A DCM error beyond the deadband speeds the clock, monotonically in
    the error, capped at timing_rate_max; gain 0 disables."""
    cfg = schedule.default_gait(jnp.float64)._replace(
        timing_gain=jnp.asarray(8.0, jnp.float64),
        timing_tol=jnp.asarray(0.03, jnp.float64),
        timing_rate_max=jnp.asarray(1.7, jnp.float64),
    )
    w0 = jnp.asarray(np.sqrt(9.80665 / 0.598), jnp.float64)
    W = jnp.asarray(0.12, jnp.float64)
    sl = jnp.asarray(True)
    t_in = jnp.asarray(0.30, jnp.float64)
    X0 = schedule.lateral_orbit_state(cfg, w0, W)
    X = schedule._orbit_eval(cfg, w0, W, X0, t_in)
    xi_orbit = X[0] + X[1] / w0  # even step = left-swing frame
    rates = [
        float(schedule.timing_clock_rate(cfg, w0, W, xi_orbit + d, t_in, sl))
        for d in (0.0, 0.02, 0.05, 0.30)
    ]
    assert rates[0] == pytest.approx(1.0, abs=1e-6)
    assert rates[1] > 1.0  # small error already predicts past the deadband
    assert rates[2] > rates[1]
    assert rates[3] == pytest.approx(1.7, abs=1e-9)  # capped
    cfg0 = cfg._replace(timing_gain=jnp.asarray(0.0, jnp.float64))
    assert float(
        schedule.timing_clock_rate(cfg0, w0, W, xi_orbit + 0.3, t_in, sl)
    ) == pytest.approx(1.0, abs=1e-12)


def test_landing_lock_freezes_committed_foothold():
    """Past the landing-lock swing fraction, plan_horizon must keep the
    previously committed foothold verbatim (landing AND the swing-contact
    horizon rows), so the rate-limited swing foot converges to the foothold
    the plan assumes (GaitConfig.landing_lock; engine/tick.py wires the flag
    from phase_info progress)."""
    from g1_locomotion_tpu.gait import planner

    f64 = jnp.float64
    cfg = schedule.default_gait(f64)
    steps = footsteps.default_footsteps(f64)
    x0 = (
        jnp.zeros(13, f64)
        .at[5].set(0.598)      # com z
        .at[9].set(0.1)        # vx
        .at[10].set(0.05)      # vy (off-orbit: capture point moves the landing)
        .at[12].set(-9.80665)
    )
    cpos = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], f64
    )
    # Mid-swing clock time past a 0.65 lock fraction (step 0 = left swing).
    t = float(cfg.start_time) + float(cfg.double_support_duration) \
        + 0.8 * float(cfg.swing_duration)
    _, in_swing, _, prog = schedule.phase_info(cfg, jnp.asarray(t, f64))
    assert bool(in_swing) and float(prog) > 0.65

    args = (cfg, steps, jnp.array([0.1, 0.0], f64), x0, cpos,
            jnp.asarray(t, f64), 10, 0.04, 0.598)
    free = planner.plan_horizon(*args)
    prev = jnp.array([0.42, 0.33, 0.0], f64)
    locked = planner.plan_horizon(*args, prev_landing=prev, lock_flag=1.0)
    unlocked = planner.plan_horizon(*args, prev_landing=prev, lock_flag=0.0)

    np.testing.assert_allclose(np.asarray(locked.landing), np.asarray(prev))
    np.testing.assert_allclose(
        np.asarray(unlocked.landing), np.asarray(free.landing)
    )
    assert abs(float(free.landing[0]) - 0.42) > 1e-3  # lock actually binds
    # The horizon contact rows follow the locked foothold: wherever the
    # landing mask marks a swing-side contact, its xy must sit at the locked
    # point plus the same (heel/toe) offset the free plan applies.
    mask = np.asarray(locked.landing_mask) > 0.5
    assert mask.any()
    delta = np.asarray(locked.c_hor) - np.asarray(free.c_hor)
    expect = np.asarray(prev - free.landing)
    np.testing.assert_allclose(
        delta[mask], np.broadcast_to(expect, delta[mask].shape), atol=1e-12
    )
    np.testing.assert_allclose(delta[~mask], 0.0, atol=1e-12)


def test_final_widen_terminal_landings():
    """steps.final_widen widens exactly the last TWO landings of the gait
    (outboard on the swing side) and is bit-neutral at 0 — the terminal
    stance widening that hands the settle a wide support base."""
    from g1_locomotion_tpu.gait import planner

    f64 = jnp.float64
    cfg = schedule.default_gait(f64)  # n_steps=8
    x0 = (
        jnp.zeros(13, f64)
        .at[5].set(0.598)
        .at[9].set(0.1)
        .at[12].set(-9.80665)
    )
    cpos = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], f64
    )
    half = float(cfg.swing_duration) + float(cfg.double_support_duration)

    def landing_at(step, widen):
        steps = footsteps.default_footsteps(f64)._replace(
            final_widen=jnp.asarray(widen, f64)
        )
        t = float(cfg.start_time) + (step + 0.7) * half  # mid-swing
        plan = planner.plan_horizon(
            cfg, steps, jnp.array([0.1, 0.0], f64), x0, cpos,
            jnp.asarray(t, f64), 10, 0.04, 0.598,
        )
        return np.asarray(plan.landing)

    for step in (0, 3, 5):  # early/mid steps: untouched
        np.testing.assert_array_equal(
            landing_at(step, 0.04), landing_at(step, 0.0)
        )
    for step in (6, 7):  # last two: exactly final_widen further outboard
        base, wide = landing_at(step, 0.0), landing_at(step, 0.04)
        swing_is_left = step % 2 == 0
        d = wide[1] - base[1]
        np.testing.assert_allclose(d, 0.04 if swing_is_left else -0.04,
                                   atol=1e-12)
        np.testing.assert_array_equal(wide[0], base[0])
