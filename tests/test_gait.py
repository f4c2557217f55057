import jax
import jax.numpy as jnp
import numpy as np

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
    cfgs = schedule.GaitConfig(
        swing_duration=jnp.linspace(0.2, 0.35, B),
        double_support_duration=jnp.full(B, 0.25),
        start_time=jnp.full(B, 0.5),
        n_steps=jnp.full(B, 8.0),
    )
    flags = jax.vmap(lambda c: schedule.contact_flags(c, jnp.asarray(1.0)))(cfgs)
    assert flags.shape == (B, 4)
