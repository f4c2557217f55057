"""SRBD-level closed-loop walking (mpc/srbd_loop.py): the planner + MPC in
the loop with the single-rigid-body dynamics they model. This pins the
*planning layer* of the walking cascade — a failure here is a gait/MPC bug,
independent of WBID/plant tracking (the split the reference cannot make:
its only closed loop is the full MuJoCo cascade, ros_run_simulation.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.mpc import srbd_loop as sl


def _walk(n_steps, v_cmd, n_periods, kicks=None, dcm_scale=1.0):
    cfg = eng.walking_config().mpc
    params = eng.walking_scenario(jnp.float64, n_steps=n_steps, v_cmd=v_cmd)
    params = params._replace(
        steps=params.steps._replace(dcm_scale=jnp.asarray(dcm_scale, jnp.float64))
    )
    rollout = sl.make_srbd_loop(cfg)
    state0 = sl.init_loop_state(cfg, 0.598, jnp.float64)
    final, logs = jax.jit(
        lambda s, p: rollout(s, p, n_periods, kicks)
    )(state0, params)
    return params, final, logs


@pytest.mark.slow
def test_srbd_walk_8_steps_and_settle():
    """8 steps at 0.1 m/s: bounded lateral excursion, forward progress,
    quiet settle (VERDICT round-1 item 1, planning half)."""
    params, final, logs = _walk(8.0, (0.1, 0.0), 200)
    x = np.asarray(logs.x)
    assert np.isfinite(x).all()
    # Height held throughout (the SRBD never "falls"): bounded vertical
    # oscillation during stepping transients (the roll-honest walking weights
    # trade ~5 cm of transient sag at gait entry for realizable lateral
    # plans), exact recovery at settle.
    np.testing.assert_allclose(x[:, 5], 0.598, atol=0.055)
    np.testing.assert_allclose(x[-20:, 5], 0.598, atol=2e-3)
    # Lateral excursion bounded. With the roll-honest walking weights the
    # MPC stabilizes laterally by STEPPING (not by roll-channel GRFs), so
    # the walking line wanders more than the old force-cheating plan did —
    # bounded, settling, but wider (measured 0.20 at 8 steps).
    assert np.abs(x[:, 4]).max() < 0.25, np.abs(x[:, 4]).max()
    # Forward progress: roughly v * walk time (8 steps x 0.5 s).
    assert 0.25 < x[-1, 3] < 0.65, x[-1, 3]
    # Settled: final planar velocity ~ 0.
    assert np.abs(x[-1, 9:11]).max() < 0.05
    # All 8 touchdowns happened (4 per foot).
    c = np.asarray(logs.contact)
    td = np.clip(np.diff((c > 0.5).astype(int), axis=0), 0, 1).sum(axis=0)
    assert td[0] >= 4 and td[1] >= 4, td


@pytest.mark.slow
def test_srbd_walk_velocity_tracking():
    """Commanded-velocity tracking (BASELINE config 1): realized mid-walk
    forward speed within 30% of command at 0.1 and 0.2 m/s."""
    for v in (0.1, 0.2):
        params, final, logs = _walk(8.0, (v, 0.0), 200)
        x = np.asarray(logs.x)
        # Mid-walk window: steps 2..7 (skip start/stop transients).
        t0, t1 = int(1.5 / 0.04), int(4.0 / 0.04)
        v_real = (x[t1, 3] - x[t0, 3]) / ((t1 - t0) * 0.04)
        assert abs(v_real - v) < 0.3 * v + 0.02, (v, v_real)


@pytest.mark.slow
def test_srbd_walk_kick_recovery():
    """A 0.15 m/s lateral velocity kick mid-walk is absorbed by stepping."""
    n_periods = 200
    kicks = jnp.zeros((n_periods, 3), jnp.float64).at[60, 1].set(0.15)
    params, final, logs = _walk(8.0, (0.1, 0.0), n_periods, kicks=kicks)
    x = np.asarray(logs.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[:, 5], 0.598, atol=0.055)
    assert np.abs(x[-1, 9:11]).max() < 0.05  # settles after the kick
    # The kick is absorbed by stepping: the gait line displaces (~0.17 m,
    # feet-relative anchoring keeps no absolute-y memory — the behavior of a
    # real stepping recovery) and the walk continues, settling quietly.
    assert np.abs(x[-1, 4]) < 0.3
