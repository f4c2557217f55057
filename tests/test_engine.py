import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.gait import schedule as gs


@pytest.fixture(scope="module")
def standing_engine(g1):
    cfg = eng.EngineConfig()
    params = eng.default_scenario(jnp.float64)
    # Stand: no steps.
    params = params._replace(
        gait=params.gait._replace(n_steps=jnp.asarray(0.0, jnp.float64))
    )
    rollout = eng.make_rollout(g1, cfg)
    return cfg, params, rollout


def test_standing_rollout_stable(g1, standing_engine):
    """Closed-loop MPC+WBID standing for 0.4 s: CoM stays, torques bounded,
    contacts loaded — BASELINE config 2's core behavior."""
    cfg, params, rollout = standing_engine
    state = eng.init_state(g1, cfg, jnp.float64)
    com0 = None

    run = jax.jit(lambda s: rollout(s, params, 25))
    final, logs = run(state)

    com = np.asarray(logs.com).reshape(-1, 3)  # (25*40, 3)
    tau = np.asarray(logs.tau).reshape(-1, g1.nj)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)

    # No NaNs anywhere.
    assert np.isfinite(com).all()
    assert np.isfinite(tau).all()
    # The engine drives the CoM from the FK-standing height (0.628) toward the
    # MPC height target (cfg.com_height=0.598) and re-centers it over the
    # support centroid (the CoP-range midpoint — max sagittal margin; the
    # natural q_init CoM starts ~18 mm behind it, gait/planner.py).
    from g1_locomotion_tpu.models import robot as rb
    from g1_locomotion_tpu.wbid.stack import StackIndices

    idx = StackIndices.from_model(g1)
    X = rb.fk(g1, final.q)
    cpos = np.stack(
        [np.asarray(rb.frame_pose(g1, X, f).p) for f in idx.contacts]
    )
    x_anchor = cpos[:, 0].mean()
    assert abs(com[-1, 2] - cfg.com_height) < 8e-3, com[-1]
    # Re-centering is slow (~0.04 m/s approach): at 1.0 s the CoM is within
    # 8 mm of the anchor.
    assert abs(com[-1, 0] - x_anchor) < 8e-3, (com[-1, 0], x_anchor)
    assert abs(com[-1, 1] - com[0, 1]) < 5e-3
    # Base stays upright.
    from g1_locomotion_tpu.core import rotations as rot

    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    assert np.abs(rpy[:2]).max() < 0.1, rpy
    # Torques within limits.
    assert (np.abs(tau) <= np.asarray(g1.tau_max)[None, :] + 1e-6).all()
    # Total vertical force ~ mg through the rollout (after 1st MPC period).
    fz = forces[40:, :, 2].sum(axis=1)
    np.testing.assert_allclose(fz.mean(), 34.1329 * 9.80665, rtol=0.1)


def test_push_recovery(g1):
    """BASELINE config 2: N=20 MPC recovers a (0.2, 0.12) m/s push without
    stepping — CoM returns to target with near-zero residual velocity."""
    from g1_locomotion_tpu.mpc import solver as mpc

    cfg = eng.EngineConfig(mpc=mpc.MPCConfig(horizon=20))
    params = eng.default_scenario(jnp.float64)
    params = params._replace(
        gait=params.gait._replace(n_steps=jnp.asarray(0.0, jnp.float64))
    )
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    state = state._replace(v=state.v.at[0].set(0.2).at[1].set(0.12))
    final, logs = jax.jit(lambda s: rollout(s, params, 63))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    assert np.isfinite(com).all()
    np.testing.assert_allclose(com[-1, 2], cfg.com_height, atol=0.01)
    assert abs(com[-1, 1]) < 0.02
    assert float(jnp.linalg.norm(final.v[:6])) < 0.1


def test_gait_gate_compiled_out(g1):
    """The xi-gate / DS-slow-down block is compiled OUT of the production
    tick (EngineConfig.gait_gate=False, the default) and IN when requested
    (mujoco_nominal_config): the lowered production program is strictly
    smaller, and under the flag the DS-tail clock actually slows."""
    from functools import partial

    from g1_locomotion_tpu.wbid.stack import StackIndices

    f64 = jnp.float64
    idx = StackIndices.from_model(g1)
    params = eng.mujoco_nominal_scenario(f64)
    # Force a maximal slow-down regardless of the initial state's DCM sign:
    # a hugely negative tolerance makes gate_err - tol large for any state.
    params = params._replace(
        gait=params.gait._replace(
            gate_xi_tol=jnp.asarray(-10.0, f64),
            ds_slow_gain=jnp.asarray(100.0, f64),
            ds_rate_min=jnp.asarray(0.25, f64),
        )
    )
    texts, advance = {}, {}
    for gate in (False, True):
        cfg = eng.walking_config()._replace(gait_gate=gate)
        state = eng.init_state(g1, cfg, f64)
        # Clock in the DS tail of step 0: gate window 0.4 of ds=0.25 puts
        # the gate in t_in_step in (0.15, 0.25); 0.17 stays below the
        # 0.8*ds crouch-guard window so only the gate law differs.
        state = state._replace(
            gait_clock=params.gait.start_time + jnp.asarray(0.17, f64)
        )
        fn = jax.jit(partial(eng._wbid_tick, g1, idx, cfg, params))
        alpha = jnp.asarray(1.0, f64)
        texts[gate] = fn.lower(state, alpha).as_text()
        new, _ = fn(state, alpha)
        advance[gate] = float(new.gait_clock - state.gait_clock)
    dt = float(eng.walking_config().plant.dt)
    # Production tick: the gate computation is absent from the program and
    # the clock runs at rate 1 even with slow-down params in scope.
    # Content-based check (not raw text length, which tracks formatting):
    # the gated program must lower strictly more StableHLO ops — the
    # DCM-prediction/slow-down block adds real computation.
    import re

    def op_count(text):
        return len(re.findall(r"stablehlo\.\w+", text))

    assert op_count(texts[False]) < op_count(texts[True]), (
        op_count(texts[False]),
        op_count(texts[True]),
    )
    np.testing.assert_allclose(advance[False], dt, rtol=1e-9)
    # Gated tick: the same state/params slow the DS-tail clock to the floor.
    np.testing.assert_allclose(advance[True], 0.25 * dt, rtol=1e-9)


def test_velocity_drift_bounded(g1, standing_engine):
    cfg, params, rollout = standing_engine
    state = eng.init_state(g1, cfg, jnp.float64)
    run = jax.jit(lambda s: rollout(s, params, 10))
    final, _ = run(state)
    assert float(jnp.abs(final.v).max()) < 0.5, np.asarray(final.v)
