"""Reference-compatibility surfaces: the srbd_mpc-style MPC class, message
pytrees, and the small utility modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mpc_class_reference_api(g1):
    """SURVEY.md §2.3 Python API: MPC(dt).init_matrices();
    update(contact_horizon, c_horizon, p_com_horizon, x_current, one_rollout)
    -> (u_opt0 (12,), x_opt (N+1, 13)) — the run_simulation.py:106 call."""
    from g1_locomotion_tpu.mpc.api import MPC

    M = MPC(dt=0.04, dtype=jnp.float64)
    assert M.HORIZON_LENGTH == 10
    assert M.g == pytest.approx(-9.80665)
    M.init_matrices()

    # The monolithic-sim setup (run_simulation.py:70-106): standing, all
    # contacts active for the whole horizon.
    M.x0[0:3] = 0.0
    M.x0[3:6] = np.array([[5.26790425e-02], [7.44339342e-05], [5.97983255e-01]])
    M.x0[6:12] = 0.0
    M.x0[12] = M.g
    M.x_ref_hor[:, :] = 0.0
    M.x_ref_hor[0, :] = M.x0[:, 0]
    M.x_ref_hor[0:, 3:6] = [5.26790425e-02, 7.44339342e-05, 5.97983255e-01]
    M.x_ref_hor[0:, -1] = M.g

    feet = np.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]]
    )
    c_horizon = [feet.reshape(-1) for _ in range(M.HORIZON_LENGTH)]
    contact_horizon = [np.array([1, 1, 1, 1]) for _ in range(M.HORIZON_LENGTH)]
    p_com_horizon = M.x_ref_hor[:, 3:6].copy()

    u_opt0, x_opt = M.update(
        contact_horizon, c_horizon, p_com_horizon, x_current=M.x0, one_rollout=True
    )
    assert u_opt0.shape == (12,)
    assert x_opt.shape == (M.HORIZON_LENGTH + 1, 13)
    # Standing: total normal force ~ m*g, row 1 is the WBID reference.
    np.testing.assert_allclose(u_opt0[2::3].sum(), 34.1329 * 9.80665, rtol=5e-3)
    np.testing.assert_allclose(x_opt[1, 3:6], M.x0[3:6, 0], atol=5e-3)
    # Warm-started second call agrees.
    u2, _ = M.update(contact_horizon, c_horizon, p_com_horizon, x_current=M.x0)
    np.testing.assert_allclose(u2, u_opt0, atol=1e-3)


def test_msgs_roundtrip():
    from g1_locomotion_tpu import msgs

    x = jnp.arange(13.0)
    st = msgs.State.from_vector(x)
    np.testing.assert_allclose(np.asarray(st.to_vector()), np.asarray(x))
    assert msgs.CONTACT_NAMES[0] == "left_foot_line_contact_lower"


def test_msgs_srbd_current(g1, q_stand):
    from g1_locomotion_tpu import msgs

    m = msgs.srbd_current_from_engine(
        g1, q_stand, jnp.zeros(g1.nv), jnp.zeros((4, 3))
    )
    assert m.states_horizon.shape == (1, 13)
    assert float(m.states_horizon[0, 12]) == pytest.approx(-9.80665)
    assert m.contact_positions.shape == (4, 3)


def test_pd_utility():
    from g1_locomotion_tpu.utils.pd import PDGains, pd_torques

    tau = pd_torques(
        PDGains(kp=jnp.asarray(100.0), kd=jnp.asarray(10.0)),
        q_des=jnp.ones(3), q=jnp.zeros(3), dq=jnp.zeros(3), tau_max=50.0,
    )
    np.testing.assert_allclose(np.asarray(tau), 50.0)  # clipped from 100


def test_checkpoint_roundtrip(tmp_path):
    from g1_locomotion_tpu.utils import checkpoint

    state = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.asarray(3))}
    p = str(tmp_path / "ckpt")
    checkpoint.save(p, state, meta={"step": 7})
    assert checkpoint.exists(p)
    restored, meta = checkpoint.restore(p, state)
    assert meta["step"] == 7
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["b"][0]), np.ones((2, 2)))


def test_stats_registry():
    from g1_locomotion_tpu.utils.stats import StatisticsRegistry

    reg = StatisticsRegistry("/wbid_statistics")
    reg.set("wbid_solve_time", 0.0012)
    t = reg.timer("solve")
    t.time(lambda: jnp.sum(jnp.ones(8)))
    out = reg.export()
    assert "wbid_solve_time" in out and "p99_ms" in out


def test_viz_plot(tmp_path):
    from g1_locomotion_tpu.utils import viz

    T = 50
    logs = {
        "com": np.random.randn(T, 3) * 0.01 + [0, 0, 0.6],
        "tau": np.random.randn(T, 23),
        "forces": np.abs(np.random.randn(T, 4, 3)) * 50,
        "contact": np.ones((T, 4)),
        "wbid_pri_res": np.full(T, 1e-6),
    }
    out = tmp_path / "plot.png"
    viz.plot_rollout(logs, str(out))
    assert out.exists() and out.stat().st_size > 10_000
