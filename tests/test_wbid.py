import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.wbid import solver as wbid
from g1_locomotion_tpu.wbid.stack import StackIndices, angular_momentum
from g1_locomotion_tpu.wbid.tasks import WBIDReferences, default_gains


@pytest.fixture(scope="module")
def setup(g1):
    return StackIndices.from_model(g1)


def standing_refs(g1, q, dtype=jnp.float64):
    """References for quiet double-support standing at the current state."""
    X = rb.fk(g1, q)
    com = rb.com_position(g1, X)
    feet_pos = []
    feet_R = []
    idx = StackIndices.from_model(g1)
    for f in idx.feet:
        P = rb.frame_pose(g1, X, f)
        feet_pos.append(P.p)
        feet_R.append(P.R)
    mg = float(g1.total_mass) * 9.80665
    f_des = jnp.zeros((4, 3), dtype).at[:, 2].set(mg / 4.0)
    return WBIDReferences(
        com_pos=com,
        com_vel=jnp.zeros(3, dtype),
        com_acc=jnp.zeros(3, dtype),
        base_R=X.R[0],
        base_angvel=jnp.zeros(3, dtype),
        base_angacc=jnp.zeros(3, dtype),
        posture_q=q[7:],
        contact_pos=jnp.stack(feet_pos),
        contact_R=jnp.stack(feet_R),
        swing_pos=jnp.stack(feet_pos),
        swing_vel=jnp.zeros((2, 3), dtype),
        swing_acc=jnp.zeros((2, 3), dtype),
        swing_R=jnp.stack(feet_R),
        f_des=f_des,
        contact_active=jnp.ones(2, dtype),
        angmom_L=jnp.zeros(3, dtype),
        angmom_Ldot=jnp.zeros(3, dtype),
    )


def test_standing_equilibrium(g1, q_stand, setup):
    """Quiet standing: near-zero accelerations, forces ~ mg, dynamics feasible."""
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    v = jnp.zeros(g1.nv)
    sol = wbid.solve(g1, setup, cfg, gains, q_stand, v, refs)

    # The net-contact-force task (w_wrench_total) pins sum(f_xy) to the
    # (static) f_des exactly; the small gravity/posture residual that used to
    # leak into ~1.4 N of tangential force now shows up as a <1 rad/s^2 joint
    # transient instead — by design (the planned CoM dynamics are delivered,
    # posture DOFs absorb model residuals).
    assert float(jnp.abs(sol.qddot).max()) < 1.0, np.asarray(sol.qddot)
    fz_total = float(sol.forces[:, 2].sum())
    np.testing.assert_allclose(fz_total, 34.1329 * 9.80665, rtol=0.05)
    # Floating-base dynamics residual (DynamicFeasibility, wbid.py:184-190).
    np.testing.assert_allclose(np.asarray(sol.base_wrench_res), 0.0, atol=1e-4)


def test_torque_limits_respected(g1, q_stand, setup):
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    # Violent CoM reference to saturate.
    refs = refs._replace(com_pos=refs.com_pos + jnp.array([1.0, 0.0, 0.5]))
    sol = wbid.solve(g1, setup, cfg, gains, q_stand, jnp.zeros(g1.nv), refs)
    tau = np.asarray(sol.tau)
    assert (np.abs(tau) <= np.asarray(g1.tau_max) + 1e-5).all(), tau


def test_friction_cone_on_forces(g1, q_stand, setup):
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    refs = refs._replace(com_acc=jnp.array([3.0, 0.0, 0.0]))  # hard accel fwd
    sol = wbid.solve(g1, setup, cfg, gains, q_stand, jnp.zeros(g1.nv), refs)
    f = np.asarray(sol.forces)
    for i in range(4):
        assert abs(f[i, 0]) <= 0.8 * f[i, 2] + 1e-6
        assert abs(f[i, 1]) <= 0.8 * f[i, 2] + 1e-6
        assert f[i, 2] >= 10.0 - 1e-6  # stance min normal force (wbid.py:123)


def test_swing_foot_zero_force(g1, q_stand, setup):
    """Left foot in swing: zero forces on its 2 contacts; tracking acc toward
    the swing target."""
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    X = rb.fk(g1, q_stand)
    idx = setup
    target = rb.frame_pose(g1, X, idx.feet[0]).p + jnp.array([0.05, 0.0, 0.04])
    refs = refs._replace(
        contact_active=jnp.array([0.0, 1.0]),
        swing_pos=refs.swing_pos.at[0].set(target),
    )
    sol = wbid.solve(g1, setup, cfg, gains, q_stand, jnp.zeros(g1.nv), refs)
    f = np.asarray(sol.forces)
    np.testing.assert_allclose(f[0], 0.0, atol=1e-3)
    np.testing.assert_allclose(f[1], 0.0, atol=1e-3)
    # Right foot carries all weight.
    np.testing.assert_allclose(f[2:, 2].sum(), 34.1329 * 9.80665, rtol=0.15)
    # Swing foot accelerates toward the target (z up).
    J = rb.frame_jacobian(g1, q_stand, X, idx.feet[0])
    a_foot = np.asarray(J @ sol.qddot)
    assert a_foot[2] > 1.0, a_foot


def test_angular_momentum_matches_fd(g1, q_stand, rng):
    """L(q, v) consistency: dL/dt under free fall ~ gravity torque about CoM
    (here we simply check linearity in v and the A_G jacobian)."""
    q = q_stand.at[7:].add(jnp.asarray(rng.normal(size=g1.nj) * 0.1))
    v = jnp.asarray(rng.normal(size=g1.nv))
    X = rb.fk(g1, q)
    L1 = angular_momentum(g1, q, v, X)
    L2 = angular_momentum(g1, q, 2.0 * v, X)
    np.testing.assert_allclose(np.asarray(L2), 2 * np.asarray(L1), atol=1e-10)
    # Standing still: zero momentum.
    L0 = angular_momentum(g1, q_stand, jnp.zeros(g1.nv), rb.fk(g1, q_stand))
    np.testing.assert_allclose(np.asarray(L0), 0.0, atol=1e-12)


def test_angular_momentum_vs_mujoco(g1, q_stand, rng):
    """Cross-check centroidal angular momentum against MuJoCo subtree momentum."""
    mujoco = pytest.importorskip("mujoco")
    import json
    from pathlib import Path
    from g1_locomotion_tpu.models.mjcf import export_mjcf
    from g1_locomotion_tpu.models.urdf import spec_from_dict
    from g1_locomotion_tpu.core import rotations as rot

    asset = Path(rb.__file__).parent / "assets" / "g1_23dof.json"
    spec = spec_from_dict(json.loads(asset.read_text()))
    m = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    d = mujoco.MjData(m)

    q = q_stand.at[7:].add(jnp.asarray(rng.normal(size=g1.nj) * 0.2))
    v = jnp.asarray(rng.normal(size=g1.nv) * 0.5)
    R = np.asarray(rot.quat_to_matrix(q[3:7]))
    d.qpos[:] = np.asarray(q)
    d.qvel[:3] = R @ np.asarray(v[:3])
    d.qvel[3:6] = np.asarray(v[3:6])
    d.qvel[6:] = np.asarray(v[6:])
    mujoco.mj_forward(m, d)
    mujoco.mj_subtreeVel(m, d)
    L_mj = d.subtree_angmom[0]  # about subtree CoM of the whole robot

    L = np.asarray(angular_momentum(g1, q, v, rb.fk(g1, q)))
    np.testing.assert_allclose(L, L_mj, atol=1e-8)


def test_wbid_jit_vmap(g1, q_stand, setup):
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    B = 4
    qs = jnp.tile(q_stand[None], (B, 1))
    vs = jnp.zeros((B, g1.nv))
    f = jax.jit(
        jax.vmap(lambda q, v: wbid.solve(g1, setup, cfg, gains, q, v, refs))
    )
    sols = f(qs, vs)
    assert sols.tau.shape == (B, g1.nj)
    assert not bool(jnp.isnan(sols.tau).any())
