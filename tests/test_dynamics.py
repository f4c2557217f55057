import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models import robot as rb


def random_state(g1, rng, vel_scale=1.0):
    q = jnp.concatenate(
        [
            jnp.asarray(rng.normal(size=3) * 0.1) + jnp.array([0.0, 0.0, 0.7]),
            rot.rpy_to_quat(jnp.asarray(rng.normal(size=3) * 0.3)),
            jnp.asarray(rng.normal(size=g1.nj) * 0.4),
        ]
    )
    v = jnp.asarray(rng.normal(size=g1.nv) * vel_scale)
    return q, v


def test_mass_matrix_symmetric_pd(g1, rng):
    q, _ = random_state(g1, rng)
    M = np.asarray(dyn.crba(g1, q))
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0, w.min()


def test_crba_matches_rnea_columns(g1, rng):
    """M e_i == rnea(q, 0, e_i) - rnea(q, 0, 0): CRBA and RNEA are consistent."""
    q, _ = random_state(g1, rng)
    z = jnp.zeros(g1.nv)
    M = np.asarray(dyn.crba(g1, q))
    g = np.asarray(dyn.rnea(g1, q, z, z))
    for i in [0, 1, 4, 5, 6, 8, 17, 28]:
        e = jnp.zeros(g1.nv).at[i].set(1.0)
        col = np.asarray(dyn.rnea(g1, q, z, e)) - g
        np.testing.assert_allclose(col, M[:, i], atol=1e-8, err_msg=f"col {i}")


def test_gravity_matches_potential_gradient(g1, rng):
    """rnea(q,0,0) . delta == d/dt V(integrate(q, delta, t)) for the potential
    V = -sum m_b g . com_b — validates gravity sign and tangent conventions."""
    q, _ = random_state(g1, rng)
    gvec = jnp.array([0.0, 0.0, -dyn.GRAVITY])

    def V(qq):
        X = rb.fk(g1, qq)
        com_w = jnp.einsum("bij,bj->bi", X.R, g1.com) + X.p
        return -jnp.sum(g1.mass * (com_w @ gvec))

    tau_g = np.asarray(dyn.gravity_force(g1, q))
    rng2 = np.random.default_rng(7)
    for _ in range(4):
        delta = jnp.asarray(rng2.normal(size=g1.nv))
        dV = jax.jvp(lambda t: V(rb.integrate_q(g1, q, delta, t)), (0.0,), (1.0,))[1]
        np.testing.assert_allclose(float(tau_g @ delta), float(dV), rtol=1e-6)


def test_bias_force_quadratic_in_velocity(g1, rng):
    """h(q, a*v) - g(q) scales quadratically in a (pure Coriolis/centrifugal)."""
    q, v = random_state(g1, rng)
    g = np.asarray(dyn.gravity_force(g1, q))
    c1 = np.asarray(dyn.bias_force(g1, q, v)) - g
    c2 = np.asarray(dyn.bias_force(g1, q, 2.0 * v)) - g
    np.testing.assert_allclose(c2, 4.0 * c1, rtol=1e-8, atol=1e-10)


def test_energy_conservation_freefall(g1, rng):
    """Integrate unactuated dynamics; total energy must be ~conserved."""
    q, v = random_state(g1, rng, vel_scale=0.3)
    gvec = jnp.array([0.0, 0.0, -dyn.GRAVITY])

    def energy(q, v):
        M = dyn.crba(g1, q)
        X = rb.fk(g1, q)
        com_w = jnp.einsum("bij,bj->bi", X.R, g1.com) + X.p
        V = -jnp.sum(g1.mass * (com_w @ gvec))
        return 0.5 * v @ M @ v + V

    # Symplectic-ish RK2 on (q, v)
    dt = 1e-4

    @jax.jit
    def step(q, v):
        a1 = dyn.forward_dynamics(g1, q, v, jnp.zeros(g1.nv))
        qm = rb.integrate_q(g1, q, v + 0.5 * dt * a1, 0.5 * dt)
        a2 = dyn.forward_dynamics(g1, qm, v + 0.5 * dt * a1, jnp.zeros(g1.nv))
        v2 = v + dt * a2
        q2 = rb.integrate_q(g1, q, v + 0.5 * dt * (a1 + a2) * 0.5 + 0.5 * v2 * 0, dt)
        # midpoint-velocity configuration update
        q2 = rb.integrate_q(g1, q, 0.5 * (v + v2), dt)
        return q2, v2

    E0 = float(energy(q, v))
    for _ in range(200):
        q, v = step(q, v)
    E1 = float(energy(q, v))
    assert abs(E1 - E0) / max(abs(E0), 1.0) < 2e-4, (E0, E1)


@pytest.fixture(scope="module")
def mj_model():
    mujoco = pytest.importorskip("mujoco")
    import json
    from pathlib import Path
    from g1_locomotion_tpu.models.mjcf import export_mjcf
    from g1_locomotion_tpu.models.urdf import spec_from_dict

    asset = Path(rb.__file__).parent / "assets" / "g1_23dof.json"
    spec = spec_from_dict(json.loads(asset.read_text()))
    m = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    return mujoco, m


def _mj_inverse(mujoco, m, q, v, a):
    """Run mj_inverse with our conventions mapped to MuJoCo's.

    MuJoCo free joint: qpos=[p_world, quat wxyz]; qvel=[v_world, w_local];
    qacc likewise. Ours: v=[v_local, w_local]. Generalized force comes back as
    [f_world, n_local]; ours is [f_local, n_local].
    """
    d = mujoco.MjData(m)
    R = np.asarray(rot.quat_to_matrix(jnp.asarray(q[3:7])))
    d.qpos[:] = np.asarray(q)
    d.qvel[:3] = R @ np.asarray(v[:3])
    d.qvel[3:6] = np.asarray(v[3:6])
    d.qvel[6:] = np.asarray(v[6:])
    # a_world_lin = d/dt (R v_local) = R (a_local + w x v_local)
    w = np.asarray(v[3:6])
    d.qacc[:3] = R @ (np.asarray(a[:3]) + np.cross(w, np.asarray(v[:3])))
    d.qacc[3:6] = np.asarray(a[3:6])
    d.qacc[6:] = np.asarray(a[6:])
    mujoco.mj_inverse(m, d)
    tau_mj = d.qfrc_inverse.copy()
    tau = tau_mj.copy()
    tau[:3] = R.T @ tau_mj[:3]
    return tau


def test_rnea_vs_mujoco_static(g1, q_stand, mj_model):
    mujoco, m = mj_model
    z = jnp.zeros(g1.nv)
    ours = np.asarray(dyn.rnea(g1, q_stand, z, z))
    mj = _mj_inverse(mujoco, m, q_stand, z, z)
    np.testing.assert_allclose(ours, mj, atol=1e-6)


def test_rnea_vs_mujoco_random(g1, rng, mj_model):
    mujoco, m = mj_model
    for _ in range(5):
        q, v = random_state(g1, rng)
        a = jnp.asarray(rng.normal(size=g1.nv))
        ours = np.asarray(dyn.rnea(g1, q, v, a))
        mj = _mj_inverse(mujoco, m, q, v, a)
        np.testing.assert_allclose(ours, mj, atol=1e-5)


def test_rnea_vmap_jit(g1, q_stand):
    B = 16
    qs = jnp.tile(q_stand[None], (B, 1))
    vs = jnp.zeros((B, g1.nv))
    f = jax.jit(jax.vmap(lambda q, v: dyn.rnea(g1, q, v, v * 0)))
    out = f(qs, vs)
    assert out.shape == (B, g1.nv)


@pytest.mark.parametrize(
    "variant", ["g1_23dof", "g1_29dof", "g1_29dof_with_hand", "g1_dual_arm"]
)
def test_masked_dynamics_match_sequential_oracle(variant, rng):
    """The world-Plücker masked RNEA/CRBA (production path, round 3 — O(1)
    trace depth, mask matmuls) must agree with the independently-derived
    sequential Featherstone propagation (round-1/2 path, kept as the oracle)
    on every robot variant."""
    model = rb.load_robot(variant, dtype=jnp.float64)
    for _ in range(2):
        q = jnp.concatenate(
            [
                jnp.asarray(rng.normal(size=3) * 0.5),
                rot.rpy_to_quat(jnp.asarray(rng.normal(size=3) * 0.8)),
                jnp.asarray(rng.normal(size=model.nj) * 0.6),
            ]
        )
        v = jnp.asarray(rng.normal(size=model.nv))
        a = jnp.asarray(rng.normal(size=model.nv))
        np.testing.assert_allclose(
            np.asarray(dyn.rnea(model, q, v, a)),
            np.asarray(dyn._rnea_unrolled(model, q, v, a)),
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(dyn.crba(model, q)),
            np.asarray(dyn._crba_unrolled(model, q)),
            atol=1e-10,
        )
