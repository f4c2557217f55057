import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc


def numpy_oracle_matrices(mass, inertia, yaw, r, dt):
    """Independent NumPy construction of the SRBD discrete matrices."""
    import scipy.linalg

    cz, sz = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Iw = Rz @ inertia @ Rz.T
    Iw_inv = np.linalg.inv(Iw)

    A = np.zeros((13, 13))
    A[0:3, 6:9] = Rz.T
    A[3:6, 9:12] = np.eye(3)
    A[11, 12] = 1.0
    B = np.zeros((13, 12))
    for i in range(4):
        ri = r[i]
        S = np.array([[0, -ri[2], ri[1]], [ri[2], 0, -ri[0]], [-ri[1], ri[0], 0]])
        B[6:9, 3 * i : 3 * i + 3] = Iw_inv @ S
        B[9:12, 3 * i : 3 * i + 3] = np.eye(3) / mass
    # True ZOH via expm of the block matrix.
    M = np.zeros((25, 25))
    M[:13, :13] = A
    M[:13, 13:] = B
    E = scipy.linalg.expm(M * dt)
    return E[:13, :13], E[:13, 13:]


def standing_setup(N=10, dtype=jnp.float64):
    params = srbd.SRBDParams(
        mass=jnp.asarray(srbd.G1_MASS, dtype),
        inertia=srbd.TORSO_INERTIA.astype(dtype),
    )
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    # 4 contacts: L-heel, L-toe, R-heel, R-toe around the CoM xy.
    feet = jnp.array(
        [
            [-0.05, 0.12, 0.0],
            [0.12, 0.12, 0.0],
            [-0.05, -0.12, 0.0],
            [0.12, -0.12, 0.0],
        ],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    contact = jnp.ones((N, 4), dtype)
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    return params, x0, x_ref, contact, c_hor, p_hor


def test_discretization_matches_expm():
    params, x0, *_ = standing_setup()
    r = np.array([[0.1, 0.1, -0.6], [0.2, -0.1, -0.6], [-0.1, 0.0, -0.5], [0.0, 0.2, -0.55]])
    yaw = 0.3
    A_c, B_c = srbd.continuous_matrices(params, jnp.asarray(yaw), jnp.asarray(r))
    Ad, Bd = srbd.discretize(A_c, B_c, 0.04)
    Ad_o, Bd_o = numpy_oracle_matrices(
        float(params.mass), np.asarray(params.inertia), yaw, r, 0.04
    )
    np.testing.assert_allclose(np.asarray(Ad), Ad_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd), Bd_o, atol=1e-12)


def test_condense_equals_rollout(rng):
    """X = A_qp x0 + B_qp U must equal the step-by-step rollout."""
    params, x0, *_ = standing_setup()
    N = 6
    Ads, Bds = [], []
    for k in range(N):
        r = jnp.asarray(rng.normal(size=(4, 3)))
        A_c, B_c = srbd.continuous_matrices(params, jnp.asarray(rng.normal() * 0.5), r)
        Ad, Bd = srbd.discretize(A_c, B_c, 0.04)
        Ads.append(Ad), Bds.append(Bd)
    Ad = jnp.stack(Ads)
    Bd = jnp.stack(Bds)
    A_qp, B_qp = srbd.condense(Ad, Bd)
    U = jnp.asarray(rng.normal(size=(N, 12)) * 50)
    X_cond = A_qp @ x0 + B_qp @ U.reshape(-1)
    X_roll = srbd.rollout(Ad, Bd, x0, U)[1:].reshape(-1)
    np.testing.assert_allclose(np.asarray(X_cond), np.asarray(X_roll), rtol=1e-12)


def test_standing_balance_forces():
    """Static standing: total normal force = m*g, symmetric distribution,
    zero predicted drift."""
    cfg = mpc.MPCConfig(horizon=10, qp=mpc.MPCConfig().qp._replace(iters=100))
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()
    sol = mpc.solve(cfg, w, params, x0, x_ref, contact, c_hor, p_hor)

    fz = np.asarray(sol.u0[2::3])
    assert (fz >= 9.99).all(), fz  # all in stance, above fz_min
    # Finite-horizon MPC trades tracking vs force regularization: ~m*g.
    np.testing.assert_allclose(fz.sum(), srbd.G1_MASS * 9.80665, rtol=5e-3)
    # Left/right symmetry.
    np.testing.assert_allclose(fz[0] + fz[1], fz[2] + fz[3], rtol=1e-3)
    # Predicted horizon stays near the reference.
    np.testing.assert_allclose(
        np.asarray(sol.x_horizon[-1, 3:6]), np.asarray(x0[3:6]), atol=5e-3
    )


def test_friction_cone_respected():
    """Aggressive lateral reference: forces must stay inside the pyramid."""
    cfg = mpc.MPCConfig(horizon=10)
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()
    x_ref = x_ref.at[:, 9].set(2.0)  # demand 2 m/s forward velocity
    sol = mpc.solve(cfg, w, params, x0, x_ref, contact, c_hor, p_hor)
    u = np.asarray(sol.u0).reshape(4, 3)
    for i in range(4):
        fx, fy, fz = u[i]
        assert abs(fx) <= 0.8 * fz + 1e-6, u[i]
        assert abs(fy) <= 0.8 * fz + 1e-6, u[i]


def test_inactive_contacts_zero_force():
    cfg = mpc.MPCConfig(horizon=10)
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()
    contact = contact.at[:, 0].set(0.0).at[:, 1].set(0.0)  # left foot swings
    sol = mpc.solve(cfg, w, params, x0, x_ref, contact, c_hor, p_hor)
    u = np.asarray(sol.u0).reshape(4, 3)
    np.testing.assert_allclose(u[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(u[1], 0.0, atol=1e-7)
    # Right foot carries the weight.
    np.testing.assert_allclose(u[2:, 2].sum(), srbd.G1_MASS * 9.80665, rtol=5e-2)


def test_gravity_compensation_tracks_height():
    """Closed-loop SRBD rollout under MPC keeps CoM height for 2 s."""
    cfg = mpc.MPCConfig(horizon=10)
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()

    @jax.jit
    def step(x, U_warm):
        sol = mpc.solve(cfg, w, params, x, x_ref, contact, c_hor, p_hor, U_warm=U_warm)
        # Apply first control through the true (nonlinear-free) SRBD dynamics.
        A_c, B_c = srbd.continuous_matrices(params, x[2], c_hor[0] - x[3:6][None])
        Ad, Bd = srbd.discretize(A_c, B_c, cfg.dt)
        return Ad @ x + Bd @ sol.u0, sol.U

    x = x0 + jnp.zeros_like(x0).at[4].set(0.03)  # lateral CoM offset
    U = jnp.zeros((cfg.horizon, 12), x.dtype)
    for _ in range(50):  # 2 s at dt=0.04
        x, U = step(x, U)
    np.testing.assert_allclose(np.asarray(x[3:6]), np.asarray(x0[3:6]), atol=2e-3)
    assert abs(float(x[4])) < 5e-3  # lateral offset rejected


def test_move_blocking_matches_full():
    """Knot-blocked forces (move_block=2) stay within 2% of the per-step
    solution for standing and swing patterns (measured: 0.05% standing,
    1.7% single-support)."""
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()
    c2 = contact.at[:, 0].set(0.0).at[:, 1].set(0.0)
    for ch in (contact, c2):
        full = mpc.solve(mpc.MPCConfig(horizon=10), w, params, x0, x_ref, ch, c_hor, p_hor)
        blocked = mpc.solve(
            mpc.MPCConfig(horizon=10, move_block=2), w, params, x0, x_ref, ch, c_hor, p_hor
        )
        f_full = np.asarray(full.u0[2::3]).sum()
        f_blk = np.asarray(blocked.u0[2::3]).sum()
        np.testing.assert_allclose(f_blk, f_full, rtol=0.02)


def test_mpc_vmap_batch():
    cfg = mpc.MPCConfig(horizon=10)
    w = mpc.default_weights(jnp.float64)
    params, x0, x_ref, contact, c_hor, p_hor = standing_setup()
    B = 8
    x0s = jnp.tile(x0[None], (B, 1)).at[:, 4].add(jnp.linspace(-0.03, 0.03, B))
    f = jax.jit(
        jax.vmap(lambda x: mpc.solve(cfg, w, params, x, x_ref, contact, c_hor, p_hor))
    )
    sols = f(x0s)
    assert sols.u0.shape == (B, 12)
    fz = np.asarray(sols.u0[:, 2::3].sum(axis=1))
    np.testing.assert_allclose(fz, srbd.G1_MASS * 9.80665, rtol=3e-3)


def test_params_from_model_matches_constants(g1):
    """The model-derived SRBD params reproduce the hardcoded g1_23dof
    composite constants (mass + whole-body inertia about the CoM at
    q_init) — the constants were extracted exactly this way."""
    from g1_locomotion_tpu.engine.state import q_init_standing
    from g1_locomotion_tpu.models import srbd

    q = q_init_standing(g1, jnp.float64)
    p = srbd.params_from_model(g1, q)
    np.testing.assert_allclose(float(p.mass), srbd.G1_MASS, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p.inertia), np.asarray(srbd.G1_COMPOSITE_INERTIA),
        atol=2e-3,
    )


def test_roll_moment_cap_binds():
    """roll_moment_max adds hard |sum (r x f)_x| rows: with the cap on, the
    planned roll moment respects the bound; with it off, a laterally-offset
    reference demands more. (Off by default: the cap also bounds the
    legitimate double-support weight-transfer moment ~ mg * foot-spacing
    ~ 33 N.m, which breaks the walking gait — its role is analysis /
    single-support studies until the reference-relative form lands.)"""
    dtype = jnp.float64
    params = srbd.default_params(dtype)
    N = 6
    com = jnp.array([0.0, 0.0, 0.6], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], dtype)
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    # Reference displaced 0.3 m laterally: a violent lateral force demand.
    x_ref = jnp.tile(x0[None], (N, 1)).at[:, 4].add(0.3)
    contact = jnp.ones((N, 4), dtype)
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    w = mpc.default_weights(dtype)

    def max_roll_moment(cfg):
        sol = mpc.solve(cfg, w, params, x0, x_ref, contact, c_hor, p_hor)
        r = c_hor[0] - com[None, :]
        M = jnp.einsum("kcd->kd", jnp.cross(
            jnp.tile(r[None], (N, 1, 1)), sol.U.reshape(N, 4, 3)))
        return float(jnp.abs(M[:, 0]).max())

    m_free = max_roll_moment(mpc.MPCConfig(horizon=N))
    m_capped = max_roll_moment(
        mpc.MPCConfig(horizon=N, roll_moment_max=5.0,
                      qp=mpc.MPCConfig().qp._replace(iters=120))
    )
    assert m_free > 10.0, m_free
    assert m_capped < 5.5, m_capped
