import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.ops import qp


def random_qp(rng, n=20, m=30, eq_rows=4):
    """Random strictly-convex QP with a mix of equality/inequality rows."""
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.3
    Ax = A @ x_feas
    l = Ax - rng.uniform(0.1, 1.0, size=m)
    u = Ax + rng.uniform(0.1, 1.0, size=m)
    l[:eq_rows] = Ax[:eq_rows]
    u[:eq_rows] = Ax[:eq_rows]
    return map(jnp.asarray, (P, q, A, l, u))


def oracle(P, q, A, l, u):
    """scipy trust-constr solution (host oracle replacing qpOASES in tests)."""
    from scipy.optimize import LinearConstraint, minimize

    P, q, A, l, u = map(np.asarray, (P, q, A, l, u))
    n = P.shape[0]
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros(n),
        jac=lambda x: P @ x + q,
        hess=lambda x: P,
        method="trust-constr",
        constraints=[LinearConstraint(A, l, u)],
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 2000},
    )
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = random_qp(rng)
    sol = jax.jit(lambda *a: qp.solve_qp(*a, cfg=qp.QPConfig(iters=120)))(P, q, A, l, u)
    x_ref = oracle(P, q, A, l, u)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-5)


def test_kkt_residuals_small(rng):
    P, q, A, l, u = random_qp(rng, n=30, m=50)
    sol = qp.solve_qp(P, q, A, l, u, cfg=qp.QPConfig(iters=150))
    pri, dua, comp = qp.kkt_residuals(P, q, A, l, u, sol.x, sol.y)
    assert float(pri) < 1e-7, float(pri)
    assert float(dua) < 1e-6, float(dua)
    assert float(comp) < 1e-6, float(comp)


def test_equality_rows_enforced(rng):
    P, q, A, l, u = random_qp(rng, eq_rows=6)
    sol = qp.solve_qp(P, q, A, l, u, cfg=qp.QPConfig(iters=120))
    Ax = np.asarray(A @ sol.x)
    np.testing.assert_allclose(Ax[:6], np.asarray(l[:6]), atol=1e-7)


def test_unconstrained_limit(rng):
    """With all bounds at +-inf the solution is -P^-1 q."""
    n = 12
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n))
    q = jnp.asarray(rng.normal(size=n))
    A = jnp.asarray(rng.normal(size=(5, n)))
    l = jnp.full(5, -1e20)
    u = jnp.full(5, 1e20)
    sol = qp.solve_qp(P, q, A, l, u, cfg=qp.QPConfig(iters=80))
    np.testing.assert_allclose(
        np.asarray(sol.x), np.asarray(-jnp.linalg.solve(P, q)), atol=1e-8
    )


def test_batched_vmap(rng):
    B, n, m = 8, 16, 24
    Ps, qs, As, ls, us = [], [], [], [], []
    for i in range(B):
        P, q, A, l, u = random_qp(np.random.default_rng(i), n=n, m=m)
        Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
    stack = lambda xs: jnp.stack(xs)
    sols = qp.solve_batch(
        stack(Ps), stack(qs), stack(As), stack(ls), stack(us),
        cfg=qp.QPConfig(iters=120),
    )
    for i in range(B):
        x_ref = oracle(Ps[i], qs[i], As[i], ls[i], us[i])
        np.testing.assert_allclose(np.asarray(sols.x[i]), x_ref, atol=5e-5)


def test_active_box_constraints(rng):
    """Box-constrained QP where the unconstrained optimum is far outside."""
    n = 10
    P = jnp.eye(n)
    q = jnp.asarray(-10.0 * np.ones(n))
    A = jnp.eye(n)
    l = jnp.zeros(n)
    u = jnp.ones(n)
    sol = qp.solve_qp(P, q, A, l, u, cfg=qp.QPConfig(iters=60))
    np.testing.assert_allclose(np.asarray(sol.x), np.ones(n), atol=1e-9)


def test_warm_start_converges_faster(rng):
    P, q, A, l, u = random_qp(rng, n=24, m=40)
    cold = qp.solve_qp(P, q, A, l, u, cfg=qp.QPConfig(iters=200, polish=False))
    warm = qp.solve_qp(
        P, q, A, l, u,
        cfg=qp.QPConfig(iters=10, polish=False, rho_segments=1),
        x0=cold.x, y0=cold.y,
    )
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-5)


def test_polish_refine_improves_f32(rng):
    """Iterative refinement on the polish KKT solve (QPConfig.polish_refine,
    LU path) must not hurt — and on an ill-conditioned f32 instance it
    should tighten the dual residual (the f32/TPU walking mitigation,
    engine/tick.walking_config_f32)."""
    n, m = 24, 32
    M = rng.normal(size=(n, n))
    # Condition ~1e5: scale rows geometrically.
    s = np.logspace(0, 2.5, n)
    P = jnp.asarray((M * s) @ (M * s).T + 1e-2 * np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    x_feas = rng.normal(size=n) * 0.3
    Ax = np.asarray(A) @ x_feas
    l = jnp.asarray(Ax - rng.uniform(0.1, 1.0, size=m), jnp.float32)
    u = jnp.asarray(Ax + rng.uniform(0.1, 1.0, size=m), jnp.float32)

    base = qp.QPConfig(iters=60, rho_segments=2, matmul_inverse=False)
    refined = base._replace(polish_refine=2)
    s0 = qp.solve_qp(P, q, A, l, u, base)
    s2 = qp.solve_qp(P, q, A, l, u, refined)
    # Same active set/solution neighborhood...
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s0.x),
                               rtol=1e-2, atol=1e-3)
    # ...with the refined dual residual no worse (and typically tighter).
    assert float(s2.dua_res) <= 2.0 * float(s0.dua_res), (
        float(s0.dua_res), float(s2.dua_res))
