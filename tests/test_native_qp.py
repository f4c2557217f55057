"""Tests for the native C++ IPM QP solver (host runtime / oracle)."""

import numpy as np
import pytest

from g1_locomotion_tpu.ops import native_qp

from test_qp import oracle, random_qp


@pytest.fixture(scope="module", autouse=True)
def built():
    native_qp.build()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matches_scipy_oracle(seed):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = map(np.asarray, random_qp(rng, n=20, m=30))
    res = native_qp.solve(P, q, A, l, u)
    assert res.status == 0, res
    x_ref = oracle(P, q, A, l, u)
    np.testing.assert_allclose(res.x, x_ref, atol=1e-6)


def test_tight_accuracy_kkt():
    rng = np.random.default_rng(7)
    P, q, A, l, u = map(np.asarray, random_qp(rng, n=30, m=50, eq_rows=5))
    res = native_qp.solve(P, q, A, l, u, max_iter=100, tol=1e-8)
    assert res.status == 0
    # KKT residuals at ~1e-9 or better.
    Ax = A @ res.x
    pri = max(np.maximum(Ax - u, 0.0).max(), np.maximum(l - Ax, 0.0).max())
    dua = np.abs(P @ res.x + q + A.T @ res.y).max()
    assert pri < 1e-8, pri
    assert dua < 1e-7, dua


def test_equality_rows():
    rng = np.random.default_rng(9)
    P, q, A, l, u = map(np.asarray, random_qp(rng, n=16, m=20, eq_rows=6))
    res = native_qp.solve(P, q, A, l, u)
    np.testing.assert_allclose((A @ res.x)[:6], l[:6], atol=1e-8)


def test_one_sided_bounds():
    n = 8
    P = np.eye(n)
    q = -2.0 * np.ones(n)
    A = np.eye(n)
    l = np.full(n, -1e20)  # no lower bound
    u = np.ones(n)
    res = native_qp.solve(P, q, A, l, u)
    np.testing.assert_allclose(res.x, np.ones(n), atol=1e-8)


def test_cross_check_admm_wbid_like():
    """Native IPM and the JAX ADMM agree on a WBID-sized problem."""
    import jax.numpy as jnp

    from g1_locomotion_tpu.ops import qp as qplib

    rng = np.random.default_rng(3)
    P, q, A, l, u = map(np.asarray, random_qp(rng, n=41, m=100, eq_rows=6))
    res = native_qp.solve(P, q, A, l, u)
    sol = qplib.solve_qp(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(l),
        jnp.asarray(u), cfg=qplib.QPConfig(iters=150),
    )
    np.testing.assert_allclose(np.asarray(sol.x), res.x, atol=5e-5)
