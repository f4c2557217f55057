"""Pallas Cholesky-inverse base kernel vs the XLA reference implementation.

Runs the kernel in interpreter mode (tests are CPU; the compiled path is
exercised on the real chip by tools/bench_pallas.py and bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.ops import lin
from g1_locomotion_tpu.ops.pallas_lin import chol_inverse_base


def _random_spd(rng, b, n, cond=1e3, dtype=np.float32):
    """Batch of SPD matrices with controlled conditioning."""
    A = rng.standard_normal((b, n, n))
    Q, _ = np.linalg.qr(A)
    lams = np.exp(
        rng.uniform(0.0, np.log(cond), size=(b, n))
    )  # eigenvalues in [1, cond]
    K = np.einsum("bik,bk,bjk->bij", Q, lams, Q)
    K = 0.5 * (K + np.swapaxes(K, -1, -2))
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize("n", [4, 16, 30])
def test_base_kernel_matches_xla(rng, n):
    K = _random_spd(rng, 5, n)
    W_ref = lin._chol_inv_base(K)
    W = chol_inverse_base(K, interpret=True)
    np.testing.assert_allclose(np.asarray(W), np.asarray(W_ref), atol=2e-4,
                               rtol=2e-4)


def test_base_kernel_pads_batch(rng):
    # Batch not a multiple of the 128-lane tile: identity padding must not
    # leak into the real outputs.
    K = _random_spd(rng, 3, 8)
    W = chol_inverse_base(K, interpret=True)
    Ki = np.swapaxes(np.asarray(W), -1, -2) @ np.asarray(W)
    resid = Ki @ np.asarray(K) - np.eye(8)[None]
    assert np.abs(resid).max() < 1e-2  # f32 at cond 1e3


def test_base_kernel_inverse_property(rng):
    # W' W K = I to f32 accuracy on well-conditioned input.
    K = _random_spd(rng, 4, 30, cond=1e2)
    W = np.asarray(chol_inverse_base(K, interpret=True))
    Ki = np.swapaxes(W, -1, -2) @ W
    resid = Ki @ np.asarray(K) - np.eye(30)[None]
    assert np.abs(resid).max() < 5e-3


def test_dispatch_stays_on_xla_for_cpu(rng):
    # On the CPU test backend the auto gate must keep the XLA path (the
    # compiled Pallas kernel is TPU-only); forcing it off is also respected.
    K = _random_spd(rng, 256, 16)
    assert lin._pallas_wanted(K) is False
    W = lin.chol_inverse(K)
    np.testing.assert_allclose(
        np.asarray(W), np.asarray(lin._chol_inv_base(K)), atol=0, rtol=0
    )


def test_gj_solve_matches_dense_solve(rng):
    """Single-instance fused Gauss-Jordan solve (the serving-latency polish
    kernel) vs numpy on an SPD + ridge system like the polish Schur
    complement (interpret mode — the real kernel path is TPU-only)."""
    import numpy as np
    import jax.numpy as jnp
    from g1_locomotion_tpu.ops.pallas_lin import gj_solve

    m = 37
    M = rng.standard_normal((m, m))
    K = M @ M.T + 1e-3 * np.eye(m)
    b = rng.standard_normal(m)
    x = np.asarray(gj_solve(jnp.asarray(K), jnp.asarray(b), interpret=True))
    x_ref = np.linalg.solve(K, b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_polish_kernel_qp_matches_default(rng):
    """solve_qp with cfg.polish_kernel=True (interpret mode) lands on the
    same solution as the spd_inverse polish path."""
    import numpy as np
    import jax.numpy as jnp
    from unittest import mock
    from g1_locomotion_tpu.ops import qp as qplib
    from g1_locomotion_tpu.ops import pallas_lin

    n, m = 12, 20
    M = rng.standard_normal((n, n))
    P = jnp.asarray(M @ M.T + np.eye(n))
    q = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((m, n)))
    l = jnp.asarray(rng.standard_normal(m) - 2.0)
    u = l + 1.0

    base = qplib.QPConfig(iters=60, scaling_iters=3, polish_rounds=2)
    sol0 = qplib.solve_qp(P, q, A, l, u, cfg=base)
    real_gj = pallas_lin.gj_solve
    real_gji = pallas_lin.gj_inverse
    real_admm = pallas_lin.admm_iterate
    with mock.patch.object(
        pallas_lin, "gj_solve",
        lambda K, b: real_gj(K, b, interpret=True),
    ), mock.patch.object(
        pallas_lin, "gj_inverse",
        lambda K: real_gji(K, interpret=True),
    ), mock.patch.object(
        pallas_lin, "admm_iterate",
        lambda *a, **kw: real_admm(*a, **kw, interpret=True),
    ):
        sol1 = qplib.solve_qp(
            P, q, A, l, u, cfg=base._replace(polish_kernel=True)
        )
    np.testing.assert_allclose(
        np.asarray(sol1.x), np.asarray(sol0.x), rtol=1e-6, atol=1e-8
    )


def test_gj_inverse_matches_numpy(rng):
    """Fused single-instance GJ inverse (serving-latency ADMM-segment /
    Hr paths) vs numpy (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from g1_locomotion_tpu.ops.pallas_lin import gj_inverse

    m = 21
    M = rng.standard_normal((m, m))
    K = M @ M.T + 1e-3 * np.eye(m)
    Ki = np.asarray(gj_inverse(jnp.asarray(K), interpret=True))
    np.testing.assert_allclose(Ki, np.linalg.inv(K), rtol=1e-7, atol=1e-9)


def test_admm_iterate_matches_xla_loop(rng):
    """Fused ADMM-loop kernel (serving path) vs the exact ops/qp.py iterate
    math on a random bounded QP — including non-tile-aligned n, m."""
    from g1_locomotion_tpu.ops.pallas_lin import admm_iterate

    f32 = jnp.float32
    n, m = 13, 21
    P = _random_spd(rng, 1, n, cond=1e2)[0]
    A = jnp.asarray(rng.standard_normal((m, n)), f32)
    q = jnp.asarray(rng.standard_normal(n), f32)
    l = jnp.asarray(-np.abs(rng.standard_normal(m)) - 0.1, f32)
    u = jnp.asarray(np.abs(rng.standard_normal(m)) + 0.1, f32)
    rho = jnp.asarray(np.abs(rng.standard_normal(m)) + 0.5, f32)
    sigma, alpha, num = 1e-6, 1.6, 17

    K = P + sigma * jnp.eye(n, dtype=f32) + (A.T * rho[None, :]) @ A
    Kinv = jnp.asarray(
        np.linalg.inv(np.asarray(K, np.float64)), f32
    )

    x = jnp.zeros(n, f32)
    z = jnp.zeros(m, f32)
    y = jnp.zeros(m, f32)
    xr, zr, yr = x, z, y
    for _ in range(num):
        rhs = sigma * xr - q + A.T @ (rho * zr - yr)
        x_t = Kinv @ rhs
        z_t = A @ x_t
        x_n = alpha * x_t + (1 - alpha) * xr
        z_ax = alpha * z_t + (1 - alpha) * zr
        z_n = jnp.clip(z_ax + yr / rho, l, u)
        yr = yr + rho * (z_ax - z_n)
        xr, zr = x_n, z_n

    xk, zk, yk = admm_iterate(
        Kinv, A, q, l, u, rho, x, z, y, num, sigma, alpha, interpret=True
    )
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xr), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zr), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=2e-4,
                               rtol=2e-4)
