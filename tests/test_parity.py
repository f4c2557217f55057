"""Reference-formulation parity: the framework MPC vs the NumPy oracle.

BASELINE's fidelity row ("contact-wrench sequences match reference within
tolerance") made concrete: tools/reference_oracle.py implements the
reconstructed reference formulation (SURVEY.md §2.3 — torso inertia,
current-yaw linearization, expm ZOH, scipy QP) with numerics fully
independent of the framework; these tests run both on the same inputs with
``srbd.reference_parity_params()`` and assert the wrench sequences agree.

The recorded tolerances live in docs/PARITY.md (tools/parity_report.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import reference_oracle as oracle  # noqa: E402


def _scenario(pattern: str, yaw: float = 0.0):
    N = 10
    dtype = jnp.float64
    com = np.array([0.0527, 0.0, 0.598])
    feet = np.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]]
    )
    x0 = np.zeros(13)
    x0[2] = yaw
    x0[3:6] = com
    x0[9] = 0.1  # forward velocity, exercises the velocity rows
    x0[12] = srbd.GRAVITY
    x_ref = np.tile(x0, (N, 1))
    x_ref[:, 9:12] = 0.0
    x_ref[:, 2] = yaw  # current-yaw linearization on both sides
    contact = np.ones((N, 4))
    if pattern == "left_swing":
        contact[:, 0] = 0.0
        contact[:, 1] = 0.0
    elif pattern == "mixed":
        contact[5:, 0] = 0.0
        contact[5:, 1] = 0.0
    c_hor = np.tile(feet, (N, 1, 1))
    p_hor = np.tile(com, (N, 1))
    return N, dtype, x0, x_ref, contact, c_hor, p_hor


@pytest.mark.parametrize("pattern", ["stand", "left_swing", "mixed"])
def test_wrench_parity(pattern):
    """Framework MPC (parity params) vs NumPy oracle: forces agree."""
    N, dtype, x0, x_ref, contact, c_hor, p_hor = _scenario(pattern, yaw=0.25)
    Q = np.asarray(mpc.default_weights(dtype).Q)
    R = np.asarray(mpc.default_weights(dtype).R)

    u0_ref, x_hor_ref, U_ref = oracle.mpc_update(
        x0, x_ref, contact, c_hor, p_hor, Q, R
    )

    # High-accuracy QP settings: the torso-only parity inertia makes
    # cond(H) ~ 1e8 (the angular rows over-predict rotation ~30x), so the
    # default 60-iteration unscaled config under-converges by a few N.
    # Parity is a formulation claim — solve both sides tightly.
    from g1_locomotion_tpu.ops.qp import QPConfig

    cfg = mpc.MPCConfig(
        horizon=N,
        qp=QPConfig(iters=200, scaling_iters=3, rho=1.0, rho_segments=4,
                    matmul_inverse=False, polish_rounds=3),
    )
    params = srbd.reference_parity_params(dtype)
    sol = mpc.solve(
        cfg,
        mpc.default_weights(dtype),
        params,
        jnp.asarray(x0, dtype),
        jnp.asarray(x_ref, dtype),
        jnp.asarray(contact, dtype),
        jnp.asarray(c_hor, dtype),
        jnp.asarray(p_hor, dtype),
    )

    U = np.asarray(sol.U)
    # Forces within 0.2 N of the oracle over the whole horizon (body weight
    # ~335 N; the residual is a weakly-determined heel/toe split at the tiny
    # R regularization). Measured: 0.044 N (docs/PARITY.md).
    err = np.abs(U - U_ref).max()
    assert err < 0.2, f"max force error {err} N"
    err0 = np.abs(np.asarray(sol.u0) - u0_ref).max()
    assert err0 < 0.2, f"u0 error {err0} N"
    # Predicted state horizon: the physically-meaningful agreement.
    err_x = np.abs(np.asarray(sol.x_horizon) - x_hor_ref).max()
    assert err_x < 1e-4, f"x_horizon error {err_x}"


def test_discretization_parity():
    """Closed-form nilpotent ZOH == expm ZOH (independent derivations)."""
    r = np.array(
        [[-0.1, 0.12, -0.6], [0.07, 0.12, -0.6], [-0.1, -0.12, -0.6], [0.07, -0.12, -0.6]]
    )
    yaw = 0.4
    A_np, B_np = oracle.continuous_matrices(yaw, r)
    Ad_np, Bd_np = oracle.discretize_expm(A_np, B_np, 0.04)

    params = srbd.reference_parity_params(jnp.float64)
    A_j, B_j = srbd.continuous_matrices(params, jnp.asarray(yaw, jnp.float64), jnp.asarray(r, jnp.float64))
    Ad_j, Bd_j = srbd.discretize(A_j, B_j, 0.04)
    np.testing.assert_allclose(np.asarray(Ad_j), Ad_np, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd_j), Bd_np, atol=1e-12)
