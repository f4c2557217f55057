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
