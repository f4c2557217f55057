"""Matmul-only batched linear algebra for TPU.

XLA's batched ``cholesky``/``triangular_solve``/``lu`` on TPU run as
sequential per-column algorithms and cost 40-230 ms per batched (4096, 120,
120) call — versus ~1 ms for an equivalent matmul (measured). The QP solver's
speed-of-light path therefore avoids those primitives: this module computes
the SPD inverse through a **recursive blocked Cholesky** expressed as matmuls,

    K = [[A, B'], [B, C]] = L L',  L = [[L1, 0], [L21, L2]]
    W := L^-1 = [[W1, 0], [-W2 L21 W1, W2]],   K^-1 = W' W

recursing on A and the Schur complement S = C - L21 L21' down to an unrolled
scalar base case. Unlike naive Gauss-Jordan / block-Schur inversion (which
lost all accuracy at cond(K) ~ 1e4), Cholesky needs no pivoting for SPD input
and is backward stable; the recursion's work is almost entirely MXU matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BASE = 30  # tuned on v5e: ~13% faster than 16 (fewer tiny-matmul levels)

# Pallas base-case dispatch: None = auto (TPU backend, <= f32, batch >= 128),
# True/False = force. The Pallas kernel (ops/pallas_lin.py) runs the unrolled
# base factorization with the batch on the 128-lane axis — full VPU width —
# instead of XLA's matrix-on-lanes layout that idles 98/128 lanes at n = 30.
use_pallas_base: bool | None = None


def _pallas_wanted(K: jnp.ndarray) -> bool:
    if use_pallas_base is not None:
        return use_pallas_base
    if K.dtype == jnp.float64:
        return False  # TPU has no f64; CPU/interpret paths stay on XLA
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probing never fatal
        return False
    if backend not in ("tpu", "axon"):
        return False
    return math.prod(K.shape[:-2]) >= 128


def _chol_inv_base(K: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky + lower-triangular inverse for blocks of size <= _BASE.

    Returns W = L^-1 with K = L L'. Sequential in n (16 scalar steps),
    elementwise over the batch — VPU work, negligible at these sizes.
    """
    n = K.shape[-1]
    batch = K.shape[:-2]
    L = jnp.zeros_like(K)
    for j in range(n):
        d = K[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1) if j > 0 else K[..., j, j]
        d = jnp.sqrt(jnp.maximum(d, 1e-30))
        L = L.at[..., j, j].set(d)
        if j + 1 < n:
            if j > 0:
                s = K[..., j + 1 :, j] - jnp.einsum(
                    "...ik,...k->...i", L[..., j + 1 :, :j], L[..., j, :j]
                )
            else:
                s = K[..., j + 1 :, j]
            L = L.at[..., j + 1 :, j].set(s / d[..., None])
    # Forward substitution on the identity: W = L^-1 (also unrolled).
    W = jnp.zeros_like(K)
    eye = jnp.eye(n, dtype=K.dtype)
    eye = jnp.broadcast_to(eye, K.shape)
    for i in range(n):
        s = eye[..., i, :] - jnp.einsum(
            "...k,...kj->...j", L[..., i, :i], W[..., :i, :]
        ) if i > 0 else eye[..., i, :]
        W = W.at[..., i, :].set(s / L[..., i, i][..., None])
    return W


def chol_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """W = L^-1 for the Cholesky factor of batched SPD K (..., n, n)."""
    n = K.shape[-1]
    if n <= _BASE:
        if K.ndim >= 3 and _pallas_wanted(K):
            from g1_locomotion_tpu.ops import pallas_lin

            flat = K.reshape((-1,) + K.shape[-2:])
            return pallas_lin.chol_inverse_base(flat).reshape(K.shape)
        return _chol_inv_base(K)
    h = n // 2
    A = K[..., :h, :h]
    B = K[..., h:, :h]
    C = K[..., h:, h:]
    W1 = chol_inverse(A)
    L21 = B @ jnp.swapaxes(W1, -1, -2)  # = K21 L1^-T
    S = C - L21 @ jnp.swapaxes(L21, -1, -2)
    W2 = chol_inverse(S)
    bottom_left = -(W2 @ (L21 @ W1))
    top = jnp.concatenate(
        [W1, jnp.zeros(K.shape[:-2] + (h, n - h), K.dtype)], axis=-1
    )
    bot = jnp.concatenate([bottom_left, W2], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of batched SPD K (..., n, n): K^-1 = W' W, W = L^-1.

    All recursion work is matmuls; wall-clock on TPU is ~20-50x faster than
    jnp.linalg.cholesky + triangular solves at QP sizes (120-240), and the
    construction is numerically equivalent to Cholesky (stable without
    pivoting for SPD input).
    """
    W = chol_inverse(K)
    return jnp.swapaxes(W, -1, -2) @ W


def spd_solve(K: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = b for SPD K via the matmul inverse (batched)."""
    Ki = spd_inverse(K)
    if b.ndim == K.ndim - 1:
        return jnp.einsum("...ij,...j->...i", Ki, b)
    return Ki @ b
